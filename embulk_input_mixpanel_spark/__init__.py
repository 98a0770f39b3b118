"""PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the *capabilities* of
treasure-data/embulk-input-mixpanel (windowed incremental export-and-load,
watermark dedup, latest-wins conflict resolution, schema inference +
additive evolution, checkpointed exactly-once commit) re-expressed as an
idiomatic Spark DataFrame pipeline over a lakehouse table of source-code
repositories (see BASELINE.json `north_rule` / `input_hint`).

Nothing in here is a port: the reference is a single-threaded row-at-a-time
JRuby loop (reference: lib/embulk/input/service/export_service.rb:96-127);
this engine is a declarative, partitioned, shuffle-aware Spark plan.

Layout
------
- ``plans``     window/batch planning + checkpoint protocol (driver-side)
- ``sources``   lake table format, deterministic CDC generator, JSONL scan
- ``operators`` apply/merge pipeline, dedup family, similarity, text ops
- ``functions`` vectorized (Arrow) UDFs + native column expression helpers
- ``streaming`` Structured Streaming (availableNow/foreachBatch) replay
"""

__version__ = "0.1.0"
