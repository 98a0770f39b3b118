"""JSONL change-event source with partial-import semantics.

The reference streams newline-delimited JSON from the export API with
line-buffered parsing; a non-empty trailing buffer means the stream was
truncated mid-record and raises ``IncompleteExportResponseError`` unless
``allow_partial_import`` is set
(reference: lib/embulk/input/mixpanel_api/client.rb:127-156;
lib/embulk/input/service/export_service.rb:128-133).

Spark-side the same contract is: read JSONL PERMISSIVE (a malformed or
truncated line parses to an all-null row, and ``event_id`` is required,
so ``event_id IS NULL`` == corrupt record); attempted/corrupt counts come
from ONE aggregate over the same scan — no second pass over raw input.
``allow_partial`` False converts any corrupt row into
:class:`IncompleteStreamError` BEFORE anything is committed (snapshot
atomicity = nothing partial ever visible; the reference instead tracks
per-slice row buffers).

Also carries the guess/preview limit-pushdown scan (limit 10;
client.rb:15,170-178) and the expanding-window probe
(client.rb:64-79,105-114).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["IncompleteStreamError", "read_jsonl_events", "probe_nonempty_window", "EVENT_SCHEMA"]


class IncompleteStreamError(RuntimeError):
    """Truncated/malformed records present and allow_partial=False.

    (reference: IncompleteExportResponseError, client.rb:151-155)
    """


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("event_seq", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("source_partition", T.IntegerType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("commit_seq", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("props", T.StringType()),
    ]
)


@dataclass
class JsonlScan:
    df: DataFrame
    corrupt_count: int
    total_count: int


def read_jsonl_events(
    spark: SparkSession,
    path: str,
    allow_partial: bool = False,
    limit: int | None = None,
) -> JsonlScan:
    """Scan JSONL change events; enforce the partial-import contract.

    ``limit`` is the guess/preview path (LocalLimit pushdown — the
    ``limit=10`` API param analog).
    """
    df = spark.read.schema(EVENT_SCHEMA).option("mode", "PERMISSIVE").json(path)
    if limit is not None:
        df = df.limit(limit)

    # PERMISSIVE turns a malformed/truncated line into an all-null row;
    # event_id is required, so null event_id == corrupt record (a truncated
    # trailing record is still one attempted row — same accounting as the
    # reference's leftover `buf`). ONE aggregate over the scan yields both
    # counts; the old line-count pass (spark.read.text) would re-read the
    # raw input a second time — 2x scan cost at ingest scale.
    stats = df.agg(
        F.count(F.lit(1)).alias("attempted"),
        F.sum(F.when(F.col("event_id").isNull(), 1).otherwise(0)).alias("corrupt"),
    ).first()
    total = int(stats["attempted"])
    corrupt = int(stats["corrupt"] or 0)
    parsed = total - corrupt
    if corrupt and not allow_partial:
        raise IncompleteStreamError(
            f"{corrupt}/{total} records corrupt/truncated and allow_partial=False"
        )
    clean = df.filter(F.col("event_id").isNotNull())
    return JsonlScan(df=clean, corrupt_count=corrupt, total_count=parsed)


def probe_nonempty_window(
    events: DataFrame,
    from_seq: int,
    max_seq: int,
    growth: tuple[int, ...] = (1, 10, 100, 1_000, 10_000),
    sample: int = 10,
) -> tuple[int, list]:
    """Expanding-window probe: widen the end bound exponentially until a
    non-empty sample is found; error if the whole range is empty.

    (reference: export_for_small_dataset / try_to_dates,
    client.rb:64-79,105-114 — S4; ConfigError on all-empty)
    """
    for g in growth:
        hi = min(from_seq + g, max_seq)
        rows = (
            events.filter((F.col("event_seq") >= from_seq) & (F.col("event_seq") <= hi))
            .limit(sample)
            .collect()
        )
        if rows:
            return hi, rows
        if hi >= max_seq:
            break
    raise ValueError(
        f"no events found in ({from_seq}, {max_seq}] — nothing to guess from"
    )
