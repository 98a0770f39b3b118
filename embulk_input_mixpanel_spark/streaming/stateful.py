"""Streaming depth: watermarked windowed aggregation + custom stateful op.

Completes the §2.7 streaming surface beyond the availableNow/foreachBatch
replay (streaming/stream.py):

- :func:`windowed_event_counts` — event-time tumbling-window counts with a
  watermark: the declarative late-data story. Rows later than the
  watermark horizon are DROPPED by the engine (append mode only emits a
  window once it can no longer change) — the streaming analog of the
  reference's lateness horizon (back_fill_days re-reads in batch mode;
  base_service.rb:109-115).
- :func:`running_hwm_stream` — a custom stateful operator via
  ``applyInPandasWithState``: per source partition, carry the running
  high-water mark ACROSS micro-batches (GroupState), emitting one row per
  (partition, epoch-with-news) with the old/new HWM and how many rows the
  batch would skip under it. This is the row-level watermark-skip
  bookkeeping (export_service.rb:102-112) expressed as streaming state —
  the state object is a 2-int tuple per partition, so state size is
  O(partitions), not O(rows).

Arrow-vectorized by construction: applyInPandasWithState hands each group
a pandas DataFrame iterator per micro-batch; there is no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "windowed_event_counts",
    "sessionized_event_counts",
    "running_hwm_stream",
    "HWM_STATE_SCHEMA",
]


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window counts with late-data watermark.

    Append output mode semantics: a window's row is emitted exactly once,
    after the watermark passes its end; rows arriving later than
    ``watermark`` behind the max seen event time are dropped by Spark's
    state store. Purely declarative — state management, pruning, and the
    late filter are the engine's.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            key_col,
            "n_events",
        )
    )


def sessionized_event_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows: merge-on-gap per key, watermark-closed.

    The streaming twin of the batch ``session_windows`` query
    (workloads.py): Spark's session-window state store merges events
    arriving in DIFFERENT micro-batches into one session as long as they
    fall within ``gap``, and emits a session exactly once after the
    watermark passes its close. State per open session is O(1).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


HWM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("source_partition", T.IntegerType()),
        T.StructField("epoch_rows", T.LongType()),
        T.StructField("hwm_before", T.LongType()),
        T.StructField("hwm_after", T.LongType()),
        T.StructField("would_skip", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("hwm", T.LongType()), T.StructField("seen", T.LongType())]
)


def _hwm_update(key, pdfs, state: GroupState):
    """Per-group stateful update: fold this micro-batch's rows into the
    running HWM carried in ``state`` (survives across micro-batches)."""
    import pandas as pd

    (partition,) = key
    hwm, seen = state.get if state.exists else (-1, 0)
    rows = 0
    mx = hwm
    skip = 0
    for pdf in pdfs:  # pandas frames, Arrow-batched — vectorized ops only
        rows += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["event_seq"].max()))
            skip += int((pdf["event_seq"] <= hwm).sum())
    state.update((int(mx), int(seen + rows)))
    yield pd.DataFrame(
        [
            {
                "source_partition": int(partition),
                "epoch_rows": rows,
                "hwm_before": int(hwm),
                "hwm_after": int(mx),
                "would_skip": int(skip),
            }
        ]
    )


def running_hwm_stream(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-source-partition running HWM.

    ``applyInPandasWithState`` with ProcessingTimeTimeout disabled
    (NoTimeout): state lives for the run, keyed by source_partition.
    """
    return (
        stream.select("source_partition", "event_seq")
        .groupBy("source_partition")
        .applyInPandasWithState(
            _hwm_update,
            outputStructType=HWM_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
