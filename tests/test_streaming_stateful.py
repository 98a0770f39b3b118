"""Watermark + custom stateful streaming operators (§2.7 depth).

Deterministic late-data choreography: each landing file is drained by its
OWN availableNow run against a shared checkpoint, so micro-batch order is
pinned and the watermark / operator state provably persist across
restarts (they live in the streaming checkpoint) — no reliance on file
ordering or trigger rate limits.
"""

import datetime as dt
import os

from pyspark.sql import types as T

from embulk_input_mixpanel_spark.streaming.stateful import (
    running_hwm_stream,
    sessionized_event_counts,
    windowed_event_counts,
)

UTC = dt.timezone.utc

EV_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

HWM_SRC_SCHEMA = T.StructType(
    [
        T.StructField("source_partition", T.IntegerType()),
        T.StructField("event_seq", T.LongType()),
    ]
)


def _drain(spark, src, schema, transform, name, ckpt, mode):
    """One bounded availableNow pass; returns the rows THIS run emitted.

    foreachBatch sink (memory sink can't recover from a checkpoint): the
    checkpoint carries watermark/operator state between runs, the local
    list only collects this run's output."""
    rows = []
    stream = spark.readStream.schema(schema).parquet(src)
    (
        transform(stream)
        .writeStream.foreachBatch(lambda df, _epoch: rows.extend(df.collect()))
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return rows


def test_watermark_drops_beyond_horizon_late_row(spark, tmp_path):
    """A row 2+ days older than the watermark is dropped by the state
    store: the second run emits NO revision for its window, while a
    fresh in-horizon row still lands (update mode surfaces exactly the
    windows each batch changed)."""
    d = lambda day, h=0: dt.datetime(2024, 1, day, h, tzinfo=UTC)  # noqa: E731
    src, ckpt = str(tmp_path / "wm_src"), str(tmp_path / "wm_ckpt")
    os.makedirs(src)
    args = (EV_SCHEMA, lambda s: windowed_event_counts(s, "1 day", "2 days"),
            "wm_counts", ckpt, "update")

    on_time = [(d(1), "click"), (d(1, 6), "click"), (d(2), "view"),
               (d(9), "click"), (d(10), "view")]
    spark.createDataFrame(on_time, EV_SCHEMA).write.mode("append").parquet(src)
    out1 = {(r["win_start"].day, r["event_type"]): r["n_events"]
            for r in _drain(spark, src, *args)}
    assert out1[(1, "click")] == 2 and out1[(2, "view")] == 1
    # run 1 ends with max event time = day 10 -> checkpointed watermark day 8

    late = [(d(1, 12), "click"),  # day-1: beyond the day-8 watermark -> dropped
            (d(12), "view")]      # in-horizon new row -> lands
    spark.createDataFrame(late, EV_SCHEMA).write.mode("append").parquet(src)
    out2 = {(r["win_start"].day, r["event_type"]): r["n_events"]
            for r in _drain(spark, src, *args)}
    assert (1, "click") not in out2  # no revision: the late row never entered
    assert out2[(12, "view")] == 1


SESS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
    ]
)


def test_streaming_session_merges_across_micro_batches(spark, tmp_path):
    """An event in a LATER micro-batch that falls within the gap must
    extend the open session (state-store merge), and sessions emit once
    the watermark passes their close."""
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)  # noqa: E731
    src, ckpt = str(tmp_path / "sess_src"), str(tmp_path / "sess_ckpt")
    os.makedirs(src)
    args = (SESS_SCHEMA,
            lambda s: sessionized_event_counts(s, gap="30 minutes", watermark="1 hour"),
            "sess_counts", ckpt, "append")

    b1 = [(t(10, 0), "alice"), (t(10, 10), "alice"), (t(10, 0), "bob")]
    spark.createDataFrame(b1, SESS_SCHEMA).write.mode("append").parquet(src)
    out1 = _drain(spark, src, *args)
    assert out1 == []  # all sessions still open (watermark at 09:10)

    # batch 2: extends alice's session (10:25 < 10:10 + 30min) and adds a
    # far-future event that closes everything
    b2 = [(t(10, 25), "alice"), (t(23, 0), "carol")]
    spark.createDataFrame(b2, SESS_SCHEMA).write.mode("append").parquet(src)
    out2 = {r["user_id"]: r for r in _drain(spark, src, *args)}
    # alice: ONE merged session spanning both micro-batches, 3 events
    assert out2["alice"]["n_events"] == 3
    assert out2["alice"]["session_start"].replace(tzinfo=UTC) == t(10, 0)
    assert out2["alice"]["session_end"].replace(tzinfo=UTC) == t(10, 55)
    assert out2["bob"]["n_events"] == 1
    assert "carol" not in out2  # her session is still open at drain end


def test_running_hwm_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state is checkpointed: a second availableNow
    run resumes with the first run's high-water marks."""
    src, ckpt = str(tmp_path / "hwm_src"), str(tmp_path / "hwm_ckpt")
    os.makedirs(src)
    args = (HWM_SRC_SCHEMA, running_hwm_stream, "hwm_state", ckpt, "append")

    b1 = [(0, s) for s in range(1, 11)] + [(1, 100)]
    spark.createDataFrame(b1, HWM_SRC_SCHEMA).write.mode("append").parquet(src)
    out1 = {r["source_partition"]: r for r in _drain(spark, src, *args)}
    assert (out1[0]["hwm_before"], out1[0]["hwm_after"], out1[0]["would_skip"]) == (-1, 10, 0)
    assert (out1[1]["hwm_before"], out1[1]["hwm_after"], out1[1]["epoch_rows"]) == (-1, 100, 1)

    b2 = [(0, s) for s in range(5, 16)]  # seqs 5..15: 6 rows at or below hwm 10
    spark.createDataFrame(b2, HWM_SRC_SCHEMA).write.mode("append").parquet(src)
    out2 = {r["source_partition"]: r for r in _drain(spark, src, *args)}
    assert (out2[0]["hwm_before"], out2[0]["hwm_after"], out2[0]["would_skip"]) == (10, 15, 6)
