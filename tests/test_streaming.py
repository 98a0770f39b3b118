"""Structured Streaming replay: availableNow drain == batch replay."""

import os

from embulk_input_mixpanel_spark.runner import open_or_create
from embulk_input_mixpanel_spark.sources.genevents import change_events
from embulk_input_mixpanel_spark.streaming.stream import stream_replay

from .oracle import engine_final_state, oracle_final_state


def test_stream_replay_matches_oracle(spark, tmp_table_dir, tmp_path):
    n = 1500
    ev = change_events(spark, n, n_repos=10, paths_per_repo=15, dup_rate=0.1, seed=3)
    src = str(tmp_path / "landing")
    # three landing files = three potential micro-batches
    ev.filter("event_seq % 3 = 0").write.mode("append").parquet(src)
    ev.filter("event_seq % 3 = 1").write.mode("append").parquet(src)
    ev.filter("event_seq % 3 = 2").write.mode("append").parquet(src)

    table = open_or_create(spark, tmp_table_dir, num_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    stream_replay(spark, table, src, ckpt, max_files_per_trigger=4)

    assert engine_final_state(table.read()) == oracle_final_state(ev.collect())
    assert table.version >= 1


def test_stream_replay_incremental_new_files(spark, tmp_table_dir, tmp_path):
    """New files after the first drain are picked up; old ones aren't redone."""
    n = 900
    ev = change_events(spark, n, n_repos=8, paths_per_repo=10, dup_rate=0.0, seed=9)
    src = str(tmp_path / "landing2")
    ckpt = str(tmp_path / "ckpt2")
    first = ev.filter("event_seq < 600")
    first.write.mode("append").parquet(src)

    table = open_or_create(spark, tmp_table_dir, num_buckets=8)
    stream_replay(spark, table, src, ckpt)
    v1 = table.version
    state1 = engine_final_state(table.read())
    assert state1 == oracle_final_state(first.collect())

    ev.filter("event_seq >= 600").write.mode("append").parquet(src)
    stream_replay(spark, table, src, ckpt)
    assert table.version > v1
    assert engine_final_state(table.read()) == oracle_final_state(ev.collect())
