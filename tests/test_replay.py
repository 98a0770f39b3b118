"""End-to-end CDC replay: oracle equality, idempotence, resume, evolution.

Mirrors the reference's run/resume/preview suites
(test_export_service.rb:333-338,427-431,561-748) re-expressed as the
engine's native replay over the deterministic generator.
"""

import pytest
from pyspark.sql import functions as F

from embulk_input_mixpanel_spark.plans.checkpoint import get_cursor, get_hwm_map
from embulk_input_mixpanel_spark.runner import open_or_create, preview, replay
from embulk_input_mixpanel_spark.sources.genevents import change_events

from .oracle import engine_final_state, oracle_final_state

N = 3000


@pytest.fixture(scope="module")
def events(spark):
    df = change_events(
        spark, N, n_repos=15, paths_per_repo=25, dup_rate=0.15, evolve_after=2000, seed=7
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_replay_matches_oracle_sha256(spark, tmp_table_dir, events):
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    rep = replay(t, events, upper_bound=N, slice_size=1000)
    # fresh cursor is -1 -> (-1,999],(999,1999],(1999,2999],(2999,3000]
    assert len(rep.batches) == 4
    assert rep.rows_in == events.count()
    assert engine_final_state(t.read()) == oracle_final_state(events.collect())


def test_replay_is_idempotent_on_rerun(spark, tmp_table_dir, events):
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=N, slice_size=1000)
    v = t.version
    state1 = engine_final_state(t.read())
    # second run: cursor already at upper_bound -> zero batches
    rep2 = replay(t, events, upper_bound=N, slice_size=1000)
    assert len(rep2.batches) == 0
    assert t.version == v
    assert engine_final_state(t.read()) == state1


def test_backfill_overlap_rows_are_skipped_by_hwm(spark, tmp_table_dir, events):
    """Re-reading a lateness horizon below the cursor is dedup'd row-level.

    (reference: back_fill_days widening base_service.rb:109-115 + watermark
    skip export_service.rb:102-107)
    """
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=2000, slice_size=1000)
    state_mid = engine_final_state(t.read())
    # resume with backfill: first batch re-reads (1500, 2000] overlap
    rep = replay(t, events, upper_bound=N, slice_size=1000, backfill=500)
    assert rep.rows_skipped > 0  # overlap rows dropped by per-partition HWM
    # final state identical to a clean full replay
    full = oracle_final_state(events.collect())
    assert engine_final_state(t.read()) == full
    assert state_mid != full  # sanity: the tail actually changed things


def test_resume_after_injected_failure_exactly_once(spark, tmp_table_dir, events):
    """Crash mid-run -> restart -> same final state as uninterrupted run.

    (reference resume: mixpanel.rb:34-46; snapshot atomicity makes the
    retried batch invisible until its single commit)
    """
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def fail_on_batch_2(idx):
        if idx == 2:
            calls["n"] += 1
            raise Boom("injected")

    with pytest.raises(Boom):
        replay(t, events, upper_bound=N, slice_size=1000, fail_injector=fail_on_batch_2,
               retry_limit=1, retry_wait=0.0)
    assert calls["n"] == 2  # first try + one retry
    assert get_cursor(t) == 1999  # batches 0,1 committed; 2 not

    rep = replay(t, events, upper_bound=N, slice_size=1000)  # resume
    # replans only the tail: (1999,2999], (2999,3000]
    assert [b.batch_index for b in rep.batches] == [0, 1]
    assert engine_final_state(t.read()) == oracle_final_state(events.collect())


def test_schema_evolution_adds_column_additively(spark, tmp_table_dir, events):
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=1999, slice_size=2000)
    cols_before = {f.name for f in t.schema.fields}
    assert "p_branch" not in cols_before  # evolve_after=2000 not reached
    replay(t, events, upper_bound=N, slice_size=1000)
    cols_after = {f.name for f in t.schema.fields}
    assert {"p_size", "p_mode", "p_branch"} <= cols_after
    # rows written before evolution read NULL for the new column
    old = t.read().filter(F.col("event_seq") < 1000).select("p_branch").distinct().collect()
    assert all(r[0] is None for r in old)


def test_reserved_keys_never_promoted_nor_residual(spark, tmp_table_dir, events):
    """KNOWN_KEYS analog (reference export_service.rb:14-18 + custom-props
    golden test_export_service.rb:750-802): reserved system keys are
    excluded from auto-promotion AND from the residual props_rest JSON;
    custom keys still evolve into typed p_* columns."""
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=N, slice_size=1000,
           apply_kwargs={"reserved_keys": ["mode"]})
    cols = {f.name for f in t.schema.fields}
    assert "p_mode" not in cols          # reserved: never promoted
    assert {"p_size", "p_branch"} <= cols  # custom keys still evolve
    rest = t.read().select("props_rest").filter(
        F.col("props_rest").contains('"mode"')).count()
    assert rest == 0                     # reserved: not in the residual either


def test_hwm_map_is_per_source_partition(spark, tmp_table_dir, events):
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=N, slice_size=1500)
    hwm = get_hwm_map(t)
    expected = {
        int(r["source_partition"]): int(r["mx"])
        for r in events.groupBy("source_partition").agg(F.max("event_seq").alias("mx")).collect()
    }
    assert hwm == expected


def test_preview_limited_and_stateless(spark, tmp_table_dir, events):
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    out = preview(t, events, upper_bound=N, slice_size=1000, limit=10)
    assert out.count() == 10
    assert t.version == 0  # no state mutation (jql_service.rb:104-107)


def test_deletes_remove_rows(spark, tmp_table_dir, events):
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=N, slice_size=N)
    # every key whose winning op is D must be absent
    oracle = oracle_final_state(events.collect())
    keys = {(r.repo, r.path) for r in t.read().select("repo", "path").collect()}
    assert keys == set(oracle)
    n_deleted = events.select("repo", "path").distinct().count() - len(oracle)
    assert n_deleted > 0  # the generator actually produced winning deletes


def test_tombstones_hidden_and_vacuumed(spark, tmp_table_dir, events):
    from embulk_input_mixpanel_spark.operators.maintenance import vacuum_tombstones

    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    replay(t, events, upper_bound=N, slice_size=N)
    n_tomb = t.read(include_tombstones=True).filter("op = 'D'").count()
    assert n_tomb > 0  # deletes are retained as tombstones
    visible_before = engine_final_state(t.read())
    v = vacuum_tombstones(t, horizon=0)
    assert v > 0
    assert t.read(include_tombstones=True).filter("op = 'D'").count() == 0
    assert engine_final_state(t.read()) == visible_before  # vacuum is invisible


def test_extreme_hot_key_skew(spark, tmp_table_dir):
    """One repo receives ~all events (pathological Zipf): the partial-agg
    latest-wins must reduce map-side without a straggler reducer, and the
    result must still match the oracle."""
    n = 60_000
    ev = (
        change_events(spark, n, n_repos=1, paths_per_repo=5, dup_rate=0.2, seed=13)
    )  # 5 keys total, ~14.4k events per key
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    rep = replay(t, ev, upper_bound=n, slice_size=n)
    assert rep.batches[0].keys_upserted == 5
    assert engine_final_state(t.read()) == oracle_final_state(ev.collect())


def test_untouched_buckets_carry_forward_by_reference(spark, tmp_table_dir):
    """A small batch must rewrite only the buckets it touches: every other
    bucket's file list stays literally the same files (no data movement) —
    the property that makes MERGE cost scale with the batch, not the table."""
    n = 4000
    ev = change_events(spark, n, n_repos=40, paths_per_repo=20, seed=21)
    t = open_or_create(spark, tmp_table_dir, num_buckets=64)
    replay(t, ev, upper_bound=n - 20, slice_size=n)
    files_before = dict(t.snapshot().files)

    # tiny tail batch: touches few buckets
    rep = replay(t, ev, upper_bound=n, slice_size=n)
    touched = rep.batches[0].touched_buckets
    assert 0 < touched < 40  # 20 events cannot touch most of 64 buckets
    files_after = dict(t.snapshot().files)
    unchanged = [b for b in files_before if files_before[b] == files_after.get(b)]
    # all non-touched buckets reference the previous snapshot's files
    assert len(unchanged) >= len(files_before) - touched
    assert len(unchanged) > 0
