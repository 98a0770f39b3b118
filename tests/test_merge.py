"""latest_wins / merge_upsert semantics (conflict resolution goldens).

(reference semantics: running-max HWM export_service.rb:109-112; watermark
skip :102-107; latest-wins by (commit, event sequence) per BASELINE.json)
"""

from pyspark.sql import functions as F

from embulk_input_mixpanel_spark.operators.merge import latest_wins, merge_upsert

COLS = ["repo", "path", "op", "commit_seq", "event_seq", "event_id", "content"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_latest_wins_picks_max_order(spark):
    df = _df(
        spark,
        [
            ("r", "a", "U", 1, 10, "e1", "v1"),
            ("r", "a", "U", 2, 5, "e2", "v2"),  # higher commit_seq wins despite lower seq
            ("r", "b", "U", 1, 1, "e3", "w1"),
        ],
    )
    out = {
        (r["repo"], r["path"]): r["content"]
        for r in latest_wins(df, ["repo", "path"], ["commit_seq", "event_seq"]).collect()
    }
    assert out == {("r", "a"): "v2", ("r", "b"): "w1"}


def test_latest_wins_tie_broken_by_event_id(spark):
    df = _df(
        spark,
        [
            ("r", "a", "U", 1, 10, "aaa", "low"),
            ("r", "a", "U", 1, 10, "zzz", "high"),
        ],
    )
    out = latest_wins(df, ["repo", "path"], ["commit_seq", "event_seq"]).collect()
    assert len(out) == 1 and out[0]["content"] == "high"


def test_duplicate_redelivery_collapses(spark):
    row = ("r", "a", "U", 1, 10, "e1", "v1")
    df = _df(spark, [row, row, row])
    assert latest_wins(df, ["repo", "path"], ["commit_seq", "event_seq"]).count() == 1


def test_merge_upsert_insert_update_delete(spark):
    target = _df(spark, [("r", "a", "U", 1, 1, "e1", "old"), ("r", "b", "U", 1, 2, "e2", "keep")])
    source = _df(
        spark,
        [
            ("r", "a", "U", 2, 3, "e3", "new"),   # update
            ("r", "b", "D", 2, 4, "e4", ""),      # delete
            ("r", "c", "I", 2, 5, "e5", "ins"),   # insert
        ],
    )
    merged = merge_upsert(target, source, ["repo", "path"], ["commit_seq", "event_seq"])
    live = {
        (r["repo"], r["path"]): r["content"]
        for r in merged.filter("op <> 'D'").collect()
    }
    assert live == {("r", "a"): "new", ("r", "c"): "ins"}
    # the deleted key remains as a tombstone carrying its delete order
    tomb = merged.filter("op = 'D'").collect()
    assert len(tomb) == 1 and (tomb[0]["repo"], tomb[0]["path"]) == ("r", "b")
    assert tomb[0]["commit_seq"] == 2


def test_merge_tombstone_blocks_stale_resurrection(spark):
    """Out-of-order across batches: delete applied in batch k, older update
    arrives in batch k+1 — the tombstone must keep the key dead."""
    target = _df(spark, [("r", "x", "D", 5, 50, "e9", "")])  # tombstone in table
    stale = _df(spark, [("r", "x", "U", 3, 60, "e7", "zombie")])
    merged = merge_upsert(target, stale, ["repo", "path"], ["commit_seq", "event_seq"])
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["op"] == "D"  # still dead


def test_merge_no_tombstones_mode_drops_deletes(spark):
    target = _df(spark, [("r", "a", "U", 1, 1, "e1", "old")])
    source = _df(spark, [("r", "a", "D", 2, 2, "e2", "")])
    out = merge_upsert(
        target, source, ["repo", "path"], ["commit_seq", "event_seq"], tombstones=False
    ).collect()
    assert out == []


def test_merge_out_of_order_event_loses_to_stored_row(spark):
    """Cross-batch out-of-order: stale commit arriving later must NOT win."""
    target = _df(spark, [("r", "a", "U", 5, 50, "e9", "current")])
    stale = _df(spark, [("r", "a", "U", 3, 60, "e7", "stale")])
    out = merge_upsert(target, stale, ["repo", "path"], ["commit_seq", "event_seq"]).collect()
    assert len(out) == 1 and out[0]["content"] == "current"


def test_merge_stale_delete_ignored(spark):
    target = _df(spark, [("r", "a", "U", 5, 50, "e9", "current")])
    stale_del = _df(spark, [("r", "a", "D", 2, 60, "e7", "")])
    out = merge_upsert(target, stale_del, ["repo", "path"], ["commit_seq", "event_seq"]).collect()
    assert len(out) == 1 and out[0]["content"] == "current" and out[0]["op"] != "D"


def test_merge_idempotent_redelivery_of_stored_row(spark):
    """Re-applying the exact stored version changes nothing."""
    target = _df(spark, [("r", "a", "U", 5, 50, "e9", "current")])
    same = _df(spark, [("r", "a", "U", 5, 50, "e9", "current")])
    out = merge_upsert(target, same, ["repo", "path"], ["commit_seq", "event_seq"]).collect()
    assert len(out) == 1 and out[0]["content"] == "current"


def test_merge_delete_then_reinsert(spark):
    target = _df(spark, [("r", "a", "U", 1, 1, "e1", "old")])
    src = _df(
        spark,
        [("r", "a", "D", 2, 2, "e2", ""), ("r", "a", "I", 3, 3, "e3", "reborn")],
    )
    winners = latest_wins(src, ["repo", "path"], ["commit_seq", "event_seq"])
    out = merge_upsert(target, winners, ["repo", "path"], ["commit_seq", "event_seq"]).collect()
    assert len(out) == 1 and out[0]["content"] == "reborn"


def test_merge_plan_uses_partial_aggregation(spark):
    """The latest-wins shuffle must be a hash aggregate (partial+final),
    not a window sort — that's the skew story at 100 TB."""
    df = _df(spark, [("r", "a", "U", 1, 1, "e1", "x")])
    plan = latest_wins(df, ["repo", "path"], ["commit_seq", "event_seq"])._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan
