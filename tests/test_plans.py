"""Physical-plan audits: the optimizations we rely on must be IN the plan.

These tests pin the scale story: filters reach the parquet scan, column
pruning shrinks ReadSchema, small dims broadcast, conflict resolution is a
partial-aggregating hash/sort aggregate (not a window sort), and the hot
path contains no Python row UDFs.
"""

from embulk_input_mixpanel_spark import workloads


def _plan(spark, name, sf_dir="/root/testdata/sf0.001"):
    df = workloads.SPARK_QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bounds_filter_pushed_to_scan(spark):
    plan = _plan(spark, "window_filter")
    assert "PushedFilters" in plan
    assert "GreaterThan(event_id,2000)" in plan and "LessThanOrEqual(event_id,7000)" in plan


def test_column_pruning_in_readschema(spark):
    plan = _plan(spark, "flatten_props")
    # only the two referenced columns are read from parquet
    assert "ReadSchema: struct<event_id:bigint,props:string>" in plan


def test_dim_join_broadcasts(spark):
    plan = _plan(spark, "broadcast_dim_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_latest_wins_is_partial_aggregate_not_window(spark):
    plan = _plan(spark, "latest_wins_per_user")
    assert "partial_max" in plan  # map-side combine present
    assert "Window" not in plan


def test_no_python_udf_in_cdc_query_plans(spark):
    for name in [
        "window_filter", "watermark_skip_metrics", "latest_wins_per_user",
        "cdc_replay_latest_state", "flatten_props", "residual_prop_keys",
        "q1_pricing_summary", "broadcast_dim_join", "dedup_exact_docs",
    ]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_wholestage_codegen_covers_scan_queries(spark):
    import re

    plan = _plan(spark, "pushdown_compound_where")
    # '*(n)' prefixes mark whole-stage-codegen spans in plan strings
    assert re.search(r"\*\(\d+\)\s*Filter", plan)
