"""Physical-plan audits: the optimizations we rely on must be IN the plan.

These tests pin the scale story: filters reach the parquet scan, column
pruning shrinks ReadSchema, small dims broadcast, conflict resolution is a
partial-aggregating hash/sort aggregate (not a window sort), and the hot
path contains no Python row UDFs.
"""

from embulk_input_mixpanel_spark import workloads


_ALL_QUERIES = {**workloads.SPARK_QUERIES, **workloads.AUX_QUERIES}


def _plan(spark, name, sf_dir="/root/testdata/sf0.001"):
    df = _ALL_QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bounds_filter_pushed_to_scan(spark):
    plan = _plan(spark, "window_filter")
    assert "PushedFilters" in plan
    assert "GreaterThan(event_id,2000)" in plan and "LessThanOrEqual(event_id,7000)" in plan


def test_column_pruning_in_readschema(spark):
    plan = _plan(spark, "flatten_props")
    # only the three referenced columns are read from parquet (the query
    # also carries the fused epoch-normalization family over ts)
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,props:string>" in plan


def test_dim_join_broadcasts(spark):
    plan = _plan(spark, "broadcast_dim_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_latest_wins_is_partial_aggregate_not_window(spark):
    plan = _plan(spark, "latest_wins_per_user")
    assert "partial_max" in plan  # map-side combine present
    assert "Window" not in plan


def test_no_python_udf_no_cartesian_in_any_query_plan(spark):
    """EVERY registered query (CDC + relational + training-data family,
    including the aux entries kept out of the driver's 50-row gate)
    stays JVM-side and never degenerates to a CartesianProduct."""
    for name in _ALL_QUERIES:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


# the exact all-pairs baselines (bounded panels / ground-truth tiers) are
# BroadcastNestedLoopJoin BY DESIGN; every scale-path query must not be
_SCALE_PATH = [
    "neardup_docs_lsh",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "simhash_neardups",
    "hyperplane_lsh_candidates",
    "embedding_neardup_lsh",
    # NOT ivf_assign: scoring every vector against the broadcast centroid
    # set is a deliberate BroadcastNestedLoopJoin (linear: n x n_centroids)
]


def test_scale_path_queries_use_only_hash_joins(spark):
    for name in _SCALE_PATH:
        plan = _plan(spark, name)
        assert "NestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_ivf_assign_is_partial_aggregate_not_window(spark):
    for name in ["ivf_assign", "ivf_kmeans_refined"]:
        plan = _plan(spark, name)
        assert "partial_max" in plan, name  # map-side argmax combine
        assert "Window" not in plan, name


def test_global_topk_is_take_ordered_not_global_sort(spark):
    """top-100-of-10k-users must compile to TakeOrderedAndProject
    (per-partition heaps merged on the driver), never a full global Sort
    of the aggregated frame — the difference between O(k) driver memory
    and a single-reducer sort at 100 TB."""
    plan = _plan(spark, "top_users_by_value")
    assert "TakeOrderedAndProject" in plan
    assert "partial_" in plan  # map-side combine on the sum/count


def test_wholestage_codegen_covers_scan_queries(spark):
    import re

    plan = _plan(spark, "pushdown_compound_where")
    # '*(n)' prefixes mark whole-stage-codegen spans in plan strings
    assert re.search(r"\*\(\d+\)\s*Filter", plan)
