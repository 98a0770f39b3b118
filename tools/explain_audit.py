"""Dump formatted physical plans for the headline queries -> BENCH/PLANS.md.

Reviewable evidence that pushdown / pruning / broadcast / partial
aggregation land where the architecture claims they do.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_input_mixpanel_spark import workloads
from embulk_input_mixpanel_spark.session import get_spark

AUDIT = [
    "window_filter",
    "pushdown_compound_where",
    "latest_wins_per_user",
    "cdc_replay_latest_state",
    "q1_pricing_summary",
    "broadcast_dim_join",
    "topk_revenue_orders",
    "q5_region_revenue",
    "q6_selective_revenue",
    "session_windows",
    "events_semi_building",
    "events_anti_building",
    "rollup_daily_by_type",
    "user_running_value",
    "value_percentiles",
    "neardup_components",
    "dedup_keep_best",
    # training-data family: the scale paths whose plans carry the 100 TB story
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "neardup_docs_lsh",
    "simhash_neardups",
    "cosine_topk",
    "hyperplane_lsh_candidates",
    "embedding_neardup_lsh",
    "ivf_assign",
    "ivf_kmeans_refined",
    "ivf_topk",
    # incremental ANN: the probe plan proves the cluster-bucketed layout
    # prunes at the FILE level (scan lists only probed buckets' files).
    # incremental_neardup_batches is absent by design: its result is
    # localCheckpoint'ed (valid past the store commits), so the final plan
    # is an opaque RDD scan — its pruning evidence is pinned by the stats
    # asserts in tests/test_incremental_dedup.py instead.
    "incremental_ivf_topk",
    # deterministic sampling: both must be a single codegen'd filter /
    # aggregate over one scan — no RNG, no join, no per-stratum passes
    "stratified_sample_docs",
    "dataset_split_counts",
    # composite curation chain: gate + sample must FUSE into the scan
    # (one filter over documents), dedup joins are the only wide stages
    "curation_pipeline",
    # global top-k over an aggregate: TakeOrderedAndProject, never Sort
    "top_users_by_value",
]

SKEW_NOTE = """
## Note: adversarial hot-repo skew (bench `skew` section)

The MERGE path's skew story is runtime + planning combined: AQE skew-join
splitting (session.py) plus the merge stage's explicit repartitioning.
bench.py replays the same stream with `hot_repo_fraction=0.2` (one repo
forced to 20% of all events — the monorepo shape). Measured at sf0.1
(BENCH_r04): hot-stream throughput >= the uniform-Zipf baseline
(`vs_uniform` ~1.0+; the hot run also benefits from a warm JVM and a
smaller distinct-key set, so >1 is expected) — i.e. a 20%-hot key does
NOT serialize the MERGE onto one reducer. The latest-wins aggregate is a
partial-agg max-of-struct, so the hot key combines map-side before the
shuffle; the residual reducer skew is split by AQE.
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# Physical plans (explain formatted) — audit artifacts\n"]
    # audit spans both registries: main (driver-gated) + aux (subsumed
    # entries kept independently checkable, workloads.py AUX_QUERIES)
    registry = {**workloads.SPARK_QUERIES, **workloads.AUX_QUERIES}
    for name in AUDIT:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    out.append(SKEW_NOTE)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(path)


if __name__ == "__main__":
    main()
