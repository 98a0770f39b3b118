"""Capture explain('formatted') for named queries into plans/r06/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name becomes <query>_<suffix>.txt)
  queries default to the bench headliners.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_input_mixpanel_spark import workloads  # noqa: E402
from embulk_input_mixpanel_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q1_pricing_summary",
    "topk_revenue_orders",
    "broadcast_dim_join",
    "latest_wins_per_user",
    "watermark_skip_metrics",
    "session_windows",
    "doc_fingerprint",
    "dedup_exact_docs",
    "quality_score",
    "cosine_topk",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "neardup_docs_lsh",
    "embedding_neardup_lsh",
    "ivf_topk",
    "lang_id_heuristic",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**workloads.SPARK_QUERIES, **workloads.AUX_QUERIES}
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main()
