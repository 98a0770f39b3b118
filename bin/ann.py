#!/usr/bin/env python
"""spark-submit entrypoint: incremental ANN (IVF) index over embeddings.

Maintains a persistent cluster-bucketed vector store and ingests embedding
batches O(batch): only new vectors are assigned (broadcast-centroid argmax)
and appended; redelivered ids are dropped via the id-bucketed idempotence
index. Probes open only the probed clusters' files. Re-running an
already-ingested batch is a no-op; crashes roll forward on the next run —
the same at-least-once -> exactly-once contract as the CDC ingest CLI.

Usage:
    python bin/ann.py --store /data/ann_store \
        --vectors-parquet /data/emb_batch.parquet [--n-centroids 8]
    python bin/ann.py --store /data/ann_store --topk-ids 0,1,2 \
        [--k 3] [--n-probe 2] [--out-parquet /data/nn]
    python bin/ann.py --store /data/ann_store --retrain [--iters 2] \
        [--grow-centroids 32]
    python bin/ann.py --store /data/ann_store --delete-ids 7,42
    python bin/ann.py --store /data/ann_store --maintain
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_input_mixpanel_spark.operators.incremental_ann import IncrementalANN
from embulk_input_mixpanel_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True, help="ANN store root path")
    ap.add_argument("--vectors-parquet", help="parquet batch with (vec_id, embedding)")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-centroids", type=int, default=None,
                    help="IVF cluster count at store CREATION (default 8); "
                         "reopens adopt the stored fanout — grow it with "
                         "--retrain --grow-centroids N")
    ap.add_argument("--topk-ids", help="comma-separated stored ids to probe")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument("--out-parquet", help="write probe results here")
    ap.add_argument("--retrain", action="store_true",
                    help="Lloyd-refine centroids + rewrite assignments "
                         "(run in a maintenance window)")
    ap.add_argument("--grow-centroids", type=int, default=None,
                    help="with --retrain: re-bucket the index to this "
                         "fanout (IVF wants ~sqrt(corpus) centroids)")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--delete-ids", default=None,
                    help="takedown: comma-separated vec ids to delete "
                         "(logical now; physically purged by --maintain / "
                         "--retrain). Terminal per id")
    ap.add_argument("--maintain", action="store_true",
                    help="recover + purge takedowns + compact store files + "
                         "expire snapshots")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    if not (args.vectors_parquet or args.topk_ids or args.retrain
            or args.maintain or args.delete_ids):
        print("config error: need --vectors-parquet, --topk-ids, --retrain, "
              "--delete-ids and/or --maintain", file=sys.stderr)
        return 2

    spark = get_spark("incremental-ann", cores=args.cores)
    ann = IncrementalANN(spark, args.store, n_centroids=args.n_centroids)
    summary: dict = {"store": os.path.abspath(args.store)}
    if args.delete_ids:
        ids = [int(s) for s in args.delete_ids.split(",") if s.strip()]
        summary["deleted"] = ann.delete(ids, id_col=args.id_col)
    if args.vectors_parquet:
        stats: dict = {}
        n = ann.add_batch(
            spark.read.parquet(args.vectors_parquet),
            id_col=args.id_col, vec_col=args.vec_col, stats=stats,
        )
        summary["ingested"] = n
        summary.update(stats)
    if args.retrain:
        ann.retrain(iters=args.iters, n_centroids=args.grow_centroids)
        summary["retrained_iters"] = args.iters
        summary["n_centroids"] = ann.n_centroids
    if args.topk_ids:
        ids = [int(s) for s in args.topk_ids.split(",") if s.strip()]
        stats = {}
        out = ann.topk(query_ids=ids, k=args.k, n_probe=args.n_probe, stats=stats)
        if args.out_parquet:
            out.write.mode("overwrite").parquet(args.out_parquet)
            summary["out"] = args.out_parquet
        summary["topk_rows"] = out.count()
        summary["probe"] = {
            "clusters": stats.get("probed_clusters"),
            "files_read": stats.get("files_read"),
            "files_total": stats.get("files_total"),
        }
    if args.maintain:
        summary["maintenance"] = ann.maintain()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
