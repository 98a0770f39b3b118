#!/usr/bin/env python
"""spark-submit entrypoint: incremental near-dup detection over a corpus.

Maintains a persistent MinHash/LSH store (two lake tables) and ingests
document batches O(batch): only new docs are shingled/hashed; their band
keys join the stored index; candidates are exactly rescored. Re-running
with an already-ingested batch leaves the store untouched (id anti-join)
and re-derives that batch's original pair output from stored signatures,
so --out-parquet is idempotent under reruns; crashes roll forward on the
next run — the same at-least-once -> exactly-once contract as the CDC
ingest CLI.

Usage:
    python bin/dedup.py --store /data/dedup_store \
        --docs-parquet /data/docs_batch.parquet [--threshold 0.85] \
        [--out-parquet /data/new_pairs] [--maintain]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_input_mixpanel_spark.operators.incremental_dedup import IncrementalDeduper
from embulk_input_mixpanel_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True, help="dedup store root path")
    ap.add_argument("--docs-parquet", help="parquet batch with (doc_id, text)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--k", type=int, default=24, help="minhash signature length")
    ap.add_argument("--n-bands", type=int, default=8)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--max-shingle-docs", type=int, default=None,
                    help="persistent df-cap: drop shingles present in more "
                         "than this many docs (boilerplate belt; fixed at "
                         "store creation)")
    ap.add_argument("--out-parquet", help="write this batch's NEW pairs here")
    ap.add_argument("--delete-ids", default=None,
                    help="takedown: comma-separated doc ids to delete from "
                         "the store (logical now; physically purged by "
                         "--maintain). Terminal per id: a deleted doc is "
                         "never re-ingested")
    ap.add_argument("--maintain", action="store_true",
                    help="purge pending takedowns + compact store files + "
                         "expire snapshots after ingest (or standalone when "
                         "no batch is given)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    if not args.docs_parquet and not args.maintain and not args.delete_ids:
        print("config error: need --docs-parquet, --delete-ids and/or --maintain",
              file=sys.stderr)
        return 2

    spark = get_spark("incremental-dedup", cores=args.cores)
    dd = IncrementalDeduper(
        spark, args.store, k=args.k, n_bands=args.n_bands, n=args.ngram,
        threshold=args.threshold, max_shingle_docs=args.max_shingle_docs,
    )
    summary: dict = {"store": os.path.abspath(args.store)}
    if args.delete_ids:
        ids = [int(s) for s in args.delete_ids.split(",") if s.strip()]
        summary["deleted"] = dd.delete(ids, id_col=args.id_col)
    if args.docs_parquet:
        stats: dict = {}
        batch = spark.read.parquet(args.docs_parquet)
        pairs = dd.add_batch(
            batch, text_col=args.text_col, id_col=args.id_col, stats=stats,
        )
        if stats.get("n_new") == 0 and batch.limit(1).count() > 0:
            # fully-redelivered batch (e.g. rerun after a crash between
            # the store commits and the pair write below): re-derive the
            # pairs it originally emitted so the overwrite is idempotent
            # instead of silently replacing them with an empty frame
            pairs = dd.redelivered_pairs(batch, id_col=args.id_col)
            summary["redelivered"] = True
        if args.out_parquet:
            pairs.write.mode("overwrite").parquet(args.out_parquet)
            summary["out"] = args.out_parquet
        summary["new_pairs"] = pairs.count()
        summary.update(stats)
    if args.maintain:
        summary["maintenance"] = dd.maintain()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
