#!/usr/bin/env python
"""spark-submit entrypoint: replay a change stream into a lake table.

Usage (local test):
    python bin/ingest.py --table /data/repo_files --events-parquet /data/stream \
        --upper-bound 1000000 --slice-size 250000

Usage (cluster):
    python bin/package.py                       # builds dist/engine.zip
    spark-submit --py-files dist/engine.zip bin/ingest.py \
        --table hdfs://.../repo_files --events-jsonl s3://.../changes/ \
        --upper-bound 10000000000 --slice-size 100000000 --backfill 1000000

The job is resumable: re-running with the same table continues from the
snapshot checkpoint (cursor + per-partition HWMs); `--gen-events N` runs
the deterministic built-in generator instead of reading files (bench &
smoke path, no external data).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_input_mixpanel_spark.plans.windows import ConfigError, validate_timezone
from embulk_input_mixpanel_spark.runner import open_or_create, preview, replay
from embulk_input_mixpanel_spark.session import get_spark
from embulk_input_mixpanel_spark.sources.genevents import change_events
from embulk_input_mixpanel_spark.sources.jsonl import read_jsonl_events


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True, help="lake table root path")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--events-parquet", help="parquet change-stream path")
    src.add_argument("--events-jsonl", help="JSONL change-stream path")
    src.add_argument("--gen-events", type=int, help="generate N synthetic events")
    src.add_argument("--maintain", action="store_true",
                     help="maintenance mode: compact small files + expire old "
                          "snapshots, no ingest (safe beside live writers)")
    ap.add_argument("--upper-bound", type=int,
                    help="event_seq upper bound locked at plan time")
    ap.add_argument("--slice-size", type=int, help="events per micro-batch")
    ap.add_argument("--min-files", type=int, default=8,
                    help="maintenance: compact buckets holding > this many files")
    ap.add_argument("--keep-snapshots", type=int, default=10,
                    help="maintenance: snapshots retained by expiry")
    ap.add_argument("--vacuum-grace", type=float, default=3600.0,
                    help="maintenance: only delete orphan files older than "
                         "this many seconds (protects in-flight commits)")
    ap.add_argument("--backfill", type=int, default=0, help="lateness re-read horizon (events)")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--allow-partial", action="store_true",
                    help="tolerate truncated JSONL records (counted, skipped)")
    ap.add_argument("--preview", action="store_true", help="dry run: first slice, 10 rows")
    ap.add_argument("--timezone", default="UTC", help="validated; session runs UTC")
    ap.add_argument("--reserved-keys", default="",
                    help="comma-separated system prop keys: never promoted, "
                         "excluded from props_rest (KNOWN_KEYS analog)")
    ap.add_argument("--writer-id", default="",
                    help="checkpoint namespace for concurrent writers over "
                         "disjoint source partitions (cursor_seq:<id>)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    try:
        validate_timezone(args.timezone)
    except ConfigError as exc:
        print(f"config error: {exc}", file=sys.stderr)
        return 2

    if not args.maintain and (args.upper_bound is None or args.slice_size is None):
        print("config error: --upper-bound and --slice-size are required "
              "unless --maintain", file=sys.stderr)
        return 2

    spark = get_spark("cdc-ingest", cores=args.cores)
    table = open_or_create(spark, args.table, num_buckets=args.num_buckets)

    if args.maintain:
        snap, stats = table.compact(min_files=args.min_files + 1)
        removed = table.expire_snapshots(keep_last=args.keep_snapshots)
        orphans = table.vacuum_orphans(grace_seconds=args.vacuum_grace)
        print(json.dumps({**stats, "files_expired": len(removed),
                          "orphans_vacuumed": len(orphans),
                          "table_version": table.version,
                          "compacted": snap is not None}))
        return 0

    if args.events_parquet:
        events = spark.read.parquet(args.events_parquet)
    elif args.events_jsonl:
        from embulk_input_mixpanel_spark.sources.jsonl import IncompleteStreamError

        try:
            events = read_jsonl_events(
                spark, args.events_jsonl, allow_partial=args.allow_partial
            ).df
        except IncompleteStreamError as exc:
            print(f"input error: {exc} (pass --allow-partial to keep good rows)",
                  file=sys.stderr)
            return 3
    else:
        events = change_events(spark, args.gen_events)

    if args.preview:
        rows = preview(table, events, args.upper_bound, args.slice_size).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        return 0

    reserved = [k for k in args.reserved_keys.split(",") if k]
    report = replay(
        table, events, upper_bound=args.upper_bound,
        slice_size=args.slice_size, backfill=args.backfill,
        apply_kwargs={"reserved_keys": reserved} if reserved else None,
        writer_id=args.writer_id,
    )
    summary = {
        "batches": len(report.batches),
        "rows_in": report.rows_in,
        "rows_skipped": report.rows_skipped,
        "keys_upserted": report.keys_upserted,
        "seconds": round(report.seconds, 2),
        "events_per_sec": round(report.rows_in / report.seconds, 1) if report.seconds else None,
        "table_version": table.version,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
