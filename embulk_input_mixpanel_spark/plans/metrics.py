"""Per-batch lineage & throughput metrics.

The reference logs skipped-duplicate / invalid-record counters per slice
(reference: lib/embulk/input/service/export_service.rb:84,90,104,124-126,
134-139). Here every committed batch appends one JSON line per batch to
``<table>/_lineage/lineage.jsonl`` — driver-side (a few hundred bytes per
batch, no Spark job), readable back as a DataFrame via ``spark.read.json``
for monitoring queries. The lineage write happens AFTER the snapshot
commit; if the process dies between the two, the snapshot (source of
truth) wins and the lineage row is regenerated on the idempotent re-run.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    from ..operators.apply import ApplyResult

__all__ = ["record_lineage", "read_lineage"]

_LINEAGE_DIR = "_lineage"
_LINEAGE_FILE = "lineage.jsonl"


def record_lineage(table_path: str, result: "ApplyResult", run_id: str = "") -> dict:
    row = {
        "run_id": run_id,
        "batch_index": result.batch_index,
        "version": result.version,
        "committed": result.committed,
        "rows_in": result.rows_in,
        "rows_skipped_hwm": result.rows_skipped_hwm,
        "keys_upserted": result.keys_upserted,
        "rows_in_touched_after": result.rows_in_touched_after,
        "touched_buckets": result.touched_buckets,
        "new_prop_keys": result.new_prop_keys,
        "hwm_after": {str(k): v for k, v in sorted(result.hwm_after.items())},
        "seconds": round(result.seconds, 3),
        "events_per_sec": round(result.rows_in / result.seconds, 1) if result.seconds else None,
        "wall_clock": time.time(),
        "stage_timings": result.extra.get("timings", {}),
    }
    d = os.path.join(table_path, _LINEAGE_DIR)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, _LINEAGE_FILE), "a") as fh:
        fh.write(json.dumps(row, sort_keys=True) + "\n")
    return row


def read_lineage(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.json(os.path.join(table_path, _LINEAGE_DIR, _LINEAGE_FILE))
