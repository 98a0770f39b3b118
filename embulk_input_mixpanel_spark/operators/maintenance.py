"""Table maintenance: tombstone vacuum (+ room for compaction policies).

Delete tombstones are only needed while an event older than the delete
could still arrive — i.e. within the stream's lateness horizon. Once the
committed cursor has passed ``tombstone.event_seq + horizon``, the
tombstone can be physically dropped. This is the CDC analog of Iceberg's
``expire_snapshots``/``rewrite_data_files`` maintenance actions: an
offline, snapshot-atomic rewrite, never on the ingest hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.checkpoint import get_cursor
from ..sources.lake import LakeTable

__all__ = ["vacuum_tombstones"]


def vacuum_tombstones(table: LakeTable, horizon: int = 0) -> int:
    """Rewrite buckets, dropping tombstones with seq <= cursor - horizon.

    Returns the new snapshot version (or current version if nothing to do).
    Cost: one full scan + rewrite of buckets that still hold eligible
    tombstones — run it as periodic maintenance, amortized across many
    batches.
    """
    cutoff = get_cursor(table) - horizon
    full = table.read(include_tombstones=True)
    eligible = full.filter((F.col("op") == "D") & (F.col("event_seq") <= F.lit(cutoff)))
    nb = table.num_buckets
    buckets = sorted(
        r[0]
        for r in eligible.select(
            F.pmod(F.xxhash64("repo", "path"), F.lit(nb)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    if not buckets:
        return table.version
    kept = (
        table.read(buckets=buckets, include_tombstones=True)
        .filter(~((F.col("op") == "D") & (F.col("event_seq") <= F.lit(cutoff))))
        .withColumn("bucket", F.pmod(F.xxhash64("repo", "path"), F.lit(nb)).cast("int"))
    )
    snap = table.commit_rewrite(kept, buckets, properties={"last_vacuum_cutoff": cutoff})
    return snap.version
