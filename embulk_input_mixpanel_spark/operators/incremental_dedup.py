"""Incremental cross-batch near-dup detection: O(batch) per ingest step.

Batch-mode dedup (operators/dedup.py) recomputes signatures over the whole
corpus per run. A training pipeline ingests INCREMENTALLY (the reference's
entire design is incremental windows — export_service.rb:59-65), so dedup
must be incremental too: per new batch, shingle/hash ONLY the new docs and
join them against persisted state.

State lives in two append-only lake tables (sources/lake.py snapshots —
atomic commits, time travel, bucket-pruned reads):

- ``sigs``    (id, shs, mh_0..mh_{k-1}, batch_seq), bucketed by id —
  the per-doc shingle set + MinHash signature, read back ONLY for docs
  that appear in candidate pairs (bucket-pruned by id).
- ``buckets`` (band, bk, id, batch_seq), bucketed by (band, bk) —
  the LSH band index. A new batch's band keys join against it to find
  old->new candidates; reads prune to the lake buckets its keys hash
  into, so a small batch touches a fraction of the index files.

Cost model per batch (the 100 TB story): shingling/hashing is O(batch)
(the expensive text explosion never re-touches old docs); the index join
is one hash join keyed (band, bk) against bucket-pruned index files; the
exact rescore reads only candidate docs' signature rows. Appends are
:meth:`LakeTable.commit_append` — new files only, never a copy-on-write
of history, so commit cost is O(batch) regardless of corpus size.

Crash consistency: ``sigs`` commits FIRST, then ``buckets``; both carry
``batch_seq``. If a crash lands between the two commits, the next
``add_batch`` ROLLS FORWARD: band keys are pure functions of the stored
mh columns, so the dangling batch's index rows are recomputed from
exactly the parquet files its sigs commit added (snapshot file-diff —
O(batch), no store scan). Redelivered batches are dropped by an
id anti-join against ``sigs`` (bucket-pruned), making ingestion
idempotent. Concurrent writers are rejected by the tables' optimistic
version guard.

The df-cap (``max_shingle_docs``) of the batch operators is deliberately
absent here: document frequency is a global-corpus statistic that shifts
as batches arrive; hot-key safety comes from the LSH bucket-size cap
instead (same belt as dedup.lsh_candidate_pairs, applied to the COMBINED
old+new bucket occupancy).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.lake import LakeTable
from .dedup import _derived, _minhash_band_keys, _rebalance, base31, shingles

__all__ = ["IncrementalDeduper"]

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)


def _sig_schema(k: int) -> T.StructType:
    # shs holds xxhash64(shingle), not the shingle text: Jaccard over an
    # injective-enough hash equals Jaccard over the strings (64-bit
    # collision odds ~1e-8 at 1M distinct shingles), the sig table stores
    # 8 bytes per shingle instead of its text, and the exact-rescore
    # array_intersect compares longs instead of strings
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("shs", T.ArrayType(T.LongType())),
            *[T.StructField(f"mh_{i}", T.LongType()) for i in range(k)],
            T.StructField("batch_seq", T.LongType()),
        ]
    )


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bk", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("batch_seq", T.LongType()),
    ]
)


class IncrementalDeduper:
    """Persistent MinHash-LSH dedup state + per-batch ingest.

    ``add_batch(docs)`` returns the NEW near-dup pairs this batch creates
    (new-new and old-new; old-old pairs were reported when their batch
    arrived) and commits the batch's signatures + band index.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 24,
        n_bands: int = 8,
        n: int = 3,
        threshold: float = 0.85,
        portable: bool = False,
        max_bucket_size: int = 1000,
        num_buckets: int = 32,
    ):
        if k % n_bands != 0:
            raise ValueError(f"k ({k}) must be divisible by n_bands ({n_bands})")
        self.spark = spark
        self.path = os.path.abspath(path)
        self.k, self.n_bands, self.n = k, n_bands, n
        self.threshold = threshold
        self.portable = portable
        self.max_bucket_size = max_bucket_size
        sig_path = os.path.join(self.path, "sigs")
        buck_path = os.path.join(self.path, "buckets")
        self.sigs = LakeTable(spark, sig_path)
        self.buckets = LakeTable(spark, buck_path)
        if not self.sigs.exists():
            self.sigs = LakeTable.create(
                spark, sig_path, _sig_schema(k), num_buckets=num_buckets,
                properties={"batch_seq": 0, "k": k, "n_bands": n_bands, "n": n},
            )
        if not self.buckets.exists():
            self.buckets = LakeTable.create(
                spark, buck_path, _BUCKET_SCHEMA, num_buckets=num_buckets,
                properties={"batch_seq": 0},
            )

    # ------------------------------------------------------------ internals

    def _added_files(self, table: LakeTable) -> list[str]:
        """Absolute paths of the files the table's LATEST commit added —
        the snapshot file-diff against its parent (O(batch) recovery
        reads, never a store scan)."""
        snap = table.snapshot()
        parent = table.snapshot(snap.parent) if snap.parent is not None else None
        old = set(parent.all_files()) if parent else set()
        return [
            os.path.join(table.path, f)
            for f in snap.all_files()
            if f not in old
        ]

    def _band_index_rows(self, sig_df: DataFrame, batch_seq) -> DataFrame:
        keys = _minhash_band_keys(self.k, self.n_bands)
        return sig_df.select(
            F.posexplode(keys).alias("band", "bk"),
            F.col("id"),
            F.lit(batch_seq).cast("long").alias("batch_seq"),
        )

    def recover(self) -> bool:
        """Roll forward a crash between the sigs and buckets commits.

        Returns True if recovery ran. The dangling batch's index rows are
        recomputed from the mh columns of exactly the files its sigs
        commit added."""
        sig_seq = int(self.sigs.properties.get("batch_seq", 0))
        buck_seq = int(self.buckets.properties.get("batch_seq", 0))
        if sig_seq == buck_seq:
            return False
        if sig_seq != buck_seq + 1:
            raise RuntimeError(
                f"dedup store corrupt: sigs at batch {sig_seq}, band index at "
                f"{buck_seq} — more than one dangling batch should be impossible"
            )
        paths = self._added_files(self.sigs)
        dangling = (
            self.spark.read.schema(self.sigs.schema).parquet(*paths)
            if paths
            else self.spark.createDataFrame([], self.sigs.schema)
        )
        rows = self._band_index_rows(dangling.drop("batch_seq"), sig_seq)
        self.buckets.commit_append(
            rows.withColumn("bucket", self.buckets.bucket_expr("band", "bk")),
            properties={"batch_seq": sig_seq},
            expected_version=self.buckets.version,
        )
        return True

    def _lake_buckets_of(self, df: DataFrame, table: LakeTable, *cols: str) -> list[int]:
        """Distinct lake-bucket ids the given key columns hash into —
        a driver collect of at most ``num_buckets`` integers, used to
        prune store reads to the files the batch can possibly match."""
        rows = (
            df.select(table.bucket_expr(*cols).alias("b")).distinct().collect()
        )
        return sorted(int(r["b"]) for r in rows)

    def maintain(
        self, max_files_per_bucket: int = 8, keep_snapshots: int = 10
    ) -> dict[str, int]:
        """Background maintenance: compact buckets that accumulated too
        many per-batch append files, then expire superseded snapshots.

        add_batch appends >=1 file per lake bucket per batch, so after B
        batches a band-key read opens O(B) files per pruned bucket;
        compaction restores O(1). Pure physical rewrite — pair output is
        unaffected (tests pin parity) — and safe beside a live writer
        (LakeTable.compact skips buckets that change under it)."""
        out: dict[str, int] = {}
        for name, table in (("sigs", self.sigs), ("buckets", self.buckets)):
            _, st = table.compact(min_files=max_files_per_bucket + 1)
            expired = table.expire_snapshots(keep_last=keep_snapshots)
            out[f"{name}_buckets_compacted"] = st["buckets_compacted"]
            out[f"{name}_files_in"] = st["files_in"]
            out[f"{name}_files_out"] = st["files_out"]
            out[f"{name}_files_expired"] = len(expired)
        return out

    # --------------------------------------------------------------- ingest

    def add_batch(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        stats: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Ingest one batch; return its NEW near-dup pairs
        (id_a < id_b, jaccard >= threshold, at least one side new).

        The returned frame is eagerly localCheckpoint'ed, so it stays
        valid after the commits and carries no store lineage.
        """
        ran_recovery = self.recover()
        batch_seq = int(self.sigs.properties.get("batch_seq", 0)) + 1
        sig_v, buck_v = self.sigs.version, self.buckets.version

        ids = docs.select(F.col(id_col).cast("long").alias("id"))
        id_lake_buckets = self._lake_buckets_of(ids, self.sigs, "id")
        known = self.sigs.read(buckets=id_lake_buckets).select("id")
        fresh = (
            _rebalance(docs)
            .select(F.col(id_col).cast("long").alias(id_col), F.col(text_col))
            .join(known, F.col(id_col) == known.id, "left_anti")
        )

        # ONE explosion of the batch -> per-doc shingle set + signature
        sh = shingles(fresh, text_col, id_col, self.n, max_shingle_docs=None)
        hs = _derived(base31("shingle", self.portable), self.k)
        perdoc = sh.groupBy("id").agg(
            F.collect_set(F.xxhash64("shingle")).alias("shs"),
            *[F.min(h).alias(f"mh_{i}") for i, h in enumerate(hs)],
        ).localCheckpoint(eager=True)
        n_new = perdoc.count()

        empty = self.spark.createDataFrame([], PAIR_SCHEMA)
        if n_new == 0:
            if stats is not None:
                stats.update(n_new=0, recovered=ran_recovery)
            return empty

        # band keys of the batch, grouped into per-bucket id lists
        newb = self._band_index_rows(perdoc, batch_seq)
        new_keys = newb.groupBy("band", "bk").agg(F.collect_set("id").alias("new_ids"))

        # old side: prune the band index to the lake buckets the batch's
        # keys hash into, SEMI-JOIN the batch's key set BEFORE aggregating
        # (the aggregate must see O(batch-matching) index rows, never the
        # whole stored index — groupBy-then-join would re-aggregate the
        # full corpus index every batch), then ONE hash join on (band, bk)
        key_lake_buckets = self._lake_buckets_of(newb, self.buckets, "band", "bk")
        snap_files = self.buckets.snapshot().files
        new_key_set = new_keys.select("band", "bk")
        stored = (
            self.buckets.read(buckets=key_lake_buckets)
            .join(F.broadcast(new_key_set), ["band", "bk"], "left_semi")
            .groupBy("band", "bk")
            .agg(F.collect_set("id").alias("old_ids"))
        )
        combined = new_keys.join(stored, ["band", "bk"], "left").select(
            "band", "bk", "new_ids",
            F.coalesce(F.col("old_ids"), F.expr("CAST(array() AS ARRAY<BIGINT>)")).alias("old_ids"),
        )
        # bucket-size belt over the COMBINED occupancy (same rationale as
        # dedup.lsh_candidate_pairs — a mega-bucket is a mass-duplicate
        # signal, not a candidate source)
        combined = combined.filter(
            (F.size("new_ids") + F.size("old_ids")) <= self.max_bucket_size
        )
        new_new = (
            combined.filter(F.size("new_ids") >= 2)
            .select(F.explode("new_ids").alias("id_a"), "new_ids")
            .select("id_a", F.explode("new_ids").alias("id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
        )
        old_new = (
            combined.filter(F.size("old_ids") >= 1)
            .select(F.explode("old_ids").alias("oid"), "new_ids")
            .select("oid", F.explode("new_ids").alias("nid"))
            .select(
                F.least("oid", "nid").alias("id_a"),
                F.greatest("oid", "nid").alias("id_b"),
            )
        )
        cand = new_new.unionByName(old_new).distinct()

        # exact rescore: shingle sets from the in-flight batch plus a
        # bucket-pruned read of ONLY the candidate old docs' sig rows
        old_ids = cand.select(F.col("id_a").alias("id")).unionByName(
            cand.select(F.col("id_b").alias("id"))
        ).join(perdoc.select("id"), "id", "left_anti").distinct()
        old_lake_buckets = self._lake_buckets_of(old_ids, self.sigs, "id")
        old_sigs = (
            self.sigs.read(buckets=old_lake_buckets)
            .join(old_ids, "id", "left_semi")
            .select("id", "shs")
        )
        allsigs = perdoc.select("id", "shs").unionByName(old_sigs)
        a = allsigs.select(F.col("id").alias("id_a"), F.col("shs").alias("shs_a"))
        b = allsigs.select(F.col("id").alias("id_b"), F.col("shs").alias("shs_b"))
        inter = F.size(F.array_intersect("shs_a", "shs_b"))
        pairs = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(
                    inter / (F.size("shs_a") + F.size("shs_b") - inter), 6
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .localCheckpoint(eager=True)  # valid past the commits below
        )

        # two-phase append: sigs first, buckets second (recover() rolls
        # the index forward if we die in between)
        self.sigs.commit_append(
            perdoc.withColumn("batch_seq", F.lit(batch_seq).cast("long"))
            .withColumn("bucket", self.sigs.bucket_expr("id")),
            properties={"batch_seq": batch_seq},
            expected_version=sig_v,
        )
        self.buckets.commit_append(
            newb.withColumn("bucket", self.buckets.bucket_expr("band", "bk")),
            properties={"batch_seq": batch_seq},
            expected_version=buck_v,  # captured after recover(), so exact
        )

        if stats is not None:
            total_files = sum(len(fl) for fl in snap_files.values())
            read_files = sum(
                len(snap_files.get(str(bkt), [])) for bkt in key_lake_buckets
            )
            stats.update(
                n_new=n_new,
                batch_seq=batch_seq,
                recovered=ran_recovery,
                index_files_total=total_files,
                index_files_read=read_files,
                index_lake_buckets_read=len(key_lake_buckets),
                index_lake_buckets_total=self.buckets.num_buckets,
                sig_lake_buckets_read=len(old_lake_buckets),
            )
        return pairs
