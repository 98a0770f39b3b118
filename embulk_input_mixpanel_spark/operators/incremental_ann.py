"""Incremental ANN: a persistent IVF index where the lake bucketing IS
the index.

Batch-mode IVF (operators/similarity.py::ivf_topk) re-assigns the whole
corpus per query run. A training pipeline ingests embeddings
INCREMENTALLY (the reference's whole design is incremental windows —
export_service.rb:59-65), so the index must be incremental too: per new
batch, assign ONLY the new vectors against frozen centroids (a broadcast
join + max-of-struct argmax, O(batch)) and append them to a lake table
bucketed BY CLUSTER with ``num_buckets == n_centroids``. That makes the
physical layout the inverted file: probing a cluster == opening exactly
that lake bucket's parquet files, so a top-k probe reads
``n_probe / n_centroids`` of the corpus bytes at any corpus size — the
file-level pruning the IVF paper promises, realized through snapshot
file lists instead of a custom storage engine.

Two lake tables:
- ``cent``    (centroid_id int, cv array<double>) — the tiny broadcast
  dim, trained once from the FIRST batch (the ``n_centroids`` lowest-id
  vectors, matching similarity.ivf_assign's deterministic seeding so the
  incremental path is oracle-comparable against the one-shot SQL);
  re-trained only by an explicit :meth:`retrain` (the standard IVF
  deployment: freeze centroids, periodically rebuild offline).
- ``vectors`` (id long, v array<double>, cluster int, cos_r double,
  batch_seq long), bucket = cluster.

Idempotence: redelivered ids are dropped by an anti-join against a
column-pruned id scan (only the ``id`` column of the parquet files is
read; the vector payload — the fat column — is never touched). Crash
between the first batch's centroid commit and its vector append leaves
valid frozen centroids and no vectors; the redelivered batch then
appends normally. Concurrent writers are rejected by the tables'
optimistic version guard.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.lake import LakeTable
from .similarity import _rebalance, _to_double, cosine

__all__ = ["IncrementalANN"]

_CENT_SCHEMA = T.StructType(
    [
        T.StructField("centroid_id", T.IntegerType()),
        T.StructField("cv", T.ArrayType(T.DoubleType())),
    ]
)


_VEC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType())),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("cos_r", T.DoubleType()),
        T.StructField("batch_seq", T.LongType()),
    ]
)


def _argmax_centroid(scored: DataFrame) -> DataFrame:
    """(id, centroid_id, cos_r) -> best centroid per id, as a partial-agg
    max-of-struct (map-side combine; same pattern as similarity.ivf_assign
    — never a window over the n x n_centroids cross-score)."""
    w = F.max(
        F.struct(
            F.col("cos_r").alias("c"),
            (-F.col("centroid_id")).alias("negid"),
            F.col("centroid_id").alias("cid"),
        )
    ).alias("_w")
    return (
        scored.groupBy("id")
        .agg(w)
        .select("id", F.col("_w.cid").alias("cluster"), F.col("_w.c").alias("cos_r"))
    )


class IncrementalANN:
    """Persistent IVF index + per-batch ingest + bucket-pruned probes."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_centroids: int = 8,
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.n_centroids = n_centroids
        cent_path = os.path.join(self.path, "cent")
        vec_path = os.path.join(self.path, "vectors")
        self.cent = LakeTable(spark, cent_path)
        self.vectors = LakeTable(spark, vec_path)
        if not self.cent.exists():
            self.cent = LakeTable.create(
                spark, cent_path, _CENT_SCHEMA, num_buckets=1,
                properties={"trained": False, "n_centroids": n_centroids},
            )
        if not self.vectors.exists():
            # bucket == cluster: the bucketing IS the inverted file
            self.vectors = LakeTable.create(
                spark, vec_path, _VEC_SCHEMA, num_buckets=n_centroids,
                properties={"batch_seq": 0},
            )

    # ------------------------------------------------------------ internals

    def _centroids(self) -> DataFrame:
        return self.cent.read().select("centroid_id", F.col("cv").alias("_cv"))

    def _train_from(self, vecs: DataFrame) -> None:
        """Seed centroids = the ``n_centroids`` lowest-id vectors of the
        first batch (deterministic — mirrors similarity.ivf_assign, so
        the one-shot SQL oracle stays expressible). Production retrains
        with :meth:`retrain` once enough data has arrived."""
        # TakeOrderedAndProject (distributed top-n) first; the window only
        # ranks the n_centroids survivors — never a global sort
        low = vecs.orderBy("id").limit(self.n_centroids)
        w = Window.orderBy("id")
        cent = (
            low.withColumn("_rn", F.row_number().over(w))
            .select(
                (F.col("_rn") - 1).cast("int").alias("centroid_id"),
                F.col("v").alias("cv"),
            )
        )
        self.cent.commit_rewrite(
            cent.withColumn("bucket", F.lit(0)),
            touched_buckets=[0],
            properties={"trained": True},
            expected_version=self.cent.version,
        )

    # --------------------------------------------------------------- ingest

    def add_batch(
        self,
        batch: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        stats: dict[str, Any] | None = None,
    ) -> int:
        """Assign + append one batch of vectors; returns rows ingested.

        O(batch): broadcast-centroid score of the new vectors only, one
        partial-agg argmax, one append commit (new files only)."""
        batch_seq = int(self.vectors.properties.get("batch_seq", 0)) + 1
        vec_v = self.vectors.version

        vecs = _rebalance(batch).select(
            F.col(id_col).cast("long").alias("id"), _to_double(vec_col).alias("v")
        )
        # idempotence: drop redelivered ids (column-pruned scan — only the
        # id column of the stored files is read, never the vector payload)
        known = self.vectors.read().select("id")
        vecs = vecs.join(known, "id", "left_anti")

        if not bool(self.cent.properties.get("trained")):
            self._train_from(vecs)

        scored = F.broadcast(self._centroids()).join(vecs).select(
            "id", "v", "centroid_id",
            F.round(cosine(F.col("v"), F.col("_cv")), 4).alias("cos_r"),
        )
        assigned = _argmax_centroid(scored.select("id", "centroid_id", "cos_r")).join(
            vecs, "id"
        )
        out = assigned.select(
            "id", "v", "cluster", "cos_r",
            F.lit(batch_seq).cast("long").alias("batch_seq"),
            F.col("cluster").alias("bucket"),
        ).localCheckpoint(eager=True)
        n = out.count()
        if n == 0:
            if stats is not None:
                stats.update(n_new=0)
            return 0
        self.vectors.commit_append(
            out, properties={"batch_seq": batch_seq}, expected_version=vec_v
        )
        if stats is not None:
            stats.update(n_new=n, batch_seq=batch_seq)
        return n

    # ---------------------------------------------------------------- query

    def topk(
        self,
        query_ids: list[int] | None = None,
        k: int = 3,
        n_probe: int = 2,
        stats: dict[str, Any] | None = None,
        query_vectors: DataFrame | None = None,
    ) -> DataFrame:
        """Bucket-pruned probed top-k over the STORED corpus.

        Opens only the probed clusters' lake buckets — the candidate scan
        reads ``n_probe/n_centroids`` of the files however large the
        corpus. Output schema matches similarity.ivf_topk
        (query_id, neighbor_id, cos_r, rnk).

        Queries come from ``query_ids`` (stored vectors, the parity/gate
        path) or ``query_vectors`` (a (query_id, v) frame of RAW vectors
        — the serving path: embed-then-search without ingesting the
        query; self-matches aren't excluded since the query isn't in the
        corpus unless its id is)."""
        if (query_ids is None) == (query_vectors is None):
            raise ValueError("pass exactly one of query_ids / query_vectors")
        cent = self._centroids()
        if query_vectors is not None:
            q = query_vectors.select(
                F.col("query_id").cast("long").alias("query_id"),
                _to_double("v").alias("_qv"),
            )
        else:
            q = (
                self.vectors.read()
                .filter(F.col("id").isin([int(i) for i in query_ids]))
                .select(F.col("id").alias("query_id"), F.col("v").alias("_qv"))
            )
        qc = F.broadcast(q).join(cent).select(
            "query_id", "centroid_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 4).alias("ccos"),
        )
        wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
        probed = (
            qc.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= n_probe)
            .select("query_id", F.col("centroid_id").alias("cluster"))
        )
        # driver collect of <= |q| * n_probe small ints -> file-level pruning
        clusters = sorted({int(r["cluster"]) for r in probed.collect()})
        snap_files = self.vectors.snapshot().files
        cand_src = self.vectors.read(buckets=clusters).select(
            "cluster", F.col("id").alias("neighbor_id"), F.col("v").alias("_nv")
        )
        scored = (
            probed.join(cand_src, "cluster")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "neighbor_id",
                F.round(cosine(F.col("_qv"), F.col("_nv")), 4).alias("cos_r"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("neighbor_id"))
        out = (
            scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k)
        )
        if stats is not None:
            stats.update(
                probed_clusters=clusters,
                files_read=sum(len(snap_files.get(str(c), [])) for c in clusters),
                files_total=sum(len(fl) for fl in snap_files.values()),
            )
        return out

    # ----------------------------------------------------------- maintenance

    def retrain(self, iters: int = 2) -> None:
        """Offline rebuild: Lloyd-refine centroids over the stored corpus,
        re-assign every vector, and REWRITE the vectors table (full CoW —
        the periodic index rebuild, not the per-batch path)."""
        from .similarity import ivf_refine_assign

        corpus = self.vectors.read().select("id", "v")
        assign = ivf_refine_assign(
            corpus, n_centroids=self.n_centroids, id_col="id", vec_col="v",
            iters=iters,
        )
        # recover the refined centroid vectors: exact decimal means per
        # (cluster, dim), identical to ivf_refine_assign's final round
        comp = (
            assign.join(corpus, "id")
            .select("cluster", F.posexplode("v").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(
                F.sum(F.col("x").cast("decimal(25,15)")).alias("s"),
                F.count("*").alias("n"),
            )
            .select("cluster", "d", (F.col("s").cast("double") / F.col("n")).alias("m"))
        )
        cent = comp.groupBy("cluster").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
            ).alias("cv")
        ).select(F.col("cluster").cast("int").alias("centroid_id"), "cv")
        self.cent.commit_rewrite(
            cent.withColumn("bucket", F.lit(0)), touched_buckets=[0],
            properties={"trained": True, "retrained_iters": iters},
        )
        rescored = F.broadcast(self._centroids()).join(corpus).select(
            "id", "centroid_id",
            F.round(cosine(F.col("v"), F.col("_cv")), 4).alias("cos_r"),
        )
        newassign = _argmax_centroid(rescored).join(corpus, "id")
        batch_seq = int(self.vectors.properties.get("batch_seq", 0))
        self.vectors.commit_rewrite(
            newassign.select(
                "id", "v", "cluster", "cos_r",
                F.lit(batch_seq).cast("long").alias("batch_seq"),
                F.col("cluster").alias("bucket"),
            ),
            touched_buckets=list(range(self.n_centroids)),
        )

    def maintain(self, max_files_per_bucket: int = 8, keep_snapshots: int = 10) -> dict:
        """Compact per-batch append files + expire superseded snapshots
        (same valve as IncrementalDeduper.maintain)."""
        _, st = self.vectors.compact(min_files=max_files_per_bucket + 1)
        expired = self.vectors.expire_snapshots(keep_last=keep_snapshots)
        return {
            "buckets_compacted": st["buckets_compacted"],
            "files_in": st["files_in"],
            "files_out": st["files_out"],
            "files_expired": len(expired),
        }
