"""Incremental IVF index: parity with one-shot, bucket-pruned probes,
idempotence, retrain, compaction."""

import pytest
from pyspark.sql import functions as F

from embulk_input_mixpanel_spark.operators.incremental_ann import IncrementalANN
from embulk_input_mixpanel_spark.operators.similarity import ivf_topk


def _rows(df):
    return {
        (r["query_id"], r["neighbor_id"]): (r["cos_r"], r["rnk"]) for r in df.collect()
    }


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_two_batch_parity_with_one_shot(spark, emb, tmp_table_dir):
    """Batch 1 holds vec_ids 0..7, so the frozen centroids equal the
    one-shot seeding — the incremental probe must be bit-identical to
    similarity.ivf_topk over the union corpus."""
    half = emb.agg(F.max("vec_id")).first()[0] // 2
    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)
    ann.add_batch(emb.filter(F.col("vec_id") <= half))
    ann.add_batch(emb.filter(F.col("vec_id") > half))
    got = _rows(ann.topk(query_ids=[0, 1, 2], k=3, n_probe=2))
    want = _rows(ivf_topk(emb, query_ids=[0, 1, 2], k=3, n_centroids=8, n_probe=2))
    assert got == want and got


def test_probe_opens_only_probed_buckets(spark, emb, tmp_table_dir):
    """The cluster-bucketed layout IS the inverted file: a probe's stats
    must show it opened a strict subset of the index files."""
    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)
    ann.add_batch(emb)
    stats = {}
    out = ann.topk(query_ids=[0], k=3, n_probe=2, stats=stats)
    assert out.count() == 3
    assert len(stats["probed_clusters"]) == 2
    assert 0 < stats["files_read"] < stats["files_total"], stats


def test_redelivered_batch_is_noop(spark, emb, tmp_table_dir):
    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)
    b = emb.filter("vec_id % 2 = 0")
    n1 = ann.add_batch(b)
    v = ann.vectors.version
    assert ann.add_batch(b) == 0
    assert ann.vectors.version == v  # empty batch commits nothing
    assert ann.vectors.read().count() == n1


def test_retrain_rebuilds_index_consistently(spark, emb, tmp_table_dir):
    """Lloyd retrain rewrites centroids + assignments; every vector stays
    indexed exactly once, clusters are in range, and each vector's stored
    assignment is its argmax against the new centroids."""
    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)
    n = ann.add_batch(emb)
    ann.retrain(iters=2)
    vecs = ann.vectors.read()
    assert vecs.count() == n
    assert vecs.select("id").distinct().count() == n
    assert vecs.filter((F.col("cluster") < 0) | (F.col("cluster") >= 8)).count() == 0
    # spot-check: stored cluster == argmax over the stored centroids
    from embulk_input_mixpanel_spark.operators.similarity import cosine

    cent = ann.cent.read().select("centroid_id", F.col("cv").alias("_cv"))
    sample = vecs.limit(20).select("id", "v", "cluster")
    best = (
        F.broadcast(cent).join(sample)
        .select(
            "id", "cluster", "centroid_id",
            F.round(cosine(F.col("v"), F.col("_cv")), 4).alias("c"),
        )
        .groupBy("id", "cluster")
        .agg(F.max(F.struct(F.col("c"), (-F.col("centroid_id")).alias("ng"),
                            F.col("centroid_id").alias("cid"))).alias("w"))
        .filter(F.col("cluster") != F.col("w.cid"))
    )
    assert best.count() == 0
    out = ann.topk(query_ids=[0, 1], k=3, n_probe=2)
    assert out.count() == 6


def test_maintain_compacts_vector_files(spark, emb, tmp_table_dir):
    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)
    for m in range(4):
        ann.add_batch(emb.filter(f"vec_id % 4 = {m}"))
    before = sum(len(fl) for fl in ann.vectors.snapshot().files.values())
    baseline = _rows(ann.topk(query_ids=[0, 1, 2], k=3, n_probe=2))
    st = ann.maintain(max_files_per_bucket=1, keep_snapshots=1)
    after = sum(len(fl) for fl in ann.vectors.snapshot().files.values())
    assert st["buckets_compacted"] >= 1 and after < before
    assert max(len(fl) for fl in ann.vectors.snapshot().files.values()) == 1
    assert _rows(ann.topk(query_ids=[0, 1, 2], k=3, n_probe=2)) == baseline


def test_topk_serves_raw_query_vectors(spark, emb, tmp_table_dir):
    """Serving path: raw (query_id, v) vectors probe the stored index
    without being ingested; results for a stored vector's raw copy equal
    the stored-id probe minus the self-match exclusion."""
    import pytest

    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)
    ann.add_batch(emb)
    raw = (
        emb.filter("vec_id = 0")
        .select(F.lit(9_000_000).alias("query_id"), F.col("embedding").alias("v"))
    )
    got = ann.topk(query_vectors=raw, k=3, n_probe=2).collect()
    assert len(got) == 3
    # neighbor 0 IS stored, and the raw query equals it -> cos 1.0 at rank 1
    top = [r for r in got if r["rnk"] == 1][0]
    assert top["neighbor_id"] == 0 and top["cos_r"] == 1.0
    with pytest.raises(ValueError):
        ann.topk(query_ids=[0], query_vectors=raw)
    with pytest.raises(ValueError):
        ann.topk()


def test_streaming_feed_drives_incremental_ann(spark, emb, tmp_table_dir, tmp_path):
    """Deployment symmetry with the dedup store: a Structured-Streaming
    tail feeds the ANN index one micro-batch at a time; the resulting
    probe equals the batch-built index's probe (same frozen centroids:
    the first epoch holds vec_ids 0..7)."""
    src = str(tmp_path / "emb_landing")
    half = emb.agg(F.max("vec_id")).first()[0] // 2
    emb.filter(F.col("vec_id") <= half).coalesce(1).write.mode("append").parquet(src)
    emb.filter(F.col("vec_id") > half).coalesce(1).write.mode("append").parquet(src)

    ann = IncrementalANN(spark, tmp_table_dir, n_centroids=8)

    def _apply(batch_df, epoch_id):
        ann.add_batch(batch_df)

    (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = _rows(ann.topk(query_ids=[0, 1, 2], k=3, n_probe=2))
    want = _rows(ivf_topk(emb, query_ids=[0, 1, 2], k=3, n_centroids=8, n_probe=2))
    assert got == want and got
