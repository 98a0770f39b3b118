"""Streaming ANN ingest end-to-end exactly-once: kill-and-restart.

Mirrors test_stream_exactly_once.py for the IncrementalANN store
(VERDICT r4 #7): a Structured-Streaming tail of an embeddings landing
directory feeds ``IncrementalANN.add_batch`` via foreachBatch and is
HARD-KILLED (os._exit) *after* the store's commits but *before* Spark
commits the epoch to the streaming checkpoint — the known at-least-once
hole of foreachBatch. The restart replays that epoch; the id-bucketed
idempotence index must absorb it (no duplicate vectors ever), and the
store must end exactly-once complete: every corpus id stored exactly
once, probes served from a consistent cluster layout.

Real processes (two JVMs + a kill), not mocks: checkpoint-replay
interleavings only exist across processes.
"""

import os
import subprocess
import sys
import textwrap

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STREAMER = textwrap.dedent(
    """
    import os, sys
    store, src, ckpt, crash_after = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    )
    from embulk_input_mixpanel_spark.session import get_spark
    from embulk_input_mixpanel_spark.operators.incremental_ann import IncrementalANN

    spark = get_spark("ann-streamer", cores=2)
    spark.sparkContext.setLogLevel("ERROR")
    ann = IncrementalANN(spark, store, n_centroids=8)
    state = {"applied": 0}

    def _apply(batch_df, epoch_id):
        ann.add_batch(batch_df)
        state["applied"] += 1
        if 0 < crash_after <= state["applied"]:
            # store commits landed; the streaming checkpoint for this
            # epoch has NOT — restart must replay it (the hole)
            print(f"CRASHING after epoch {state['applied']}", flush=True)
            os._exit(137)

    schema = spark.read.parquet(src).schema
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    print("STREAM DONE", flush=True)
    """
)


def test_ann_stream_kill_restart_is_exactly_once(spark, tmp_table_dir, tmp_path):
    from pyspark.sql import functions as F

    from embulk_input_mixpanel_spark.operators.incremental_ann import IncrementalANN

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    total = emb.count()

    # six landing files -> three epochs at maxFilesPerTrigger=2; the
    # streamer dies after epoch 2 with backlog still unread
    src = str(tmp_path / "landing")
    for chunk in range(6):
        emb.filter(F.pmod(F.col("vec_id"), F.lit(6)) == chunk) \
            .coalesce(1).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt")

    script = tmp_path / "ann_streamer.py"
    script.write_text(_STREAMER)
    env = {**os.environ, "PYTHONPATH": REPO_ROOT}

    # phase 1: hard-killed after its 2nd store commit
    p1 = subprocess.run(
        [sys.executable, str(script), tmp_table_dir, src, ckpt, "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        timeout=600,
    )
    assert p1.returncode == 137, p1.stdout[-2000:]
    assert "CRASHING after epoch 2" in p1.stdout

    # phase 2: restart replays the un-checkpointed epoch, then drains
    p2 = subprocess.run(
        [sys.executable, str(script), tmp_table_dir, src, ckpt, "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        timeout=600,
    )
    assert p2.returncode == 0, p2.stdout[-2000:]
    assert "STREAM DONE" in p2.stdout

    # exactly-once: every corpus id stored exactly once, ids index agrees
    ann = IncrementalANN(spark, tmp_table_dir)
    vecs = ann.vectors.read()
    assert vecs.count() == total
    assert vecs.select("id").distinct().count() == total
    assert ann.ids.read().count() == total
    # the store is consistent: no dangling batch, no epoch lag
    assert ann.recover() is False
    # full-corpus redelivery after the fact is a no-op
    assert ann.add_batch(emb) == 0
    # and probes serve from the healed layout
    assert ann.topk(query_ids=[0, 1], k=3, n_probe=2).count() == 6
