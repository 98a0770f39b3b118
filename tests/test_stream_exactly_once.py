"""Streaming end-to-end exactly-once: kill-and-restart + concurrent batch writer.

Composes the two already-proven pieces into the deployment shape
(VERDICT r2 #8): a Structured-Streaming writer (``stream_replay``,
``writer_id="stream"``) draining a landing directory is HARD-KILLED
(os._exit) inside foreachBatch *after* the engine commit but *before*
Spark commits the epoch to the streaming checkpoint — the known
at-least-once hole of foreachBatch. Its restart therefore REPLAYS that
epoch while a concurrent batch writer (``writer_id="batch"``) races it
on the same table with interleaved optimistic commits.

Exactly-once must still hold end to end: the replayed epoch is absorbed
by the latest-wins merge (stale versions lose; redelivery is a no-op on
state), the namespaced cursors keep either writer from planning away the
other's windows, and ConcurrentCommitError retries re-anchor each losing
commit — so the final table equals the single-writer oracle over the
full stream. Real processes (two JVMs + a kill), not mocks: lock/staging
races and checkpoint-replay interleavings only exist across processes.
"""

import os
import subprocess
import sys
import textwrap

from embulk_input_mixpanel_spark.runner import open_or_create
from embulk_input_mixpanel_spark.sources.genevents import change_events

from .oracle import engine_final_state, oracle_final_state

N = 2000
SEED = 31
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STREAMER = textwrap.dedent(
    """
    import os, sys
    table_path, src, ckpt, crash_after = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    )
    from embulk_input_mixpanel_spark.session import get_spark
    from embulk_input_mixpanel_spark.runner import open_or_create
    import embulk_input_mixpanel_spark.streaming.stream as stream_mod

    spark = get_spark("streamer", cores=2)
    spark.sparkContext.setLogLevel("ERROR")
    t = open_or_create(spark, table_path, num_buckets=8)
    if crash_after > 0:
        real = stream_mod.apply_batch
        state = {"applied": 0}

        def crashing(*a, **k):
            r = real(*a, **k)
            state["applied"] += 1
            if state["applied"] >= crash_after:
                # engine commit landed; streaming checkpoint for this
                # epoch has NOT — restart must replay it (the hole)
                print(f"CRASHING after epoch {state['applied']}", flush=True)
                os._exit(137)
            return r

        stream_mod.apply_batch = crashing
    stream_mod.stream_replay(
        spark, t, src, ckpt, max_files_per_trigger=2,
        writer_id="stream", retry_limit=20, retry_wait=0.2,
    )
    print("STREAM DONE", flush=True)
    """
)

_BATCHER = textwrap.dedent(
    """
    import sys
    table_path, n = sys.argv[1], int(sys.argv[2])
    from pyspark.sql import functions as F
    from embulk_input_mixpanel_spark.session import get_spark
    from embulk_input_mixpanel_spark.runner import open_or_create, replay
    from embulk_input_mixpanel_spark.sources.genevents import change_events

    spark = get_spark("batcher", cores=2)
    spark.sparkContext.setLogLevel("ERROR")
    ev = change_events(spark, n, n_repos=12, paths_per_repo=10,
                       dup_rate=0.15, seed=31)
    mine = ev.filter(F.pmod(F.col("source_partition"), F.lit(2)) == 1)
    t = open_or_create(spark, table_path, num_buckets=8)
    rep = replay(t, mine, upper_bound=n, slice_size=250,
                 retry_limit=20, retry_wait=0.2, lineage=False,
                 writer_id="batch")
    print(f"BATCH DONE batches={len(rep.batches)}", flush=True)
    """
)


def test_stream_kill_restart_races_batch_writer_to_oracle_state(
    spark, tmp_table_dir, tmp_path
):
    from pyspark.sql import functions as F

    open_or_create(spark, tmp_table_dir, num_buckets=8)  # children never race CREATE
    ev = change_events(spark, N, n_repos=12, paths_per_repo=10,
                       dup_rate=0.15, seed=SEED)
    evens = ev.filter(F.pmod(F.col("source_partition"), F.lit(2)) == 0)

    # six landing files -> three epochs at maxFilesPerTrigger=2; the
    # streamer dies after epoch 2 with backlog still unread
    src = str(tmp_path / "landing")
    for chunk in range(6):
        evens.filter(F.pmod(F.col("event_seq"), F.lit(6)) == chunk) \
            .coalesce(1).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt")

    s_script, b_script = tmp_path / "streamer.py", tmp_path / "batcher.py"
    s_script.write_text(_STREAMER)
    b_script.write_text(_BATCHER)
    env = {**os.environ, "PYTHONPATH": REPO_ROOT}

    # phase 1: streamer alone, hard-killed after its 2nd engine commit
    p1 = subprocess.run(
        [sys.executable, str(s_script), tmp_table_dir, src, ckpt, "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        timeout=600,
    )
    assert p1.returncode == 137, p1.stdout[-2000:]
    assert "CRASHING after epoch 2" in p1.stdout

    # phase 2: streaming restart races the batch writer on the same table
    procs = [
        subprocess.Popen(
            [sys.executable, str(s_script), tmp_table_dir, src, ckpt, "0"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        ),
        subprocess.Popen(
            [sys.executable, str(b_script), tmp_table_dir, str(N)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        ),
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out, tag in zip(procs, outs, ("STREAM DONE", "BATCH DONE")):
        assert p.returncode == 0, out[-2000:]
        assert tag in out, out[-2000:]

    # the partition sets tile the stream: final state == single-writer oracle
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    assert engine_final_state(t.read()) == oracle_final_state(ev.collect())
    # both namespaced cursors advanced; neither clobbered the other
    assert int(t.properties["cursor_seq:batch"]) == N
    assert int(t.properties["cursor_seq:stream"]) >= 0
