"""Two REAL writer processes, disjoint source partitions, one table.

The multi-writer story (SURVEY.md §7 concurrency risk): each writer
replays its own half of the change stream (source_partition parity) into
the SAME lake table under its own checkpoint namespace (``writer_id`` —
without it the shared window cursor would let one writer plan away
windows whose rows only the OTHER writer carries), with small slices so
commits interleave. The
O_EXCL commit lock makes the optimistic-check -> pointer-swap critical
section mutually exclusive; a writer whose anchor version went stale gets
ConcurrentCommitError and retries the WHOLE batch against the fresh
snapshot (apply_batch re-reads version, HWM map, and target buckets per
attempt), so interleaved commits serialize into some linear history.
Latest-wins is commutative and idempotent across that history, so the
final state must equal the single-writer oracle over the full stream.

Single-process mocks can never catch lock/staging races (round-1 lesson:
a version-numbered staging dir let a losing writer delete the winner's
committed files) — this test races two real JVMs.
"""

import os
import subprocess
import sys
import textwrap

from embulk_input_mixpanel_spark.runner import open_or_create
from embulk_input_mixpanel_spark.sources.genevents import change_events

from .oracle import engine_final_state, oracle_final_state

N = 2000
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import sys
    table_path, parity, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from pyspark.sql import functions as F
    from embulk_input_mixpanel_spark.session import get_spark
    from embulk_input_mixpanel_spark.runner import open_or_create, replay
    from embulk_input_mixpanel_spark.sources.genevents import change_events

    spark = get_spark(f"writer-{parity}", cores=2)
    spark.sparkContext.setLogLevel("ERROR")
    ev = change_events(spark, n, n_repos=12, paths_per_repo=10,
                       dup_rate=0.15, seed=23)
    mine = ev.filter(F.pmod(F.col("source_partition"), F.lit(2)) == parity)
    t = open_or_create(spark, table_path, num_buckets=8)
    rep = replay(t, mine, upper_bound=n, slice_size=250,
                 retry_limit=20, retry_wait=0.2, lineage=False,
                 writer_id=f"w{parity}")
    print(f"WRITER {parity} DONE batches={len(rep.batches)} rows={rep.rows_in}",
          flush=True)
    """
)


def test_disjoint_partition_writers_interleave_to_oracle_state(
    spark, tmp_table_dir, tmp_path
):
    # parent creates the table so children never race CREATE
    open_or_create(spark, tmp_table_dir, num_buckets=8)
    script = tmp_path / "writer.py"
    script.write_text(_CHILD)
    env = {**os.environ, "PYTHONPATH": REPO_ROOT}

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), tmp_table_dir, str(p), str(N)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for p in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "DONE" in out

    # both writers landed: final state == single-writer oracle over the
    # FULL stream (their partition sets tile it)
    t = open_or_create(spark, tmp_table_dir, num_buckets=8)
    ev = change_events(spark, N, n_repos=12, paths_per_repo=10,
                       dup_rate=0.15, seed=23)
    assert engine_final_state(t.read()) == oracle_final_state(ev.collect())
    # each writer's rows all arrived (no lost-update through interleaving);
    # the generator emits dup_rate redeliveries on top of N, so compare to
    # the actual stream size
    n_rows = sum(int(o.split("rows=")[1].split()[0]) for o in outs)
    assert n_rows == ev.count()
