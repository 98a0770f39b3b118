"""CLI surfaces driven in-process (get_spark getOrCreate reuses the test
session, so main() exercises the full arg->store->JSON path without a JVM
spin-up per case)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bin"))

import ann as ann_cli  # noqa: E402
import dedup as dedup_cli  # noqa: E402


def _last_json(capsys):
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


@pytest.fixture()
def emb_batch(spark, tmp_path):
    p = str(tmp_path / "embs")
    (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    )
    return p


def test_ann_cli_ingest_probe_redeliver_maintain(spark, emb_batch, tmp_table_dir, capsys):
    store = os.path.join(tmp_table_dir, "ann")
    rc = ann_cli.main(["--store", store, "--vectors-parquet", emb_batch,
                       "--topk-ids", "0,1,2", "--k", "3", "--n-probe", "2"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["ingested"] > 0 and out["topk_rows"] == 9
    assert 0 < out["probe"]["files_read"] < out["probe"]["files_total"]

    # redelivery: ingests nothing, store version stable, probes unchanged
    rc = ann_cli.main(["--store", store, "--vectors-parquet", emb_batch,
                       "--topk-ids", "0,1,2", "--maintain"])
    assert rc == 0
    out2 = _last_json(capsys)
    assert out2["ingested"] == 0
    assert out2["topk_rows"] == 9
    assert out2["maintenance"]["recovered"] is False

    # config error without any action
    assert ann_cli.main(["--store", store]) == 2


def test_dedup_cli_rerun_rederives_pairs(spark, tmp_table_dir, tmp_path, capsys):
    docs_p = str(tmp_path / "docs")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(200).write.mode("overwrite").parquet(docs_p)
    )
    store = os.path.join(tmp_table_dir, "dd")
    out_p = str(tmp_path / "pairs")
    rc = dedup_cli.main(["--store", store, "--docs-parquet", docs_p,
                         "--out-parquet", out_p])
    assert rc == 0
    first = _last_json(capsys)
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in spark.read.parquet(out_p).collect()
    }
    assert first["new_pairs"] == len(want) > 0

    # rerun (crash-after-commit shape): out-parquet reproduced, not emptied
    rc = dedup_cli.main(["--store", store, "--docs-parquet", docs_p,
                         "--out-parquet", out_p])
    assert rc == 0
    again = _last_json(capsys)
    assert again.get("redelivered") is True and again["n_new"] == 0
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in spark.read.parquet(out_p).collect()
    }
    assert got == want


def test_ann_cli_delete_and_grow(spark, emb_batch, tmp_table_dir, capsys):
    store = os.path.join(tmp_table_dir, "ann2")
    rc = ann_cli.main(["--store", store, "--vectors-parquet", emb_batch,
                       "--topk-ids", "0", "--k", "1", "--n-probe", "8"])
    assert rc == 0
    victim = None
    out = _last_json(capsys)
    assert out["topk_rows"] == 1
    # find the top-1 neighbor to take down
    from embulk_input_mixpanel_spark.operators.incremental_ann import IncrementalANN
    ann = IncrementalANN(spark, store)
    victim = int(ann.topk(query_ids=[0], k=1, n_probe=8).first()["neighbor_id"])

    rc = ann_cli.main(["--store", store, "--delete-ids", str(victim),
                       "--topk-ids", "0", "--k", "500", "--n-probe", "8"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["deleted"] == 1
    probe = ann.topk(query_ids=[0], k=500, n_probe=8)
    assert probe.filter(f"neighbor_id = {victim}").count() == 0

    # grow the fanout via the CLI; probes still prune files
    rc = ann_cli.main(["--store", store, "--retrain", "--iters", "1",
                       "--grow-centroids", "16",
                       "--topk-ids", "0", "--k", "3", "--n-probe", "2"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["n_centroids"] == 16 and out["topk_rows"] == 3
    assert 0 < out["probe"]["files_read"] < out["probe"]["files_total"]
    # the retrain (full rewrite) physically purged the takedown
    assert ann.vectors.read().filter(f"id = {victim}").count() == 0


def test_dedup_cli_delete_then_maintain_purges(spark, tmp_table_dir, tmp_path, capsys):
    docs_p = str(tmp_path / "docs2")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(100).write.mode("overwrite").parquet(docs_p)
    )
    store = os.path.join(tmp_table_dir, "dd2")
    rc = dedup_cli.main(["--store", store, "--docs-parquet", docs_p])
    assert rc == 0
    _last_json(capsys)
    rc = dedup_cli.main(["--store", store, "--delete-ids", "0,1", "--maintain"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["deleted"] == 2
    assert out["maintenance"]["purged_ids"] == 2
    from embulk_input_mixpanel_spark.operators.incremental_dedup import IncrementalDeduper
    dd = IncrementalDeduper(spark, store)
    assert dd.sigs.read().filter("id IN (0, 1)").count() == 0
