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
