"""IngestConfig validation + optimistic-concurrency commit guard."""

import pytest
from pyspark.sql import types as T

from embulk_input_mixpanel_spark.config import IngestConfig
from embulk_input_mixpanel_spark.plans.windows import ConfigError
from embulk_input_mixpanel_spark.sources.lake import ConcurrentCommitError, LakeTable


def test_config_valid_defaults():
    cfg = IngestConfig(table_path="/tmp/t", slice_size=1000)
    assert cfg.auto_evolve
    assert cfg.apply_kwargs() == {"promoted_keys": None, "auto_evolve": True, "reserved_keys": []}


@pytest.mark.parametrize(
    "kwargs",
    [
        {"slice_size": 0},
        {"slice_size": 100, "backfill": -1},
        {"slice_size": 100, "num_buckets": 0},
        {"slice_size": 100, "timezone": "Not/AZone"},
        {"slice_size": 100, "promote_props": True, "residual_only": True},
        {"slice_size": 100, "promote_props": False, "residual_only": True,
         "promoted_keys": ("a",)},
    ],
)
def test_config_rejects_bad_combinations(kwargs):
    """(reference: validate_config + mutually-exclusive escape hatches,
    export_service.rb:28-34; timezone_validator.rb:6-14)"""
    with pytest.raises(ConfigError):
        IngestConfig(table_path="/tmp/t", **kwargs)


def test_config_residual_only_mode():
    cfg = IngestConfig(table_path="/tmp/t", slice_size=10,
                       promote_props=False, residual_only=True)
    assert cfg.apply_kwargs() == {"promoted_keys": [], "auto_evolve": False, "reserved_keys": []}


SCHEMA = T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.LongType())])


def test_concurrent_commit_detected(spark, tmp_table_dir):
    """A commit planned against a stale snapshot must fail loudly."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, num_buckets=2)
    anchored = t.version  # writer A plans here

    # writer B sneaks in a metadata commit
    t.commit_properties({"x": 1})

    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame([("a", 1)], SCHEMA)
        .withColumn("bucket", F.pmod(F.xxhash64("k"), F.lit(2)).cast("int"))
    )
    with pytest.raises(ConcurrentCommitError):
        t.commit_rewrite(df, [0, 1], expected_version=anchored)
    with pytest.raises(ConcurrentCommitError):
        t.commit_properties({"y": 2}, expected_version=anchored)
    # un-anchored commit still works (single-writer mode)
    t.commit_rewrite(df, [0, 1])
    assert t.read().count() == 1


def test_cli_entrypoints_validate_args_without_spark():
    """Both CLIs fail fast (exit 2) on invalid arg combinations BEFORE a
    SparkSession is built — config errors must not cost a JVM launch."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load(name):
        spec = importlib.util.spec_from_file_location(name, os.path.join(root, "bin", f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    ingest = load("ingest")
    # missing bounds without --maintain
    assert ingest.main(["--table", "/tmp/x", "--gen-events", "10"]) == 2
    # bad timezone
    assert ingest.main(["--table", "/tmp/x", "--gen-events", "10",
                        "--upper-bound", "10", "--slice-size", "5",
                        "--timezone", "Mars/Olympus"]) == 2
    dedup = load("dedup")
    # neither a batch nor maintenance requested
    assert dedup.main(["--store", "/tmp/x"]) == 2
