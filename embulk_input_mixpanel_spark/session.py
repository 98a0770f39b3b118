"""SparkSession factory with deterministic, scale-minded defaults.

All engine entry points go through :func:`get_spark` so tests, the bench
harness, and `spark-submit` jobs share one configuration story:

- **UTC session timezone** — epoch/timestamp semantics must be identical to
  the DuckDB oracle and to the reference's tz-normalized epochs
  (reference: lib/embulk/input/service/base_service.rb:43-51).
- **AQE on** (coalesce partitions + skew-join splitting) — the runtime
  half of the skew story for the MERGE shuffle; explicit salting in
  ``operators.merge`` is the planning half.
- **Arrow on** — every Python-executed transform is a vectorized
  pandas/Arrow UDF (input_hint: "no per-row Python").
- **Shuffle partitions scale with cores** — the same job must scale
  N -> 4N cores with >=0.8 efficiency; a fixed 200 would serialize small
  stages at low core counts and under-split at high ones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "cdc-ingest",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the engine.

    ``cores`` controls ``local[N]``; on a real cluster the same configs are
    passed via spark-submit and master is left alone.
    """
    cores = cores or default_parallelism()
    # 2 shuffle partitions per core: enough splits for AQE to coalesce
    # down, not so many that task overhead dominates at local scale.
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
