"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``embulk_input_mixpanel_spark.workloads``;
each query cites its SURVEY.md §2 operator in its docstring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from embulk_input_mixpanel_spark import workloads  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay (plan -> dedup -> latest-wins -> merge ->
    snapshot commit) at sf0.001 scale; returns the final table state."""
    return workloads.flagship_entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workloads.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workloads.ORACLE_SQL)
