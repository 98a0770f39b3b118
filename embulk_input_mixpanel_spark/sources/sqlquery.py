"""Server-side query pushdown — the JQL-script analog.

The reference's JQL mode ships a user script to the server with
``{from_date, to_date}`` params injected, re-guesses the result schema per
script, and rejects reduce-shaped (bare scalar) results
(reference: lib/embulk/input/service/jql_service.rb:32,144-149,192-197,
240-245,259-264; param binding lib/embulk/input/mixpanel_api/client.rb:163-168).

Spark's full-pushdown analog is simply SQL on the session: the "server" is
the cluster. This module keeps the reference's contract pieces — script
validation, parameter binding (safe, via ``spark.sql`` named args, never
string interpolation), and result-shape validation.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..plans.windows import ConfigError

__all__ = ["run_pushdown_query", "validate_script", "validate_result", "source_available"]


def validate_script(sql: str) -> str:
    """Non-empty script required (jql_service.rb:259-264)."""
    if not sql or not sql.strip():
        raise ConfigError("query script must not be empty")
    return sql


def validate_result(df: DataFrame) -> DataFrame:
    """Reject results that aren't record sets (A4, jql_service.rb:240-245).

    The reference refuses JQL ``.reduce()`` outputs (bare integers); the
    analog here is a zero-column projection.
    """
    if len(df.schema.fields) == 0:
        raise ConfigError("query result has no columns — not a record set")
    return df


def run_pushdown_query(
    spark: SparkSession,
    sql: str,
    params: dict[str, Any] | None = None,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Execute a user query with bound parameters against registered views.

    ``params`` bind as named arguments (`:name`) — the injection-safe form
    of the reference's param substitution into the script.
    """
    validate_script(sql)
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
    out = spark.sql(sql, args=params or {})
    return validate_result(out)


def source_available(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    retries: int = 3,
    wait: float = 2.0,
) -> bool:
    """Source reachability precheck with retries — the availability ping
    (reference: mixpanel_available?, client.rb:22-43; used
    base_service.rb:37-41; 3 retries / 2s wait)."""
    import time as _time

    for attempt in range(retries + 1):
        try:
            spark.read.format(fmt).load(path).limit(1).collect()
            return True
        except Exception:  # noqa: BLE001
            if attempt == retries:
                return False
            _time.sleep(wait)
    return False
