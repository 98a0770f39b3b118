"""Percentile tiers: exact for gate-sized data, sketch-based at scale.

``exact`` uses ``F.percentile`` — a true linear-interpolation quantile that
materializes each group's full value distribution on its reducer. Correct,
engine-portable (DuckDB ``quantile_cont`` matches bit-for-bit), and the
right tool while groups fit in executor memory.

``approx`` uses ``F.approx_percentile`` (Greenwald-Khanna sketch): bounded
memory per group regardless of group size, MERGEABLE — so it partial-
aggregates map-side like any DeclarativeAggregate, and the shuffle carries
one sketch per (group, map task) instead of every value. That is the
100 TB path: a skewed mega-group costs O(accuracy) memory, not O(rows).
Guarantee: the returned value's RANK is within ``n/accuracy`` of the exact
target rank (tested in tests/test_operators.py with the bound asserted).

``auto`` picks exact below ``exact_rows_max`` input rows (one column-less
count — parquet metadata, no payload read) and approx above, so callers
write one query and get the scale-appropriate plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_percentiles"]

# above this, per-group distributions stop being a safe reducer-memory bet
DEFAULT_EXACT_ROWS_MAX = 10_000_000


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    names: Sequence[str] | None = None,
    mode: str = "auto",
    accuracy: int = 10_000,
    exact_rows_max: int = DEFAULT_EXACT_ROWS_MAX,
    n_rows: int | None = None,
) -> DataFrame:
    """Per-group percentiles of ``value_col`` with a selectable tier.

    mode='exact'  -> F.percentile (linear interpolation, oracle-portable)
    mode='approx' -> F.approx_percentile (GK sketch, rank error <= n/accuracy,
                     map-side mergeable — the at-scale tier)
    mode='auto'   -> exact when the input is under ``exact_rows_max`` rows,
                     approx otherwise. NOTE: auto runs ``df.count()`` — an
                     extra Spark job per call (cheap for a bare parquet
                     scan, where it answers from footer metadata, but a
                     full computation for a derived frame). Callers in a
                     loop, or who already know the cardinality, should
                     pass ``n_rows`` (used instead of counting) or pick
                     the tier explicitly.
    """
    if names is None:
        names = [f"p{int(p * 100)}" for p in ps]
    if len(names) != len(ps):
        raise ValueError(f"names ({len(names)}) must match ps ({len(ps)})")
    if mode == "auto":
        n = n_rows if n_rows is not None else df.count()
        mode = "exact" if n <= exact_rows_max else "approx"
    if mode == "exact":
        aggs = [F.percentile(value_col, p).alias(nm) for p, nm in zip(ps, names)]
    elif mode == "approx":
        aggs = [
            F.approx_percentile(value_col, p, accuracy).cast("double").alias(nm)
            for p, nm in zip(ps, names)
        ]
    else:
        raise ValueError(f"mode must be exact|approx|auto, got {mode!r}")
    return df.groupBy(*group_cols).agg(*aggs)
