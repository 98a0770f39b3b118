"""Deterministic hash-based sampling & dataset splits (training curation).

A 100 TB training pipeline cannot use RNG sampling: `rand()` differs per
run, per retry, and per engine, so a re-run of a failed stage samples a
DIFFERENT subset and breaks exactly-once semantics. Hash sampling fixes
the decision per KEY: a row is kept iff
``base31(salt || key) < fraction * P31`` — a pure column predicate that
is reproducible across runs, partitions-independent, join-free,
stable under retries/backfills (the same doc always lands on the same
side), and expressible identically in any engine (the portable tier's
md5-affine hash replays bit-for-bit in DuckDB — operators/dedup.py:89-95
hash contract).

Stratified variant: per-stratum fractions (e.g. downsample dominant
languages, keep the tail) via one CASE over the stratum column — no
per-stratum scans, no sampleBy RNG. Split assignment maps the same hash
into contiguous ranges (train/val/test), so a key's split never changes
as data grows — the property that keeps eval sets uncontaminated across
incremental ingests.

(The reference has no sampling op — this is training-data breadth per the
project brief; semantics follow the deterministic-splits practice of
large-corpus pipelines.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import P31, base31

__all__ = ["sample_hash", "deterministic_sample", "stratified_sample", "split_assign"]


def sample_hash(key_col: str | Column, salt: str = "", portable: bool = False) -> Column:
    """The sampling decision hash in [0, P31): base31 of salt||key.

    ``portable=True`` uses the md5-affine tier (1 md5 per ROW — fine for
    gate-scale parity checks, NOT for >1M-rows/batch hot paths; the
    xxhash64 tier is the production default — CLAUDE.md hash contract).
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    keyed = F.concat(F.lit(salt), c.cast("string"))
    return base31(keyed, portable=portable)


def _thresh(fraction: float) -> Column:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # integer threshold: both engines compare the SAME ints (no float)
    return F.lit(int(fraction * P31))


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Keep ~fraction of rows, decided per key — stable across runs."""
    return df.filter(sample_hash(key_col, salt, portable) < _thresh(fraction))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic downsampling in ONE scan.

    ``fractions`` maps stratum value -> keep fraction; unlisted strata
    keep ``default_fraction``. The per-stratum threshold is a CASE
    expression, so the whole operation is a single codegen'd filter —
    no per-stratum jobs, no RNG, no shuffle.
    """
    thr: Column = _thresh(default_fraction)
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value), _thresh(frac)).otherwise(thr)
    return df.filter(sample_hash(key_col, salt, portable) < thr)


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    portable: bool = False,
    out_col: str = "split",
) -> DataFrame:
    """Assign each key to one named split by hash range.

    ``weights`` maps split name -> weight (must sum to ~1). Ranges are
    contiguous ``[lo, hi)`` over the hash space in sorted-name order, so
    assignment is deterministic, engine-portable, and IMMUTABLE as the
    corpus grows — a doc ingested next year lands in the same split it
    would have today (eval-set non-contamination under incremental
    ingest).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = sample_hash(key_col, salt, portable)
    expr: Column | None = None
    acc = 0.0
    names = sorted(weights)
    for i, name in enumerate(names):
        acc += weights[name]
        hi = F.lit(P31) if i == len(names) - 1 else F.lit(int(acc * P31))
        expr = F.when(h < hi, F.lit(name)) if expr is None else expr.when(h < hi, F.lit(name))
    return df.withColumn(out_col, expr)
