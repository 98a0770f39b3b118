"""Deterministic synthetic CDC change-event stream.

The stand-in for the reference's remote export API
(reference: lib/embulk/input/mixpanel_api/client.rb:127-156): an unordered,
append-only stream of insert/update/delete events over the source-code repo
table, with the adversarial properties the engine must survive —

- **Zipf-skewed repos** (hot keys) to exercise skew handling,
- **injected duplicates** (same event_id, identical payload) to exercise
  dedup (reference watermark skip: export_service.rb:102-107),
- **commit_seq ties** to exercise the latest-wins tiebreak order,
- **schema evolution**: ``props`` gains a new key partway through the
  stream (the custom_properties analog, export_service.rb:257-265).

Every column is a pure JVM expression of ``event_seq`` (xxhash64 / sha2 /
arithmetic): generation is embarrassingly parallel, never shuffles, and the
row set is bit-identical at any parallelism or scale — which is what lets
the N-core vs 4N-core scaling runs use the very same input without
materializing it. (`spark.range` -> project; wholestage-codegen throughout.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["change_events", "EVENT_COLUMNS"]

EVENT_COLUMNS = [
    "event_id",
    "event_seq",
    "ts_ms",
    "op",
    "source_partition",
    "repo",
    "path",
    "commit",
    "commit_seq",
    "lang",
    "content",
    "props",
]

_LANGS = ["python", "java", "scala", "go", "rust", "ruby", "c", "sql"]


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic 64-bit hash stream, tagged per use-site."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _hex(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic 16-char hex token.

    Built from xxhash64 (lock-free, codegen) rather than md5: Spark's
    crypto-hash expressions funnel through MessageDigest provider lookup,
    which serializes at high thread counts (measured 6x slowdown at
    local[32] on this box); xxhash64 scales linearly.
    """
    return F.lpad(F.conv(F.abs(_h(seed, tag, *cols)).cast("string"), 10, 16), 16, "0")


def change_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    dup_rate: float = 0.10,
    n_source_partitions: int = 8,
    commits_per_tie: int = 4,
    seed: int = 42,
    ts_base_ms: int = 1_700_000_000_000,
    evolve_after: int | None = None,
    partitions: int | None = None,
    hot_repo_fraction: float = 0.0,
) -> DataFrame:
    """Build the event stream as a lazy DataFrame of ``n_events * (1+dup_rate)`` rows.

    Duplicate rows re-derive every column from the duplicated ``event_seq``,
    so a dup is byte-identical to its original (true redelivery semantics).

    ``evolve_after``: events with seq >= this gain a ``branch`` key in
    ``props`` — downstream schema evolution must add the column additively.

    ``hot_repo_fraction``: adversarial skew knob on top of the baseline
    Zipf — this fraction of events is FORCED onto repo-0 (e.g. 0.2 = one
    repo takes 20% of the stream), the monorepo-dominates-the-firehose
    shape that stresses the MERGE shuffle's skew handling.
    """
    n_dups = int(n_events * dup_rate)
    total = n_events + n_dups
    base = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)

    # rows past n_events are redeliveries of a pseudo-random earlier seq
    seq = (
        F.when(F.col("id") < n_events, F.col("id"))
        .otherwise(F.pmod(_h(seed, "dup", F.col("id")), F.lit(n_events)))
        .alias("event_seq")
    )
    df = base.select(seq)

    # Zipf-ish skew: log-uniform repo index => frequency ~ 1/rank.
    u = (F.pmod(_h(seed, "repo", F.col("event_seq")), F.lit(1_000_000)) / 1_000_000.0)
    repo_idx = F.floor(F.pow(F.lit(float(n_repos)), u)) - 1
    if hot_repo_fraction > 0.0:
        hot_u = (
            F.pmod(_h(seed, "hot", F.col("event_seq")), F.lit(1_000_000)) / 1_000_000.0
        )
        repo_idx = F.when(hot_u < F.lit(hot_repo_fraction), F.lit(0)).otherwise(repo_idx)
    path_idx = F.pmod(_h(seed, "path", F.col("event_seq")), F.lit(paths_per_repo))
    opr = F.pmod(_h(seed, "op", F.col("event_seq")), F.lit(100))
    commit_seq = F.floor(F.col("event_seq") / commits_per_tie)

    df = df.select(
        F.concat(_hex(seed, "eid-a", F.col("event_seq")), _hex(seed, "eid-b", F.col("event_seq"))).alias("event_id"),
        F.col("event_seq"),
        (F.lit(ts_base_ms) + F.col("event_seq") * 1000
         + F.pmod(_h(seed, "jit", F.col("event_seq")), F.lit(1000))).alias("ts_ms"),
        F.when(opr < 20, F.lit("I"))
        .when(opr < 85, F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("op"),
        repo_idx.alias("_repo_idx"),
        path_idx.alias("_path_idx"),
        commit_seq.alias("commit_seq"),
    )

    df = df.select(
        "event_id",
        "event_seq",
        "ts_ms",
        "op",
        F.pmod(F.xxhash64(F.lit(seed), F.lit("sp"), F.col("_repo_idx")), F.lit(n_source_partitions))
        .cast("int")
        .alias("source_partition"),
        F.concat(F.lit("repo-"), F.col("_repo_idx")).alias("repo"),
        F.concat(
            F.lit("src/"),
            F.pmod(F.col("_path_idx"), F.lit(16)),
            F.lit("/file_"),
            F.col("_path_idx"),
            F.lit(".txt"),
        ).alias("path"),
        F.substring(_hex(seed, "commit", F.col("commit_seq")), 1, 12).alias("commit"),
        "commit_seq",
        F.element_at(
            F.array(*[F.lit(l) for l in _LANGS]),
            (F.pmod(_h(seed, "lang", F.col("_repo_idx")), F.lit(len(_LANGS))) + 1).cast("int"),
        ).alias("lang"),
        # content is a function of (repo, path, commit_seq, event_seq) so every
        # update version differs; ~128 chars of deterministic payload.
        F.concat(
            F.lit("// "),
            F.concat(F.lit("repo-"), F.col("_repo_idx")),
            F.lit(":"),
            F.col("_path_idx"),
            F.lit("@"),
            F.col("commit_seq"),
            F.lit("\n"),
            F.repeat(F.concat(_hex(seed, "body-a", F.col("event_seq")), _hex(seed, "body-b", F.col("event_seq"))), 3),
        ).alias("content"),
        _props_expr(seed, evolve_after).alias("props"),
    )
    return df


def _props_expr(seed: int, evolve_after: int | None) -> F.Column:
    size = F.pmod(_h(seed, "size", F.col("event_seq")), F.lit(100_000))
    mode = F.element_at(
        F.array(F.lit("add"), F.lit("mod"), F.lit("del"), F.lit("ren")),
        (F.pmod(_h(seed, "mode", F.col("event_seq")), F.lit(4)) + 1).cast("int"),
    )
    base = F.concat(F.lit('{"size": '), size, F.lit(', "mode": "'), mode, F.lit('"'))
    if evolve_after is None:
        return F.concat(base, F.lit("}"))
    branch = F.element_at(
        F.array(F.lit("main"), F.lit("dev"), F.lit("release")),
        (F.pmod(_h(seed, "br", F.col("event_seq")), F.lit(3)) + 1).cast("int"),
    )
    return F.when(
        F.col("event_seq") >= evolve_after,
        F.concat(base, F.lit(', "branch": "'), branch, F.lit('"}')),
    ).otherwise(F.concat(base, F.lit("}")))
