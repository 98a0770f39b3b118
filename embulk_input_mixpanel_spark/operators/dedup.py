"""Deduplication family for document corpora.

Exact + near-duplicate detection, the way a large-scale training-data
pipeline needs them:

- :func:`fingerprint` / :func:`dedup_exact` — md5 over normalized text,
  hash-groupBy keep-min. One shuffle on the fingerprint.
- :func:`shingles` — word n-gram shingle explosion (JVM ``transform`` over
  a token array; no Python).
- :func:`ngram_jaccard_pairs` — exact Jaccard over shingle sets via a
  shingle self-join. Scale notes: candidate generation joins on the
  shingle value, so ubiquitous shingles create hot keys —
  ``max_shingle_docs`` drops shingles present in more than that many
  documents (standard df-cap; they carry no discriminative signal and
  their pair-blowup is quadratic).
- :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash+LSH:
  signature = per-hash min over shingles (k aggregates in ONE groupBy
  pass), banded into ``n_bands`` bucket keys; only intra-bucket pairs are
  candidates. Cost is linear in corpus + output pairs — the 100 TB path.
  Hash h_i(s) = md5(s || '#' || i) compared as hex strings: string min is
  a perfectly uniform minhash and is reproducible in any engine (the
  DuckDB oracle runs the same formula verbatim).
- :func:`simhash` — 16..64-bit SimHash over tokens using xxhash64 bit
  votes; near-dups differ in few bits (Hamming via xor+bit_count).

All of it is native column algebra — no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "fingerprint",
    "dedup_exact",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_pairs",
]


def normalize_text(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, r"\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """Content fingerprint over whitespace-normalized lowercase text."""
    return F.md5(normalize_text(col))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per fingerprint, keeper = min id."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper"))
    )


def _token_array(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built as transform over index range -> concat_ws of n consecutive
    tokens; explode; distinct. All codegen.
    """
    toks = _token_array(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jac >= threshold)."""
    sh = shingles(df, text_col, id_col, n)
    if max_shingle_docs is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_docs)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def _minhash_expr(i: int) -> Column:
    # hex-string minhash: uniform, engine-portable (md5 exists everywhere)
    return F.min(F.substring(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}"))), 1, 16)).alias(
        f"mh_{i}"
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """k-component MinHash signature per document, one groupBy pass."""
    sh = shingles(df, text_col, id_col, n)
    return sh.groupBy("id").agg(*[_minhash_expr(i) for i in range(k)])


def lsh_candidate_pairs(signatures: DataFrame, k: int = 16, n_bands: int = 4) -> DataFrame:
    """Banded LSH: pairs sharing at least one band bucket (id_a < id_b)."""
    per = k // n_bands
    pairs = None
    for b in range(n_bands):
        key = F.md5(F.concat_ws("|", *[F.col(f"mh_{b * per + j}") for j in range(per)]))
        s = signatures.select(F.col("id"), key.alias("bk"))
        p = (
            s.alias("x")
            .join(s.alias("y"), "bk")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def simhash(
    df: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash: per-bit majority vote of token hashes (xxhash64 bit j)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_token_array(text_col)).alias("tok")
    )
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return agg.select("id", sig.alias("simhash"))


def simhash_pairs(sig: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by Hamming distance over SimHash (id_a < id_b).

    Brute-force comparison — for the banded scale path split the signature
    into (max_hamming+1) segments and join on exact-match segments
    (pigeonhole), same shape as lsh_candidate_pairs.
    """
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
