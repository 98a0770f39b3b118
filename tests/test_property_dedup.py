"""Property-based dedup invariants: banded == brute, LSH ⊆ exact.

Hypothesis drives corpus shape (vocab size, doc lengths, dup injection);
the structural guarantees must hold for every shape:

- pigeonhole-banded SimHash pairs are EXACTLY the brute-force pairs
  (a mathematical identity, not a tuning property);
- MinHash-LSH -> exact-rescore pairs are a SUBSET of the exact Jaccard
  pairs at the same threshold (the rescore makes false positives
  impossible; only recall is probabilistic), and every exact duplicate
  (identical shingle set -> identical signature) is ALWAYS recovered;
- both hash tiers (xxhash engine / md5 portable) satisfy the same
  invariants.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from embulk_input_mixpanel_spark.operators.dedup import (
    jaccard_pairs_lsh,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    simhash_pairs_banded,
)

pytestmark = pytest.mark.usefixtures("spark")

# small vocab -> shared shingles and near-dups happen organically
CORPUS_ST = st.lists(
    st.lists(st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
             min_size=3, max_size=12),
    min_size=2,
    max_size=12,
)


def _docs(spark, token_lists):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    # inject one verbatim duplicate of doc 0 so an exact-dup pair always exists
    rows.append((len(rows), rows[0][1]))
    return spark.createDataFrame(rows, ["doc_id", "text"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=CORPUS_ST, portable=st.booleans())
def test_simhash_banded_identity(spark, raw, portable):
    docs = _docs(spark, raw)
    sig = simhash(docs, bits=24, portable=portable)
    brute = {(r["id_a"], r["id_b"], r["hamming"])
             for r in simhash_pairs(sig, max_hamming=2).collect()}
    banded = {(r["id_a"], r["id_b"], r["hamming"])
              for r in simhash_pairs_banded(sig, bits=24, max_hamming=2).collect()}
    assert banded == brute


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=CORPUS_ST, portable=st.booleans())
def test_lsh_rescore_subset_of_exact_and_recovers_exact_dups(spark, raw, portable):
    docs = _docs(spark, raw)
    dup_id = docs.count() - 1
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.6, n=2).collect()}
    via = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           jaccard_pairs_lsh(docs, threshold=0.6, n=2, k=24, n_bands=8,
                             portable=portable).collect()}
    assert set(via) <= set(exact)                  # rescore kills false positives
    assert all(via[k] == exact[k] for k in via)    # and scores identically
    # identical shingle sets -> identical signatures -> always a candidate
    assert (0, dup_id) in via and via[(0, dup_id)] == 1.0


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=CORPUS_ST, cut=st.integers(min_value=0, max_value=100))
def test_incremental_union_equals_one_shot(spark, raw, cut, tmp_path_factory):
    """For ANY corpus shape and ANY batch split point, the union of the
    incremental deduper's per-batch outputs equals the one-shot LSH
    recompute over the whole corpus, with no pair reported twice — the
    incremental path is a pure refactoring of the batch path's math."""
    from embulk_input_mixpanel_spark.operators.incremental_dedup import (
        IncrementalDeduper,
    )

    docs = _docs(spark, raw)
    n = docs.count()
    pivot = cut % n
    store = str(tmp_path_factory.mktemp("incprop"))
    dd = IncrementalDeduper(spark, store, k=24, n_bands=8, threshold=0.6,
                            num_buckets=8)
    p1 = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in dd.add_batch(docs.filter(f"doc_id < {pivot}")).collect()}
    p2 = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in dd.add_batch(docs.filter(f"doc_id >= {pivot}")).collect()}
    assert not set(p1) & set(p2)
    want = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs_lsh(
                docs, threshold=0.6, n=3, k=24, n_bands=8,
                max_shingle_docs=None).collect()}
    assert {**p1, **p2} == want
