"""Property-based correctness: arbitrary event streams -> oracle equality.

Hypothesis drives the *shape* of the stream (ops mix, duplicate rate, key
cardinality, batch sizes, out-of-order commit ties); the engine's
distributed replay must equal the single-threaded oracle for every shape.
Spark session reuse keeps each example cheap; examples are capped for CI
time.
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from embulk_input_mixpanel_spark.runner import open_or_create, replay

from .oracle import engine_final_state

pytestmark = pytest.mark.usefixtures("spark")


ROW_ST = st.lists(
    st.tuples(
        st.integers(0, 5),                      # repo idx
        st.integers(0, 7),                      # path idx
        st.integers(0, 20),                     # commit_seq (ties likely)
        st.sampled_from(["I", "U", "U", "D"]),  # op mix
    ),
    min_size=1,
    max_size=60,
)


def _mk_events(spark, raw):
    rows = []
    for seq, (r, p, cs, op) in enumerate(raw):
        content = f"v-{r}-{p}-{cs}-{seq}"
        rows.append(
            (
                f"e{seq}", seq, 1_700_000_000_000 + seq, op, r % 3,
                f"repo-{r}", f"f{p}", f"c{cs}", cs, "python", content, "{}",
            )
        )
    # duplicates: re-deliver every 4th row verbatim
    rows += [rows[i] for i in range(0, len(rows), 4)]
    cols = [
        "event_id", "event_seq", "ts_ms", "op", "source_partition",
        "repo", "path", "commit", "commit_seq", "lang", "content", "props",
    ]
    return spark.createDataFrame(rows, cols), rows


def _oracle(rows):
    best = {}
    for row in rows:
        key = (row[5], row[6])
        order = (row[8], row[1], row[0])
        if key not in best or order >= best[key][0]:
            best[key] = (order, row)
    out = {}
    for key, (_, row) in best.items():
        if row[3] != "D":
            out[key] = {
                "commit": row[7],
                "commit_seq": row[8],
                "event_seq": row[1],
                "event_id": row[0],
                "content_sha": hashlib.sha256(row[10].encode()).hexdigest(),
            }
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=ROW_ST, slice_div=st.integers(1, 4))
def test_replay_equals_oracle_for_arbitrary_streams(spark, tmp_path_factory, raw, slice_div):
    ev, rows = _mk_events(spark, raw)
    n = max(r[1] for r in rows) + 1
    d = str(tmp_path_factory.mktemp("prop"))
    table = open_or_create(spark, d, num_buckets=4)
    replay(table, ev, upper_bound=n, slice_size=max(n // slice_div, 1), lineage=False)
    assert engine_final_state(table.read()) == _oracle(rows)
