"""Property-based invariants for duplicated_spans_exact and
edit_distance_join: random tiny-alphabet corpora (the adversarial
regime — heavy gram repetition, accidental cross-doc overlap) against
the same pure-Python oracles the hand-built tests pin."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from outrank_spark.operators.dedup import duplicated_spans_exact
from outrank_spark.operators.similarity import edit_distance_join

from tests.test_duplicated_spans import _python_spans
from tests.test_editdist_join import _brute

SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 3-symbol vocab, 0-14 tokens/doc: dense repeats + sub-L docs
texts = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14)
    .map(" ".join),
    min_size=1, max_size=10,
)

# short strings over a 3-letter alphabet: repeat-heavy, near the
# contract floor, many accidental matches
strings = st.lists(
    st.text(alphabet="xyz", min_size=0, max_size=8),
    min_size=1, max_size=10,
)


@given(docs=texts, L=st.integers(min_value=2, max_value=5))
@settings(**SETTINGS)
def test_spans_match_python_model(spark, docs, L):
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"])
        for r in duplicated_spans_exact(df, min_length=L).collect()
    }
    assert got == _python_spans(rows, L)


@given(ss=strings, d=st.integers(min_value=0, max_value=2))
@settings(**SETTINGS)
def test_editdist_join_matches_bruteforce(spark, ss, d):
    rows = list(enumerate(ss))
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in edit_distance_join(df, "s", id_col="id",
                                    max_distance=d, q=2).collect()
    }
    assert got == _brute(rows, d, 2)
