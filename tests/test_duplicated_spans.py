"""duplicated_spans_exact (operators/dedup.py) vs an independent
pure-Python coverage-merge implementation, plus hand-built span
geometry edges (overlap merge, adjacency split, sub-L docs)."""
from __future__ import annotations

from collections import Counter

import pytest

from outrank_spark.operators.dedup import duplicated_spans_exact


def _python_spans(docs, L):
    grams = Counter()
    tokd = {}
    for did, text in docs:
        toks = text.split(" ") if text else [""]
        tokd[did] = toks
        for i in range(len(toks) - L + 1):
            grams[" ".join(toks[i:i + L])] += 1
    out = {}
    for did, toks in tokd.items():
        pos = [
            i + 1
            for i in range(len(toks) - L + 1)
            if grams[" ".join(toks[i:i + L])] >= 2
        ]
        # merge rule mirrors the operator: grams at p and p' overlap
        # iff p' <= p + L - 1 (strictly-adjacent coverage is split)
        merged = []  # [start, last_gram_pos]
        for p in pos:
            if merged and p <= merged[-1][1] + L - 1:
                merged[-1][1] = p
            else:
                merged.append([p, p])
        n_spans = len(merged)
        dup_tokens = sum(last + L - 1 - s + 1 for s, last in merged)
        out[did] = (len(toks), n_spans, dup_tokens)
    return out


def _check(spark, docs, L):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"],
                      r["dup_frac"])
        for r in duplicated_spans_exact(df, min_length=L).collect()
    }
    want = _python_spans(docs, L)
    assert set(got) == set(want)
    for did, (nt, ns, dt) in want.items():
        assert got[did][:3] == (nt, ns, dt), (did, got[did], (nt, ns, dt))
        assert got[did][3] == pytest.approx(round(dt / nt, 6))
    return got


def test_planted_duplicate_block(spark):
    block = " ".join(f"b{i}" for i in range(10))          # 10 tokens
    docs = [
        (0, f"u0a u0b u0c {block} t0x t0y"),
        (1, f"v1a {block} v1b v1c v1d v1e"),
        (2, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),          # unique
    ]
    got = _check(spark, docs, L=4)
    # the 10-token block is fully duplicated in docs 0 and 1
    assert got[0][1] == 1 and got[0][2] == 10
    assert got[1][1] == 1 and got[1][2] == 10
    assert got[2] == (11, 0, 0, 0.0)


def test_adjacent_coverage_stays_split_and_overlap_merges(spark):
    # doc 0 repeats grams at positions that OVERLAP (merge into one
    # span) vs doc 2/3 sharing two far-apart grams (two spans)
    a = "x1 x2 x3 x4 x5"                                   # 5 tokens
    docs = [
        (0, f"{a} m1 m2 {a}"),          # self-repeat, far apart
        (2, f"p1 {a} p2 p3 p4 {a} p5"),
        (3, "q1 q2 q3 q4 q5 q6 q7 q8"),
    ]
    got = _check(spark, docs, L=5)
    assert got[0][1] == 2               # two distinct spans in doc 0
    assert got[2][1] == 2


def test_short_and_empty_docs(spark):
    docs = [(0, "a b c"), (1, ""), (2, "a b c")]
    got = _check(spark, docs, L=8)      # all shorter than L
    for did in (0, 1, 2):
        assert got[did][1:3] == (0, 0)


def test_whole_doc_duplicates_and_partition_invariance(spark):
    text = " ".join(f"t{i % 7}" for i in range(20))
    docs = [(i, text) for i in range(4)] + [(9, "z1 z2 z3 z4 z5 z6 z7 z8 z9")]
    _check(spark, docs, L=8)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {r["doc_id"]: r["dup_tokens"]
         for r in duplicated_spans_exact(df.repartition(1),
                                         min_length=8).collect()}
    b = {r["doc_id"]: r["dup_tokens"]
         for r in duplicated_spans_exact(df.repartition(6, "doc_id"),
                                         min_length=8).collect()}
    assert a == b
    assert a[0] == 20                   # fully duplicated doc


def test_min_length_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_length"):
        duplicated_spans_exact(df, min_length=1)
