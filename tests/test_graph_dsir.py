"""PageRank (operators/graph.py) and DSIR importance weights
(operators/sampling.dsir_logratio) against independent oracles:
numpy power iteration for the graph recurrence, a pure-Python
counter model for the smoothed log-ratio."""
from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.graph import pagerank, transition_edges
from outrank_spark.operators.sampling import dsir_logratio

# (src, dst, w): node 4 is dangling (no out-edges), node 0 is a hub
EDGES = [
    (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
    (2, 3, 1.0), (3, 4, 5.0), (1, 4, 1.0),
]


def _numpy_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = Counter()
    for s, _, w in edges:
        outw[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = sum(r[idx[v]] for v in nodes if outw[v] == 0)
        c = np.zeros(n)
        for s, d, w in edges:
            c[idx[d]] += w / outw[s] * r[idx[s]]
        r = (1 - damping) / n + damping * (c + dm / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = spark.createDataFrame(EDGES, "src int, dst int, w double")
    got = {
        row["node"]: row["rank"]
        for row in pagerank(edges, weight="w").collect()
    }
    want = _numpy_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # mass conservation is exact in the recurrence (dangling mass is
    # redistributed, not dropped)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_partitioning_invariance(spark):
    edges = spark.createDataFrame(EDGES, "src int, dst int, w double")
    a = pagerank(edges.repartition(1), weight="w").collect()
    b = pagerank(edges.repartition(7, "dst"), weight="w").collect()
    ra = {r["node"]: r["rank"] for r in a}
    rb = {r["node"]: r["rank"] for r in b}
    assert set(ra) == set(rb)
    for v in ra:
        assert ra[v] == pytest.approx(rb[v], abs=1e-12)


def test_pagerank_unweighted_uniform_cycle(spark):
    # a pure cycle has the uniform stationary distribution regardless
    # of damping — a closed-form anchor independent of the oracle
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src int, dst int",
    )
    got = pagerank(cyc, iterations=25).collect()
    for row in got:
        assert row["rank"] == pytest.approx(0.2, abs=1e-12)


def test_pagerank_drops_null_and_nonpositive_weights(spark):
    # a zero weight would make frac = 0/0 = NaN and poison every
    # rank; a null weight would silently drop mass while its source
    # still counted as non-dangling — both edges must be ignored
    dirty = EDGES + [(0, 3, 0.0), (2, 4, None), (1, 0, -2.0)]
    edges = spark.createDataFrame(dirty, "src int, dst int, w double")
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, weight="w").collect()}
    want = _numpy_pagerank(EDGES)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_transition_edges_counts_and_self_loops(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "a"),
            (2, 1, "b"), (2, 2, "a"),
        ],
        "user int, t int, page string",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in transition_edges(ev, "user", ["t"], "page").collect()
    }
    # user 1: a->b, b->b (self, dropped), b->a; user 2: b->a
    assert got == {("a", "b"): 1.0, ("b", "a"): 2.0}
    with_loops = {
        (r["src"], r["dst"]): r["weight"]
        for r in transition_edges(
            ev, "user", ["t"], "page", drop_self_loops=False,
        ).collect()
    }
    assert with_loops[("b", "b")] == 1.0


def test_pagerank_resumes_from_checkpointed_ranks(spark):
    # 10 straight iterations == 5 iterations resumed from a persisted
    # 5-iteration rank table (the mid-job checkpoint/resume shape)
    edges = spark.createDataFrame(EDGES, "src int, dst int, w double")
    straight = {r["node"]: r["rank"]
                for r in pagerank(edges, weight="w",
                                  iterations=10).collect()}
    half = pagerank(edges, weight="w", iterations=5)
    resumed = {r["node"]: r["rank"]
               for r in pagerank(edges, weight="w", iterations=5,
                                 start_ranks=half).collect()}
    assert set(straight) == set(resumed)
    for v in straight:
        assert resumed[v] == pytest.approx(straight[v], abs=1e-12)


# ------------------------------------------------------------------
# DSIR
# ------------------------------------------------------------------

DOCS = [
    (0, "en", "the cat sat on the mat"),
    (1, "en", "the dog sat on the rug"),
    (2, "en", "cat and dog on the mat"),
    (3, "de", "der hund sass auf der matte"),
    (4, "de", "die katze sass auf dem teppich"),
    (5, "de", "the cat sat on der matte"),   # mixed
    (6, "en", "x"),                          # < 2 tokens
    (7, "en", ""),
]


def _python_dsir(docs, targets, alpha=1.0):
    def bigrams(t):
        w = t.split(" ") if t else []
        return [f"{a} {b}" for a, b in zip(w, w[1:])]

    raw, tgt = Counter(), Counter()
    for did, _, text in docs:
        for b in bigrams(text):
            raw[b] += 1
            if did in targets:
                tgt[b] += 1
    R, T, V = sum(raw.values()), sum(tgt.values()), len(raw)
    out = {}
    for did, _, text in docs:
        bs = bigrams(text)
        s = sum(
            math.log((tgt[b] + alpha) / (T + alpha * V))
            - math.log((raw[b] + alpha) / (R + alpha * V))
            for b in bs
        )
        out[did] = (len(bs), s)
    return out


def test_dsir_exact_matches_python_model(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["n_features"], r["logratio"])
        for r in dsir_logratio(docs, F.col("lang") == "en").collect()
    }
    want = _python_dsir(DOCS, targets={0, 1, 2, 6, 7})
    assert set(got) == set(want)
    for did, (nf, s) in want.items():
        assert got[did][0] == nf
        assert got[did][1] == pytest.approx(s, abs=1e-12)
    # in-domain docs outscore out-of-domain ones; empty docs are 0
    assert got[0][1] > got[3][1]
    assert got[6] == (0, 0.0)
    assert got[7] == (0, 0.0)


def test_dsir_hashed_mode_recovers_planted_domain(spark):
    # two disjoint vocabularies; target predicate marks only HALF the
    # A-domain docs — the unmarked A docs must still be pulled up by
    # the shared distribution (the whole point of importance weighting)
    rows = []
    for i in range(60):
        dom = "A" if i % 2 == 0 else "B"
        toks = [f"{dom}{(i * 7 + j) % 9}" for j in range(12)]
        rows.append((i, dom, i % 4 == 0, " ".join(toks)))
    docs = spark.createDataFrame(
        rows, "doc_id long, dom string, is_t boolean, text string",
    )
    scored = dsir_logratio(docs, F.col("is_t"), num_buckets=256)
    pdf = scored.select("doc_id", "dom", "is_t", "logratio").toPandas()
    a_unmarked = pdf[(pdf.dom == "A") & (~pdf.is_t)]["logratio"]
    b_scores = pdf[pdf.dom == "B"]["logratio"]
    assert a_unmarked.min() > b_scores.max()


def test_dsir_bucket_bound_and_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    a = dsir_logratio(docs, F.col("lang") == "en", num_buckets=8)
    b = dsir_logratio(
        docs.repartition(5), F.col("lang") == "en", num_buckets=8,
    )
    pa = {r["doc_id"]: r["logratio"] for r in a.collect()}
    pb = {r["doc_id"]: r["logratio"] for r in b.collect()}
    for did in pa:
        assert pa[did] == pytest.approx(pb[did], abs=1e-12)


def test_dsir_composes_with_weighted_sample(spark):
    # the full DSIR pipeline: importance weights -> resample by them.
    # weighted_sample needs positive weights, so shift by the min
    # (rank-preserving); in-domain docs must dominate the kept set.
    from pyspark.sql import functions as SF

    from outrank_spark.operators.sampling import weighted_sample

    rows = []
    for i in range(200):
        dom = "A" if i % 2 == 0 else "B"
        toks = [f"{dom}{(i * 7 + j) % 9}" for j in range(12)]
        rows.append((i, dom, i % 4 == 0, " ".join(toks)))
    docs = spark.createDataFrame(
        rows, "doc_id long, dom string, is_t boolean, text string",
    )
    scored = dsir_logratio(docs, F.col("is_t"), num_buckets=256)
    stats = scored.agg(SF.min("logratio").alias("__lo"))
    shifted = (
        scored.crossJoin(SF.broadcast(stats))
        .withColumn("w", SF.col("logratio") - SF.col("__lo") + 1e-9)
        .drop("__lo")
    )
    kept = weighted_sample(shifted, "w", frac=0.3).toPandas()
    assert 0 < len(kept) < 200
    share_a = (kept["dom"] == "A").mean()
    assert share_a > 0.8  # domain-A docs dominate the resample


def test_dsir_rejects_nonpositive_buckets(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_logratio(docs, F.lit(True), num_buckets=0)


def test_dsir_rejects_colliding_columns(spark):
    docs = spark.createDataFrame(
        [(0, "t", 1.0)], "doc_id long, text string, logratio double",
    )
    with pytest.raises(ValueError, match="dsir_logratio"):
        dsir_logratio(docs, F.lit(True))


def _numpy_hits(edges, iterations=10):
    nodes = sorted({s for s, d in edges} | {d for s, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = A.T @ h
        nz = np.linalg.norm(a)
        a = a / nz if nz > 0 else a * 0.0
        h = A @ a
        nz = np.linalg.norm(h)
        h = h / nz if nz > 0 else h * 0.0
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}


class TestHits:
    EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4), (1, 4)]

    def test_matches_numpy_power_iteration(self, spark):
        from outrank_spark.operators.graph import hits
        df = spark.createDataFrame(self.EDGES, "src int, dst int")
        got = {r["node"]: (r["hub"], r["authority"])
               for r in hits(df, iterations=10).collect()}
        want = _numpy_hits(self.EDGES)
        assert set(got) == set(want)
        for v in want:
            assert got[v][0] == pytest.approx(want[v][0], abs=1e-9), v
            assert got[v][1] == pytest.approx(want[v][1], abs=1e-9), v

    def test_pure_source_and_sink(self, spark):
        from outrank_spark.operators.graph import hits
        # 0 -> 1 -> 2: node 0 is never linked (authority 0), node 2
        # links nowhere (hub 0)
        df = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
        got = {r["node"]: r for r in hits(df, iterations=5).collect()}
        assert got[0]["authority"] == 0.0
        assert got[2]["hub"] == 0.0
        assert got[1]["hub"] > 0 and got[1]["authority"] > 0

    def test_duplicate_edges_collapse(self, spark):
        from outrank_spark.operators.graph import hits
        once = spark.createDataFrame(self.EDGES, "src int, dst int")
        dup = once.unionByName(once)
        a = sorted(map(tuple, hits(once, iterations=6).collect()))
        b = sorted(map(tuple, hits(dup, iterations=6).collect()))
        assert a == b

    def test_empty_graph(self, spark):
        from outrank_spark.operators.graph import hits
        df = spark.createDataFrame([], "src int, dst int")
        assert hits(df, iterations=3).collect() == []
