"""Connected components / dedup clustering (operators/components.py).

Large-star/small-star (Kiveris et al. SoCC 2014) vs a driver-side
union-find oracle, plus the canonicalization join.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.components import (
    connected_components,
    duplicate_clusters,
    keep_canonical,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    return {x: min(groups[find(x)]) for x in parent}


class TestConnectedComponents:
    def test_matches_union_find_on_mixed_graph(self, spark):
        edges = (
            [(1, 2), (2, 3), (3, 4)]            # chain
            + [(10, 11), (11, 12), (12, 10)]     # cycle
            + [(20, 21)]                         # pair
            + [(31, 30), (32, 30), (33, 30)]     # star
            + [(i, i + 1) for i in range(100, 120)]  # long chain
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(df).collect()
        }
        assert got == _union_find(edges)

    def test_random_graph_property(self, spark):
        rng = np.random.default_rng(11)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, 300, size=(400, 2))
            if a != b
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(df).collect()
        }
        assert got == _union_find(edges)

    def test_multi_hop_chaining_across_keys(self, spark):
        """A~B via one blocking key, B~C via another -> one cluster of 3
        (the case pairwise dedup can't express)."""
        df = spark.createDataFrame(
            [(2, 1), (3, 2)], "src long, dst long",
        )
        out = duplicate_clusters(df).collect()
        assert len(out) == 1
        assert out[0]["cluster_id"] == 1 and out[0]["n_docs"] == 3

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert connected_components(df).count() == 0

    def test_keep_canonical_keeps_min_and_singletons(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 7, 8, 99]], "doc_id long",
        )
        pairs = spark.createDataFrame(
            [(2, 1), (3, 2), (8, 7)], "src long, dst long",
        )
        kept = sorted(
            r["doc_id"] for r in keep_canonical(docs, pairs).collect()
        )
        assert kept == [1, 7, 99]

    def test_duplicate_and_reversed_edges_are_harmless(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2), (5, 5)], "src long, dst long",
        )
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(df).collect()
        }
        assert got == {1: 1, 2: 1}  # self-loop 5 dropped


class TestGoldenRecords:
    def test_best_quality_wins_with_min_id_ties(self, spark):
        from outrank_spark.operators.components import golden_records

        # component {1,2,3}: quality 5, 9, 9 -> survivor 2 (tie on 9,
        # min id); component {10,11}: survivor 11 (quality 8 > 1)
        docs = spark.createDataFrame(
            [(1, 5), (2, 9), (3, 9), (10, 1), (11, 8), (99, 7)],
            "doc_id long, q long")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long")
        got = {r["cluster_id"]: r for r in
               golden_records(docs, pairs, "q").collect()}
        assert set(got) == {1, 10}          # singleton 99 excluded
        assert (got[1]["survivor_id"], got[1]["survivor_quality"],
                got[1]["n_members"]) == (2, 9, 3)
        assert (got[10]["survivor_id"], got[10]["n_members"]) == (11, 2)

    def test_matches_union_find_argmax(self, spark):
        from outrank_spark.operators.components import golden_records

        rng = np.random.default_rng(11)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 60, size=(80, 2)) if a != b]
        quality = {i: int(q) for i, q in
                   enumerate(rng.integers(0, 20, size=60))}
        docs = spark.createDataFrame(
            [(i, q) for i, q in quality.items()], "doc_id long, q long")
        pairs = spark.createDataFrame(edges, "src long, dst long")
        labels = _union_find(edges)
        want: dict[int, tuple] = {}
        for node, lbl in labels.items():
            cur = want.get(lbl)
            cand = (quality[node], -node)
            if cur is None or cand > cur:
                want[lbl] = cand
        got = {r["cluster_id"]: (r["survivor_quality"],
                                 -r["survivor_id"])
               for r in golden_records(docs, pairs, "q",
                                       min_size=1).collect()}
        assert got == want

    def test_min_size_filter(self, spark):
        from outrank_spark.operators.components import golden_records

        docs = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)],
            "doc_id long, q long")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "src long, dst long")
        assert golden_records(docs, pairs, "q",
                              min_size=3).count() == 1
