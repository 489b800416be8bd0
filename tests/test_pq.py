"""Product quantization: codebook wire format, encode determinism,
ADC candidate quality, and rerank parity with the exact baseline."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.pq import (
    PQCodebook, pq_encode, pq_fit, pq_topk)
from outrank_spark.operators.similarity import brute_force_topk

DIM = 32


@pytest.fixture(scope="module")
def emb(spark):
    # 12 well-separated cluster centers, 50 points each, deterministic
    rng = np.random.Generator(np.random.PCG64(7))
    centers = rng.standard_normal((12, DIM)) * 4.0
    rows = []
    i = 0
    for c in range(12):
        for _ in range(50):
            v = centers[c] + rng.standard_normal(DIM) * 0.3
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()


@pytest.fixture(scope="module")
def queries(spark, emb):
    qs = [(r["vec_id"], r["embedding"])
          for r in emb.filter(F.col("vec_id") % 100 == 3).collect()]
    return spark.createDataFrame(
        qs, "query_id long, qv array<double>").cache()


class TestCodebook:
    def test_fit_shapes_and_wire_roundtrip(self, emb):
        cb = pq_fit(emb, m=4, nbits=4, sample_size=400)
        assert (cb.m, cb.ksub, cb.dsub) == (4, 16, DIM // 4)
        back = PQCodebook.from_bytes(cb.to_bytes())
        np.testing.assert_array_equal(back.centroids, cb.centroids)

    def test_fit_validation(self, emb):
        with pytest.raises(ValueError, match="not divisible"):
            pq_fit(emb, m=5)
        with pytest.raises(ValueError, match="need m > 0"):
            pq_fit(emb, m=0)
        with pytest.raises(ValueError, match="centroids must be"):
            PQCodebook(np.zeros((2, 2)))


class TestEncode:
    def test_deterministic_and_partition_invariant(self, emb):
        cb = pq_fit(emb, m=4, nbits=4)
        a = {r["vec_id"]: list(r["pq_code"])
             for r in pq_encode(emb, cb).collect()}
        b = {r["vec_id"]: list(r["pq_code"])
             for r in pq_encode(emb.repartition(7), cb).collect()}
        assert a == b and len(a) == 600
        assert all(len(c) == 4 for c in a.values())

    def test_codes_match_numpy_argmin(self, emb):
        cb = pq_fit(emb, m=4, nbits=4)
        got = {r["vec_id"]: list(r["pq_code"])
               for r in pq_encode(emb, cb).collect()}
        pdf = emb.toPandas().set_index("vec_id")
        for vid in list(got)[::37]:
            v = np.asarray(pdf.loc[vid, "embedding"], dtype=np.float64)
            v = v / np.linalg.norm(v)
            sub = v.reshape(4, DIM // 4)
            want = [int(np.linalg.norm(cb.centroids[j] - sub[j],
                                       axis=1).argmin())
                    for j in range(4)]
            assert got[vid] == want

    def test_null_vectors_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0] * DIM), (2, None)],
            "vec_id long, embedding array<double>")
        cb = PQCodebook(np.zeros((4, 2, DIM // 4)) + [[0.1], [0.9]])
        out = pq_encode(df, cb).collect()
        assert [r["vec_id"] for r in out] == [1]


class TestTopK:
    def test_matches_brute_force_with_rerank(self, emb, queries):
        exact = brute_force_topk(emb, queries, k=10)
        approx = pq_topk(emb, queries, k=10, m=8, nbits=6,
                         rerank_factor=8)
        want = {(r["query_id"], r["rank"]): r["vec_id"]
                for r in exact.collect()}
        got = {(r["query_id"], r["rank"]): r["vec_id"]
               for r in approx.collect()}
        # recall@10 against the exact top-10, per query
        hits = sum(got[k] == v for k, v in want.items() if k in got)
        assert hits / len(want) >= 0.95, hits / len(want)

    def test_precomputed_codes_path_identical(self, emb, queries):
        cb = pq_fit(emb, m=8, nbits=6)
        codes = pq_encode(emb, cb).cache()
        a = pq_topk(emb, queries, k=5, codebook=cb, codes=codes)
        b = pq_topk(emb, queries, k=5, m=8, nbits=6)
        rows = lambda df: sorted(
            (r["query_id"], r["rank"], r["vec_id"]) for r in df.collect())
        assert rows(a) == rows(b)

    def test_compression_ratio(self, emb):
        cb = pq_fit(emb, m=8, nbits=8)
        # 32 doubles (256 B) -> 8 codes: the point of PQ
        assert cb.m * 1 <= 8
        assert cb.dim == DIM

    def test_validation(self, emb, queries):
        with pytest.raises(ValueError, match="rerank_factor"):
            pq_topk(emb, queries, k=5, rerank_factor=0)
