"""Property-based sketch invariants (hypothesis).

The north rule's core algebraic requirement — merges associative,
commutative, and partition-independent to bitwise-equal state — checked
over RANDOMIZED data and RANDOMIZED partitionings, not just the pinned
fixtures in tests/test_sketches.py.  No Spark: these are the pure-numpy
kernels the Spark operators serialize.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from outrank_spark.sketches import (
    BloomFilter,
    BoundedCounter,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    RareValueCounter,
)

SETTINGS = dict(max_examples=25, deadline=None)

values_arrays = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=2000,
).map(lambda xs: np.asarray(xs, dtype=np.int64))

splits = st.integers(min_value=1, max_value=7)
seeds = st.integers(min_value=0, max_value=2 ** 31 - 1)


def _build(cls, chunks, **kw):
    parts = []
    for ch in chunks:
        s = cls(**kw)
        s.update(ch)
        # round-trip through bytes like the Spark blob channel does
        parts.append(cls.from_bytes(s.to_bytes()))
    return parts


def _merge_all(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.merge(p)
    return out


class TestMergePartitionIndependence:
    @given(vals=values_arrays, n=splits)
    @settings(**SETTINGS)
    def test_hll_any_partitioning_is_bitwise_equal(self, vals, n):
        single = HyperLogLog(p=10)
        single.update(vals)
        merged = _merge_all(_build(HyperLogLog, np.array_split(vals, n), p=10))
        assert merged.to_bytes() == single.to_bytes()
        assert merged.estimate() == single.estimate()

    @given(vals=values_arrays, n=splits)
    @settings(**SETTINGS)
    def test_cms_merge_is_exactly_additive(self, vals, n):
        single = CountMinSketch(depth=4, width=256)
        single.update(vals)
        merged = _merge_all(_build(
            CountMinSketch, np.array_split(vals, n), depth=4, width=256))
        assert merged.to_bytes() == single.to_bytes()
        # overestimate-only guarantee on every value present
        uniq, counts = np.unique(vals, return_counts=True)
        est = merged.query_many(uniq)
        assert (est >= counts).all()

    @given(vals=values_arrays, n=splits)
    @settings(**SETTINGS)
    def test_bloom_no_false_negatives_after_merge(self, vals, n):
        merged = _merge_all(_build(
            BloomFilter, np.array_split(vals, n),
            capacity=5000, fpr=0.01))
        assert merged.contains(vals).all()
        single = BloomFilter(capacity=5000, fpr=0.01)
        single.update(vals)
        assert merged.to_bytes() == single.to_bytes()

    @given(vals=values_arrays, n=splits)
    @settings(**SETTINGS)
    def test_counter_merge_order_invariant_bytes(self, vals, n):
        chunks = np.array_split(vals, n)
        fwd = _merge_all(_build(BoundedCounter, chunks, bound=30_000))
        rev = _merge_all(_build(BoundedCounter, chunks[::-1], bound=30_000))
        assert fwd.to_bytes() == rev.to_bytes()

    @given(vals=values_arrays, n=splits)
    @settings(**SETTINGS)
    def test_rare_final_set_partition_independent(self, vals, n):
        single = RareValueCounter(bound=2)
        single.update(vals)
        merged = _merge_all(_build(
            RareValueCounter, np.array_split(vals, n), bound=2))
        assert merged.rare_values() == single.rare_values()


class TestAccuracyBounds:
    @given(seed=seeds)
    @settings(**SETTINGS)
    def test_hll_error_within_published_bound(self, seed):
        rng = np.random.default_rng(seed)
        n_distinct = int(rng.integers(500, 20_000))
        vals = rng.integers(0, n_distinct, size=n_distinct * 2)
        exact = len(np.unique(vals))
        h = HyperLogLog(p=12)
        h.update(vals)
        sigma = 1.04 / np.sqrt(2 ** 12)
        assert abs(h.estimate() - exact) <= 5 * sigma * exact + 2

    @given(seed=seeds)
    @settings(**SETTINGS)
    def test_kll_rank_error_bound(self, seed):
        rng = np.random.default_rng(seed)
        vals = rng.normal(size=4000)
        k = KLLSketch()
        k.update(vals)
        s = np.sort(vals)
        for q in (0.1, 0.5, 0.9):
            est = k.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) <= max(3 * k.rank_error, 0.02)


class TestSerializationTotality:
    @given(vals=values_arrays)
    @settings(**SETTINGS)
    def test_bytes_round_trip_identity(self, vals):
        for cls, kw in [
            (HyperLogLog, {"p": 10}),
            (CountMinSketch, {"depth": 4, "width": 128}),
            (BloomFilter, {"capacity": 4000, "fpr": 0.01}),
            (BoundedCounter, {"bound": 100}),
            (RareValueCounter, {"bound": 2}),
        ]:
            s = cls(**kw)
            s.update(vals)
            assert cls.from_bytes(s.to_bytes()).to_bytes() == s.to_bytes()
