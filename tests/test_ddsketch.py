"""DDSketch: relative-error bound, bitwise order-independent merges.

The published guarantee (Masson, Rim, Lee, VLDB 2019): for any
quantile q, the returned value v satisfies |v - x_q| <= alpha * |x_q|
where x_q is the item at rank floor(q*(n-1)) of the sorted input.
Checked over lognormal data (tails spanning orders of magnitude — the
shape the relative bound exists for), mixed-sign data, and randomized
partitionings.  Unbounded mode must be bitwise order-independent
(counter addition + canonical serialization); the collapsing variant
keeps the bound above the collapsed mass but drops the bitwise claim
(documented in the module docstring).
"""
from __future__ import annotations

import itertools

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from outrank_spark.sketches import DDSketch

SETTINGS = dict(max_examples=25, deadline=None)


def exact_quantile(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    return float(s[int(np.floor(q * (len(s) - 1)))])


class TestRelativeErrorBound:
    @pytest.mark.parametrize("seed", [0, 7, 42])
    @pytest.mark.parametrize("alpha", [0.01, 0.05])
    def test_lognormal_within_alpha(self, seed, alpha):
        rng = np.random.default_rng(seed)
        vals = rng.lognormal(mean=5.0, sigma=3.0, size=50_000)
        sk = DDSketch(alpha=alpha)
        sk.update(vals)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
            truth = exact_quantile(vals, q)
            est = sk.quantile(q)
            assert abs(est - truth) <= alpha * abs(truth) + 1e-12, (
                q, est, truth)

    def test_mixed_sign_and_zeros(self):
        rng = np.random.default_rng(3)
        vals = np.concatenate([
            -rng.lognormal(2.0, 2.0, 10_000),
            np.zeros(5_000),
            rng.lognormal(2.0, 2.0, 20_000),
        ])
        sk = DDSketch(alpha=0.02)
        sk.update(vals)
        for q in (0.05, 0.2, 0.35, 0.5, 0.8, 0.95):
            truth = exact_quantile(vals, q)
            est = sk.quantile(q)
            assert abs(est - truth) <= 0.02 * abs(truth) + 1e-12, (
                q, est, truth)

    def test_empty_and_nan_and_inf(self):
        sk = DDSketch()
        assert np.isnan(sk.quantile(0.5))
        sk.update([np.nan, np.inf, -np.inf, 1.0])
        assert sk.n == 1
        assert sk.quantile(0.5) == pytest.approx(1.0, rel=0.01)

    def test_vector_quantiles(self):
        sk = DDSketch(alpha=0.01)
        sk.update(np.arange(1, 1001, dtype=float))
        out = sk.quantile([0.1, 0.5, 0.9])
        assert out.shape == (3,)
        assert np.all(np.diff(out) > 0)


class TestMergeAlgebra:
    @given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                                   allow_nan=False),
                         min_size=1, max_size=800),
           n=st.integers(min_value=1, max_value=6))
    @settings(**SETTINGS)
    def test_any_partitioning_bitwise_equal(self, vals, n):
        vals = np.asarray(vals)
        single = DDSketch(alpha=0.02)
        single.update(vals)
        parts = []
        for chunk in np.array_split(vals, n):
            s = DDSketch(alpha=0.02)
            s.update(chunk)
            parts.append(DDSketch.from_bytes(s.to_bytes()))
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.merge(p)
        assert merged.to_bytes() == single.to_bytes()

    def test_all_merge_orders_bitwise_equal(self):
        rng = np.random.default_rng(11)
        chunks = [rng.lognormal(3, 2, 500) for _ in range(4)]
        images = set()
        for perm in itertools.permutations(range(4)):
            acc = DDSketch(alpha=0.01)
            for i in perm:
                part = DDSketch(alpha=0.01)
                part.update(chunks[i])
                acc.merge(part)
            images.add(acc.to_bytes())
        assert len(images) == 1

    def test_incompatible_merge_raises(self):
        a, b = DDSketch(alpha=0.01), DDSketch(alpha=0.02)
        with pytest.raises(ValueError):
            a.merge(b)
        c, d = DDSketch(max_buckets=100), DDSketch(max_buckets=50)
        with pytest.raises(ValueError):
            c.merge(d)

    def test_bytes_round_trip_identity(self):
        sk = DDSketch(alpha=0.03)
        sk.update(np.array([-5.0, 0.0, 0.0, 2.5, 1e9, 1e-9]))
        clone = DDSketch.from_bytes(sk.to_bytes())
        assert clone.to_bytes() == sk.to_bytes()
        assert clone.n == sk.n and clone.zero == sk.zero


class TestCollapsingVariant:
    def test_bound_holds_above_collapsed_mass(self):
        rng = np.random.default_rng(5)
        vals = rng.lognormal(0.0, 2.0, 40_000)  # wide dynamic range
        sk = DDSketch(alpha=0.02, max_buckets=256)
        sk.update(vals)
        assert len(sk.pos) <= 256
        # the guarantee holds for every quantile whose rank lies
        # strictly above the collapsed mass (all folded into the
        # lowest surviving bucket)
        lowest = min(sk.pos)
        collapsed_frac = sk.pos[lowest] / sk.n
        assert collapsed_frac < 0.9  # the probe must actually test something
        for q in (0.9, 0.95, 0.99, 0.999):
            if q <= collapsed_frac + 0.01:
                continue
            truth = exact_quantile(vals, q)
            est = sk.quantile(q)
            assert abs(est - truth) <= 0.02 * abs(truth) + 1e-12

    def test_bucket_count_structurally_bounded(self):
        # full double range at alpha=0.01 stays ~70k buckets
        sk = DDSketch(alpha=0.01)
        sk.update(np.array([1e-300, 1e-100, 1.0, 1e100, 1e300]))
        assert len(sk.pos) == 5  # sparse: only touched buckets exist
        est = sk.quantile(0.5)
        assert abs(est - 1.0) <= 0.01
