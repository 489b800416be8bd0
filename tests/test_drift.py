"""psi_drift (operators/drift.py) vs a numpy PSI model using the same
right-closed decile binning, plus behavioral anchors (self-PSI ~ 0,
planted shift detected)."""
from __future__ import annotations

import math

import numpy as np
import pytest

from outrank_spark.operators.drift import psi_drift


def _numpy_psi(ref, cur, bins=10, eps=1e-6, scale=6):
    edges = [round(float(np.quantile(ref, i / bins, method="linear")),
                   scale) for i in range(1, bins)]

    def share(vals):
        b = np.array([1 + sum(v > e for e in edges) for v in vals])
        return np.array([(b == i).mean() for i in range(1, bins + 1)])

    rs, cs = share(ref), share(cur)
    terms = (cs - rs) * np.log(np.maximum(cs, eps) / np.maximum(rs, eps))
    return rs, cs, terms


def _collect(spark, ref_vals, cur_vals, **kw):
    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "value double")
    cur = spark.createDataFrame([(float(v),) for v in cur_vals], "value double")
    rows = psi_drift(ref, cur, "value", **kw).orderBy("bin").collect()
    return (np.array([r["ref_share"] for r in rows]),
            np.array([r["cur_share"] for r in rows]),
            np.array([r["psi_term"] for r in rows]))


def test_matches_numpy_model(spark):
    rng = np.random.default_rng(3)
    ref = rng.normal(50, 10, 400).round(2)
    cur = rng.normal(58, 14, 300).round(2)   # planted shift
    rs, cs, terms = _collect(spark, ref, cur)
    nrs, ncs, nterms = _numpy_psi(ref, cur)
    assert np.allclose(rs, nrs, atol=1e-12)
    assert np.allclose(cs, ncs, atol=1e-12)
    assert np.allclose(terms, nterms, atol=1e-12)
    assert terms.sum() > 0.25            # the shift is flagged


def test_self_psi_is_zero(spark):
    vals = np.linspace(0, 100, 500).round(2)
    rs, cs, terms = _collect(spark, vals, vals)
    assert np.allclose(rs, cs, atol=1e-12)
    assert abs(terms.sum()) < 1e-12
    assert math.isclose(rs.sum(), 1.0, abs_tol=1e-12)


def test_empty_current_bins_are_clamped_not_inf(spark):
    ref = np.arange(100, dtype=float)
    cur = np.full(50, 1.0)               # everything lands in bin 1
    rs, cs, terms = _collect(spark, ref, cur)
    assert cs[0] == pytest.approx(1.0)
    assert np.isfinite(terms).all()


def test_validation(spark):
    ref = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError, match="bins"):
        psi_drift(ref, ref, "value", bins=1)
    empty = spark.createDataFrame([(None,)], "value double")
    with pytest.raises(ValueError, match="no non-null"):
        psi_drift(empty, ref, "value")


# ------------------------------------------------------------------
# KS
# ------------------------------------------------------------------

def _numpy_ks(ref, cur):
    pts = np.unique(np.concatenate([ref, cur]))
    fr = np.searchsorted(np.sort(ref), pts, side="right") / len(ref)
    fc = np.searchsorted(np.sort(cur), pts, side="right") / len(cur)
    return float(np.abs(fr - fc).max())


def _ks(spark, ref_vals, cur_vals, **kw):
    from outrank_spark.operators.drift import ks_drift

    ref = spark.createDataFrame([(float(v),) for v in ref_vals],
                                "value double")
    cur = spark.createDataFrame([(float(v),) for v in cur_vals],
                                "value double")
    row = ks_drift(ref, cur, "value", **kw).first()
    return row["ks_stat"], row["n_ref"], row["n_cur"]


def test_ks_matches_numpy_ecdf(spark):
    rng = np.random.default_rng(5)
    ref = rng.normal(0, 1, 500).round(2)
    cur = rng.normal(0.4, 1.3, 350).round(2)
    d, nr, nc = _ks(spark, ref, cur)
    assert (nr, nc) == (500, 350)
    assert d == pytest.approx(_numpy_ks(ref, cur), abs=1e-12)


def test_ks_tie_heavy_and_partition_count_invariance(spark):
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 5, 300).astype(float)   # massive ties
    cur = rng.integers(1, 6, 200).astype(float)
    want = _numpy_ks(ref, cur)
    for nparts in (1, 7):
        d, _, _ = _ks(spark, ref, cur, num_partitions=nparts)
        assert d == pytest.approx(want, abs=1e-12)


def test_ks_identical_samples_is_zero_and_disjoint_is_one(spark):
    vals = np.arange(50, dtype=float)
    d0, _, _ = _ks(spark, vals, vals)
    assert d0 == pytest.approx(0.0, abs=1e-12)
    d1, _, _ = _ks(spark, vals, vals + 1000)
    assert d1 == pytest.approx(1.0, abs=1e-12)


def test_ks_validation_empty_side(spark):
    from outrank_spark.operators.drift import ks_drift

    ref = spark.createDataFrame([(1.0,)], "value double")
    empty = spark.createDataFrame([(None,)], "value double")
    with pytest.raises(ValueError, match="n_cur=0"):
        ks_drift(ref, empty, "value")


def test_psi_empty_current_raises(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(20)],
                                "value double")
    empty = spark.createDataFrame([(None,)], "value double")
    with pytest.raises(ValueError, match="current snapshot"):
        psi_drift(ref, empty, "value")


def test_psi_boundary_rounding_is_half_up(spark):
    # 5.65e-05 is a 6-dp half-tie: banker's round gives 5.6e-05,
    # HALF_UP (and DuckDB) give 5.7e-05 — the q89 parity class
    from outrank_spark.operators.discretize import _round_half_up

    assert _round_half_up(5.65e-05, 6) == 5.7e-05
    assert round(5.65e-05, 6) == 5.6e-05  # why builtin round is banned


# ------------------------------------------------------------------
# JSD
# ------------------------------------------------------------------

def _numpy_jsd(ref_keys, cur_keys):
    keys = sorted(set(ref_keys) | set(cur_keys))
    p = np.array([ref_keys.count(k) for k in keys], float)
    q = np.array([cur_keys.count(k) for k in keys], float)
    p, q = p / p.sum(), q / q.sum()
    m = (p + q) / 2
    kl = lambda a: np.where(a > 0, a * np.log2(
        np.where(a > 0, a, 1) / m), 0.0).sum()
    return 0.5 * kl(p) + 0.5 * kl(q)


def _jsd(spark, ref_keys, cur_keys):
    from outrank_spark.operators.drift import jsd_categorical

    ref = spark.createDataFrame([(k,) for k in ref_keys], "k string")
    cur = spark.createDataFrame([(k,) for k in cur_keys], "k string")
    return jsd_categorical(ref, cur, "k").first()


def test_jsd_matches_numpy_model(spark):
    rng = np.random.default_rng(13)
    ref = [f"w{int(v)}" for v in rng.integers(0, 20, 300)]
    cur = [f"w{int(v)}" for v in rng.integers(5, 30, 250)]
    row = _jsd(spark, ref, cur)
    assert row["jsd"] == pytest.approx(_numpy_jsd(ref, cur), abs=1e-12)
    assert (row["n_ref"], row["n_cur"]) == (300, 250)
    assert row["n_keys"] == len(set(ref) | set(cur))


def test_jsd_bounds_identical_zero_disjoint_one(spark):
    same = ["a", "b", "b", "c"]
    assert _jsd(spark, same, list(same))["jsd"] == pytest.approx(0.0)
    d = _jsd(spark, ["a", "b"], ["c", "d"])["jsd"]
    assert d == pytest.approx(1.0, abs=1e-12)  # base-2 upper bound
