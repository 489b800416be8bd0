"""MI estimator + coverage heuristic tests.

Ports the reference's assertion suite (tests/mi_numba_test.py,
tests/cov_heu_test.py) onto the vectorized numpy kernels.  One
documented deviation: the reference's `test_mi_numba_random`
(all-constant X) asserts score < 0.0, which only holds through numba
fastmath last-ulp effects — analytically the score is exactly 0; we
assert <= 0 + eps.
"""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.functions import max_pair_coverage, mutual_info_estimator


np.random.seed(123)


class TestMIEstimator:
    # ref mi_numba_test.py:16-20 — float-truncated randoms are all 0
    def test_constant_inputs_zero(self):
        a = np.random.random(10 ** 5).astype(np.int32)
        b = np.random.random(10 ** 5).astype(np.int32)
        assert mutual_info_estimator(a, b, 1.0, False) == 0.0

    # ref mi_numba_test.py:22-27 (relaxed: see module docstring)
    def test_degenerate_x(self):
        a = np.array([1, 0, 0, 0, 1, 1, 1, 0], dtype=np.int32)
        b = np.zeros(8, dtype=np.int32)
        assert mutual_info_estimator(a, b, 1.0, False) <= 1e-6

    # ref mi_numba_test.py:29-33 — identity > 0.60
    def test_mirror(self):
        a = np.array([1, 0, 0, 0, 1, 1, 1, 0], dtype=np.int32)
        assert mutual_info_estimator(a, a.copy(), 1.0, False) > 0.60

    # ref mi_numba_test.py:35-38
    def test_longer_identity(self):
        b = np.array([1, 0, 0, 0, 1, 1, 1, 0] * 10 ** 5, dtype=np.int32)
        assert mutual_info_estimator(b, b, 1.0, False) > 0.60

    # ref mi_numba_test.py:40-44 — permutation < 0.05
    def test_permutation(self):
        a = np.array([1, 0, 0, 0, 1, 1, 1, 0] * 10 ** 3, dtype=np.int32)
        b = np.random.permutation(a).astype(np.int32)
        assert mutual_info_estimator(a, b, 1.0, False) < 0.05

    # ref mi_numba_test.py:46-66 — noise monotonicity
    def test_noise_monotonicity(self):
        a = np.array([1, 0, 0, 0, 1, 1, 1, 0], dtype=np.int32)
        lowest = np.random.permutation(a).astype(np.int32)
        medium = np.array([1, 1, 0, 0, 1, 1, 1, 1], dtype=np.int32)
        high = np.array([1, 0, 0, 0, 1, 1, 1, 1], dtype=np.int32)
        scores = [
            mutual_info_estimator(a, x, 1.0, False)
            for x in (lowest, medium, high)
        ]
        assert list(np.argsort(scores)) == [0, 1, 2]

    # ref mi_numba_test.py:68-97 — the XOR interaction test
    def test_xor_interaction(self):
        v1 = np.round(np.random.random(1000)).astype(np.int32)
        v2 = np.round(np.random.random(1000)).astype(np.int32)
        v3 = np.logical_xor(v1, v2).astype(np.int32)
        assert mutual_info_estimator(v1, v3, 1.0, False) < 0.01
        assert mutual_info_estimator(v2, v3, 1.0, False) < 0.01
        combined = np.array(
            [hash(x) for x in zip(v1, v2)], dtype=np.int64,
        )
        # interaction features are category-encoded before scoring
        # (core_ranking.py:108-117); densify handles the relabeling
        assert mutual_info_estimator(combined, v3.astype(np.int64), 1.0, False) > 0.60

    def test_deterministic(self):
        a = np.array([1, 0, 1, 0, 1] * 200, dtype=np.int32)
        b = np.array([0, 1, 0, 1, 0] * 200, dtype=np.int32)
        r = [mutual_info_estimator(a, b, 1.0, False) for _ in range(3)]
        assert r[0] == r[1] == r[2]

    def test_identical_high(self):
        a = np.array([1, 2, 3, 1, 2, 3] * 100, dtype=np.int32)
        assert mutual_info_estimator(a, a.copy(), 1.0, False) > 0.5

    def test_functional_relationship(self):
        a = np.array([0, 1, 2] * 1000, dtype=np.int32)
        b = np.array([0, 2, 4] * 1000, dtype=np.int32)
        assert mutual_info_estimator(a, b, 1.0, False) > 0.5

    def test_independence(self):
        rng = np.random.default_rng(42)
        a = rng.integers(0, 3, 5000).astype(np.int32)
        b = rng.integers(0, 3, 5000).astype(np.int32)
        assert abs(mutual_info_estimator(a, b, 1.0, False)) < 0.2

    def test_noise_robustness(self):
        rng = np.random.default_rng(999)
        a = np.array([0, 1] * 2500, dtype=np.int32)
        noisy = a.copy()
        idx = rng.choice(len(a), size=len(a) // 10, replace=False)
        noisy[idx] = 1 - noisy[idx]
        clean_score = mutual_info_estimator(a, a.copy(), 1.0, False)
        noisy_score = mutual_info_estimator(a, noisy, 1.0, False)
        assert noisy_score < clean_score
        assert clean_score > 0.4 and noisy_score > 0.0

    def test_approximation_factors(self):
        a = np.array([1, 0, 1, 0, 1, 0] * 1000, dtype=np.int32)
        b = np.array([0, 1, 0, 1, 0, 1] * 1000, dtype=np.int32)
        for f in (0.1, 0.5, 1.0):
            assert isinstance(
                mutual_info_estimator(a, b, f, False), np.float32,
            )

    def test_cardinality_correction_penalizes_high_card(self):
        # The randomized variant's purpose: a unique-ish feature must
        # score well below a genuinely predictive one.
        rng = np.random.default_rng(7)
        n = 4000
        label = rng.integers(0, 2, n).astype(np.int32)
        high_card = np.arange(n, dtype=np.int32) // 2  # near-unique
        predictive = (label * 2 + rng.integers(0, 2, n)).astype(np.int32)
        s_high = mutual_info_estimator(high_card, label, 1.0, True)
        s_pred = mutual_info_estimator(predictive, label, 1.0, True)
        assert s_pred > s_high

    def test_diagonal_disables_correction(self):
        a = np.array([1, 0, 1, 0] * 50, dtype=np.int32)
        with_corr = mutual_info_estimator(a, a.copy(), 1.0, True)
        without = mutual_info_estimator(a, a.copy(), 1.0, False)
        assert with_corr == without  # sum(X-Y)==0 path

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            mutual_info_estimator(
                np.array([], dtype=np.int32), np.array([], dtype=np.int32),
            )

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            mutual_info_estimator(
                np.array([1, 0, 1], dtype=np.int32),
                np.array([0, 1], dtype=np.int32),
            )

    def test_sparse_dense_paths_agree(self):
        # force both contingency paths on the same data and compare
        from outrank_spark.functions import mi as mi_mod

        rng = np.random.default_rng(11)
        x = rng.integers(0, 500, 4000).astype(np.int32)
        y = rng.integers(0, 400, 4000).astype(np.int32)
        dense = mutual_info_estimator(x, y, 1.0, True)
        old = mi_mod._DENSE_CELL_LIMIT
        try:
            mi_mod._DENSE_CELL_LIMIT = 1  # force sparse
            sparse = mutual_info_estimator(x, y, 1.0, True)
        finally:
            mi_mod._DENSE_CELL_LIMIT = old
        assert sparse == pytest.approx(dense, rel=1e-6)

    def test_count_one_values_skipped(self):
        # A feature where every value occurs once contributes nothing.
        a = np.arange(100, dtype=np.int32)
        b = np.random.randint(0, 2, 100).astype(np.int32)
        assert mutual_info_estimator(a, b, 1.0, False) == pytest.approx(
            # full entropy of b remains (cond part all skipped)
            float(
                -(np.bincount(b) / 100 * np.log(np.bincount(b) / 100)).sum(),
            ),
            rel=1e-5,
        )


class TestMaxPairCoverage:
    # ref cov_heu_test.py:16-50
    def test_basic(self):
        assert max_pair_coverage(
            np.array([1, 2, 3, 1, 2]), np.array([4, 5, 6, 4, 5]),
        ) == pytest.approx(2 / 5)

    def test_identical(self):
        assert max_pair_coverage(np.ones(4, int), np.ones(4, int)) == 1.0

    def test_all_unique(self):
        assert max_pair_coverage(
            np.array([1, 2, 3, 4, 5]), np.array([6, 7, 8, 9, 10]),
        ) == 1 / 5

    def test_all_same(self):
        assert max_pair_coverage(np.full(5, 1), np.full(5, 2)) == 1.0

    # ref ranking_cov_alignment.py:23-28 golden
    def test_golden_half(self):
        a1 = np.array([1, 1, 2, 3, 1, 1, 1, 5] * 100000)
        a2 = np.array([0, 0, 5, 5, 3, 0, 0, 0] * 100000)
        assert max_pair_coverage(a1, a2) == 0.5

    def test_empty_nan(self):
        assert np.isnan(
            max_pair_coverage(np.array([], int), np.array([], int)),
        )

    def test_single(self):
        assert max_pair_coverage(np.array([42]), np.array([73])) == 1.0

    def test_negative_values(self):
        r = max_pair_coverage(
            np.array([-1, -2, -1]), np.array([-3, -4, -3]),
        )
        assert r == pytest.approx(2 / 3)

    def test_bounds(self):
        a = np.random.randint(0, 100, 10000)
        b = np.random.randint(0, 100, 10000)
        assert 0 <= max_pair_coverage(a, b) <= 1

    def test_deterministic(self):
        a = np.random.randint(0, 50, 1000)
        b = np.random.randint(0, 50, 1000)
        assert max_pair_coverage(a, b) == max_pair_coverage(a, b)


class TestCachedMIBlockParity:
    """The pair-scoring fast path (_score_block_mi_cached) hoists
    per-column estimator stats out of the pair loop — scores must be
    BITWISE equal to score_pair -> mutual_info_estimator on the same
    codes, including NaN category codes, diagonal (duplicate-column)
    pairs, and both the corrected and uncorrected heuristics."""

    def test_bitwise_equal_to_score_pair(self):
        import pandas as pd

        from outrank_spark.functions.heuristics import score_pair
        from outrank_spark.operators.pair_scoring import (
            _encode_codes,
            _score_block,
        )

        rng = np.random.default_rng(3)
        for trial in range(40):
            n = int(rng.integers(2, 3000))
            cols = [f"c{i}" for i in range(5)]
            data = {}
            for i, c in enumerate(cols):
                card = int(rng.integers(1, max(2, n)))
                if i % 3 == 0:
                    vals = np.array([f"v{j}" for j in range(card)],
                                    dtype=object)
                    col = pd.Series(vals[rng.integers(0, card, n)])
                    if trial % 4 == 0:
                        col[rng.integers(0, n, size=max(1, n // 10))] \
                            = None      # NaN -> category code -1
                    data[c] = col
                else:
                    data[c] = pd.Series(
                        rng.integers(-2**62, 2**62, card)[
                            rng.integers(0, card, n)])
            pdf = pd.DataFrame(data)
            pdf["cdup"] = pdf[cols[1]].copy()   # diagonal pair shape
            cols2 = cols + ["cdup"]
            pairs = [(cols2[i], cols2[j]) for i in range(len(cols2))
                     for j in range(i + 1, len(cols2))]
            label = cols2[0]
            for heur in ("MI-numba-randomized", "MI-numba"):
                got = _score_block(_encode_codes(pdf, cols2), pairs,
                                   heur, label, 1.0)
                codes = _encode_codes(pdf, cols2)
                for (a, b, s) in got:
                    f1, f2 = (b, label) if a == label else (a, b)
                    ref = float(score_pair(codes[f1], codes[f2],
                                           heur, 1.0))
                    assert np.float32(s).tobytes() \
                        == np.float32(ref).tobytes(), (trial, heur, a, b)
