"""Surrogate (model-fit) heuristics — reference parity properties.

The reference scores = 1 + median(2-fold neg-log-loss)
(importance_estimator.py:42-53).  Properties that must hold for ANY
faithful implementation:

* an informative feature scores strictly higher than pure noise;
* a perfectly predictive feature approaches 1.0 (loss -> 0), and
  every score is <= 1;
* scores are deterministic;
* scores are invariant under relabeling of the category codes
  (one-hot only permutes columns) — the precode fast path depends
  on this;
* the reference-model matrix path accepts a 2-D code block.
"""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.functions.heuristics import score_pair
from outrank_spark.functions.surrogate import (
    SURROGATE_HEURISTICS,
    surrogate_score,
)

RNG = np.random.default_rng(77)
N = 600


@pytest.fixture(scope="module")
def fixture_vectors():
    y = RNG.integers(0, 2, N).astype(np.int32)
    informative = (y * 3 + RNG.integers(0, 2, N)).astype(np.int32)
    noise = RNG.integers(0, 5, N).astype(np.int32)
    perfect = y.copy()
    return y, informative, noise, perfect


class TestSurrogateSGD:
    def test_ordering_informative_beats_noise(self, fixture_vectors):
        y, informative, noise, perfect = fixture_vectors
        s_inf = surrogate_score(informative, y, "surrogate-SGD")
        s_noise = surrogate_score(noise, y, "surrogate-SGD")
        s_perf = surrogate_score(perfect, y, "surrogate-SGD")
        assert s_perf > s_inf > s_noise
        assert s_perf > 0.95  # loss ~ 0
        assert all(s <= 1.0 + 1e-9 for s in (s_perf, s_inf, s_noise))

    def test_deterministic(self, fixture_vectors):
        y, informative, *_ = fixture_vectors
        a = surrogate_score(informative, y, "surrogate-SGD")
        b = surrogate_score(informative, y, "surrogate-SGD")
        assert a == b

    def test_relabel_invariant(self, fixture_vectors):
        y, informative, *_ = fixture_vectors
        # bijective relabel of the feature codes
        values = np.unique(informative)
        lut = dict(zip(values.tolist(),
                       (991 + 37 * np.arange(len(values))[::-1]).tolist()))
        relabeled = np.array([lut[v] for v in informative], dtype=np.int64)
        a = surrogate_score(informative, y, "surrogate-SGD")
        b = surrogate_score(relabeled, y, "surrogate-SGD")
        assert a == pytest.approx(b, abs=1e-9)

    @pytest.mark.parametrize("variant", SURROGATE_HEURISTICS)
    def test_all_variants_order_correctly(self, variant, fixture_vectors):
        y, informative, noise, _ = fixture_vectors
        s_inf = score_pair(informative, y, variant)
        s_noise = score_pair(noise, y, variant)
        assert s_inf > s_noise
        assert np.isfinite(s_inf) and np.isfinite(s_noise)

    def test_matrix_input_prior_path(self, fixture_vectors):
        """2-D [model features | candidate] block — the reference-model
        conditioning shape (importance_estimator.py:80-91)."""
        y, informative, noise, _ = fixture_vectors
        model = RNG.integers(0, 3, N).astype(np.int32)
        with_inf = surrogate_score(
            np.column_stack([model, informative]), y, "surrogate-SGD",
        )
        with_noise = surrogate_score(
            np.column_stack([model, noise]), y, "surrogate-SGD",
        )
        assert with_inf > with_noise

    def test_degenerate_label(self):
        y = np.zeros(50, dtype=np.int32)
        x = RNG.integers(0, 4, 50).astype(np.int32)
        assert surrogate_score(x, y, "surrogate-SGD") == 1.0

    def test_svd_handles_wide_onehot(self):
        # 400 categories -> SVD compresses to 8 dims; must stay sane
        y = RNG.integers(0, 2, N).astype(np.int32)
        wide = RNG.integers(0, 400, N).astype(np.int32)
        s = surrogate_score(wide, y, "surrogate-SGD-SVD")
        assert np.isfinite(s) and s <= 1.0 + 1e-9


@pytest.mark.slow
class TestSurrogateRankingE2E:
    def test_ranking_job_accepts_surrogate(self, spark):
        from outrank_spark.plans import RankingConfig, run_ranking
        from outrank_spark.sources import generate_ranking_matrix

        df = generate_ranking_matrix(
            spark, num_features=35, size=4000, variant="naive",
        )
        cfg = RankingConfig(heuristic="surrogate-SGD", subsampling=1,
                            minibatch_size=2000)
        res = run_ranking(spark, df, cfg)
        assert len(res.singles) > 0
        col = "Score surrogate-SGD"
        assert np.isfinite(res.singles[col]).all()
