"""End-to-end ranking goldens — the reference's own acceptance gates.

* selftest (task_selftest.py:19-42): 100k x 100 naive matrix, default
  config -> exactly 201 pairwise rows; the top-scoring row involves
  ``label-(2; 100)``.
* CI needle (benchmarks/generator_naive.py verify +
  scripts/run_benchmarks.sh CI block): 10k x 100 bench matrix,
  subsampling 1 -> ``f30-(81; 100)`` directly under the label in the
  singles ranking.
"""
from __future__ import annotations

import pytest

from outrank_spark.plans import RankingConfig, run_ranking
from outrank_spark.sources import generate_ranking_matrix


@pytest.mark.slow
class TestSelftestGolden:
    @pytest.fixture(scope="class")
    def result(self, spark):
        df = generate_ranking_matrix(
            spark, num_features=100, size=100_000, variant="naive",
        )
        cfg = RankingConfig(subsampling=10)  # reference defaults
        return run_ranking(spark, df, cfg)

    def test_201_rows(self, result):
        assert result.pairwise.shape == (201, 3)

    def test_top_feature_is_label(self, result):
        top = result.pairwise.iloc[-1]  # sorted ascending by Score
        assert (
            top["FeatureA"] == "label-(2; 100)"
            or top["FeatureB"] == "label-(2; 100)"
        )

    def test_label_cardinality_exact(self, result):
        assert result.cardinalities["label"] == 2
        assert result.cardinalities["f30"] == 2  # view side-effect

    def test_coverage_100(self, result):
        assert all(v == 100.0 for v in result.coverage.values())

    def test_f30_needle_in_singles(self, result):
        # f30 == label exactly, so it must sit in the top 2 singles
        top2 = set(result.singles.head(2)["Feature"])
        assert "f30-(2; 100)" in top2


@pytest.mark.slow
class TestBenchNeedleCI:
    def test_f30_rank1(self, spark):
        df = generate_ranking_matrix(
            spark, num_features=100, size=10_000, variant="bench_naive",
        )
        cfg = RankingConfig(subsampling=1)
        res = run_ranking(spark, df, cfg)
        # benchmarks/generator_naive.py:66-73: singles iloc[1] (after the
        # label itself) must be the planted needle
        assert res.singles.iloc[0]["Feature"] == "label-(81; 100)"
        assert res.singles.iloc[1]["Feature"] == "f30-(81; 100)"


@pytest.mark.slow
class TestSecondOrderNeedle:
    """Reference benchmark level 4 (generator_second_order.py verify):
    target = binarized f30 + f50, so with --interaction_order 2 the
    composite feature ``f30 AND f50`` must surface at the top of the
    label ranking."""

    def test_f30_and_f50_interaction_found(self, spark):
        from outrank_spark.operators.interactions import (
            with_interaction_features,
        )
        from outrank_spark.plans.ranking_job import RankingConfig, run_ranking
        from outrank_spark.sources.ranking_matrix import (
            generate_ranking_matrix,
        )

        df = generate_ranking_matrix(
            spark, num_features=52, size=5000, variant="second_order",
        )
        # focus projection (the reference's --feature_set_focus shape):
        # the needle members + 18 noise features keep the order-2
        # combination space at C(20,2)=190 instead of 1326, so the test
        # exercises the same retrieval at a fraction of the sketch cost
        keep = ["label", "f30", "f50"] + [f"f{i}" for i in range(18)]
        df = df.select(*keep)
        df, _ = with_interaction_features(
            df, label_column="label", interaction_order=2, as_hex=False,
        )
        cfg = RankingConfig(
            heuristic="MI-numba-randomized", subsampling=1,
            label_column="label", target_ranking_only=True,
            include_cardinality_in_feature_names=False,
        )
        res = run_ranking(spark, df, cfg)
        singles = res.singles[res.singles["Feature"] != "label"]
        top10 = list(singles.head(10)["Feature"])
        assert "f30 AND f50" in top10, top10[:10]
        # the needle's members must also rank above the noise floor
        top_quarter = list(singles.head(len(singles) // 4)["Feature"])
        assert "f30" in top_quarter and "f50" in top_quarter
