"""Reference-model JSON tests (fixture I from FIXTURES.md, ref
tests/test_ref_model.json shape)."""
from __future__ import annotations

import json

import numpy as np
import pytest

from outrank_spark.plans.reference_model import (
    conditioned_vector,
    extract_features_from_reference_json,
    filter_pairs,
    model_feature_names,
)


@pytest.fixture()
def model_json(tmp_path):
    path = tmp_path / "ref_model.json"
    path.write_text(json.dumps({"desc": {"features": ["f0", "f1", "f0,f1"]}}))
    return str(path)


class TestExtract:
    def test_unique_features(self, model_json):
        assert extract_features_from_reference_json(model_json) == {"f0", "f1"}

    def test_combined_only(self, model_json):
        assert extract_features_from_reference_json(
            model_json, combined_features_only=True,
        ) == {"f0,f1"}

    def test_all_features(self, model_json):
        assert extract_features_from_reference_json(
            model_json, all_features=True,
        ) == {"f0", "f1", "f0,f1"}

    def test_names_normalized(self, model_json):
        names = set(model_feature_names(model_json))
        assert names == {"f0", "f1", "f0 AND f1"}


class TestConditioning:
    def test_filter_pairs(self):
        pairs = [("f0", "label"), ("f2", "label"), ("f2", "f3")]
        assert filter_pairs(pairs, ["f0"]) == [("f2", "label"), ("f2", "f3")]

    def test_conditioned_vector_shape(self):
        model = np.array([[1, 2], [3, 4], [5, 6]])
        cand = np.array([7, 8, 9])
        out = conditioned_vector(model, cand)
        # |max - sum| per row of [model || cand]
        assert out.tolist() == [
            abs(7 - 10), abs(8 - 15), abs(9 - 20),
        ]

    def test_redundant_candidate_scores_lower(self, spark, model_json, tmp_path):
        """A candidate equal to a model feature adds nothing; a fresh
        predictive candidate must outscore it under conditioning."""
        import pandas as pd

        from outrank_spark.plans import RankingConfig, run_ranking

        rng = np.random.default_rng(5)
        n = 4000
        label = rng.integers(0, 2, n)
        f0 = label * 3 + rng.integers(0, 2, n)  # model feature
        dup = f0.copy()                          # redundant candidate
        fresh = label * 5 + rng.integers(0, 3, n)  # new signal
        pdf = pd.DataFrame({
            "f0": f0, "dup": dup, "fresh": fresh, "label": label,
        }).astype(str)
        df = spark.createDataFrame(pdf)
        cfg = RankingConfig(subsampling=1,
                            reference_model_json=model_json)
        res = run_ranking(spark, df, cfg)
        raw = res.triplets_raw
        # model features f0/f1 excluded from pairs entirely
        assert not (raw.FeatureA == "f0").any()
        s = raw[raw.FeatureB == "label"].set_index("FeatureA").Score
        assert s["fresh"] > s["dup"]
