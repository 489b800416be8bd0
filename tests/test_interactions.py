"""Interaction / multivalue / subfeature / noise operators + 3MR tests
(ports of ranking_module_test.py combined-feature goldens and 3MR
behavior checks).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from outrank_spark.operators.interactions import (
    explode_multivalue_features,
    with_interaction_features,
    with_noise_features,
    with_subfeatures,
)
from outrank_spark.plans.three_mr import rank_features_3mr, three_mr_from_triplets


@pytest.fixture(scope="module")
def small_df(spark):
    pdf = pd.DataFrame(
        [[1, 2, 3], [3, 2, 1], [1, 1, 1], [2, 3, 4]],
        columns=["F1", "F2", "F3"],
    ).astype(str)
    return spark.createDataFrame(pdf)


class TestInteractions:
    # ref ranking_module_test.py:79-97
    def test_order3_adds_one(self, small_df):
        out, names = with_interaction_features(
            small_df, label_column="label", interaction_order=3,
        )
        assert len(out.columns) == 4
        assert names == ["F1 AND F2 AND F3"]

    def test_order2_adds_three(self, small_df):
        out, names = with_interaction_features(
            small_df, label_column="label", interaction_order=2,
        )
        assert len(out.columns) == 6
        assert set(names) == {"F1 AND F2", "F1 AND F3", "F2 AND F3"}

    def test_3mr_naming(self, small_df):
        out, names = with_interaction_features(
            small_df, label_column="label", interaction_order=2, is_3mr=True,
        )
        assert all(" AND_REL " in n for n in names)

    def test_hash_is_value_function(self, small_df):
        out, _ = with_interaction_features(
            small_df, label_column="label", interaction_order=2,
        )
        rows = out.select("F1", "F2", "F1 AND F2").collect()
        seen = {}
        for r in rows:
            key = (r["F1"], r["F2"])
            if key in seen:
                assert seen[key] == r["F1 AND F2"]
            seen[key] = r["F1 AND F2"]

    def test_order1_noop(self, small_df):
        out, names = with_interaction_features(
            small_df, label_column="label", interaction_order=1,
        )
        assert names == [] and len(out.columns) == 3


class TestMultivalue:
    def test_explosion(self, spark):
        pdf = pd.DataFrame({"tags": ["a,b", "b,c", "", "a"]})
        df = spark.createDataFrame(pdf)
        out, names = explode_multivalue_features(df, ["tags"])
        assert set(names) == {
            "MULTIEX-tags-a", "MULTIEX-tags-b", "MULTIEX-tags-c",
        }
        got = out.orderBy("tags").collect()
        by_tag = {r["tags"]: r for r in got}
        assert by_tag["a,b"]["MULTIEX-tags-a"] == "1"
        assert by_tag["a,b"]["MULTIEX-tags-c"] == ""
        assert by_tag[""]["MULTIEX-tags-a"] == ""

    def test_missing_symbols_excluded(self, spark):
        pdf = pd.DataFrame({"tags": ["a;{}", "{};b"]})
        df = spark.createDataFrame(pdf)
        out, names = explode_multivalue_features(
            df, ["tags"], missing_value_symbols=("", "{}"),
        )
        assert "MULTIEX-tags-{}" not in names


class TestSubfeatures:
    def test_one_sided(self, spark):
        pdf = pd.DataFrame({"a": ["x", "y", "x"], "b": ["p", "q", "q"]})
        df = spark.createDataFrame(pdf)
        out, names = with_subfeatures(df, "a->b")
        assert set(names) == {"SUBFEATURE-a&p", "SUBFEATURE-a&q"}
        rows = {(r["a"], r["b"]): r for r in out.collect()}
        assert rows[("x", "p")]["SUBFEATURE-a&p"] == "xANDp"
        assert rows[("x", "p")]["SUBFEATURE-a&q"] == ""
        assert rows[("y", "q")]["SUBFEATURE-a&q"] == "yANDq"

    def test_two_sided(self, spark):
        pdf = pd.DataFrame({"a": ["x", "y"], "b": ["p", "q"]})
        df = spark.createDataFrame(pdf)
        out, names = with_subfeatures(df, "a<->b")
        assert len(names) == 4  # |A| x |B|
        rows = {(r["a"], r["b"]): r for r in out.collect()}
        assert rows[("x", "p")]["SUBFEATURE|a|b-x&p"] == "1"
        assert rows[("x", "p")]["SUBFEATURE|a|b-y&q"] == "0"

    def test_invalid_operator(self, spark, small_df):
        with pytest.raises(NotImplementedError):
            with_subfeatures(small_df, "F1~F2")


class TestNoise:
    def test_controls_present(self, spark):
        pdf = pd.DataFrame({"x": ["1", "2", "3"], "label": ["0", "1", "0"]})
        df = spark.createDataFrame(pdf)
        out, names = with_noise_features(df, label_column="label")
        assert "CONTROL-target" in names
        row = out.first()
        assert row["CONTROL-constant0"] == "0"
        assert row["CONTROL-target"] == row["label"]
        assert 1 <= len(row["CONTROL-volume"]) <= 16  # hex row hash

    def test_reproducible(self, spark):
        pdf = pd.DataFrame({"x": ["1", "2", "3"]})
        df = spark.createDataFrame(pdf).coalesce(1)
        a, _ = with_noise_features(df, seed=7)
        b, _ = with_noise_features(df, seed=7)
        assert [r["CONTROL-gaussian"] for r in a.collect()] == [
            r["CONTROL-gaussian"] for r in b.collect()
        ]


class Test3MR:
    def test_greedy_order(self):
        relevance = {"a": 1.0, "b": 0.9, "c": 0.1}
        redundancy = {("a", "b"): 1.0, ("b", "a"): 1.0}  # b redundant w/ a
        relation = {}
        df = rank_features_3mr(relevance, redundancy, relation)
        assert df.Feature.tolist()[0] == "a"
        # b's redundancy (1.0) drops it below c: 0.9-1.0 < 0.1-0.0
        assert df.Feature.tolist()[1] == "c"
        assert df["3MR_Ranking"].tolist() == [1, 2, 3]

    def test_relation_boost(self):
        relevance = {"a": 1.0, "b": 0.5, "c": 0.5}
        relation = {("a", "b"): 0.9, ("b", "a"): 0.9}
        df = rank_features_3mr(relevance, {}, relation)
        assert df.Feature.tolist()[:2] == ["a", "b"]

    def test_from_triplets(self):
        triplets = pd.DataFrame(
            [
                ["f1", "label", 0.9],
                ["f2", "label", 0.5],
                ["f1 AND_REL f2", "label", 0.8],
                ["f1", "f2", 0.2],
                ["f2", "f1", 0.2],
            ],
            columns=["FeatureA", "FeatureB", "Score"],
        )
        out = three_mr_from_triplets(triplets, "label")
        assert out.Feature.tolist()[0] == "f1"
        assert set(out.Feature) == {"f1", "f2"}
