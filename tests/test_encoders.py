"""Target / count encoding (operators/encoders.py): hand-computed
shrinkage values, exact-mu unseen-category fallback, null categories
as real levels, and the broadcast-join plan guarantee."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.encoders import (
    count_encode, target_encode, target_encoding_table,
)


@pytest.fixture(scope="module")
def toy(spark):
    # label means: a -> 10, b -> 40; global mu = (3*10 + 1*40)/4 = 17.5
    rows = [(1, "a", 8.0), (2, "a", 10.0), (3, "a", 12.0),
            (4, "b", 40.0)]
    return spark.createDataFrame(rows, "id long, cat string, y double")


class TestTargetEncodingTable:
    def test_hand_computed_shrinkage(self, toy):
        t = {r["category"]: r for r in target_encoding_table(
            toy, ["cat"], "y", smoothing=2.0).collect()}
        # te(a) = (30 + 2*17.5) / (3 + 2) = 13.0
        # te(b) = (40 + 2*17.5) / (1 + 2) = 25.0
        assert t["a"]["n"] == 3 and t["a"]["encoded"] == pytest.approx(13.0)
        assert t["b"]["n"] == 1 and t["b"]["encoded"] == pytest.approx(25.0)
        assert all(r["feature"] == "cat" for r in t.values())

    def test_smoothing_zero_gives_raw_means(self, toy):
        t = {r["category"]: r["encoded"] for r in target_encoding_table(
            toy, ["cat"], "y", smoothing=0.0).collect()}
        assert t["a"] == pytest.approx(10.0)
        assert t["b"] == pytest.approx(40.0)

    def test_null_category_is_a_level(self, spark):
        df = spark.createDataFrame(
            [(1, None, 4.0), (2, None, 6.0), (3, "x", 10.0)],
            "id long, cat string, y double")
        t = {r["category"]: r for r in target_encoding_table(
            df, ["cat"], "y", smoothing=0.0).collect()}
        assert t[None]["n"] == 2 and t[None]["encoded"] == pytest.approx(5.0)

    def test_multiple_columns_unioned(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "p", 1.0), (2, "b", "p", 3.0)],
            "id long, c1 string, c2 string, y double")
        t = target_encoding_table(df, ["c1", "c2"], "y", 0.0).collect()
        feats = {r["feature"] for r in t}
        assert feats == {"c1", "c2"} and len(t) == 3

    def test_empty_cols_rejected(self, toy):
        with pytest.raises(ValueError):
            target_encoding_table(toy, [], "y")


class TestTargetEncode:
    def test_rows_get_their_category_value(self, toy):
        out = {r["id"]: r["cat_te"] for r in
               target_encode(toy, ["cat"], "y", smoothing=2.0).collect()}
        assert out[1] == pytest.approx(13.0)
        assert out[4] == pytest.approx(25.0)

    def test_unseen_category_falls_back_to_exact_mu(self, toy, spark):
        maps = target_encoding_table(toy, ["cat"], "y", smoothing=2.0)
        new = spark.createDataFrame([(9, "zzz", 0.0)],
                                    "id long, cat string, y double")
        out = target_encode(new, ["cat"], "y", smoothing=2.0,
                            mappings=maps).first()
        assert out["cat_te"] == pytest.approx(17.5)   # mu, exactly

    def test_broadcast_join_plan(self, toy):
        plan = (target_encode(toy, ["cat"], "y")
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestCountEncode:
    def test_counts_and_null_level(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None)], "id long, cat string")
        out = {r["id"]: r["cat_count"] for r in
               count_encode(df, ["cat"]).collect()}
        assert out == {1: 2, 2: 2, 3: 1}
