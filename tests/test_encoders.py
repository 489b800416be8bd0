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


class TestQuantileNormalize:
    def _pandas_pr(self, vals):
        import pandas as pd
        s = pd.Series(vals)
        n = s.notna().sum()
        r = s.rank(method="min") - 1
        return (r / (n - 1) if n > 1
                else r * 0.0).where(s.notna())

    def test_matches_pandas_percent_rank(self, spark):
        from outrank_spark.operators.encoders import quantile_normalize
        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 5.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v double")
        got = {r["id"]: r["v_qnorm"] for r in
               quantile_normalize(df, "v").collect()}
        want = self._pandas_pr(vals)
        for i in range(len(vals)):
            assert got[i] == pytest.approx(want[i], abs=1e-12)

    def test_grouped_ties_and_singleton(self, spark):
        from outrank_spark.operators.encoders import quantile_normalize
        rows = [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 7.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = quantile_normalize(df, "v", by="g").collect()
        got = sorted((r["g"], r["v"], r["v_qnorm"]) for r in out)
        # group a: min-rank ties -> 0, 0, then 2/(3-1)=1.0;
        # singleton group b -> 0.0
        assert got == [("a", 1.0, 0.0), ("a", 1.0, 0.0),
                       ("a", 2.0, 1.0), ("b", 7.0, 0.0)]

    def test_nulls_pass_through_unranked(self, spark):
        from outrank_spark.operators.encoders import quantile_normalize
        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 10.0)], "id long, v double")
        got = {r["id"]: r["v_qnorm"] for r in
               quantile_normalize(df, "v").collect()}
        assert got[2] is None
        # null row excluded from the CDF: n=2, not 3
        assert got[1] == 0.0 and got[3] == 1.0

    def test_row_count_preserved(self, spark):
        from outrank_spark.operators.encoders import quantile_normalize
        df = spark.range(100).withColumn(
            "v", (F.col("id") % 7).cast("double"))
        assert quantile_normalize(df, "v").count() == 100

    def test_no_raw_row_window(self, spark):
        """The window must run over the distinct-value table, never
        the raw rows: the plan's Window input is an Aggregate."""
        from outrank_spark.operators.encoders import quantile_normalize
        df = spark.range(50).withColumn(
            "v", (F.col("id") % 5).cast("double"))
        plan = quantile_normalize(df, "v")._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "Window" in plan
        # the aggregate (distinct-value counts) sits below the window
        assert plan.index("Window") < plan.index("Aggregate")
