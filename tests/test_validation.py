"""Data-quality validation (operators/validation.py): profile stats
vs hand counts, every constraint kind on planted violations, plan
shape (two aggregates, no join over the data)."""
from __future__ import annotations

import pytest

from outrank_spark.operators.validation import (
    check_constraints,
    profile_table,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "alpha", 10.0),
        (2, "beta", -3.0),
        (3, None, 10.0),
        (3, "alpha", None),     # duplicate id 3
        (5, "Gamma!", 99.5),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, score double").cache()


class TestProfileTable:
    def test_hand_counts(self, table):
        prof = {r["column"]: r for r in profile_table(table).collect()}
        assert set(prof) == {"id", "name", "score"}
        p = prof["id"]
        assert (p["n_rows"], p["n_null"], p["n_distinct"]) == (5, 0, 4)
        assert (p["min_num"], p["max_num"]) == (1.0, 5.0)
        assert p["mean_num"] == pytest.approx(14 / 5, abs=1e-9)
        assert p["min_str"] is None and p["max_str"] is None
        n = prof["name"]
        assert (n["n_null"], n["n_distinct"]) == (1, 3)
        assert (n["min_str"], n["max_str"]) == ("Gamma!", "beta")
        assert n["min_num"] is None
        s = prof["score"]
        assert s["n_null"] == 1 and s["null_frac"] == pytest.approx(0.2)
        assert (s["min_num"], s["max_num"]) == (-3.0, 99.5)

    def test_column_subset_and_unknown(self, table):
        assert profile_table(table, ["id"]).count() == 1
        with pytest.raises(ValueError, match="unknown column"):
            profile_table(table, ["nope"])

    def test_approx_distinct_close(self, table):
        prof = {r["column"]: r["n_distinct"] for r in
                profile_table(table, approx_distinct=True).collect()}
        assert prof["id"] == 4   # HLL exact at tiny cardinality

    def test_two_aggregates_no_data_join(self, table):
        plan = profile_table(table)._jdf.queryExecution() \
            .optimizedPlan().toString()
        # the only join is the broadcast of two 1-row aggregates
        assert plan.count("Aggregate") <= 4   # partial+final per pass
        assert "SortMergeJoin" not in plan


class TestCheckConstraints:
    RULES = [
        {"col": "id", "rule": "unique"},
        {"col": "name", "rule": "not_null"},
        {"col": "score", "rule": "non_negative"},
        {"col": "score", "rule": "max", "value": 50.0},
        {"col": "score", "rule": "min", "value": 0.0},
        {"col": "name", "rule": "in_set",
         "value": ["alpha", "beta"]},
        {"col": "name", "rule": "regex", "value": "[a-z]+"},
    ]

    def test_every_rule_kind_counts_planted_violations(self, table):
        got = {r["rule_id"]: r for r in
               check_constraints(table, self.RULES).collect()}
        # id 3 occurs twice -> 1 violation over 5 checked non-nulls
        assert (got[0]["n_checked"], got[0]["n_violations"]) == (5, 1)
        assert got[0]["passed"] is False
        assert got[1]["n_violations"] == 1           # one null name
        assert got[2]["n_violations"] == 1           # -3.0
        assert got[3]["n_violations"] == 1           # 99.5 > 50
        assert got[4]["n_violations"] == 1           # -3.0 < 0
        assert got[5]["n_violations"] == 1           # 'Gamma!' not in set
        assert got[6]["n_violations"] == 1           # 'Gamma!' not [a-z]+
        # nulls never violate value rules (paired with not_null)
        assert all(got[i]["n_checked"] == 5 for i in range(1, 7))

    def test_clean_table_passes_everything(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha", 1.0), (2, "beta", 2.0)],
            "id long, name string, score double")
        got = check_constraints(df, self.RULES).collect()
        assert all(r["passed"] for r in got)
        assert all(r["n_violations"] == 0 for r in got)

    def test_rule_validation_errors(self, table):
        with pytest.raises(ValueError, match="non-empty"):
            check_constraints(table, [])
        with pytest.raises(ValueError, match="unknown column"):
            check_constraints(table, [{"col": "x", "rule": "not_null"}])
        with pytest.raises(ValueError, match="unknown rule"):
            check_constraints(table, [{"col": "id", "rule": "glorp"}])
        with pytest.raises(ValueError, match="needs 'col'"):
            check_constraints(table, [{"rule": "not_null"}])

    def test_regex_is_full_match(self, spark):
        df = spark.createDataFrame(
            [("src1x",), ("src2",)], "s string")
        got = check_constraints(
            df, [{"col": "s", "rule": "regex",
                  "value": "src[0-9]+"}]).collect()[0]
        assert got["n_violations"] == 1   # substring match not enough
