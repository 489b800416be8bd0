"""k-anonymity / l-diversity audit (operators/privacy.py).

Hand-computed class tables on a tiny roster; error paths; plan shape
(no window, no join — a pure aggregate pipeline)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.privacy import (
    k_anonymity_audit,
    k_anonymity_summary,
)

ROWS = [
    # (zip, age_band, diagnosis)
    ("94001", "20-30", "flu"),
    ("94001", "20-30", "flu"),
    ("94001", "20-30", "cold"),
    ("94001", "30-40", "flu"),      # singleton class
    ("94002", "20-30", "flu"),
    ("94002", "20-30", "flu"),      # 2-row class, 1 diagnosis
]


@pytest.fixture()
def roster(spark):
    return spark.createDataFrame(ROWS, ["zip", "age", "dx"])


class TestAudit:
    def test_class_sizes_and_k_flag(self, roster):
        got = {
            (r["zip"], r["age"]): (r["class_size"], r["k_anonymous"])
            for r in k_anonymity_audit(
                roster, ["zip", "age"], k=2).collect()
        }
        assert got == {
            ("94001", "20-30"): (3, True),
            ("94001", "30-40"): (1, False),
            ("94002", "20-30"): (2, True),
        }

    def test_l_diversity_counts_distinct_sensitive(self, roster):
        got = {
            (r["zip"], r["age"]): (r["sensitive_distinct"], r["l_diverse"])
            for r in k_anonymity_audit(
                roster, ["zip", "age"], k=2,
                sensitive_col="dx", l=2).collect()
        }
        # 94001/20-30 has {flu, cold}; the other classes only {flu}
        assert got[("94001", "20-30")] == (2, True)
        assert got[("94001", "30-40")] == (1, False)
        assert got[("94002", "20-30")] == (1, False)

    def test_null_quasi_forms_its_own_class(self, spark):
        df = spark.createDataFrame(
            [(None, "a"), (None, "a"), ("z", "a")], ["zip", "age"])
        sizes = {r["zip"]: r["class_size"] for r in k_anonymity_audit(
            df, ["zip", "age"], k=2).collect()}
        assert sizes == {None: 2, "z": 1}

    def test_bad_args_raise(self, roster):
        with pytest.raises(ValueError, match="k must be"):
            k_anonymity_audit(roster, ["zip"], k=0)
        with pytest.raises(ValueError, match="non-empty"):
            k_anonymity_audit(roster, [], k=2)
        with pytest.raises(ValueError, match="l must be"):
            k_anonymity_audit(roster, ["zip"], k=2,
                              sensitive_col="dx", l=0)


class TestSummary:
    def test_global_rollup(self, roster):
        row = k_anonymity_summary(
            roster, ["zip", "age"], k=2, sensitive_col="dx", l=2,
        ).collect()[0]
        assert row["n_classes"] == 3
        assert row["n_rows"] == 6
        assert row["min_class_size"] == 1
        assert row["violating_classes"] == 1
        assert row["rows_at_risk"] == 1
        assert row["non_diverse_classes"] == 2
        assert row["k_anonymous"] is False

    def test_grouped_rollup_and_verdict(self, roster):
        rows = {r["zip"]: r for r in k_anonymity_summary(
            roster, ["zip", "age"], k=2, by="zip").collect()}
        assert rows["94001"]["violating_classes"] == 1
        assert rows["94001"]["k_anonymous"] is False
        assert rows["94002"]["violating_classes"] == 0
        assert rows["94002"]["k_anonymous"] is True

    def test_by_must_be_quasi(self, roster):
        with pytest.raises(ValueError, match="must be one of"):
            k_anonymity_summary(roster, ["zip", "age"], by="dx")

    def test_plan_is_pure_aggregate(self, roster):
        plan = k_anonymity_summary(
            roster, ["zip", "age"], k=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Join" not in plan and "Window" not in plan

    def test_approx_distinct_path_runs(self, roster):
        row = k_anonymity_audit(
            roster, ["zip", "age"], k=2, sensitive_col="dx", l=2,
            approx_rsd=0.02,
        ).filter("zip = '94001' AND age = '20-30'").collect()[0]
        # HLL at rsd 0.02 is exact for 2 distinct values
        assert row["sensitive_distinct"] == 2


class TestPseudonymize:
    def test_referential_integrity_and_format(self, spark):
        import hashlib

        from outrank_spark.operators.privacy import pseudonymize

        left = spark.createDataFrame(
            [(1, "a"), (2, "b"), (None, "c")], "k int, v string")
        right = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, x double")
        pl = pseudonymize(left, ["k"], secret="s1")
        pr = pseudonymize(right, ["k"], secret="s1")
        joined = pl.join(pr, "k").collect()
        assert {(r["v"], r["x"]) for r in joined} == \
            {("a", 10.0), ("b", 20.0)}
        tok = pl.where(F.col("v") == "a").collect()[0]["k"]
        want = "tok_" + hashlib.md5(b"s1|1").hexdigest()[:16]
        assert tok == want
        # nulls stay null by default
        assert pl.where(F.col("v") == "c").collect()[0]["k"] is None

    def test_secret_rotation_breaks_linkage(self, spark):
        from outrank_spark.operators.privacy import pseudonymize

        df = spark.createDataFrame([(7,)], "k int")
        t1 = pseudonymize(df, ["k"], secret="rel1").collect()[0]["k"]
        t2 = pseudonymize(df, ["k"], secret="rel2").collect()[0]["k"]
        assert t1 != t2

    def test_tokenize_nulls_option_and_errors(self, spark):
        from outrank_spark.operators.privacy import pseudonymize

        df = spark.createDataFrame([(None,), (1,)], "k int")
        toks = [r["k"] for r in
                pseudonymize(df, ["k"], secret="s",
                             keep_null=False).collect()]
        assert all(t is not None and t.startswith("tok_") for t in toks)
        with pytest.raises(ValueError, match="non-empty"):
            pseudonymize(df, [], secret="s")
        with pytest.raises(ValueError, match="unknown column"):
            pseudonymize(df, ["zz"], secret="s")
        with pytest.raises(ValueError, match="secret"):
            pseudonymize(df, ["k"], secret="")

    def test_pure_projection_no_shuffle(self, spark):
        from outrank_spark.operators.privacy import pseudonymize

        df = spark.range(100).select(F.col("id").alias("k"))
        plan = pseudonymize(df, ["k"], secret="s") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
