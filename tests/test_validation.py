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


class TestBenfordAudit:
    def test_hand_digit_counts_and_chi2(self, spark):
        import math

        from outrank_spark.operators.validation import benford_audit

        # first digits: 1, 1, 2, 9, 1 (0.04 excluded? no: 0.04 -> 4)
        df = spark.createDataFrame(
            [(1.0,), (123.4,), (0.25,), (950.0,), (0.0011,),
             (None,), (0.0,)],
            "v double")
        got = {r["digit"]: r for r in
               benford_audit(df, ["v"]).collect()}
        assert set(got) == set(range(1, 10))      # full scaffold
        counts = {d: got[d]["n_obs"] for d in got}
        assert counts == {1: 3, 2: 1, 9: 1, 3: 0, 4: 0, 5: 0,
                          6: 0, 7: 0, 8: 0}
        n = 5
        for d in (1, 9):
            e = n * math.log10(1 + 1 / d)
            assert got[d]["chi2_term"] == pytest.approx(
                (counts[d] - e) ** 2 / e, abs=5e-7)
        assert got[1]["obs_frac"] == pytest.approx(3 / 5, abs=1e-9)
        assert got[1]["exp_frac"] == pytest.approx(
            math.log10(2), abs=5e-7)

    def test_sub_granularity_and_zero_excluded(self, spark):
        from outrank_spark.operators.validation import benford_audit

        df = spark.createDataFrame(
            [(4e-7,), (0.0,), (2e-6,)], "v double")
        got = benford_audit(df, ["v"]).collect()
        assert sum(r["n_obs"] for r in got) == 1   # only 2e-6 counted
        assert next(r for r in got if r["digit"] == 2)["n_obs"] == 1

    def test_negative_values_use_abs(self, spark):
        from outrank_spark.operators.validation import benford_audit

        df = spark.createDataFrame([(-35.0,), (31.0,)], "v double")
        got = {r["digit"]: r["n_obs"]
               for r in benford_audit(df, ["v"]).collect()}
        assert got[3] == 2

    def test_unknown_column_raises(self, spark):
        from outrank_spark.operators.validation import benford_audit

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="unknown column"):
            benford_audit(df, ["nope"])

    def test_one_scan_no_sort_merge_join(self, spark):
        from outrank_spark.operators.validation import benford_audit

        df = spark.createDataFrame(
            [(float(i), float(i * 7)) for i in range(1, 50)],
            "a double, b double")
        plan = benford_audit(df, ["a", "b"])._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "SortMergeJoin" not in plan


class TestFdViolations:
    def test_g3_on_planted_violations(self, spark):
        from outrank_spark.operators.validation import fd_violations

        # a -> b: group a=1 has b values {x: 2, y: 1} -> g3 = 1;
        # group a=2 is clean
        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "y"), (2, "z"), (2, "z")],
            "a int, b string")
        r = fd_violations(df, [("a", "b")]).collect()[0]
        assert (r["n_rows"], r["n_groups"]) == (5, 2)
        assert r["n_violating_groups"] == 1
        assert r["g3_violations"] == 1
        assert r["g3_error"] == pytest.approx(0.2)
        assert r["holds"] is False

    def test_exact_fd_holds(self, spark):
        from outrank_spark.operators.validation import fd_violations

        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (2, "y")], "a int, b string")
        r = fd_violations(df, [("a", "b")]).collect()[0]
        assert r["holds"] is True and r["g3_violations"] == 0

    def test_nulls_excluded_and_composite_lhs(self, spark):
        from outrank_spark.operators.validation import fd_violations

        df = spark.createDataFrame(
            [(1, "u", "x"), (1, "u", "y"), (1, "v", "x"),
             (None, "u", "x"), (1, None, "x"), (1, "u", None)],
            "a int, b string, c string")
        got = fd_violations(df, [(["a", "b"], "c")]).collect()[0]
        # only the 3 fully non-null rows count; (1,u) has {x,y}
        assert got["n_rows"] == 3
        assert got["lhs"] == "a,b"
        assert got["n_violating_groups"] == 1
        assert got["g3_violations"] == 1

    def test_multiple_fds_one_row_each(self, spark):
        from outrank_spark.operators.validation import fd_violations

        df = spark.createDataFrame(
            [(1, "x", 5), (2, "y", 5)], "a int, b string, c int")
        got = fd_violations(df, [("a", "b"), ("c", "b"), ("b", "a")])
        rows = got.orderBy("fd_id").collect()
        assert [r["fd_id"] for r in rows] == [0, 1, 2]
        assert rows[1]["holds"] is False      # c=5 -> {x, y}
        assert rows[0]["holds"] and rows[2]["holds"]

    def test_errors(self, spark):
        from outrank_spark.operators.validation import fd_violations

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        with pytest.raises(ValueError, match="non-empty"):
            fd_violations(df, [])
        with pytest.raises(ValueError, match="unknown column"):
            fd_violations(df, [("a", "zzz")])


class TestKeySkewAudit:
    def test_matches_numpy_gini(self, spark):
        import numpy as np

        from outrank_spark.operators.validation import key_skew_audit

        rng = np.random.default_rng(7)
        keys = rng.zipf(1.7, 4000) % 97          # skewed key draw
        df = spark.createDataFrame(
            [(int(k),) for k in keys], "k long")
        got = key_skew_audit(df, "k").collect()[0]
        counts = np.sort(np.bincount(keys)[np.bincount(keys) > 0])
        n, tot = len(counts), counts.sum()
        gini = (2 * np.sum(np.arange(1, n + 1) * counts)
                / (n * tot) - (n + 1) / n)
        assert got["n_rows"] == tot and got["n_keys"] == n
        assert got["max_count"] == counts[-1]
        assert got["gini"] == pytest.approx(gini, abs=5e-7)
        assert got["top1_share"] == pytest.approx(
            counts[-1] / tot, abs=5e-7)
        assert got["topk_share"] == pytest.approx(
            counts[-10:].sum() / tot, abs=5e-7)

    def test_uniform_keys_gini_zero(self, spark):
        from outrank_spark.operators.validation import key_skew_audit

        df = spark.createDataFrame(
            [(i % 10,) for i in range(100)], "k int")
        got = key_skew_audit(df, "k").collect()[0]
        assert got["gini"] == pytest.approx(0.0, abs=1e-9)
        assert got["topk_share"] == pytest.approx(1.0)

    def test_null_keys_dropped_and_topk_truncation(self, spark):
        from outrank_spark.operators.validation import key_skew_audit

        df = spark.createDataFrame(
            [(None,), (1,), (1,), (2,)], "k int")
        got = key_skew_audit(df, "k", top_k=1).collect()[0]
        assert got["n_rows"] == 3 and got["n_keys"] == 2
        assert got["topk_share"] == pytest.approx(2 / 3, abs=5e-7)

    def test_errors(self, spark):
        from outrank_spark.operators.validation import key_skew_audit

        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="unknown column"):
            key_skew_audit(df, "zzz")
        with pytest.raises(ValueError, match="top_k"):
            key_skew_audit(df, "k", top_k=0)


class TestDataQualityJob:
    def test_full_report_in_process(self, spark, tmp_path):
        import json

        from outrank_spark.jobs.data_quality import (
            build_parser,
            run_quality,
        )

        rules = [{"col": "doc_id", "rule": "unique"},
                 {"col": "n_chars", "rule": "max", "value": 300}]
        rules_f = tmp_path / "rules.json"
        rules_f.write_text(json.dumps(rules))
        args = build_parser().parse_args([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--rules", str(rules_f),
            "--benford", "n_chars",
            "--fd", "doc_id->lang", "lang,source->n_chars",
            "--skew_keys", "lang,source",
        ])
        report, violated = run_quality(spark, args)
        assert {r["column"] for r in report["profile"]} == {
            "doc_id", "text", "lang", "source", "n_chars"}
        cons = {r["rule"]: r for r in report["constraints"]}
        assert cons["unique"]["passed"] is True
        assert cons["max"]["passed"] is False       # planted breach
        assert violated is True
        assert len(report["benford"]) == 9
        fd = {r["rhs"]: r for r in report["fd"]}
        assert fd["lang"]["holds"] is True          # key FD
        assert fd["n_chars"]["holds"] is False
        assert {r["key"] for r in report["skew"]} == {"lang", "source"}
        # the whole report is JSON-serializable metadata
        json.dumps(report, default=str)

    def test_fd_spec_parsing_errors(self):
        import pytest as _pytest

        from outrank_spark.jobs.data_quality import _parse_fd

        assert _parse_fd("a->b") == ("a", "b")
        assert _parse_fd("x, y -> z") == (["x", "y"], "z")
        with _pytest.raises(ValueError, match="FD spec"):
            _parse_fd("nope")
        with _pytest.raises(ValueError, match="bad FD spec"):
            _parse_fd("->b")

    def test_wrapper_subprocess_exit_codes(self, tmp_path):
        import json
        import subprocess
        import sys as _sys

        rules_f = tmp_path / "rules.json"
        rules_f.write_text(json.dumps(
            [{"col": "n_chars", "rule": "max", "value": 300}]))
        out_f = tmp_path / "report.json"
        r = subprocess.run(
            [_sys.executable, "jobs/data_quality_job.py",
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--rules", str(rules_f), "--fail_on_violation",
             "--report", str(out_f),
             "--spark_master", "local[2]",
             "--shuffle_partitions", "4"],
            capture_output=True, text=True, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1, r.stderr[-2000:]   # gate fired
        doc = json.loads(out_f.read_text())
        assert doc["passed"] is False
        assert doc["profile"] and doc["constraints"]


class TestProfileDiff:
    def test_flags_and_deltas_hand_computed(self, spark):
        from outrank_spark.operators.validation import profile_diff

        before = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, None)],
            "x int, s string")
        after = spark.createDataFrame(
            [(10, "a"), (None, "a"), (None, "a"), (13, "a")],
            "x int, s string")
        got = {r["column"]: r for r in
               profile_diff(before, after).collect()}
        x = got["x"]
        assert (x["n_before"], x["n_after"]) == (4, 4)
        assert x["null_frac_delta"] == pytest.approx(0.5)
        assert x["distinct_ratio"] == pytest.approx(2 / 4)  # {10,13}
        assert x["mean_delta"] == pytest.approx(
            (10 + 13) / 2 - (1 + 2 + 3 + 4) / 4)
        assert x["drifted"] is True                # null_frac jumped
        s = got["s"]
        assert s["distinct_ratio"] == pytest.approx(1 / 3)
        assert s["drifted"] is True                # collapse to 1 value
        assert s["mean_delta"] is None

    def test_stable_snapshot_not_flagged(self, spark):
        from outrank_spark.operators.validation import profile_diff

        df = spark.createDataFrame(
            [(i, f"v{i % 5}") for i in range(100)], "x int, s string")
        got = profile_diff(df, df).collect()
        assert all(r["drifted"] is False for r in got)
        assert all(r["null_frac_delta"] == 0.0 for r in got)

    def test_zero_before_distinct_flags_new_values(self, spark):
        from outrank_spark.operators.validation import profile_diff

        before = spark.createDataFrame(
            [(None,), (None,)], "s string")
        after = spark.createDataFrame([("new",)], "s string")
        r = profile_diff(before, after).collect()[0]
        assert r["distinct_ratio"] is None and r["drifted"] is True

    def test_schema_mismatch_raises(self, spark):
        from outrank_spark.operators.validation import profile_diff

        a = spark.createDataFrame([(1,)], "x int")
        b = spark.createDataFrame([(1,)], "y int")
        with pytest.raises(ValueError, match="lacks column"):
            profile_diff(a, b, cols=["x"])


class TestHostileColumnNames:
    """Column names containing quotes/backticks are spliced into
    selectExpr/stack SQL (ADVICE r4) — they must profile, audit, and
    correlate without parse errors or mis-parsed expressions."""

    @pytest.fixture(scope="class")
    def hostile(self, spark):
        df = spark.createDataFrame(
            [(1.0, 11.0, "x"), (2.0, 12.0, None), (3.0, 13.0, "y")],
            "a double, b double, c string")
        return (df.withColumnRenamed("a", "it's")
                  .withColumnRenamed("b", "a`b")
                  .withColumnRenamed("c", "we\"ird"))

    def test_profile_table(self, hostile):
        prof = {r["column"]: r for r in profile_table(hostile).collect()}
        assert set(prof) == {"it's", "a`b", 'we"ird'}
        assert prof["it's"]["n_null"] == 0
        assert prof["it's"]["min_num"] == 1.0
        assert prof["a`b"]["max_num"] == 13.0
        assert prof['we"ird']["n_null"] == 1
        assert prof['we"ird']["min_str"] == "x"

    def test_benford_audit(self, hostile):
        from outrank_spark.operators.validation import benford_audit
        out = benford_audit(hostile, ["it's", "a`b"]).collect()
        cols = {r["column"] for r in out}
        assert cols == {"it's", "a`b"}
        n1 = {r["digit"]: r["n_obs"] for r in out
              if r["column"] == "a`b"}
        assert n1[1] == 3          # 11, 12, 13 all lead with 1

    def test_correlation_matrix(self, hostile):
        from outrank_spark.operators.evaluation import correlation_matrix
        out = correlation_matrix(hostile, ["it's", "a`b"]).collect()
        assert len(out) == 1
        assert abs(out[0]["corr"] - 1.0) < 1e-9
        assert out[0]["n"] == 3
