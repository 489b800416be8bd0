"""As-of join (operators/temporal.py) vs a pandas merge_asof oracle."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.temporal import asof_join


class TestAsofJoin:
    def test_hand_cases(self, spark):
        left = spark.createDataFrame(pd.DataFrame({
            "uid": [1, 1, 1, 2, 3],
            "ts": pd.to_datetime([
                "2024-01-01 09:00", "2024-01-01 10:00",
                "2024-01-01 11:00", "2024-01-02 00:00",
                "2024-01-05 00:00",
            ]),
            "ev": ["pre", "a", "b", "d", "none"],
        }))
        right = spark.createDataFrame(pd.DataFrame({
            "uid": [1, 1, 1, 2],
            "ots": pd.to_datetime([
                "2024-01-01 09:30", "2024-01-01 10:30",
                "2024-01-01 10:30", "2024-01-01 12:00",
            ]),
            "okey": [10, 11, 12, 20],
        }))
        out = {
            r["ev"]: r["okey_asof"]
            for r in asof_join(left, right, by="uid", left_time="ts",
                               right_time="ots", tiebreak="okey").collect()
        }
        assert out == {
            "pre": None,   # no order before 09:00
            "a": 10,       # 09:30
            "b": 12,       # 10:30, tiebreak max okey
            "d": 20,
            "none": None,  # uid 3 has no orders
        }

    def test_equal_timestamp_is_inclusive(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame({"uid": [1], "ts": pd.to_datetime(["2024-01-01"]),
                          "x": ["e"]}))
        right = spark.createDataFrame(
            pd.DataFrame({"uid": [1], "ots": pd.to_datetime(["2024-01-01"]),
                          "okey": [5]}))
        row = asof_join(left, right, by="uid", left_time="ts",
                        right_time="ots").first()
        assert row["okey_asof"] == 5

    def test_random_matches_pandas_merge_asof(self, spark):
        rng = np.random.default_rng(13)
        n_l, n_r = 400, 150
        lt = pd.DataFrame({
            "uid": rng.integers(0, 12, n_l),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n_l), unit="s"),
            "row": np.arange(n_l),
        })
        rt = pd.DataFrame({
            "uid": rng.integers(0, 12, n_r),
            "ots": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n_r), unit="s"),
            "okey": np.arange(n_r),
        }).drop_duplicates(subset=["uid", "ots"])
        got = (
            asof_join(spark.createDataFrame(lt), spark.createDataFrame(rt),
                      by="uid", left_time="ts", right_time="ots")
            .toPandas().sort_values("row").reset_index(drop=True)
        )
        ref = pd.merge_asof(
            lt.sort_values("ts"), rt.sort_values("ots"),
            left_on="ts", right_on="ots", by="uid",
            direction="backward",
        ).sort_values("row").reset_index(drop=True)
        assert (
            got["okey_asof"].fillna(-1).to_numpy()
            == ref["okey"].fillna(-1).to_numpy()
        ).all()

    def test_plan_has_no_inequality_join(self, spark):
        """The implementation must be union+window, not a range join
        (BroadcastNestedLoop/Cartesian are the 100 TB failure mode)."""
        left = spark.createDataFrame(
            pd.DataFrame({"uid": [1], "ts": pd.to_datetime(["2024-01-01"]),
                          "x": ["e"]}))
        right = spark.createDataFrame(
            pd.DataFrame({"uid": [1], "ots": pd.to_datetime(["2024-01-01"]),
                          "okey": [5]}))
        plan = asof_join(
            left, right, by="uid", left_time="ts", right_time="ots",
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Window" in plan


class TestRangeJoin:
    def test_matches_naive_inequality_join(self, spark):
        from outrank_spark.operators.temporal import range_join

        rng = np.random.default_rng(5)
        pts = pd.DataFrame({
            "uid": rng.integers(0, 8, 300),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, 300), unit="s"),
            "pid": np.arange(300),
        })
        iv = pd.DataFrame({
            "uid": rng.integers(0, 8, 60),
            "start": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 28 * 86400, 60), unit="s"),
            "iid": np.arange(60),
        })
        iv["end"] = iv["start"] + pd.to_timedelta(
            rng.integers(3600, 4 * 86400, 60), unit="s")
        got = {
            (r["pid"], r["iid"])
            for r in range_join(
                spark.createDataFrame(pts), spark.createDataFrame(iv),
                by="uid", point_col="ts", start_col="start",
                end_col="end", bucket_seconds=86400,
            ).collect()
        }
        merged = pts.merge(iv, on="uid")
        ref = {
            (r.pid, r.iid)
            for r in merged.itertuples()
            if r.start <= r.ts <= r.end
        }
        assert got == ref and len(ref) > 0

    def test_each_pair_matched_exactly_once(self, spark):
        from outrank_spark.operators.temporal import range_join

        # interval spans many buckets; the point is in one bucket ->
        # the pair must appear exactly once, not once per bucket
        pts = spark.createDataFrame(pd.DataFrame({
            "uid": [1], "ts": pd.to_datetime(["2024-01-05"]), "pid": [0],
        }))
        iv = spark.createDataFrame(pd.DataFrame({
            "uid": [1], "start": pd.to_datetime(["2024-01-01"]),
            "end": pd.to_datetime(["2024-01-20"]), "iid": [0],
        }))
        out = range_join(pts, iv, by="uid",
                         point_col="ts", start_col="start",
                         end_col="end").collect()
        assert len(out) == 1

    def test_no_nested_loop_in_plan(self, spark):
        from outrank_spark.operators.temporal import range_join

        pts = spark.createDataFrame(pd.DataFrame({
            "uid": [1], "ts": pd.to_datetime(["2024-01-05"]), "pid": [0],
        }))
        iv = spark.createDataFrame(pd.DataFrame({
            "uid": [1], "start": pd.to_datetime(["2024-01-01"]),
            "end": pd.to_datetime(["2024-01-02"]), "iid": [0],
        }))
        plan = range_join(
            pts, iv, by="uid", point_col="ts",
            start_col="start", end_col="end",
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestFunnelCounts:
    def _ev(self, spark, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        return spark.createDataFrame(pdf)

    def test_sequential_min_strictly_after(self, spark):
        from outrank_spark.operators.temporal import funnel_counts

        rows = [
            # u1 completes in order
            (1, "2024-01-01 10:00", "view"),
            (1, "2024-01-01 10:05", "click"),
            (1, "2024-01-01 10:10", "purchase"),
            # u2: click BEFORE the first view — must not count
            (2, "2024-01-01 09:00", "click"),
            (2, "2024-01-01 10:00", "view"),
            (2, "2024-01-01 11:00", "purchase"),
            # u3: click at the SAME instant as view — strict >, no
            (3, "2024-01-01 10:00", "view"),
            (3, "2024-01-01 10:00", "click"),
            # u4: never viewed
            (4, "2024-01-01 10:00", "purchase"),
        ]
        out = {r["step"]: r["n_users"] for r in funnel_counts(
            self._ev(spark, rows), ["view", "click", "purchase"],
        ).collect()}
        assert out == {1: 3, 2: 1, 3: 1}

    def test_later_step_events_can_still_progress(self, spark):
        from outrank_spark.operators.temporal import funnel_counts

        # early purchase is ignored; the later one (after click) counts
        rows = [(1, "2024-01-01 10:00", "view"),
                (1, "2024-01-01 10:01", "purchase"),
                (1, "2024-01-01 10:02", "click"),
                (1, "2024-01-01 10:03", "purchase")]
        out = {r["step"]: r["n_users"] for r in funnel_counts(
            self._ev(spark, rows), ["view", "click", "purchase"],
        ).collect()}
        assert out == {1: 1, 2: 1, 3: 1}

    def test_horizon_caps_from_first_step(self, spark):
        from outrank_spark.operators.temporal import funnel_counts

        rows = [(1, "2024-01-01 10:00", "view"),
                (1, "2024-01-01 10:30", "click"),     # inside 1h
                (1, "2024-01-01 12:00", "purchase"),  # outside 1h
                (2, "2024-01-01 10:00", "view"),
                (2, "2024-01-01 10:10", "click"),
                (2, "2024-01-01 10:20", "purchase")]
        out = {r["step"]: r["n_users"] for r in funnel_counts(
            self._ev(spark, rows), ["view", "click", "purchase"],
            horizon_seconds=3600,
        ).collect()}
        assert out == {1: 2, 2: 2, 3: 1}

    def test_empty_and_zero_rows_still_emit_all_steps(self, spark):
        from outrank_spark.operators.temporal import funnel_counts

        rows = [(1, "2024-01-01 10:00", "error")]
        out = funnel_counts(self._ev(spark, rows),
                            ["view", "click"]).collect()
        assert [(r["step"], r["n_users"]) for r in out] == [(1, 0), (2, 0)]

    def test_duplicate_steps_rejected(self, spark):
        from outrank_spark.operators.temporal import funnel_counts

        with pytest.raises(ValueError):
            funnel_counts(self._ev(spark, [(1, "2024-01-01", "view")]),
                          ["view", "view"])

    def test_partition_invariant(self, spark):
        from outrank_spark.operators.temporal import funnel_counts

        rng = np.random.default_rng(7)
        rows = [(int(rng.integers(0, 40)),
                 pd.Timestamp("2024-01-01") + pd.Timedelta(
                     seconds=int(rng.integers(0, 3_000_000))),
                 ["view", "click", "purchase", "error"][
                     int(rng.integers(0, 4))])
                for _ in range(800)]
        df = self._ev(spark, rows)
        a = funnel_counts(df.repartition(1),
                          ["view", "click", "purchase"]).collect()
        b = funnel_counts(df.repartition(13),
                          ["view", "click", "purchase"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestCohortRetention:
    def test_hand_matrix(self, spark):
        from outrank_spark.operators.temporal import cohort_retention

        # 2024-01-01 and 2024-01-08 are Mondays (week starts)
        rows = [(1, "2024-01-02"), (1, "2024-01-09"),   # w0 cohort, +0 +1
                (2, "2024-01-03"),                      # w0 cohort, +0
                (3, "2024-01-10"), (3, "2024-01-21")]   # w1 cohort, +0 +1
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        out = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
               for r in cohort_retention(
                   spark.createDataFrame(pdf)).collect()}
        assert out == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                       ("2024-01-08", 0): 1, ("2024-01-08", 1): 1}

    def test_max_offset_trims(self, spark):
        from outrank_spark.operators.temporal import cohort_retention

        rows = [(1, "2024-01-02"), (1, "2024-03-01")]
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        out = cohort_retention(spark.createDataFrame(pdf),
                               max_offset=1).collect()
        assert [(r["week_offset"], r["n_users"]) for r in out] == [(0, 1)]


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        from outrank_spark.operators.temporal import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "d")],
            "id long, v string",
        )
        new = spark.createDataFrame(
            [(1, "a"), (2, "B"), (3, None), (5, "e")],
            "id long, v string",
        )
        got = {r["id"]: r["status"]
               for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
        # null == null must read unchanged (eqNullSafe), 4 removed,
        # 5 added, 2 changed
        assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                       4: "removed", 5: "added"}

    def test_composite_keys_and_null_to_value_change(self, spark):
        from outrank_spark.operators.temporal import snapshot_diff

        old = spark.createDataFrame(
            [("a", 1, None), ("a", 2, "x")], "k1 string, k2 long, v string",
        )
        new = spark.createDataFrame(
            [("a", 1, "now-set"), ("a", 2, "x")],
            "k1 string, k2 long, v string",
        )
        got = {(r["k1"], r["k2"]): r["status"]
               for r in snapshot_diff(old, new, ["k1", "k2"],
                                      ["v"]).collect()}
        assert got == {("a", 1): "changed", ("a", 2): "unchanged"}

    def test_single_join_plan(self, spark):
        from outrank_spark.operators.temporal import snapshot_diff

        old = spark.createDataFrame([(1, "a")], "id long, v string")
        new = spark.createDataFrame([(1, "a")], "id long, v string")
        plan = snapshot_diff(old, new, ["id"], ["v"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Join") == 1  # one full-outer, nothing else

    def test_presence_only_and_key_validation(self, spark):
        from outrank_spark.operators.temporal import snapshot_diff

        old = spark.createDataFrame([(1, "a")], "id long, v string")
        new = spark.createDataFrame([(1, "ZZZ"), (2, "b")],
                                    "id long, v string")
        got = {r["id"]: r["status"]
               for r in snapshot_diff(old, new, ["id"], []).collect()}
        assert got == {1: "unchanged", 2: "added"}  # presence-only
        import pytest as _pytest
        with _pytest.raises(ValueError, match="key column"):
            snapshot_diff(old, new, [], ["v"])


class TestDecayedAggregate:
    def _events(self, spark):
        import pandas as pd
        # anchor 2024-01-08 00:00; ages: 0, 1hl (7d), 2hl (14d)
        pdf = pd.DataFrame({
            "k": ["a", "a", "a", "b"],
            "ts": pd.to_datetime([
                "2024-01-08 00:00", "2024-01-01 00:00",
                "2023-12-25 00:00", "2024-01-08 00:00",
            ]),
            "v": [10.0, 10.0, 10.0, 4.0],
        })
        return spark.createDataFrame(pdf)

    def test_hand_computed_half_lives(self, spark):
        from outrank_spark.operators.temporal import decayed_aggregate
        out = {r["k"]: r for r in decayed_aggregate(
            self._events(spark), "ts", ["k"], 7 * 86400.0,
            value_col="v").collect()}
        # weights 1, 0.5, 0.25 exactly (ages are exact half-lives)
        assert out["a"]["n_events"] == 3
        assert out["a"]["decayed_count"] == pytest.approx(1.75, abs=1e-12)
        assert out["a"]["decayed_sum"] == pytest.approx(17.5, abs=1e-12)
        assert out["b"]["decayed_count"] == pytest.approx(1.0, abs=1e-12)

    def test_explicit_anchor_shifts_weights(self, spark):
        from outrank_spark.operators.temporal import decayed_aggregate
        import pandas as pd
        anchor = int(pd.Timestamp("2024-01-15 00:00").value // 1000)
        out = {r["k"]: r for r in decayed_aggregate(
            self._events(spark), "ts", ["k"], 7 * 86400.0,
            ref_epoch_us=anchor).collect()}
        # everything one half-life older: 0.5 + 0.25 + 0.125
        assert out["a"]["decayed_count"] == pytest.approx(0.875, abs=1e-12)

    def test_null_ts_excluded_and_null_value_counts(self, spark):
        from outrank_spark.operators.temporal import decayed_aggregate
        df = self._events(spark)
        df = df.unionByName(df.sparkSession.createDataFrame(
            [("a", None, 99.0), ("b", "2024-01-08 00:00", None)],
            "k string, ts string, v double",
        ).withColumn("ts", F.col("ts").cast(dict(df.dtypes)["ts"])))
        out = {r["k"]: r for r in decayed_aggregate(
            df, "ts", ["k"], 7 * 86400.0, value_col="v").collect()}
        assert out["a"]["n_events"] == 3          # null ts dropped
        assert out["b"]["n_events"] == 2          # null v still counted
        assert out["b"]["decayed_sum"] == pytest.approx(4.0, abs=1e-12)

    def test_errors(self, spark):
        from outrank_spark.operators.temporal import decayed_aggregate
        df = self._events(spark)
        with pytest.raises(ValueError, match="half_life"):
            decayed_aggregate(df, "ts", ["k"], 0)
        empty = df.where(F.lit(False))
        with pytest.raises(ValueError, match="anchor"):
            decayed_aggregate(empty, "ts", ["k"], 60.0)

    def test_plan_is_single_aggregate(self, spark):
        from outrank_spark.operators.temporal import decayed_aggregate
        out = decayed_aggregate(self._events(spark), "ts", ["k"],
                                3600.0, value_col="v")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan and "Join" not in plan


class TestIdentifierSafety:
    """Step names and column names are data, not SQL text."""

    def test_funnel_step_with_quote(self, spark):
        from pyspark.sql import functions as F

        from outrank_spark.operators.temporal import funnel_counts

        steps = ["sign'up", 'pur"chase']
        df = spark.createDataFrame(
            [("u1", "sign'up", 1.0), ("u1", 'pur"chase', 2.0),
             ("u2", "sign'up", 5.0)],
            "user_id string, event_type string, t double",
        ).withColumn("ts", F.timestamp_seconds("t"))
        got = {r["step"]: (r["event_type"], r["n_users"]) for r in
               funnel_counts(df, steps).collect()}
        assert got == {1: ("sign'up", 2), 2: ('pur"chase', 1)}

    def test_epoch_us_expr_backtick_ntz_column(self, spark):
        from pyspark.sql import functions as F

        from outrank_spark.operators.temporal import epoch_us_expr

        df = spark.sql(
            "SELECT TIMESTAMP_NTZ'1970-01-01 00:00:01' AS `t``s`"
        )
        got = df.select(
            epoch_us_expr(df, "t`s").alias("us")).first()["us"]
        assert got == 1_000_000
