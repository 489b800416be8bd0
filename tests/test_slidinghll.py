"""Sliding-window HLL: suffix-replay equality, merge laws, wire,
skyline bound, and the Spark builder."""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.sketches.hll import HyperLogLog
from outrank_spark.sketches.slidinghll import SlidingHyperLogLog


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(7)
    vals = np.array([f"u{int(v)}" for v in
                     rng.integers(0, 20000, 80000)])
    ts = rng.uniform(0.0, 1000.0, 80000)
    return vals, ts


class TestSlidingHLL:
    def test_suffix_replay_equality(self, stream):
        """estimate(T) must equal a plain HLL fed ONLY ts >= T — for
        every T, from one build.  This is the defining invariant: the
        window bound is then exactly HLL's published bound."""
        vals, ts = stream
        sk = SlidingHyperLogLog(p=11).update(vals, ts)
        for T in (None, 0.0, 250.0, 500.0, 900.0, 999.5, 2000.0):
            mask = np.ones(len(ts), bool) if T is None else ts >= T
            ref = HyperLogLog(p=11).update(vals[mask])
            assert sk.estimate(T) == ref.estimate()

    def test_window_error_within_bound(self, stream):
        vals, ts = stream
        sk = SlidingHyperLogLog(p=12).update(vals, ts)
        for T in (0.0, 400.0, 800.0, 950.0):
            exact = len(set(vals[ts >= T].tolist()))
            est = sk.estimate(T)
            assert abs(est - exact) / exact < 3 * sk.relative_error

    def test_merge_bitwise_order_independent(self, stream):
        vals, ts = stream
        parts = [SlidingHyperLogLog(p=11).update(vals[i::4], ts[i::4])
                 for i in range(4)]
        import pickle
        frozen = [pickle.loads(pickle.dumps(p)) for p in parts]
        a = parts[0].merge(parts[1]).merge(parts[2]).merge(parts[3])
        b = frozen[3].merge(frozen[2]).merge(frozen[0]).merge(frozen[1])
        assert a.to_bytes() == b.to_bytes()
        one = SlidingHyperLogLog(p=11).update(vals, ts)
        assert a.to_bytes() == one.to_bytes()

    def test_merge_idempotent_and_family_guard(self, stream):
        vals, ts = stream
        a = SlidingHyperLogLog(p=10).update(vals[:999], ts[:999])
        blob = a.to_bytes()
        assert a.merge(
            SlidingHyperLogLog.from_bytes(blob)).to_bytes() == blob
        with pytest.raises(ValueError, match="precision"):
            a.merge(SlidingHyperLogLog(p=11))

    def test_wire_roundtrip_and_tag_guard(self, stream):
        vals, ts = stream
        sk = SlidingHyperLogLog(p=10).update(vals[:5000], ts[:5000])
        rt = SlidingHyperLogLog.from_bytes(sk.to_bytes())
        assert rt.to_bytes() == sk.to_bytes()
        assert rt.estimate(500.0) == sk.estimate(500.0)
        with pytest.raises(ValueError, match="tag"):
            SlidingHyperLogLog.from_bytes(b"\x01\x0a\x00\x00\x00\x00")

    def test_skyline_hard_bound_and_nonfinite_ts(self, stream):
        vals, ts = stream
        # adversarial arrival: ts descending with rho-correlated order
        # still cannot exceed the structural 64-p+1 cap
        order = np.argsort(-ts)
        sk = SlidingHyperLogLog(p=8).update(vals[order], ts[order])
        assert max(len(v) for v in sk.sky.values()) <= 64 - 8 + 1
        before = sk.to_bytes()
        sk.update(np.array(["x", "y"]),
                  np.array([np.nan, np.inf]))  # inf finite? no: dropped
        # nan dropped; +inf is not finite -> dropped too
        assert sk.to_bytes() == before
        with pytest.raises(ValueError, match="mismatch"):
            sk.update(np.array(["a"]), np.array([1.0, 2.0]))
        with pytest.raises(ValueError, match="p must be"):
            SlidingHyperLogLog(p=3)

    def test_empty_estimates_zero(self):
        sk = SlidingHyperLogLog(p=9)
        assert sk.estimate() == 0
        assert sk.estimate(123.0) == 0
        assert len(sk) == 0


class TestSlidingBuilderSpark:
    def test_builder_matches_exact_within_bound(self, spark):
        from pyspark.sql import functions as F
        from outrank_spark.operators.sketch_build import (
            sliding_distinct_counts,
        )

        n = 60000
        df = (
            spark.range(n)
            .withColumn("user", F.concat(F.lit("u"),
                                         F.pmod(F.xxhash64("id"),
                                                F.lit(9000))))
            .withColumn("t", (F.col("id") % 1000).cast("double"))
        )
        df = df.withColumn("t_ts", F.timestamp_seconds(F.col("t")))
        windows = {"all": 0.0, "late": 900.0}
        got = {r["window"]: r["est_distinct"] for r in
               sliding_distinct_counts(df, "user", "t_ts", windows,
                                       p=12).collect()}
        for label, t0 in windows.items():
            exact = (df.filter(F.col("t") >= t0)
                     .agg(F.countDistinct("user")).first()[0])
            assert abs(got[label] - exact) / exact < 3 * (1.04 / 2 ** 6)

    def test_builder_partition_invariant(self, spark):
        from pyspark.sql import functions as F
        from outrank_spark.operators.sketch_build import (
            sliding_distinct_counts,
        )

        df = (
            spark.range(5000)
            .withColumn("u", F.pmod(F.xxhash64("id"), F.lit(800)))
            .withColumn("ts", F.timestamp_seconds(
                (F.col("id") % 500).cast("double")))
        )
        w = {"a": 0.0, "b": 250.0}
        base = sorted(
            (r["window"], r["est_distinct"]) for r in
            sliding_distinct_counts(df, "u", "ts", w).collect())
        for variant in (df.repartition(13), df.coalesce(1)):
            assert sorted(
                (r["window"], r["est_distinct"]) for r in
                sliding_distinct_counts(variant, "u", "ts", w).collect()
            ) == base

    def test_builder_validates_and_empty(self, spark):
        import pytest as _pt
        from pyspark.sql import functions as F
        from outrank_spark.operators.sketch_build import (
            sliding_distinct_counts,
        )

        df = spark.range(10).withColumn(
            "ts", F.timestamp_seconds(F.col("id").cast("double")))
        with _pt.raises(ValueError, match="at least one window"):
            sliding_distinct_counts(df, "id", "ts", {})
        empty = df.filter(F.lit(False))
        got = sliding_distinct_counts(empty, "id", "ts",
                                      {"w": 0.0}).collect()
        assert [(r["window"], r["est_distinct"]) for r in got] == \
            [("w", 0)]
