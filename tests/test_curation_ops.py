"""Round-4b curation/analytics operators: densify_time_series,
merge_intervals (temporal), ngram_diversity, zipf_fit (text),
containment_join (dedup), hash_split (sampling) — hand-computed and
python-model oracles, partition invariance, edge/validation paths.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.dedup import containment_join
from outrank_spark.operators.sampling import hash_split
from outrank_spark.operators.temporal import (
    densify_time_series,
    merge_intervals,
)
from outrank_spark.operators.text import ngram_diversity, zipf_fit


class TestDensifyTimeSeries:
    def test_hand_grid(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "ts": pd.to_datetime([
                "2024-01-01 00:10", "2024-01-01 00:50",
                "2024-01-01 02:05", "2024-01-01 01:30",
            ]),
            "g": ["a", "a", "a", "b"],
            "v": [1.0, 2.0, 4.0, 8.0],
        }))
        out = densify_time_series(df, "ts", "g", "hour", agg_col="v")
        rows = {(r["g"], r["bucket_ts"].hour): (r["n_events"], r["agg_sum"])
                for r in out.collect()}
        # global span 00..02 for BOTH groups (aligned series)
        assert len(rows) == 6
        assert rows[("a", 0)] == (2, 3.0)
        assert rows[("a", 1)] == (0, None)   # gap: zero count, NULL sum
        assert rows[("a", 2)] == (1, 4.0)
        assert rows[("b", 0)] == (0, None)
        assert rows[("b", 1)] == (1, 8.0)
        assert rows[("b", 2)] == (0, None)

    def test_count_only_and_null_ts(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "ts": [pd.Timestamp("2024-01-01 00:00"), pd.NaT,
                   pd.Timestamp("2024-01-01 00:30")],
            "g": ["a", "a", "a"],
        }))
        out = densify_time_series(df, "ts", "g", "hour").collect()
        assert len(out) == 1  # null ts excluded from facts AND span
        assert out[0]["n_events"] == 2
        assert "agg_sum" not in out[0].asDict()

    def test_internal_collision_raises(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]),
                          "_b": [1], "g": ["a"]}))
        with pytest.raises(ValueError, match="collide"):
            densify_time_series(df, "ts", "g")


def _merge_py(iv: list[tuple[float, float]]) -> tuple[int, float]:
    """Independent sweep-line oracle: (n_episodes, covered)."""
    eps = []
    for s, e in sorted(iv):
        if eps and s <= eps[-1][1]:
            eps[-1][1] = max(eps[-1][1], e)
        else:
            eps.append([s, e])
    return len(eps), float(sum(e - s for s, e in eps))


class TestMergeIntervals:
    def test_hand_cases(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "k": ["u"] * 3 + ["v"] * 2,
            "s": [0.0, 5.0, 20.0, 0.0, 10.0],
            "e": [10.0, 15.0, 30.0, 10.0, 20.0],
        }))
        out = {r["k"]: (r["n_episodes"], r["covered_secs"])
               for r in merge_intervals(df, "s", "e", "k").collect()}
        assert out["u"] == (2, 25.0)   # [0,15] + [20,30]
        assert out["v"] == (1, 20.0)   # touching endpoints merge

    def test_nested_and_duplicate_intervals(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "k": ["u"] * 4,
            "s": [0.0, 2.0, 0.0, 50.0],
            "e": [40.0, 5.0, 40.0, 60.0],
        }))
        out = merge_intervals(df, "s", "e", "k").collect()[0]
        assert (out["n_episodes"], out["covered_secs"]) == (2, 50.0)

    def test_invalid_interval_raises(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "k": ["u"], "s": [10.0], "e": [5.0]}))
        with pytest.raises(ValueError, match="inverted"):
            merge_intervals(df, "s", "e", "k")
        df2 = spark.createDataFrame(pd.DataFrame({
            "k": ["u"], "s": [np.nan], "e": [5.0]}))
        with pytest.raises(ValueError, match="NULL or inverted"):
            merge_intervals(df2, "s", "e", "k")

    def test_random_vs_python_oracle_and_partitioning(self, spark):
        rng = np.random.default_rng(7)
        n = 400
        pdf = pd.DataFrame({
            "k": rng.integers(0, 9, n).astype(str),
            "s": rng.uniform(0, 1000, n).round(3),
        })
        pdf["e"] = (pdf["s"] + rng.uniform(0, 60, n).round(3)).round(3)
        want = {
            k: _merge_py(list(zip(g["s"], g["e"])))
            for k, g in pdf.groupby("k")
        }
        for parts in (1, 7):
            out = {
                r["k"]: (r["n_episodes"], r["covered_secs"])
                for r in merge_intervals(
                    spark.createDataFrame(pdf).repartition(parts),
                    "s", "e", "k").collect()
            }
            assert set(out) == set(want)
            for k in want:
                assert out[k][0] == want[k][0]
                assert out[k][1] == pytest.approx(want[k][1], abs=1e-6)


class TestNgramDiversity:
    def test_hand_bigrams(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a b a b", "w x y z", "solo"],
        }))
        out = {r["doc_id"]: r for r in
               ngram_diversity(df, "text", "doc_id", n=2).collect()}
        # "a b a b": bigrams (a b, b a, a b) -> 3 total, 2 distinct
        assert (out[1]["n_ngrams"], out[1]["n_distinct"]) == (3, 2)
        assert out[1]["diversity"] == pytest.approx(2 / 3)
        assert out[2]["diversity"] == pytest.approx(1.0)
        # sub-n docs: NULL, never 0 (0 would fake "max repetitive")
        assert out[3]["n_ngrams"] is None
        assert out[3]["diversity"] is None

    def test_unigrams_and_monotone_repetition(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["a a a a b", "a b c d e"],
        }))
        out = {r["doc_id"]: r["diversity"] for r in
               ngram_diversity(df, "text", "doc_id", n=1).collect()}
        assert out[1] == pytest.approx(2 / 5)
        assert out[2] == pytest.approx(1.0)
        assert out[1] < out[2]

    def test_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "text": ["a b"]}))
        with pytest.raises(ValueError, match="n must be"):
            ngram_diversity(df, "text", "doc_id", n=0)
        bad = df.withColumn("__toks", F.lit(1))
        with pytest.raises(ValueError, match="collide"):
            ngram_diversity(bad, "text", "doc_id")


class TestZipfFit:
    def test_known_counts_vs_numpy(self, spark):
        # exact token frequencies: a:8, b:4, c:2, hapax:1 (floored out)
        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["hapax"])
        df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
        row = zipf_fit(df, "text", min_count=2).collect()[0]
        assert (row["n_types"], row["n_tokens"]) == (3, 14)
        x = np.log(np.array([1.0, 2.0, 3.0]))     # ranks of a, b, c
        y = np.log(np.array([8.0, 4.0, 2.0]))
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert row["slope"] == pytest.approx(slope, abs=1e-6)
        assert row["intercept"] == pytest.approx(intercept, abs=1e-6)
        assert row["r2"] == pytest.approx(r2, abs=1e-6)

    def test_top_k_cap_and_validation(self, spark):
        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2)
        df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
        row = zipf_fit(df, "text", min_count=2, top_k=2).collect()[0]
        assert row["n_types"] == 2 and row["n_tokens"] == 12
        with pytest.raises(ValueError, match="min_count"):
            zipf_fit(df, "text", min_count=0)

    def test_partition_invariance(self, spark):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, 40)) for _ in range(50)]
        pdf = pd.DataFrame({"text": texts})
        a = zipf_fit(spark.createDataFrame(pdf).repartition(1),
                     "text").collect()[0]
        b = zipf_fit(spark.createDataFrame(pdf).repartition(8),
                     "text").collect()[0]
        assert a.asDict() == b.asDict()


class TestContainmentJoin:
    def test_planted_superset(self, spark):
        base = "the quick brown fox jumps over the lazy dog"
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [base,
                     base + " and then some extra trailing words here",
                     "completely different content with no overlap at all"],
        }))
        out = {(r["id_a"], r["id_b"]): r for r in
               containment_join(df, "text", "doc_id", n=3,
                                threshold=0.9).collect()}
        # doc 1 fully contained in doc 2; reverse direction is partial
        assert (1, 2) in out
        assert out[(1, 2)]["containment"] == pytest.approx(1.0)
        assert (2, 1) not in out       # below 0.9 threshold
        assert not any(3 in p for p in out)

    def test_both_directions_and_distinct_grams(self, spark):
        # identical docs: containment 1.0 BOTH ways; internal phrase
        # repetition must not inflate shared counts (distinct grams)
        t = "alpha beta gamma alpha beta gamma alpha beta gamma"
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2], "text": [t, t]}))
        rows = containment_join(df, "text", "doc_id", n=3,
                                threshold=0.5).collect()
        assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2), (2, 1)}
        for r in rows:
            # 9 tokens -> 7 trigram positions but only 3 DISTINCT
            assert r["size_a"] == 3 and r["shared"] == 3
            assert r["containment"] == pytest.approx(1.0)

    def test_threshold_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "text": ["a b c"]}))
        with pytest.raises(ValueError, match="threshold"):
            containment_join(df, "text", "doc_id", threshold=0.0)

    def test_matches_python_oracle(self, spark):
        rng = np.random.default_rng(3)
        vocab = [f"t{i}" for i in range(15)]
        texts = [" ".join(rng.choice(vocab, rng.integers(4, 12)))
                 for _ in range(30)]
        texts[10] = texts[4] + " padding words beyond"   # planted
        pdf = pd.DataFrame({"doc_id": range(30), "text": texts})

        def grams(t, n=3):
            tk = t.split(" ")
            if len(tk) < n:
                return {t}
            return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

        gs = {r.doc_id: grams(r.text) for r in pdf.itertuples()}
        want = {}
        for a in gs:
            for b in gs:
                if a == b:
                    continue
                c = len(gs[a] & gs[b]) / len(gs[a])
                if c >= 0.5:
                    want[(a, b)] = c
        out = {(r["id_a"], r["id_b"]): r["containment"] for r in
               containment_join(spark.createDataFrame(pdf), "text",
                                "doc_id", n=3, threshold=0.5).collect()}
        assert set(out) == set(want)
        for k, v in want.items():
            assert out[k] == pytest.approx(v, abs=1e-9)
        assert (4, 10) in out


class TestHashSplit:
    def _docs(self, spark, n=2000):
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": range(n)}))

    def test_exhaustive_disjoint_proportions(self, spark):
        out = hash_split(self._docs(spark), "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(
                      F.count(F.lit(1)).alias("n")).collect()}
        assert sum(counts.values()) == 2000
        assert set(counts) == {"train", "val", "test"}
        assert 0.74 < counts["train"] / 2000 < 0.86
        assert 0.05 < counts["val"] / 2000 < 0.15

    def test_deterministic_and_partition_invariant(self, spark):
        df = self._docs(spark, 500)
        a = dict(hash_split(df, "doc_id", {"a": 0.5, "b": 0.5})
                 .select("doc_id", "split").collect())
        b = dict(hash_split(df.repartition(7), "doc_id",
                            {"a": 0.5, "b": 0.5})
                 .select("doc_id", "split").collect())
        assert a == b

    def test_incremental_stability(self, spark):
        # adding rows never moves an existing row across splits
        small = hash_split(self._docs(spark, 300), "doc_id",
                           {"train": 0.9, "test": 0.1})
        big = hash_split(self._docs(spark, 600), "doc_id",
                         {"train": 0.9, "test": 0.1})
        sm = dict(small.select("doc_id", "split").collect())
        bg = dict(big.select("doc_id", "split").collect())
        assert all(bg[k] == v for k, v in sm.items())

    def test_seed_changes_assignment(self, spark):
        df = self._docs(spark, 400)
        a = dict(hash_split(df, "doc_id", {"x": 0.5, "y": 0.5},
                            seed="s1").select("doc_id", "split").collect())
        b = dict(hash_split(df, "doc_id", {"x": 0.5, "y": 0.5},
                            seed="s2").select("doc_id", "split").collect())
        assert any(a[k] != b[k] for k in a)

    def test_validation(self, spark):
        df = self._docs(spark, 10)
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(df, "doc_id", {"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError, match="negative"):
            hash_split(df, "doc_id", {"a": 1.5, "b": -0.5})
        with pytest.raises(ValueError, match="at least one"):
            hash_split(df, "doc_id", {})
        with pytest.raises(ValueError, match="internal"):
            hash_split(df.withColumn("split", F.lit("x")),
                       "doc_id", {"a": 1.0})


class TestSessionize:
    def test_hand_sessions(self, spark):
        from outrank_spark.operators.temporal import sessionize
        pdf = pd.DataFrame({
            "ts": pd.to_datetime([
                "2024-01-01 00:00:00", "2024-01-01 00:10:00",
                "2024-01-01 01:00:00",          # 50 min gap -> new
                "2024-01-01 00:00:00",          # user b
            ]),
            "user_id": [1, 1, 1, 2],
            "event_id": [10, 11, 12, 13],
        })
        out = sessionize(spark.createDataFrame(pdf), "ts", "user_id",
                         gap_secs=1800, tiebreak="event_id")
        got = {r["event_id"]: r["session_idx"] for r in out.collect()}
        assert got == {10: 1, 11: 1, 12: 2, 13: 1}

    def test_boundary_gap_stays_in_session(self, spark):
        from outrank_spark.operators.temporal import sessionize
        # gap of EXACTLY gap_secs stays in-session (strict > opens)
        pdf = pd.DataFrame({
            "ts": pd.to_datetime([
                "2024-01-01 00:00:00",
                "2024-01-01 00:30:00",
                "2024-01-01 01:00:00.000001",   # 1 us over -> new
            ], format="ISO8601"),
            "user_id": [1, 1, 1],
            "event_id": [1, 2, 3],
        })
        out = sessionize(spark.createDataFrame(pdf), "ts", "user_id",
                         gap_secs=1800, tiebreak="event_id")
        got = {r["event_id"]: r["session_idx"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}

    def test_random_vs_python_and_partitioning(self, spark):
        from outrank_spark.operators.temporal import sessionize
        rng = np.random.default_rng(11)
        n = 500
        base = pd.Timestamp("2024-01-01")
        pdf = pd.DataFrame({
            "user_id": rng.integers(0, 20, n),
            "ts": base + pd.to_timedelta(
                rng.integers(0, 86_400_000, n), unit="ms"),
            "event_id": np.arange(n),
        })
        gap = 600
        want = {}
        for u, g in pdf.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            idx, prev = 0, None
            for _, r in g.iterrows():
                us = r["ts"].value // 1000
                if prev is None or us - prev > gap * 1_000_000:
                    idx += 1
                prev = us
                want[r["event_id"]] = idx
        for parts in (1, 8):
            out = sessionize(
                spark.createDataFrame(pdf).repartition(parts),
                "ts", "user_id", gap_secs=gap, tiebreak="event_id")
            got = {r["event_id"]: r["session_idx"]
                   for r in out.collect()}
            assert got == want

    def test_validation(self, spark):
        from outrank_spark.operators.temporal import sessionize
        df = spark.createDataFrame(pd.DataFrame({
            "ts": [pd.NaT], "user_id": [1], "event_id": [1]}))
        with pytest.raises(ValueError, match="NULL"):
            sessionize(df, "ts", "user_id")
        ok = spark.createDataFrame(pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01"]), "user_id": [1],
            "event_id": [1]}))
        with pytest.raises(ValueError, match="positive"):
            sessionize(ok, "ts", "user_id", gap_secs=0)
        clash = ok.withColumn("session_idx", F.lit(1))
        with pytest.raises(ValueError, match="collide"):
            sessionize(clash, "ts", "user_id")


class TestRollingStats:
    def test_matches_pandas_rolling(self, spark):
        from outrank_spark.operators.temporal import rolling_stats
        rng = np.random.default_rng(3)
        pdf = pd.DataFrame({
            "g": np.repeat(["a", "b"], 50),
            "t": np.tile(np.arange(50), 2),
            "y": rng.integers(0, 100, 100).astype(float),
        })
        out = rolling_stats(spark.createDataFrame(pdf), "t", "g", "y",
                            n_buckets=5).toPandas()
        for gname, g in pdf.groupby("g"):
            g = g.sort_values("t")
            m = g["y"].rolling(5, min_periods=1).mean()
            s = g["y"].rolling(5, min_periods=1).std()
            pm = g["y"].rolling(5, min_periods=1).mean().shift(1)
            ps = g["y"].rolling(5, min_periods=1).std().shift(1)
            o = out[out["g"] == gname].sort_values("t")
            np.testing.assert_allclose(o["roll_mean"], m, atol=1e-9)
            np.testing.assert_allclose(
                o["roll_std"].to_numpy(dtype=float),
                s.to_numpy(dtype=float), atol=1e-9)
            want_z = (g["y"].to_numpy() - pm.to_numpy()) / ps.to_numpy()
            want_z[~(ps.to_numpy() > 0)] = np.nan
            np.testing.assert_allclose(
                o["z"].to_numpy(dtype=float), want_z, atol=1e-9)

    def test_null_not_zero_on_degenerate_baseline(self, spark):
        from outrank_spark.operators.temporal import rolling_stats
        # constant prior -> zero variance -> NULL z, not inf
        pdf = pd.DataFrame({
            "g": ["a"] * 5, "t": range(5),
            "y": [7.0, 7.0, 7.0, 7.0, 9.0],
        })
        out = rolling_stats(spark.createDataFrame(pdf), "t", "g", "y",
                            n_buckets=3).orderBy("t").collect()
        assert out[0]["roll_std"] is None          # single row frame
        assert all(r["z"] is None for r in out)    # const baseline

    def test_validation(self, spark):
        from outrank_spark.operators.temporal import rolling_stats
        df = spark.createDataFrame(pd.DataFrame({
            "g": ["a"], "t": [1], "y": [1.0]}))
        with pytest.raises(ValueError, match=">= 2"):
            rolling_stats(df, "t", "g", "y", n_buckets=1)
        clash = df.withColumn("z", F.lit(0.0))
        with pytest.raises(ValueError, match="collide"):
            rolling_stats(clash, "t", "g", "y")


class TestHostSuffixBlocklist:
    def _df(self, spark):
        return spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "host": [
                "ads.example.com",        # apex of a blocked subtree
                "x.ads.example.com",      # inside the blocked subtree
                "example.com",            # parent of the subtree: ALIVE
                "example.org",            # blocked apex
                "deep.sub.example.org",   # subdomain of blocked apex
                "examples.org",           # NOT a dot-suffix match
                None,                     # unparseable URL: never blocked
            ],
        }))

    def _block(self, spark):
        return spark.createDataFrame(
            [("ads.example.com",), ("example.org",)], "domain string",
        )

    def test_suffix_semantics(self, spark):
        from outrank_spark.operators.derived import host_suffix_blocklist

        kept = host_suffix_blocklist(self._df(spark), self._block(spark))
        assert sorted(r.doc_id for r in kept.collect()) == [3, 6, 7]

    def test_keep_blocked_is_complement(self, spark):
        from outrank_spark.operators.derived import host_suffix_blocklist

        blocked = host_suffix_blocklist(
            self._df(spark), self._block(spark), keep_blocked=True,
        )
        # the null host is in NEITHER side of a host-keyed semi join
        assert sorted(r.doc_id for r in blocked.collect()) == [1, 2, 4, 5]

    def test_empty_blocklist_keeps_all(self, spark):
        from outrank_spark.operators.derived import host_suffix_blocklist

        empty = spark.createDataFrame([], "domain string")
        kept = host_suffix_blocklist(self._df(spark), empty)
        assert kept.count() == 7

    def test_verdict_computed_over_distinct_hosts(self, spark):
        """The explode must hang off a distinct(host) aggregate, not
        the corpus rows: the plan carries an aggregate on the host
        column upstream of the suffix Generate."""
        from outrank_spark.operators.derived import host_suffix_blocklist

        out = host_suffix_blocklist(self._df(spark), self._block(spark))
        plan = out._jdf.queryExecution().executedPlan().toString()
        gen_idx = plan.find("Generate explode")
        assert gen_idx != -1
        assert "HashAggregate" in plan[gen_idx:], \
            "suffix explode not fed by a distinct-host aggregate"
