"""roc_auc (operators/evaluation.py) vs an independent numpy
Mann–Whitney model (average-rank U statistic), plus analytic anchors:
a perfect scorer is 1.0, an anti-scorer 0.0, a constant scorer exactly
0.5 via the tie term, and the result is invariant to partitioning and
partition count (the range-offset positioning is doing its job)."""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.operators.evaluation import calibration_report, roc_auc


def _numpy_auc(labels, scores):
    """Tie-aware AUC via average ranks (scipy-free rankdata)."""
    scores = np.asarray(scores, dtype=float)
    labels = np.asarray(labels, dtype=int)
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=float)
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while (j + 1 < len(sorted_scores)
               and sorted_scores[j + 1] == sorted_scores[i]):
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0  # average 1-based
        i = j + 1
    pos = labels == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


def _spark_auc(spark, labels, scores, **kw):
    df = spark.createDataFrame(
        [(int(y), float(s)) for y, s in zip(labels, scores)],
        "label int, score double",
    )
    row = roc_auc(df, "label", "score", **kw).first()
    return row["auc"], row["n_pos"], row["n_neg"]


class TestRocAuc:
    def test_perfect_and_inverted_scorers(self, spark):
        labels = [0] * 10 + [1] * 10
        scores = list(range(20))
        auc, p, n = _spark_auc(spark, labels, scores)
        assert (auc, p, n) == (1.0, 10, 10)
        auc_inv, _, _ = _spark_auc(spark, labels, scores[::-1])
        assert auc_inv == 0.0

    def test_constant_scorer_is_half_by_tie_term(self, spark):
        labels = [0, 1] * 15
        auc, _, _ = _spark_auc(spark, labels, [7.0] * 30)
        assert auc == 0.5

    def test_matches_numpy_rank_model_with_ties(self, spark):
        rng = np.random.default_rng(42)
        n = 3000
        labels = (rng.random(n) < 0.3).astype(int)
        # signal + heavy ties from 1-dp rounding
        scores = np.round(labels * 0.8 + rng.normal(0, 1, n), 1)
        auc, p, nn = _spark_auc(spark, labels, scores)
        expect = _numpy_auc(labels, scores)
        assert auc == pytest.approx(expect, abs=1e-12)
        assert (p, nn) == (int(labels.sum()), int(n - labels.sum()))

    def test_partitioning_invariant(self, spark):
        rng = np.random.default_rng(7)
        labels = (rng.random(500) < 0.5).astype(int)
        scores = np.round(rng.normal(0, 1, 500), 1)
        base = None
        for parts in (1, 3, 17):
            df = spark.createDataFrame(
                [(int(y), float(s)) for y, s in zip(labels, scores)],
                "label int, score double",
            ).repartition(5)  # arbitrary input layout
            auc = roc_auc(df, "label", "score",
                          num_partitions=parts).first()["auc"]
            if base is None:
                base = auc
            assert auc == base
        assert base == pytest.approx(_numpy_auc(labels, scores),
                                     abs=1e-12)

    def test_null_rows_excluded_and_single_class_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 2.0), (0, 1.0), (None, 9.0), (1, None)],
            "label int, score double",
        )
        row = roc_auc(df, "label", "score").first()
        assert (row["auc"], row["n_pos"], row["n_neg"]) == (1.0, 1, 1)
        only_pos = spark.createDataFrame(
            [(1, 2.0), (1, 1.0)], "label int, score double")
        with pytest.raises(Exception, match="both classes"):
            roc_auc(only_pos, "label", "score")


class TestCalibrationReport:
    def test_matches_numpy_binning_and_brier(self, spark):
        rng = np.random.default_rng(5)
        n = 2000
        probs = rng.random(n)
        labels = (rng.random(n) < probs).astype(int)  # calibrated
        df = spark.createDataFrame(
            [(int(y), float(p)) for y, p in zip(labels, probs)],
            "label int, p double",
        )
        rows = calibration_report(df, "label", "p").collect()
        bins = np.minimum(np.floor(probs * 10).astype(int), 9)
        assert sum(r["n"] for r in rows) == n
        total_sq = 0.0
        for r in rows:
            m = bins == r["bin"]
            assert r["n"] == int(m.sum())
            assert r["mean_prob"] == pytest.approx(probs[m].mean(),
                                                   abs=1e-12)
            assert r["frac_pos"] == pytest.approx(labels[m].mean(),
                                                  abs=1e-12)
            assert r["sq_err"] == pytest.approx(
                ((probs[m] - labels[m]) ** 2).sum(), abs=1e-9)
            total_sq += r["sq_err"]
        # Brier of a calibrated uniform scorer -> E[p(1-p)] = 1/6
        assert total_sq / n == pytest.approx(1 / 6, abs=0.02)

    def test_exact_one_goes_to_top_bin_and_bounds_raise(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0), (0, 0.0), (1, 0.999)], "label int, p double")
        rows = {r["bin"]: r for r in
                calibration_report(df, "label", "p").collect()}
        assert rows[9]["n"] == 2 and rows[0]["n"] == 1
        bad = spark.createDataFrame([(1, 1.5)], "label int, p double")
        with pytest.raises(Exception, match="outside"):
            calibration_report(bad, "label", "p").collect()


class TestCorrelationMatrix:
    def test_matches_numpy_corrcoef(self, spark):
        from outrank_spark.operators.evaluation import correlation_matrix
        rng = np.random.default_rng(7)
        x = rng.normal(size=200)
        y = 0.6 * x + rng.normal(size=200)
        z = rng.normal(size=200)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
            "x double, y double, z double")
        got = {(r["col_a"], r["col_b"]): (r["corr"], r["n"]) for r in
               correlation_matrix(df, ["x", "y", "z"],
                                  round_to=None).collect()}
        c = np.corrcoef(np.vstack([x, y, z]))
        assert got[("x", "y")][0] == pytest.approx(c[0, 1], abs=1e-9)
        assert got[("x", "z")][0] == pytest.approx(c[0, 2], abs=1e-9)
        assert got[("y", "z")][0] == pytest.approx(c[1, 2], abs=1e-9)
        assert all(n == 200 for _, n in got.values())

    def test_constant_column_yields_null(self, spark):
        from outrank_spark.operators.evaluation import correlation_matrix
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "a double, k double")
        row = correlation_matrix(df, ["a", "k"]).collect()[0]
        assert row["corr"] is None and row["n"] == 3

    def test_pairwise_null_deletion(self, spark):
        from outrank_spark.operators.evaluation import correlation_matrix
        df = spark.createDataFrame(
            [(1.0, 2.0), (2.0, None), (3.0, 6.0), (4.0, 8.0)],
            "a double, b double")
        row = correlation_matrix(df, ["a", "b"]).collect()[0]
        assert row["n"] == 3
        assert row["corr"] == pytest.approx(1.0, abs=1e-9)

    def test_single_scan_single_aggregate(self, spark):
        """All pairs from one scan: exactly one aggregate over the
        input, no join, no union of per-pair jobs."""
        from outrank_spark.operators.evaluation import correlation_matrix
        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0)], "a double, b double, c double")
        plan = correlation_matrix(df, ["a", "b", "c"])._jdf \
            .queryExecution().optimizedPlan().toString()
        assert "Join" not in plan and "Union" not in plan

    def test_needs_two_columns(self, spark):
        from outrank_spark.operators.evaluation import correlation_matrix
        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError, match=">= 2"):
            correlation_matrix(df, ["a"])


class TestSpearmanCorrelation:
    def _numpy_spearman(self, x, y):
        def avg_ranks(v):
            order = np.argsort(v, kind="stable")
            ranks = np.empty(len(v), dtype=float)
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                    j += 1
                ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            return ranks
        ra, rb = avg_ranks(np.asarray(x)), avg_ranks(np.asarray(y))
        return float(np.corrcoef(ra, rb)[0, 1])

    def test_matches_numpy_with_ties(self, spark):
        from outrank_spark.operators.evaluation import spearman_correlation
        rng = np.random.default_rng(23)
        x = rng.integers(0, 20, size=300).astype(float)   # heavy ties
        y = x * 2 + rng.normal(0, 5, size=300)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double")
        row = spearman_correlation(df, "x", "y", round_to=None).collect()[0]
        assert row["corr"] == pytest.approx(
            self._numpy_spearman(x, y), abs=1e-9)
        assert row["n"] == 300
        assert (row["col_a"], row["col_b"]) == ("x", "y")

    def test_monotone_transform_invariance(self, spark):
        from outrank_spark.operators.evaluation import spearman_correlation
        rng = np.random.default_rng(5)
        x = rng.normal(size=100)
        df = spark.createDataFrame(
            [(float(a), float(np.exp(a))) for a in x],
            "x double, y double")
        row = spearman_correlation(df, "x", "y").collect()[0]
        assert row["corr"] == pytest.approx(1.0, abs=1e-9)

    def test_pairwise_null_deletion(self, spark):
        from outrank_spark.operators.evaluation import spearman_correlation
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, None), (3.0, 9.0), (None, 4.0),
             (5.0, 25.0)],
            "x double, y double")
        row = spearman_correlation(df, "x", "y").collect()[0]
        assert row["n"] == 3
        assert row["corr"] == pytest.approx(1.0, abs=1e-9)

    def test_no_raw_row_window(self, spark):
        """Ranks must come from the distinct-value tables: every
        Window in the plan sits above an Aggregate, never above the
        raw scan."""
        from outrank_spark.operators.evaluation import spearman_correlation
        df = spark.range(200).selectExpr(
            "cast(id % 13 as double) x", "cast(id % 7 as double) y")
        plan = spearman_correlation(df, "x", "y")._jdf \
            .queryExecution().optimizedPlan().toString()
        # exactly one window per column, each over its distinct-value
        # aggregate (a raw-row ranking would also need just one window
        # per column, but over the full relation — the giveaway is the
        # aggregate feeding it, asserted structurally: every Window's
        # direct child in the printed tree is an Aggregate)
        assert plan.count("Window") == 2
        for frag in plan.split("Window")[1:]:
            first_op = next(
                ln for ln in frag.splitlines()[1:] if "- " in ln)
            assert "Aggregate" in first_op


class TestCupedAdjust:
    def _units(self, spark, n=400, seed=9):
        rng = np.random.default_rng(seed)
        x = rng.normal(50, 10, size=n)
        y = 2.0 * x + rng.normal(0, 5, size=n)
        arm = (np.arange(n) % 2).astype(int)
        rows = [(int(a), float(xx), float(yy))
                for a, xx, yy in zip(arm, x, y)]
        return (spark.createDataFrame(rows, "arm int, x double, y double"),
                x, y)

    def test_theta_matches_numpy_and_variance_drops(self, spark):
        from outrank_spark.operators.evaluation import cuped_adjust
        df, x, y = self._units(spark)
        rows = cuped_adjust(df, "y", "x", arm_col="arm",
                            round_to=None).collect()
        theta = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
        for r in rows:
            assert r["theta"] == pytest.approx(theta, rel=1e-9)
            # y = 2x + e: the covariate removes almost all variance
            assert r["var_reduction"] > 0.9
        # global invariant: adjustment never moves the OVERALL mean
        g = cuped_adjust(df, "y", "x", round_to=None).collect()[0]
        assert g["adjusted_mean"] == pytest.approx(
            g["raw_mean"], rel=1e-9)

    def test_perfect_covariate_kills_variance(self, spark):
        from outrank_spark.operators.evaluation import cuped_adjust
        rows = [(i % 2, float(i), 3.0 + 2.0 * i) for i in range(100)]
        df = spark.createDataFrame(rows, "arm int, x double, y double")
        r = cuped_adjust(df, "y", "x", round_to=None).collect()[0]
        assert r["var_adjusted"] == pytest.approx(0.0, abs=1e-9)
        assert r["var_reduction"] == pytest.approx(1.0, abs=1e-9)

    def test_constant_covariate_is_noop(self, spark):
        from outrank_spark.operators.evaluation import cuped_adjust
        rows = [(0, 5.0, float(i)) for i in range(50)]
        df = spark.createDataFrame(rows, "arm int, x double, y double")
        r = cuped_adjust(df, "y", "x", round_to=None).collect()[0]
        assert r["theta"] == 0.0
        assert r["adjusted_mean"] == pytest.approx(
            r["raw_mean"], rel=1e-12)

    def test_null_units_dropped(self, spark):
        from outrank_spark.operators.evaluation import cuped_adjust
        df = spark.createDataFrame(
            [(0, 1.0, 2.0), (0, None, 9.0), (0, 3.0, None),
             (0, 2.0, 4.0)],
            "arm int, x double, y double")
        r = cuped_adjust(df, "y", "x", round_to=None).collect()[0]
        assert r["n"] == 2

    def test_empty_raises(self, spark):
        from outrank_spark.operators.evaluation import cuped_adjust
        df = spark.createDataFrame([], "arm int, x double, y double")
        with pytest.raises(ValueError, match="no rows"):
            cuped_adjust(df, "y", "x")


class TestSrmCheck:
    def test_hand_chi2_and_zero_count_arm(self, spark):
        from outrank_spark.operators.evaluation import srm_check

        df = spark.createDataFrame(
            [("c",)] * 60 + [("t",)] * 40, "arm string")
        got = {r["arm"]: r for r in
               srm_check(df, "arm", {"c": 1, "t": 1, "x": 2}).collect()}
        # shares: c 0.25, t 0.25, x 0.5 over n=100
        assert got["c"]["n_obs"] == 60
        assert got["c"]["exp_frac"] == 0.25
        assert got["c"]["chi2_term"] == pytest.approx(
            (60 - 25) ** 2 / 25, abs=5e-7)
        assert got["x"]["n_obs"] == 0            # designed arm, no units
        assert got["x"]["chi2_term"] == pytest.approx(50.0)

    def test_unexpected_arm_surfaces_with_null_terms(self, spark):
        from outrank_spark.operators.evaluation import srm_check

        df = spark.createDataFrame(
            [("c",), ("c",), ("ghost",)], "arm string")
        got = {r["arm"]: r for r in
               srm_check(df, "arm", {"c": 1}).collect()}
        assert set(got) == {"c", "ghost"}
        assert got["ghost"]["exp_frac"] is None
        assert got["ghost"]["chi2_term"] is None
        assert got["ghost"]["n_obs"] == 1

    def test_balanced_split_near_zero_chi2(self, spark):
        from outrank_spark.operators.evaluation import srm_check

        df = spark.createDataFrame(
            [("a",)] * 500 + [("b",)] * 500, "arm string")
        rows = srm_check(df, "arm", {"a": 1, "b": 1}).collect()
        assert sum(r["chi2_term"] for r in rows) == 0.0

    def test_null_arms_excluded_and_errors(self, spark):
        from outrank_spark.operators.evaluation import srm_check

        df = spark.createDataFrame(
            [("a",), (None,), ("a",)], "arm string")
        got = srm_check(df, "arm", {"a": 1}).collect()
        assert got[0]["n_obs"] == 2 and got[0]["obs_frac"] == 1.0
        with pytest.raises(ValueError, match="non-empty"):
            srm_check(df, "arm", {})
        with pytest.raises(ValueError, match="unknown column"):
            srm_check(df, "zzz", {"a": 1})
        with pytest.raises(ValueError, match="sum to"):
            srm_check(df, "arm", {"a": 0})


class TestBhFdr:
    def test_matches_textbook_bh(self, spark):
        from outrank_spark.operators.evaluation import bh_fdr

        # classic example: m=6 p-values, q=0.05
        ps = [0.005, 0.009, 0.02, 0.04, 0.3, 0.9]
        df = spark.createDataFrame(
            [(f"t{i}", p) for i, p in enumerate(ps)],
            "id string, p double")
        got = {r["id"]: r for r in
               bh_fdr(df, "p", "id", fdr_q=0.05).collect()}
        # p_adj_i = min_{j>=i}(p_j * 6 / j)
        import numpy as np

        raw = [p * 6 / (i + 1) for i, p in enumerate(ps)]
        adj = np.minimum.accumulate(raw[::-1])[::-1]
        adj = np.minimum(adj, 1.0)
        for i in range(6):
            assert got[f"t{i}"]["p_adj"] == pytest.approx(
                adj[i], abs=5e-7)
            assert got[f"t{i}"]["rank"] == i + 1
            assert got[f"t{i}"]["rejected"] == (adj[i] <= 0.05)
        # step-up: largest i with p_i <= i*q/m is i=3 (0.02 <= 0.025);
        # i=4 fails (0.04 > 0.0333), so exactly the first three reject
        assert [got[f"t{i}"]["rejected"] for i in range(6)] == \
            [True, True, True, False, False, False]

    def test_monotone_adjusted_and_tie_determinism(self, spark):
        from outrank_spark.operators.evaluation import bh_fdr

        df = spark.createDataFrame(
            [("b", 0.01), ("a", 0.01), ("c", 0.5)],
            "id string, p double")
        rows = bh_fdr(df, "p", "id").collect()
        assert [r["id"] for r in rows] == ["a", "b", "c"]  # tie by id
        adj = [r["p_adj"] for r in rows]
        assert adj == sorted(adj)                # step-up monotone

    def test_null_pvalues_excluded_from_m(self, spark):
        from outrank_spark.operators.evaluation import bh_fdr

        df = spark.createDataFrame(
            [("a", 0.02), ("b", None), ("c", 0.04)],
            "id string, p double")
        rows = bh_fdr(df, "p", "id").collect()
        assert len(rows) == 2
        assert rows[0]["p_adj"] == pytest.approx(0.04)  # 0.02*2/1
        # m=2, not 3: a null test must not inflate the correction

    def test_errors(self, spark):
        from outrank_spark.operators.evaluation import bh_fdr

        df = spark.createDataFrame([("a", 0.1)], "id string, p double")
        with pytest.raises(ValueError, match="unknown column"):
            bh_fdr(df, "zzz", "id")
        with pytest.raises(ValueError, match="fdr_q"):
            bh_fdr(df, "p", "id", fdr_q=1.5)


class TestRetrievalMetrics:
    def test_hand_computed_ndcg_mrr_recall(self, spark):
        import math

        from outrank_spark.operators.evaluation import retrieval_metrics

        # query A: run order (by score desc) rel = [0, 1, 0, 1];
        # 3 relevant total (one below the shortlist? no — all 4 rows
        # ARE the run; n_rel counts within the run)
        rows = [
            ("A", "d1", 0.9, 0), ("A", "d2", 0.8, 1),
            ("A", "d3", 0.7, 0), ("A", "d4", 0.6, 1),
            ("B", "d1", 0.9, 0), ("B", "d2", 0.8, 0),
        ]
        df = spark.createDataFrame(
            rows, "q string, d string, s double, rel int")
        got = {r["query"]: r for r in
               retrieval_metrics(df, "q", "d", "s", "rel",
                                 k=3).collect()}
        a = got["A"]
        dcg = 1 / math.log2(3) + 0  # rel at ranks 2 (and 4 > k)
        idcg = 1 / math.log2(2) + 1 / math.log2(3)
        assert a["ndcg_k"] == pytest.approx(dcg / idcg, abs=5e-7)
        assert a["mrr_k"] == pytest.approx(0.5)      # first rel at 2
        assert a["recall_k"] == pytest.approx(0.5)   # 1 of 2 in top-3
        assert (a["n_docs"], a["n_rel"]) == (4, 2)
        b = got["B"]                                  # no relevant
        assert b["ndcg_k"] is None and b["recall_k"] is None
        assert b["mrr_k"] == 0.0

    def test_perfect_ranking_is_one(self, spark):
        from outrank_spark.operators.evaluation import retrieval_metrics

        rows = [("q", f"d{i}", 1.0 - i / 10, 1 if i < 3 else 0)
                for i in range(8)]
        df = spark.createDataFrame(
            rows, "q string, d string, s double, rel int")
        r = retrieval_metrics(df, "q", "d", "s", "rel", k=5).collect()[0]
        assert r["ndcg_k"] == 1.0
        assert r["mrr_k"] == 1.0
        assert r["recall_k"] == 1.0

    def test_graded_relevance_and_tie_determinism(self, spark):
        import math

        from outrank_spark.operators.evaluation import retrieval_metrics

        # equal scores everywhere -> rank by doc asc; graded rel 2
        # uses gain 2^2 - 1 = 3
        rows = [("q", "a", 0.5, 0), ("q", "b", 0.5, 2), ("q", "c", 0.5, 1)]
        df = spark.createDataFrame(
            rows, "q string, d string, s double, rel int")
        r = retrieval_metrics(df, "q", "d", "s", "rel", k=3).collect()[0]
        dcg = 3 / math.log2(3) + 1 / math.log2(4)     # b at 2, c at 3
        idcg = 3 / math.log2(2) + 1 / math.log2(3)
        assert r["ndcg_k"] == pytest.approx(dcg / idcg, abs=5e-7)
        assert r["mrr_k"] == pytest.approx(0.5)

    def test_null_scores_dropped_and_errors(self, spark):
        from outrank_spark.operators.evaluation import retrieval_metrics

        df = spark.createDataFrame(
            [("q", "a", None, 1), ("q", "b", 0.5, 1)],
            "q string, d string, s double, rel int")
        r = retrieval_metrics(df, "q", "d", "s", "rel", k=1).collect()[0]
        assert r["n_docs"] == 1 and r["recall_k"] == 1.0
        with pytest.raises(ValueError, match="unknown column"):
            retrieval_metrics(df, "q", "d", "zzz", "rel")
        with pytest.raises(ValueError, match="k must"):
            retrieval_metrics(df, "q", "d", "s", "rel", k=0)


class TestIsotonicCalibrate:
    @staticmethod
    def _numpy_pav(rates, weights):
        import numpy as np

        r = np.asarray(rates, dtype=float).copy()
        w = np.asarray(weights, dtype=float).copy()
        blocks = [[r[i], w[i], i] for i in range(len(r))]
        out = []
        for blk in blocks:
            out.append(blk)
            while len(out) > 1 and out[-1][0] < out[-2][0]:
                r2, w2, _ = out.pop()
                r1, w1, j = out.pop()
                out.append([(r1 * w1 + r2 * w2) / (w1 + w2),
                            w1 + w2, j])
        vals = np.empty(len(r))
        for k, (rate, _, j) in enumerate(out):
            end = out[k + 1][2] if k + 1 < len(out) else len(r)
            vals[j:end] = rate
        return vals

    def test_matches_numpy_pav_and_monotone(self, spark):
        import numpy as np

        from outrank_spark.operators.evaluation import isotonic_calibrate

        rng = np.random.default_rng(3)
        n = 5000
        probs = rng.random(n)
        # miscalibrated non-monotone-ish truth
        truth = np.clip(0.2 + 0.5 * np.sin(3 * probs) ** 2, 0, 1)
        labels = (rng.random(n) < truth).astype(int)
        df = spark.createDataFrame(
            [(int(y), float(p)) for y, p in zip(labels, probs)],
            "label int, p double")
        got = isotonic_calibrate(df, "label", "p", n_bins=25).collect()
        cal = [r["calibrated"] for r in got]
        assert cal == sorted(cal)                 # monotone
        rates = [r["frac_pos"] for r in got]
        weights = [r["n"] for r in got]
        want = self._numpy_pav(rates, weights)
        # 6-dp rounding on both frac_pos inputs and outputs
        for g, w in zip(cal, want):
            assert g == pytest.approx(w, abs=2e-6)
        # PAV preserves the global weighted mean
        tot = sum(weights)
        assert sum(c * w for c, w in zip(cal, weights)) / tot == \
            pytest.approx(labels.mean(), abs=2e-6)

    def test_textbook_pooling(self, spark):
        from outrank_spark.operators.evaluation import isotonic_calibrate

        # bins engineered so bin1 rate (1.0) > bin2 rate (0.0):
        # PAV pools them to 0.5 (equal weights)
        rows = ([(1, 0.05)] * 0 + [(0, 0.05)] * 2      # bin 0: rate 0
                + [(1, 0.35)] * 2                       # bin 1: rate 1
                + [(0, 0.65)] * 2                       # bin 2: rate 0
                + [(1, 0.95)] * 2)                      # bin 3: rate 1
        df = spark.createDataFrame(rows, "label int, p double")
        got = {r["bin"]: r["calibrated"] for r in
               isotonic_calibrate(df, "label", "p", n_bins=4).collect()}
        assert got[0] == 0.0
        assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(0.5)
        assert got[3] == 1.0

    def test_errors(self, spark):
        from outrank_spark.operators.evaluation import isotonic_calibrate

        df = spark.createDataFrame([(1, 0.5)], "label int, p double")
        with pytest.raises(ValueError, match="n_bins"):
            isotonic_calibrate(df, "label", "p", n_bins=1)
        empty = spark.createDataFrame([], "label int, p double")
        with pytest.raises(ValueError, match="no non-null"):
            isotonic_calibrate(empty, "label", "p")
        bad = spark.createDataFrame([(1, 1.5)], "label int, p double")
        with pytest.raises(Exception, match="outside"):
            isotonic_calibrate(bad, "label", "p")
