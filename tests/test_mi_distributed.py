"""Distributed exact-MI contingency operator (operators/mi_distributed.py).

Parity target: functions/heuristics.exact_mi (the plug-in estimator the
reference's ``MI`` heuristic computes via sklearn, reference
importance_estimator.py:37-40) — here over the WHOLE table instead of a
sampled minibatch, all pairs in one scan via GROUPING SETS.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from outrank_spark.functions.heuristics import exact_mi
from outrank_spark.operators.mi_distributed import (
    _NULL_SENTINEL,
    mi_contingency,
)


def _codes(s: pd.Series) -> np.ndarray:
    return s.astype("category").cat.codes.to_numpy()


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(7)
    n = 8000
    x = rng.integers(0, 12, n)
    y = (x // 3 + rng.integers(0, 2, n)) % 5
    z = rng.integers(0, 4, n)
    pdf = pd.DataFrame(
        {"x": x.astype(str), "y": y.astype(str), "z": z.astype(str)},
    )
    pdf.loc[rng.integers(0, n, 40), "z"] = None  # genuine nulls
    return pdf


class TestMiContingency:
    def test_matches_exact_mi_kernel(self, spark, frame):
        df = spark.createDataFrame(frame)
        out = (
            mi_contingency(df, [("x", "y"), ("x", "z"), ("y", "z")])
            .toPandas().set_index(["feature_a", "feature_b"])
        )
        for a, b in [("x", "y"), ("x", "z"), ("y", "z")]:
            ref = exact_mi(
                _codes(frame[a].fillna(_NULL_SENTINEL)),
                _codes(frame[b].fillna(_NULL_SENTINEL)),
            )
            assert out.loc[(a, b), "mi"] == pytest.approx(ref, abs=1e-9)
            assert out.loc[(a, b), "n"] == len(frame)

    def test_diagonal_pair_is_entropy(self, spark, frame):
        df = spark.createDataFrame(frame)
        out = mi_contingency(df, [("x", "x")]).toPandas().iloc[0]
        p = frame["x"].value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log(p)).sum())
        assert out["mi"] == pytest.approx(h, abs=1e-9)
        assert out["h_ab"] == pytest.approx(h, abs=1e-9)
        assert out["nmi"] == pytest.approx(1.0, abs=1e-9)

    def test_entropy_identities(self, spark, frame):
        """MI = H(a) + H(b) - H(ab) must hold cell-exactly."""
        df = spark.createDataFrame(frame)
        out = mi_contingency(df, [("x", "y")]).toPandas().iloc[0]
        assert out["mi"] == pytest.approx(
            out["h_a"] + out["h_b"] - out["h_ab"], abs=1e-9,
        )

    def test_independent_columns_near_zero(self, spark, frame):
        df = spark.createDataFrame(frame)
        out = mi_contingency(df, [("x", "z")]).toPandas().iloc[0]
        assert 0.0 <= out["mi"] < 0.01
        assert abs(out["nmi"]) < 0.01

    def test_single_scan_for_all_pairs(self, spark, frame, tmp_path):
        """k pairs must share ONE scan (grouping sets), not k passes."""
        path = str(tmp_path / "mi_src.parquet")
        spark.createDataFrame(frame).write.parquet(path)
        df = spark.read.parquet(path)
        plan = mi_contingency(
            df, [("x", "y"), ("x", "z"), ("y", "z")],
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1
        assert "Expand" in plan  # the grouping-sets operator
        # no Python anywhere in the plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_duplicate_column_sets_rejected(self, spark, frame):
        df = spark.createDataFrame(frame)
        with pytest.raises(ValueError):
            mi_contingency(df, [("x", "y"), ("y", "x")])


class TestMiTableScores:
    def test_chunking_is_transparent(self, spark, frame):
        from outrank_spark.operators.mi_distributed import mi_table_scores

        df = spark.createDataFrame(frame)
        pairs = [("x", "y"), ("x", "z"), ("y", "z")]
        one = {
            (r["feature_a"], r["feature_b"]): r["score"]
            for r in mi_table_scores(df, pairs, chunk=64).collect()
        }
        many = {
            (r["feature_a"], r["feature_b"]): r["score"]
            for r in mi_table_scores(df, pairs, chunk=1).collect()
        }
        assert one == many and len(one) == 3

    def test_reversed_duplicates_scored_once(self, spark, frame):
        from outrank_spark.operators.mi_distributed import mi_table_scores

        df = spark.createDataFrame(frame)
        out = mi_table_scores(df, [("x", "y"), ("y", "x")]).collect()
        assert len(out) == 1


class TestMiTableExactHeuristic:
    def test_run_ranking_whole_table_exact(self, spark, frame):
        """heuristic='MI-table-exact' ranks with whole-table exact MI:
        pairwise scores equal the numpy exact_mi kernel on the full
        columns (no sampling, no batching)."""
        from outrank_spark.plans.ranking_job import RankingConfig, run_ranking

        df = spark.createDataFrame(
            frame.rename(columns={"y": "label"}),
        )
        cfg = RankingConfig(
            heuristic="MI-table-exact", subsampling=1,
            label_column="label", target_ranking_only=True,
            include_cardinality_in_feature_names=False,
        )
        res = run_ranking(spark, df, cfg)
        got = {
            (r["FeatureA"], r["FeatureB"]): r["Score"]
            for _, r in res.pairwise.iterrows()
        }
        for feat in ("x", "z"):
            ref = exact_mi(
                _codes(frame[feat].fillna(_NULL_SENTINEL)),
                _codes(frame["y"].fillna(_NULL_SENTINEL)),
            )
            assert got[(feat, "label")] == pytest.approx(ref, abs=1e-9)
            assert got[("label", feat)] == pytest.approx(ref, abs=1e-9)
        # informative feature x beats noise z in the singles
        singles = res.singles.set_index("Feature")
        assert (singles.loc["x"].iloc[0] > singles.loc["z"].iloc[0])


class TestAmiTableScores:
    def test_matches_numpy_adjusted_mi(self, spark, frame):
        from outrank_spark.functions.heuristics import adjusted_mi
        from outrank_spark.operators.mi_distributed import ami_table_scores

        df = spark.createDataFrame(frame)
        out = {
            (r["feature_a"], r["feature_b"]): r["ami"]
            for r in ami_table_scores(df, [("x", "y"), ("x", "z")]).collect()
        }
        for a, b in [("x", "y"), ("x", "z")]:
            ref = adjusted_mi(
                _codes(frame[a].fillna(_NULL_SENTINEL)),
                _codes(frame[b].fillna(_NULL_SENTINEL)),
            )
            assert out[(a, b)] == pytest.approx(ref, abs=1e-9)

    def test_cardinality_guard(self, spark):
        import pandas as pd

        from outrank_spark.operators.mi_distributed import ami_table_scores

        df = spark.createDataFrame(pd.DataFrame({
            "hi": [str(i) for i in range(500)],
            "lo": ["a", "b"] * 250,
        }))
        with pytest.raises(ValueError, match="max_cardinality"):
            ami_table_scores(df, [("hi", "lo")], max_cardinality=100)


class TestChi2Association:
    def _run(self, spark, rows):
        from outrank_spark.operators.mi_distributed import chi2_association

        df = spark.createDataFrame(rows, "a string, b string")
        return chi2_association(df, "a", "b").first()

    @staticmethod
    def _numpy_chi2(rows):
        import numpy as np

        av = sorted({a for a, _ in rows})
        bv = sorted({b for _, b in rows})
        o = np.zeros((len(av), len(bv)))
        for a, b in rows:
            o[av.index(a), bv.index(b)] += 1
        n = o.sum()
        e = np.outer(o.sum(1), o.sum(0)) / n
        chi2 = ((o - e) ** 2 / e).sum()
        v = float(np.sqrt(chi2 / (n * (min(len(av), len(bv)) - 1))))
        return chi2, (len(av) - 1) * (len(bv) - 1), v, int(n)

    def test_matches_numpy_including_zero_cells(self, spark):
        import numpy as np

        rng = np.random.default_rng(17)
        rows = [(f"a{int(rng.integers(0, 4))}", f"b{int(rng.integers(0, 3))}")
                for _ in range(300)]
        rows += [("a9", "b0")] * 5        # a level with zero cells
        got = self._run(spark, rows)
        chi2, dof, v, n = self._numpy_chi2(rows)
        assert got["chi2"] == pytest.approx(chi2, abs=1e-9)
        assert got["dof"] == dof and got["n"] == n
        assert got["cramers_v"] == pytest.approx(v, abs=1e-12)

    def test_exact_independence_is_zero(self, spark):
        # product-form counts: o[i,j] = ri*cj => chi2 == 0 exactly
        rows = []
        for i, ri in enumerate([1, 2, 3]):
            for j, cj in enumerate([2, 4]):
                rows += [(f"a{i}", f"b{j}")] * (ri * cj)
        got = self._run(spark, rows)
        assert got["chi2"] == pytest.approx(0.0, abs=1e-9)
        assert got["cramers_v"] == pytest.approx(0.0, abs=1e-9)

    def test_perfect_association_v_is_one(self, spark):
        rows = [("x", "p")] * 10 + [("y", "q")] * 20 + [("z", "r")] * 5
        got = self._run(spark, rows)
        assert got["cramers_v"] == pytest.approx(1.0, abs=1e-12)
