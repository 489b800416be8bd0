"""Transformer vault tests — ports of tests/fw_transformers_test.py,
tests/json_transformers_test.py, ranking_module_test.py transformer
goldens, plus numpy<->Spark backend equivalence.
"""
from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from outrank_spark.functions.expr_vault import ExprError, parse_expr
from outrank_spark.functions.vault import (
    DEFAULT_TRANSFORMERS,
    FW_TRANSFORMERS,
    MINIMAL_TRANSFORMERS,
    resolve_preset,
)
from outrank_spark.operators.transformers import (
    BatchTransformer,
    enrich_with_transformations,
)


class TestVault:
    # ref ranking_module_test.py:74-77
    def test_default_count(self):
        assert len(DEFAULT_TRANSFORMERS) == 10

    def test_minimal_count(self):
        assert len(MINIMAL_TRANSFORMERS) == 4

    # ref fw_transformers_test.py:41-42
    def test_fw_count(self):
        assert len(FW_TRANSFORMERS) == 138

    # ref fw_transformers_test.py:15-39 pinned outputs
    def test_fw_log_probs(self):
        fn = parse_expr(
            FW_TRANSFORMERS["_tr_fw_prob_log_res_1_gt_0.01"],
        ).to_numpy()
        out = fn(np.asarray([0.68294952, 0.7, 0.91263375]))
        assert list(out) == [-0.0, -0.0, -0.0]

    def test_fw_sqrt_int_gt_1(self):
        fn = parse_expr(FW_TRANSFORMERS["_tr_fw_sqrt_res_1_gt_1"]).to_numpy()
        assert list(fn(np.asarray([1.0, 2.0, 5.0]))) == [0.0, 1.0, 2.0]

    def test_fw_sqrt_probs(self):
        fn = parse_expr(
            FW_TRANSFORMERS["_tr_fw_prob_sqrt_res_1_gt_0.01"],
        ).to_numpy()
        assert list(fn(np.asarray([0.68294952, 0.72944264, 0.91263375]))) == [
            1.0, 1.0, 1.0,
        ]

    def test_json_preset(self, tmp_path):
        path = tmp_path / "custom.json"
        path.write_text(json.dumps({
            "_tr_sqrt": "np.sqrt(X)", "_tr_log": "np.log(X + 1)",
            "_tr_square": "np.square(X)",
            "_tr_sigmoid": "1 / (1 + np.exp(-X))",
        }))
        coll = resolve_preset(str(path))
        assert len(coll) == 4 and coll["_tr_sqrt"] == "np.sqrt(X)"

    def test_json_preset_invalid_value(self, tmp_path):
        path = tmp_path / "bad.json"
        path.write_text(json.dumps({"_tr_x": 42}))
        with pytest.raises(ValueError):
            resolve_preset(str(path))

    def test_missing_json_raises(self):
        with pytest.raises(FileNotFoundError):
            resolve_preset("/nonexistent/vault.json")

    def test_unknown_preset_raises(self):
        with pytest.raises(NotImplementedError):
            resolve_preset("not-a-preset")

    def test_mixed_preset_and_json(self, tmp_path):
        path = tmp_path / "extra.json"
        path.write_text(json.dumps({"_tr_custom": "np.square(X)"}))
        coll = resolve_preset(f"minimal,{path}")
        assert len(coll) == 5

    def test_whole_vault_parses(self):
        for name, src in {**FW_TRANSFORMERS, **DEFAULT_TRANSFORMERS}.items():
            parse_expr(src)  # must not raise


class TestExprSafety:
    def test_rejects_dunder(self):
        with pytest.raises(ExprError):
            parse_expr("__import__('os').system('true')")

    def test_rejects_unknown_name(self):
        with pytest.raises(ExprError):
            parse_expr("open('/etc/passwd')")

    def test_rejects_nonwhitelisted_np(self):
        with pytest.raises(ExprError):
            parse_expr("np.load(X)")

    def test_rejects_attribute_chain(self):
        with pytest.raises(ExprError):
            parse_expr("np.random.random(10)")

    def test_order_dependent_flagged(self):
        assert parse_expr("np.cumsum(X)").order_dependent
        assert parse_expr("X[::-1]").order_dependent


class TestBatchTransformer:
    # ref json_transformers_test.py:53-77
    def test_sqrt_pinned(self):
        pdf = pd.DataFrame({
            "feature1": [1.0, 4.0, 9.0, 16.0],
            "feature2": [0.0, 1.0, 2.0, 3.0],
        })
        tr = BatchTransformer({"feature1", "feature2"}, preset="minimal")
        out = tr.construct_new_features(pdf)
        assert out["feature1_tr_sqrt"].tolist() == ["1.0", "2.0", "3.0", "4.0"]

    # ref ranking_module_test.py:62-70: 5 uniform cols x default vault
    # -> exactly 45 kept features
    def test_default_gate_count(self):
        np.random.seed(123)
        pdf = pd.DataFrame(np.random.rand(100, 5))
        pdf.columns = [str(c) for c in pdf.columns]
        tr = BatchTransformer(set(pdf.columns), preset="default")
        out = tr.construct_new_features(pdf)
        assert out.shape[1] - pdf.shape[1] == 45

    def test_degenerate_filtered(self):
        pdf = pd.DataFrame({"x": [0.0] * 50})
        tr = BatchTransformer({"x"}, preset="minimal")
        out = tr.construct_new_features(pdf)
        assert out.shape[1] == 1  # constant input -> all gated out

    def test_empty_string_coercion(self):
        pdf = pd.DataFrame({"x": ["", "4.0", '"9.0"', "16.0"]})
        tr = BatchTransformer({"x"}, preset="minimal")
        out = tr.construct_new_features(pdf)
        assert out["x_tr_sqrt"].tolist() == ["0.0", "2.0", "3.0", "4.0"]


class TestSparkBackendEquivalence:
    @pytest.mark.parametrize("name,src", sorted(DEFAULT_TRANSFORMERS.items()))
    def test_default_vault_matches_numpy(self, spark, name, src):
        rng = np.random.default_rng(5)
        X = np.round(rng.uniform(0.1, 50, 200), 4)
        p = parse_expr(src)
        np_out = p.to_numpy()(X)

        pdf = pd.DataFrame({"x": X})
        sdf = spark.createDataFrame(pdf)
        stats = {}
        for kind, key in p.stat_slots:
            from pyspark.sql import functions as F

            agg = {"max": F.max, "min": F.min, "mean": F.avg,
                   "std": F.stddev_pop, "var": F.var_pop}[kind](F.col("x"))
            stats[key] = sdf.agg(agg).first()[0]
        from pyspark.sql import functions as F

        spark_out = np.array(
            sdf.select(p.to_spark(F.col("x"), stats).alias("y"))
            .toPandas()["y"],
            dtype=np.float64,
        )
        assert np.allclose(np_out, spark_out, rtol=1e-9, atol=1e-12, equal_nan=True)

    def test_division_null_propagates_as_null(self, spark):
        """ADVICE r3: a SQL-null denominator must yield null, not
        +-inf — `den != 0` is null (not false) on null inputs, so the
        sign branches would otherwise catch them."""
        from pyspark.sql import functions as F

        p = parse_expr("1 / np.cos(X)")
        sdf = spark.createDataFrame(
            [(1.0,), (None,), (0.0,)], "x double")
        out = sdf.select(
            F.col("x"), p.to_spark(F.col("x"), {}).alias("y"),
        ).collect()
        by_x = {r["x"]: r["y"] for r in out}
        assert by_x[None] is None
        assert abs(by_x[0.0] - 1.0) < 1e-12          # 1/cos(0)
        assert abs(by_x[1.0] - 1.0 / np.cos(1.0)) < 1e-12

    def test_enrich_with_gates(self, spark):
        rng = np.random.default_rng(7)
        pdf = pd.DataFrame({
            "a": rng.uniform(1, 100, 500),
            "b": np.zeros(500),  # degenerate: every transform gated out
        })
        sdf = spark.createDataFrame(pdf)
        out, kept = enrich_with_transformations(
            sdf, ["a", "b"], preset="minimal",
        )
        assert all(k.startswith("a") for k in kept)
        assert len(kept) == 4
        assert out.count() == 500

    def test_enrich_stays_jvm_side(self, spark):
        pdf = pd.DataFrame({"a": np.arange(1.0, 101.0)})
        sdf = spark.createDataFrame(pdf)
        out, kept = enrich_with_transformations(
            sdf, ["a"], preset="default", gate=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestVerboseVault:
    """`verbose` namespace parity (reference default_transformers.py:54,
    exported via feature_transformer_vault/__init__.py:16)."""

    def test_count_parity(self):
        from outrank_spark.functions.vault import VERBOSE_TRANSFORMERS

        assert len(VERBOSE_TRANSFORMERS) == 232
        assert len(resolve_preset("verbose")) == 232
        # superset sanity: every default transformer appears verbatim
        for k, v in DEFAULT_TRANSFORMERS.items():
            assert VERBOSE_TRANSFORMERS[k] == v

    def test_whole_namespace_parses_and_evaluates(self):
        from outrank_spark.functions.vault import VERBOSE_TRANSFORMERS

        X = np.array([0.0, 1.0, -2.5, 3.7, 10.0, -0.1, 42.0, 0.5])
        for name, src in VERBOSE_TRANSFORMERS.items():
            p = parse_expr(src)  # would raise ExprError on a bad expr
            out = p.to_numpy()(X)
            assert out.shape == X.shape, name

    def test_batch_transformer_accepts_verbose(self):
        bt = BatchTransformer(["f1"], preset="verbose")
        pdf = pd.DataFrame({"f1": np.arange(1.0, 41.0).astype(str)})
        out = bt.construct_new_features(pdf)
        assert "f1_tr_sqrt" in out.columns
        assert "f1_tr_relu" in out.columns          # verbose-only
        assert "f1_tr_fill_zero_with_mean" in out.columns
        expected = np.sqrt(np.arange(1.0, 41.0)).astype(str)
        assert (out["f1_tr_sqrt"].to_numpy() == expected).all()

    def test_enrich_spark_verbose_nested_stats(self, spark):
        """Stat calls over inner expressions (np.median(np.square(X)))
        must aggregate the translated inner expression, not raw X."""
        from pyspark.sql import functions as F

        X = np.arange(1.0, 101.0)
        sdf = spark.createDataFrame(pd.DataFrame({"a": X}))
        out, kept = enrich_with_transformations(
            sdf, ["a"], preset="verbose", gate=False,
        )
        got = out.select("`a_tr_round_squared(div(x,median))`").toPandas()
        exp = np.round(np.square(X) / np.median(np.square(X)), 0)
        assert np.allclose(
            got.iloc[:, 0].to_numpy(dtype=float), exp)
        # nan-variant stat: fill-with-nanmean on a NaN-free column is
        # identity off the filled positions
        got2 = out.select("a", "a_tr_fill_zero_with_mean").toPandas()
        assert np.allclose(got2["a_tr_fill_zero_with_mean"], got2["a"])

    def test_enrich_verbose_stays_jvm_side(self, spark):
        pdf = pd.DataFrame({"a": np.arange(1.0, 101.0)})
        sdf = spark.createDataFrame(pdf)
        out, kept = enrich_with_transformations(
            sdf, ["a"], preset="verbose", gate=False,
        )
        assert len(kept) > 150  # most of the namespace survives
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
