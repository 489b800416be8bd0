"""Instance (per-row) quality scoring tests — port of the
task_instance_ranking semantics (score_line, entropy) plus the
histogram relation."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.instance_ranking import (
    instance_histograms,
    score_instances,
    shannon_entropy,
)


class TestEntropy:
    def test_uniform_two_chars(self):
        assert shannon_entropy("ab") == pytest.approx(1.0)

    def test_constant(self):
        assert shannon_entropy("aaaa") == pytest.approx(0.0)

    def test_empty(self):
        assert shannon_entropy("") == 0.0

    def test_matches_reference_formula(self):
        # reference task_instance_ranking.py:22-25
        from collections import Counter

        s = "hello world"
        counts = Counter(s)
        want = -sum(
            (i / len(s)) * np.log2(i / len(s)) for i in counts.values()
        )
        assert shannon_entropy(s) == pytest.approx(want)


class TestVectorizedEntropy:
    def test_matches_per_row_kernel(self):
        import pandas as pd

        from outrank_spark.operators.instance_ranking import (
            _column_entropy,
            shannon_entropy,
        )

        col = pd.Series(["hello world", "", "aaaa", "{}",
                         "ünïcødé žžž", "0", "x" * 500])
        vec = _column_entropy(col)
        ref = col.map(shannon_entropy).to_numpy()
        assert np.allclose(vec, ref, atol=1e-12)


class TestScoreInstances:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        pdf = pd.DataFrame({
            "label": ["x", "y"],
            "f1": ["", "abc"],
            "f2": ["{}", "0"],
            "f3": ["q" * 40, "zz"],
        })
        df = spark.createDataFrame(pdf)
        return {
            r["label"]: r
            for r in score_instances(df, "label",
                                     columns=["f1", "f2", "f3"]).collect()
        }

    def test_missing_props(self, scored):
        # row x: f1 empty, f2 '{}' -> 1/3 each, all_empty 2/3
        assert scored["x"]["empty_string_prop"] == pytest.approx(1 / 3)
        assert scored["x"]["empty_dict"] == pytest.approx(1 / 3)
        assert scored["x"]["all_empty"] == pytest.approx(2 / 3)
        assert scored["y"]["all_zero"] == pytest.approx(1 / 3)

    def test_length_thresholds(self, scored):
        assert scored["x"]["all_more_30_chars"] == pytest.approx(1 / 3)
        assert scored["y"]["all_more_30_chars"] == 0.0

    def test_row_entropy_sums_fields(self, scored):
        want = (shannon_entropy("") + shannon_entropy("{}")
                + shannon_entropy("q" * 40))
        assert scored["x"]["row_entropy"] == pytest.approx(want)


class TestHistograms:
    def test_density_sums_to_one(self, spark):
        rng = np.random.default_rng(2)
        pdf = pd.DataFrame({
            "label": rng.choice(["a", "b"], 200),
            "f1": [f"v{i % 17}" for i in range(200)],
            "f2": rng.choice(["", "xx", "0"], 200),
        })
        df = spark.createDataFrame(pdf)
        hist = instance_histograms(df, "label", columns=["f1", "f2"],
                                   bins=10)
        sums = (
            hist.groupBy("label", "metric")
            .agg(F.round(F.sum("density"), 6).alias("s"))
            .collect()
        )
        assert all(r["s"] == pytest.approx(1.0) for r in sums)

    def test_bucket_range(self, spark):
        pdf = pd.DataFrame({
            "label": ["a"] * 50,
            "f1": [str(i) for i in range(50)],
        })
        df = spark.createDataFrame(pdf)
        hist = instance_histograms(df, "label", columns=["f1"], bins=10)
        rows = hist.collect()
        assert all(0 <= r["bucket"] < 10 for r in rows)
