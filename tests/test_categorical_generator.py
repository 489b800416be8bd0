"""CategoricalClassification parity tests — mirrors the behavioral
assertions of reference tests/cc_generator_test.py (shape, cardinality,
representation, density, correlation sign+magnitude, duplicates,
bitwise ops, label distribution, noise/drift invariants), plus the
distributed generate_cc_dataframe companion.
"""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.sources.categorical_generator import (
    CategoricalClassification,
    generate_cc_dataframe,
)


@pytest.fixture()
def cc():
    return CategoricalClassification()


class TestGenerateData:
    def test_init_dataset_info(self, cc):
        assert cc.dataset_info == {
            'general': {}, 'combinations': [], 'correlations': [],
            'duplicates': [], 'labels': {}, 'noise': [],
        }

    def test_shape_and_type(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        assert isinstance(X, np.ndarray)
        assert X.shape == (100, 5)
        assert X.dtype == np.int32

    def test_cardinality(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100, cardinality=3)
        assert len(np.unique(X)) <= 3

    def test_ensure_rep(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100,
                             cardinality=50, ensure_rep=True)
        assert len(np.unique(X)) == 50

    def test_structure_pins_columns(self, cc):
        X = cc.generate_data(
            n_features=4, n_samples=200,
            structure=[(1, [7, 8, 9]), (3, 2)],
        )
        assert set(np.unique(X[:, 1])) <= {7, 8, 9}
        assert len(np.unique(X[:, 3])) <= 2
        assert X.shape == (200, 4)

    def test_feature_shape(self, cc):
        f = cc._generate_feature(100, cardinality=5)
        assert f.shape == (100,)
        assert len(np.unique(f)) <= 5

    def test_feature_ensure_rep(self, cc):
        f = cc._generate_feature(100, cardinality=50, ensure_rep=True)
        assert len(np.unique(f)) == 50

    def test_feature_values(self, cc):
        values = [5, 6, 7, 8, 9, 10]
        f = cc._generate_feature(100, vec=values, ensure_rep=True)
        assert np.array_equal(np.unique(f), values)

    def test_feature_density(self, cc):
        p = [0.2, 0.4, 0.4]
        f = cc._generate_feature(10000, vec=[0, 1, 2],
                                 ensure_rep=True, p=p)
        _, counts = np.unique(f, return_counts=True)
        assert np.array_equal(np.round(counts / 10000, 1), p)


class TestCombinations:
    def test_linear_shape(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        X2 = cc.generate_combinations(X, [0, 1], combination_type='linear')
        assert X2.shape == (100, 6)
        assert np.array_equal(X2[:, 5], X[:, 0] + X[:, 1])

    def test_bitwise_ops(self, cc):
        a = np.array([1, 0, 1])
        b = np.array([0, 1, 1])
        arr = np.array([a, b])
        assert np.array_equal(cc._xor(arr), [0, 0])
        assert np.array_equal(cc._and(arr), [0, 0])
        assert np.array_equal(cc._or(arr), [1, 1])

    def test_custom_function_records_name(self, cc):
        X = cc.generate_data(n_features=3, n_samples=50)
        X2 = cc.generate_combinations(X, [0, 1],
                                      combination_function=cc._xor)
        assert X2.shape == (50, 4)
        assert cc.dataset_info['combinations'][-1][
            'combination_type'] == '_xor'


class TestCorrelatedAndDuplicates:
    def test_correlated_shape(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        X2 = cc.generate_correlated(X, 0, r=0.8)
        assert X2.shape == (100, 6)

    def test_correlation_magnitude(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        X2 = cc.generate_correlated(X, 0, r=0.8)
        corr = np.corrcoef(X2[:, 0].astype(float), X2[:, 5])[0, 1]
        assert round(corr, 1) == pytest.approx(0.8, abs=0.1)

    def test_duplicates(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        X2 = cc.generate_duplicates(X, 0)
        assert X2.shape == (100, 6)
        assert (X2[:, 0] == X2[:, -1]).all()


class TestLabels:
    def test_shape(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        y = cc.generate_labels(X)
        assert y.shape == (100,)

    def test_distribution(self, cc):
        X = cc.generate_data(n_features=5, n_samples=100)
        y = cc.generate_labels(X, n=3, p=[0.2, 0.3, 0.5])
        _, counts = np.unique(y, return_counts=True)
        assert np.allclose(counts / 100, [0.2, 0.3, 0.5],
                           rtol=0.1, atol=0.1)

    @pytest.mark.parametrize("relation", ["linear", "nonlinear", "cluster"])
    def test_class_relations(self, cc, relation):
        X = cc.generate_data(n_features=5, n_samples=100)
        y = cc.generate_labels(X, class_relation=relation)
        assert isinstance(y, np.ndarray)
        assert y.shape == (100,)
        assert len(np.unique(y)) >= 2

    def test_invalid_p_raises(self, cc):
        X = cc.generate_data(n_features=2, n_samples=50)
        with pytest.raises(ValueError):
            cc.generate_labels(X, n=2, p=[0.9, 0.9])
        with pytest.raises(ValueError):
            cc.generate_labels(X, p=1.5)

    def test_cluster_balance(self, cc):
        X = cc.generate_data(n_features=3, n_samples=90)
        y = cc._cluster_data(X, 3, p=None, balance=True)
        _, counts = np.unique(y, return_counts=True)
        # balanced: every cluster at its 30-sample target (greedy
        # reassignment leaves at most the rounding remainder off)
        assert counts.max() - counts.min() <= 3


class TestNoise:
    @pytest.mark.parametrize("noise_type", [
        "categorical", "missing", "cardinality", "value_drift",
        "frequency_drift",
    ])
    def test_shape_preserved(self, cc, noise_type):
        X = cc.generate_data(n_features=3, n_samples=100, cardinality=10)
        y = cc.generate_labels(X)
        Xn = cc.generate_noise(X, y, p=0.3, type=noise_type,
                               missing_val=-999)
        assert Xn.shape == X.shape
        assert Xn.dtype == X.dtype

    def test_missing_inserts_values(self, cc):
        X = cc.generate_data(n_features=3, n_samples=100, cardinality=5)
        y = cc.generate_labels(X)
        Xn = cc.generate_noise(X, y, p=0.4, type='missing',
                               missing_val=-999)
        assert (Xn == -999).sum() == 3 * 40  # int(100*0.4) per feature

    def test_unknown_type_raises(self, cc):
        X = cc.generate_data(n_features=2, n_samples=20)
        with pytest.raises(ValueError):
            cc.generate_noise(X, np.zeros(20), type='bogus')

    def test_pure_noise_pipeline(self, cc):
        """Reference test_pure_noise_data_handling: stacking every
        noise family at p~0.9 keeps shape/dtype and label generation
        alive."""
        X = cc.generate_data(n_features=4, n_samples=100, cardinality=10)
        y = cc.generate_labels(X)
        Xn = np.copy(X)
        for t in ['categorical', 'missing', 'cardinality',
                  'value_drift', 'frequency_drift']:
            try:
                Xn = cc.generate_noise(
                    Xn, y, p=0.8 if t == 'missing' else 0.9, type=t,
                    missing_val=-999)
            except (ValueError, IndexError, ZeroDivisionError):
                pass
        assert Xn.shape == X.shape
        assert Xn.dtype == X.dtype
        y2 = cc.generate_labels(Xn)
        assert len(y2) == len(Xn)


class TestDownsample:
    def test_balanced(self, cc):
        X = cc.generate_data(n_features=3, n_samples=200)
        y = np.array([0] * 150 + [1] * 50)
        Xd, yd = cc.downsample_dataset(X, y)
        assert len(Xd) == 100
        _, counts = np.unique(yd, return_counts=True)
        assert (counts == 50).all()

    def test_n_too_large_raises(self, cc):
        X = cc.generate_data(n_features=2, n_samples=100)
        y = np.array([0] * 80 + [1] * 20)
        with pytest.raises(ValueError):
            cc.downsample_dataset(X, y, n=50)

    def test_reshuffle(self, cc):
        X = cc.generate_data(n_features=2, n_samples=100)
        y = np.array([0] * 50 + [1] * 50)
        _, yd = cc.downsample_dataset(X, y, reshuffle=True)
        # shuffled: labels are no longer two sorted blocks
        assert not np.array_equal(yd, np.sort(yd))


class TestDeteriorationAndDrift:
    @pytest.mark.parametrize("kind", [
        "temporal", "sample_based", "feature_based",
    ])
    def test_deterioration_shapes(self, cc, kind):
        X = cc.generate_data(n_features=4, n_samples=40, cardinality=5)
        y = cc.generate_labels(X)
        Xd = cc.generate_incremental_deterioration(
            X, y, deterioration_type=kind, deterioration_rate=0.15,
        )
        assert Xd.shape == X.shape
        assert cc.dataset_info['deterioration']['type'] == kind

    def test_custom_noise_types_recorded(self, cc):
        X = cc.generate_data(n_features=3, n_samples=30, cardinality=5)
        y = cc.generate_labels(X)
        cc.generate_incremental_deterioration(
            X, y, noise_types=['cardinality', 'value_drift'],
        )
        assert cc.dataset_info['deterioration']['noise_types'] == [
            'cardinality', 'value_drift',
        ]

    @pytest.mark.parametrize("pattern", ["increase", "decrease",
                                         "oscillate"])
    def test_cardinality_drift(self, cc, pattern):
        X = cc.generate_data(n_features=3, n_samples=50, cardinality=8)
        Xd = cc.generate_cardinality_drift(
            X, drift_pattern=pattern, drift_strength=0.3,
        )
        assert Xd.shape == X.shape
        assert cc.dataset_info['cardinality_drift']['pattern'] == pattern

    def test_drift_affected_features_recorded(self, cc):
        X = cc.generate_data(n_features=2, n_samples=40, cardinality=6)
        cc.generate_cardinality_drift(X, drift_pattern='oscillate',
                                      affected_features=[0])
        assert cc.dataset_info['cardinality_drift'][
            'affected_features'] == [0]

    def test_drift_increase_grows_cardinality(self, cc):
        X = cc.generate_data(n_features=2, n_samples=400, cardinality=4)
        Xd = cc.generate_cardinality_drift(
            X, drift_pattern='increase', drift_strength=0.8,
        )
        assert len(np.unique(Xd[:, 0])) > len(np.unique(X[:, 0]))

    def test_extreme_drift_keeps_shape(self, cc):
        X = cc.generate_data(n_features=4, n_samples=100, cardinality=10)
        Xd = cc.generate_cardinality_drift(
            X, drift_pattern='increase', drift_strength=1.0,
        )
        assert Xd.shape == X.shape


class TestDistributedGenerator:
    def test_matches_marginals_and_is_partition_invariant(self, spark):
        df2 = generate_cc_dataframe(spark, n_features=3, n_samples=2000,
                                    cardinality=5, seed=7, partitions=2)
        df8 = generate_cc_dataframe(spark, n_features=3, n_samples=2000,
                                    cardinality=5, seed=7, partitions=8)
        p2 = df2.orderBy("row_id").toPandas()
        p8 = df8.orderBy("row_id").toPandas()
        # hash-derived rows: bitwise identical at any parallelism
        assert p2.equals(p8)
        assert set(p2.columns) == {"row_id", "f0", "f1", "f2", "label"}
        for c in ("f0", "f1", "f2"):
            assert p2[c].between(0, 4).all()
        # exact label semantics: y = (decision > percentile(decision,
        # p)) — ties fall to class 0 (reference generate_labels:524),
        # so recompute in pandas and compare exactly
        dec = (2 * p2[["f0", "f1", "f2"]] + 3).sum(axis=1)
        thr = np.percentile(dec, 50)
        assert (p2["label"] == (dec > thr).astype(int)).all()

    def test_nonlinear_labels(self, spark):
        df = generate_cc_dataframe(spark, n_features=2, n_samples=500,
                                   cardinality=4, seed=1,
                                   class_relation="nonlinear",
                                   label_p=0.3)
        pdf = df.toPandas()
        dec = (2 * np.sin(pdf[["f0", "f1"]]) +
               2 * np.cos(pdf[["f0", "f1"]])).sum(axis=1)
        thr = np.percentile(dec, 30)
        assert (pdf["label"] == (dec > thr).astype(int)).all()

    def test_cluster_relation_rejected(self, spark):
        with pytest.raises(ValueError, match="cluster"):
            generate_cc_dataframe(spark, 2, 10,
                                  class_relation="cluster")
