"""Visualization-task data exports (plans/visualization.py).

The numpy linkage / fcluster / silhouette re-implementations are pinned
against hand-computed values (scipy/sklearn are absent in the sandbox,
so the oracles are worked examples, not library calls).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from outrank_spark.plans.visualization import (
    barplot_data,
    fcluster_inconsistent,
    hierarchical_cluster_data,
    linkage_complete,
    score_pivot,
    silhouette_score_np,
    visualize_all,
)


def _triplets():
    rows = []
    feats = ["label-(2; 100)", "f1-(5; 100)", "f2-(7; 90)", "f3-(9; 80)"]
    scores = {
        ("label-(2; 100)", "f1-(5; 100)"): 0.9,
        ("label-(2; 100)", "f2-(7; 90)"): 0.5,
        ("label-(2; 100)", "f3-(9; 80)"): 0.1,
        ("f1-(5; 100)", "f2-(7; 90)"): 0.45,
        ("f1-(5; 100)", "f3-(9; 80)"): 0.05,
        ("f2-(7; 90)", "f3-(9; 80)"): 0.15,
    }
    for (a, b), s in scores.items():
        rows.append([a, b, s])
        rows.append([b, a, s])
    for f in feats:
        rows.append([f, f, 1.0])
    return pd.DataFrame(rows, columns=["FeatureA", "FeatureB", "Score"])


class TestLinkage:
    def test_complete_linkage_hand_example(self):
        # 1-D points 0, 1, 5: merge (0,1) at d=1 then cluster at
        # complete d = max(5, 4) = 5
        x = np.array([[0.0], [1.0], [5.0]])
        z = linkage_complete(x)
        assert z.shape == (2, 4)
        assert (z[0, 0], z[0, 1], z[0, 2], z[0, 3]) == (0, 1, 1.0, 2)
        assert (z[1, 0], z[1, 1], z[1, 2], z[1, 3]) == (2, 3, 5.0, 3)

    def test_linkage_heights_monotone_enough(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(20, 4))
        z = linkage_complete(x)
        # complete linkage is monotone: heights non-decreasing
        assert (np.diff(z[:, 2]) >= -1e-12).all()
        assert z[-1, 3] == 20

    def test_fcluster_splits_obvious_groups(self):
        x = np.vstack([
            np.zeros((3, 2)) + [[0, 0], [0, 0.1], [0.1, 0]],
            np.zeros((3, 2)) + [[10, 10], [10, 10.1], [10.1, 10]],
        ])
        z = linkage_complete(x)
        labels = fcluster_inconsistent(z, 0.9)
        assert len(np.unique(labels)) == 2
        assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
        # huge threshold -> everything one cluster
        assert len(np.unique(fcluster_inconsistent(z, 100.0))) == 1


class TestSilhouette:
    def test_hand_computed_two_clusters(self):
        # points 0, 1 in cluster 1; 10 in cluster 2... need k < n, use 4
        x = np.array([[0.0], [1.0], [10.0], [11.0]])
        labels = np.array([1, 1, 2, 2])
        # s(0): a=1, b=(10+11)/2=10.5 -> 9.5/10.5; symmetric for all
        expect = np.mean([
            (10.5 - 1) / 10.5, (9.5 - 1) / 9.5,
            (9.5 - 1) / 9.5, (10.5 - 1) / 10.5,
        ])
        got = silhouette_score_np(x, labels)
        assert got == pytest.approx(expect, abs=1e-12)

    def test_singleton_cluster_scores_zero(self):
        x = np.array([[0.0], [1.0], [10.0]])
        got = silhouette_score_np(x, np.array([1, 1, 2]))
        # s(0): a=1, b=10 -> 0.9 ; s(1): a=1, b=9 -> 8/9 ; s(2)=0
        expect = np.mean([(10 - 1) / 10, (9 - 1) / 9, 0.0])
        assert got == pytest.approx(expect, abs=1e-12)

    def test_rejects_degenerate_k(self):
        x = np.zeros((3, 1))
        with pytest.raises(ValueError):
            silhouette_score_np(x, np.array([1, 1, 1]))


class TestArtifacts:
    def test_score_pivot_shape_and_fill(self):
        pivot = score_pivot(_triplets())
        assert pivot.shape == (4, 4)
        assert pivot.loc["label-(2; 100)", "f1-(5; 100)"] == 0.9
        assert not pivot.isna().any().any()

    def test_barplot_label_substring_semantics(self):
        slices = barplot_data(_triplets(), "label")
        full = slices[3]
        # label partners only, label itself excluded, sorted desc
        assert list(full["Feature"]) == [
            "f1-(5; 100)", "f2-(7; 90)", "f3-(9; 80)",
        ]
        assert list(full["Value"]) == [0.9, 0.5, 0.1]
        assert 10 in slices and list(slices[10]["Feature"]) == list(
            full["Feature"])

    def test_visualize_all_writes_tsvs(self, tmp_path):
        out = str(tmp_path / "viz")
        written = visualize_all(_triplets(), out, label="label")
        names = {p.split("/")[-1] for p in written}
        assert {"heatmap.tsv", "dendrogram_complete.tsv",
                "SilhouetteProfile.tsv", "TopClustering.tsv"} <= names
        assert any(n.startswith("barplot_top_") for n in names)
        top = pd.read_csv(f"{out}/TopClustering.tsv", sep="\t")
        assert list(top.columns) == ["ClusterID", "Feature"]
        assert len(top) == 4

    def test_guard_rails(self):
        big = pd.DataFrame({
            "FeatureA": [f"f{i}" for i in range(1001)],
            "FeatureB": ["x"] * 1001,
            "Score": [0.0] * 1001,
        })
        with pytest.raises(ValueError):
            hierarchical_cluster_data(big)
