"""Dependency-free SVG renderers (plans/svg_render.py).

Every artifact must be well-formed XML; counts of marks, tooltip
titles, color monotonicity and truncation notes are pinned so the
rendered figures stay faithful to the data they draw.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

from outrank_spark.plans.svg_render import (
    AXIS,
    MAX_BARS,
    SERIES1,
    SERIES2,
    barplot_svg,
    clustermap_svg,
    div_color,
    heatmap_svg,
    leaf_order,
    seq_color,
    silhouette_svg,
)
from outrank_spark.plans.visualization import (
    hierarchical_cluster_data,
    linkage_complete,
    visualize_all,
)

NS = "{http://www.w3.org/2000/svg}"


def _parse(path):
    return ET.parse(path).getroot()


def _titled(root, tag):
    """Marks of a given tag that carry a <title> tooltip."""
    return [el for el in root.iter(f"{NS}{tag}")
            if el.find(f"{NS}title") is not None]


def _pivot4():
    vals = np.array([
        [1.0, 0.9, 0.5, 0.1],
        [0.9, 1.0, 0.45, 0.05],
        [0.5, 0.45, 1.0, 0.15],
        [0.1, 0.05, 0.15, 1.0],
    ])
    names = ["label", "f1", "f2", "f3"]
    return pd.DataFrame(vals, index=names, columns=names)


def _luma(hexcolor: str) -> float:
    return sum(int(hexcolor[i:i + 2], 16) for i in (1, 3, 5))


class TestColormaps:
    def test_sequential_monotone_dark_with_value(self):
        ts = np.linspace(0, 1, 17)
        lumas = [_luma(seq_color(t)) for t in ts]
        assert all(a > b for a, b in zip(lumas, lumas[1:]))

    def test_diverging_neutral_midpoint_and_poles(self):
        assert div_color(0.0) == "#f0efec"
        assert div_color(-1.0) == "#104281"
        assert div_color(1.0) == "#d03b3b"
        # both arms darken away from the midpoint
        assert _luma(div_color(0.5)) < _luma(div_color(0.0))
        assert _luma(div_color(-0.5)) < _luma(div_color(0.0))


class TestLeafOrder:
    def test_hand_example_matches_scipy_traversal(self):
        # z row 0 merges leaves 0,1 -> cluster 3; row 1 merges leaf 2
        # with cluster 3.  scipy plots z[i,0]'s subtree left: [2, 0, 1].
        z = np.array([[0, 1, 1.0, 2], [2, 3, 5.0, 3]])
        assert leaf_order(z, 3) == [2, 0, 1]

    def test_is_a_permutation(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(12, 3))
        z = linkage_complete(x)
        assert sorted(leaf_order(z, 12)) == list(range(12))

    def test_degenerate_sizes(self):
        assert leaf_order(np.zeros((0, 4)), 1) == [0]
        assert leaf_order(np.zeros((0, 4)), 0) == []


class TestHeatmap:
    def test_cells_tooltips_and_color_extremes(self, tmp_path):
        path = str(tmp_path / "heat.svg")
        heatmap_svg(_pivot4(), path)
        root = _parse(path)
        cells = _titled(root, "rect")
        assert len(cells) == 4 * 5 // 2  # lower triangle incl. diagonal
        by_val = {}
        for c in cells:
            title = c.find(f"{NS}title").text
            by_val[float(title.rsplit(": ", 1)[1])] = c.get("fill")
        # darkest fill on the max value, lightest on the min
        assert _luma(by_val[1.0]) == min(_luma(v) for v in by_val.values())
        assert _luma(by_val[0.05]) == max(
            _luma(v) for v in by_val.values())
        # colorbar gradient present
        assert root.find(f".//{NS}linearGradient") is not None

    def test_large_matrix_stays_bounded(self, tmp_path):
        n = 120
        rng = np.random.default_rng(5)
        vals = rng.random((n, n))
        piv = pd.DataFrame(vals, index=[f"f{i}" for i in range(n)],
                           columns=[f"f{i}" for i in range(n)])
        path = str(tmp_path / "big.svg")
        heatmap_svg(piv, path)
        root = _parse(path)
        assert len(_titled(root, "rect")) == n * (n + 1) // 2
        assert float(root.get("width")) < 1200


class TestClustermap:
    def test_empty_pivot_writes_note(self, tmp_path):
        path = str(tmp_path / "empty.svg")
        clustermap_svg(pd.DataFrame(), np.zeros((0, 4)), path)
        texts = [t.text for t in _parse(path).iter(f"{NS}text")]
        assert any("no features" in t for t in texts)

    def test_diverging_colorbar_labels_match_gradient(self, tmp_path):
        """Scores in [-0.2, 1.0]: the diverging gradient spans the
        symmetric [-1, 1] range, and the colorbar labels must say so
        (not vmin/vmax)."""
        vals = np.array([[1.0, -0.2], [-0.2, 1.0]])
        piv = pd.DataFrame(vals, index=["a", "b"], columns=["a", "b"])
        path = str(tmp_path / "div.svg")
        heatmap_svg(piv, path)
        texts = [t.text for t in _parse(path).iter(f"{NS}text")]
        assert "1" in texts and "-1" in texts
        assert "-0.2" not in texts

    def test_reorders_and_draws_n_minus_1_links(self, tmp_path):
        piv = _pivot4()
        z, _, _, pivot = hierarchical_cluster_data(
            pd.DataFrame([
                [a, b, piv.loc[a, b]]
                for a in piv.index for b in piv.columns
            ], columns=["FeatureA", "FeatureB", "Score"]))
        path = str(tmp_path / "cmap.svg")
        clustermap_svg(pivot, z, path)
        root = _parse(path)
        assert len(_titled(root, "rect")) == 16  # full reordered square
        links = [p for p in _titled(root, "path")
                 if p.find(f"{NS}title").text.startswith("merge height")]
        assert len(links) == 3
        assert all(p.get("stroke") == AXIS for p in links)


class TestSilhouette:
    def test_two_panels_two_series_hover_points(self, tmp_path):
        profile = pd.DataFrame({
            "Silhouette": [0.2, 0.5, 0.4],
            "threshold": [0.1, 0.2, 0.3],
            "numClusters": [8, 5, 3],
        })
        path = str(tmp_path / "sil.svg")
        silhouette_svg(profile, path)
        root = _parse(path)
        lines = [p for p in root.iter(f"{NS}path")
                 if p.get("fill") == "none"]
        assert {p.get("stroke") for p in lines} == {SERIES1, SERIES2}
        hover = [c for c in _titled(root, "circle")
                 if c.get("fill") == "transparent"]
        assert len(hover) == 2 * len(profile)

    def test_best_marker_keeps_last_max(self, tmp_path):
        """Tied silhouette maxima: hierarchical_cluster_data keeps the
        LAST max (`>=`), so the marked dot must use the last one."""
        profile = pd.DataFrame({
            "Silhouette": [0.5, 0.3, 0.5],
            "threshold": [0.1, 0.2, 0.3],
            "numClusters": [8, 5, 3],
        })
        path = str(tmp_path / "tie.svg")
        silhouette_svg(profile, path)
        root = _parse(path)
        best = [c.find(f"{NS}title").text
                for c in _titled(root, "circle")
                if c.get("fill") != "transparent"
                and c.find(f"{NS}title") is not None
                and "best threshold" in c.find(f"{NS}title").text]
        assert best and all("0.3000" in t for t in best)

    def test_empty_profile_writes_note(self, tmp_path):
        path = str(tmp_path / "empty.svg")
        silhouette_svg(pd.DataFrame(
            columns=["Silhouette", "threshold", "numClusters"]), path)
        texts = [t.text for t in _parse(path).iter(f"{NS}text")]
        assert any("no thresholds" in t for t in texts)


class TestBarplot:
    def _ranks(self, n, flag_every=0):
        return pd.DataFrame({
            "Feature": [f"feat{i}" for i in range(n)],
            "Value": np.linspace(1.0, 0.1, n),
            "InReferenceModel": [
                flag_every and i % flag_every == 0 for i in range(n)
            ],
        })

    def test_bars_colors_legend(self, tmp_path):
        path = str(tmp_path / "bar.svg")
        barplot_svg(self._ranks(10, flag_every=3), path, label="label")
        root = _parse(path)
        bars = [p for p in _titled(root, "path")
                if p.get("fill") in (SERIES1, SERIES2)]
        assert len(bars) == 10
        flagged = [b for b in bars if b.get("fill") == SERIES2]
        assert len(flagged) == 4  # i in {0, 3, 6, 9}
        texts = [t.text for t in root.iter(f"{NS}text")]
        assert "in reference model" in texts  # legend label

    def test_truncation_note_past_max_bars(self, tmp_path):
        path = str(tmp_path / "big.svg")
        barplot_svg(self._ranks(MAX_BARS + 40), path)
        root = _parse(path)
        bars = [p for p in _titled(root, "path")
                if p.get("fill") in (SERIES1, SERIES2)]
        assert len(bars) == MAX_BARS
        texts = [t.text for t in root.iter(f"{NS}text")]
        assert any("full data in the TSV" in t for t in texts)

    def test_negative_values_render_leftward(self, tmp_path):
        ranks = pd.DataFrame({
            "Feature": ["a", "b", "c"],
            "Value": [1.0, -0.5, 0.25],
            "InReferenceModel": [False, False, False],
        })
        path = str(tmp_path / "neg.svg")
        barplot_svg(ranks, path)
        root = _parse(path)
        bars = [p for p in _titled(root, "path")
                if p.get("fill") in (SERIES1, SERIES2)]
        assert len(bars) == 3
        # the -0.5 bar must have real width, drawn leftward ("h -")
        neg = [p for p in bars
               if p.find(f"{NS}title").text == "b: -0.5000"][0]
        first_h = float(neg.get("d").split(" h ")[1].split(" ")[0])
        assert first_h < -20  # leftward and visible

    def test_widths_proportional(self, tmp_path):
        path = str(tmp_path / "prop.svg")
        barplot_svg(self._ranks(5), path)
        root = _parse(path)
        bars = [p for p in _titled(root, "path")
                if p.get("fill") in (SERIES1, SERIES2)]
        # horizontal extent parsed from "M x y h W ..." path data
        widths = [float(p.get("d").split(" h ")[1].split(" ")[0])
                  for p in bars]
        assert all(a > b for a, b in zip(widths, widths[1:]))


class TestVisualizeAllSvg:
    def test_svg_artifacts_written(self, tmp_path):
        piv = _pivot4()
        triplets = pd.DataFrame([
            [a, b, piv.loc[a, b]]
            for a in piv.index for b in piv.columns
        ], columns=["FeatureA", "FeatureB", "Score"])
        out = str(tmp_path / "viz")
        written = visualize_all(triplets, out, label="label")
        names = {p.rsplit("/", 1)[-1] for p in written}
        assert {"heatmap.svg", "clustermap.svg",
                "SilhouetteProfile.svg"} <= names
        assert any(n.startswith("barplot_top_") and n.endswith(".svg")
                   for n in names)
        for p in written:
            if p.endswith(".svg"):
                assert _parse(p).tag == f"{NS}svg"
