"""Visualization task — data-first port of the reference's plots.

Reference: ``task_visualization.py:13-26`` reads ``pairwise_ranks.tsv``
and calls ``visualizations/ranking_visualization.py:21-270`` which
renders (a) a complete-linkage dendrogram + silhouette-swept flat
clustering, (b) a masked score heatmap, (c) label-ranking barplots.

This sandbox has no matplotlib / seaborn / scipy / sklearn, so the
port inverts the priorities: every artifact is exported as **data**
(TSV), computed with numpy re-implementations of the scipy/sklearn
pieces, and the image rendering is import-gated — when matplotlib is
available the same data renders to images, otherwise the TSVs are the
product.  The triplets table is small driver-side data (median-scored
pairs), exactly as in the reference — nothing here is a Spark job.

Artifacts written to ``output_folder``:

====================== ==============================================
heatmap.tsv            mean-Score pivot (FeatureA x FeatureB),
                       NaN-filled with 0 (reference :123-135)
dendrogram_complete.tsv linkage matrix Z, scipy format
                       (id_a, id_b, height, size) (reference :55)
SilhouetteProfile.tsv  (Silhouette, threshold, numClusters) sweep
                       (reference :76-96)
TopClustering.tsv      (ClusterID, Feature) at the best-silhouette
                       threshold (reference :106-108)
barplot_top_{k}.tsv    label-ranking slices, k in 10/25/50/100/all
                       (reference :177-210)
====================== ==============================================

Numpy re-implementation notes (documented divergences):

- the reference passes the square matrix ``1 - pivot`` to
  ``scipy.linkage`` which treats it as an *observation matrix* and
  computes euclidean row distances first; we reproduce exactly that
  (pdist of rows of ``1 - pivot``, then complete linkage).
- ``fcluster``'s default criterion is ``inconsistent`` (depth 2); we
  implement the inconsistency coefficient with sample std (ddof=1, 0
  for single-link sets) and max-over-subtree cutting.  scipy's exact
  std convention can't be cross-checked in this sandbox; tests pin
  hand-computed values instead.
- silhouette follows sklearn's convention (singleton clusters score
  0); ties broken deterministically.
- the threshold sweep runs over the range of PIVOT VALUES, not link
  heights — a reference quirk (:74-76) preserved verbatim.
- the t-SNE cluster embedding is skipped unless sklearn is importable
  (the reference already wraps it in try/except).
"""
from __future__ import annotations

import json
import logging
import os

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

__all__ = [
    "score_pivot", "linkage_complete", "fcluster_inconsistent",
    "silhouette_score_np", "hierarchical_cluster_data", "barplot_data",
    "visualize_all",
]


def score_pivot(triplets: pd.DataFrame) -> pd.DataFrame:
    """Mean-Score pivot FeatureA x FeatureB, NaN -> 0 (reference
    ranking_visualization.py:41-50)."""
    pivot = pd.pivot_table(
        triplets, values="Score", index="FeatureA", columns="FeatureB",
        aggfunc="mean",
    )
    return pivot.fillna(0.0)


def _pdist_rows(x: np.ndarray) -> np.ndarray:
    """Dense euclidean distance matrix between rows."""
    sq = (x * x).sum(axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    np.maximum(d2, 0.0, out=d2)
    return np.sqrt(d2)


def linkage_complete(x: np.ndarray) -> np.ndarray:
    """Complete-linkage agglomerative clustering of the ROWS of x
    (euclidean), scipy-format Z: (id_a, id_b, height, size), new
    cluster ids n, n+1, ...  Deterministic tie-break: smallest pair."""
    n = x.shape[0]
    if n < 2:
        return np.zeros((0, 4))
    d = _pdist_rows(np.asarray(x, dtype=np.float64))
    np.fill_diagonal(d, np.inf)
    active = list(range(n))           # positions into d
    ids = list(range(n))              # cluster ids at those positions
    sizes = {i: 1 for i in range(n)}
    z = np.zeros((n - 1, 4))
    for step in range(n - 1):
        sub = d[np.ix_(active, active)]
        flat = np.argmin(sub)
        i_pos, j_pos = divmod(int(flat), len(active))
        if i_pos > j_pos:
            i_pos, j_pos = j_pos, i_pos
        h = sub[i_pos, j_pos]
        a, b = ids[i_pos], ids[j_pos]
        new_id = n + step
        z[step] = (min(a, b), max(a, b), h, sizes[a] + sizes[b])
        sizes[new_id] = sizes[a] + sizes[b]
        # Lance-Williams complete: d(new, k) = max(d(i,k), d(j,k))
        pi, pj = active[i_pos], active[j_pos]
        for pos, pk in enumerate(active):
            if pos in (i_pos, j_pos):
                continue
            d[pi, pk] = d[pk, pi] = max(d[pi, pk], d[pj, pk])
        # the merged cluster lives at pi; pj is retired
        active.pop(j_pos)
        ids.pop(j_pos)
        ids[i_pos] = new_id
        d[pj, :] = np.inf
        d[:, pj] = np.inf
    return z


def _inconsistency(z: np.ndarray) -> np.ndarray:
    """Depth-2 inconsistency coefficient per link (scipy's default
    fcluster criterion); sample std (ddof=1), 0 when degenerate."""
    n = z.shape[0] + 1
    coefs = np.zeros(z.shape[0])
    for i in range(z.shape[0]):
        heights = [z[i, 2]]
        for child in (int(z[i, 0]), int(z[i, 1])):
            if child >= n:
                heights.append(z[child - n, 2])
        h = np.asarray(heights)
        if len(h) > 1 and h.std(ddof=1) > 0:
            coefs[i] = (z[i, 2] - h.mean()) / h.std(ddof=1)
    return coefs


def fcluster_inconsistent(z: np.ndarray, t: float) -> np.ndarray:
    """Flat clusters: maximal subtrees whose every link has
    inconsistency <= t.  Returns 1-based labels per leaf, numbered by
    first leaf appearance (deterministic)."""
    n = z.shape[0] + 1
    if n == 1:
        return np.ones(1, dtype=int)
    coefs = _inconsistency(z)
    # max inconsistency within each subtree, bottom-up
    max_in_subtree = coefs.copy()
    for i in range(z.shape[0]):
        for child in (int(z[i, 0]), int(z[i, 1])):
            if child >= n:
                max_in_subtree[i] = max(
                    max_in_subtree[i], max_in_subtree[child - n],
                )
    labels = np.zeros(n, dtype=int)

    def leaves(node: int, out: list[int]) -> None:
        if node < n:
            out.append(node)
        else:
            leaves(int(z[node - n, 0]), out)
            leaves(int(z[node - n, 1]), out)

    def assign(node: int, cluster_of: dict[int, list[int]]) -> None:
        if node < n:
            cluster_of[node] = [node]
            return
        link = node - n
        if max_in_subtree[link] <= t:
            members: list[int] = []
            leaves(node, members)
            cluster_of[min(members)] = members
        else:
            assign(int(z[link, 0]), cluster_of)
            assign(int(z[link, 1]), cluster_of)

    cluster_of: dict[int, list[int]] = {}
    assign(2 * n - 2, cluster_of)
    leaf_root = np.empty(n, dtype=int)
    for root_leaf, members in cluster_of.items():
        for m in members:
            leaf_root[m] = root_leaf
    next_label = 1
    for leaf in range(n):          # number clusters by first appearance
        if labels[leaf] == 0:
            for m in cluster_of[leaf_root[leaf]]:
                labels[m] = next_label
            next_label += 1
    return labels


def silhouette_score_np(x: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette over samples, euclidean; singleton clusters
    score 0 (sklearn convention).  Requires 2 <= k < n."""
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    n = len(labels)
    if not (2 <= len(uniq) < n):
        raise ValueError("silhouette needs 2 <= n_clusters < n_samples")
    d = _pdist_rows(np.asarray(x, dtype=np.float64))
    np.fill_diagonal(d, 0.0)
    s = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        n_same = same.sum()
        if n_same <= 1:
            s[i] = 0.0
            continue
        a = d[i, same].sum() / (n_same - 1)
        b = min(
            d[i, labels == c].mean() for c in uniq if c != labels[i]
        )
        s[i] = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
    return float(s.mean())


def hierarchical_cluster_data(
    triplets: pd.DataFrame, max_num_clusters: int = 100,
) -> tuple[np.ndarray, pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(Z, silhouette profile, best clustering, pivot) — the data the
    reference's dendrogram / SilhouetteProfile / TopClustering plots
    render (ranking_visualization.py:21-108)."""
    unique_features = triplets["FeatureA"].unique()
    if len(unique_features) > 1000:
        raise ValueError("refusing to cluster > 1000 features")
    if triplets.shape[0] > 10 ** 5:
        raise ValueError("refusing to cluster > 1e5 triplets")
    pivot = score_pivot(triplets)
    dmat = 1.0 - pivot.values
    z = linkage_complete(dmat)

    range_min, range_max = float(pivot.values.min()), float(pivot.values.max())
    if range_max <= range_min:
        spectrum = np.array([0.0])
    else:
        # reference quirk: thresholds sweep the SCORE range (:74-76)
        spectrum = np.arange(
            range_min, range_max, (range_max - range_min) / 1000,
        )
    best_sil, best_labels, profile = -np.inf, None, []
    for t in spectrum:
        labels = fcluster_inconsistent(z, float(t))
        k = len(np.unique(labels))
        if not (2 < k < max_num_clusters):
            continue
        try:
            sil = silhouette_score_np(pivot.values, labels)
        except ValueError:
            continue
        profile.append([sil, float(t), k])
        if sil >= best_sil:     # `>=` keeps the last max, like :87
            best_sil, best_labels = sil, labels
    profile_df = pd.DataFrame(
        profile, columns=["Silhouette", "threshold", "numClusters"],
    )
    if best_labels is None:
        best_labels = np.ones(len(pivot.index), dtype=int)
    clustering_df = pd.DataFrame({
        "ClusterID": best_labels, "Feature": pivot.index,
    })
    return z, profile_df, clustering_df, pivot


def barplot_data(triplets: pd.DataFrame, label: str,
                 reference_json: str = "") -> dict[int, pd.DataFrame]:
    """Label-ranking slices (reference :177-210): keep triplets whose
    A or B CONTAINS the label (substring — names carry
    ``-(card; cov)`` suffixes), drop partners containing the label,
    median per feature, sort desc; slices 10/25/50/100/all."""
    rows = []
    for _, row in triplets.iterrows():
        if label in str(row["FeatureA"]):
            rows.append([row["FeatureB"], row["Score"]])
        elif label in str(row["FeatureB"]):
            rows.append([row["FeatureA"], row["Score"]])
    ranks = pd.DataFrame(rows, columns=["Feature", "Value"])
    if len(ranks):
        ranks = ranks[~ranks["Feature"].astype(str).str.contains(
            label, regex=False)]
    used = []
    if reference_json and os.path.exists(reference_json):
        with open(reference_json) as f:
            desc = json.load(f).get("desc", {})
        used = list(desc.get("features", [])) + list(desc.get("fields", []))
    ranks["Value"] = ranks["Value"].astype(float)
    ranks = (
        ranks.groupby("Feature", as_index=False).median()
        .sort_values(by="Value", ascending=False, kind="stable")
    )
    ranks["InReferenceModel"] = ranks["Feature"].map(
        lambda f: any(str(f) in p for p in used),
    )
    out = {}
    for k in [10, 25, 50, 100, ranks.shape[0]]:
        out[k] = ranks.iloc[:k].reset_index(drop=True)
    return out


def _try_render_images(pivot: pd.DataFrame, z: np.ndarray,
                       output_folder: str, image_format: str) -> bool:
    """Render images when matplotlib is importable; data TSVs are the
    primary artifact either way."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, ax = plt.subplots(figsize=(12, 10))
    im = ax.imshow(np.tril(pivot.values), cmap="coolwarm")
    ax.set_xticks(range(len(pivot.columns)))
    ax.set_xticklabels(pivot.columns, rotation=90, fontsize=4)
    ax.set_yticks(range(len(pivot.index)))
    ax.set_yticklabels(pivot.index, fontsize=4)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(os.path.join(output_folder, f"heatmap.{image_format}"),
                dpi=300)
    plt.close(fig)
    return True


def visualize_all(triplets: pd.DataFrame, output_folder: str,
                  label: str = "", reference_json: str = "",
                  image_format: str = "png",
                  heuristic: str = "MI") -> list[str]:
    """Write every visualization artifact; returns the paths written."""
    os.makedirs(output_folder, exist_ok=True)
    written = []

    def _w(name: str, df: pd.DataFrame) -> None:
        path = os.path.join(output_folder, name)
        df.to_csv(path, sep="\t", index=False)
        written.append(path)

    z, profile, clustering, pivot = hierarchical_cluster_data(triplets)
    _w("heatmap.tsv", pivot.reset_index())
    _w("dendrogram_complete.tsv", pd.DataFrame(
        z, columns=["id_a", "id_b", "height", "size"]))
    _w("SilhouetteProfile.tsv", profile)
    _w("TopClustering.tsv", clustering)
    slices = barplot_data(triplets, label, reference_json)
    for k, df in slices.items():
        _w(f"barplot_top_{k}.tsv", df)

    # Rendered images: dependency-free SVG always (plans/svg_render.py
    # — the masked heatmap, the clustermap, the silhouette sweep and
    # the barplots of reference ranking_visualization.py:21-270 as
    # standalone .svg), plus matplotlib raster output when importable.
    from outrank_spark.plans import svg_render

    written.append(svg_render.heatmap_svg(
        pivot, os.path.join(output_folder, "heatmap.svg")))
    written.append(svg_render.clustermap_svg(
        pivot, z, os.path.join(output_folder, "clustermap.svg")))
    written.append(svg_render.silhouette_svg(
        profile, os.path.join(output_folder, "SilhouetteProfile.svg")))
    for k, df in slices.items():
        written.append(svg_render.barplot_svg(
            df, os.path.join(output_folder, f"barplot_top_{k}.svg"),
            label=label))
    if _try_render_images(pivot, z, output_folder, image_format):
        written.append(
            os.path.join(output_folder, f"heatmap.{image_format}"),
        )
    else:
        logger.info(
            "matplotlib unavailable — TSV + SVG artifacts written, "
            "raster images skipped",
        )
    return written
