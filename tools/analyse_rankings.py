"""Data-proportion robustness analysis: hits@k between rankings.

Port of the reference benchmark analyser (reference
benchmarks/analyse_rankings.py:20-50): given sibling output folders
``ranking_<n_rows>/feature_singles.tsv`` produced at increasing data
proportions, score each ranking's top-k overlap (hits@k, %) against
the largest-data ranking, for k in {1, 5, 10, 20}.

Data-first like plans/visualization.py: always writes/prints the
hits@k table (TSV to stdout); renders the 2x2 precision-curve figure
only when matplotlib is importable.

Usage: python tools/analyse_rankings.py <directory> [out.tsv]
"""
from __future__ import annotations

import os
import sys

__all__ = ["extract_ranking", "hits_at_k", "analyse"]

K_RANGE = [1, 5, 10, 20]


def extract_ranking(path: str) -> list[str]:
    """Feature names in rank order from a feature_singles.tsv."""
    import pandas as pd

    df = pd.read_csv(path, sep="\t")
    return df["Feature"].astype(str).tolist()


def hits_at_k(ranking: list[str], reference: list[str], k: int) -> float:
    """% of the ranking's top-k found in the reference's top-k."""
    if k <= 0:
        raise ValueError("k must be positive")
    ref_top = set(reference[:k])
    hit = sum(1 for el in ranking[:k] if el in ref_top)
    return 100.0 * hit / k


def analyse(dfolder: str) -> "pd.DataFrame":
    """hits@k for every ranking_<count> folder vs the largest count."""
    import pandas as pd

    counts = sorted(
        int(name.rsplit("_", 1)[1])
        for name in os.listdir(dfolder)
        if name.startswith("ranking_")
        and name.rsplit("_", 1)[1].isdigit()
    )
    if not counts:
        raise FileNotFoundError(f"no ranking_<count> folders in {dfolder}")
    rankings = {
        c: extract_ranking(
            os.path.join(dfolder, f"ranking_{c}", "feature_singles.tsv"),
        )
        for c in counts
    }
    reference = rankings[max(counts)]
    rows = []
    for c in counts:
        row = {"n_rows": c,
               "proportion_pct": round(100.0 * c / max(counts), 2)}
        for k in K_RANGE:
            row[f"hits@{k}"] = round(hits_at_k(rankings[c], reference, k), 2)
        rows.append(row)
    return pd.DataFrame(rows)


def _maybe_plot(table, out_png: str) -> bool:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, axs = plt.subplots(2, 2, figsize=(10, 10))
    for i, k in enumerate(K_RANGE):
        ax = axs[i // 2, i % 2]
        ax.plot(table["proportion_pct"], table[f"hits@{k}"],
                marker="o", linestyle="-", color="black")
        ax.invert_xaxis()
        ax.set(xlabel="Proportion of data used (%)",
               ylabel=f"hits@{k} (%)",
               title=f"Approximation, top {k} features")
        ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_png, dpi=200)
    return True


def main() -> int:
    if len(sys.argv) < 2:
        print("Usage: python tools/analyse_rankings.py <directory> [out.tsv]")
        return 1
    table = analyse(sys.argv[1])
    tsv = table.to_csv(sep="\t", index=False)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(tsv)
    print(tsv)
    _maybe_plot(table, os.path.join(sys.argv[1], "precision_curves.png"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
