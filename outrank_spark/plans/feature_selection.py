"""mRMR feature selection over the ranking job's pairwise MI table.

Greedy max-relevance-min-redundancy (Peng, Long & Ding 2005,
"Feature selection based on mutual information: criteria of
max-dependency, max-relevance, and min-redundancy" — the MID
difference form):

    pick argmax_f  MI(f, label) - mean_{s in S} MI(f, s)

The reference's ranking task stops at the sorted pairwise/singles
reports (core_ranking.py, task_summary.py); this is the natural next
step a user takes with that output, and it needs NO new distributed
work: the input is the already-aggregated triplet table (features^2
rows — hundreds, not corpus-sized), so selection is a deterministic
driver-side loop.  Scale note: the expensive part (the MI matrix) is
the ranking job itself; this module never touches corpus rows.

Determinism: ties break on the lexicographically smallest feature
name at every pick, so the selected order is a pure function of the
scored table.
"""
from __future__ import annotations

import pandas as pd

__all__ = ["mrmr_select"]


def mrmr_select(pairwise: pd.DataFrame, label: str, k: int,
                feature_a: str = "FeatureA", feature_b: str = "FeatureB",
                score: str = "Score") -> pd.DataFrame:
    """Select up to ``k`` features from a symmetric pairwise score
    table (the ranking job's ``RankingResult.pairwise``).

    Rows pairing a feature with ``label`` supply relevance; rows
    pairing two features supply redundancy.  A feature-feature pair
    absent from the table contributes 0 redundancy (documented: the
    ranking job emits the full triangle, so this only matters for
    hand-built inputs).  Self-pairs are ignored.

    Returns a DataFrame ``(rank, feature, relevance, redundancy,
    mrmr_score)`` in selection order: ``redundancy`` is the mean MI
    against the features already selected at pick time (0 for the
    first pick) and ``mrmr_score = relevance - redundancy``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    mi: dict = {}
    relevance: dict = {}
    for fa, fb, s in zip(pairwise[feature_a], pairwise[feature_b],
                         pairwise[score]):
        fa, fb, s = str(fa), str(fb), float(s)
        if fa == fb:
            continue
        if fa == label or fb == label:
            f = fb if fa == label else fa
            relevance[f] = s
        else:
            mi[(fa, fb)] = s
            mi[(fb, fa)] = s

    candidates = sorted(relevance)
    if not candidates:
        raise ValueError(f"no rows pair a feature with label {label!r}")

    selected: list = []
    rows = []
    while candidates and len(selected) < k:
        best, best_key = None, None
        for f in candidates:
            red = (sum(mi.get((f, s), 0.0) for s in selected)
                   / len(selected)) if selected else 0.0
            key = (relevance[f] - red, f)
            # max score; ties -> lexicographically SMALLEST name wins
            if best_key is None or key[0] > best_key[0] or (
                    key[0] == best_key[0] and f < best):
                best, best_key = f, key
        red = (sum(mi.get((best, s), 0.0) for s in selected)
               / len(selected)) if selected else 0.0
        rows.append({
            "rank": len(selected) + 1, "feature": best,
            "relevance": relevance[best], "redundancy": red,
            "mrmr_score": relevance[best] - red,
        })
        selected.append(best)
        candidates.remove(best)
    return pd.DataFrame(rows,
                        columns=["rank", "feature", "relevance",
                                 "redundancy", "mrmr_score"])
