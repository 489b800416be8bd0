"""3MR (relevance - redundancy + relation) greedy feature ranking.

Driver-side port of the reference's post-processing
(importance_estimator.py:134-172 ``rank_features_3MR`` and the
triplet-to-dict preparation in task_ranking.py:167-239).  Operates on
the small collected triplet relation (<= 10^4 features by the
MAX_FEATURES_3MR cap), so it stays on the driver by design.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["rank_features_3mr", "three_mr_from_triplets"]


def rank_features_3mr(
    relevance_dict: dict[str, float],
    redundancy_dict: dict[tuple, float],
    relational_dict: dict[tuple, float],
    strategy: str = "median",
    alpha: float = 1.0,
    beta: float = 1.0,
) -> pd.DataFrame:
    """Greedy 3MR: seed with the most relevant feature, then repeatedly
    add argmax of relevance - alpha*median(redundancy vs ranked)
    + beta*median(relation vs ranked)."""
    all_features = set(relevance_dict)
    ranked = [max(relevance_dict.items(), key=lambda kv: kv[1])[0]]

    def higher_order(feature: str, table: dict[tuple, float]) -> float:
        values = [table.get((feat, feature), 0) for feat in ranked]
        if strategy == "median":
            return float(np.median(values))
        if strategy == "mean":
            return float(np.mean(values))
        return float(sum(values))

    while len(ranked) < len(all_features):
        top_importance = -np.inf
        best = None
        for feat in all_features - set(ranked):
            importance = (
                relevance_dict[feat]
                - alpha * higher_order(feat, redundancy_dict)
                + beta * higher_order(feat, relational_dict)
            )
            if importance > top_importance:
                top_importance = importance
                best = feat
        ranked.append(best)

    return pd.DataFrame(
        {"Feature": ranked, "3MR_Ranking": range(1, len(ranked) + 1)},
    )


def _minmax(s: pd.Series) -> pd.Series:
    lo, hi = s.min(), s.max()
    if hi == lo:
        # constant scores: the reference's (s-lo)/(hi-lo) yields NaN and
        # silently poisons the greedy argmax — normalize to 0 instead
        return pd.Series(np.zeros(len(s)), index=s.index)
    return (s - lo) / (hi - lo)


def three_mr_from_triplets(
    triplets: pd.DataFrame, label_column: str,
    strategy: str = "median", alpha: float = 1.0, beta: float = 1.0,
) -> pd.DataFrame:
    """task_ranking.py:167-239: split the (FeatureA, FeatureB, Score)
    relation into relevance / relation / redundancy tables, min-max
    normalize each, run the greedy ranking."""
    rel_df = triplets[triplets.FeatureB == label_column].copy()
    relevance_df = rel_df[~rel_df.FeatureA.str.contains(" AND_REL ")][
        ["FeatureA", "Score"]
    ]
    relevance_df = relevance_df[relevance_df.FeatureA != label_column]

    relations_df = rel_df[rel_df.FeatureA.str.contains(" AND_REL ")][
        ["FeatureA", "Score"]
    ].copy()
    relations_df["FeatureB"] = relations_df.FeatureA.map(
        lambda x: x.split(" AND_REL ")[1],
    )
    relations_df["FeatureA"] = relations_df.FeatureA.map(
        lambda x: x.split(" AND_REL ")[0],
    )

    red_df = triplets[
        (triplets.FeatureB != label_column)
        & (triplets.FeatureA != label_column)
    ].copy()
    red_df = red_df[
        ~red_df.FeatureA.str.contains(" AND_REL ")
        & ~red_df.FeatureB.str.contains(" AND_REL ")
    ]

    relevance_df = relevance_df.assign(score=_minmax(relevance_df.Score))
    relations_df = relations_df.assign(score=_minmax(relations_df.Score))
    red_df = red_df.assign(score=_minmax(red_df.Score))

    relevance_dict = dict(zip(relevance_df.FeatureA, relevance_df.score))
    relational_dict = {}
    for _, row in relations_df.iterrows():
        relational_dict[(row.FeatureA, row.FeatureB)] = row.score
        relational_dict[(row.FeatureB, row.FeatureA)] = row.score
    redundancy_dict = {
        (row.FeatureA, row.FeatureB): row.score
        for _, row in red_df.iterrows()
    }
    return rank_features_3mr(
        relevance_dict, redundancy_dict, relational_dict,
        strategy=strategy, alpha=alpha, beta=beta,
    )
