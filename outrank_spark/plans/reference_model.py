"""Reference-model JSON support (prior-informed ranking).

Port of the reference's model-spec parsing
(``extract_features_from_reference_JSON``, core_utils.py:403-424) and
the prior-conditioning matrix assembly used by ``numba_mi``
(importance_estimator.py:55-71): when a reference model is supplied,
the candidate feature vector is the |max - sum| row-reduction of the
[model features || candidate] matrix — so the score measures what the
candidate adds *given* the model's features.

The reference only activates this for surrogate heuristics
(``is_prior_heuristic``, core_utils.py:656-659), which need sklearn;
here the same conditioning matrix is exposed for the MI heuristics as
well (the |max - sum| reduce is heuristic-agnostic), and the
combination planner's model-feature filtering
(core_ranking.py:205-215) is reproduced in :func:`filter_pairs`.
"""
from __future__ import annotations

import json

import numpy as np

__all__ = ["extract_features_from_reference_json", "filter_pairs",
           "conditioned_vector"]


def extract_features_from_reference_json(
    json_path: str, combined_features_only: bool = False,
    all_features: bool = False,
) -> set[str]:
    with open(json_path) as jp:
        content = json.load(jp)
    feature_space = content["desc"].get("features", [])
    if all_features:
        return set(feature_space)
    fields_space = content["desc"].get("fields", [])
    joint_space = feature_space + fields_space
    if combined_features_only:
        return {f for f in feature_space if len(f.split(",")) > 1}
    out: set[str] = set()
    for feature_tuple in joint_space:
        for individual in feature_tuple.split(","):
            out.add(individual)
    return out


def model_feature_names(json_path: str) -> list[str]:
    """Model features normalized to the engine's interaction naming
    (comma tuples -> sorted ' AND ' join, core_ranking.py:207-209)."""
    return [
        " AND ".join(sorted(item.split(",")))
        for item in extract_features_from_reference_json(
            json_path, all_features=True,
        )
    ]


def filter_pairs(pairs, model_features) -> list[tuple[str, str]]:
    """Drop pairs touching features the model already has
    (core_ranking.py:210-215)."""
    mf = set(model_features)
    return [p for p in pairs if p[0] not in mf and p[1] not in mf]


def conditioned_vector(model_matrix: np.ndarray,
                       candidate: np.ndarray) -> np.ndarray:
    """|max - sum| per-row reduction of [model || candidate]
    (importance_estimator.py:60-64): collapses the joint code matrix
    to one int vector whose distribution reflects the candidate's
    contribution on top of the model features."""
    X = np.column_stack([model_matrix, candidate])
    return np.abs(X.max(axis=1) - X.sum(axis=1)).astype(np.int64)
