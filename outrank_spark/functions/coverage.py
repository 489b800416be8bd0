"""Max-pair-coverage heuristic (vectorized).

Re-expression of the reference's ``max_pair_coverage``
(``ranking_cov_alignment.py:10-20``): share of the most frequent
(a, b) value pair, counted through the same size-10^6 hash table —
including its collision behavior, which the reference's own tests pin
(tests/cov_heu_test.py).  The per-row loop becomes one ``bincount``.
"""
from __future__ import annotations

import numpy as np

__all__ = ["max_pair_coverage"]

MAX_SIZE = 10 ** 6


def max_pair_coverage(array1: np.ndarray, array2: np.ndarray) -> float:
    a = np.asarray(array1, dtype=np.int64)
    b = np.asarray(array2, dtype=np.int64)
    if a.size == 0:
        # ref: max over an all-zero count table / 0 length -> NaN
        return float("nan")
    ids = (a * 1471343 - b) % MAX_SIZE  # numpy % is non-negative, like the ref
    counts = np.bincount(ids)
    return float(counts.max() / a.size)
