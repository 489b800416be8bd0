"""Pluggable pairwise scoring heuristics.

Counterpart of the reference's dispatcher
(``importance_estimator.py:92-122`` ``conduct_feature_ranking``).
Every heuristic consumes two batch-local int32 code vectors (pandas
category codes — core_ranking.py:108-117) and returns a float score.

Supported here (no sklearn/scipy in this environment):
  MI                    exact plug-in mutual information from the
                        contingency table — numerically what
                        ``mutual_info_classif(discrete_features=True)``
                        computes for discrete pairs
  MI-numba              entropy-difference estimator (no correction)
  MI-numba-randomized   + cardinality-noise correction (default)
  MI-numba-3mr          scored like MI-numba-randomized; the 3MR
                        post-processing consumes the triplets
  AMI                   adjusted mutual information (expected-MI
                        correction under the permutation model,
                        Vinh et al. 2010) — exact, vectorized
  correlation-Pearson   plain Pearson r (np.corrcoef)
  max-value-coverage    share of the most frequent value pair
  Constant              0.0 (rare-value / transformer-summary tasks)

  surrogate-SGD/-SVM/-SGD-RP/-SGD-SVD
                        numpy logistic-loss surrogates (2-fold CV
                        held-out neg-log-loss, score = 1 + median) —
                        see functions/surrogate.py for the sklearn
                        re-derivation and documented divergences
"""
from __future__ import annotations

import numpy as np

from outrank_spark.functions.coverage import max_pair_coverage
from outrank_spark.functions.mi import densify, mutual_info_estimator

__all__ = ["score_pair", "exact_mi", "adjusted_mi", "HEURISTICS"]


def _contingency(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x = densify(x)
    y = densify(y)
    nx = int(x.max()) + 1 if x.size else 0
    ny = int(y.max()) + 1 if y.size else 0
    return np.bincount(
        x.astype(np.int64) * ny + y, minlength=nx * ny,
    ).reshape(nx, ny)


def exact_mi(x: np.ndarray, y: np.ndarray) -> float:
    """Plug-in MI in nats — sparse over the observed (x, y) cells, so
    high-cardinality pairs never allocate a dense nx*ny table."""
    x = densify(x)
    y = densify(y)
    n = len(x)
    if n == 0:
        return 0.0
    ny = int(y.max()) + 1
    key = x.astype(np.int64) * ny + y
    cells, cxy = np.unique(key, return_counts=True)
    cx = np.bincount(x)[(cells // ny)]
    cy = np.bincount(y)[(cells % ny)]
    pxy = cxy / n
    term = pxy * np.log(pxy * n * n / (cx * cy))
    return float(term.sum())


def _expected_mi(a: np.ndarray, b: np.ndarray, n: int) -> float:
    """Exact E[MI] under the hypergeometric permutation model, with the
    log-factorial via lgamma (no scipy needed).  lgamma instead of an
    O(n) cumsum table: the table costs 8(n+1) bytes of driver memory —
    fine for minibatches, an OOM for whole-table n (ami_table_scores
    passes corpus row counts here); lgamma is O(1) per value and at
    least as accurate as an accumulated log sum."""
    import math

    _lgamma = np.frompyfunc(math.lgamma, 1, 1)

    def logfact(k):
        if np.isscalar(k) or np.ndim(k) == 0:
            return math.lgamma(int(k) + 1)
        return _lgamma(np.asarray(k) + 1).astype(np.float64)

    lg = logfact  # array form used below

    emi = 0.0
    logn = np.log(n)
    for ai in a:
        if ai == 0:
            continue
        for bj in b:
            if bj == 0:
                continue
            lo = max(1, ai + bj - n)
            hi = min(ai, bj)
            if hi < lo:
                continue
            nij = np.arange(lo, hi + 1)
            term1 = (nij / n) * (np.log(nij) + logn - np.log(ai) - np.log(bj))
            logp = (
                logfact(ai) + logfact(bj) + logfact(n - ai) + logfact(n - bj)
                - logfact(n)
                - lg(nij) - lg(ai - nij) - lg(bj - nij)
                - lg(n - ai - bj + nij)
            )
            emi += float((term1 * np.exp(logp)).sum())
    return emi


def adjusted_mi(x: np.ndarray, y: np.ndarray) -> float:
    """AMI_max (Vinh, Epps, Bailey JMLR 2010): (MI - E[MI]) / (max(H) - E[MI]),
    with E[MI] the exact hypergeometric expectation under the
    permutation model."""
    cont = _contingency(x, y)
    n = int(cont.sum())
    if n == 0:
        return 0.0
    a = cont.sum(axis=1)
    b = cont.sum(axis=0)
    mi = exact_mi(x, y)
    pa = a[a > 0] / n
    pb = b[b > 0] / n
    ha = float(-(pa * np.log(pa)).sum())
    hb = float(-(pb * np.log(pb)).sum())
    if ha == 0.0 and hb == 0.0:
        return 1.0
    emi = _expected_mi(a, b, n)
    denom = max(ha, hb) - emi
    if denom == 0:
        return 0.0
    return float((mi - emi) / denom)


def score_pair(first: np.ndarray, second: np.ndarray, heuristic: str,
               mi_stratified_sampling_ratio: float = 1.0) -> float:
    if heuristic == "MI":
        return exact_mi(first, second)
    if heuristic in ("MI-numba", "MI-numba-3mr"):
        return float(
            mutual_info_estimator(first, second, 1.0, False),
        )
    if heuristic == "MI-numba-randomized":
        return float(
            mutual_info_estimator(
                first, second,
                np.float32(mi_stratified_sampling_ratio), True,
            ),
        )
    if heuristic == "AMI":
        return adjusted_mi(first, second)
    if heuristic == "correlation-Pearson":
        with np.errstate(invalid="ignore"):
            return float(np.corrcoef(first, second)[0, 1])
    if heuristic == "max-value-coverage":
        # densify first: keeps the hash-table arithmetic in the
        # reference's small-code regime even for pre-hashed inputs
        return max_pair_coverage(densify(first), densify(second))
    if heuristic == "Constant":
        return 0.0
    if heuristic.startswith("surrogate-"):
        # numpy re-derivation of the sklearn surrogate family
        # (importance_estimator.py:42-53) — see functions/surrogate.py
        from outrank_spark.functions.surrogate import surrogate_score

        return surrogate_score(first, second, heuristic)
    raise ValueError(f"unknown heuristic {heuristic!r}")


HEURISTICS = [
    "MI", "MI-numba", "MI-numba-randomized", "MI-numba-3mr", "AMI",
    "correlation-Pearson", "max-value-coverage", "Constant",
    "surrogate-SGD", "surrogate-SVM", "surrogate-SGD-RP",
    "surrogate-SGD-SVD",
]
