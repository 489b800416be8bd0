"""Model-fit ("surrogate") scoring heuristics, numpy-only.

Re-expression of the reference's sklearn surrogate family
(importance_estimator.py:42-53 ``sklearn_surrogate``,
importance_estimator.py:177-194 ``initialize_classifier``):

    X = OneHotEncoder().fit_transform(vector_first)
    [optional TruncatedSVD / SparseRandomProjection]
    scores = cross_val_score(clf, X, y, scoring='neg_log_loss', cv=2)
    score  = 1 + median(scores)

sklearn is absent in this environment, so each piece is re-derived:

* one-hot is never materialized — rows of a one-hot matrix have
  exactly one active column per input feature, so every matrix
  product ``X @ M`` is an *embedding gather-sum* ``M[idx].sum(1)``
  and ``X.T @ A`` is a scatter-add (``np.add.at``).  This is also
  the right 100 TB shape: memory is O(n_rows * n_features), never
  O(n_rows * n_categories).
* ``SGDClassifier(loss='log_loss')`` becomes deterministic full-batch
  gradient descent on the identical L2-regularized logistic objective
  (alpha=1e-4, sklearn's default).  Same optimum, no SGD noise —
  documented divergence: scores match sklearn to optimization
  tolerance, not bitwise.
* ``TruncatedSVD(8)`` becomes a Halko-style randomized SVD computed
  entirely through the gather/scatter products above.
* ``SparseRandomProjection`` becomes a seeded dense Gaussian
  projection (same Johnson-Lindenstrauss role).
* ``surrogate-SVM`` (reference: SVC + Platt scaling) is served by the
  same logistic surrogate — documented divergence; the reference
  itself falls back to SGD for unrecognized surrogate names.

2-fold CV mirrors ``cross_val_score``'s StratifiedKFold: per-class
even/odd interleave (deterministic, shuffle-free); with cv=2 the
median of the two held-out neg-log-losses equals their mean.
"""
from __future__ import annotations

import numpy as np

from outrank_spark.functions.mi import densify

__all__ = ["surrogate_score", "SURROGATE_HEURISTICS"]

SURROGATE_HEURISTICS = (
    "surrogate-SGD", "surrogate-SVM", "surrogate-SGD-RP",
    "surrogate-SGD-SVD",
)

_ALPHA = 1e-4        # sklearn SGDClassifier default L2
_SVD_DIMS = 8        # reference SVD_DIMS
_RP_DIMS = 256       # JL target (reference caps at 1024; 256 keeps the
                     # numpy GD cheap with the same ranking behavior)
_GD_ITERS = 200
_SEED = 20240801


def _one_hot_indices(x: np.ndarray) -> tuple[np.ndarray, int]:
    """(n, c) one-hot column indices + total one-hot width D.

    ``x`` is 1-D codes or a 2-D (n, c) matrix of codes, one column
    per input feature (the reference-model conditioning shape)."""
    mat = x if x.ndim == 2 else x.reshape(-1, 1)
    cols, offset = [], 0
    for j in range(mat.shape[1]):
        codes = densify(np.ascontiguousarray(mat[:, j]))
        cols.append(codes.astype(np.int64) + offset)
        offset += int(codes.max()) + 1 if codes.size else 0
    return np.column_stack(cols), offset


def _gather_matmul(idx: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """X @ mat for one-hot X given as indices: (n, c) x (D, k) -> (n, k)."""
    return mat[idx].sum(axis=1)


def _scatter_matmul(idx: np.ndarray, a: np.ndarray, d: int) -> np.ndarray:
    """X.T @ a for one-hot X given as indices: -> (D, k)."""
    out = np.zeros((d, a.shape[1]), dtype=np.float64)
    for j in range(idx.shape[1]):
        np.add.at(out, idx[:, j], a)
    return out


def _randomized_svd_features(idx: np.ndarray, d: int, k: int,
                             rng: np.random.Generator) -> np.ndarray:
    """TruncatedSVD(k).fit_transform(X) via randomized range finding
    (Halko, Martinsson, Tropp 2011), all through gather/scatter."""
    p = min(d, k + 4)
    omega = rng.standard_normal((d, p))
    y = _gather_matmul(idx, omega)                      # (n, p)
    q, _ = np.linalg.qr(y)
    b = _scatter_matmul(idx, q, d).T                    # (p, D)
    _, s, vt = np.linalg.svd(b, full_matrices=False)
    keep = min(k, vt.shape[0])
    return _gather_matmul(idx, vt[:keep].T)             # X @ V_k


def _stratified_2fold(y: np.ndarray) -> np.ndarray:
    """Fold id per row: per-class even/odd interleave (deterministic)."""
    fold = np.zeros(len(y), dtype=np.int8)
    for cls in np.unique(y):
        pos = np.flatnonzero(y == cls)
        fold[pos[1::2]] = 1
    return fold


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _fit_logistic_dense(x: np.ndarray, y01: np.ndarray, k: int) -> np.ndarray:
    """Full-batch GD on multinomial logistic loss, dense features."""
    n, f = x.shape
    w = np.zeros((f + 1, k))
    scale = 1.0 / max(1.0, np.abs(x).mean() + 1e-9)
    xb = np.hstack([x, np.ones((n, 1))])
    onehot_y = np.eye(k)[y01]
    lr = 2.0 * scale
    for _ in range(_GD_ITERS):
        p = _softmax(xb @ w)
        grad = xb.T @ (p - onehot_y) / n
        grad[:-1] += _ALPHA * w[:-1]
        w -= lr * grad
    return w


def _predict_dense(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    xb = np.hstack([x, np.ones((len(x), 1))])
    return _softmax(xb @ w)


def _fit_logistic_onehot(idx: np.ndarray, d: int, y01: np.ndarray,
                         k: int) -> tuple[np.ndarray, np.ndarray]:
    """Full-batch GD through the gather/scatter products — weights
    live per one-hot column, O(D*k) state, no matrix ever built."""
    n = len(y01)
    w = np.zeros((d, k))
    b = np.zeros(k)
    onehot_y = np.eye(k)[y01]
    lr = 2.0 / max(1, idx.shape[1])
    for _ in range(_GD_ITERS):
        p = _softmax(_gather_matmul(idx, w) + b)
        resid = (p - onehot_y) / n
        w -= lr * (_scatter_matmul(idx, resid, d) + _ALPHA * w)
        b -= lr * resid.sum(axis=0)
    return w, b


def _neg_log_loss(p: np.ndarray, y01: np.ndarray) -> float:
    p = np.clip(p, 1e-15, 1 - 1e-15)
    return -float(-np.log(p[np.arange(len(y01)), y01]).mean())


def surrogate_score(first: np.ndarray, second: np.ndarray,
                    variant: str = "surrogate-SGD") -> float:
    """1 + median of 2-fold held-out neg-log-loss, like the reference.

    ``first`` may be 1-D codes or a 2-D code matrix (reference-model
    conditioning passes ``[model features..., candidate]`` columns —
    importance_estimator.py:80-91)."""
    y = densify(np.asarray(second).reshape(-1))
    classes = int(y.max()) + 1 if y.size else 1
    if classes < 2:
        return 1.0  # degenerate label: loss 0, perfectly "predictable"
    idx, d = _one_hot_indices(np.asarray(first))
    rng = np.random.Generator(np.random.PCG64(_SEED))

    dense = None
    if variant.endswith("-SVD") and d > 2:
        dense = _randomized_svd_features(idx, d, min(_SVD_DIMS, d), rng)
    elif variant.endswith("-RP") and d > _RP_DIMS:
        dense = _gather_matmul(idx, rng.standard_normal((d, _RP_DIMS))
                               / np.sqrt(_RP_DIMS))

    fold = _stratified_2fold(y)
    losses = []
    for test_fold in (0, 1):
        tr, te = fold != test_fold, fold == test_fold
        if y[tr].size == 0 or y[te].size == 0:
            continue
        # re-map train labels densely; unseen test classes get clipped
        # probability mass like sklearn's log_loss on unseen labels
        if dense is None:
            w, b = _fit_logistic_onehot(idx[tr], d, y[tr], classes)
            p = _softmax(_gather_matmul(idx[te], w) + b)
        else:
            w = _fit_logistic_dense(dense[tr], y[tr], classes)
            p = _predict_dense(dense[te], w)
        losses.append(_neg_log_loss(p, y[te]))
    if not losses:
        return 1.0
    return 1.0 + float(np.median(losses))
