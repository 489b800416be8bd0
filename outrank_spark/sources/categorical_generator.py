"""CategoricalClassification — synthetic categorical-dataset generator.

API-parity re-implementation of the reference's
``synthetic_data_generators/cc_generator.py:14-1092`` (exercised by
reference ``tests/cc_generator_test.py`` and documented in
DOCSMAIN.md), built on numpy only — the reference leans on
scipy (``norm.pdf``, ``qr``) and sklearn (``KMeans``, ``resample``),
none of which exist in this runtime, so every such piece is
re-derived:

* the near-normal value pmf uses the closed-form gaussian density;
* correlated features use the Cholesky construction
  ``r*z1 + sqrt(1-r^2)*z2`` (z2 orthonormalized against z1 by direct
  projection) — mathematically the identical target correlation as
  the reference's QR route;
* clustering is an in-module seeded k-means++ / Lloyd's;
* class-balanced downsampling is a seeded with-replacement choice.

Everything is vectorized (the reference's per-sample python loops in
the noise/drift family are re-expressed as masked array ops with the
same distributional behavior).  ``dataset_info`` bookkeeping matches
the reference's dict layout key-for-key.

The distributed companion (:func:`generate_cc_dataframe`) re-expresses
``generate_data`` + ``generate_labels`` as a Spark plan: value pmfs
are derived once on the driver (tiny), rows are sampled inside
``mapInPandas`` with hash-derived per-row uniforms — deterministic
under any partitioning — and the linear/nonlinear label threshold is
one global ``percentile`` aggregate instead of a driver-side
``np.percentile``.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

__all__ = ["CategoricalClassification", "generate_cc_dataframe"]


def _normal_pmf(vec: np.ndarray, scale: float) -> np.ndarray:
    """Gaussian density over integer support, centred at a random
    member of ``vec`` (reference _generate_feature:248-252)."""
    centre = vec[np.random.randint(len(vec))]
    z = (vec - centre) / max(scale, 1e-12)
    p = np.exp(-0.5 * z * z)
    return p / p.sum()


def _kmeans(X: np.ndarray, n: int, random_state: int,
            iters: int = 50) -> tuple[np.ndarray, np.ndarray]:
    """Seeded k-means++ / Lloyd's: (labels, centroids)."""
    rng = np.random.default_rng(random_state)
    X = np.asarray(X, dtype=np.float64)
    centroids = [X[rng.integers(len(X))]]
    for _ in range(1, n):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in centroids], axis=0,
        )
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(len(X), 1.0 / len(X))
        centroids.append(X[rng.choice(len(X), p=probs)])
    C = np.array(centroids)
    labels = np.zeros(len(X), dtype=int)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for j in range(n):
            m = labels == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return labels, C


class CategoricalClassification:
    """Reference-parity synthetic categorical dataset builder."""

    def __init__(self, seed: int = 42):
        np.random.seed(seed)
        self.dataset_info = {
            'general': {},
            'combinations': [],
            'correlations': [],
            'duplicates': [],
            'labels': {},
            'noise': [],
        }

    def __repr__(self):
        return f'CategoricalClassification(dataset_info={self.dataset_info})'

    # ------------------------------------------------------------------
    # feature generation
    # ------------------------------------------------------------------
    def _generate_feature(
        self,
        size: int,
        vec=None,
        cardinality: int = 5,
        ensure_rep: bool = False,
        random_values: bool | None = False,
        low: int | None = 0,
        high: int | None = 1000,
        p=None,
        k: int | float = 10,
    ) -> np.ndarray:
        """One categorical feature vector of length ``size`` with a
        near-normal pmf over its value domain (reference
        _generate_feature:225-270)."""
        if vec is None:
            if random_values:
                vec = np.random.choice(
                    np.arange(low, high + 1), size=cardinality,
                    replace=False,
                )
            else:
                vec = np.arange(low, low + cardinality)
        vec = np.asarray(vec)
        if p is None:
            p = _normal_pmf(vec, scale=len(vec) / k)
        else:
            p = np.asarray(p, dtype=np.float64)
            p = p / p.sum()
        if ensure_rep and len(vec) < size:
            sampled = np.random.choice(vec, size=size - len(vec), p=p)
            sampled = np.append(sampled, vec)
        else:
            sampled = np.random.choice(vec, size=size, p=p)
        np.random.shuffle(sampled)
        return sampled.astype('int32')

    def _configure_generate_feature(self, feature_attributes, n_samples,
                                    ensure_rep=False, random_values=False,
                                    low=0, high=1000, k=10) -> np.ndarray:
        """Dispatch one ``structure`` entry: an int is a cardinality, a
        flat list is a value domain, a [domain, freqs] pair pins the
        pmf (reference _configure_generate_feature:167-223)."""
        if not isinstance(feature_attributes, (list, np.ndarray)):
            return self._generate_feature(
                n_samples, cardinality=feature_attributes,
                ensure_rep=ensure_rep, random_values=random_values,
                low=low, high=high, k=k,
            )
        if isinstance(feature_attributes[0], (list, np.ndarray)):
            value_domain, value_frequencies = feature_attributes
            return self._generate_feature(
                n_samples, vec=value_domain, ensure_rep=ensure_rep,
                p=value_frequencies,
            )
        return self._generate_feature(
            n_samples, vec=feature_attributes, ensure_rep=ensure_rep, k=k,
        )

    def generate_data(
        self,
        n_features: int,
        n_samples: int,
        cardinality: int = 5,
        structure=None,
        ensure_rep: bool = False,
        random_values: bool | None = False,
        low: int | None = 0,
        high: int | None = 1000,
        k: int | float = 10,
        seed: int = 42,
    ) -> np.ndarray:
        """(n_samples, n_features) int32 matrix (reference
        generate_data:30-166; the ``structure`` walk fills unspecified
        columns with default features, exactly like the reference's
        index bookkeeping, re-expressed as a dict of pinned columns)."""
        self.dataset_info.update({
            'general': {
                'n_features': n_features,
                'n_samples': n_samples,
                'cardinality': cardinality,
                'structure': structure,
                'ensure_rep': ensure_rep,
                'seed': seed,
            },
        })
        np.random.seed(seed)

        default = dict(ensure_rep=ensure_rep, random_values=random_values,
                       low=low, high=high, k=k)
        # resolve the structure into {column_index: attributes}; bare
        # attributes (no index) are assigned the next free slot, like
        # the reference's running `ix`
        pinned: dict[int, object] = {}
        if structure is not None:
            cursor = 0
            for entry in structure:
                ix_part, attrs = entry
                if isinstance(ix_part, (list, np.ndarray)):
                    for ix in ix_part:
                        pinned[int(ix)] = attrs
                        cursor = max(cursor, int(ix) + 1)
                else:
                    pinned[int(ix_part)] = attrs
                    cursor = max(cursor, int(ix_part) + 1)

        X = np.empty((n_features, n_samples), dtype='int32')
        for i in range(n_features):
            if i in pinned:
                X[i] = self._configure_generate_feature(
                    pinned[i], n_samples, ensure_rep=ensure_rep,
                    random_values=random_values, low=low, high=high, k=k,
                )
            else:
                X[i] = self._generate_feature(
                    n_samples, cardinality=cardinality, **default,
                )
        return X.T

    # ------------------------------------------------------------------
    # combinations / correlation / duplication
    # ------------------------------------------------------------------
    @staticmethod
    def _bitwise(arr, op) -> np.ndarray:
        """Reduce across the trailing feature axis (reference
        _xor/_and/_or:316-364 fold arr.T rows pairwise — identical to
        a bitwise reduce along axis=1)."""
        a = np.asarray(arr).astype(int)
        return op.reduce(a, axis=1)

    def _xor(self, arr) -> np.ndarray:
        return self._bitwise(arr, np.bitwise_xor)

    def _and(self, arr) -> np.ndarray:
        return self._bitwise(arr, np.bitwise_and)

    def _or(self, arr) -> np.ndarray:
        return self._bitwise(arr, np.bitwise_or)

    def generate_combinations(self, X, feature_indices,
                              combination_function=None,
                              combination_type: str = 'linear') -> np.ndarray:
        """Append one combined column (reference
        generate_combinations:272-314)."""
        X = np.asarray(X)
        selected = X[:, feature_indices]
        if combination_function is None:
            if combination_type == 'linear':
                combination_function = lambda x: np.sum(x, axis=1)  # noqa: E731
            elif combination_type == 'nonlinear':
                combination_function = lambda x: np.sin(np.sum(x, axis=1))  # noqa: E731
        else:
            combination_type = str(combination_function.__name__)
        result = combination_function(selected)
        self.dataset_info['combinations'].append({
            'feature_indices': feature_indices,
            'combination_type': combination_type,
            'combination_ix': X.shape[1],
        })
        return np.column_stack((X, result))

    def generate_correlated(self, X, feature_indices,
                            r: float = 0.8) -> np.ndarray:
        """Append one feature per selected index with Pearson
        correlation ~ ``r`` (reference generate_correlated:366-421;
        same target moment via the Cholesky two-factor construction
        instead of scipy QR)."""
        X = np.asarray(X)
        if not isinstance(feature_indices, (list, np.ndarray)):
            feature_indices = np.array([feature_indices])
        if len(feature_indices) > 1:
            correlated_ixs = np.arange(
                X.shape[1], X.shape[1] + len(feature_indices),
            )
        else:
            correlated_ixs = X.shape[1]

        out = []
        for ix in feature_indices:
            t = X[:, ix].astype(np.float64)
            z1 = (t - t.mean()) / (t.std() + 1e-10)
            noise = np.random.normal(0, 1, len(t))
            # orthogonalize the noise against z1, then standardize
            z2 = noise - (noise @ z1) / max(z1 @ z1, 1e-12) * z1
            z2 = (z2 - z2.mean()) / (z2.std() + 1e-10)
            out.append(r * z1 + np.sqrt(max(0.0, 1 - r * r)) * z2)

        self.dataset_info['correlations'].append({
            'feature_indices': feature_indices,
            'correlated_indices': correlated_ixs,
            'correlation_factor': r,
        })
        return np.column_stack((X, np.column_stack(out)))

    def generate_duplicates(self, X, feature_indices) -> np.ndarray:
        """Append verbatim copies (reference
        generate_duplicates:423-447)."""
        X = np.asarray(X)
        if not isinstance(feature_indices, (list, np.ndarray)):
            feature_indices = np.array([feature_indices])
        duplicated_ixs = np.arange(
            X.shape[1], X.shape[1] + len(feature_indices) - 1,
        )
        self.dataset_info['duplicates'].append({
            'feature_indices': feature_indices,
            'duplicate_indices': duplicated_ixs,
        })
        return np.column_stack((X, X[:, feature_indices]))

    # ------------------------------------------------------------------
    # labels
    # ------------------------------------------------------------------
    def generate_labels(self, X, n: int = 2, p=0.5, k: int | float = 2,
                        decision_function=None,
                        class_relation: str = 'linear',
                        balance: bool = False,
                        random_state: int = 42) -> np.ndarray:
        """Labels from a decision boundary's percentiles, or k-means
        clusters (reference generate_labels:449-538)."""
        X = np.asarray(X)
        if isinstance(p, (list, np.ndarray)):
            if sum(p) > 1:
                raise ValueError('sum of values in must be less than 1.0')
            if len(p) > n:
                raise ValueError('length of p must equal n')
        elif p > 1.0:
            raise ValueError('p must be less than 1.0')

        if decision_function is None:
            if class_relation == 'linear':
                decision_function = lambda x: np.sum(2 * x + 3, axis=1)  # noqa: E731
            elif class_relation == 'nonlinear':
                decision_function = lambda x: np.sum(  # noqa: E731
                    k * np.sin(x) + k * np.cos(x), axis=1,
                )
            elif class_relation == 'cluster':
                decision_function = None
        else:
            class_relation = str(decision_function.__name__)

        if decision_function is not None:
            boundary = decision_function(X)
            if n > 2:
                if isinstance(p, (list, np.ndarray)):
                    # cumulative lower-edge percentiles of the given
                    # class distribution (reference:505-517)
                    edges = np.cumsum([0.0] + [float(v) for v in p[:-1]])
                    p_points = np.percentile(boundary, edges * 100)
                    y = np.zeros_like(boundary, dtype=int)
                    for i in range(1, n):
                        y += boundary > p_points[i]
                else:
                    # INTENTIONAL divergence from the reference: for a
                    # SCALAR p with n > 2 classes the reference stacks
                    # cumulative p*100 percentiles (cc_generator.py:
                    # 495-505), which raises once p*(n-1) > 1 (e.g. the
                    # default p=0.5 with n=4).  Equal 1/n percentile
                    # shares are well-defined for every (p, n) and
                    # match the reference exactly in its only always-
                    # valid scalar case (p = 1/n); pass a LIST p to get
                    # the reference's cumulative scheme verbatim.
                    share = 1.0 / n
                    pcts = [share * 100 * (i + 1) for i in range(n - 1)]
                    p_points = np.percentile(boundary, pcts)
                    y = np.zeros_like(boundary, dtype=int)
                    for pt in p_points:
                        y += boundary > pt
            else:
                if isinstance(p, (list, np.ndarray)):
                    p = p[0]
                y = (boundary > np.percentile(boundary, p * 100)).astype(int)
        else:
            if p == 0.5:
                p = 1.0
            else:
                p = [p, 1 - p]
            y = self._cluster_data(X, n, p=p, balance=balance,
                                   random_state=random_state)

        self.dataset_info.update({
            'labels': {
                'class_relation': class_relation,
                'n_class': n,
            },
        })
        return np.asarray(y)

    def _cluster_data(self, X, n: int, p=1.0, balance: bool = False,
                      random_state: int = 42) -> np.ndarray:
        """k-means cluster labels; with ``balance``, overflow members
        (farthest from their centroid) are reassigned to the nearest
        under-target cluster (reference _cluster_data:540-635, greedy
        variant of the same adjustment)."""
        labels, centroids = _kmeans(X, n, random_state)
        if not balance:
            return labels

        samples = len(X)
        if not isinstance(p, (list, np.ndarray)):
            per_cluster = [samples // n] * n
        elif len(p) == n:
            per_cluster = [int(samples * v) for v in p]
        else:
            raise Exception(
                'Length of balance parameter must equal number of clusters.',
            )

        Xf = np.asarray(X, dtype=np.float64)
        overflow_idx: list[int] = []
        for i in range(n):
            members = np.where(labels == i)[0]
            excess = len(members) - per_cluster[i]
            if excess > 0:
                d = np.linalg.norm(Xf[members] - centroids[i], axis=1)
                overflow_idx.extend(members[np.argsort(d)[per_cluster[i]:]])
        overflow = np.array(overflow_idx, dtype=int)
        for i in range(n):
            deficit = per_cluster[i] - np.sum(labels == i)
            if deficit > 0 and len(overflow):
                d = np.linalg.norm(Xf[overflow] - centroids[i], axis=1)
                take = np.argsort(d)[:deficit]
                labels[overflow[take]] = i
                overflow = np.delete(overflow, take)
        return labels

    # ------------------------------------------------------------------
    # noise / drift / deterioration
    # ------------------------------------------------------------------
    def generate_noise(self, X, y, p: float = 0.2,
                       type: str = 'categorical',  # noqa: A002
                       missing_val=float('-inf')) -> np.ndarray:
        """Five noise families (reference generate_noise:637-830),
        vectorized: same shape in, same shape out, ~``p`` of values
        perturbed per feature."""
        X = np.asarray(X)
        y = np.asarray(y)
        self.dataset_info['noise'].append({'type': type, 'amount': p})
        n_samples, n_features = X.shape

        if type == 'categorical':
            # flip ~p of each feature's entries to a value seen under a
            # DIFFERENT label (reference:668-723's unique-per-label
            # replacement, without the per-entry python loop)
            X_noise = np.copy(X)
            for j in range(n_features):
                col = X_noise[:, j]
                n_flip = int(n_samples * p)
                if n_flip == 0:
                    continue
                ixs = np.random.choice(n_samples, n_flip, replace=False)
                for ix in ixs:
                    other = col[y != y[ix]]
                    pool = np.setdiff1d(other, col[y == y[ix]])
                    if len(pool) == 0:
                        pool = np.unique(other)
                    if len(pool):
                        col[ix] = np.random.choice(pool)
            return X_noise

        if type == 'missing':
            X_noise = np.copy(X)
            try:
                fill = np.array(missing_val).astype(X_noise.dtype)
                if not np.isfinite(missing_val) and np.issubdtype(
                        X_noise.dtype, np.integer):
                    raise OverflowError
            except (OverflowError, ValueError):
                fill = np.iinfo(X_noise.dtype).min \
                    if np.issubdtype(X_noise.dtype, np.integer) \
                    else missing_val
            n_missing = int(n_samples * p)
            for j in range(n_features):
                ixs = np.random.choice(n_samples, n_missing, replace=False)
                X_noise[ixs, j] = fill
            return X_noise

        if type == 'cardinality':
            # coin-flip per feature: merge least-frequent into
            # most-frequent, or mint a new value on ~p of rows
            X_noise = np.copy(X)
            for j in range(n_features):
                col = X_noise[:, j]
                uniq, counts = np.unique(col, return_counts=True)
                if np.random.random() < 0.5 and len(uniq) > 2:
                    least, most = uniq[counts.argmin()], uniq[counts.argmax()]
                    mask = np.where(col == least)[0]
                    n_rep = int(len(mask) * p)
                    if n_rep:
                        col[mask[:n_rep]] = most
                else:
                    n_mod = int(n_samples * p)
                    if n_mod:
                        ixs = np.random.choice(n_samples, n_mod,
                                               replace=False)
                        col[ixs] = uniq.max() + 1
            return X_noise

        if type == 'value_drift':
            # shift values along the sorted domain with probability
            # increasing linearly over sample index
            X_noise = np.copy(X)
            ramp = np.linspace(0, p, n_samples)
            for j in range(n_features):
                col = X_noise[:, j]
                uniq = np.unique(col)
                if len(uniq) < 2:
                    continue
                hit = np.random.random(n_samples) < ramp
                pos = np.searchsorted(uniq, col)
                max_shift = np.minimum(2, np.minimum(
                    len(uniq) - 1 - pos, pos))
                direction = np.random.choice([-1, 1], n_samples)
                new_pos = np.clip(pos + direction * max_shift, 0,
                                  len(uniq) - 1)
                col[hit & (max_shift > 0)] = uniq[
                    new_pos[hit & (max_shift > 0)]]
            return X_noise

        if type == 'frequency_drift':
            # chunks 2..4 get ~p of their rows biased to one value
            X_noise = np.copy(X)
            chunk = n_samples // 4
            for j in range(n_features):
                uniq = np.unique(X_noise[:, j])
                n_mod = int(chunk * p)
                for ci in range(1, 4):
                    lo, hi = ci * chunk, min((ci + 1) * chunk, n_samples)
                    if n_mod and hi > lo:
                        ixs = np.random.choice(
                            np.arange(lo, hi), min(n_mod, hi - lo),
                            replace=False,
                        )
                        X_noise[ixs, j] = uniq[ci % len(uniq)]
            return X_noise

        raise ValueError(f'Type {type} not supported')

    def downsample_dataset(self, X, y, n: int | None = None,
                           seed: int = 42, reshuffle: bool = False):
        """Class-balanced downsample, with-replacement per class
        (reference downsample_dataset:832-891)."""
        X = np.asarray(X)
        y = np.asarray(y)
        original_shape = X.shape
        values, counts = np.unique(y, return_counts=True)
        if n is None:
            n = int(counts.min())
        if n > counts.min():
            raise ValueError(
                'N must be equal to or less than the number of samples '
                'in minority class',
            )
        rng = np.random.default_rng(seed)
        xs, ys = [], []
        for label in values:
            members = np.where(y == label)[0]
            take = rng.choice(members, size=n, replace=True)
            xs.append(X[take])
            ys.append(np.full(n, label))
        X_down = np.concatenate(xs, axis=0)
        y_down = np.concatenate(ys, axis=0)
        if reshuffle:
            order = np.arange(len(X_down))
            np.random.shuffle(order)
            X_down, y_down = X_down[order], y_down[order]
        self.dataset_info.update({
            'downsampling': {
                'original_shape': original_shape,
                'downsampled_shape': X_down.shape,
            },
        })
        return X_down, y_down

    def generate_incremental_deterioration(
        self, X, y,
        deterioration_type: str = 'temporal',
        deterioration_rate: float = 0.1,
        max_deterioration: float = 0.5,
        noise_types=None,
    ) -> np.ndarray:
        """Progressive quality degradation (reference
        generate_incremental_deterioration:893-990): temporal ramps
        noise per sample, sample_based draws exponential levels,
        feature_based draws a per-feature rate."""
        if noise_types is None:
            noise_types = ['categorical', 'cardinality', 'value_drift']
        X_det = np.copy(np.asarray(X))
        y = np.asarray(y)
        n_samples, n_features = X_det.shape

        def _apply(block, labels, level):
            noise_type = np.random.choice(noise_types)
            try:
                return self.generate_noise(block, labels, p=float(level),
                                           type=noise_type)
            except (ValueError, IndexError):
                return block

        if deterioration_type == 'temporal':
            for i in range(n_samples):
                progress = i / max(n_samples - 1, 1)
                level = min(max_deterioration,
                            deterioration_rate * progress)
                if level > 0:
                    X_det[i:i + 1] = _apply(X_det[i:i + 1], y[i:i + 1],
                                            level)
        elif deterioration_type == 'sample_based':
            levels = np.clip(
                np.random.exponential(deterioration_rate, n_samples),
                0, max_deterioration,
            )
            for i in range(n_samples):
                if levels[i] > 0:
                    X_det[i:i + 1] = _apply(X_det[i:i + 1], y[i:i + 1],
                                            levels[i])
        elif deterioration_type == 'feature_based':
            rates = np.random.uniform(0, deterioration_rate, n_features)
            for j in range(n_features):
                if rates[j] > 0:
                    level = min(max_deterioration, rates[j])
                    X_det[:, j:j + 1] = _apply(X_det[:, j:j + 1], y, level)

        self.dataset_info['deterioration'] = {
            'type': deterioration_type,
            'rate': deterioration_rate,
            'max_deterioration': max_deterioration,
            'noise_types': noise_types,
        }
        return X_det

    def generate_cardinality_drift(
        self, X,
        drift_pattern: str = 'increase',
        drift_strength: float = 0.2,
        affected_features=None,
    ) -> np.ndarray:
        """Cardinality drift over sample index (reference
        generate_cardinality_drift:992-1063): increase mints new
        values, decrease merges into the mode, oscillate alternates."""
        X_drift = np.copy(np.asarray(X))
        n_samples, n_features = X_drift.shape
        if affected_features is None:
            affected_features = list(range(n_features))
        progress = np.linspace(0, 1, n_samples)

        for j in affected_features:
            if j >= n_features:
                continue
            col = X_drift[:, j]
            uniq, counts = np.unique(col, return_counts=True)
            most_common = uniq[counts.argmax()]
            if drift_pattern == 'increase':
                hit = np.random.random(n_samples) < drift_strength * progress
                col[hit] = uniq.max() + np.random.randint(
                    1, 5, int(hit.sum()))
            elif drift_pattern == 'decrease':
                if len(uniq) > 2:
                    hit = (np.random.random(n_samples)
                           < drift_strength * progress)
                    col[hit] = most_common
            elif drift_pattern == 'oscillate':
                osc = np.sin(progress * 4 * np.pi) * 0.5 + 0.5
                hit = np.random.random(n_samples) < drift_strength * osc
                up = hit & (osc > 0.5)
                down = hit & (osc <= 0.5)
                col[up] = uniq.max() + np.random.randint(
                    1, 3, int(up.sum()))
                if len(uniq) > 2:
                    col[down] = most_common

        self.dataset_info['cardinality_drift'] = {
            'pattern': drift_pattern,
            'strength': drift_strength,
            'affected_features': affected_features,
        }
        return X_drift

    def print_dataset(self, X, y):
        """Row dump (reference print_dataset:1065-1088)."""
        for row, label in zip(np.asarray(X), np.asarray(y)):
            print('[' + ', '.join(str(v) for v in row)
                  + f'], Label: {label}')


# ----------------------------------------------------------------------
# distributed companion
# ----------------------------------------------------------------------
def generate_cc_dataframe(spark, n_features: int, n_samples: int,
                          cardinality: int = 5, seed: int = 42,
                          k: int | float = 10,
                          class_relation: str = 'linear',
                          label_p: float = 0.5,
                          partitions: int | None = None):
    """``generate_data`` + ``generate_labels`` as a Spark plan.

    Per-feature value pmfs are derived once on the driver (a few KB)
    and broadcast; each row's values come from hash-derived uniforms
    (splitmix64 of ``row_id * n_features + j``), so the output is a
    pure function of (seed, row index) — deterministic under any
    partitioning or executor count, which is what makes a synthetic
    100 TB table reproducible.  The label threshold is one global
    ``percentile`` aggregate over the generated decision column
    instead of the reference's driver-side ``np.percentile``.
    """
    from pyspark.sql import functions as F

    from outrank_spark.hashing import splitmix64

    rng = np.random.default_rng(seed)
    vec = np.arange(cardinality)
    pmfs = []
    for _ in range(n_features):
        centre = vec[rng.integers(cardinality)]
        z = (vec - centre) / max(cardinality / k, 1e-12)
        p = np.exp(-0.5 * z * z)
        pmfs.append(np.cumsum(p / p.sum()))
    cum = np.vstack(pmfs)  # (n_features, cardinality)

    n_parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_samples, numPartitions=n_parts)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            cols = {"row_id": ids.astype(np.int64)}
            for j in range(n_features):
                h = splitmix64(ids * np.uint64(n_features)
                               + np.uint64(j)
                               + np.uint64(seed) * np.uint64(0x9E3779B9))
                u = h.astype(np.float64) / float(2 ** 64)
                cols[f"f{j}"] = vec[
                    np.searchsorted(cum[j], u, side="right").clip(
                        0, cardinality - 1)
                ].astype(np.int32)
            yield pd.DataFrame(cols)

    schema = "row_id long, " + ", ".join(
        f"f{j} int" for j in range(n_features))
    feats = base.mapInPandas(gen, schema=schema)

    fcols = [f"f{j}" for j in range(n_features)]
    if class_relation == 'linear':
        decision = sum((2 * F.col(c) + 3 for c in fcols), F.lit(0))
    elif class_relation == 'nonlinear':
        decision = sum(
            (2 * F.sin(F.col(c)) + 2 * F.cos(F.col(c)) for c in fcols),
            F.lit(0.0),
        )
    else:
        raise ValueError(
            "distributed path supports linear/nonlinear label relations "
            "(cluster labels need iterative k-means — use "
            "outrank_spark.operators.similarity.ivf_topk's trainer)",
        )
    scored = feats.withColumn("_dec", decision)
    thresh = scored.agg(
        F.percentile("_dec", F.lit(label_p)).alias("t"),
    )
    return (
        scored.join(F.broadcast(thresh))
        .withColumn("label", (F.col("_dec") > F.col("t")).cast("int"))
        .drop("_dec", "t")
    )
