"""DDSketch: quantiles with a RELATIVE-error guarantee (mergeable).

North-rule addition (sketch tier): the library's other quantile
sketches carry *rank*-error bounds (KLL: eps = 2/k on the rank) or
heuristic centroid bounds (t-digest).  DDSketch (Masson, Rim, Lee,
VLDB 2019) guarantees the returned VALUE is within relative error
``alpha`` of the true quantile value — the bound practitioners want
for latency/size distributions whose tails span orders of magnitude
(exactly the shape of web-page byte sizes and token counts).

Construction: logarithmic bucketing with gamma = (1+alpha)/(1-alpha);
a positive value x lands in bucket i = ceil(log_gamma(x)), whose
midpoint estimate 2*gamma^i/(gamma+1) is within alpha of every value
the bucket can hold.  Zeros and negatives get their own stores (the
paper's extension), so the sketch is total over float64.

Mergeability: state is pure integer bucket counts, merge is counter
addition — associative AND commutative, and because ``to_bytes``
serializes buckets in canonical (sorted-index) order, ANY merge order
yields a bitwise-identical wire image and estimate.  That puts
DDSketch in the add/max/or family (HLL, CMS, Bloom) rather than the
order-sensitive family (KLL, t-digest): the only quantile sketch here
with bitwise order-independent merges, pinned in
tests/test_ddsketch.py.

Memory: buckets are unbounded by default but the log-mapping bounds
them structurally — the full float64 positive range spans
ceil(log_gamma(1e308) - log_gamma(1e-308)) indices, ~= 70k at
alpha=0.01 (~350 KiB worst case); real columns span a few hundred.
An optional ``max_buckets`` collapses the LOWEST indices (paper's
collapsing variant) for adversarial inputs; it preserves the alpha
bound for every quantile above the collapsed mass, but because a
collapse during an INTERMEDIATE merge can fold counts a later merge
would have kept separate, the bitwise order-independence claim holds
only for the default unbounded form (which is what the Spark layer
uses — the structural ~70k-bucket ceiling makes collapsing a
defensive option, not the normal path).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["DDSketch"]


class DDSketch:
    kind = "ddsketch"

    def __init__(self, alpha: float = 0.01, max_buckets: int = 0):
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0,1), got {alpha}")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._inv_log_gamma = 1.0 / np.log(self.gamma)
        self.max_buckets = int(max_buckets)  # 0 = unbounded
        self.pos: dict[int, int] = {}   # bucket index -> count (x > 0)
        self.neg: dict[int, int] = {}   # bucket index of |x|     (x < 0)
        self.zero = 0                   # count of exact zeros
        self.n = 0

    # -- build ---------------------------------------------------------
    def _indices(self, mag: np.ndarray) -> np.ndarray:
        # i = ceil(log_gamma(x)); float round-off at bucket boundaries
        # only ever moves a value to the adjacent bucket, whose midpoint
        # is still within alpha by construction of gamma.
        return np.ceil(np.log(mag) * self._inv_log_gamma).astype(np.int64)

    def update(self, values) -> "DDSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.zero += int(np.count_nonzero(v == 0.0))
        for store, mag in ((self.pos, v[v > 0]), (self.neg, -v[v < 0])):
            if mag.size:
                idx, cnt = np.unique(self._indices(mag),
                                     return_counts=True)
                for i, c in zip(idx.tolist(), cnt.tolist()):
                    store[i] = store.get(i, 0) + c
        self._collapse()
        return self

    def _collapse(self) -> None:
        """Canonical collapsing-lowest form (no-op when unbounded)."""
        if not self.max_buckets:
            return
        for store in (self.pos, self.neg):
            while len(store) > self.max_buckets:
                lo = sorted(store)[:2]
                store[lo[1]] = store.get(lo[1], 0) + store.pop(lo[0])

    # -- merge ---------------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-12:
            raise ValueError("cannot merge DDSketches with different alpha")
        if other.max_buckets != self.max_buckets:
            # the collapse bound is part of the family contract: equal
            # bounds keep the post-sum collapse canonical in any order
            raise ValueError("cannot merge DDSketches with different "
                             "max_buckets")
        for mine, theirs in ((self.pos, other.pos), (self.neg, other.neg)):
            for i, c in theirs.items():
                mine[i] = mine.get(i, 0) + c
        self.zero += other.zero
        self.n += other.n
        self._collapse()
        return self

    # -- finalize ------------------------------------------------------
    def _value_of(self, index: int, sign: int) -> float:
        return sign * 2.0 * self.gamma ** index / (self.gamma + 1.0)

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at quantile(s) q in [0, 1]; NaN when empty.

        Walks negatives (most negative first), zeros, then positives in
        ascending bucket order; rank convention matches the paper:
        the q-quantile is the item at rank floor(q * (n - 1)) of the
        sorted multiset.
        """
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.n == 0:
            res = np.full(qs.shape, np.nan)
            return res if np.ndim(q) else float(res[0])
        # Materialize the cumulative walk once (buckets are few).
        steps: list[tuple[float, int]] = []
        for i in sorted(self.neg, reverse=True):
            steps.append((self._value_of(i, -1), self.neg[i]))
        if self.zero:
            steps.append((0.0, self.zero))
        for i in sorted(self.pos):
            steps.append((self._value_of(i, +1), self.pos[i]))
        vals = np.array([s[0] for s in steps])
        cum = np.cumsum([s[1] for s in steps])
        ranks = np.floor(np.clip(qs, 0.0, 1.0) * (self.n - 1)).astype(
            np.int64)
        pos = np.searchsorted(cum, ranks, side="right")
        pos = np.clip(pos, 0, len(vals) - 1)
        res = vals[pos]
        return res if np.ndim(q) else float(res[0])

    @property
    def relative_error(self) -> float:
        return self.alpha

    def __len__(self) -> int:
        return self.n

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Canonical image: buckets in sorted index order, so equal
        logical state (from ANY merge order) is equal bytes."""
        head = struct.pack("<BdiqQ", 1, self.alpha, self.max_buckets,
                           self.zero, self.n)
        parts = [head]
        for store in (self.pos, self.neg):
            idx = np.array(sorted(store), dtype=np.int64)
            cnt = np.array([store[i] for i in idx], dtype=np.int64)
            parts.append(struct.pack("<I", idx.size))
            parts.append(idx.tobytes())
            parts.append(cnt.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DDSketch":
        ver, alpha, max_buckets, zero, n = struct.unpack_from(
            "<BdiqQ", blob)
        out = cls(alpha=alpha, max_buckets=max_buckets)
        out.zero, out.n = zero, n
        off = struct.calcsize("<BdiqQ")
        for store in (out.pos, out.neg):
            (k,) = struct.unpack_from("<I", blob, off)
            off += 4
            idx = np.frombuffer(blob, dtype=np.int64, count=k, offset=off)
            off += 8 * k
            cnt = np.frombuffer(blob, dtype=np.int64, count=k, offset=off)
            off += 8 * k
            store.update(zip(idx.tolist(), cnt.tolist()))
        return out
