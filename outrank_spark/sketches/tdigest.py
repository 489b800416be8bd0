"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", 2019), mergeable quantile sketch.

North-rule addition.  Centroids (mean, weight) are bounded by the k1
scale function k(q) = (delta / 2pi) * asin(2q - 1): adjacent sorted
centroids merge while their combined k-span stays <= 1, which keeps
tail quantiles (q near 0/1) very accurate — the digest's published
advantage over uniform-error sketches.  Accuracy is ~O(1/delta) in the
middle and far better in the tails.

Buffered build: updates append to a buffer, compressed in one
vectorized sort every ``buffer_size`` items; merge concatenates
centroid lists and compresses once (associative within the published
error envelope).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["TDigest"]


class TDigest:
    kind = "tdigest"

    def __init__(self, delta: float = 200.0, buffer_size: int = 4096):
        self.delta = float(delta)
        self.buffer_size = buffer_size
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.n = 0.0
        self.min = np.inf
        self.max = -np.inf

    # -- build ---------------------------------------------------------
    def update(self, values) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.n += v.size
        self._buf.append(v)
        self._buf_n += v.size
        if self._buf_n >= self.buffer_size:
            self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        if self._buf_n == 0 and self.means.size == 0:
            return
        parts_m = [self.means] + [b for b in self._buf]
        parts_w = [self.weights] + [np.ones(b.size) for b in self._buf]
        m = np.concatenate(parts_m)
        w = np.concatenate(parts_w)
        self._buf, self._buf_n = [], 0
        if m.size == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # Greedy merge pass constrained by the k1 scale function.
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w, acc = m[0], w[0], 0.0
        for i in range(1, m.size):
            q0 = acc / total
            q1 = (acc + cur_w + w[i]) / total
            if self._k(np.float64(q1)) - self._k(np.float64(q0)) <= 1.0:
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- merge ---------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("incompatible t-digest delta")
        other._compress()
        self._compress()
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._buf_n = self.buffer_size  # force
        self._compress()
        return self

    # -- finalize ------------------------------------------------------
    def quantile(self, q) -> np.ndarray | float:
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            res = np.full(qs.shape, np.nan)
            return res if np.ndim(q) else float(res[0])
        cum = np.cumsum(self.weights) - 0.5 * self.weights  # centroid centers
        total = self.weights.sum()
        res = np.interp(np.clip(qs, 0, 1) * total, cum, self.means,
                        left=self.min, right=self.max)
        return res if np.ndim(q) else float(res[0])

    def cdf(self, x) -> np.ndarray | float:
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            res = np.full(xs.shape, np.nan)
            return res if np.ndim(x) else float(res[0])
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        total = self.weights.sum()
        res = np.interp(xs, self.means, cum / total, left=0.0, right=1.0)
        return res if np.ndim(x) else float(res[0])

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        head = struct.pack("<BdQddd", 1, self.delta, self.means.size,
                           self.n, self.min, self.max)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        ver, delta, sz, n, mn, mx = struct.unpack_from("<BdQddd", blob)
        off = struct.calcsize("<BdQddd")
        out = cls(delta=delta)
        out.means = np.frombuffer(blob, dtype=np.float64, offset=off, count=sz).copy()
        out.weights = np.frombuffer(
            blob, dtype=np.float64, offset=off + 8 * sz, count=sz,
        ).copy()
        out.n, out.min, out.max = n, mn, mx
        return out
