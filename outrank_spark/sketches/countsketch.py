"""Count-Sketch / AMS second-moment sketch (signed counters), mergeable.

Sketch-tier addition beyond the reference's counting layer: the
reference's only approximate frequency structure is the count-min
matrix (``counting_cms.py:15-44``), which is one-sided (never
underestimates, bias grows with stream length).  Count-Sketch (Charikar,
Chen, Farach-Colton 2002) keeps *signed* counters so point estimates
are UNBIASED, and its row L2 norms give the AMS (Alon, Matias, Szegedy
1996) estimator of the second frequency moment

    F2  =  sum_v count(v)^2

— the quantity behind self-join size estimation, skew detection
(F2/N^2 is the collision probability a shuffle planner cares about),
and repeated-token corpus statistics.

Layout: ``depth x width`` int64 matrix.  Row ``i`` maps value ``x`` to
bucket ``h_i(x) mod width`` with sign ``s_i(x) in {-1,+1}`` (both
derived from the same splitmix64 seed stream as CMS — see
``hashing.derive_seeds``).

* point query  = median over rows of ``s_i(x) * M[i, h_i(x)]``;
  unbiased, |err| <= sqrt(3 * F2 / width) per row with prob >= 2/3,
  boosted by the median over ``depth`` rows (Charikar et al., Lemma 4).
* F2 estimate  = median over rows of ``sum(M[i]^2)``; each row is an
  unbiased AMS estimator with Var <= 2 * F2^2 / width, so
  rel-err <= sqrt(6/width) with prob >= 2/3 per row, median-boosted.

Merge is elementwise matrix addition — exactly additive, associative,
commutative — so partial sketches from ANY partitioning merge to the
bitwise-identical matrix a single-pass build would produce (same
strongest-order-independence class as CMS/Bloom/HLL, stronger than
KLL/Misra-Gries whose internal state is only bound-equivalent).
"""
from __future__ import annotations

import struct

import numpy as np

from outrank_spark.hashing import derive_seeds, hash_values, hash_with_seed

__all__ = ["CountSketch"]

_MASTER_SEED = 20141025  # same master constant as the CMS/Bloom family


class CountSketch:
    kind = "countsketch"

    def __init__(self, depth: int = 5, width: int = 2 ** 13,
                 M: np.ndarray | None = None, seed: int = _MASTER_SEED):
        self.depth = depth
        self.width = width
        self.seed = seed
        # two independent seed streams: buckets and signs
        seeds = derive_seeds(seed, 2 * depth)
        self.idx_seeds = seeds[:depth]
        self.sign_seeds = seeds[depth:]
        self.M = (np.zeros((depth, width), dtype=np.int64)
                  if M is None else np.asarray(M, dtype=np.int64))

    # -- build ---------------------------------------------------------
    def update(self, values, counts: np.ndarray | None = None) -> "CountSketch":
        return self.update_hashes(hash_values(values), counts)

    def update_hashes(self, h: np.ndarray,
                      counts: np.ndarray | None = None) -> "CountSketch":
        """Vectorized add: ``h`` is uint64 pre-hashed values; ``counts``
        is an optional per-value weight vector (the map-side-combine
        fast path, same contract as CMS.update_hashes)."""
        if h.size == 0:
            return self
        c = (np.ones(h.shape, dtype=np.int64) if counts is None
             else np.asarray(counts, dtype=np.int64))
        for i in range(self.depth):
            idx = (hash_with_seed(h, self.idx_seeds[i])
                   % np.uint64(self.width)).astype(np.int64)
            sign = 1 - 2 * (hash_with_seed(h, self.sign_seeds[i])
                            >> np.uint64(63)).astype(np.int64)
            np.add.at(self.M[i], idx, sign * c)
        return self

    def add(self, x, delta: int = 1) -> None:
        """Single-element convenience (tests/parity only)."""
        self.update_hashes(hash_values(np.asarray([x])),
                           np.asarray([delta], dtype=np.int64))

    # -- query ---------------------------------------------------------
    def query(self, x) -> int:
        return int(self.query_many(np.asarray([x]))[0])

    def query_many(self, values) -> np.ndarray:
        """Unbiased point estimates: median over rows of the signed
        counter each value hashes to."""
        h = hash_values(values)
        est = np.empty((self.depth, h.size), dtype=np.int64)
        for i in range(self.depth):
            idx = (hash_with_seed(h, self.idx_seeds[i])
                   % np.uint64(self.width)).astype(np.int64)
            sign = 1 - 2 * (hash_with_seed(h, self.sign_seeds[i])
                            >> np.uint64(63)).astype(np.int64)
            est[i] = sign * self.M[i][idx]
        return np.median(est, axis=0).astype(np.int64)

    def f2_estimate(self) -> float:
        """AMS second-moment estimate: median over rows of the row's
        squared L2 norm.  Unbiased per row; rel-err ~ sqrt(6/width)
        with constant probability, boosted by the median."""
        row_f2 = (self.M.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(row_f2))

    def estimate(self) -> float:
        """Finalizer contract alias (SketchCollection.estimate path)."""
        return self.f2_estimate()

    def inner_product(self, other: "CountSketch") -> float:
        """AMS inner-product estimate <f_a, f_b> = Σ_k f_a(k)·f_b(k)
        between the two sketched frequency vectors — i.e. the
        EQUI-JOIN SIZE of the two keyed relations (Alon, Gibbons,
        Matias, Szegedy 1999): median over rows of the row dot
        product.  Unbiased per row; |est − J| <= sqrt(6/width) ·
        sqrt(F2_a · F2_b) per row with prob >= 2/3, median-boosted
        over ``depth`` rows (see :meth:`join_size_bound`).  Requires
        identical (depth, width, seed) — same hash family, else the
        row products are meaningless."""
        if (other.depth, other.width, other.seed) != (
                self.depth, self.width, self.seed):
            raise ValueError("incompatible CountSketch parameters")
        prods = (self.M.astype(np.float64)
                 * other.M.astype(np.float64)).sum(axis=1)
        return float(np.median(prods))

    def join_size_bound(self, other: "CountSketch") -> float:
        """Additive error scale of :meth:`inner_product`:
        sqrt(6/width) · sqrt(F2_a · F2_b) (per-row AMS variance bound,
        median-boosted over depth rows)."""
        return float(np.sqrt(6.0 / self.width)
                     * np.sqrt(self.f2_estimate()
                               * other.f2_estimate()))

    # -- merge ---------------------------------------------------------
    def merge(self, other: "CountSketch") -> "CountSketch":
        if (other.depth, other.width, other.seed) != (
                self.depth, self.width, self.seed):
            raise ValueError("incompatible CountSketch parameters")
        self.M += other.M
        return self

    # -- bounds --------------------------------------------------------
    @property
    def f2_rel_error(self) -> float:
        """Per-row AMS relative-error scale sqrt(6/width); the median
        over ``depth`` rows lands inside this with prob
        >= 1 - exp(-depth/6) (standard median boosting)."""
        return float(np.sqrt(6.0 / self.width))

    def point_error_bound(self) -> float:
        """Count-Sketch point-query bound sqrt(3*F2/width) (per row,
        prob >= 2/3; median-boosted over depth rows)."""
        return float(np.sqrt(3.0 * self.f2_estimate() / self.width))

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<BIIQ", 1, self.depth, self.width, self.seed)
        return head + self.M.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountSketch":
        ver, depth, width, seed = struct.unpack_from("<BIIQ", blob)
        off = struct.calcsize("<BIIQ")
        M = np.frombuffer(blob, dtype=np.int64, offset=off).reshape(
            depth, width).copy()
        return cls(depth=depth, width=width, M=M, seed=seed)
