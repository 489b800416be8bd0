"""KMV / Theta sketch: mergeable distinct-count with SET OPERATIONS.

Sketch-tier addition beyond the reference's cardinality layer: HLL
(the reference's warmup-set counter, counting_context_counters.py, and
this repo's sketches/hll.py) estimates the distinct count of ONE
stream and unions losslessly, but cannot estimate intersections or
Jaccard overlap between streams.  The k-minimum-values sketch (Beyer,
Haas, Reinwald, Sismanis, Gemulla, SIGMOD 2007 — the construction
underlying Apache DataSketches' theta sketch) keeps the ``k`` smallest
distinct 64-bit hash values; because a uniform hash maps any value set
onto uniform points in [0, 1), the k-th smallest point estimates the
set's density:

    estimate = (k - 1) / U_(k)        (U_(k) = k-th min, normalized)

with relative standard error ~ 1 / sqrt(k - 2) (published, Beyer et
al. §4; unbiased).  Below ``k`` distinct hashes the sketch IS the
exact distinct set.

Merge (union) keeps the k smallest of the union of retained hashes —
every one of the union's k smallest is necessarily among either
input's k smallest, so the merge is exact w.r.t. the construction,
fully associative + commutative, and (unlike KLL / Misra-Gries)
**bitwise order-independent**: the retained set is a deterministic
function of the input value set.

Set operations (Beyer et al. §5): for sketches A, B with union sketch
L = merge(A, B) retaining set S_L,

    jaccard  ~=  |S_L ∩ S_A ∩ S_B| / |S_L|
    |A ∩ B|  ~=  jaccard * estimate(L)

i.e. the k union-minima form a uniform sample of A ∪ B, and the
fraction of that sample seen by both sides estimates the Jaccard
index (binomial error sqrt(J(1-J)/k) on top of the union RSE).
Webtext use: distinct-URL overlap between two crawls, shared-user
audiences between event types — q72 exercises it against an exact
DuckDB INTERSECT oracle in tests and rows-only in the driver gate.
"""
from __future__ import annotations

import struct

import numpy as np

from outrank_spark.hashing import hash_values

__all__ = ["ThetaSketch"]

_TWO64 = float(2 ** 64)


class ThetaSketch:
    kind = "theta"

    def __init__(self, k: int = 4096,
                 hashes: np.ndarray | None = None):
        if k < 3:
            raise ValueError("k must be >= 3 (RSE ~ 1/sqrt(k-2))")
        self.k = k
        # sorted ascending uint64, at most k entries, all distinct
        self.hashes = (np.empty(0, dtype=np.uint64) if hashes is None
                       else np.asarray(hashes, dtype=np.uint64))

    # -- build ---------------------------------------------------------
    def update(self, values) -> "ThetaSketch":
        return self.update_hashes(hash_values(values))

    def update_hashes(self, h: np.ndarray) -> "ThetaSketch":
        """Absorb pre-hashed uint64 values (JVM xxhash64 fast path —
        same channel HLL uses in operators.sketch_build)."""
        h = np.asarray(h, dtype=np.uint64)
        if h.size == 0:
            return self
        if self.hashes.size == self.k:
            # only candidates below the current k-th minimum matter
            h = h[h < self.hashes[-1]]
            if h.size == 0:
                return self
        merged = np.unique(np.concatenate([self.hashes, h]))
        self.hashes = merged[: self.k]
        return self

    # -- merge ---------------------------------------------------------
    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("incompatible ThetaSketch k")
        merged = np.unique(np.concatenate([self.hashes, other.hashes]))
        self.hashes = merged[: self.k]
        return self

    # -- finalize ------------------------------------------------------
    def estimate(self) -> float:
        """Distinct-count estimate; exact while under k hashes."""
        if self.hashes.size < self.k:
            return float(self.hashes.size)
        kth = float(self.hashes[-1]) / _TWO64
        return (self.k - 1) / kth

    @property
    def rse(self) -> float:
        """Published relative standard error bound."""
        return 1.0 / np.sqrt(self.k - 2)

    # -- set operations -------------------------------------------------
    def jaccard(self, other: "ThetaSketch") -> float:
        """Estimated Jaccard index |A∩B| / |A∪B|."""
        union = ThetaSketch(self.k).merge(self).merge(other)
        s = union.hashes
        if s.size == 0:
            return 0.0
        both = (np.isin(s, self.hashes, assume_unique=True)
                & np.isin(s, other.hashes, assume_unique=True))
        return float(both.sum()) / float(s.size)

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        """Estimated |A ∩ B| = jaccard * |A ∪ B|."""
        union = ThetaSketch(self.k).merge(self).merge(other)
        return self.jaccard(other) * union.estimate()

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<BIQ", 1, self.k, self.hashes.size)
        return head + self.hashes.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        ver, k, size = struct.unpack_from("<BIQ", blob)
        off = struct.calcsize("<BIQ")
        hashes = np.frombuffer(
            blob, dtype=np.uint64, offset=off, count=size,
        ).copy()
        return cls(k=k, hashes=hashes)
