"""Count-min sketch (Cormode & Muthukrishnan 2005), mergeable + vectorized.

Behavioral counterpart of the reference ``CountMinSketch``
(``counting_cms.py:15-44``): depth x width counter matrix, query = min
over rows, default depth=6 / width=2^15 (eps = e/width, delta = e^-depth).
Two deliberate upgrades SURVEY.md §2.4 calls for:

* deterministic row seeds derived from a constant master seed — the
  reference seeds from unseeded ``np.random.randint``
  (counting_cms.py:23), which breaks mergeability across processes;
* int64 counters (reference: int32) so 10^12-row streams cannot
  overflow a hot cell.

Merge is elementwise matrix addition — exactly additive, associative,
commutative — so partial sketches from any partitioning merge to the
bitwise-identical matrix a single-pass build would produce.
"""
from __future__ import annotations

import struct

import numpy as np

from outrank_spark.hashing import derive_seeds, hash_values, hash_with_seed

__all__ = ["CountMinSketch"]

_MASTER_SEED = 20141025  # reference's internal_hash seed constant, reused as master


class CountMinSketch:
    kind = "cms"

    def __init__(self, depth: int = 6, width: int = 2 ** 15,
                 M: np.ndarray | None = None, seed: int = _MASTER_SEED):
        self.depth = depth
        self.width = width
        self.seed = seed
        self.hash_seeds = derive_seeds(seed, depth)
        self.M = (np.zeros((depth, width), dtype=np.int64)
                  if M is None else np.asarray(M, dtype=np.int64))

    # -- build ---------------------------------------------------------
    def update(self, values, counts: np.ndarray | None = None) -> "CountMinSketch":
        return self.update_hashes(hash_values(values), counts)

    def update_hashes(self, h: np.ndarray,
                      counts: np.ndarray | None = None) -> "CountMinSketch":
        """Vectorized add: h is uint64 pre-hashed values; counts is an
        optional per-value weight vector (pre-aggregated groupBy counts
        — the map-side-combine fast path)."""
        if h.size == 0:
            return self
        if counts is None:
            for i in range(self.depth):
                idx = (hash_with_seed(h, self.hash_seeds[i]) % np.uint64(self.width)).astype(np.int64)
                np.add.at(self.M[i], idx, 1)
        else:
            c = np.asarray(counts, dtype=np.int64)
            for i in range(self.depth):
                idx = (hash_with_seed(h, self.hash_seeds[i]) % np.uint64(self.width)).astype(np.int64)
                np.add.at(self.M[i], idx, c)
        return self

    def add(self, x, delta: int = 1) -> None:
        """Single-element convenience (tests/parity only — hot path is
        ``update``)."""
        self.update_hashes(hash_values(np.asarray([x])),
                           np.asarray([delta], dtype=np.int64))

    # -- query ---------------------------------------------------------
    def query(self, x) -> int:
        return int(self.query_many(np.asarray([x]))[0])

    def query_many(self, values) -> np.ndarray:
        h = hash_values(values)
        est = np.full(h.shape, np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(self.depth):
            idx = (hash_with_seed(h, self.hash_seeds[i]) % np.uint64(self.width)).astype(np.int64)
            np.minimum(est, self.M[i][idx], out=est)
        return est

    # -- merge ---------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.width, other.seed) != (self.depth, self.width, self.seed):
            raise ValueError("incompatible CMS parameters")
        self.M += other.M
        return self

    # -- bounds --------------------------------------------------------
    @property
    def epsilon(self) -> float:
        """Overestimate bound: err <= eps * N with prob 1 - delta."""
        return float(np.e / self.width)

    @property
    def delta(self) -> float:
        return float(np.exp(-self.depth))

    @property
    def total(self) -> int:
        """N = number of (weighted) items added (row sums are equal)."""
        return int(self.M[0].sum())

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<BIIQ", 1, self.depth, self.width, self.seed)
        return head + self.M.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        ver, depth, width, seed = struct.unpack_from("<BIIQ", blob)
        off = struct.calcsize("<BIIQ")
        M = np.frombuffer(blob, dtype=np.int64, offset=off).reshape(depth, width).copy()
        return cls(depth=depth, width=width, M=M, seed=seed)
