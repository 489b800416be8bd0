"""Bloom filter membership sketch (Bloom 1970), mergeable + vectorized.

North-rule addition — the reference has no membership sketch
(SURVEY.md §2.9).  k probe positions per value via Kirsch-Mitzenmacher
double hashing (h1 + i*h2 mod m), which preserves the asymptotic false
positive rate (1 - e^{-kn/m})^k with only two base hashes.

Merge = bitwise OR of the bit arrays — associative, commutative,
idempotent — so partition-built filters union to the bitwise-identical
filter of a single pass.
"""
from __future__ import annotations

import struct

import numpy as np

from outrank_spark.hashing import hash_values, hash_with_seed

__all__ = ["BloomFilter"]


def _optimal_params(capacity: int, fpr: float) -> tuple[int, int]:
    m = int(np.ceil(-capacity * np.log(fpr) / (np.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # round up to whole words
    k = max(1, int(round(m / capacity * np.log(2))))
    return m, k


class BloomFilter:
    kind = "bloom"

    def __init__(self, capacity: int = 1_000_000, fpr: float = 0.01,
                 bits: np.ndarray | None = None, m: int | None = None,
                 k: int | None = None):
        if m is None or k is None:
            m, k = _optimal_params(capacity, fpr)
        self.m = m
        self.k = k
        self.capacity = capacity
        self.fpr_target = fpr
        self.bits = (bits if bits is not None
                     else np.zeros(m // 8, dtype=np.uint8))

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(n, k) probe positions via double hashing."""
        h1 = hash_with_seed(h, 0x5bf03635)
        h2 = hash_with_seed(h, 0xc2b2ae35) | np.uint64(1)  # odd -> full cycle
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)
        return pos.astype(np.int64)

    # -- build ---------------------------------------------------------
    def update(self, values) -> "BloomFilter":
        return self.update_hashes(hash_values(values))

    def update_hashes(self, h: np.ndarray) -> "BloomFilter":
        if h.size == 0:
            return self
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.left_shift(1, (pos & 7)).astype(np.uint8))
        return self

    # -- query ---------------------------------------------------------
    def contains(self, values) -> np.ndarray:
        h = hash_values(np.asarray(values))
        pos = self._positions(h)
        probe = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return probe.all(axis=1)

    def __contains__(self, x) -> bool:
        return bool(self.contains(np.asarray([x]))[0])

    # -- merge ---------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("incompatible Bloom parameters")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    # -- bounds --------------------------------------------------------
    def estimated_fpr(self) -> float:
        """Actual FPR from fill ratio: (set_bits / m)^k."""
        fill = np.unpackbits(self.bits).mean()
        return float(fill ** self.k)

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        return struct.pack("<BQI", 1, self.m, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        ver, m, k = struct.unpack_from("<BQI", blob)
        off = struct.calcsize("<BQI")
        bits = np.frombuffer(blob, dtype=np.uint8, offset=off).copy()
        return cls(bits=bits, m=m, k=k)
