"""Counting Bloom filter: mergeable membership WITH DELETIONS.

North-rule addition (sketch tier): the plain Bloom filter
(sketches/bloom.py) is insert-only — once a crawl snapshot's URLs are
folded in, a page REMOVED from the corpus (takedown, recrawl
replacement, dedup retraction) cannot be unmarked without rebuilding
the filter from scratch.  The counting variant (Fan, Cao, Almeida,
Broder, "Summary Cache", ToN 2000) replaces each bit with a counter:
add increments the k probe positions, remove decrements them,
membership is "all k counters > 0".

Counters here are SIGNED int32 and deltas are allowed to go negative
in intermediate state.  That single choice is what makes the sketch a
clean mergeable accumulator: a partition may process a removal before
any partition has processed the matching insert, and counter ADDITION
is associative + commutative regardless — the merged result equals
the single-pass result bitwise for any merge order (the add/max/or
family contract of operators/sketch_build.py).  The classic 4-bit
saturating counters would break exactly this (saturation is not
associative).  16 bytes/bit-position of the equivalent Bloom is the
honest cost of deletability; capacity/fpr sizing, the double-hashing
probe chain, and the published (1 - e^{-kn/m})^k false-positive bound
are shared with sketches/bloom.py verbatim (same hash seeds, so a
CBF with net counts > 0 matches the plain Bloom built from the same
net multiset — pinned in tests).

Standard counting-Bloom caveats, preserved honestly rather than
papered over:

* removing a value never inserted (globally, net of all partitions)
  can drive counters negative in the FINAL state and can introduce
  false negatives for values sharing those positions — ``contains``
  is only guaranteed no-false-negative when every remove matches a
  prior add (the multiset invariant callers must hold);
  ``min_negative()`` exposes the diagnostic.
* the false-positive bound is in terms of the NET distinct load, same
  as Bloom.
"""
from __future__ import annotations

import struct

import numpy as np

from outrank_spark.hashing import hash_values
from outrank_spark.sketches.bloom import BloomFilter, _optimal_params

__all__ = ["CountingBloomFilter"]


class CountingBloomFilter:
    kind = "cbf"

    def __init__(self, capacity: int = 1_000_000, fpr: float = 0.01,
                 m: int | None = None, k: int | None = None):
        if m is None or k is None:
            m, k = _optimal_params(capacity, fpr)
        self.m = m
        self.k = k
        self.capacity = capacity
        self.fpr_target = fpr
        self.counts = np.zeros(m, dtype=np.int32)
        # reuse the Bloom probe chain (same seeds -> same positions)
        self._probe = BloomFilter(m=m, k=k)._positions

    # -- build ---------------------------------------------------------
    def _apply(self, values, delta: int) -> "CountingBloomFilter":
        h = hash_values(np.asarray(values))
        if h.size == 0:
            return self
        pos = self._probe(h).ravel()
        np.add.at(self.counts, pos, np.int32(delta))
        return self

    def add(self, values) -> "CountingBloomFilter":
        return self._apply(values, 1)

    def remove(self, values) -> "CountingBloomFilter":
        return self._apply(values, -1)

    # alias for the generic sketch-build contract
    def update(self, values) -> "CountingBloomFilter":
        return self.add(values)

    # -- query ---------------------------------------------------------
    def contains(self, values) -> np.ndarray:
        h = hash_values(np.asarray(values))
        pos = self._probe(h)
        return (self.counts[pos] > 0).all(axis=1)

    def __contains__(self, x) -> bool:
        return bool(self.contains(np.asarray([x]))[0])

    def min_negative(self) -> int:
        """Most negative counter (0 if none) — a nonzero value proves
        some remove had no matching add and the no-false-negative
        guarantee is off until the missing adds arrive."""
        lo = int(self.counts.min()) if self.counts.size else 0
        return min(lo, 0)

    def to_bloom(self) -> BloomFilter:
        """Snapshot the net-positive positions as a plain Bloom filter
        (for broadcast probes via sketch_build.probe_bloom)."""
        bits = np.zeros(self.m // 8, dtype=np.uint8)
        pos = np.nonzero(self.counts > 0)[0]
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(1, (pos & 7)).astype(np.uint8))
        return BloomFilter(m=self.m, k=self.k, bits=bits)

    # -- merge ---------------------------------------------------------
    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("incompatible counting-Bloom parameters")
        self.counts += other.counts
        return self

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        return (struct.pack("<BII", 8, self.m, self.k)
                + self.counts.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBloomFilter":
        tag, m, k = struct.unpack_from("<BII", blob, 0)
        if tag != 8:
            raise ValueError(f"not a counting-Bloom blob (tag {tag})")
        sk = cls(m=m, k=k)
        sk.counts = np.frombuffer(
            blob, dtype=np.int32, offset=9).astype(np.int32, copy=True)
        return sk
