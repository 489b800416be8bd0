"""Sliding-window HyperLogLog: distinct counts for ANY trailing
time window from ONE pass (mergeable skyline registers).

North-rule addition (sketch tier): plain HLL (sketches/hll.py; the
reference's warmup cardinality chain, counting_context_counters.py)
answers "how many distinct values EVER"; a crawl-monitoring question
is "how many distinct users/urls in the last hour / day / week" — and
re-scanning per window is exactly what a sketch should avoid.  The
sliding variant (Chabchoub & Hébrail, "Sliding HyperLogLog", 2010)
replaces each register's max-rho scalar with the register's
*future-possible-maxima* list — the skyline of (ts, rho) pairs:

    keep (ts, rho)  iff  no other pair has ts' >= ts AND rho' >= rho

Sorted by ts ascending the retained rhos are strictly decreasing, so
for any window start T the register value is the FIRST retained pair
with ts >= T, and the standard HLL estimator (with the same
small-range correction as sketches/hll.py) applies to the
reconstructed register array — the estimate for window T is
IDENTICAL to what a plain HLL fed only the rows with ts >= T would
hold, for every T simultaneously (pinned in tests/test_slidinghll.py,
which replays exact per-window HLLs).  The published
sigma = 1.04/sqrt(m) bound therefore carries over per window.

Space is HARD-bounded, not just expected: rho takes values in
[1, 64-p+1] and the skyline is strictly decreasing in rho, so a
register holds at most 64-p+1 pairs (<= 53 at p=12; expected
O(ln n) for random arrival order, the classic records-of-a-
permutation argument).  Worst case ~m*(64-p+1)*9 bytes; typical
blobs are a few x the plain HLL.

Merge is skyline-of-union — associative, commutative, idempotent —
and the wire format is canonical (registers in index order, pairs in
ts order), so ANY merge order yields a bitwise-identical blob and
estimates: the add/max/or family contract the Spark layer's salted
grouped merge relies on (operators/sketch_build.py).

Timestamps are float64 epoch seconds; the hash chain is the same
xxh64 + _j_rho register/rho split as sketches/hll.py, so estimates
with ts_from=None match plain HLL bit-for-bit.
"""
from __future__ import annotations

import struct
from bisect import bisect_left

import numpy as np

from outrank_spark.hashing import hash_values
from outrank_spark.sketches.hll import HyperLogLog

__all__ = ["SlidingHyperLogLog"]


def _prune(pairs: list[tuple[float, int]]) -> list[tuple[float, int]]:
    """Skyline of (ts, rho) pairs: ts ascending, rho strictly
    decreasing; a pair dominated by a later-or-equal ts with a
    greater-or-equal rho is dropped."""
    pairs.sort(key=lambda x: (-x[0], -x[1]))
    out: list[tuple[float, int]] = []
    best = -1
    for ts, rho in pairs:
        if rho > best:
            out.append((ts, rho))
            best = rho
    out.reverse()
    return out


class SlidingHyperLogLog:
    kind = "shll"

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4,18], got {p}")
        self.p = p
        self.m = 1 << p
        # register index -> skyline [(ts, rho)] (ts asc, rho desc)
        self.sky: dict[int, list[tuple[float, int]]] = {}

    # -- build ---------------------------------------------------------
    def update(self, values, ts) -> "SlidingHyperLogLog":
        h = hash_values(values)
        t = np.asarray(ts, dtype=np.float64)
        if t.shape != h.shape:
            raise ValueError(
                f"values/ts length mismatch: {h.shape} vs {t.shape}")
        ok = np.isfinite(t)
        h, t = h[ok], t[ok]
        if h.size == 0:
            return self
        j, rho = HyperLogLog._j_rho(h, self.p)
        return self._absorb(j, rho, t)

    def _absorb(self, j: np.ndarray, rho: np.ndarray,
                t: np.ndarray) -> "SlidingHyperLogLog":
        """Skyline-insert pre-split (register, rho, ts) triples — the
        shared path for update() and the Spark builder's JVM-prehashed
        batches (operators/sketch_build.sliding_distinct_counts)."""
        ok = np.isfinite(t)
        if not ok.all():
            j, rho, t = j[ok], rho[ok], t[ok]
        if j.size == 0:
            return self
        # batch-reduce first: one (j, rho) cell only needs its max ts,
        # so at most m*(64-p+1) inserts survive regardless of batch
        # size.  lexsort is (last key primary): group by j, rho; take
        # the max-ts row of each run.
        order = np.lexsort((t, rho, j))
        js, rs, tss = j[order], rho[order], t[order]
        last = np.r_[(js[1:] != js[:-1]) | (rs[1:] != rs[:-1]), True]
        sky = self.sky
        for ji, ri, ti in zip(js[last].tolist(), rs[last].tolist(),
                              tss[last].tolist()):
            cur = sky.get(ji)
            if cur is None:
                sky[ji] = [(ti, ri)]
            else:
                cur.append((ti, ri))
                sky[ji] = _prune(cur)
        return self

    # -- merge ---------------------------------------------------------
    def merge(self, other: "SlidingHyperLogLog") -> "SlidingHyperLogLog":
        if other.p != self.p:
            raise ValueError(
                "cannot merge sliding HLLs with different precision")
        sky = self.sky
        for j, pairs in other.sky.items():
            cur = sky.get(j)
            sky[j] = list(pairs) if cur is None else _prune(cur + pairs)
        return self

    # -- finalize ------------------------------------------------------
    def registers_at(self, ts_from: float | None = None) -> np.ndarray:
        """Reconstructed plain-HLL register array for the window
        [ts_from, +inf); ts_from=None means the full stream."""
        regs = np.zeros(self.m, dtype=np.uint8)
        for j, pairs in self.sky.items():
            if ts_from is None:
                regs[j] = pairs[0][1]  # ts asc, rho desc -> max rho
                continue
            i = bisect_left(pairs, (float(ts_from), -1))
            if i < len(pairs):
                regs[j] = pairs[i][1]
        return regs

    def estimate(self, ts_from: float | None = None) -> int:
        return HyperLogLog(
            p=self.p, registers=self.registers_at(ts_from)).estimate()

    @property
    def relative_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    def __len__(self) -> int:
        return self.estimate()

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [struct.pack("<BBI", 7, self.p, len(self.sky))]
        for j in sorted(self.sky):
            pairs = self.sky[j]
            parts.append(struct.pack("<IB", j, len(pairs)))
            for ts, rho in pairs:
                parts.append(struct.pack("<dB", ts, rho))
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SlidingHyperLogLog":
        tag, p, n = struct.unpack_from("<BBI", blob, 0)
        if tag != 7:
            raise ValueError(f"not a sliding-HLL blob (tag {tag})")
        sk = cls(p=p)
        off = 6
        for _ in range(n):
            j, cnt = struct.unpack_from("<IB", blob, off)
            off += 5
            pairs = []
            for _ in range(cnt):
                ts, rho = struct.unpack_from("<dB", blob, off)
                off += 9
                pairs.append((ts, rho))
            sk.sky[j] = pairs
        return sk
