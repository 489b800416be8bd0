"""Coverage accumulator: exact non-missing share, mergeable.

Counterpart of the reference's per-batch ``compute_coverage``
(core_ranking.py:375-391) re-expressed as a (missing, total) counter
pair so it rides the same single-pass sketch scan instead of a second
aggregate over the data.  Merge is integer addition — exact and
order-independent; the final ratio equals the whole-data coverage
(an upgrade over the reference's mean-of-batch-means, SURVEY.md §2.4).
"""
from __future__ import annotations

import struct

import numpy as np
import pandas as pd

__all__ = ["CoverageCounter"]


class CoverageCounter:
    kind = "coverage"

    def __init__(self, missing_symbols: tuple[str, ...] = ("", "{}")):
        self.missing_symbols = tuple(missing_symbols)
        self.missing = 0
        self.total = 0

    def update(self, values) -> "CoverageCounter":
        s = pd.Series(values)
        n = len(s)
        miss = int(s.isna().sum())
        if n - miss:
            miss += int(s.dropna().astype(str).isin(self.missing_symbols).sum())
        self.missing += miss
        self.total += n
        return self

    def update_flags(self, flags: np.ndarray) -> "CoverageCounter":
        """Fast path: 0/1 missing flags precomputed JVM-side."""
        self.missing += int(np.asarray(flags).sum())
        self.total += int(len(flags))
        return self

    def merge(self, other: "CoverageCounter") -> "CoverageCounter":
        self.missing += other.missing
        self.total += other.total
        return self

    def coverage(self) -> float:
        """Percent non-missing, 100 * (1 - missing/total)."""
        if self.total == 0:
            return float("nan")
        return 100.0 * (1.0 - self.missing / self.total)

    def estimate(self) -> float:
        return self.coverage()

    def to_bytes(self) -> bytes:
        syms = "\x1f".join(self.missing_symbols).encode("utf-8")
        return struct.pack("<BQQI", 1, self.missing, self.total, len(syms)) + syms

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CoverageCounter":
        ver, missing, total, slen = struct.unpack_from("<BQQI", blob)
        off = struct.calcsize("<BQQI")
        syms = blob[off:off + slen].decode("utf-8")
        out = cls(tuple(syms.split("\x1f")) if syms else ())
        out.missing, out.total = missing, total
        return out
