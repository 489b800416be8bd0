"""Frequent Directions matrix sketch (Liberty 2013; Ghashami, Liberty,
Phillips, Woodruff 2016), mergeable.

Sketch-tier addition with no reference counterpart (the reference has
no embedding/matrix layer at all): a deterministic ``ell x d`` sketch
``B`` of a tall row matrix ``A`` (the corpus embedding matrix) such
that

    0  <=  x^T (A^T A - B^T B) x  <=  ||A||_F^2 / ell     for unit x

i.e. every direction's captured energy is under-estimated by at most
``||A||_F^2 / ell`` (Ghashami et al. 2016, Thm 1.1).  That gives
cluster-feasibility / effective-rank / PCA-subspace answers over a
10^12-row embedding table from ``ell x d`` floats of driver state.

Mergeable (ibid. §3): concatenating two sketches' rows and re-shrinking
yields a sketch with the SUMMED error budgets — so per-partition
sketches built in one ``mapInPandas`` pass merge associatively to a
bound-preserving global sketch (bound-equivalent class, like
KLL/Misra-Gries: internal state may differ by merge order, the
guarantee does not).

Implementation detail: the classic 2*ell buffer — rows append until the
buffer fills, then one SVD shrinks by sigma_ell^2 and keeps ell rows.
``squared_frobenius`` accumulates ||A||_F^2 EXACTLY (additively), so
the error bound reported to callers is the true one, not a worst case.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["FrequentDirections"]


class FrequentDirections:
    kind = "fd"

    def __init__(self, ell: int = 64, d: int | None = None,
                 B: np.ndarray | None = None, n_buf: int = 0,
                 squared_frobenius: float = 0.0, n_rows: int = 0,
                 shrink_total: float = 0.0):
        self.ell = int(ell)
        self.d = d
        # buffer holds up to 2*ell rows; first `n_buf` are live
        self.B = B
        self.n_buf = int(n_buf)
        self.squared_frobenius = float(squared_frobenius)
        self.n_rows = int(n_rows)
        # cumulative sum of the sigma_ell^2 shrinkage applied; the
        # realized bound  A^T A - B^T B  <=  shrink_total * I  is
        # always <= squared_frobenius / ell
        self.shrink_total = float(shrink_total)

    def _ensure(self, d: int) -> None:
        if self.B is None:
            self.d = d
            self.B = np.zeros((2 * self.ell, d), dtype=np.float64)
        elif self.d != d:
            raise ValueError(f"row width {d} != sketch width {self.d}")

    # -- build ---------------------------------------------------------
    def update(self, rows) -> "FrequentDirections":
        """Absorb a 2-D (n, d) block of rows, vectorized."""
        X = np.asarray(rows, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(1, -1)
        if X.shape[0] == 0:
            return self
        self._ensure(X.shape[1])
        self.squared_frobenius += float((X * X).sum())
        self.n_rows += X.shape[0]
        i = 0
        while i < X.shape[0]:
            free = 2 * self.ell - self.n_buf
            take = min(free, X.shape[0] - i)
            self.B[self.n_buf:self.n_buf + take] = X[i:i + take]
            self.n_buf += take
            i += take
            if self.n_buf >= 2 * self.ell:
                self._shrink()
        return self

    def _shrink(self) -> None:
        """SVD the live buffer, subtract sigma_ell^2 from every squared
        singular value, keep the top ell directions."""
        _, s, Vt = np.linalg.svd(self.B[:self.n_buf], full_matrices=False)
        if s.size <= self.ell:
            # d <= ell (or rank-deficient buffer): the whole buffer is
            # representable EXACTLY in <= ell rows — lossless
            # compaction, no shrinkage, no error added.  (Without this
            # the buffer would stay full and the fill loop could not
            # make progress.)
            k = s.size
            self.B[:k] = s[:, None] * Vt
            self.B[k:] = 0.0
            self.n_buf = k
            return
        delta = s[self.ell] ** 2
        s_new = np.sqrt(np.maximum(s[:self.ell] ** 2 - delta, 0.0))
        self.B[:self.ell] = s_new[:, None] * Vt[:self.ell]
        self.B[self.ell:] = 0.0
        self.n_buf = self.ell
        self.shrink_total += float(delta)

    # -- merge ---------------------------------------------------------
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.ell != self.ell:
            raise ValueError("incompatible FD ell")
        if other.B is None or other.n_buf == 0:
            self.squared_frobenius += other.squared_frobenius
            self.n_rows += other.n_rows
            self.shrink_total += other.shrink_total
            return self
        if self.B is None:
            self._ensure(other.d)
        elif self.d != other.d:
            raise ValueError("incompatible FD width")
        # appending other's live rows preserves the bound because
        # B_other^T B_other <= A_other^T A_other rowwise-energy-wise;
        # frobenius/shrink budgets add (Ghashami et al. §3)
        self.squared_frobenius += other.squared_frobenius
        self.n_rows += other.n_rows
        self.shrink_total += other.shrink_total
        rows = other.B[:other.n_buf]
        i = 0
        while i < rows.shape[0]:
            free = 2 * self.ell - self.n_buf
            take = min(free, rows.shape[0] - i)
            self.B[self.n_buf:self.n_buf + take] = rows[i:i + take]
            self.n_buf += take
            i += take
            if self.n_buf >= 2 * self.ell:
                self._shrink()
        return self

    # -- query ---------------------------------------------------------
    def sketch_matrix(self) -> np.ndarray:
        """The current ell-row (at most 2*ell during fill) sketch."""
        if self.B is None:
            return np.zeros((0, 0))
        return self.B[:self.n_buf].copy()

    def singular_values(self, k: int | None = None) -> np.ndarray:
        """Top-k singular values of the sketch (lower bounds on A's,
        each sigma_i(A)^2 - sigma_i(B)^2 <= squared_frobenius/ell)."""
        if self.B is None or self.n_buf == 0:
            return np.zeros(0)
        s = np.linalg.svd(self.B[:self.n_buf], compute_uv=False)
        return s if k is None else s[:k]

    def covariance_estimate(self) -> np.ndarray:
        """B^T B — spectral-norm within squared_frobenius/ell of
        A^T A, one-sided (never overestimates a direction)."""
        if self.B is None:
            return np.zeros((0, 0))
        Bl = self.B[:self.n_buf]
        return Bl.T @ Bl

    def error_bound(self) -> float:
        """Worst-case spectral error ||A^T A - B^T B||_2 bound.

        ``shrink_total`` is the realized bound (exact bookkeeping of
        applied shrinkage); ``squared_frobenius / ell`` is the a-priori
        published bound — realized <= published always."""
        return self.squared_frobenius / self.ell if self.ell else 0.0

    def estimate(self) -> float:
        """Finalizer contract alias: top singular value estimate."""
        s = self.singular_values(1)
        return float(s[0]) if s.size else 0.0

    # -- wire ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        d = self.d or 0
        live = self.B[:self.n_buf] if self.B is not None else np.zeros((0, 0))
        head = struct.pack("<BIIIddq", 1, self.ell, d, self.n_buf,
                           self.squared_frobenius, self.shrink_total,
                           self.n_rows)
        return head + np.ascontiguousarray(live, dtype=np.float64).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FrequentDirections":
        ver, ell, d, n_buf, sqf, shr, n_rows = struct.unpack_from(
            "<BIIIddq", blob)
        off = struct.calcsize("<BIIIddq")
        sk = cls(ell=ell, d=d if d else None,
                 squared_frobenius=sqf, n_rows=n_rows, shrink_total=shr)
        if d:
            sk.B = np.zeros((2 * ell, d), dtype=np.float64)
            live = np.frombuffer(blob, dtype=np.float64, offset=off)
            if n_buf:
                sk.B[:n_buf] = live.reshape(n_buf, d)
            sk.n_buf = n_buf
        return sk
