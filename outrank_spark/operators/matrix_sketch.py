"""Distributed matrix sketching over embedding columns.

The reference has no embedding/matrix layer; this is a sketch-tier
extension in the same mergeable-UDAF shape as ``sketch_build``: each
partition folds its ``array<float>`` rows into a Frequent Directions
sketch in ONE ``mapInPandas`` pass (Arrow list columns -> one
``np.vstack`` per batch — no per-row Python), ships an ``ell x d`` blob
(tens of KB), and the partials merge associatively.

Scale story (100 TB / 10^12 rows): the scan is embarrassingly parallel
and the only data movement is P blob rows of ~``2*ell*d*8`` bytes —
for ell=64, d=768 that is ~0.8 MB per partition, so even 100k
partitions ship ~80 GB of *sketch* state through the grouped/tree
merge, never the corpus.  With the default ``merge="tree"`` the reduce
is log-depth (treeAggregate), matching the north rule's treeReduce
requirement; ``merge="driver"`` is for small partition counts where a
single collect of blobs is cheaper than an extra stage.

What you get at the end for ell*d floats of driver state:

* ``covariance_estimate()`` — B^T B within ||A||_F^2/ell of A^T A in
  spectral norm, one-sided (never over-claims a direction's energy);
* top singular values / effective rank of the corpus embedding matrix
  (PCA-subspace quality, intrinsic-dimension probes for SemDeDup /
  IVF cell-count sizing);
* exact ||A||_F^2 and row count (tracked additively alongside).
"""
from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from outrank_spark.sketches import FrequentDirections, sketch_from_bytes

__all__ = ["frequent_directions", "embedding_spectrum"]

_BLOB_SCHEMA = "blob binary"


def frequent_directions(df, vec_col: str = "embedding", ell: int = 64,
                        merge: str = "tree") -> FrequentDirections:
    """One-scan distributed FD sketch of ``df[vec_col]`` (array<float>).

    Null vectors are skipped (a missing embedding contributes no row —
    same convention as the 1-D sketches' ``dropna``).
    """

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = FrequentDirections(ell=ell)
        saw = False
        for pdf in batches:
            col = pdf.iloc[:, 0].dropna()
            if not len(col):
                continue
            saw = True
            sk.update(np.vstack(col.to_numpy()))
        if saw:
            yield pd.DataFrame({"blob": [sk.to_bytes()]})

    blobs = df.select(vec_col).mapInPandas(partial, schema=_BLOB_SCHEMA)

    if merge == "tree":
        rdd = blobs.rdd.map(lambda r: bytes(r["blob"]))
        n_parts = max(rdd.getNumPartitions(), 2)
        depth = max(2, int(math.ceil(math.log(n_parts, 4))))

        def comb(a: bytes | None, b: bytes | None) -> bytes | None:
            if not a:
                return b
            if not b:
                return a
            return (sketch_from_bytes("fd", a)
                    .merge(sketch_from_bytes("fd", b)).to_bytes())

        final = rdd.treeAggregate(None, comb, comb, depth=depth)
        return (sketch_from_bytes("fd", final) if final
                else FrequentDirections(ell=ell))

    if merge == "driver":
        acc = FrequentDirections(ell=ell)
        for row in blobs.collect():        # one blob per partition
            acc.merge(sketch_from_bytes("fd", bytes(row["blob"])))
        return acc

    raise ValueError(f"unknown merge strategy {merge!r}")


def embedding_spectrum(df, vec_col: str = "embedding", ell: int = 64,
                       top_k: int = 8, merge: str = "tree"):
    """Corpus embedding spectral profile as a small DataFrame.

    Rows: rank i -> estimated singular value (a certified LOWER bound
    on the true sigma_i), the per-direction energy gap bound, plus the
    exact ``n_rows`` / ``frobenius_sq`` bookkeeping and the fraction of
    total energy the top-i directions certifiably capture — the number
    an IVF/SemDeDup planner reads to size its cell count.
    """
    sk = frequent_directions(df, vec_col=vec_col, ell=ell, merge=merge)
    s = sk.singular_values(top_k)
    bound = sk.error_bound()
    total = sk.squared_frobenius or 1.0
    rows, cum = [], 0.0
    for i, sv in enumerate(s, start=1):
        cum += float(sv) ** 2
        rows.append((i, float(sv), float(bound),
                     int(sk.n_rows), float(sk.squared_frobenius),
                     float(cum / total)))
    return df.sparkSession.createDataFrame(
        rows,
        "rank int, sigma_lower double, energy_gap_bound double, "
        "n_rows long, frobenius_sq double, energy_captured_frac double",
    )
