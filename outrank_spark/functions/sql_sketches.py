"""Sketches as registered Spark SQL aggregate/scalar functions.

The north rule asks for the sketch layer as "mergeable Arrow-batch
accumulators (applyInPandas / pandas UDAF)".  ``operators.
sketch_build`` is the applyInPandas path (partial per partition +
associative merge — the 100 TB shape).  This module is the *pandas
UDAF* path: the same kernels exposed to plain ``spark.sql`` text, so
an analyst can write

    SELECT lang, hll_estimate(hll_sketch(text)) AS distinct_texts
    FROM documents GROUP BY lang

and roll stored blobs UP a hierarchy without rescanning the base
table (the q87 algebra, now in SQL):

    SELECT tld, hll_estimate(hll_merge(blob)) FROM host_blobs GROUP BY tld

Scale note (honest): a GROUPED_AGG pandas UDF gives Spark no partial
aggregation — every group's raw values shuffle to one task before the
UDF sees them.  That is fine for blob *rollups* (inputs are already
KB-sized sketches, the whole point is the base table never rescans)
and for moderate-cardinality groups; for corpus-scale raw-value
sketching use ``build_sketches`` / ``build_grouped_sketches``, whose
map-side partials keep the shuffle at blob size.  Both paths produce
IDENTICAL sketches for the order-independent kinds (HLL register max,
Bloom OR, CMS/CountSketch add) — asserted bitwise in
tests/test_sql_sketches.py.

Spark restriction worth knowing: a grouped-agg pandas UDF cannot
appear in the same GROUP BY as a built-in JVM aggregate
(INVALID_PANDAS_UDF_PLACEMENT) — put the JVM aggregates in their own
grouping or include the functional columns in the GROUP BY key.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from outrank_spark.sketches import (BloomFilter, CountingBloomFilter,
                                    CountSketch, DDSketch, HyperLogLog,
                                    KLLSketch, SlidingHyperLogLog,
                                    ThetaSketch, sketch_from_bytes)

__all__ = ["register_sql_sketches"]


def register_sql_sketches(spark, hll_p: int = 14, kll_k: int = 200,
                          cs_depth: int = 5, cs_width: int = 2 ** 13,
                          bloom_capacity: int = 1_000_000,
                          bloom_fpr: float = 0.01,
                          dd_alpha: float = 0.01, theta_k: int = 4096,
                          shll_p: int = 12, prefix: str = "") -> list[str]:
    """Register the sketch UDAF/UDF family on ``spark``; returns the
    registered names.  Sketch parameters are fixed at registration
    (SQL functions can't take Python kwargs); register a second
    configuration under its own ``prefix`` (e.g. ``prefix="small_"``
    gives ``small_hll_sketch`` etc.) without disturbing the first."""
    from pyspark.sql.functions import pandas_udf

    # -- aggregates: raw values -> sketch blob -------------------------
    @pandas_udf("binary")
    def hll_sketch(v: pd.Series) -> bytes:
        return HyperLogLog(p=hll_p).update(v.dropna().to_numpy()).to_bytes()

    @pandas_udf("binary")
    def kll_sketch(v: pd.Series) -> bytes:
        vals = pd.to_numeric(v, errors="coerce").dropna().to_numpy()
        return KLLSketch(k=kll_k).update(vals).to_bytes()

    @pandas_udf("binary")
    def countsketch_sketch(v: pd.Series) -> bytes:
        return (CountSketch(depth=cs_depth, width=cs_width)
                .update(v.dropna().to_numpy()).to_bytes())

    @pandas_udf("binary")
    def bloom_sketch(v: pd.Series) -> bytes:
        return (BloomFilter(capacity=bloom_capacity, fpr=bloom_fpr)
                .update(v.dropna().to_numpy()).to_bytes())

    @pandas_udf("binary")
    def ddsketch_sketch(v: pd.Series) -> bytes:
        vals = pd.to_numeric(v, errors="coerce").dropna().to_numpy()
        return DDSketch(alpha=dd_alpha).update(vals).to_bytes()

    @pandas_udf("binary")
    def theta_sketch(v: pd.Series) -> bytes:
        return (ThetaSketch(k=theta_k)
                .update(v.dropna().to_numpy()).to_bytes())

    @pandas_udf("binary")
    def shll_sketch(v: pd.Series, ts: pd.Series) -> bytes:
        ok = v.notna() & ts.notna()
        return SlidingHyperLogLog(p=shll_p).update(
            v[ok].to_numpy(),
            pd.to_numeric(ts[ok], errors="coerce").to_numpy(
                dtype="float64")).to_bytes()

    @pandas_udf("binary")
    def cbf_sketch(v: pd.Series, delta: pd.Series) -> bytes:
        sk = CountingBloomFilter(capacity=bloom_capacity, fpr=bloom_fpr)
        ok = v.notna()
        vals = v[ok].to_numpy(dtype=object)
        d = pd.to_numeric(delta[ok], errors="coerce").to_numpy()
        if (d > 0).any():
            sk.add(vals[d > 0])
        if (d < 0).any():
            sk.remove(vals[d < 0])
        return sk.to_bytes()

    # -- aggregates: blobs -> merged blob (the SQL rollup algebra) -----
    def _merge_agg(kind: str):
        @pandas_udf("binary")
        def merge_blobs(b: pd.Series) -> bytes:
            acc = None
            for blob in b.dropna():
                sk = sketch_from_bytes(kind, bytes(blob))
                acc = sk if acc is None else acc.merge(sk)
            return acc.to_bytes() if acc is not None else None
        return merge_blobs

    # -- scalars: blob -> answer (vectorized over blob columns) --------
    @pandas_udf("double")
    def hll_estimate(b: pd.Series) -> pd.Series:
        return b.map(lambda x: float(
            sketch_from_bytes("hll", bytes(x)).estimate())
            if x is not None else None)

    @pandas_udf("double")
    def kll_quantile(b: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series([
            float(sketch_from_bytes("kll", bytes(x)).quantile(float(qq)))
            if x is not None else None
            for x, qq in zip(b, q)])

    @pandas_udf("double")
    def countsketch_f2(b: pd.Series) -> pd.Series:
        return b.map(lambda x: sketch_from_bytes(
            "countsketch", bytes(x)).f2_estimate()
            if x is not None else None)

    @pandas_udf("double")
    def ddsketch_quantile(b: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series([
            float(sketch_from_bytes(
                "ddsketch", bytes(x)).quantile(float(qq)))
            if x is not None else None
            for x, qq in zip(b, q)])

    @pandas_udf("double")
    def theta_estimate(b: pd.Series) -> pd.Series:
        return b.map(lambda x: float(
            sketch_from_bytes("theta", bytes(x)).estimate())
            if x is not None else None)

    @pandas_udf("double")
    def shll_estimate(b: pd.Series, ts_from: pd.Series) -> pd.Series:
        return pd.Series([
            float(sketch_from_bytes("shll", bytes(x)).estimate(
                None if qq is None or pd.isna(qq) else float(qq)))
            if x is not None else None
            for x, qq in zip(b, ts_from)])

    @pandas_udf("boolean")
    def cbf_maybe_contains(b: pd.Series, v: pd.Series) -> pd.Series:
        out = np.zeros(len(v), dtype=object)
        keys = b.map(lambda x: bytes(x) if x is not None else None)
        for blob in keys.dropna().unique():
            sk = sketch_from_bytes("cbf", blob)
            idx = np.flatnonzero((keys == blob).to_numpy())
            if idx.size:
                out[idx] = sk.contains(v.iloc[idx].to_numpy())
        out[keys.isna().to_numpy()] = None
        return pd.Series(out, dtype=object)

    @pandas_udf("boolean")
    def bloom_maybe_contains(b: pd.Series, v: pd.Series) -> pd.Series:
        # one filter per DISTINCT blob per batch (typically 1): the
        # probe itself is vectorized numpy
        out = np.zeros(len(v), dtype=object)
        keys = b.map(lambda x: bytes(x) if x is not None else None)
        for blob in keys.dropna().unique():
            sk = sketch_from_bytes("bloom", blob)
            idx = np.flatnonzero((keys == blob).to_numpy())
            if idx.size:
                out[idx] = sk.contains(v.iloc[idx].to_numpy())
        out[keys.isna().to_numpy()] = None
        return pd.Series(out, dtype=object)

    regs = {
        "hll_sketch": hll_sketch,
        "hll_merge": _merge_agg("hll"),
        "hll_estimate": hll_estimate,
        "kll_sketch": kll_sketch,
        "kll_merge": _merge_agg("kll"),
        "kll_quantile": kll_quantile,
        "countsketch_sketch": countsketch_sketch,
        "countsketch_merge": _merge_agg("countsketch"),
        "countsketch_f2": countsketch_f2,
        "bloom_sketch": bloom_sketch,
        "bloom_merge": _merge_agg("bloom"),
        "bloom_maybe_contains": bloom_maybe_contains,
        "ddsketch_sketch": ddsketch_sketch,
        "ddsketch_merge": _merge_agg("ddsketch"),
        "ddsketch_quantile": ddsketch_quantile,
        "theta_sketch": theta_sketch,
        "theta_merge": _merge_agg("theta"),
        "theta_estimate": theta_estimate,
        "shll_sketch": shll_sketch,
        "shll_merge": _merge_agg("shll"),
        "shll_estimate": shll_estimate,
        "cbf_sketch": cbf_sketch,
        "cbf_merge": _merge_agg("cbf"),
        "cbf_maybe_contains": cbf_maybe_contains,
    }
    for name, fn in regs.items():
        spark.udf.register(prefix + name, fn)
    return [prefix + n for n in regs]
