"""Distribution-drift detection between table snapshots (PSI).

A 10^12-page pipeline re-crawls continuously; the question "did this
month's corpus shift under my feature distributions?" is monitored
with the Population Stability Index (the standard credit-scoring /
ML-monitoring drift metric): bin the REFERENCE snapshot at its own
quantiles, share-compare the CURRENT snapshot in those bins,
``PSI = Σ (p_cur − p_ref) · ln(p_cur / p_ref)``.  Rule-of-thumb
thresholds: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.

Scale shape: boundaries are ``bins − 1`` doubles from the exact
two-pass order-statistic selection (operators/quantiles — no group
ever buffers in one task), held driver-side as metadata and inlined
into a JVM ``filter`` lambda — binning is a zero-shuffle scan
expression; each side then pays ONE tiny groupBy(bin) aggregate
(≤ ``bins`` rows).  Boundaries are rounded (``boundary_scale``) so
the q89 DuckDB oracle bins identically: both engines compare with
strict ``v > b`` against byte-identical rounded edges, so a value
ULP-close to an edge cannot bin differently cross-engine.

There is no reference-repo counterpart; this is a north-rule
operations operator (the numeric companion to the rare-value and
repetition profile reports).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["psi_drift", "psi_bin_edges", "psi_bin_counts",
           "psi_from_counts", "ks_drift", "jsd_categorical"]


def psi_bin_edges(ref: DataFrame, value_col: str, bins: int = 10,
                  boundary_scale: int = 6) -> list[float]:
    """The ``bins - 1`` reference quantile edges psi_drift bins
    against: exact two-pass selection, HALF_UP-rounded to
    ``boundary_scale`` dp (the cross-engine parity convention — see
    the module docstring).  Factored out so a streaming monitor can
    freeze the reference edges once and bin every micro-batch with
    the IDENTICAL expression."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    from outrank_spark.operators.discretize import _round_half_up
    from outrank_spark.operators.quantiles import exact_grouped_quantiles

    probs = [i / bins for i in range(1, bins)]
    bnd = exact_grouped_quantiles(
        ref.select(F.lit("*").alias("__g"),
                   F.col(value_col).alias("__v")),
        "__g", "__v", probs,
    )
    if bnd.empty:
        raise ValueError("reference snapshot has no non-null values")
    return [_round_half_up(float(v), boundary_scale)
            for v in bnd.iloc[0, 1:].tolist()]


def psi_bin_counts(df: DataFrame, value_col: str,
                   edges: list[float]) -> dict[int, int]:
    """Per-bin non-null counts of ``df[value_col]`` against frozen
    ``edges`` — the same strict ``v > b`` JVM filter expression
    psi_drift uses, collected as a <= bins-row metadata dict."""
    arr = F.array(*[F.lit(e) for e in edges])
    rows = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .where(F.col("__v").isNotNull())
        .select((F.size(F.filter(arr, lambda b: F.col("__v") > b)) + 1)
                .alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    return {int(r["bin"]): int(r["__n"]) for r in rows}


def psi_from_counts(spark, ref_counts: dict[int, int],
                    cur_counts: dict[int, int], bins: int,
                    eps: float = 1e-6) -> DataFrame:
    """PSI report from two per-bin count dicts — the SAME output
    schema, shares, and psi_term arithmetic as :func:`psi_drift`
    (shares and terms are computed as Spark double expressions, so a
    streaming monitor's report is bitwise-equal to the batch run
    over the identical rows)."""
    rt = sum(ref_counts.values())
    ct = sum(cur_counts.values())
    if ct == 0:
        raise ValueError("current snapshot has no non-null values — "
                         "an all-empty cur would read as maximal "
                         "drift instead of a data bug")
    out = spark.createDataFrame(
        [(b, int(ref_counts.get(b, 0)), int(cur_counts.get(b, 0)))
         for b in range(1, bins + 1)],
        "bin int, __rn long, __cn long",
    ).select(
        "bin",
        (F.col("__rn") / F.lit(float(rt))).alias("ref_share"),
        (F.col("__cn") / F.lit(float(ct))).alias("cur_share"),
    )
    return _psi_finalize(out, eps)


def _psi_finalize(out: DataFrame, eps: float) -> DataFrame:
    lg = F.log(F.greatest(F.col("cur_share"), F.lit(eps))
               / F.greatest(F.col("ref_share"), F.lit(eps)))
    return out.select(
        "bin", "ref_share", "cur_share",
        ((F.col("cur_share") - F.col("ref_share")) * lg)
        .alias("psi_term"),
    )


def psi_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              bins: int = 10, eps: float = 1e-6,
              boundary_scale: int = 6) -> DataFrame:
    """Per-bin PSI terms between ``ref`` and ``cur`` on ``value_col``.

    Returns ``(bin, ref_share, cur_share, psi_term)`` with ``bins``
    rows; ``sum(psi_term)`` is the PSI.  Bin ``i`` covers
    ``(b_{i-1}, b_i]`` over the reference's ``i/bins`` quantile edges
    (right-closed; below-min goes to bin 1, above-max to bin
    ``bins``).  Empty-bin shares are clamped at ``eps`` inside the
    log, the standard PSI smoothing.  Nulls are ignored on both
    sides (the quantile convention).
    """
    # HALF_UP-rounded exact-quantile edges (psi_bin_edges): DuckDB
    # rounds half AWAY from zero, and a builtin-round edge on a 6-dp
    # half-tie (e.g. 5.65e-05) would differ by 1e-6 cross-engine,
    # re-binning every value in the gap (the q69 parity convention)
    edges = psi_bin_edges(ref, value_col, bins, boundary_scale)
    if cur.select(value_col).where(F.col(value_col).isNotNull()).isEmpty():
        raise ValueError("current snapshot has no non-null values — "
                         "an all-empty cur would read as maximal "
                         "drift instead of a data bug")
    arr = F.array(*[F.lit(e) for e in edges])
    spark = ref.sparkSession

    def shares(df: DataFrame, name: str) -> DataFrame:
        binned = (
            df.select(F.col(value_col).cast("double").alias("__v"))
            .where(F.col("__v").isNotNull())
            .select(
                (F.size(F.filter(arr, lambda b: F.col("__v") > b)) + 1)
                .alias("bin"),
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        total = binned.agg(F.sum("__n").alias("__t"))
        return (
            binned.crossJoin(F.broadcast(total))
            .select("bin", (F.col("__n") / F.col("__t")).alias(name))
        )

    all_bins = spark.range(1, bins + 1).select(
        F.col("id").cast("int").alias("bin"),
    )
    r = shares(ref, "ref_share")
    c = shares(cur, "cur_share")
    out = (
        all_bins.join(r, "bin", "left").join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_share", F.lit(0.0)).alias("ref_share"),
            F.coalesce("cur_share", F.lit(0.0)).alias("cur_share"),
        )
    )
    return _psi_finalize(out, eps)


def ks_drift(ref: DataFrame, cur: DataFrame, value_col: str,
             num_partitions: int | None = None) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between two
    snapshots: ``D = sup_x |F_ref(x) − F_cur(x)|`` — the sharper
    companion to :func:`psi_drift` (PSI summarizes shift magnitude in
    coarse bins; KS is the classical distribution-equality test
    statistic evaluated at every observed point).

    Distributed exactly, never one global sort task: both sides are
    tagged, unioned, and range-partitioned by value (the
    operators/quantiles two-pass shape minus its partition sort —
    order matters only inside pass 2's pandas groupby); pass 1 is a
    metadata scan of per-partition side counts, whose cumulative
    offsets make each partition's local ECDF globally positioned, so
    pass 2 computes every partition's candidate supremum
    independently and only the per-partition maxima (one tiny row
    each) reach the driver.  Ties are safe: a range partitioner maps
    equal values to one partition, and the ECDF is evaluated after
    each distinct value's full tie group.  Returns one row
    ``(ks_stat, n_ref, n_cur)``.
    """
    from typing import Iterator

    import pandas as pd

    spark = ref.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    tagged = (
        ref.select(F.col(value_col).cast("double").alias("__v"),
                   F.lit(1).alias("__r"), F.lit(0).alias("__c"))
        .unionByName(
            cur.select(F.col(value_col).cast("double").alias("__v"),
                       F.lit(0).alias("__r"), F.lit(1).alias("__c")))
        .where(F.col("__v").isNotNull())
        # range partitioning only — no sortWithinPartitions: pass 1
        # ignores row order and pass 2's pandas groupby(sort=True)
        # orders the distinct values itself (unlike quantiles, where
        # the partition sort is load-bearing for offset-based picks)
        .repartitionByRange(n_part, "__v")
        .persist()
    )
    try:
        def counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            r = c = 0
            for pdf in batches:
                r += int(pdf["__r"].sum())
                c += int(pdf["__c"].sum())
            if r or c:
                yield pd.DataFrame({"pid": [pid], "r": [r], "c": [c]})

        meta = tagged.mapInPandas(counts, "pid int, r long, c long") \
            .toPandas().sort_values("pid")
        R, C = int(meta["r"].sum()), int(meta["c"].sum())
        if R == 0 or C == 0:
            raise ValueError("both snapshots need non-null values "
                             f"(got n_ref={R}, n_cur={C})")
        meta["off_r"] = meta["r"].cumsum() - meta["r"]
        meta["off_c"] = meta["c"].cumsum() - meta["c"]
        offsets = {int(p): (int(a), int(b)) for p, a, b in
                   meta[["pid", "off_r", "off_c"]].itertuples(index=False)}

        def local_max(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            parts = [pdf for pdf in batches if len(pdf)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            off_r, off_c = offsets.get(pid, (0, 0))
            g = pdf.groupby("__v", sort=True)[["__r", "__c"]].sum()
            fr = (g["__r"].cumsum() + off_r) / R
            fc = (g["__c"].cumsum() + off_c) / C
            yield pd.DataFrame({"d": [float((fr - fc).abs().max())]})

        d = tagged.mapInPandas(local_max, "d double") \
            .agg(F.max("d").alias("d")).first()["d"]
    finally:
        tagged.unpersist()
    return spark.createDataFrame(
        [(float(d), R, C)], "ks_stat double, n_ref long, n_cur long")


def jsd_categorical(ref: DataFrame, cur: DataFrame,
                    key_col: str) -> DataFrame:
    """Jensen–Shannon divergence (base-2, so 0 ≤ JSD ≤ 1) between two
    snapshots' CATEGORICAL distributions — vocabulary/topic/source
    drift, where :func:`psi_drift`/:func:`ks_drift` cover numeric
    columns.  ``JSD = 0.5·KL(p‖m) + 0.5·KL(q‖m)`` with
    ``m = (p+q)/2``; symmetric, finite for disjoint supports (unlike
    KL), the standard corpus-comparison divergence.

    One tagged union + ONE groupBy(key) computes both count vectors
    (the dsir single-scan trick); shares and the per-key terms are
    JVM expressions; a final tiny aggregate ships one row
    ``(jsd, n_keys, n_ref, n_cur)``.  Keys absent on one side
    contribute their exact limit terms (p·log2(p/m) with q = 0 —
    coalesced counts, no eps clamping needed because m > 0 whenever
    a key exists).  Nulls are dropped on both sides.
    """
    tagged = (
        ref.select(F.col(key_col).alias("__k"),
                   F.lit(1).alias("__r"), F.lit(0).alias("__c"))
        .unionByName(
            cur.select(F.col(key_col).alias("__k"),
                       F.lit(0).alias("__r"), F.lit(1).alias("__c")))
        .where(F.col("__k").isNotNull())
    )
    counts = tagged.groupBy("__k").agg(
        F.sum("__r").alias("__nr"), F.sum("__c").alias("__nc"),
    )
    tot = counts.agg(F.sum("__nr").alias("__R"),
                     F.sum("__nc").alias("__C"))
    ln2 = 0.6931471805599453
    shares = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            (F.col("__nr") / F.col("__R")).alias("p"),
            (F.col("__nc") / F.col("__C")).alias("q"),
            "__nr", "__nc", "__R", "__C",
        )
        .withColumn("m", (F.col("p") + F.col("q")) / 2)
        .select(
            (F.when(F.col("p") > 0,
                    F.col("p") * F.log(F.col("p") / F.col("m")))
             .otherwise(0.0) / ln2 / 2
             + F.when(F.col("q") > 0,
                      F.col("q") * F.log(F.col("q") / F.col("m")))
             .otherwise(0.0) / ln2 / 2).alias("term"),
            "__R", "__C",
        )
    )
    return shares.groupBy("__R", "__C").agg(
        F.sum("term").alias("jsd"),
        F.count(F.lit(1)).alias("n_keys"),
    ).select(
        "jsd", "n_keys",
        F.col("__R").alias("n_ref"), F.col("__C").alias("n_cur"),
    )
