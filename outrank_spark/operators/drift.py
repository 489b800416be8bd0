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

__all__ = ["psi_drift"]


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
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    from outrank_spark.operators.quantiles import exact_grouped_quantiles

    probs = [i / bins for i in range(1, bins)]
    bnd = exact_grouped_quantiles(
        ref.select(F.lit("*").alias("__g"),
                   F.col(value_col).alias("__v")),
        "__g", "__v", probs,
    )
    if bnd.empty:
        raise ValueError("reference snapshot has no non-null values")
    edges = [round(float(v), boundary_scale)
             for v in bnd.iloc[0, 1:].tolist()]
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
    lg = F.log(F.greatest(F.col("cur_share"), F.lit(eps))
               / F.greatest(F.col("ref_share"), F.lit(eps)))
    return out.select(
        "bin", "ref_share", "cur_share",
        ((F.col("cur_share") - F.col("ref_share")) * lg)
        .alias("psi_term"),
    )
