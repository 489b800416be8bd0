"""Categorical feature encoders: smoothed target encoding and count
(frequency) encoding.

The feature-engineering companions to the ranking job: where
operators/transformers.py derives numeric features from numerics,
these derive numerics from CATEGORICALS — the high-cardinality
features (host, URL path, user id) that one-hot cannot touch at web
scale.  Smoothed target (mean) encoding is the classic of Micci-
Barreca (2001, "A preprocessing scheme for high-cardinality
categorical attributes"); count encoding is its label-free sibling.

    te(c) = (n_c * mean_c + s * mu) / (n_c + s)

— the per-category label mean shrunk toward the global mean ``mu``
with pseudo-count ``s``: rare categories get ~mu (no memorization),
frequent ones keep their own mean.

Scale shape (100 TB):
* one map-side-combinable ``groupBy(col).agg(count, sum)`` per
  encoded column — each mapping table is |categories| rows, tiny next
  to the corpus;
* the global mean is a 1-row aggregate broadcast into the mapping;
* the join back is an explicitly ``broadcast()`` hash join per
  column (null-safe on the key), so the fact table is NEVER shuffled
  — the plan stays one scan + N broadcast joins.  If a column's
  category count genuinely exceeds broadcast size (rare even for
  hosts), pre-prune with the rare-value counter (sketches/rare.py)
  and let the tail fall back to ``mu``.

Leakage note: encoding the SAME rows the means were fit on leaks the
label; for training-set encoding use ``fit`` on one split and
``target_encode(..., mappings=...)`` on another (the mapping tables
are plain DataFrames — persist/reuse them), or cross-fold upstream.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["target_encoding_table", "target_encode", "count_encode"]


def target_encoding_table(df: DataFrame, cat_cols: list,
                          label_col: str,
                          smoothing: float = 20.0) -> DataFrame:
    """Mapping tables for every column, unioned:
    ``(feature, category, n, encoded)``.  ``category`` is stringified
    (null category kept as null — it is a legitimate level).  The
    encoded value is computed in doubles from exact (count, sum)
    aggregates, so it is reproducible across engines and partition
    counts."""
    if not cat_cols:
        raise ValueError("cat_cols must be non-empty")
    s = float(smoothing)
    glob = df.agg(
        F.sum(F.col(label_col).cast("double")).alias("_tot"),
        F.count(label_col).alias("_n"),
    ).select((F.col("_tot") / F.col("_n")).alias("_mu"))

    parts = []
    for c in cat_cols:
        m = (
            df.groupBy(F.col(c).cast("string").alias("category"))
            .agg(
                F.count(label_col).alias("n"),
                F.sum(F.col(label_col).cast("double")).alias("_sum"),
            )
            .crossJoin(F.broadcast(glob))
            .select(
                F.lit(c).alias("feature"),
                "category",
                "n",
                ((F.col("_sum") + F.lit(s) * F.col("_mu"))
                 / (F.col("n") + F.lit(s))).alias("encoded"),
            )
        )
        parts.append(m)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def target_encode(df: DataFrame, cat_cols: list, label_col: str,
                  smoothing: float = 20.0, suffix: str = "_te",
                  mappings: DataFrame | None = None) -> DataFrame:
    """Append ``<col><suffix>`` double columns.  ``mappings`` (from
    :func:`target_encoding_table`, possibly fit on a DIFFERENT split
    — see the leakage note) is reused when given; categories absent
    from the mapping fall back to the global mean implied by it
    (weighted mean of encoded values — exact, since encoded is a
    convex combination pivoting on mu)."""
    if mappings is None:
        mappings = target_encoding_table(df, cat_cols, label_col,
                                         smoothing)
    mappings = mappings.cache()
    # unseen-category fallback: mu is recovered EXACTLY from any one
    # feature's mapping — sum((n_c+s)*te_c) = sum(sum_c) + k*s*mu
    # = N*mu + k*s*mu, so the (n+s)-weighted mean of te is mu.
    one = mappings.where(
        F.col("feature") == F.lit(cat_cols[0]))
    mu_row = one.agg(
        (F.sum(F.col("encoded") * (F.col("n") + F.lit(float(smoothing))))
         / F.sum(F.col("n") + F.lit(float(smoothing)))).alias("mu"),
    ).first()
    mu = float(mu_row["mu"]) if mu_row["mu"] is not None else 0.0

    out = df
    for c in cat_cols:
        m = (
            mappings.where(F.col("feature") == F.lit(c))
            .select(F.col("category").alias("_k"),
                    F.col("encoded").alias(f"{c}{suffix}"))
        )
        out = (
            out.join(F.broadcast(m),
                     out[c].cast("string").eqNullSafe(m["_k"]),
                     "left")
            .drop("_k")
            .withColumn(f"{c}{suffix}",
                        F.coalesce(F.col(f"{c}{suffix}"), F.lit(mu)))
        )
    return out


def count_encode(df: DataFrame, cat_cols: list,
                 suffix: str = "_count") -> DataFrame:
    """Append ``<col><suffix>`` long columns: each category's
    occurrence count (label-free frequency encoding).  Same plan
    shape as target encoding: tiny per-column mapping tables,
    broadcast joins, fact table never shuffled."""
    out = df
    for c in cat_cols:
        m = (
            df.groupBy(F.col(c).cast("string").alias("_k"))
            .agg(F.count(F.lit(1)).alias(f"{c}{suffix}"))
        )
        out = (
            out.join(F.broadcast(m),
                     out[c].cast("string").eqNullSafe(m["_k"]),
                     "left")
            .drop("_k")
        )
    return out
