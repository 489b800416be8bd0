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

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["target_encoding_table", "target_encode", "count_encode",
           "quantile_normalize"]


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


def quantile_normalize(df: DataFrame, value_col: str,
                       by: str | None = None,
                       out_col: str | None = None) -> DataFrame:
    """Append ``out_col`` (default ``<value_col>_qnorm``): the
    value's percent-rank within its ``by`` group (globally when
    None), i.e. the empirical CDF mapped to [0, 1] with SQL
    PERCENT_RANK tie semantics — every member of a tie group gets
    the group's MIN rank, ``(rank - 1) / (n - 1)``; a single-row
    group gets 0.0.  Rank-based (quantile) normalization is the
    standard heavy-tail flattener for web features (doc lengths,
    link counts, dwell times), invariant to any monotone transform
    of the input.  Null values pass through with a null rank rather
    than polluting the CDF.

    Scale shape (100 TB): the naive ``percent_rank() OVER
    (PARTITION BY by ORDER BY v)`` puts an entire group in ONE task —
    a non-starter globally.  This implementation ranks the DISTINCT
    VALUE table instead: ``groupBy(by, v).count()`` (map-side
    combinable; |distinct values| rows, orders of magnitude smaller
    than the corpus), a running-sum window over that compact table
    to get each value's below-count, then a hash join back on
    ``(by, v)``.  The window still serializes per group, but over
    distinct values only — bounded by value cardinality, not corpus
    size.  For truly unbounded continuous domains, the sketch path
    is ``sketch_build.grouped_quantiles`` (KLL CDF at eps rank
    error); this operator is the EXACT path.
    """
    out_col = out_col or f"{value_col}_qnorm"
    keys = [by] if by is not None else []
    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(value_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = (Window.partitionBy(*keys) if keys
          else Window.partitionBy())
    ranked = counts.select(
        *keys, value_col,
        (F.sum("_cnt").over(w) - F.col("_cnt")).alias("_below"),
        F.sum("_cnt").over(wg).alias("_n"),
    ).select(
        *keys, value_col,
        F.when(F.col("_n") > 1,
               F.col("_below") / (F.col("_n") - 1))
         .otherwise(F.lit(0.0)).alias(out_col),
    )
    join_keys = keys + [value_col]
    return df.join(ranked, join_keys, "left")
