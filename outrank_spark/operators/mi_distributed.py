"""Distributed exact mutual information over column pairs — one scan.

The reference computes MI on *sampled minibatches* (a pandas/numba
kernel over batch-local category codes, reference
ranking_mi_numba.py:151-177); SURVEY.md §7.4 notes that a distributed
whole-table MI needs a contingency-table formulation.  This operator
is that formulation, Spark-first:

- ALL requested pairs share ONE scan and ONE shuffle via
  ``GROUP BY GROUPING SETS`` (each pair is one grouping set), so k
  pairs do not cost k passes over a 100 TB table.
- marginal counts are recovered from the joint cells with window sums
  (the aggregated cell table is tiny relative to the input — bounded
  by Σ per-pair joint cardinality), never a second scan.
- every entropy is a sum of per-joint-cell terms:
  H(A) = −Σ_cells (c/n)·ln(ca/n) because Σ_b c(a,b) = c(a) — so MI,
  H(A), H(B), H(A,B) and NMI all come from one groupBy over cells.
- 100 % JVM expressions: no UDF, no Python on any executor.

Scale notes: the shuffle key is the grouping-set tuple, so skewed
values behave like any aggregation (AQE handles them); output size is
the number of distinct joint cells, which for categorical features is
≪ rows.  For *very* high-cardinality pairs (joint cells ~ rows) use
the sampled-batch MI path (operators/pair_scoring.py) instead — exact
MI over near-unique columns is ≈ ln(n) and not informative anyway.

MI here is the exact plug-in estimator in nats — numerically the same
quantity as functions/heuristics.exact_mi (tested equal), i.e. the
reference's ``MI`` heuristic (sklearn mutual_info_classif with
discrete features, reference importance_estimator.py:37-40) computed
on the WHOLE table instead of a sample.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from outrank_spark.hashing import qcol

__all__ = ["mi_contingency", "mi_table_scores", "ami_table_scores",
           "chi2_association"]

# sentinel so genuine data NULLs stay a distinct category (the
# reference's value domain is strings where '' is an ordinary value)
_NULL_SENTINEL = "␀null␀"


def _labelled_cells(df: DataFrame,
                    pairs: Sequence[tuple[str, str]]) -> DataFrame:
    """The shared joint-cell relation: (gid, feature_a, feature_b,
    va, vb, c) for every pair, from ONE grouping-sets scan."""
    # ordered union of all referenced columns = the grouping columns
    group_cols: list[str] = []
    for a, b in pairs:
        for c in (a, b):
            if c not in group_cols:
                group_cols.append(c)

    proj = df.select(*[
        F.coalesce(qcol(c).cast("string"), F.lit(_NULL_SENTINEL)).alias(c)
        for c in group_cols
    ])

    # one aggregate for every pair: GROUP BY GROUPING SETS((a,b), ...)
    sets = [sorted({a, b}, key=group_cols.index) for a, b in pairs]
    if len({tuple(s) for s in sets}) != len(sets):
        raise ValueError("duplicate column sets across pairs")
    cells = (
        proj.groupingSets([list(s) for s in sets], *group_cols)
        .agg(F.count(F.lit(1)).alias("c"),
             F.grouping_id().alias("gid"))
    )

    def _gid(s: list[str]) -> int:
        g = 0
        for i, c in enumerate(group_cols):
            if c not in s:
                g |= 1 << (len(group_cols) - 1 - i)
        return g

    gids = [_gid(s) for s in sets]

    # map each cell row back to (pair label, va, vb) with CASE chains —
    # one plan, no per-pair recompute of the aggregate
    def _case(values: list) -> F.Column:
        expr = None
        for g, v in zip(gids, values):
            expr = (F.when(F.col("gid") == g, v) if expr is None
                    else expr.when(F.col("gid") == g, v))
        return expr

    return cells.select(
        F.col("gid"),
        _case([F.lit(a) for a, _ in pairs]).alias("feature_a"),
        _case([F.lit(b) for _, b in pairs]).alias("feature_b"),
        _case([F.col(a) for a, _ in pairs]).alias("va"),
        _case([F.col(b) for _, b in pairs]).alias("vb"),
        F.col("c").cast("double").alias("c"),
    ).where(F.col("feature_a").isNotNull())


def mi_contingency(df: DataFrame, pairs: Sequence[tuple[str, str]],
                   decimals: int | None = None,
                   cells: DataFrame | None = None) -> DataFrame:
    """Exact MI / entropies / NMI for each column pair, one scan.

    Returns (feature_a, feature_b, n, h_a, h_b, h_ab, mi, nmi) with one
    row per input pair.  ``decimals`` optionally rounds the float
    columns (useful for cross-engine comparison).  ``cells`` accepts a
    pre-built (possibly persisted) :func:`_labelled_cells` relation so
    callers computing several statistics share the scan.
    """
    pairs = list(dict.fromkeys((a, b) for a, b in pairs))
    if not pairs:
        raise ValueError("mi_contingency needs at least one pair")
    labelled = cells if cells is not None else _labelled_cells(df, pairs)

    w_pair = Window.partitionBy("gid")
    w_a = Window.partitionBy("gid", "va")
    w_b = Window.partitionBy("gid", "vb")
    terms = labelled.select(
        "feature_a", "feature_b", "c",
        F.sum("c").over(w_pair).alias("n"),
        F.sum("c").over(w_a).alias("ca"),
        F.sum("c").over(w_b).alias("cb"),
    )

    p = F.col("c") / F.col("n")
    agg = (
        terms.groupBy("feature_a", "feature_b")
        .agg(
            F.first("n").cast("long").alias("n"),
            (-F.sum(p * F.log(F.col("ca") / F.col("n")))).alias("h_a"),
            (-F.sum(p * F.log(F.col("cb") / F.col("n")))).alias("h_b"),
            (-F.sum(p * F.log(p))).alias("h_ab"),
            F.sum(
                p * F.log(F.col("c") * F.col("n")
                          / (F.col("ca") * F.col("cb"))),
            ).alias("mi"),
        )
        .withColumn(
            "nmi",
            F.when(F.col("h_a") * F.col("h_b") > 0,
                   F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b")))
            .otherwise(F.lit(0.0)),
        )
    )
    if decimals is not None:
        for c in ("h_a", "h_b", "h_ab", "mi", "nmi"):
            agg = agg.withColumn(c, F.round(F.col(c), decimals))
    return agg


def ami_table_scores(df: DataFrame, pairs: Sequence[tuple[str, str]],
                     max_cardinality: int = 20_000,
                     decimals: int | None = None) -> DataFrame:
    """Whole-table exact adjusted MI per pair: AMI_max = (MI − E[MI])
    / (max(H_a, H_b) − E[MI]) with the exact hypergeometric E[MI]
    (Vinh, Epps, Bailey JMLR 2010).

    MI and the entropies come from the distributed contingency plan;
    E[MI] needs the per-pair MARGINAL count vectors, which are
    collected to the driver (size = cardinality_a + cardinality_b per
    pair, guarded by ``max_cardinality``) and fed to the same numpy
    kernel the batch AMI heuristic uses — the joint table is never
    collected.
    """
    from outrank_spark.functions.heuristics import _expected_mi

    pairs = list(dict.fromkeys((a, b) for a, b in pairs))
    labelled = _labelled_cells(df, pairs).persist()
    try:
        base = mi_contingency(df, pairs, cells=labelled).toPandas()
        marg_a = (
            labelled.groupBy("feature_a", "feature_b", "va")
            .agg(F.sum("c").alias("ca")).toPandas()
        )
        marg_b = (
            labelled.groupBy("feature_a", "feature_b", "vb")
            .agg(F.sum("c").alias("cb")).toPandas()
        )
    finally:
        labelled.unpersist()
    import numpy as np

    amis = []
    for _, row in base.iterrows():
        key = (row["feature_a"], row["feature_b"])
        a = marg_a[(marg_a["feature_a"] == key[0])
                   & (marg_a["feature_b"] == key[1])]["ca"]
        b = marg_b[(marg_b["feature_a"] == key[0])
                   & (marg_b["feature_b"] == key[1])]["cb"]
        if len(a) > max_cardinality or len(b) > max_cardinality:
            raise ValueError(
                f"pair {key} exceeds max_cardinality={max_cardinality}; "
                "use the sampled AMI heuristic for near-unique columns",
            )
        n = int(row["n"])
        emi = _expected_mi(a.to_numpy().astype(np.int64),
                           b.to_numpy().astype(np.int64), n)
        h_max = max(row["h_a"], row["h_b"])
        if h_max == 0.0:
            ami = 1.0
        elif h_max - emi == 0.0:
            ami = 0.0
        else:
            ami = (row["mi"] - emi) / (h_max - emi)
        amis.append(float(ami))
    base["ami"] = amis
    if decimals is not None:
        base["ami"] = base["ami"].round(decimals)
    spark = df.sparkSession
    return spark.createDataFrame(
        base[["feature_a", "feature_b", "n", "mi", "ami"]],
    )


def mi_table_scores(df: DataFrame, pairs: Sequence[tuple[str, str]],
                    chunk: int = 64) -> DataFrame:
    """(feature_a, feature_b, score) with score = whole-table exact MI.

    Grouping-sets Expand multiplies every input row by the number of
    sets BEFORE partial aggregation — the same total work as one
    groupBy per pair, but sharing a single scan.  ``chunk`` bounds that
    expand factor: pairs are processed in chunks of <= ``chunk`` sets,
    one job each, unioned.  Duplicate unordered column sets are scored
    once and emitted under the first orientation seen.
    """
    uniq: dict[frozenset, tuple[str, str]] = {}
    for a, b in pairs:
        uniq.setdefault(frozenset((a, b)), (a, b))
    todo = list(uniq.values())
    out = None
    for i in range(0, len(todo), max(chunk, 1)):
        part = mi_contingency(df, todo[i:i + chunk]).select(
            "feature_a", "feature_b", F.col("mi").alias("score"),
        )
        out = part if out is None else out.union(part)
    return out


def chi2_association(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square + Cramér's V between two categorical
    columns — the classical contingency-test companion to the MI
    family (same distributed shape as :func:`mi_contingency`: one
    grouped count builds the table, margins come from re-aggregation,
    nothing collects).  Zero observed cells of the full level grid
    contribute their expected mass (the (0−e)²/e = e terms), so the
    statistic is the textbook one, not a sparse approximation.

    Returns one row ``(chi2, dof, cramers_v, n)``; rows with a null
    in either column are dropped (a null level is better modeled
    explicitly with coalesce upstream).  Scale: the shuffles are the
    observed-cell count (≤ r·c rows after map-side combine) and two
    margin re-aggregations; the full grid is a join of the two margin
    tables — r·c cells is the statistic's own size, never the fact
    table squared.
    """
    obs = (
        df.select(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    ra = obs.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cb = obs.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    tot = obs.agg(F.sum("__o").alias("__n"),
                  F.countDistinct("__a").alias("__r"),
                  F.countDistinct("__b").alias("__c"))
    grid = (
        ra.crossJoin(cb)
        .join(obs, ["__a", "__b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.coalesce("__o", F.lit(0))
              - F.col("__ra") * F.col("__cb") / F.col("__n")) ** 2
             / (F.col("__ra") * F.col("__cb") / F.col("__n")))
            .alias("__cell"),
            "__n", "__r", "__c",
        )
    )
    return grid.groupBy("__n", "__r", "__c").agg(
        F.sum("__cell").alias("chi2"),
    ).select(
        "chi2",
        ((F.col("__r") - 1) * (F.col("__c") - 1)).alias("dof"),
        F.sqrt(
            F.col("chi2")
            / (F.col("__n") * F.least(F.col("__r") - 1,
                                      F.col("__c") - 1)),
        ).alias("cramers_v"),
        F.col("__n").alias("n"),
    )
