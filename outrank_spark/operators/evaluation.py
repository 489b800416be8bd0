"""Distributed-exact evaluation metrics for trained scorers.

A corpus-scale quality classifier (operators/quality_model.py) or any
heuristic scorer (operators/text.py) needs its discrimination measured
on held-out labels at the same scale it scores — collecting scores to
the driver for sklearn-style metrics is exactly the non-distributed
trap the rest of the engine avoids.

`roc_auc` computes the EXACT area under the ROC curve via the
Mann–Whitney identity

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg)
        = sum_s [ neg_below(s) * pos(s) + 0.5 * neg(s) * pos(s) ]
          / (P * N)

summed over distinct scores s — ties handled by the standard
average-rank convention, matching the textbook definition and any SQL
window-function oracle.

Distribution shape (the operators/drift.ks_drift two-pass pattern —
never one global sort task): range-partition by score, pass 1 collects
per-partition (pos, neg) counts (a tiny metadata row per partition)
whose cumulative offsets position every partition's local tally
globally, pass 2 computes each partition's contribution independently
and ships ONE number per partition to the driver.  A range partitioner
maps equal scores to one partition, so tie groups never straddle
partitions and the tie term is exact.

There is no reference-repo counterpart (the reference delegates model
quality to sklearn CV inside importance_estimator.py:42-53); this is a
north-rule training-data-pipeline operator.
"""
from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from outrank_spark.hashing import qcol, sql_ident, sql_str

__all__ = ["roc_auc", "calibration_report", "correlation_matrix",
           "spearman_correlation", "cuped_adjust", "srm_check",
           "bh_fdr", "retrieval_metrics", "isotonic_calibrate"]


def roc_auc(df: DataFrame, label_col: str, score_col: str,
            num_partitions: int | None = None) -> DataFrame:
    """Exact ROC AUC of ``score_col`` predicting binary ``label_col``
    (nonzero/true = positive).  Returns one row
    ``(auc, n_pos, n_neg)``.  Null scores and null labels are
    excluded; raises if either class is empty (AUC undefined).
    """
    import pandas as pd

    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    lab = F.col(label_col).cast("double")
    tagged = (
        df.select(
            F.col(score_col).cast("double").alias("__v"),
            F.when(lab != 0, F.lit(1)).otherwise(F.lit(0)).alias("__p"),
            F.when(lab != 0, F.lit(0)).otherwise(F.lit(1)).alias("__n"),
        )
        .where(F.col("__v").isNotNull() & lab.isNotNull())
        # range partitioning only — no partition sort: pass 1 ignores
        # row order and pass 2's pandas groupby(sort=True) orders the
        # distinct scores itself
        .repartitionByRange(n_part, "__v")
        .persist()
    )
    try:
        def counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            p = n = 0
            for pdf in batches:
                p += int(pdf["__p"].sum())
                n += int(pdf["__n"].sum())
            if p or n:
                yield pd.DataFrame({"pid": [pid], "p": [p], "n": [n]})

        meta = tagged.mapInPandas(counts, "pid int, p long, n long") \
            .toPandas().sort_values("pid")
        P, N = int(meta["p"].sum()), int(meta["n"].sum())
        if P == 0 or N == 0:
            raise ValueError(
                f"AUC needs both classes (got n_pos={P}, n_neg={N})")
        meta["off_n"] = meta["n"].cumsum() - meta["n"]
        offsets = {int(r.pid): int(r.off_n)
                   for r in meta.itertuples(index=False)}

        def contrib(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            parts = [pdf for pdf in batches if len(pdf)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            off_n = offsets.get(pid, 0)
            g = pdf.groupby("__v", sort=True)[["__p", "__n"]].sum()
            # negatives strictly below each distinct score, globally
            nb = g["__n"].cumsum() - g["__n"] + off_n
            u = float((nb * g["__p"]).sum()
                      + 0.5 * (g["__n"] * g["__p"]).sum())
            yield pd.DataFrame({"u": [u]})

        u = tagged.mapInPandas(contrib, "u double") \
            .agg(F.sum("u").alias("u")).first()["u"]
    finally:
        tagged.unpersist()
    return spark.createDataFrame(
        [(float(u) / (P * N), P, N)],
        "auc double, n_pos long, n_neg long",
    )


def calibration_report(df: DataFrame, label_col: str, prob_col: str,
                       n_bins: int = 10) -> DataFrame:
    """Reliability diagram data + Brier decomposition inputs: bucket
    predicted probabilities into ``n_bins`` fixed-width bins over
    [0, 1] and report, per bin, the count, the mean predicted
    probability, the observed positive rate, and the bin's summed
    squared error (its share of the corpus Brier score:
    ``sum(sq_err) / sum(n)`` across the rows is the Brier score).

    A well-calibrated scorer has ``frac_pos ~ mean_prob`` in every
    bin — the standard post-training check before a quality
    classifier's scores are used as sampling weights (a use where raw
    discrimination/AUC is not enough: the WEIGHTS must mean what they
    say).

    Scale shape: one JVM expression derives the bin, one
    map-side-combinable ``groupBy(bin)`` computes everything; no
    Python, no sort, output is <= n_bins rows.  Probabilities outside
    [0, 1] raise (they are a caller bug, not data noise).
    """
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("double")
    binned = (
        df.where(p.isNotNull() & y.isNotNull())
        .select(
            F.when((p < 0) | (p > 1), F.raise_error(
                F.concat(F.lit(f"{prob_col} outside [0, 1]: "),
                         p.cast("string"))))
            .otherwise(
                F.least(F.floor(p * n_bins).cast("int"),
                        F.lit(n_bins - 1)),
            ).alias("bin"),
            p.alias("__p"),
            F.when(y != 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("__y"),
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__p").alias("mean_prob"),
            F.avg("__y").alias("frac_pos"),
            F.sum((F.col("__p") - F.col("__y"))
                  * (F.col("__p") - F.col("__y"))).alias("sq_err"),
        )
        .orderBy("bin")
    )


def correlation_matrix(df: DataFrame, cols: list[str],
                       round_to: int | None = 6) -> DataFrame:
    """Pairwise Pearson correlation over the numeric ``cols``,
    returned long-form: one row per unordered pair ``(col_a, col_b,
    corr, n)`` with ``col_a < col_b`` lexically, ordered.  ``n`` is
    the pair's co-non-null count (pairwise deletion, the ``corr``
    aggregate's own null rule); a constant column yields a null corr
    (zero variance), never a division error.

    Scale shape (100 TB): ALL k*(k-1)/2 coefficients come from TWO
    scans — pass 1 is a 1-row column-means aggregate (the centering
    shift, collected as metadata), pass 2 a single hash-aggregate of
    the masked centered moments for every pair at once.  The fact
    table is never read per-pair (k^2/2 separate ``F.corr`` jobs
    would be k^2/2 scans), and the wide 1-row result is unpivoted
    with ``stack`` (metadata-sized).  Centering first is load-
    bearing twice over: (a) the textbook raw-sum identity loses ~6
    digits to cancellation when |mean| >> stddev (n*sum(x^2) and
    sum(x)^2 agree in their leading digits), and (b) Spark 4's ANSI
    mode makes the builtin ``corr`` raise DIVIDE_BY_ZERO outright on
    a zero-variance column, where this formulation when-guards the
    degenerate denominator into a null.  The shift needs only to be
    NEAR the mean (corr is shift-invariant), so the pairwise-deletion
    mask not matching pass 1's per-column null universe is harmless.

    Rounded to ``round_to`` dp (None disables) because co-moment
    accumulation orders differ across engines in the last ulps.
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    pairs = [(a, b) for i, a in enumerate(cols)
             for b in cols[i + 1:]]
    pairs = [tuple(sorted(p)) for p in pairs]
    mean_row = df.agg(
        *[F.avg(qcol(c)).alias(c) for c in cols]).first().asDict()
    shift = {c: (mean_row[c] if mean_row[c] is not None else 0.0)
             for c in cols}
    aggs = []
    for a, b in pairs:
        both = qcol(a).isNotNull() & qcol(b).isNotNull()
        ca = F.when(both, qcol(a) - F.lit(shift[a]))
        cb = F.when(both, qcol(b) - F.lit(shift[b]))
        tag = f"__{a}__{b}"
        aggs += [
            F.count(F.when(both, 1)).alias(f"n{tag}"),
            F.sum(ca).alias(f"sa{tag}"),
            F.sum(cb).alias(f"sb{tag}"),
            F.sum(ca * ca).alias(f"saa{tag}"),
            F.sum(cb * cb).alias(f"sbb{tag}"),
            F.sum(ca * cb).alias(f"sab{tag}"),
        ]
    wide = df.agg(*aggs)
    corr_cells = []
    for a, b in pairs:
        t = f"__{a}__{b}"
        n, sa, sb = (sql_ident(f"n{t}"), sql_ident(f"sa{t}"),
                     sql_ident(f"sb{t}"))
        saa, sbb, sab = (sql_ident(f"saa{t}"), sql_ident(f"sbb{t}"),
                         sql_ident(f"sab{t}"))
        va = f"({saa} - {sa} * {sa} / {n})"
        vb = f"({sbb} - {sb} * {sb} / {n})"
        cov = f"({sab} - {sa} * {sb} / {n})"
        corr_cells.append(
            f"{sql_str(a)}, {sql_str(b)}, CASE WHEN {n} >= 2 "
            f"AND {va} > 0 AND {vb} > 0 "
            f"THEN {cov} / sqrt({va} * {vb}) "
            f"ELSE NULL END, {n}")
    long = wide.selectExpr(
        f"stack({len(pairs)}, {', '.join(corr_cells)}) "
        "AS (col_a, col_b, corr, n)",
    )
    if round_to is not None:
        long = long.withColumn("corr", F.round("corr", round_to))
    return long.orderBy("col_a", "col_b")


def spearman_correlation(df: DataFrame, col_a: str, col_b: str,
                         round_to: int | None = 6) -> DataFrame:
    """Exact distributed Spearman rank correlation between two numeric
    columns: 1 row ``(col_a, col_b, corr, n)``.  Rows where either
    side is null are dropped first (pairwise deletion), then each
    column is replaced by its AVERAGE rank (the standard Spearman tie
    treatment — fractional ranks, so ties get the midpoint) and the
    Pearson coefficient of the ranks is taken via
    :func:`correlation_matrix`'s centered-moment aggregate.

    Scale shape (100 TB): ranking never windows over raw rows — each
    column pays a distinct-value groupBy, a vocabulary-sized running
    sum (``rank = below + (tie_size + 1)/2``), and a hash join back,
    exactly the :func:`outrank_spark.operators.encoders.
    quantile_normalize` trick; the final coefficient is one 1-row
    aggregate.  Spearman is the monotone-association companion to
    Pearson (q118): heavy-tailed web quantities (doc lengths, link
    counts) routinely show strong rank association that linear
    correlation underreports.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(col_a).cast("double").alias("__a"),
        F.col(col_b).cast("double").alias("__b"),
    ).where(F.col("__a").isNotNull() & F.col("__b").isNotNull())

    def with_avg_rank(d: DataFrame, c: str, out: str) -> DataFrame:
        counts = d.groupBy(c).agg(F.count(F.lit(1)).alias("_cnt"))
        w = (Window.partitionBy()
             .orderBy(c)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ranked = counts.select(
            c,
            (F.sum("_cnt").over(w) - F.col("_cnt")
             + (F.col("_cnt") + 1) / 2.0).alias(out),
        )
        return d.join(ranked, c)

    ranked = with_avg_rank(
        with_avg_rank(base, "__a", "ra"), "__b", "rb")
    m = correlation_matrix(ranked.select("ra", "rb"), ["ra", "rb"],
                           round_to=round_to)
    return m.select(
        F.lit(col_a).alias("col_a"), F.lit(col_b).alias("col_b"),
        "corr", "n",
    )


def cuped_adjust(df: DataFrame, metric_col: str, covariate_col: str,
                 arm_col: str | None = None,
                 round_to: int | None = 6) -> DataFrame:
    """CUPED variance reduction for experiment readouts (Deng, Xu,
    Kohavi, Walker — WSDM 2013): adjust the experiment metric with a
    pre-experiment covariate, ``y_adj = y − θ·(x − mean(x))`` with
    ``θ = cov(x, y) / var(x)`` fitted on ALL units (θ must be
    arm-independent or the adjustment biases the delta).  Reduces the
    metric's variance by the squared correlation — the standard way
    to read an A/B test days earlier at web scale.  Returns one row
    per arm (one global row when ``arm_col`` is None): ``n``,
    ``raw_mean``, ``adjusted_mean``, ``theta``, ``var_raw``,
    ``var_adjusted``, ``var_reduction`` (1 − var_adj/var_raw).
    Rows with a null metric or covariate are dropped (a unit without
    a pre-period reads as bias, not as zero).  Degenerate var(x) = 0
    yields θ = 0 (no adjustment), never a division error.

    Scale shape: a 1-row means pass (centering metadata, the q118
    discipline — centered sums dodge catastrophic cancellation and
    ANSI divide-by-zero), one global moment aggregate for θ, then ONE
    map-side-combinable groupBy(arm) over a pure-JVM adjusted-metric
    projection.  Three scans total, no window, no join, no Python.
    """
    y, x = F.col(metric_col).cast("double"), \
        F.col(covariate_col).cast("double")
    base = df.where(y.isNotNull() & x.isNotNull())
    m = base.agg(F.avg(x).alias("mx"), F.avg(y).alias("my")).first()
    if m["mx"] is None:
        raise ValueError("no rows with both metric and covariate")
    mx, my = float(m["mx"]), float(m["my"])
    cx, cy = x - F.lit(mx), y - F.lit(my)
    mom = base.agg(
        F.sum(cx * cy).alias("sxy"),
        F.sum(cx * cx).alias("sxx"),
    ).first()
    theta = (float(mom["sxy"]) / float(mom["sxx"])
             if mom["sxx"] and float(mom["sxx"]) > 0 else 0.0)
    adj = y - F.lit(theta) * (x - F.lit(mx))
    keys = [arm_col] if arm_col is not None else []
    out = (
        base.withColumn("__adj", adj)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(y).alias("raw_mean"),
            F.avg("__adj").alias("adjusted_mean"),
            F.lit(theta).alias("theta"),
            F.var_pop(y).alias("var_raw"),
            F.var_pop("__adj").alias("var_adjusted"),
        )
        .withColumn(
            "var_reduction",
            F.when(F.col("var_raw") > 0,
                   1.0 - F.col("var_adjusted") / F.col("var_raw"))
            .otherwise(F.lit(0.0)),
        )
    )
    if round_to is not None:
        for c in ("raw_mean", "adjusted_mean", "theta",
                  "var_raw", "var_adjusted", "var_reduction"):
            out = out.withColumn(c, F.round(c, round_to))
    return out


def srm_check(df: DataFrame, arm_col: str, expected: dict,
              round_to: int = 6) -> DataFrame:
    """Sample-ratio-mismatch check — the first thing any experiment
    readout must pass (Fabijan et al.: a skewed assignment split
    invalidates every downstream metric, CUPED included): observed
    per-arm counts vs the design's expected shares, reported as
    Pearson chi-square terms.

    ``expected``: {arm_value: weight}; weights are normalized
    driver-side, so {c: 2, t1: 1, t2: 1} means 50/25/25.  Returns one
    row per EXPECTED arm — ``(arm, n_obs, obs_frac, exp_frac,
    chi2_term)`` (arms that drew zero units still get a row — that
    IS the mismatch) — plus one row per UNEXPECTED arm found in the
    data with null exp_frac/chi2_term: a value outside the design is
    itself an assignment bug and must surface, not crash.
    ``sum(chi2_term)`` vs the chi-square critical value at
    ``len(expected) - 1`` df is the verdict (the statistic is
    reported, not the p-value — no portable chi-square CDF exists
    across engines, and SRM practice uses a fixed threshold anyway).
    NULL arms are excluded (unassigned units are a different check).

    Scale shape: ONE map-side-combinable groupBy on the arm column
    (arm-count cells) + a broadcast of the arm-count-sized total; the
    expected shares are literals.  Same audit discipline as
    validation.benford_audit.
    """
    if not expected:
        raise ValueError("expected must be non-empty")
    if arm_col not in df.columns:
        raise ValueError(f"unknown column {arm_col!r}")
    total_w = float(sum(expected.values()))
    if total_w <= 0:
        raise ValueError("expected weights must sum to > 0")
    shares = {str(k): float(v) / total_w for k, v in expected.items()}
    counts = (
        df.where(F.col(arm_col).isNotNull())
        .select(F.col(arm_col).cast("string").alias("arm"))
        .groupBy("arm").agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spark = df.sparkSession
    scaffold = spark.createDataFrame(
        [(a, s) for a, s in sorted(shares.items())],
        "arm string, exp_frac_raw double",
    )
    tot = counts.agg(F.sum("n_obs").alias("n_tot"))
    joined = (
        scaffold.join(counts, "arm", "full_outer")
        .crossJoin(F.broadcast(tot))
    )
    n_obs = F.coalesce("n_obs", F.lit(0)).cast("long")
    e = F.col("n_tot") * F.col("exp_frac_raw")
    return joined.select(
        "arm", n_obs.alias("n_obs"),
        F.round(n_obs / F.col("n_tot"), round_to).alias("obs_frac"),
        F.round("exp_frac_raw", round_to).alias("exp_frac"),
        F.when(F.col("exp_frac_raw").isNotNull() & (e > 0),
               F.round((n_obs - e) * (n_obs - e) / e, round_to))
        .alias("chi2_term"),
    ).orderBy("arm")


def bh_fdr(df: DataFrame, p_col: str, id_col: str,
           fdr_q: float = 0.05, round_to: int = 6) -> DataFrame:
    """Benjamini-Hochberg step-up FDR correction over a table of test
    p-values — the guard against the many-metrics problem when an
    experiment platform reads out hundreds of metrics per run:
    ``(id, p_value, rank, p_adj, rejected)`` with
    ``p_adj_i = min_{j >= i}(p_j * m / j)`` clamped to 1 and
    ``rejected = p_adj <= fdr_q`` (equivalent to the classic step-up
    rule because the running min makes p_adj monotone).

    Ranks are deterministic: (p asc, id asc), so ties never make the
    output engine-dependent.  NULL p-values are excluded from ranking
    (they are failed tests, not evidence) and do not count toward m.

    Scale shape: TWO windows over the TESTS table — which is
    metric-count-sized (hundreds to thousands of rows), never
    corpus-sized; the corpus-heavy work happened upstream in whatever
    produced the p-values.  m crosses as a broadcast 1-row aggregate.
    """
    for c in (p_col, id_col):
        if c not in df.columns:
            raise ValueError(f"unknown column {c!r}")
    if not (0.0 < fdr_q < 1.0):
        raise ValueError(f"fdr_q must be in (0, 1), got {fdr_q}")
    from pyspark.sql import Window

    tests = df.select(
        F.col(id_col).alias("id"),
        F.col(p_col).cast("double").alias("p_value"),
    ).where(F.col("p_value").isNotNull())
    m = tests.agg(F.count(F.lit(1)).alias("m"))
    ranked = (
        tests.crossJoin(F.broadcast(m))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy("p_value", "id")))
        .withColumn("raw", F.col("p_value") * F.col("m")
                    / F.col("rank"))
    )
    tail_min = Window.orderBy(F.desc("rank")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ranked
        .withColumn("p_adj", F.least(F.lit(1.0),
                                     F.min("raw").over(tail_min)))
        .select(
            "id", F.round("p_value", round_to).alias("p_value"),
            F.col("rank").cast("long").alias("rank"),
            F.round("p_adj", round_to).alias("p_adj"),
            (F.col("p_adj") <= F.lit(float(fdr_q))).alias("rejected"),
        )
        .orderBy("rank")
    )


def retrieval_metrics(df: DataFrame, query_col: str, doc_col: str,
                      score_col: str, rel_col: str, k: int = 10,
                      round_to: int = 6) -> DataFrame:
    """Per-query retrieval quality — the eval layer for the engine's
    BM25 (q81) and ANN (q15/q31/q115) retrieval paths: ``(query,
    n_docs, n_rel, ndcg_k, mrr_k, recall_k)`` from a candidate run of
    ``(query, doc, score, graded relevance)`` rows.

    * ``ndcg_k``: DCG@k with the (2^rel - 1)/log2(rank+1) gain over
      the (score desc, doc asc) ranking, normalized by the ideal
      (rel desc, doc asc) ordering; null when the query has no
      positive gain in its ideal top-k (0/0 — macro averages via
      ``avg`` skip those queries, the standard convention).
    * ``mrr_k``: 1/rank of the first relevant hit if it lands in the
      top k, else 0.
    * ``recall_k``: relevant-in-top-k / total relevant; null when the
      query has no relevant candidates at all.

    Ranks are fully deterministic ((score desc, doc asc) — callers
    that round scores before ranking, like q15's 4-dp cosine, get
    engine-stable ranks even under score ties).

    Scale shape: two windows partitioned BY QUERY (a query's
    candidate list is bounded — the retrieval run already cut it to
    a shortlist) + one map-side-combinable groupBy(query).  A
    10^9-query eval shards by query hash like any aggregate; nothing
    global ever sorts.
    """
    for c in (query_col, doc_col, score_col, rel_col):
        if c not in df.columns:
            raise ValueError(f"unknown column {c!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    rel = F.col("__rel")
    base = df.select(
        F.col(query_col).alias("query"),
        F.col(doc_col).alias("__doc"),
        F.col(score_col).cast("double").alias("__s"),
        F.coalesce(F.col(rel_col).cast("double"), F.lit(0.0))
        .alias("__rel"),
    ).where(F.col("__s").isNotNull())
    w_run = Window.partitionBy("query").orderBy(
        F.desc("__s"), F.col("__doc"))
    w_ideal = Window.partitionBy("query").orderBy(
        F.desc("__rel"), F.col("__doc"))
    gain = F.pow(F.lit(2.0), rel) - F.lit(1.0)
    ranked = base.select(
        "query", "__rel",
        F.row_number().over(w_run).alias("__r"),
        F.row_number().over(w_ideal).alias("__ir"),
        gain.alias("__g"),
    )
    disc = lambda r: F.log2(r + F.lit(1.0))  # noqa: E731
    agg = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(rel > 0, 1).otherwise(0)).cast("long")
        .alias("n_rel"),
        F.sum(F.when(F.col("__r") <= k, F.col("__g") / disc(F.col("__r")))
              .otherwise(0.0)).alias("__dcg"),
        F.sum(F.when(F.col("__ir") <= k,
                     F.col("__g") / disc(F.col("__ir")))
              .otherwise(0.0)).alias("__idcg"),
        F.min(F.when(rel > 0, F.col("__r"))).alias("__fr"),
        F.sum(F.when((F.col("__r") <= k) & (rel > 0), 1).otherwise(0))
        .cast("long").alias("__hit"),
    )
    return agg.select(
        "query", F.col("n_docs").cast("long"), "n_rel",
        F.when(F.col("__idcg") > 0,
               F.round(F.col("__dcg") / F.col("__idcg"), round_to))
        .alias("ndcg_k"),
        F.round(
            F.when(F.col("__fr").isNotNull() & (F.col("__fr") <= k),
                   F.lit(1.0) / F.col("__fr")).otherwise(F.lit(0.0)),
            round_to).alias("mrr_k"),
        F.when(F.col("n_rel") > 0,
               F.round(F.col("__hit") / F.col("n_rel"), round_to))
        .alias("recall_k"),
    )


def isotonic_calibrate(df: DataFrame, label_col: str, prob_col: str,
                       n_bins: int = 100,
                       round_to: int = 6) -> DataFrame:
    """Isotonic (PAV) score calibration map — what turns a quality
    classifier's raw scores into usable sampling weights when
    :func:`calibration_report` shows they don't mean what they say:
    ``(bin, lo, hi, n, mean_prob, frac_pos, calibrated)`` with
    ``calibrated`` the pool-adjacent-violators fit, monotone
    non-decreasing in the score by construction.

    Distributed shape (the standard large-scale isotonic recipe):
    the corpus reduces to ``n_bins`` fixed-width score bins in ONE
    map-side-combinable aggregate; PAV then runs driver-side over the
    <= n_bins (rate, weight) sequence — a 10^12-row fit costs the
    same PAV as a 10^5-row one, and binned PAV converges to the exact
    isotonic fit as bins refine (the classic sufficient-statistics
    argument: PAV depends on the data only through cumulative
    (weight, positives) at cut points).  Apply the map with a
    broadcast join on the bin id.

    Rows-only verification (no SQL oracle: PAV's pooling sequence is
    data-dependent and not expressible as fixed SQL): a pure-numpy
    PAV reference, monotonicity and weighted-mean invariants, and
    sklearn's textbook examples pinned in pytest.
    """
    if not (2 <= n_bins <= 100_000):
        raise ValueError(f"n_bins must be in [2, 1e5], got {n_bins}")
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("double")
    binned = (
        df.where(p.isNotNull() & y.isNotNull())
        .select(
            F.when((p < 0) | (p > 1), F.raise_error(
                F.concat(F.lit(f"{prob_col} outside [0, 1]: "),
                         p.cast("string"))))
            .otherwise(
                F.least(F.floor(p * n_bins).cast("int"),
                        F.lit(n_bins - 1)),
            ).alias("bin"),
            p.alias("__p"),
            F.when(y != 0, F.lit(1.0)).otherwise(F.lit(0.0))
            .alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__p").alias("mean_prob"),
            F.avg("__y").alias("frac_pos"),
        )
        .orderBy("bin")
    )
    rows = binned.collect()
    if not rows:
        raise ValueError("no non-null (label, prob) rows to calibrate")
    # PAV over the bin sequence: pool adjacent violators, each block
    # carrying (weighted rate, total weight); a new block merges left
    # while it undercuts its predecessor
    blocks: list[list[float]] = []   # [rate, weight, first_idx]
    for i, r in enumerate(rows):
        blocks.append([float(r["frac_pos"]), float(r["n"]), i])
        while len(blocks) > 1 and blocks[-1][0] < blocks[-2][0]:
            rate2, w2, _ = blocks.pop()
            rate1, w1, j = blocks.pop()
            blocks.append(
                [(rate1 * w1 + rate2 * w2) / (w1 + w2), w1 + w2, j])
    # expand block rates back to per-bin values
    out_rates = [0.0] * len(rows)
    b = 0
    for i in range(len(rows)):
        if b + 1 < len(blocks) and i >= blocks[b + 1][2]:
            b += 1
        out_rates[i] = blocks[b][0]
    width = 1.0 / n_bins
    data = [
        (int(r["bin"]), round(int(r["bin"]) * width, round_to),
         round((int(r["bin"]) + 1) * width, round_to), int(r["n"]),
         round(float(r["mean_prob"]), round_to),
         round(float(r["frac_pos"]), round_to),
         round(out_rates[i], round_to))
        for i, r in enumerate(rows)
    ]
    return df.sparkSession.createDataFrame(
        data, "bin int, lo double, hi double, n long, "
              "mean_prob double, frac_pos double, calibrated double",
    )
