"""Data-quality validation: column profiling and declarative
constraint checks — the admission gate in front of every other
operator in this engine.

A 10^12-row ingest cannot be eyeballed; the standard practice
(popularized by AWS Deequ, re-derived here from scratch) is (1) a
per-column PROFILE — null rate, distinct count, numeric range — diffed
across snapshots to catch schema/content drift the moment a crawler
or upstream producer changes behavior, and (2) declarative
CONSTRAINTS ("doc_id is unique", "lang in {...}", "n_chars >= 0")
evaluated as a violation report, not a crash.

Scale shape (100 TB):

* :func:`profile_table` — ONE hash aggregate for every per-column
  statistic at once (counts, null counts, numeric min/max/mean are
  all mergeable; map-side combine applies), unpivoted with ``stack``.
  Exact ``count_distinct`` over many columns at once would multiply
  the scan through Spark's Expand operator, so distinct counts run as
  a SECOND single aggregate carrying only the distinct aggregates —
  two scans total, never one per column.  (For profile-only use at
  extreme widths, HLL via ``approx_distinct=True`` collapses pass 2
  into pass 1's plan shape.)
* :func:`check_constraints` — all ROW-level rules (not_null, min,
  max, in_set, regex, non_negative) compile into one ``sum(when)``
  aggregate: one scan for the whole rule book.  ``unique`` rules need
  a per-column distinct and run in the same second aggregate as the
  profile's distinct pass.

Numeric min/max are reported as doubles and string min/max as raw
strings — never a cross-engine float-to-string formatting, so the
DuckDB oracles (q130/q131) compare values, not formatting dialects.

No reference-repo counterpart; this extends the engine's operations
family (drift monitoring operators/drift.py, CDC snapshot_diff) from
"did the distribution move" to "is this table admissible at all".
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from outrank_spark.hashing import qcol, sql_ident, sql_str

__all__ = ["profile_table", "check_constraints", "benford_audit",
           "fd_violations", "key_skew_audit", "profile_diff"]

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  approx_distinct: bool = False,
                  round_to: int = 6) -> DataFrame:
    """One row per column: ``(column, dtype, n_rows, n_null,
    null_frac, n_distinct, min_num, max_num, mean_num, min_str,
    max_str)``.  Numeric stats are null for non-numeric columns and
    vice versa; ``n_distinct`` counts non-null values (the SQL
    ``count(DISTINCT col)`` rule).  ``approx_distinct`` swaps the
    exact distinct pass for single-pass HLL (rsd 0.02) when profile
    latency matters more than exactness."""
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown column(s): {missing}")
    dtypes = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(qcol(c)).alias(f"nn__{c}"))
        if isinstance(fields[c], _NUMERIC):
            v = qcol(c).cast("double")
            aggs += [F.min(v).alias(f"mn__{c}"),
                     F.max(v).alias(f"mx__{c}"),
                     F.avg(v).alias(f"av__{c}")]
        elif isinstance(fields[c], T.StringType):
            aggs += [F.min(qcol(c)).alias(f"smn__{c}"),
                     F.max(qcol(c)).alias(f"smx__{c}")]
    wide = df.agg(*aggs)

    daggs = [
        (F.approx_count_distinct(qcol(c), 0.02) if approx_distinct
         else F.count_distinct(qcol(c))).alias(f"nd__{c}")
        for c in cols
    ]
    dwide = df.agg(*daggs)

    cells = []
    for c in cols:
        num = isinstance(fields[c], _NUMERIC)
        s = isinstance(fields[c], T.StringType)
        # names are spliced into SQL text -> escape both the literal
        # ('it''s') and the backticked identifier (`a``b`) forms
        cq, cid = sql_str(c), sql_ident
        mn = (f"round({cid(f'mn__{c}')}, {round_to})" if num
              else "CAST(NULL AS DOUBLE)")
        mx = (f"round({cid(f'mx__{c}')}, {round_to})" if num
              else "CAST(NULL AS DOUBLE)")
        av = (f"round({cid(f'av__{c}')}, {round_to})" if num
              else "CAST(NULL AS DOUBLE)")
        smn = cid(f"smn__{c}") if s else "CAST(NULL AS STRING)"
        smx = cid(f"smx__{c}") if s else "CAST(NULL AS STRING)"
        cells.append(
            f"{cq}, {sql_str(dtypes[c])}, __n, "
            f"__n - {cid(f'nn__{c}')}, "
            f"round((__n - {cid(f'nn__{c}')}) / CAST(__n AS DOUBLE), "
            f"{round_to}), {cid(f'nd__{c}')}, "
            f"{mn}, {mx}, {av}, {smn}, {smx}")
    return (
        wide.crossJoin(F.broadcast(dwide))
        .selectExpr(
            f"stack({len(cols)}, {', '.join(cells)}) AS "
            "(column, dtype, n_rows, n_null, null_frac, n_distinct, "
            "min_num, max_num, mean_num, min_str, max_str)",
        )
        .orderBy("column")
    )


_ROW_RULES = {"not_null", "min", "max", "in_set", "regex",
              "non_negative"}


def check_constraints(df: DataFrame, rules: list[dict],
                      ) -> DataFrame:
    """Evaluate a declarative rule book; returns one row per rule:
    ``(rule_id, column, rule, n_checked, n_violations, passed)``.

    Rules (dicts): ``{"col", "rule", "value"?}`` with rule one of
    ``not_null`` (value ignored), ``min`` / ``max`` (numeric bound,
    inclusive; nulls don't violate — pair with not_null to forbid),
    ``in_set`` (list of allowed values; nulls don't violate),
    ``regex`` (full-match required of non-null values), ``unique``
    (no value occurs twice; nulls ignored like a SQL UNIQUE
    constraint), ``non_negative``.  ``n_checked`` is the row count
    for row-level rules and the non-null count for ``unique``.
    A violation report, never an exception: admission decisions
    belong to the caller.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    for i, r in enumerate(rules):
        if "col" not in r or "rule" not in r:
            raise ValueError(f"rule {i} needs 'col' and 'rule': {r}")
        if r["col"] not in df.columns:
            raise ValueError(f"rule {i}: unknown column {r['col']!r}")
        if r["rule"] not in _ROW_RULES | {"unique"}:
            raise ValueError(f"rule {i}: unknown rule {r['rule']!r}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        c, kind = F.col(r["col"]), r["rule"]
        if kind == "unique":
            continue
        if kind == "not_null":
            bad = c.isNull()
        elif kind == "min":
            bad = c < F.lit(r["value"])
        elif kind == "max":
            bad = c > F.lit(r["value"])
        elif kind == "non_negative":
            bad = c < F.lit(0)
        elif kind == "in_set":
            bad = c.isNotNull() & ~c.isin(list(r["value"]))
        else:  # regex: non-null values must full-match
            bad = c.isNotNull() & ~c.rlike(f"^(?:{r['value']})$")
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0))
            .cast("long").alias(f"v__{i}"))
    wide = df.agg(*aggs).first()

    uniq_rows = {}
    uniq = [(i, r) for i, r in enumerate(rules)
            if r["rule"] == "unique"]
    if uniq:
        daggs = []
        for i, r in uniq:
            c = r["col"]
            daggs += [
                F.count(F.col(c)).alias(f"nn__{i}"),
                F.count_distinct(F.col(c)).alias(f"nd__{i}"),
            ]
        drow = df.agg(*daggs).first()
        for i, r in uniq:
            nn, nd = int(drow[f"nn__{i}"]), int(drow[f"nd__{i}"])
            uniq_rows[i] = (nn, nn - nd)

    n = int(wide["__n"])
    out = []
    for i, r in enumerate(rules):
        if r["rule"] == "unique":
            checked, viol = uniq_rows[i]
        else:
            checked, viol = n, int(wide[f"v__{i}"])
        out.append((i, r["col"], r["rule"], checked, viol,
                    viol == 0))
    return df.sparkSession.createDataFrame(
        out, "rule_id int, column string, rule string, "
             "n_checked long, n_violations long, passed boolean",
    )


# Benford's-law expected first-digit shares log10(1 + 1/d), d=1..9 —
# Python constants so the Spark side never calls an engine log; the
# DuckDB oracle's log10() agrees to <1 ulp, masked by round-to-6.
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_audit(df: DataFrame, cols: list[str],
                  round_to: int = 6,
                  scale: int = 1_000_000) -> DataFrame:
    """First-significant-digit audit against Benford's law — the
    classic fabricated/degenerate-numeric-data detector (Nigrini's
    forensic-accounting test, applied here as a corpus admission
    signal next to :func:`profile_table`).

    Returns 9 rows per audited column: ``(column, digit, n_obs,
    obs_frac, exp_frac, chi2_term)``; ``sum(chi2_term)`` per column is
    the Pearson chi-square statistic vs the Benford distribution
    (8 df).  Digits that never occur still get a row (n_obs = 0) so
    the statistic is complete.

    Engine-portable digit extraction — NO floating log/pow on data:
    the value is scaled to a BIGINT (``floor(|v| * scale + 0.5)``,
    i.e. |v| resolved to 1/scale granularity) and the first digit is
    the first character of the integer's decimal string.  Integer
    formatting is bit-portable across engines, where
    ``floor(v / 10^floor(log10 v))`` can flip buckets on 1-ulp libm
    differences.  Values with ``|v| < 1/(2*scale)`` (incl. 0) and
    nulls are excluded, and n_obs counts per column reflect that.
    A column with ZERO admissible values is absent from the report
    (its fractions would be 0/0) — pair with :func:`profile_table`'s
    null counts when auditing possibly-empty columns.

    Scale shape: ONE scan — all columns unpivot through ``stack``
    into (column, value), one map-side-combinable groupBy on
    (column, digit) [≤ 9·k cells], a broadcast join of per-column
    totals, and a 9·k-row digit scaffold left-join.  No windows, no
    corpus-sized shuffles.
    """
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown column(s): {missing}")
    cells = ", ".join(
        f"{sql_str(c)}, CAST({sql_ident(c)} AS DOUBLE)" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {cells}) AS (column, v)")
    scaled = F.floor(F.abs(F.col("v")) * F.lit(float(scale)) + 0.5) \
        .cast("long")
    digits = (
        long.where(F.col("v").isNotNull())
        .select("column", scaled.alias("s"))
        .where(F.col("s") > 0)
        .select("column", F.substring(F.col("s").cast("string"), 1, 1)
                .cast("int").alias("digit"))
        .groupBy("column", "digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    totals = digits.groupBy("column").agg(
        F.sum("n_obs").alias("n_col"))
    spark = df.sparkSession
    scaffold = spark.createDataFrame(
        [(c, d) for c in cols for d in range(1, 10)],
        "column string, digit int",
    )
    exp_frac = F.element_at(
        F.create_map(*[F.lit(x) for d in range(1, 10)
                       for x in (d, _BENFORD[d])]),
        F.col("digit"))
    e = F.col("n_col") * exp_frac
    n_obs = F.coalesce("n_obs", F.lit(0)).cast("long")
    return (
        scaffold
        .join(digits, ["column", "digit"], "left")
        .join(F.broadcast(totals), "column")
        .select(
            "column", "digit", n_obs.alias("n_obs"),
            F.round(n_obs / F.col("n_col"), round_to)
            .alias("obs_frac"),
            F.round(exp_frac, round_to).alias("exp_frac"),
            F.round((n_obs - e) * (n_obs - e) / e, round_to)
            .alias("chi2_term"),
        )
        .orderBy("column", "digit")
    )


def fd_violations(df: DataFrame, fds: list[tuple],
                  round_to: int = 6) -> DataFrame:
    """Approximate-functional-dependency discovery: for each candidate
    FD ``lhs -> rhs`` report how badly the table violates it, via the
    standard g3 error (Kivinen-Mannila): the minimum fraction of rows
    that must be deleted for the FD to hold exactly — per lhs group
    that is ``group_size - max single-rhs-value count``, summed.

    ``fds``: list of ``(lhs, rhs)`` with lhs a column name or list of
    names.  One row per FD: ``(fd_id, lhs, rhs, n_rows, n_groups,
    n_violating_groups, g3_violations, g3_error, holds)``.  Rows with
    a NULL anywhere in lhs+rhs are excluded (SQL grouping would
    otherwise treat NULL as a value and understate violations); an FD
    whose admissible row set is EMPTY reports ``holds = true`` with
    ``n_rows = 0`` and a null ``g3_error`` — vacuous truth, visibly
    flagged by the zero count.

    Scale shape, per FD: groupBy(lhs, rhs).count — fully map-side
    combinable — then a second vocabulary-sized groupBy(lhs) taking
    sum/max/count, then a 1-row roll-up.  No windows, no joins, no
    row ever leaves the aggregate tree.  Each FD is its own scan
    (grouping keys differ); callers batching many FDs over a huge
    table should persist the source or derive candidates from a
    sample first — discovery-at-scale is sample-then-verify.
    """
    if not fds:
        raise ValueError("fds must be non-empty")
    spark = df.sparkSession
    out = None
    for i, (lhs, rhs) in enumerate(fds):
        lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
        for c in lhs_cols + [rhs]:
            if c not in df.columns:
                raise ValueError(f"fd {i}: unknown column {c!r}")
        cond = F.col(rhs).isNotNull()
        for c in lhs_cols:
            cond = cond & F.col(c).isNotNull()
        pairs = (
            df.where(cond)
            .groupBy(*lhs_cols, rhs)
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        grp = pairs.groupBy(*lhs_cols).agg(
            F.sum("__c").alias("__n"),
            F.max("__c").alias("__keep"),
            F.count(F.lit(1)).alias("__nd"),
        )
        row = grp.agg(
            F.coalesce(F.sum("__n"), F.lit(0)).alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
            .alias("n_violating_groups"),
            F.coalesce(F.sum(F.col("__n") - F.col("__keep")),
                       F.lit(0)).alias("g3_violations"),
        ).select(
            F.lit(i).alias("fd_id"),
            F.lit(",".join(lhs_cols)).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.col("n_rows").cast("long"),
            F.col("n_groups").cast("long"),
            F.col("n_violating_groups").cast("long"),
            F.col("g3_violations").cast("long"),
            F.when(F.col("n_rows") > 0,
                   F.round(F.col("g3_violations")
                           / F.col("n_rows"), round_to))
            .alias("g3_error"),
            (F.col("n_violating_groups") == 0).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def key_skew_audit(df: DataFrame, key_col: str,
                   top_k: int = 10,
                   round_to: int = 6) -> DataFrame:
    """Exact hot-key diagnostic for a join/grouping key: one row
    ``(key, n_rows, n_keys, max_count, top1_share, topk_share,
    gini)`` describing how skewed the key's frequency distribution
    is — the number that decides whether a shuffle on this key needs
    salting or AQE skew handling (q105's F2 sketch profile is the
    streaming estimate; this is its exact-oracle complement).

    Gini over per-key counts is computed WITHOUT ranking the keys:
    counts compress to a count-of-COUNTS histogram (distinct
    count-values only — the distinct-value discipline of q117/q120),
    and with multiplicities ``w_k`` of count-value ``v_k`` in
    ascending order the sorted-rank sum telescopes to
    ``sum_k v_k * (W_k(W_k+1) - W_{k-1}(W_{k-1}+1)) / 2`` with
    ``W_k = cumsum(w_k)``; Gini = 2*S/(n*total) - (n+1)/n.  All sums
    are integer until the final division, so the DuckDB oracle
    matches bit-for-bit before the round.  NULL keys are excluded.

    Scale shape: groupBy(key) [map-side combinable] -> groupBy(count)
    [histogram-sized] -> ONE window over the distinct-count histogram
    (a few thousand rows even at 10^12 input rows) -> 1-row roll-up.
    The top-k share reuses the same histogram with a descending
    cumulative weight — no corpus-sized window, no sort of all keys.
    """
    if key_col not in df.columns:
        raise ValueError(f"unknown column {key_col!r}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window

    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("w"))
    asc = Window.orderBy("c") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    desc = Window.orderBy(F.desc("c")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wk = F.sum("w").over(asc)
    wk_prev = wk - F.col("w")
    # sorted-rank sum contribution of this count-value block.
    # Wk(Wk+1) - Wk-1(Wk-1+1) = w*(Wk + Wk-1 + 1), and the left form
    # is a difference of two even products, so the block term is
    # provably even: halve it with an INTEGER shift, never a double
    # division — Spark's `/` yields double and would silently round
    # once the intermediate exceeds 2^53 at extreme key counts.
    rank_sum = F.col("c") * F.shiftright(
        F.col("w") * (wk + wk_prev + F.lit(1)), 1)
    dk = F.sum("w").over(desc)          # cum keys, hottest first
    dk_prev = dk - F.col("w")
    topk_take = F.greatest(
        F.lit(0), F.least(F.col("w"), F.lit(top_k) - dk_prev))
    enriched = hist.select(
        "c", "w",
        rank_sum.cast("long").alias("rs"),
        (F.col("c") * topk_take).alias("topk_part"),
    )
    return enriched.agg(
        F.lit(key_col).alias("key"),
        F.sum(F.col("c") * F.col("w")).cast("long").alias("n_rows"),
        F.sum("w").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_count"),
        F.sum("rs").alias("__rs"),
        F.sum("topk_part").cast("long").alias("__topk"),
    ).select(
        "key", "n_rows", "n_keys", "max_count",
        F.round(F.col("max_count") / F.col("n_rows"), round_to)
        .alias("top1_share"),
        F.round(F.col("__topk") / F.col("n_rows"), round_to)
        .alias("topk_share"),
        F.round(
            2.0 * F.col("__rs") / (F.col("n_keys") * F.col("n_rows"))
            - (F.col("n_keys") + 1.0) / F.col("n_keys"), round_to)
        .alias("gini"),
    )


def profile_diff(before: DataFrame, after: DataFrame,
                 cols: list[str] | None = None,
                 null_frac_tol: float = 0.02,
                 distinct_ratio_tol: float = 0.5,
                 round_to: int = 6) -> DataFrame:
    """Snapshot-over-snapshot profile drift — the check a scheduled
    ingest runs between yesterday's table and today's: both sides
    profiled with :func:`profile_table` (two scans each, width-
    independent), joined per column, deltas reported and flagged.

    One row per profiled column: ``(column, n_before, n_after,
    null_frac_before, null_frac_after, null_frac_delta,
    distinct_before, distinct_after, distinct_ratio, mean_delta,
    drifted)`` where ``drifted`` is true when the null-fraction moved
    more than ``null_frac_tol`` (absolute) or the distinct count
    changed by more than ``distinct_ratio_tol`` RELATIVE to before
    (ratio outside [1-tol, 1+tol]; a 0-before column with new
    distinct values always flags).  ``mean_delta`` is null for
    non-numeric columns.  Thresholds are report inputs, not policy —
    the caller decides what blocks the pipeline (pair with the
    distribution-level drift operators PSI/KS/JSD when flags fire;
    this catches the cheap structural breaks first).

    Column sets must match on the compared subset: a column missing
    from either side raises — schema drift is a louder failure than
    content drift and deserves an exception, not a row.
    """
    cols = cols or [c for c in before.columns if c in after.columns]
    for name, d in (("before", before), ("after", after)):
        missing = [c for c in cols if c not in d.columns]
        if missing:
            raise ValueError(f"{name} side lacks column(s): {missing}")
    pa = profile_table(before, cols).select(
        "column",
        F.col("n_rows").alias("n_before"),
        F.col("null_frac").alias("null_frac_before"),
        F.col("n_distinct").alias("distinct_before"),
        F.col("mean_num").alias("mean_before"),
    )
    pb = profile_table(after, cols).select(
        "column",
        F.col("n_rows").alias("n_after"),
        F.col("null_frac").alias("null_frac_after"),
        F.col("n_distinct").alias("distinct_after"),
        F.col("mean_num").alias("mean_after"),
    )
    ratio = F.when(F.col("distinct_before") > 0,
                   F.col("distinct_after")
                   / F.col("distinct_before").cast("double"))
    nf_delta = F.col("null_frac_after") - F.col("null_frac_before")
    drift = (
        (F.abs(nf_delta) > null_frac_tol)
        | F.when(F.col("distinct_before") > 0,
                 (ratio < 1.0 - distinct_ratio_tol)
                 | (ratio > 1.0 + distinct_ratio_tol))
        .otherwise(F.col("distinct_after") > 0)
    )
    return (
        pa.join(pb, "column")
        .select(
            "column", "n_before", "n_after",
            "null_frac_before", "null_frac_after",
            F.round(nf_delta, round_to).alias("null_frac_delta"),
            "distinct_before", "distinct_after",
            F.round(ratio, round_to).alias("distinct_ratio"),
            F.round(F.col("mean_after") - F.col("mean_before"),
                    round_to).alias("mean_delta"),
            drift.alias("drifted"),
        )
        .orderBy("column")
    )
