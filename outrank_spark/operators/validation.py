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

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["profile_table", "check_constraints"]

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
        aggs.append(F.count(F.col(c)).alias(f"nn__{c}"))
        if isinstance(fields[c], _NUMERIC):
            v = F.col(c).cast("double")
            aggs += [F.min(v).alias(f"mn__{c}"),
                     F.max(v).alias(f"mx__{c}"),
                     F.avg(v).alias(f"av__{c}")]
        elif isinstance(fields[c], T.StringType):
            aggs += [F.min(c).alias(f"smn__{c}"),
                     F.max(c).alias(f"smx__{c}")]
    wide = df.agg(*aggs)

    daggs = [
        (F.approx_count_distinct(c, 0.02) if approx_distinct
         else F.count_distinct(F.col(c))).alias(f"nd__{c}")
        for c in cols
    ]
    dwide = df.agg(*daggs)

    cells = []
    for c in cols:
        num = isinstance(fields[c], _NUMERIC)
        s = isinstance(fields[c], T.StringType)
        mn = (f"round(`mn__{c}`, {round_to})" if num
              else "CAST(NULL AS DOUBLE)")
        mx = (f"round(`mx__{c}`, {round_to})" if num
              else "CAST(NULL AS DOUBLE)")
        av = (f"round(`av__{c}`, {round_to})" if num
              else "CAST(NULL AS DOUBLE)")
        smn = f"`smn__{c}`" if s else "CAST(NULL AS STRING)"
        smx = f"`smx__{c}`" if s else "CAST(NULL AS STRING)"
        cells.append(
            f"'{c}', '{dtypes[c]}', __n, __n - `nn__{c}`, "
            f"round((__n - `nn__{c}`) / CAST(__n AS DOUBLE), "
            f"{round_to}), `nd__{c}`, {mn}, {mx}, {av}, {smn}, {smx}")
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
