"""Privacy audits over tabular snapshots: k-anonymity / l-diversity.

A pipeline that redacts PII spans (operators/text.redact_pii) still
leaks identity through QUASI-identifiers — column combinations that
are individually harmless but jointly unique (the Sweeney result:
ZIP + birthdate + sex re-identifies most of a population).  Before a
table ships to a wider audience, the standard audit is:

* **k-anonymity** (Samarati & Sweeney 1998): every equivalence class
  of the quasi-identifier tuple must contain >= k rows, so any row
  hides among at least k-1 others.
* **l-diversity** (Machanavelli et al. 2007): each class must also
  carry >= l DISTINCT values of the sensitive attribute — a class of
  500 rows that all share one diagnosis is k-anonymous yet fully
  disclosive.

Scale shape: one hash-aggregate on the quasi tuple (the same shuffle
an ordinary GROUP BY pays; map-side combine applies because count and
approx-distinct partials are mergeable), then an optional tiny
roll-up.  No windows, no joins, no UDFs — both audits stay inside
WholeStageCodegen end to end, so the audit of a 10^12-row table costs
exactly one aggregation pass.  l-diversity uses an EXACT distinct
(two-level aggregate) by default because audits must not
under-report risk; pass ``approx_rsd`` to trade exactness for a
single-pass HLL sketch when the class count itself is huge.

There is no reference-repo counterpart; this extends the engine's
PII family (operators/text.py redact_pii, SURVEY §2.9c) from span
redaction to table-level disclosure auditing.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["k_anonymity_audit", "k_anonymity_summary",
           "pseudonymize"]


def k_anonymity_audit(df: DataFrame, quasi_cols: list[str], k: int = 5,
                      sensitive_col: str | None = None, l: int = 2,
                      approx_rsd: float | None = None) -> DataFrame:
    """Per-equivalence-class audit of the ``quasi_cols`` tuple.

    Returns one row per class: the quasi columns, ``class_size``,
    ``k_anonymous`` (class_size >= k) and — when ``sensitive_col``
    is given — ``sensitive_distinct`` and ``l_diverse``
    (distinct-sensitive >= l).  Null quasi values form their own
    class (GROUP BY semantics), matching how an attacker would key.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        if l < 1:
            raise ValueError(f"l must be >= 1, got {l}")
        dc = (F.approx_count_distinct(sensitive_col, approx_rsd)
              if approx_rsd is not None
              else F.count_distinct(F.col(sensitive_col)))
        aggs.append(dc.alias("sensitive_distinct"))
    out = df.groupBy(*quasi_cols).agg(*aggs).withColumn(
        "k_anonymous", F.col("class_size") >= F.lit(k),
    )
    if sensitive_col is not None:
        out = out.withColumn(
            "l_diverse", F.col("sensitive_distinct") >= F.lit(l),
        )
    return out


def k_anonymity_summary(df: DataFrame, quasi_cols: list[str], k: int = 5,
                        by: str | None = None,
                        sensitive_col: str | None = None,
                        l: int = 2) -> DataFrame:
    """Roll the per-class audit up to a release decision.

    Grouped by ``by`` (one global row when None): ``n_classes``,
    ``n_rows``, ``min_class_size``, ``violating_classes`` /
    ``rows_at_risk`` (classes below k and the rows inside them — the
    rows an adversary can pin below the k crowd), and, with
    ``sensitive_col``, ``non_diverse_classes``.  ``k_anonymous`` is
    the table verdict: true iff no class violates.

    ``by`` must be one of ``quasi_cols`` (the roll-up is a partial
    re-aggregation of the class table, so it can only group by keys
    the classes already carry).
    """
    if by is not None and by not in quasi_cols:
        raise ValueError(f"by={by!r} must be one of quasi_cols")
    classes = k_anonymity_audit(df, quasi_cols, k, sensitive_col, l)
    keys = [by] if by is not None else []
    viol = F.when(~F.col("k_anonymous"), 1).otherwise(0)
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.min("class_size").alias("min_class_size"),
        F.sum(viol).alias("violating_classes"),
        F.sum(F.col("class_size") * viol).alias("rows_at_risk"),
    ]
    if sensitive_col is not None:
        aggs.append(F.sum(
            F.when(~F.col("l_diverse"), 1).otherwise(0),
        ).alias("non_diverse_classes"))
    out = (classes.groupBy(*keys).agg(*aggs) if keys
           else classes.agg(*aggs))
    return out.withColumn(
        "k_anonymous", F.col("violating_classes") == F.lit(0),
    )


def pseudonymize(df: DataFrame, cols: list[str],
                 secret: str, prefix: str = "tok_",
                 keep_null: bool = True) -> DataFrame:
    """Deterministic keyed pseudonymization: replace each value in
    ``cols`` with ``prefix + md5(secret|value)[:16]`` — the standard
    GDPR-pipeline trade: identifiers become opaque tokens, but
    REFERENTIAL INTEGRITY survives (equal values map to equal tokens
    across every table pseudonymized with the same secret, so joins,
    groupBys, and dedup keys still work).  Nulls stay null by default
    (``keep_null=False`` tokenizes them too, hiding WHICH rows lacked
    the field).

    Where :func:`redact_pii <outrank_spark.operators.text.redact_pii>`
    scrubs free text and :func:`k_anonymity_audit` measures
    disclosure, this transforms the KEY columns a release must keep
    joinable.  Reversal requires the secret plus a rainbow table over
    the value domain — rotate the secret per release to prevent
    cross-release linkage.

    Pure-JVM projection (md5 + substring, WholeStageCodegen, zero
    shuffle); md5 is bit-identical across engines so downstream
    equality semantics are engine-portable.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"unknown column {c!r}")
    if not secret:
        raise ValueError("secret must be non-empty")
    out = df
    for c in cols:
        tok = F.concat(
            F.lit(prefix),
            F.substring(F.md5(F.concat_ws(
                "|", F.lit(secret), F.col(c).cast("string"))), 1, 16),
        )
        if keep_null:
            tok = F.when(F.col(c).isNotNull(), tok)
        out = out.withColumn(c, tok)
    return out
