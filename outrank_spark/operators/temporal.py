"""Temporal joins Spark lacks natively: the as-of join.

``asof_join`` matches every left row to the most recent right row at
or before its timestamp (per key) — the canonical point-in-time lookup
of feature stores and market data ("what was the user's last order
when this event happened?").

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do), and the naive
formulations are scale traps: an inequality join is a cartesian-per-
key, and a windowed subquery per left row re-sorts per lookup.  This
implementation is the union-and-carry-forward plan:

1. union the two relations into one stream tagged by side, with the
   right side's payload as a struct column (left payload stays flat);
2. one window sort per key over (time, side) — right rows sort BEFORE
   left rows at equal timestamps, so "at or before" is inclusive;
3. ``last(payload, ignorenulls=True)`` carries the latest right row
   forward; left rows then just read it.

Cost: ONE shuffle + sort of |L|+|R| rows keyed by the join key — the
same complexity as a regular sort-merge join, no inequality blowup.
Skewed keys behave like any window (a hot key's rows sort in one
partition); pre-filter or salt upstream if a single key dominates.

Right-side duplicates at the same (key, time) are resolved by
``tiebreak`` (largest wins), making results deterministic and
cross-engine comparable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_time: str, right_time: str,
              tiebreak: str | None = None) -> DataFrame:
    """Left as-of join: all left columns + the right row (as struct
    fields suffixed ``_asof``) with the greatest ``right_time`` <=
    ``left_time`` for the same ``by`` key; right columns are NULL when
    no prior right row exists.
    """
    reserved = {"_key", "_t", "_side", "_r", "_match", "_rk"}
    clash = (reserved & set(left.columns) | reserved & set(right.columns)
             | {c for c in left.columns if c.startswith("_l_")})
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    out_clash = {
        f"{c}_asof" for c in right.columns if c != by
    } & set(left.columns)
    if out_clash:
        raise ValueError(
            f"output columns would collide with left columns: {out_clash}",
        )
    r = right
    if tiebreak is not None:
        # deterministic winner among same-(key, time) right rows
        w_dup = Window.partitionBy(by, right_time).orderBy(
            F.desc(tiebreak))
        r = (
            right.withColumn("_rk", F.row_number().over(w_dup))
            .where(F.col("_rk") == 1).drop("_rk")
        )
    r_payload = F.struct(*[
        F.col(c).alias(c) for c in r.columns if c != by
    ])
    r_tagged = r.select(
        F.col(by).alias("_key"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        r_payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        F.col(by).alias("_key"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            r_tagged.schema["_r"].dataType,
        ).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_key")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w),
    )
    out_cols = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ] + [
        F.col(f"_match.{f.name}").alias(f"{f.name}_asof")
        for f in r_tagged.schema["_r"].dataType.fields
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame, by: str,
               point_col: str, start_col: str, end_col: str,
               bucket_seconds: int = 86400) -> DataFrame:
    """Point-in-interval join (start <= point <= end, same key) as a
    bucketed EQUI-join — the scale-safe plan for the interval join
    Spark would otherwise execute as a per-key nested loop.

    Intervals explode to one row per covered time bucket; points carry
    exactly ONE bucket, so the equi-join on (key, bucket) finds every
    containing interval exactly once (no post-dedup) and the final
    range predicate just filters.  Cost: |I| * avg_buckets_per_interval
    exploded rows + one hash join — pick ``bucket_seconds`` near the
    typical interval length so the blow-up factor stays small.
    """
    clash = {"_b", "_rkey"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    p = points.withColumn(
        "_b", F.floor(F.col(point_col).cast("timestamp").cast("long")
                      / bucket_seconds),
    )
    i = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("timestamp").cast("long")
                        / bucket_seconds),
                F.floor(F.col(end_col).cast("timestamp").cast("long")
                        / bucket_seconds),
            ),
        ).alias("_b"),
    )
    joined = p.join(i.withColumnRenamed(by, "_rkey"),
                    (F.col(by) == F.col("_rkey"))
                    & (p["_b"] == i["_b"]))
    return (
        joined.where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col)),
        )
        .drop("_b", "_rkey")
    )
