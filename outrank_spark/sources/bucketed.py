"""Hive-style bucketed tables: pre-shuffled storage for co-located,
exchange-free joins and aggregations.

Why this exists (100 TB story): a corpus that is joined repeatedly on
the same key — url-keyed page snapshots joined to extraction results,
doc_id-keyed shards joined to per-doc quality scores, host-keyed link
tables — pays a full shuffle of BOTH sides on every query if stored as
plain parquet.  Writing each side ``bucketBy(n, key)`` pays the shuffle
ONCE at write time; every later equi-join or groupBy on the key then
reads co-located buckets and Catalyst plans a SortMergeJoin with NO
Exchange on the bucketed side(s).  At a 10^12-row pages table that is
the difference between re-shuffling 100 TB per query and never
re-shuffling it at all.

Requirements Spark imposes (asserted here so misuse fails loudly at
write time, not as a silent slow plan later):

* bucketed tables must go through ``saveAsTable`` (the session
  catalog) — ``parquet(path)`` silently drops bucket metadata;
* both join sides must hash the SAME key type; Spark only avoids the
  exchange when bucket counts are equal, or one side's count divides
  the other's (``spark.sql.bucketing.coalesceBucketsInJoin`` handles
  the divisor case);
* output tasks each write one file per bucket they touch — repartition
  by the bucket key first (done here) so each bucket is one file, not
  ``tasks x buckets`` fragments.

The reference engine is single-node and has no storage-layout
counterpart; this is Spark-native infrastructure (Spark SQL bucketing,
SPARK-12394).  Proof is physical, not semantic: tests assert the
joined plan of two co-bucketed tables contains zero
``ShuffleExchange`` operators while results stay row-identical to the
plain-parquet join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and by default per-bucket sorted)
    parquet table in the session catalog.

    ``sort=True`` stores each bucket sorted by the key so a later
    SortMergeJoin skips its Sort as well as its Exchange (scan ->
    merge directly).  ``path`` pins an explicit location (external
    table); default is the session warehouse dir.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    # one file per bucket: co-locate rows of a bucket into one task
    # before the bucketed write (otherwise every output task emits a
    # fragment for every bucket it sees)
    w = df.repartition(buckets, *keys).write.mode(mode) \
        .bucketBy(buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str,
                  right_table: str, on: str | list[str],
                  how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    Returns the plain DataFrame join — correctness never depends on
    the layout — but when both tables were written with
    :func:`write_bucketed` on ``on`` with compatible bucket counts,
    the physical plan has no Exchange (see
    :func:`assert_no_shuffle_exchange`).
    """
    return spark.table(left_table).join(spark.table(right_table),
                                        on=on, how=how)


def assert_no_shuffle_exchange(df: DataFrame) -> None:
    """Raise if the physical plan re-shuffles — the guard tests (and
    plan-conscious callers) use to pin the exchange-free property
    instead of eyeballing ``explain()`` output."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "plan contains a shuffle Exchange; expected co-located "
            f"bucketed scan:\n{plan}")
