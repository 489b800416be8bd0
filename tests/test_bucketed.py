"""Bucketed-table co-located joins (sources/bucketed.py).

The property under test is PHYSICAL: two tables written bucketBy(n, k)
join on k with zero shuffle Exchange in the executed plan, while the
result stays row-identical to the plain-parquet join.  A negative
control pins that the assertion helper actually detects exchanges.
"""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from outrank_spark.sources.bucketed import (
    assert_no_shuffle_exchange,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module", autouse=True)
def _no_broadcast(spark):
    """Disable auto-broadcast: a broadcast join has no shuffle Exchange
    either, which would make every assertion here vacuous.  With it off,
    an exchange-free join can only come from the bucketed layout."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37).alias("host_bucket"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    scores = spark.range(0, 2000, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 100 / 100.0).alias("quality"),
    )
    write_bucketed(docs, "bt_docs", "doc_id", 8,
                   path=str(tmp / "docs"))
    write_bucketed(scores, "bt_scores", "doc_id", 8,
                   path=str(tmp / "scores"))
    yield docs, scores
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_scores")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, tables):
        joined = bucketed_join(spark, "bt_docs", "bt_scores", "doc_id")
        assert_no_shuffle_exchange(joined)

    def test_join_rows_match_plain_join(self, spark, tables):
        docs, scores = tables
        got = sorted(
            (r["doc_id"], r["text"], round(r["quality"], 9))
            for r in bucketed_join(
                spark, "bt_docs", "bt_scores", "doc_id",
            ).select("doc_id", "text", "quality").collect()
        )
        want = sorted(
            (r["doc_id"], r["text"], round(r["quality"], 9))
            for r in docs.join(scores, "doc_id")
            .select("doc_id", "text", "quality").collect()
        )
        assert got == want and len(got) == 1000

    def test_groupby_on_bucket_key_has_no_exchange(self, spark, tables):
        agg = spark.table("bt_docs").groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"))
        assert_no_shuffle_exchange(agg)

    def test_negative_control_detects_exchange(self, spark, tables):
        # joining on a NON-bucket key must shuffle — if the helper
        # passes here it is vacuous (broadcast is already disabled by
        # the module fixture, so the shuffle can't be sidestepped)
        shuffled = spark.table("bt_docs").join(
            spark.table("bt_scores").withColumnRenamed(
                "doc_id", "host_bucket"),
            "host_bucket",
        )
        with pytest.raises(AssertionError):
            assert_no_shuffle_exchange(shuffled)

    def test_bad_bucket_count_raises(self, spark, tables):
        docs, _ = tables
        with pytest.raises(ValueError):
            write_bucketed(docs, "bt_bad", "doc_id", 0)
