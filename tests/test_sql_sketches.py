"""SQL-registered sketch UDAF family: grouped sketching from plain
spark.sql text, blob rollups without base-table rescan, and bitwise
parity with the applyInPandas build path for order-independent kinds."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from outrank_spark.functions.sql_sketches import register_sql_sketches
from outrank_spark.operators.sketch_build import build_grouped_sketches
from outrank_spark.sketches import HyperLogLog, sketch_from_bytes


@pytest.fixture(scope="module")
def sql_env(spark):
    names = register_sql_sketches(spark)
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "host": [f"h{i % 20}" for i in range(30_000)],
        "tld": [f"t{(i % 20) % 4}" for i in range(30_000)],
        "url": [f"u{v}" for v in rng.integers(0, 5_000, 30_000)],
        "latency": rng.exponential(100, 30_000),
    })
    df = spark.createDataFrame(pdf).repartition(9)
    df.createOrReplaceTempView("crawl")
    return spark, pdf, names


def test_grouped_hll_from_sql_within_bound(sql_env):
    spark, pdf, _ = sql_env
    got = {r["host"]: r["est"] for r in spark.sql(
        "SELECT host, hll_estimate(hll_sketch(url)) AS est "
        "FROM crawl GROUP BY host").collect()}
    sigma = 1.04 / np.sqrt(2 ** 14)
    for host, grp in pdf.groupby("host"):
        exact = grp["url"].nunique()
        assert abs(got[host] - exact) / exact <= 3 * sigma


def test_sql_blob_rollup_bitwise_vs_applyinpandas(sql_env):
    """host-level blobs built in SQL == build_grouped_sketches blobs
    BITWISE (HLL register-max is order/partitioning independent), and
    rolling them to tld-level in SQL == sketching the raw data."""
    spark, pdf, _ = sql_env
    sql_blobs = {r["host"]: bytes(r["blob"]) for r in spark.sql(
        "SELECT host, hll_sketch(url) AS blob FROM crawl GROUP BY host"
    ).collect()}
    api_blobs = {r["key"]: bytes(r["blob"]) for r in build_grouped_sketches(
        spark.table("crawl"), "host", "url", kind="hll", params={"p": 14},
    ).collect()}
    assert sql_blobs == api_blobs

    rolled = {r["tld"]: r["est"] for r in spark.sql(
        "SELECT tld, hll_estimate(hll_merge(blob)) AS est FROM ("
        "  SELECT host, tld, hll_sketch(url) AS blob"
        "  FROM crawl GROUP BY host, tld) GROUP BY tld").collect()}
    for tld, grp in pdf.groupby("tld"):
        direct = HyperLogLog(p=14).update(grp["url"].to_numpy()).estimate()
        assert rolled[tld] == pytest.approx(direct)


def test_kll_quantile_from_sql(sql_env):
    spark, pdf, _ = sql_env
    row = spark.sql(
        "SELECT kll_quantile(kll_sketch(latency), 0.5) AS med, "
        "       kll_quantile(kll_sketch(latency), 0.9) AS p90 "
        "FROM crawl").collect()[0]
    lat = np.sort(pdf["latency"].to_numpy())
    for est, q in ((row["med"], 0.5), (row["p90"], 0.9)):
        rank = np.searchsorted(lat, est) / len(lat)
        assert abs(rank - q) <= 0.01 + 1.0 / len(lat)


def test_countsketch_f2_from_sql_matches_kernel(sql_env):
    spark, pdf, _ = sql_env
    est = spark.sql(
        "SELECT countsketch_f2(countsketch_merge(blob)) AS f2 FROM ("
        "  SELECT countsketch_sketch(url) AS blob FROM crawl"
        "  GROUP BY host)").collect()[0]["f2"]
    exact = float((pdf["url"].value_counts().to_numpy().astype(float) ** 2)
                  .sum())
    assert abs(est - exact) / exact <= np.sqrt(6.0 / 2 ** 13)


def test_bloom_membership_from_sql(sql_env):
    spark, pdf, _ = sql_env
    blob_df = spark.sql(
        "SELECT bloom_sketch(url) AS blob FROM crawl")
    blob_df.createOrReplaceTempView("bloom_blob")
    res = spark.sql(
        "SELECT v, bloom_maybe_contains(b.blob, v) AS hit "
        "FROM (SELECT explode(array('u0','u1','nope-1','nope-2')) AS v) "
        "CROSS JOIN bloom_blob b").collect()
    got = {r["v"]: r["hit"] for r in res}
    members = set(pdf["url"])
    assert got["u0"] and got["u1"]          # no false negatives
    for v in ("nope-1", "nope-2"):
        assert got[v] in (True, False)      # may FP at fpr, never crash
