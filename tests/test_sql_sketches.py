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
    # the SQL surface emits the DENSE wire; the API path defaults to
    # sparse since r6, so the bitwise contract is pinned against the
    # representation-matched build ({"sparse": False}) and the sparse
    # default is pinned to identical ESTIMATES (same logical
    # registers, different wire)
    api_blobs = {r["key"]: bytes(r["blob"]) for r in build_grouped_sketches(
        spark.table("crawl"), "host", "url", kind="hll",
        params={"p": 14, "sparse": False},
    ).collect()}
    assert sql_blobs == api_blobs
    sparse_est = {r["key"]: sketch_from_bytes("hll", bytes(r["blob"]))
                  .estimate()
                  for r in build_grouped_sketches(
                      spark.table("crawl"), "host", "url", kind="hll",
                      params={"p": 14}).collect()}
    assert sparse_est == {
        h: sketch_from_bytes("hll", b).estimate()
        for h, b in sql_blobs.items()}

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


def test_ddsketch_quantile_from_sql(sql_env):
    """SQL ddsketch quantile within alpha of the exact per-host
    quantile; tld rollup == direct tld sketch BITWISE (counter-add
    merge is order-independent)."""
    spark, pdf, _ = sql_env
    got = {r["host"]: r["p90"] for r in spark.sql(
        "SELECT host, ddsketch_quantile(ddsketch_sketch(latency), 0.9)"
        " AS p90 FROM crawl GROUP BY host").collect()}
    for host, grp in pdf.groupby("host"):
        lat = np.sort(grp["latency"].to_numpy())
        truth = lat[min(int(np.ceil(0.9 * len(lat))) - 1,
                        len(lat) - 1)]
        assert abs(got[host] - truth) / truth <= 0.011
    roll = {r["tld"]: bytes(r["b"]) for r in spark.sql(
        "SELECT tld, ddsketch_merge(b) AS b FROM (SELECT tld, "
        "ddsketch_sketch(latency) AS b FROM crawl GROUP BY tld, host)"
        " GROUP BY tld").collect()}
    direct = {r["tld"]: bytes(r["b"]) for r in spark.sql(
        "SELECT tld, ddsketch_sketch(latency) AS b FROM crawl "
        "GROUP BY tld").collect()}
    assert roll == direct


def test_theta_estimate_and_rollup_from_sql(sql_env):
    spark, pdf, _ = sql_env
    got = {r["tld"]: r["est"] for r in spark.sql(
        "SELECT tld, theta_estimate(theta_merge(b)) AS est FROM ("
        "SELECT tld, host, theta_sketch(url) AS b FROM crawl "
        "GROUP BY tld, host) GROUP BY tld").collect()}
    for tld, grp in pdf.groupby("tld"):
        exact = grp["url"].nunique()
        # k=4096 >= distinct count here -> KMV is the exact set
        assert abs(got[tld] - exact) / exact < 0.05


def test_shll_windowed_estimate_from_sql(sql_env):
    """Sliding-HLL from SQL: one sketch per host answers both the
    full-range and the late-window distinct count; rollup bitwise."""
    spark, pdf, _ = sql_env
    spark.sql(
        "SELECT host, shll_sketch(url, CAST(substr(url, 2) AS DOUBLE))"
        " AS b FROM crawl GROUP BY host").createOrReplaceTempView("hb")
    est = spark.sql(
        "SELECT host, shll_estimate(b, NULL) AS full, "
        "shll_estimate(b, 4000.0) AS late FROM hb").collect()
    sigma = 1.04 / np.sqrt(2 ** 12)
    for r in est:
        grp = pdf[pdf["host"] == r["host"]]
        ids = grp["url"].str.slice(1).astype(int)
        full_exact = grp["url"].nunique()
        late_exact = grp[ids >= 4000]["url"].nunique()
        assert abs(r["full"] - full_exact) / full_exact <= 3 * sigma
        assert abs(r["late"] - late_exact) / max(late_exact, 1) \
            <= 3 * sigma + 0.02
    roll = bytes(spark.sql(
        "SELECT shll_merge(b) AS b FROM hb").first()["b"])
    direct = bytes(spark.sql(
        "SELECT shll_sketch(url, CAST(substr(url, 2) AS DOUBLE)) AS b"
        " FROM crawl").first()["b"])
    assert roll == direct


def test_cbf_retraction_from_sql(sql_env):
    """Counting-Bloom from SQL text: signed deltas in one aggregate,
    merged across groups, probed with cbf_maybe_contains.  Registered
    under a second prefix with a test-sized capacity — the default
    1M-capacity counter blob is ~38 MB and must not be cross-joined
    against a probe table (same rule as Bloom: few-literal probes, or
    the operators/sketch_build.py broadcast path)."""
    spark, pdf, _ = sql_env
    names = register_sql_sketches(spark, bloom_capacity=20_000,
                                  prefix="s_")
    assert "s_cbf_sketch" in names
    spark.sql("""
        SELECT s_cbf_merge(b) AS b FROM (
          SELECT host, s_cbf_sketch(v, d) AS b FROM (
            SELECT host, url AS v, 1 AS d FROM crawl
            UNION ALL
            SELECT host, url AS v, -1 AS d FROM crawl
            WHERE substr(url, 2) < '1'
          ) GROUP BY host)
    """).createOrReplaceTempView("cbf_blob")
    # removal predicate substr(url, 2) < '1' drops exactly the urls
    # whose id starts with '0' (string compare)
    kept = [u for u in pdf["url"].unique() if u[1] != "0"][:4]
    gone = [u for u in pdf["url"].unique() if u[1] == "0"][:2]
    probe = ", ".join(f"'{v}'" for v in kept + gone)
    out = {r["v"]: r["hit"] for r in spark.sql(f"""
        SELECT v, s_cbf_maybe_contains(b.b, v) AS hit
        FROM (SELECT explode(array({probe})) AS v)
        CROSS JOIN cbf_blob b
    """).collect()}
    for v in kept:
        assert out[v]            # kept urls: no false negatives
    for v in gone:
        assert out[v] in (True, False)  # back to FP noise, never crash
