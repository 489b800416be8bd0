"""rollup_grouped_sketches: the blob-level mergeability proof.

The north rule requires order-independent sketch merges to bitwise-
equal estimates; the strongest form is that rolling per-fine-key
blobs UP a hierarchy equals building the coarse sketch directly from
the base data — byte-for-byte, because HLL registers are a max-fold
and KMV/Bloom are set-folds, all commutative-idempotent."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.sketch_build import (
    build_grouped_sketches,
    finalize_cardinalities,
    rollup_grouped_sketches,
)
from outrank_spark.sketches import sketch_from_bytes


@pytest.fixture(scope="module")
def pages_like(spark):
    # (host, url): Zipf-ish hosts across 3 tlds, urls unique per row
    return spark.range(6000).select(
        F.concat(
            F.lit("site"),
            (F.pmod(F.xxhash64("id"), F.lit(40)) % 40).cast("string"),
            F.element_at(
                F.array(F.lit(".com"), F.lit(".org"), F.lit(".de")),
                (F.pmod(F.xxhash64("id"), F.lit(40)) % 3 + 1).cast("int"),
            ),
        ).alias("host"),
        F.concat(F.lit("/p"), (F.col("id") % 4500).cast("string"))
        .alias("url"),
    ).withColumn("url", F.concat("host", "url"))


def _blob_map(blobs):
    return {r["key"]: bytes(r["blob"]) for r in blobs.collect()}


def test_rollup_bitwise_equals_direct_build(spark, pages_like):
    per_host = build_grouped_sketches(pages_like, "host", "url",
                                      kind="hll", params={"p": 12})
    tld_expr = F.substring_index("key", ".", -1)
    rolled = _blob_map(rollup_grouped_sketches(per_host, tld_expr))
    direct = _blob_map(build_grouped_sketches(
        pages_like.withColumn("tld", F.substring_index("host", ".", -1)),
        "tld", "url", kind="hll", params={"p": 12},
    ))
    assert rolled.keys() == direct.keys() == {"com", "org", "de"}
    assert rolled == direct  # byte-for-byte

    # second level: tlds -> grand total, still bitwise vs one global
    total = _blob_map(rollup_grouped_sketches(
        rollup_grouped_sketches(per_host, tld_expr), F.lit("*"),
    ))
    direct_total = _blob_map(build_grouped_sketches(
        pages_like.withColumn("g", F.lit("*")), "g", "url",
        kind="hll", params={"p": 12},
    ))
    assert total == direct_total


def test_finalized_estimates_inside_published_bound(spark, pages_like):
    per_host = build_grouped_sketches(pages_like, "host", "url",
                                      kind="hll", params={"p": 12})
    est = {
        r["key"]: r["estimate"]
        for r in finalize_cardinalities(
            rollup_grouped_sketches(per_host, F.lit("*")),
        ).collect()
    }["*"]
    exact = pages_like.select("url").distinct().count()
    sigma = 1.04 / (2 ** 12) ** 0.5
    assert abs(est - exact) / exact <= 4 * sigma


def test_rollup_partitioning_invariance(spark, pages_like):
    tld_expr = F.substring_index("key", ".", -1)
    a = _blob_map(rollup_grouped_sketches(
        build_grouped_sketches(pages_like.repartition(1), "host", "url",
                               kind="hll", params={"p": 12}),
        tld_expr,
    ))
    b = _blob_map(rollup_grouped_sketches(
        build_grouped_sketches(pages_like.repartition(13), "host", "url",
                               kind="hll", params={"p": 12}),
        tld_expr,
    ))
    assert a == b


def test_theta_rollup_estimates_match_direct(spark, pages_like):
    # KMV keeps the k smallest hashes — a set-fold, so rollup equals
    # direct build at the ESTIMATE level (serialization may order
    # entries differently, so compare estimates, not bytes)
    per_host = build_grouped_sketches(pages_like, "host", "url",
                                      kind="theta", params={"k": 256})
    rolled = rollup_grouped_sketches(per_host, F.lit("*"), kind="theta")
    direct = build_grouped_sketches(
        pages_like.withColumn("g", F.lit("*")), "g", "url",
        kind="theta", params={"k": 256},
    )
    r = sketch_from_bytes("theta", _blob_map(rolled)["*"]).estimate()
    d = sketch_from_bytes("theta", _blob_map(direct)["*"]).estimate()
    assert r == pytest.approx(d, rel=1e-12)
