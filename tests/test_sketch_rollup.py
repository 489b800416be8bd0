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


class TestKeyedSketchStream:
    SCHEMA = "host string, url string"

    def _run(self, spark, tmp_path, frames, name):
        from outrank_spark.streaming.sketch_stream import keyed_sketch_stream

        data_dir = str(tmp_path / f"{name}_data")
        for pdf in frames:
            spark.createDataFrame(pdf, self.SCHEMA).coalesce(1).write.mode(
                "append").parquet(data_dir)
        stream = (
            spark.readStream.schema(self.SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(data_dir)
        )
        q = (
            keyed_sketch_stream(stream, "host", "url",
                                kind="hll", params={"p": 10})
            .writeStream.format("memory").queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        out = spark.sql(f"select * from {name}").toPandas()
        # latest emission per key = max cumulative n_seen
        latest = out.loc[out.groupby("key")["n_seen"].idxmax()]
        return {r["key"]: (int(r["n_seen"]), int(r["estimate"]),
                           bytes(r["blob"]))
                for _, r in latest.iterrows()}

    def test_stream_blobs_bitwise_equal_batch_build(self, spark, tmp_path):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        rows = pd.DataFrame({
            "host": [f"h{int(rng.integers(0, 6))}" for _ in range(900)],
            "url": [f"u{int(rng.integers(0, 400))}" for _ in range(900)],
        })
        got = self._run(
            spark, tmp_path,
            [rows.iloc[:300], rows.iloc[300:520], rows.iloc[520:]],
            "keyed_hll",
        )
        batch = _blob_map(build_grouped_sketches(
            spark.createDataFrame(rows, self.SCHEMA), "host", "url",
            kind="hll", params={"p": 10},
        ))
        assert got.keys() == batch.keys()
        for k, (n, est, blob) in got.items():
            assert blob == batch[k]          # byte-for-byte vs batch
        total = sum(n for n, _, _ in got.values())
        assert total == len(rows)

    def test_streamed_blobs_feed_the_rollup(self, spark, tmp_path):
        import pandas as pd

        rows = pd.DataFrame({
            "host": ["a.com"] * 50 + ["b.com"] * 50 + ["c.de"] * 50,
            "url": [f"u{i}" for i in range(150)],
        })
        got = self._run(spark, tmp_path, [rows.iloc[:75], rows.iloc[75:]],
                        "keyed_roll")
        blobs = spark.createDataFrame(
            [(k, blob) for k, (_, _, blob) in got.items()],
            "key string, blob binary",
        )
        total = _blob_map(rollup_grouped_sketches(blobs, F.lit("*")))
        est = sketch_from_bytes("hll", total["*"]).estimate()
        assert abs(est - 150) / 150 < 0.15

    def test_rejects_non_cardinality_kind(self, spark):
        import pytest as _pytest

        from outrank_spark.streaming.sketch_stream import keyed_sketch_stream

        with _pytest.raises(ValueError, match="estimate"):
            keyed_sketch_stream(None, "k", "v", kind="kll",
                                params={"k": 200})
