"""Streaming sliding-window distinct monitor: stream == batch on the
BLOB, live window estimates, restart idempotency."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from outrank_spark.streaming.sliding_stream import StreamingSlidingDistinct


class TestStreamingSlidingDistinct:
    def _write(self, spark, tmp_path):
        from pyspark.sql import functions as F

        rng = np.random.default_rng(3)
        chunks = []
        data_dir = str(tmp_path / "ev")
        for lo in (0, 300, 700):
            pdf = pd.DataFrame({
                "user": [f"u{int(v)}"
                         for v in rng.integers(0, 3000, 4000)],
                "sec": rng.uniform(lo, lo + 300, 4000),
            })
            chunks.append(pdf)
            (spark.createDataFrame(pdf)
             .withColumn("ts", F.timestamp_seconds("sec"))
             .select("user", "ts")
             .coalesce(1).write.mode("append").parquet(data_dir))
        return chunks, data_dir

    def test_stream_blob_equals_batch_blob(self, spark, tmp_path):
        from outrank_spark.operators.sketch_build import (
            build_sliding_hll_blob,
        )

        chunks, data_dir = self._write(spark, tmp_path)
        mon = StreamingSlidingDistinct(
            "user", "ts", p=11, state_dir=str(tmp_path / "state"))
        stream = (spark.readStream
                  .schema("user string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(data_dir))
        q = mon.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert len(mon.batches_seen) == 3
        batch_blob = build_sliding_hll_blob(
            spark.read.parquet(data_dir), "user", "ts", p=11)
        assert mon.sketch.to_bytes() == batch_blob

    def test_live_window_estimates_within_bound(self, spark, tmp_path):
        chunks, data_dir = self._write(spark, tmp_path)
        mon = StreamingSlidingDistinct(
            "user", "ts", p=12, state_dir=None)
        stream = (spark.readStream
                  .schema("user string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(data_dir))
        q = mon.attach(stream, str(tmp_path / "ckpt2"))
        q.awaitTermination(120)
        allpdf = pd.concat(chunks, ignore_index=True)
        sigma = 1.04 / np.sqrt(2 ** 12)
        for t0 in (0.0, 500.0, 800.0):
            exact = allpdf[allpdf["sec"] >= t0]["user"].nunique()
            got = mon.estimate(t0)
            assert abs(got - exact) / max(exact, 1) <= 3 * sigma
        rep = {r["window"]: r["est_distinct"] for r in
               mon.report(spark, {"all": 0.0, "late": 800.0}).collect()}
        assert rep["all"] == mon.estimate(0.0)
        assert rep["late"] == mon.estimate(800.0)

    def test_restart_replay_is_idempotent(self, spark, tmp_path):
        chunks, data_dir = self._write(spark, tmp_path)
        state = str(tmp_path / "state3")
        mon = StreamingSlidingDistinct("user", "ts", p=11,
                                       state_dir=state)
        stream = (spark.readStream
                  .schema("user string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(data_dir))
        q = mon.attach(stream, str(tmp_path / "ckpt3"))
        q.awaitTermination(120)
        before = mon.sketch.to_bytes()
        mon2 = StreamingSlidingDistinct("user", "ts", p=11,
                                        state_dir=state)
        assert mon2.sketch.to_bytes() == before
        replay = spark.read.parquet(data_dir)
        for b in mon.batches_seen:
            mon2.process_batch(replay, b["batch_id"])  # must skip
        assert mon2.sketch.to_bytes() == before
        assert len(mon2.batches_seen) == len(mon.batches_seen)
        with pytest.raises(ValueError, match="precision"):
            StreamingSlidingDistinct("user", "ts", p=12,
                                     state_dir=state)
