"""Checkpoint/resume: interrupted builds resume from lineage and end
bitwise-identical to an uninterrupted pass (north-rule requirement).
"""
from __future__ import annotations

import json
import os

import pytest

from outrank_spark.operators.sketch_build import SketchPlan, build_sketches
from outrank_spark.plans.checkpoint import (
    CheckpointedSketchBuild,
    load_planner,
    save_planner,
)
from outrank_spark.plans.combinations import CombinationPlanner
from outrank_spark.sources import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, 3000, seed=42, partitions=4).select(
        "url", "lang",
    ).cache()
    df.count()
    return df


PLAN = SketchPlan(columns=["url", "lang"],
                  sketches={"hll": {"p": 12}, "cms": {"depth": 4, "width": 1024}})


class TestCheckpointResume:
    def test_full_run_matches_plain_build(self, spark, pages, tmp_path):
        ck = CheckpointedSketchBuild(str(tmp_path / "ck1"), PLAN, n_slices=4)
        got = ck.run(pages)
        want = build_sketches(pages, PLAN)
        for key in want:
            assert got[key].to_bytes() == want[key].to_bytes(), key

    def test_interrupt_and_resume_bitwise(self, spark, pages, tmp_path):
        ckdir = str(tmp_path / "ck2")
        ck = CheckpointedSketchBuild(ckdir, PLAN, n_slices=4)

        # simulate a crash: run a limited variant that only does 2 slices
        partial = CheckpointedSketchBuild(ckdir, PLAN, n_slices=4)
        from pyspark.sql import functions as F

        sliced = pages.withColumn(
            "_slice",
            F.pmod(F.xxhash64(*[F.col(c) for c in pages.columns]), F.lit(4)),
        )
        from outrank_spark.operators.sketch_build import _scan_inputs

        for i in (0, 2):
            part = sliced.filter(F.col("_slice") == i).drop("_slice")
            blobs = _scan_inputs(part, PLAN, True).mapInPandas(
                __import__("outrank_spark.operators.sketch_build",
                           fromlist=["x"])._build_partition(PLAN),
                schema="column string, kind string, blob binary",
            )
            merged = blobs.groupBy("column", "kind").applyInPandas(
                __import__("outrank_spark.operators.sketch_build",
                           fromlist=["x"])._merge_group,
                schema="column string, kind string, blob binary",
            )
            merged.write.mode("overwrite").parquet(f"{ckdir}/slices/slice={i}")
            with open(f"{ckdir}/slices/_SLICE_{i}.done", "w") as f:
                json.dump({"slice": i, "rows": part.count(),
                           "wall_sec": 0, "n_slices": 4,
                           "sketch_keys": [list(k) for k in PLAN.keys()]}, f)

        assert partial.completed_slices() == [0, 2]
        # resume completes only the missing slices, then finalizes
        got = ck.run(pages)
        want = build_sketches(pages, PLAN)
        for key in want:
            assert got[key].to_bytes() == want[key].to_bytes(), key

    def test_finalize_refuses_incomplete(self, spark, pages, tmp_path):
        ck = CheckpointedSketchBuild(str(tmp_path / "ck3"), PLAN, n_slices=4)
        with pytest.raises(RuntimeError, match="missing"):
            ck.finalize(spark)

    def test_resume_rejects_changed_n_slices(self, spark, pages, tmp_path):
        """A marker recorded under a different slicing must fail fast —
        merging overlapping hash ranges would silently double-count."""
        ckdir = str(tmp_path / "ck_ns")
        CheckpointedSketchBuild(ckdir, PLAN, n_slices=2).run(pages)
        stale = CheckpointedSketchBuild(ckdir, PLAN, n_slices=4)
        with pytest.raises(RuntimeError, match="n_slices"):
            stale.run(pages)

    def test_resume_rejects_changed_plan(self, spark, pages, tmp_path):
        ckdir = str(tmp_path / "ck_plan")
        CheckpointedSketchBuild(ckdir, PLAN, n_slices=2).run(pages)
        other = SketchPlan(columns=["url"], sketches={"hll": {"p": 10}})
        stale = CheckpointedSketchBuild(ckdir, other, n_slices=2)
        with pytest.raises(RuntimeError, match="sketch plan"):
            stale.run(pages)

    def test_lineage_recorded(self, spark, pages, tmp_path):
        ck = CheckpointedSketchBuild(str(tmp_path / "ck4"), PLAN, n_slices=2)
        ck.run(pages)
        lin = ck.lineage()
        assert len(lin) == 2
        assert sum(e["rows"] for e in lin) == 3000
        assert all("wall_sec" in e for e in lin)


class TestPlannerState:
    def test_roundtrip(self, tmp_path):
        p = CombinationPlanner(seed=5)
        p.plan(["a", "b", "label"], "label", "MI", True, 10)
        save_planner(p, str(tmp_path))
        q = load_planner(str(tmp_path), seed=5)
        assert q.prior_counts == p.prior_counts

    def test_missing_state_fresh(self, tmp_path):
        q = load_planner(str(tmp_path / "nope"), seed=5)
        assert len(q.prior_counts) == 0
