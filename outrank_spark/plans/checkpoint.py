"""Checkpointed sketch building with per-slice lineage (north rule:
"checkpoints per-partition sketch state + lineage so ranking jobs
resume mid-scan").

The input is divided into ``n_slices`` *deterministic* slices by a
hash of the slice key (order-free, stable across partitionings —
unlike Spark partition ids).  Each slice's partial sketch blobs land
in ``<dir>/slices/slice=<i>/`` with an atomic ``_SLICE_<i>.done``
lineage marker recording row counts and wall time.  Resume = read the
manifest, run only missing slices, merge everything; because merges
are associative, a resumed run's final sketches are bitwise-identical
to a single uninterrupted pass (tested).

The reference's analogue is the per-batch ``ranking_checkpoint_tmp.tsv``
median dump (core_ranking.py:583-589) — state only, no lineage, no
resume logic; this operator adds both.

The planner's prior-combination counts (core_ranking.py:50-65 state)
ride along in the same manifest via ``save_planner``/``load_planner``.
"""
from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import functions as F

from outrank_spark.operators.sketch_build import (
    SketchCollection,
    SketchPlan,
    _build_partition,
    _merge_group,
    _scan_inputs,
)
from outrank_spark.plans.combinations import CombinationPlanner
from outrank_spark.sketches import sketch_from_bytes

__all__ = ["CheckpointedSketchBuild", "save_planner", "load_planner"]

_BLOB_SCHEMA = "column string, kind string, blob binary"


class CheckpointedSketchBuild:
    def __init__(self, ckpt_dir: str, plan: SketchPlan, n_slices: int = 16,
                 slice_key_cols=None):
        self.dir = ckpt_dir
        self.plan = plan
        self.n_slices = n_slices
        self.slice_key_cols = slice_key_cols
        os.makedirs(os.path.join(ckpt_dir, "slices"), exist_ok=True)

    # -- lineage ------------------------------------------------------
    def _marker(self, i: int) -> str:
        return os.path.join(self.dir, "slices", f"_SLICE_{i}.done")

    def _expected_keys(self) -> list[list[str]]:
        return [list(k) for k in self.plan.keys()]

    def _validate_marker(self, i: int) -> None:
        """Fail fast if a completed slice was built under a DIFFERENT
        config: merging slices from mismatched n_slices (overlapping
        hash ranges) or sketch plans would silently double-count or
        drop data with a success exit."""
        with open(self._marker(i)) as f:
            rec = json.load(f)
        if rec.get("n_slices") != self.n_slices:
            raise RuntimeError(
                f"checkpoint slice {i} was built with n_slices="
                f"{rec.get('n_slices')}, current config has "
                f"{self.n_slices}; wipe {self.dir} or restore the "
                "original slicing",
            )
        if rec.get("sketch_keys") != self._expected_keys():
            raise RuntimeError(
                f"checkpoint slice {i} was built under a different "
                f"sketch plan; wipe {self.dir} or restore the plan",
            )

    def completed_slices(self) -> list[int]:
        done = sorted(
            i for i in range(self.n_slices) if os.path.exists(self._marker(i))
        )
        for i in done:
            self._validate_marker(i)
        return done

    def lineage(self) -> list[dict]:
        out = []
        for i in self.completed_slices():
            with open(self._marker(i)) as f:
                out.append(json.load(f))
        return out

    # -- build --------------------------------------------------------
    def run(self, df) -> SketchCollection:
        """Process missing slices, then merge all slices' blobs."""
        key_cols = self.slice_key_cols or df.columns
        sliced = df.withColumn(
            "_slice",
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]),
                   F.lit(self.n_slices)),
        )
        done = set(self.completed_slices())
        for i in range(self.n_slices):
            if i in done:
                continue
            t0 = time.time()
            part = sliced.filter(F.col("_slice") == i).drop("_slice")
            n_rows = part.count()
            blobs = _scan_inputs(part, self.plan, True).mapInPandas(
                _build_partition(self.plan), schema=_BLOB_SCHEMA,
            )
            merged = (
                blobs.groupBy("column", "kind")
                .applyInPandas(_merge_group, schema=_BLOB_SCHEMA)
            )
            out_path = os.path.join(self.dir, "slices", f"slice={i}")
            merged.write.mode("overwrite").parquet(out_path)
            tmp = self._marker(i) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({
                    "slice": i, "rows": n_rows,
                    "wall_sec": round(time.time() - t0, 3),
                    "n_slices": self.n_slices,
                    "sketch_keys": [list(k) for k in self.plan.keys()],
                }, f)
            os.replace(tmp, self._marker(i))  # atomic lineage commit
        return self.finalize(df.sparkSession)

    def finalize(self, spark) -> SketchCollection:
        """Merge every completed slice's blobs into final sketches.

        Reads ONLY the marker-validated slice dirs 0..n_slices-1 —
        never a glob — so stale dirs from an earlier run with a
        different slicing can't leak into the merge."""
        done = self.completed_slices()  # validates every marker
        if len(done) != self.n_slices:
            missing = set(range(self.n_slices)) - set(done)
            raise RuntimeError(f"slices not complete, missing {sorted(missing)}")
        all_blobs = spark.read.parquet(
            *[os.path.join(self.dir, "slices", f"slice={i}") for i in done],
        )
        rows = (
            all_blobs.groupBy("column", "kind")
            .applyInPandas(_merge_group, schema=_BLOB_SCHEMA)
            .collect()
        )
        return SketchCollection({
            (r["column"], r["kind"]): sketch_from_bytes(r["kind"], bytes(r["blob"]))
            for r in rows
        })


def save_planner(planner: CombinationPlanner, ckpt_dir: str) -> None:
    path = os.path.join(ckpt_dir, "planner_state.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(planner.state(), f)
    os.replace(tmp, path)


def load_planner(ckpt_dir: str, seed: int = 123) -> CombinationPlanner:
    planner = CombinationPlanner(seed=seed)
    path = os.path.join(ckpt_dir, "planner_state.json")
    if os.path.exists(path):
        with open(path) as f:
            planner.restore(json.load(f))
    return planner
