"""Streaming drift monitoring: PSI against a frozen reference
snapshot, accumulated over micro-batches.

The batch drift family (operators/drift.py) answers "did this month's
corpus shift?" between two static snapshots.  A continuously-crawled
pipeline wants the same answer PER MICRO-BATCH without re-scanning
the reference: freeze the reference's exact-quantile bin edges and
per-bin counts ONCE (driver-held metadata, <= bins rows), then each
micro-batch pays one zero-shuffle binning scan + a <= bins-row
aggregate, folded into cumulative per-bin counts.

Equality contract: after any micro-batch slicing of a dataset, the
monitor's :meth:`report` is BITWISE equal to
``psi_drift(ref, all_rows_so_far)`` — binning uses the identical
frozen edges and strict ``v > b`` expression (operators/
drift.psi_bin_counts), and shares/psi_term are evaluated by the same
Spark double expressions (drift.psi_from_counts); bin-count addition
over batches is exact integer math, so slicing cannot move a value
across bins or perturb a share.

Restart safety follows the StreamingSketchAccumulator recipe
(sketch_stream.py): cumulative counts + the batches-seen manifest are
ONE atomically-replaced pickle, and a replayed ``batch_id`` after a
restart is an idempotent skip — counts never double-fold even when
the query checkpoint re-delivers the last uncommitted batch.

No reference-repo counterpart; north-rule operations addition
(SURVEY.md §2.9d drift family, streaming leg).
"""
from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame

from outrank_spark.operators.drift import (
    psi_bin_counts,
    psi_bin_edges,
    psi_from_counts,
)

__all__ = ["StreamingDriftMonitor"]


class StreamingDriftMonitor:
    """``foreachBatch`` hook that tracks PSI of a stream against a
    frozen reference snapshot.

    Parameters mirror :func:`outrank_spark.operators.drift.psi_drift`;
    ``state_dir`` (optional) makes the monitor restart-safe: state is
    persisted per batch and restored on construction, and replayed
    batch ids are skipped.
    """

    def __init__(self, ref: DataFrame, value_col: str, bins: int = 10,
                 eps: float = 1e-6, boundary_scale: int = 6,
                 state_dir: str | None = None):
        self.value_col = value_col
        self.bins = int(bins)
        self.eps = float(eps)
        self.state_dir = state_dir
        self.edges = psi_bin_edges(ref, value_col, bins, boundary_scale)
        self.ref_counts = psi_bin_counts(ref, value_col, self.edges)
        self.cur_counts: dict[int, int] = {}
        self.batches_seen: list[dict] = []
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._restore()

    # -- state persistence (the sketch_stream one-file recipe) -------
    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "psi_state.pkl")

    def _persist(self) -> None:
        if not self.state_dir:
            return
        import pickle

        record = {
            "edges": self.edges,
            "ref_counts": self.ref_counts,
            "cur_counts": self.cur_counts,
            "batches_seen": self.batches_seen,
        }
        tmp = self._state_path() + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(record, f, protocol=4)
        os.replace(tmp, self._state_path())

    def _restore(self) -> None:
        import pickle

        if not os.path.exists(self._state_path()):
            return
        with open(self._state_path(), "rb") as f:
            record = pickle.load(f)
        if record["edges"] != self.edges:
            raise ValueError(
                "persisted PSI state was built against different "
                "reference edges — drift state is only resumable "
                "against the SAME frozen reference snapshot")
        self.ref_counts = record["ref_counts"]
        self.cur_counts = record["cur_counts"]
        self.batches_seen = record["batches_seen"]

    # -- the foreachBatch hook ----------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if any(b["batch_id"] == batch_id for b in self.batches_seen):
            return  # replayed batch after restart — idempotent skip
        t0 = time.time()
        counts = psi_bin_counts(batch_df, self.value_col, self.edges)
        for b, n in counts.items():
            self.cur_counts[b] = self.cur_counts.get(b, 0) + n
        self.batches_seen.append({
            "batch_id": int(batch_id),
            "rows": int(sum(counts.values())),
            "wall_sec": round(time.time() - t0, 3),
        })
        self._persist()

    def attach(self, stream_df, checkpoint_dir: str,
               query_name: str = "psi_drift"):
        """writeStream wiring: returns the started StreamingQuery."""
        return (
            stream_df.writeStream
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .foreachBatch(self.process_batch)
            .start()
        )

    # -- reporting ------------------------------------------------------
    def report(self, spark) -> DataFrame:
        """``(bin, ref_share, cur_share, psi_term)`` — bitwise equal
        to ``psi_drift(ref, union_of_all_batches_seen)``."""
        return psi_from_counts(spark, self.ref_counts, self.cur_counts,
                               self.bins, self.eps)

    def psi(self, spark) -> float:
        return float(sum(r["psi_term"]
                         for r in self.report(spark).collect()))
