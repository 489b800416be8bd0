"""Structured Streaming sketch accumulation.

The reference's minibatch traversal (core_ranking.py:637-683) is a
bounded incremental scan: accumulate sketches per batch, checkpoint,
refine.  SURVEY.md §2.8 notes this maps 1:1 onto Structured Streaming
— this module is that mapping: ``readStream -> foreachBatch`` where
each micro-batch runs the SAME mergeable sketch build (mapInPandas ->
grouped merge) and folds the result into the accumulated state, which
is persisted per batch (sketch blobs + batch lineage) so a restarted
query resumes exactly (merge associativity again).

Works with any streaming source; tests use a file source with
``trigger(availableNow=True)`` for deterministic, bounded runs.
"""
from __future__ import annotations

import os
import time

from outrank_spark.operators.sketch_build import (
    SketchCollection,
    SketchPlan,
    build_sketches,
)
from outrank_spark.sketches import sketch_from_bytes

__all__ = ["StreamingSketchAccumulator", "keyed_sketch_stream"]


class StreamingSketchAccumulator:
    def __init__(self, plan: SketchPlan, state_dir: str | None = None):
        self.plan = plan
        self.state_dir = state_dir
        self.state = SketchCollection()
        self.batches_seen: list[dict] = []
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._restore()

    # -- state persistence -------------------------------------------
    def _blob_path(self) -> str:
        return os.path.join(self.state_dir, "sketch_state.bin")

    def _persist(self) -> None:
        """Sketch blobs AND the batches-seen manifest go into ONE
        atomically-replaced file: a two-file persist could crash
        between the writes, leaving a batch merged into state but
        missing from the manifest — the restarted stream would replay
        it and double-count every additive sketch."""
        if not self.state_dir:
            return
        import pickle

        record = {
            "blobs": {
                f"{c}\x1f{k}": sk.to_bytes()
                for (c, k), sk in self.state.items()
            },
            "batches_seen": self.batches_seen,
        }
        tmp = self._blob_path() + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(record, f, protocol=4)
        os.replace(tmp, self._blob_path())

    def _restore(self) -> None:
        import pickle

        if os.path.exists(self._blob_path()):
            with open(self._blob_path(), "rb") as f:
                record = pickle.load(f)
            for key, blob in record["blobs"].items():
                c, k = key.split("\x1f")
                self.state[(c, k)] = sketch_from_bytes(k, blob)
            self.batches_seen = record["batches_seen"]

    # -- the foreachBatch hook ---------------------------------------
    def process_batch(self, batch_df, batch_id: int) -> None:
        if any(b["batch_id"] == batch_id for b in self.batches_seen):
            return  # replayed batch after restart — idempotent skip
        t0 = time.time()
        delta = build_sketches(batch_df, self.plan)
        for key, sk in delta.items():
            if key in self.state:
                self.state[key].merge(sk)
            else:
                self.state[key] = sk
        self.batches_seen.append({
            "batch_id": int(batch_id),
            "rows": batch_df.count(),
            "wall_sec": round(time.time() - t0, 3),
        })
        self._persist()

    def attach(self, stream_df, checkpoint_dir: str, query_name: str = "sketches"):
        """writeStream wiring: returns the started StreamingQuery."""
        return (
            stream_df.writeStream
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .foreachBatch(self.process_batch)
            .start()
        )

    def estimates(self):
        return self.state.summary()


def keyed_sketch_stream(stream, key_col: str, value_col: str,
                        kind: str = "hll", params: dict | None = None):
    """Per-KEY mergeable sketch state over a stream (the keyed
    companion to :class:`StreamingSketchAccumulator`'s global fold):
    ``groupBy(key).applyInPandasWithState`` holds one serialized
    sketch blob per key in the state store, updates it with each
    micro-batch's values, and emits ``(key, n_seen, estimate, blob)``
    in update mode — per-host streaming cardinalities whose blobs
    stay rollup-able (operators/sketch_build.rollup_grouped_sketches)
    and restart-safe (the state store checkpoints with the query).

    Because register/KMV folds are commutative-idempotent, the final
    per-key blob is BITWISE identical to a batch
    ``build_grouped_sketches`` over the same rows, for ANY micro-batch
    slicing — pinned in tests/test_sketch_rollup.py.  ``n_seen`` is
    the cumulative non-null row count, so "latest emission per key" =
    max n_seen (memory-sink rows carry no order guarantee).

    ``kind`` must expose ``estimate()`` (hll / theta / counter-style
    cardinality sketches); quantile sketches stream through the same
    state shape but need a different finalize — use the batch
    ``grouped_quantiles`` path or extend here.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from outrank_spark.sketches import SKETCH_REGISTRY

    params = dict(params or {})
    if kind == "hll":
        # match build_grouped_sketches' sparse default so streaming
        # per-key blobs stay bitwise-comparable/mergeable with the
        # batch build (sparse and dense HLL families do not merge)
        params.setdefault("sparse", True)
    if not hasattr(SKETCH_REGISTRY[kind](**params), "estimate"):
        raise ValueError(f"kind {kind!r} has no estimate(); "
                         "keyed_sketch_stream is for cardinality sketches")

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            blob, n_seen = state.get
            sk = sketch_from_bytes(kind, bytes(blob))
        else:
            sk, n_seen = SKETCH_REGISTRY[kind](**params), 0
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n_seen += len(vals)
            if len(vals):
                sk.update(vals.to_numpy())
        blob = sk.to_bytes()
        state.update((blob, int(n_seen)))
        yield pd.DataFrame({
            "key": [key[0]], "n_seen": [int(n_seen)],
            "estimate": [int(sk.estimate())], "blob": [blob],
        })

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).alias(value_col),
    )
    return src.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, n_seen long, estimate long, "
                         "blob binary",
        stateStructType="blob binary, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
