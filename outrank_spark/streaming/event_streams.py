"""Streaming event-table operators: watermarked windows + custom state.

Two canonical Structured Streaming shapes over the ``events`` table
(event_id, ts, user_id, event_type, value, ...):

* :func:`windowed_event_counts` — event-time tumbling-window counts
  with a watermark: the built-in streaming aggregation path (state
  bounded by the watermark; late rows beyond it are dropped by Spark).
* :func:`sessionize_stream` — per-user session assembly as a CUSTOM
  stateful operator via ``applyInPandasWithState``: state is the open
  session (start, last event, count); a session closes when a later
  event arrives more than ``gap`` after it, and the closed session row
  is emitted downstream.

Semantics note (documented, deliberate): sessions close on the ARRIVAL
of a later out-of-gap event, not on a wall-clock timeout — so the
operator is deterministic for bounded replays (tests use
``trigger(availableNow=True)``), and an open tail session stays in
state until a later event or stream end.  Batch q18 (plans/queries.py)
is the exact-SQL oracle shape for the same sessionization.

Scale notes: state is one tiny row per ACTIVE user (not per event);
the shuffle is the groupBy(user_id) hash partitioning; Arrow batches
carry whole user-groups, no per-row Python outside the vectorized
pandas fold.
"""
from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["windowed_event_counts", "sessionize_stream",
           "SESSION_SCHEMA", "streaming_exact_dedup",
           "funnel_stream", "FUNNEL_STEP_SCHEMA"]


def windowed_event_counts(stream: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Tumbling event-time window counts with late-data watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"),
                 F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"),
                key_col, "n_events")
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def _session_fold(gap_us: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        import numpy as np

        closed: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            ).to_numpy()
            ts_us.sort()
            if ts_us.size == 0:
                continue
            # vectorized fold: prepend the open session's last event so
            # the gap test covers the state boundary, then split at
            # out-of-gap jumps
            if n > 0:
                ts_all = np.concatenate(([last_us], ts_us))
                seg_start0, seg_n0 = start_us, n
            else:
                ts_all = ts_us
                seg_start0, seg_n0 = ts_us[0], 0
            cut = np.flatnonzero(np.diff(ts_all) > gap_us) + 1
            bounds = np.concatenate(([0], cut, [ts_all.size]))
            for i in range(len(bounds) - 1):
                lo, hi = bounds[i], bounds[i + 1]
                if i == 0:
                    start_us = seg_start0
                    n = seg_n0 + (hi - lo) - (1 if seg_n0 else 0)
                else:
                    start_us = int(ts_all[lo])
                    n = hi - lo
                last_us = int(ts_all[hi - 1])
                if i < len(bounds) - 2:   # all but the trailing segment
                    closed.append((start_us, last_us, n))
        state.update((int(start_us), int(last_us), int(n)))
        if closed:
            out = pd.DataFrame(
                closed, columns=["start_us", "end_us", "n_events"],
            )
            yield pd.DataFrame({
                "user_id": user_id,
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"],
            })

    return fn


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30,
                      ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Closed per-user sessions as they complete (append mode)."""
    gap_us = gap_minutes * 60 * 1_000_000
    src = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          ts_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: drop any document whose content was
    already seen within the watermark horizon.

    State-store-backed ``dropDuplicatesWithinWatermark`` keyed on the
    SAME 128-bit content key as the batch :func:`~outrank_spark.
    operators.dedup.exact_dedup` (two independent xxhash64 lanes — a
    single 64-bit key birthday-collides at multi-billion-doc scale),
    so a batch backfill and the live stream agree on what counts as a
    duplicate.  The watermark bounds state: per-key entries expire
    once the event-time horizon passes, which is what makes this
    run forever at ingest scale — an unbounded exact-dedup stream
    would hold every content hash ever seen.
    """
    from pyspark.sql import functions as F

    from outrank_spark.operators.dedup import _content_key

    clash = [c for c in ("_h", "_h2") if c in stream.columns]
    if clash:
        raise ValueError(
            f"streaming_exact_dedup uses internal column(s) {clash} "
            "which already exist in the input — rename them first",
        )
    h1, h2 = _content_key(text_col)
    return (
        stream
        .withColumn("_h", h1).withColumn("_h2", h2)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h", "_h2"])
        .drop("_h", "_h2")
    )


FUNNEL_STEP_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("step", LongType()),
    StructField("step_ts", TimestampType()),
])

_FUNNEL_STATE_SCHEMA = StructType([
    StructField("stage", LongType()),
    StructField("t1_us", LongType()),
    StructField("last_us", LongType()),
])


def _funnel_fold(steps: list):
    k = len(steps)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        if state.exists:
            stage, t1_us, last_us = state.get
        else:
            stage, t1_us, last_us = 0, -1, -1

        advanced: list[tuple[int, int]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts", kind="stable")
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            ).to_numpy()
            types = pdf["event_type"].to_numpy()
            # k-pass vectorized advance: rows are ts-sorted, so the
            # first row matching (type == next step, ts strictly
            # after the last accepted time) IS the sequential-min
            # pick of the batch funnel.
            while stage < k:
                floor_us = last_us if stage > 0 else -(1 << 62)
                idx = np.flatnonzero(
                    (types == steps[stage]) & (ts_us > floor_us))
                if idx.size == 0:
                    break
                t = int(ts_us[idx[0]])
                stage += 1
                if stage == 1:
                    t1_us = t
                last_us = t
                advanced.append((stage, t))
        state.update((int(stage), int(t1_us), int(last_us)))
        if advanced:
            out = pd.DataFrame(advanced, columns=["step", "us"])
            yield pd.DataFrame({
                "user_id": user_id,
                "step": out["step"],
                "step_ts": pd.to_datetime(out["us"], unit="us"),
            })

    return fn


def funnel_stream(stream: DataFrame, steps: list,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Streaming ordered funnel: emits ``(user_id, step, step_ts)``
    the moment a user ADVANCES to a funnel step — the live
    counterpart of :func:`outrank_spark.operators.temporal.
    funnel_counts` (same sequential-min, strictly-after semantics).

    State is one tiny (stage, t1, last) row per user — bounded by the
    user population, never by event volume; the shuffle is the
    groupBy(user) hash partitioning and the fold is a k-pass
    vectorized scan per Arrow batch.

    Ordering caveat (documented, deliberate): parity with the batch
    operator is exact when each user's events arrive in event-time
    order across micro-batches (within a batch they are sorted
    here).  An out-of-order event OLDER than the fold's last accepted
    timestamp cannot retroactively advance the funnel — streaming
    funnels trade that reordering window for bounded state; replay
    through the batch operator when exactness over late data matters.
    """
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("funnel steps must be non-empty and distinct")
    src = stream.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("event_type"),
    ).where(F.col("event_type").isin(list(steps)))
    return src.groupBy("user_id").applyInPandasWithState(
        _funnel_fold(list(steps)),
        outputStructType=FUNNEL_STEP_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
