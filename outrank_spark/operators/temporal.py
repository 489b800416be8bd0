"""Temporal joins Spark lacks natively: the as-of join.

``asof_join`` matches every left row to the most recent right row at
or before its timestamp (per key) — the canonical point-in-time lookup
of feature stores and market data ("what was the user's last order
when this event happened?").

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do), and the naive
formulations are scale traps: an inequality join is a cartesian-per-
key, and a windowed subquery per left row re-sorts per lookup.  This
implementation is the union-and-carry-forward plan:

1. union the two relations into one stream tagged by side, with the
   right side's payload as a struct column (left payload stays flat);
2. one window sort per key over (time, side) — right rows sort BEFORE
   left rows at equal timestamps, so "at or before" is inclusive;
3. ``last(payload, ignorenulls=True)`` carries the latest right row
   forward; left rows then just read it.

Cost: ONE shuffle + sort of |L|+|R| rows keyed by the join key — the
same complexity as a regular sort-merge join, no inequality blowup.
Skewed keys behave like any window (a hot key's rows sort in one
partition); pre-filter or salt upstream if a single key dominates.

Right-side duplicates at the same (key, time) are resolved by
``tiebreak`` (largest wins), making results deterministic and
cross-engine comparable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["epoch_us_expr", "asof_join", "range_join", "funnel_counts",
           "cohort_retention", "snapshot_diff",
           "densify_time_series", "merge_intervals",
           "sessionize", "rolling_stats", "decayed_aggregate"]


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_time: str, right_time: str,
              tiebreak: str | None = None) -> DataFrame:
    """Left as-of join: all left columns + the right row (as struct
    fields suffixed ``_asof``) with the greatest ``right_time`` <=
    ``left_time`` for the same ``by`` key; right columns are NULL when
    no prior right row exists.
    """
    reserved = {"_key", "_t", "_side", "_r", "_match", "_rk"}
    clash = (reserved & set(left.columns) | reserved & set(right.columns)
             | {c for c in left.columns if c.startswith("_l_")})
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    out_clash = {
        f"{c}_asof" for c in right.columns if c != by
    } & set(left.columns)
    if out_clash:
        raise ValueError(
            f"output columns would collide with left columns: {out_clash}",
        )
    r = right
    if tiebreak is not None:
        # deterministic winner among same-(key, time) right rows
        w_dup = Window.partitionBy(by, right_time).orderBy(
            F.desc(tiebreak))
        r = (
            right.withColumn("_rk", F.row_number().over(w_dup))
            .where(F.col("_rk") == 1).drop("_rk")
        )
    r_payload = F.struct(*[
        F.col(c).alias(c) for c in r.columns if c != by
    ])
    r_tagged = r.select(
        F.col(by).alias("_key"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        r_payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        F.col(by).alias("_key"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            r_tagged.schema["_r"].dataType,
        ).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_key")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w),
    )
    out_cols = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ] + [
        F.col(f"_match.{f.name}").alias(f"{f.name}_asof")
        for f in r_tagged.schema["_r"].dataType.fields
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame, by: str,
               point_col: str, start_col: str, end_col: str,
               bucket_seconds: int = 86400) -> DataFrame:
    """Point-in-interval join (start <= point <= end, same key) as a
    bucketed EQUI-join — the scale-safe plan for the interval join
    Spark would otherwise execute as a per-key nested loop.

    Intervals explode to one row per covered time bucket; points carry
    exactly ONE bucket, so the equi-join on (key, bucket) finds every
    containing interval exactly once (no post-dedup) and the final
    range predicate just filters.  Cost: |I| * avg_buckets_per_interval
    exploded rows + one hash join — pick ``bucket_seconds`` near the
    typical interval length so the blow-up factor stays small.
    """
    clash = {"_b", "_rkey"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    p = points.withColumn(
        "_b", F.floor(F.col(point_col).cast("timestamp").cast("long")
                      / bucket_seconds),
    )
    i = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("timestamp").cast("long")
                        / bucket_seconds),
                F.floor(F.col(end_col).cast("timestamp").cast("long")
                        / bucket_seconds),
            ),
        ).alias("_b"),
    )
    joined = p.join(i.withColumnRenamed(by, "_rkey"),
                    (F.col(by) == F.col("_rkey"))
                    & (p["_b"] == i["_b"]))
    return (
        joined.where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col)),
        )
        .drop("_b", "_rkey")
    )


def funnel_counts(df: DataFrame, steps: list, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  horizon_seconds: int | None = None) -> DataFrame:
    """Ordered-funnel conversion counts: for ``steps = [A, B, C]``,
    how many users did A, then B strictly after it, then C strictly
    after that — the sequential-min semantic (step k's time is the
    MINIMUM timestamp of a step-k event strictly after step k-1's
    time; greedy-earliest is provably optimal for it, so one ordered
    fold per user computes every step time exactly).

    ``horizon_seconds`` (optional) caps the whole funnel: steps 2..k
    must land within that many seconds of the user's step-1 time.

    Scale shape: the ``isin(steps)`` filter pushes to the scan, then
    ONE shuffle keyed by user; per-user state is that user's own
    funnel events (collect_list + array_sort), bounded by per-user
    activity, never corpus-wide.  The fold and the final
    furthest-step indicator sums are all-JVM (``F.aggregate`` — no
    Python in the hot path); output is k rows.

    Shuffle-byte packing: each event ships as ONE long —
    ``t << kbits | s`` (micros timestamp, step index in the low
    bits) — instead of a ``struct(t, s)``: an 8-byte packed array
    element vs ~16 + offsets for the struct, roughly halving the
    bytes through the operator's only shuffle (its measured
    single-box ceiling).  The packing is order-exact: for
    ``0 <= s < 2^kbits`` the packed long sorts identically to
    lexicographic ``(t, s)`` (including negative/pre-1970 t —
    arithmetic shiftright is floor division), and the fold decodes
    with shift/mask, so semantics are bit-identical to the struct
    form.

    Returns ``(step, event_type, n_users)`` where ``n_users`` counts
    users whose furthest step reached is >= ``step`` (1-based), so
    rows are monotone non-increasing — the classic funnel chart.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    horizon_us = (None if horizon_seconds is None
                  else int(horizon_seconds) * 1_000_000)

    # packed-event encoding (see docstring): kbits low bits hold the
    # step index, the rest the micros timestamp
    kbits = max(1, (k - 1).bit_length())
    ev = (
        df.where(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("_u"),
            (
                F.shiftleft(
                    F.unix_micros(F.col(ts_col).cast("timestamp")), kbits,
                ).cast("long")
                + (F.array_position(steps_lit, F.col(type_col)) - 1)
                .cast("long")
            ).alias("_e"),
        )
    )
    per_user = ev.groupBy("_u").agg(
        F.array_sort(F.collect_list("_e")).alias("_evs"),
    )

    def fold(acc, e):
        # acc: (stage, t1, last) — stage = steps completed so far
        s = e.bitwiseAND(F.lit((1 << kbits) - 1))
        t = F.shiftright(e, kbits)
        advance = (s == acc["stage"].cast("long")) & (
            (acc["stage"] == 0) | (t > acc["last"])
        )
        if horizon_us is not None:
            advance = advance & (
                (acc["stage"] == 0) | (t <= acc["t1"] + horizon_us)
            )
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"),
                F.when(acc["stage"] == 0, t)
                .otherwise(acc["t1"]).alias("t1"),
                t.alias("last"),
            ),
        ).otherwise(acc)

    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("last"),
    )
    furthest = per_user.select(
        F.aggregate("_evs", zero, fold)["stage"].alias("_stage"),
    )
    counts = furthest.agg(*[
        F.sum((F.col("_stage") >= i + 1).cast("long"))
        .alias(f"_s{i}") for i in range(k)
    ])
    # typed unpivot — step names are caller data, never spliced into
    # SQL text (a step containing a quote must survive)
    rows = F.array(*[
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("event_type"),
            F.coalesce(F.col(f"_s{i}"), F.lit(0).cast("long"))
             .alias("n_users"),
        )
        for i in range(k)
    ])
    return (
        counts.select(F.explode(rows).alias("__r"))
        .select("__r.step", "__r.event_type", "__r.n_users")
        .orderBy("step")
    )


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     max_offset: int | None = None) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the ISO
    week of their FIRST event; each (cohort_week, week_offset) cell
    counts distinct users active that many weeks later.

    Shape: one groupBy(user) for first-seen (map-side combinable
    min), one user-keyed shuffle join back (AQE; both sides already
    hash on user so the exchange is shared), one exact
    count_distinct agg.  At 100 TB swap the exact distinct for the
    HLL rollup (sketches/hll.py) — cells stay mergeable across
    partitions/days; this exact shape is the oracle semantic.

    Returns ``(cohort_week date, week_offset int, n_users)``.
    """
    firsts = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.date_trunc("week", F.min(F.col(ts_col).cast("timestamp")))
        .alias("_cw"),
    )
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.date_trunc("week", F.col(ts_col).cast("timestamp")).alias("_w"),
    )
    cells = (
        ev.join(firsts, "_u")
        .select(
            "_u", F.col("_cw"),
            (F.datediff(F.col("_w"), F.col("_cw")) / 7)
            .cast("int").alias("week_offset"),
        )
    )
    if max_offset is not None:
        cells = cells.where(F.col("week_offset") <= int(max_offset))
    return (
        cells.groupBy(
            F.col("_cw").cast("date").alias("cohort_week"), "week_offset",
        )
        .agg(F.count_distinct("_u").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list,
                  compare_cols: list) -> DataFrame:
    """CDC-style diff between two snapshots of the same table (the
    incremental-crawl shape: yesterday's pages vs today's re-crawl):
    one row per key with ``status`` in ``added`` (key only in new),
    ``removed`` (only in old), ``changed`` (present in both, any
    compare column differs, null-safely), ``unchanged``.

    Scale shape: ONE full-outer equi-join on the key — the minimal
    plan for a diff; comparison is a null-safe JVM expression over
    the joined row (`eqNullSafe` per column), so content columns are
    never hashed driver-side and never shuffled twice.  At 10^12
    rows both sides arrive partitioned by the same key from the
    ingest sinks, so the join is co-partitioned; downstream, `added
    + changed` keys are exactly the work-list an incremental
    pipeline re-processes (the latest-capture dedup in
    jobs/ingest_warc.py is the intra-snapshot companion).

    Keys must be unique per snapshot (a snapshot is a state, not a
    log); enforce upstream with the latest-capture window.  An empty
    ``compare_cols`` is the presence-only diff (matched keys always
    read ``unchanged``); empty ``key_cols`` is an error — an
    unconditioned full-outer join is never what a diff means.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    same = F.lit(True)  # presence-only diff when compare_cols == []
    for c in compare_cols:
        same = same & F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
          for k in key_cols],
        status.alias("status"),
    )


def densify_time_series(df: DataFrame, ts_col: str, group_col: str,
                        bucket: str = "hour",
                        agg_col: str | None = None) -> DataFrame:
    """Gap-filled (densified) time series: per ``group_col`` value and
    time bucket, the event count (and ``sum(agg_col)`` when given),
    with an explicit ZERO row for every bucket in the global
    [min(ts), max(ts)] span that has no events for that group — the
    timescaledb ``time_bucket_gapfill`` / BI "densification" operator
    a plain GROUP BY cannot express (absent groups simply vanish,
    silently corrupting moving averages and anomaly baselines
    downstream).

    Plan shape (scale-safe at 100 TB):

    1. facts collapse FIRST: one map-side-combinable
       ``groupBy(group, bucket)`` — the only shuffle that sees event
       volume;
    2. the bucket spine is generated from a 1-row global min/max
       aggregate via ``sequence()`` + ``explode`` — never from the
       fact table — and cross-joined with the DISTINCT group values
       (a second tiny aggregate), so the grid costs
       |groups| x |buckets| rows, which is exactly the output size;
    3. the grid left-joins the pre-aggregated counts. Both sides of
       that join are already reduced, and the grid side is normally
       broadcast by AQE.

    The spine uses the GLOBAL span for every group (BI semantics:
    aligned series).  ``bucket`` is any ``date_trunc`` unit.  At
    extreme spine sizes (years of seconds x millions of groups) the
    output itself is the cost — bucket coarser or filter groups first.

    Returns ``(group_col, bucket_ts, n_events[, agg_sum])`` with
    zero-filled ``n_events`` (and NULL ``agg_sum``) on gap rows.
    """
    _reject = {"_b", "_spine_ts", "_grp"}
    clash = _reject & set(df.columns)
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    # bucket is spliced into an INTERVAL literal — whitelist it so a
    # bad unit fails here with a clear message, not inside the parser
    _units = {"year", "quarter", "month", "week", "day",
              "hour", "minute", "second"}
    if bucket.lower() not in _units:
        raise ValueError(
            f"bucket must be one of {sorted(_units)}, got {bucket!r}")
    b = F.date_trunc(bucket, F.col(ts_col))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if agg_col is not None:
        aggs.append(F.sum(agg_col).alias("agg_sum"))
    facts = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(group_col).alias("_grp"), b.alias("_b"))
        .agg(*aggs)
    )
    span = df.where(F.col(ts_col).isNotNull()).agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("lo"),
        F.date_trunc(bucket, F.max(ts_col)).alias("hi"),
    )
    spine = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {bucket}")),
        ).alias("_spine_ts"),
    )
    groups = (
        df.where(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("_g")).distinct()
    )
    grid = spine.crossJoin(groups)
    out_cols = [
        F.col("_g").alias(group_col),
        F.col("_spine_ts").alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    ]
    if agg_col is not None:
        out_cols.append(F.col("agg_sum"))
    return (
        grid.join(
            facts,
            (F.col("_g") == F.col("_grp"))
            & (F.col("_spine_ts") == F.col("_b")),
            "left",
        )
        .select(*out_cols)
    )


def merge_intervals(df: DataFrame, start_col: str, end_col: str,
                    by: str) -> DataFrame:
    """Interval union per key (gaps-and-islands): merge overlapping
    or touching ``[start, end]`` intervals into maximal episodes and
    report, per key, the episode count and total covered duration —
    the dedup step behind "time on site", ad-exposure reach, and
    machine-uptime metrics, where naively summing raw durations
    double-counts every overlap.

    Plan: ONE shuffle+sort per key (a single window over
    ``partitionBy(by).orderBy(start, end)``); an island starts where
    ``start > running max(end) of all prior rows`` (strictly — equal
    endpoints touch and merge), detected with ``max(end)`` over
    ``rowsBetween(unboundedPreceding, -1)``; a running sum over the
    boolean assigns island ids, then one map-side-combinable
    aggregate per (key, island) and one per key.  No self-join, no
    per-interval probing — the published sweep-line plan expressed in
    two windows sharing one sort.  Skew = one hot key sorts in one
    task; salt upstream if a single key dominates.

    Rows with NULL start/end or ``end < start`` are rejected (raise)
    — silent drops would understate coverage.

    Returns ``(by, n_episodes, covered_secs)`` where ``covered_secs``
    sums ``end - start`` per merged episode in seconds.
    """
    reserved = {"_prev_max_end", "_new", "_island", "_s", "_e"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    bad = df.where(
        F.col(start_col).isNull() | F.col(end_col).isNull()
        | (F.col(end_col) < F.col(start_col)),
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"merge_intervals: NULL or inverted [{start_col}, {end_col}] "
            "interval present — clean the input first",
        )
    w = Window.partitionBy(by).orderBy("_s", "_e")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1),
    )
    marked = df.select(
        by,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
    ).withColumn(
        "_new",
        F.when(
            prev_max.isNull() | (F.col("_s") > prev_max), F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0),
        ),
    )
    episodes = marked.groupBy(by, "_island").agg(
        F.min("_s").alias("_es"), F.max("_e").alias("_ee"),
    )
    return episodes.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_episodes"),
        F.sum(
            F.col("_ee").cast("double") - F.col("_es").cast("double"),
        ).alias("covered_secs"),
    )


def sessionize(df: DataFrame, ts_col: str, by: str,
               gap_secs: int = 1800,
               tiebreak: str | None = None) -> DataFrame:
    """Gap-based batch sessionization: annotate every event with a
    per-key ``session_idx`` (1-based, in time order) that increments
    whenever the gap to the PREVIOUS event of the same key exceeds
    ``gap_secs`` — the standard web-analytics session definition
    (GA's 30-minute timeout) and the batch twin of the streaming
    sessionizer in streaming/event_streams.py (same gap rule, so a
    batch backfill and the live stream agree on session boundaries).

    Exactness across engines: the gap compares INTEGER microseconds
    (``unix_micros`` here, ``epoch_us`` in DuckDB) — no float
    seconds, no truncation ambiguity at the boundary (a gap of
    exactly ``gap_secs`` stays in-session; strictly greater opens a
    new one).  Event order inside a key is made total by
    ``tiebreak`` (an id column) so ties at the same timestamp
    sessionize identically everywhere.

    Plan: ONE shuffle+sort per key — ``lag`` and the running
    ``sum`` share the same window sort (the merge_intervals
    discipline).  NULL timestamps raise (a silent drop would
    understate session counts; a NULL sorts-first would corrupt the
    first gap).  Skew: one hot key sorts in one task — filter bots
    upstream or salt by day if a single key dominates.

    Returns the input plus ``session_idx`` (long).
    """
    if gap_secs <= 0:
        raise ValueError(f"gap_secs must be positive, got {gap_secs}")
    reserved = {"_us", "_new", "session_idx"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    bad = df.where(F.col(ts_col).isNull() | F.col(by).isNull()) \
            .limit(1).count()
    if bad:
        raise ValueError(
            f"sessionize: NULL {ts_col}/{by} present — clean the "
            "input first (NULLs would corrupt gap ordering)",
        )
    order = [F.col("_us")] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    gap_us = int(gap_secs) * 1_000_000
    # integer microseconds, timezone-free for BOTH timestamp types:
    # unix_micros rejects TIMESTAMP_NTZ, and casting NTZ->LTZ would
    # bind session boundaries to the session timezone (DST hazard);
    # timestampdiff from the NTZ epoch keeps wall-clock semantics
    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        us = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})",
        )
    else:
        us = F.unix_micros(F.col(ts_col))
    marked = (
        df.withColumn("_us", us)
        .withColumn(
            "_new",
            F.when(
                F.lag("_us").over(w).isNull()
                | ((F.col("_us") - F.lag("_us").over(w)) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    return (
        marked.withColumn(
            "session_idx",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0),
            ).cast("long"),
        )
        .drop("_us", "_new")
    )


def rolling_stats(df: DataFrame, ts_col: str, group_col: str,
                  value_col: str, n_buckets: int = 24) -> DataFrame:
    """Rolling baseline over a REGULAR (densified) series: per group
    and bucket, the mean / sample-stddev of ``value_col`` over the
    trailing ``n_buckets`` rows (current included) and the z-score of
    the current value against the TRAILING-EXCLUSIVE baseline — the
    moving-average anomaly detector behind traffic/queue monitoring.

    This operator deliberately takes a ROWS window, not a RANGE one,
    and that is only correct on a gap-free series — which is exactly
    what :func:`densify_time_series` produces (compose them: densify
    fills the zero buckets so "last 24 rows" == "last 24 hours"; on
    a gappy series the same frame silently spans variable time and
    the baseline lies).  Spark's RANGE frames don't take interval
    bounds on timestamps, so densify-then-rows is also the idiomatic
    Spark plan, not a workaround.

    One shuffle+sort per group (both windows share it).  The z-score
    uses the PRIOR ``n_buckets`` rows (frame ``[-n_buckets, -1]``):
    judging a spike against a baseline that contains the spike
    dilutes it.  Buckets with fewer than 2 prior rows or zero prior
    variance yield NULL z (never +-inf / fake 0).

    Returns ``(group_col, ts_col, value_col, roll_mean, roll_std,
    z)`` with the floats un-rounded (callers round for oracles).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    reserved = {"roll_mean", "roll_std", "z", "_pm", "_ps"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    w = Window.partitionBy(group_col).orderBy(ts_col)
    trail = w.rowsBetween(-(n_buckets - 1), 0)
    prior = w.rowsBetween(-n_buckets, -1)
    v = F.col(value_col).cast("double")
    out = (
        df.withColumn("roll_mean", F.avg(v).over(trail))
        .withColumn("roll_std", F.stddev_samp(v).over(trail))
        .withColumn("_pm", F.avg(v).over(prior))
        .withColumn("_ps", F.stddev_samp(v).over(prior))
    )
    z = F.when(
        F.col("_ps").isNotNull() & (F.col("_ps") > 0),
        (v - F.col("_pm")) / F.col("_ps"),
    )
    return out.withColumn("z", z).drop("_pm", "_ps")


def epoch_us_expr(df: DataFrame, ts_col: str):
    """Epoch-microseconds Column for a timestamp column — the
    sessionize() NTZ idiom: ``unix_micros`` rejects TIMESTAMP_NTZ,
    and casting NTZ->LTZ would bind ages to the session timezone."""
    from outrank_spark.hashing import qcol, sql_ident

    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {sql_ident(ts_col)})",
        )
    return F.unix_micros(qcol(ts_col))


def decayed_aggregate(df: DataFrame, ts_col: str, key_cols: list,
                      half_life_secs: float,
                      value_col: str | None = None,
                      ref_epoch_us: int | None = None) -> DataFrame:
    """Exponentially time-decayed aggregates per key: the standard
    recency-weighted activity feature (a count where an event
    ``half_life_secs`` old contributes 0.5, two half-lives old 0.25).
    Returns per key tuple: ``n_events`` (raw), ``decayed_count`` =
    sum(2^(-age/half_life)), and — with ``value_col`` —
    ``decayed_sum``.  ``ref_epoch_us`` is the "now" anchor in epoch
    microseconds; when None it is the dataset's max timestamp
    (fetched as a 1-row metadata aggregate — deterministic, so two
    engines anchor identically).  Null timestamps are excluded; a
    null value contributes to the count but not the sum (SQL sum
    semantics).

    Scale shape (100 TB): the weight is one JVM ``pow`` projection
    and the rest is a single map-side-combinable groupBy — the
    cheapest possible shape, same plan as a plain count.  Unlike a
    window over event history, the decayed form needs NO per-key
    ordering: decay weights are computed against the fixed anchor,
    so partial sums merge associatively.
    """
    if half_life_secs <= 0:
        raise ValueError(
            f"half_life_secs must be > 0, got {half_life_secs}")
    ts_us = epoch_us_expr(df, ts_col)
    if ref_epoch_us is None:
        row = df.agg(F.max(ts_us).alias("m")).first()
        if row["m"] is None:
            raise ValueError(f"no non-null {ts_col} values to anchor "
                             "the decay reference")
        ref_epoch_us = int(row["m"])
    age_secs = (F.lit(ref_epoch_us) - ts_us) / F.lit(1e6)
    w = F.pow(F.lit(0.5), age_secs / F.lit(float(half_life_secs)))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(w).alias("decayed_count"),
    ]
    if value_col is not None:
        aggs.append(F.sum(w * F.col(value_col)).alias("decayed_sum"))
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*key_cols)
        .agg(*aggs)
    )
