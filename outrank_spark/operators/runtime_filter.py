"""Bloom runtime-filter semi/anti join: prune the big side of a join
BEFORE the shuffle.

The pattern every 100 TB join planner wants when the build side is too
big to broadcast as ROWS but its Bloom filter is not:

  stage 1  build a mergeable Bloom over the build side's join keys
           (one scan, per-partition partials, OR-merge — the
           ``sketch_build`` path, so the filter is bitwise identical
           for any partitioning);
  stage 2  broadcast the serialized filter (MBs for tens of millions
           of keys at 1% fpp) and drop probe rows whose key cannot be
           in the build side — a SCALAR pandas UDF over the key column
           feeding a JVM-side filter, so only the key ever crosses the
           Arrow boundary and the row payload stays in the JVM;
  stage 3  (``exact=True``) a normal semi/anti join on the SURVIVORS
           removes Bloom false positives, so the result is EXACTLY the
           semi/anti join — the Bloom only shrank the shuffle by
           ~selectivity.  With ``exact=False`` you accept the fpp and
           skip the second shuffle entirely (anti-join mode stays
           exact-ish in the safe direction: a false positive can only
           KEEP an extra row through to the verify stage, never drop a
           matching one — Bloom has no false negatives).

At 1000 executors this turns "shuffle 100 TB of probe rows to join
against 500 GB of keys" into "shuffle selectivity * 100 TB", which is
the difference between a job that finishes and one that doesn't.
Spark's own ``spark.sql.optimizer.runtime.bloomFilter.enabled`` does
this opportunistically for some shapes; this operator makes it an
explicit, composable step with a deterministic filter (fixed seeds) so
results are reproducible across runs and cluster sizes.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from outrank_spark.hashing import qcol
from outrank_spark.sketches import sketch_from_bytes
from outrank_spark.operators.sketch_build import SketchPlan, build_sketches

__all__ = ["build_key_bloom", "bloom_prefilter", "bloom_semijoin"]


def build_key_bloom(build: DataFrame, key: str, capacity: int | None = None,
                    fpr: float = 0.01) -> bytes:
    """Serialized Bloom over ``build[key]`` (distinct-ness not
    required — Bloom inserts are idempotent).  ``capacity`` defaults to
    a cheap upper bound: the build side's row count (one count() — at
    most one extra scan, and callers that know |keys| can pass it)."""
    if capacity is None:
        capacity = max(64, build.count())
    skc = build_sketches(
        build, SketchPlan(columns=[key],
                          sketches={"bloom": {"capacity": int(capacity),
                                              "fpr": float(fpr)}}),
    )
    return skc[(key, "bloom")].to_bytes()


def bloom_prefilter(probe: DataFrame, key: str, blob: bytes,
                    keep_members: bool = True) -> DataFrame:
    """Drop probe rows by broadcast Bloom membership on ``key``.

    ``keep_members=True`` keeps possible members (semi-join prefilter,
    exact superset of the true semi join); ``False`` keeps definite
    non-members (anti-join prefilter, exact SUBSET of the true anti
    join — rows it drops are guaranteed members, no false drops of
    non-members... note the asymmetry: Bloom false positives make the
    anti prefilter under-keep, so anti mode must re-verify to be
    exact, while semi mode's superset is always safe to re-verify).

    Shape: a SCALAR pandas UDF on the key column + a JVM-side filter —
    ONLY the key crosses the Arrow boundary (one Series per batch, no
    pandas DataFrame assembly), the row payload never serializes, and
    the filter itself stays inside whole-stage codegen.  The earlier
    ``mapInPandas`` form round-tripped entire rows through Python and
    was Arrow-pipe-bound: on the 120M-row bench probe this shape is
    ~4x faster and restores >0.8 two-level scaling efficiency
    (bench_artifacts/r5).  Null keys are never members (SQL join
    semantics: semi drops them, the anti prefilter keeps them)."""
    bc = probe.sparkSession.sparkContext.broadcast(bytes(blob))
    cache: dict = {}

    @F.pandas_udf("boolean")
    def _member(s: pd.Series) -> pd.Series:
        bloom = cache.get("b")
        if bloom is None:
            bloom = cache["b"] = sketch_from_bytes("bloom", bc.value)
        hit = bloom.contains(s.to_numpy()) & s.notna().to_numpy()
        return pd.Series(hit)

    pred = _member(F.col(key))
    return probe.filter(pred if keep_members else ~pred)


def bloom_semijoin(probe: DataFrame, build: DataFrame, key: str,
                   build_key: str | None = None, how: str = "semi",
                   fpr: float = 0.01, capacity: int | None = None,
                   exact: bool = True) -> DataFrame:
    """Runtime-filtered semi/anti join: ``probe ⋉ build`` (or ``⋉̸``)
    on ``key`` with a Bloom prefilter ahead of the verifying join.

    ``exact=True`` (default) returns EXACTLY the semi/anti join result
    — the Bloom only reduces the verify join's probe-side volume.
    ``exact=False`` skips the verify join: semi mode then over-keeps at
    most fpp of non-members; anti mode over-drops the same rows.
    """
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be semi|anti, got {how!r}")
    bkey = build_key or key
    blob = build_key_bloom(build.select(qcol(bkey).alias(key)), key,
                           capacity=capacity, fpr=fpr)
    if how == "semi":
        pref = bloom_prefilter(probe, key, blob, keep_members=True)
        if not exact:
            return pref
        return pref.join(
            build.select(qcol(bkey).alias(key)).distinct(),
            on=key, how="left_semi",
        )
    # anti: definite non-members pass with NO join at all (Bloom has no
    # false negatives); possible members go through the exact anti join
    # and the two legs union — still one build-side join, but only over
    # the ~|members| + fpp*|non-members| slice of the probe side
    non_members = bloom_prefilter(probe, key, blob, keep_members=False)
    if not exact:
        return non_members
    possible = bloom_prefilter(probe, key, blob, keep_members=True)
    verified = possible.join(
        build.select(qcol(bkey).alias(key)).distinct(),
        on=key, how="left_anti",
    )
    return non_members.unionByName(verified)
