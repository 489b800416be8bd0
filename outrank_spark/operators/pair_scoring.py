"""Distributed pairwise feature scoring.

The reference scores each minibatch's column pairs on a process pool
(core_ranking.py:139-151).  Spark-first re-expression: minibatches
become *groups* of a deterministic batch key, and one ``applyInPandas``
call scores every planned pair inside the group's Arrow batch — batch
semantics (batch-local category codes, row-order-dependent spoof
correction) are preserved because each group is sorted by a stable row
key before encoding.

Scale shape: at 10^12 rows the sampled scoring input is millions of
minibatches; parallelism is batch-level (each task scores ~|pairs|
vectorized numpy kernels over <= 2^14-row vectors), which keeps tasks
uniform and avoids shuffling the full table — only the subsampled
scoring columns move.  For the inverse regime (one batch, huge pair
count) ``score_single_batch_distributed`` broadcasts the encoded batch
and fans out over pairs instead.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from outrank_spark.hashing import qcol


from outrank_spark.functions.heuristics import score_pair

__all__ = ["deterministic_subsample", "assign_batches", "score_batches",
           "score_single_batch_distributed", "symmetrize"]

_TRIPLET_SCHEMA = "batch_id long, feature_a string, feature_b string, score double"


def deterministic_subsample(df: DataFrame, every_nth: int,
                            key_cols: Sequence[str] | None = None) -> DataFrame:
    """Keep ~1/n of rows, reproducibly and order-free.

    The reference keeps every n-th *line* (core_ranking.py:641-642) —
    an order-dependent notion that does not survive distribution;
    SURVEY.md §2.2 maps it to a hash-mod filter on a stable key
    (xxhash64 of the key columns), which is reproducible across any
    partitioning and pushes down to the scan.
    """
    if every_nth <= 1:
        return df
    key = (F.xxhash64(*[qcol(c) for c in key_cols]) if key_cols
           else F.xxhash64(*[qcol(c) for c in df.columns]))
    return df.filter(F.pmod(key, F.lit(every_nth)) == 0)


def assign_batches(df: DataFrame, n_batches: int,
                   key_cols: Sequence[str] | None = None) -> DataFrame:
    """Add ``batch_id`` + stable intra-batch order key ``_rk``."""
    cols = [qcol(c) for c in (key_cols or df.columns)]
    key = F.xxhash64(*cols)
    return (
        df.withColumn("_rk", key)
        .withColumn("batch_id", F.pmod(F.col("_rk"), F.lit(n_batches)))
    )


def _encode_codes(pdf: pd.DataFrame, columns: Sequence[str]) -> dict[str, np.ndarray]:
    """Batch-local dense codes — the reference's scoring value domain
    (core_ranking.py:108-117).  String columns go through pandas
    category codes (reference-identical, sorted-unique order); integer
    columns (the pre-hashed fast path) skip the object conversion and
    are densified inside the estimator (relabel-invariant)."""
    out = {}
    for c in columns:
        s = pdf[c]
        if s.dtype.kind in ("i", "u"):
            out[c] = s.to_numpy()
        else:
            out[c] = s.astype("category").cat.codes.to_numpy(np.int32)
    return out


# Heuristics whose scores are invariant under injective relabeling of
# the value domain — safe to pre-hash strings to longs JVM-side.
_RELABEL_INVARIANT = {
    "MI", "MI-numba", "MI-numba-randomized", "MI-numba-3mr", "AMI",
    "Constant", "max-value-coverage",
    # one-hot encoding only permutes columns under relabeling, and the
    # logistic objective/fold split are permutation-invariant
    "surrogate-SGD", "surrogate-SVM", "surrogate-SGD-RP",
    "surrogate-SGD-SVD",
}


# Heuristics whose first step is densify() on both inputs — for these
# the per-column code vector can be densified ONCE per batch instead
# of once per pair membership (a column appears in ~|columns| pairs,
# and densify is idempotent: unique+searchsorted of an already-dense
# vector short-circuits), with bitwise-identical scores.
_DENSIFY_FIRST = {"MI", "MI-numba", "MI-numba-randomized",
                  "MI-numba-3mr", "AMI"}

# MI-numba family: estimator internals (value counts, LUT codes,
# spoof permutation, column sums) depend on ONE column each, so a
# batch scoring ~|columns|^2 pairs recomputes each column's stats
# ~|columns| times.  _mi_col_stats hoists them; the pair loop then
# replays mutual_info_estimator's exact arithmetic on the cached
# pieces — same arrays, same op order, bit-identical scores (pinned
# by the differential test in tests/test_mi.py).
_MI_NUMBA = {"MI-numba", "MI-numba-randomized", "MI-numba-3mr"}


def _mi_col_stats(arr: np.ndarray) -> dict:
    """Per-column pieces of mutual_info_estimator for a DENSIFIED
    int32 code vector: exactly what the estimator derives from each
    argument before the per-pair entropy sums."""
    from outrank_spark.functions.mi import _unique_counts

    n = len(arr)
    vals, counts = _unique_counts(arr)
    lut = np.zeros(int(vals[-1]) + 1, dtype=np.int64)
    lut[vals] = np.arange(len(vals))
    code = lut[arr]
    pre_rows = counts[code]
    spoof = (np.arange(n, dtype=np.int64) + pre_rows) % n
    return {
        "n_vals": len(vals), "counts": counts, "code": code,
        "spoof": spoof, "keep": counts > 1,
        "sum": int(np.sum(arr.astype(np.int64))),
    }


def _score_block_mi_cached(codes: dict[str, np.ndarray],
                           pairs: Sequence[tuple[str, str]],
                           heuristic: str, label_column: str,
                           ratio: float) -> list[tuple[str, str, float]]:
    """MI-numba family fast path: identical scores to score_pair ->
    mutual_info_estimator, with the per-column stats computed once.

    Mirrors the estimator line by line (functions/mi.py): first
    argument is Y (the candidate), second is X (the conditioning);
    approximation_factor is 1.0 / float32(ratio>=1) so the subsample
    branch never fires; the diagonal check disables the correction.
    """
    from outrank_spark.functions.mi import _conditional_entropy_sum

    stats = {c: _mi_col_stats(v) for c, v in codes.items()}
    n = len(next(iter(codes.values())))
    randomized = heuristic == "MI-numba-randomized"
    # factor as the estimator receives it: np.float32(ratio) for the
    # randomized heuristic, plain 1.0 otherwise (score_pair)
    factor = np.float32(ratio) if randomized else 1.0
    out = []
    for a, b in pairs:
        f1, f2 = (b, label_column) if a == label_column else (a, b)
        sy, sx = stats[f1], stats[f2]   # estimator: Y=first, X=second
        correction = randomized
        if sx["sum"] - sy["sum"] == 0:
            correction = False
        cond = _conditional_entropy_sum(
            sx["code"], sy["code"], sx["n_vals"], sy["n_vals"],
            sx["counts"], n, sx["keep"],
        )
        if not correction:
            p = sy["counts"] / n
            full_entropy = float(-(p * np.log(p)).sum())
            score = np.float32(factor * (full_entropy - cond))
        else:
            y_spoof = sy["code"][sx["spoof"]]
            background = _conditional_entropy_sum(
                sx["code"], y_spoof, sx["n_vals"], sy["n_vals"],
                sx["counts"], n, sx["keep"],
            )
            score = np.float32(factor * (-cond + background))
        out.append((a, b, float(score)))
    return out


def _score_block(codes: dict[str, np.ndarray],
                 pairs: Sequence[tuple[str, str]], heuristic: str,
                 label_column: str, ratio: float,
                 model_features: Sequence[str] = ()) -> list[tuple[str, str, float]]:
    if heuristic in _DENSIFY_FIRST and not model_features:
        from outrank_spark.functions.mi import densify

        codes = {
            c: densify(v) if v.dtype.kind in ("i", "u") else v
            for c, v in codes.items()
        }
        if (heuristic in _MI_NUMBA
                and (heuristic != "MI-numba-randomized"
                     or np.float32(ratio) >= 1.0)
                and codes and len(next(iter(codes.values())))):
            return _score_block_mi_cached(codes, pairs, heuristic,
                                          label_column, ratio)
    model_matrix = None
    if model_features:
        model_matrix = np.column_stack(
            [codes[m] for m in model_features if m in codes],
        )
    out = []
    for a, b in pairs:
        f1, f2 = (b, label_column) if a == label_column else (a, b)
        first = codes[f1]
        if model_matrix is not None and model_matrix.size:
            if heuristic.startswith("surrogate-"):
                # surrogates consume the RAW [model features..| cand]
                # code matrix (importance_estimator.py:80-91 one-hots
                # the whole 2-D block — no |max-sum| reduction)
                first = np.column_stack([model_matrix, first])
            else:
                # prior conditioning: score the candidate GIVEN the
                # model features (importance_estimator.py:55-71)
                from outrank_spark.plans.reference_model import (
                    conditioned_vector,
                )

                first = conditioned_vector(model_matrix, first)
        score = score_pair(first, codes[f2], heuristic, ratio)
        out.append((a, b, float(score)))
    return out


def score_batches(df: DataFrame, columns: Sequence[str],
                  pairs: Sequence[tuple[str, str]], heuristic: str,
                  label_column: str, n_batches: int,
                  mi_stratified_sampling_ratio: float = 1.0,
                  key_cols: Sequence[str] | None = None,
                  precode: bool | None = None,
                  model_features: Sequence[str] = ()) -> DataFrame:
    """Score all planned pairs per minibatch; returns the triplet
    relation ``(batch_id, feature_a, feature_b, score)``.

    ``precode`` (default: auto per heuristic) hashes every scoring
    column to a long JVM-side before the shuffle: Arrow then lands as
    zero-copy int64 instead of millions of Python string objects, and
    shuffle bytes shrink ~5x.  Only enabled for relabel-invariant
    heuristics; exact-parity runs (and order-sensitive stratified
    subsampling, which follows value order) can force ``precode=False``.
    """
    pairs = [tuple(p) for p in pairs]
    if precode is None:
        # reference-model conditioning reduces the model matrix with
        # |max - sum| ARITHMETIC on the code values — not relabel-
        # invariant, so pre-hashed int64 codes would change the
        # conditioning vector's collision structure vs the reference's
        # category codes.  Keep strings when model_features are set.
        precode = (
            heuristic in _RELABEL_INVARIANT
            and mi_stratified_sampling_ratio >= 1.0
            and not model_features
        )
    # positional channel names through Spark (classic mapInPandas /
    # applyInPandas re-resolve every column by name, which breaks on
    # derived feature names containing dots); pandas renames them back
    # to the real feature names inside the worker
    safe = {c: f"__f{i}" for i, c in enumerate(columns)}
    base = df.select(*[qcol(c).alias(safe[c]) for c in columns])
    if precode:
        base = base.select(
            *[F.xxhash64(F.col(safe[c])).alias(safe[c]) for c in columns],
        )
    batch_keys = ([safe[c] for c in columns] if key_cols is None
                  else [safe.get(c, c) for c in key_cols])
    batched = assign_batches(base, n_batches, key_cols=batch_keys)
    unsafe = {v: k for k, v in safe.items()}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.rename(columns=unsafe)
        pdf = pdf.sort_values("_rk", kind="stable").reset_index(drop=True)
        # The hash sort gives a deterministic, partition-independent
        # order — but it CLUSTERS identical rows into runs, which
        # makes the MI spoof correction's position shift land on
        # look-alike neighbors (background == signal -> score ~ 0).
        # A fixed pseudo-random permutation of positions scatters the
        # runs while staying fully deterministic.
        from outrank_spark.hashing import splitmix64

        perm = np.argsort(splitmix64(np.arange(len(pdf), dtype=np.uint64)),
                          kind="stable")
        pdf = pdf.iloc[perm].reset_index(drop=True)
        codes = _encode_codes(pdf, columns)
        triplets = _score_block(codes, pairs, heuristic, label_column,
                                mi_stratified_sampling_ratio,
                                model_features)
        bid = int(pdf["batch_id"].iloc[0])
        return pd.DataFrame(
            {
                "batch_id": bid,
                "feature_a": [t[0] for t in triplets],
                "feature_b": [t[1] for t in triplets],
                "score": [t[2] for t in triplets],
            },
        )

    # Spread CPU-heavy batch groups across tasks.  groupBy's default
    # shuffle hashes n_batches keys into spark.sql.shuffle.partitions
    # buckets; when the two are of similar magnitude (the interactive /
    # bench regime: 64 batches, 32 partitions) balls-into-bins leaves
    # ~1/3 of partitions empty and the worst task carrying 5-6 batches,
    # so the scoring stage walls at max-load x batch-time while most
    # cores idle (measured 4.4 s -> 2.8 s at 300k pages x 463 pairs).
    # An explicit repartition to ~4*n_batches gives ~1 batch per task
    # and, being a user-specified count, is not AQE-coalesced; the
    # groupBy then reuses that HashPartitioning (ClusteredDistribution
    # on batch_id is already satisfied) so no second Exchange appears.
    # The spread applies while batches-per-partition < 32 — below that
    # the binomial imbalance is material (at 123 batches over 8
    # partitions the max-loaded partition walls a single-wave stage;
    # measured 40.2 -> 37.8 s at 2M pages on 8 cores), above it many
    # batches per task average out on their own and extra tasks would
    # only cost scheduling.  The partition count caps at 64*shuf so a
    # corpus-scale job never schedules more than ~64 tasks per shuffle
    # slot while still leaving most tasks a single batch.
    try:
        shuf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuf = df.sparkSession.sparkContext.defaultParallelism
    if n_batches < 32 * shuf:
        batched = batched.repartition(
            min(4 * n_batches, 64 * shuf), "batch_id")
    return batched.groupBy("batch_id").applyInPandas(fn, schema=_TRIPLET_SCHEMA)


def score_single_batch_distributed(spark, pdf: pd.DataFrame,
                                   columns: Sequence[str],
                                   pairs: Sequence[tuple[str, str]],
                                   heuristic: str, label_column: str,
                                   mi_stratified_sampling_ratio: float = 1.0,
                                   parallelism: int | None = None) -> pd.DataFrame:
    """Pair-level fan-out: broadcast one encoded batch, parallelize the
    pair list (the reference's process-pool shape, on Spark tasks)."""
    codes = _encode_codes(pdf, columns)
    bc = spark.sparkContext.broadcast(codes)
    pairs = [tuple(p) for p in pairs]
    n = parallelism or spark.sparkContext.defaultParallelism

    def run(chunk):
        local = bc.value
        return _score_block(local, list(chunk), heuristic, label_column,
                            mi_stratified_sampling_ratio)

    chunks = [pairs[i::n] for i in range(n) if pairs[i::n]]
    scored = (
        spark.sparkContext.parallelize(chunks, len(chunks))
        .flatMap(run).collect()
    )
    return pd.DataFrame(scored, columns=["feature_a", "feature_b", "score"])


def symmetrize(triplets: DataFrame) -> DataFrame:
    """Emit both (a,b,s) and (b,a,s) — core_ranking.py:156-165.

    Single-pass explode, NOT a self-union: a union's two branches
    would each re-evaluate the (expensive, uncached) scoring stage.
    """
    both = F.array(
        F.struct(
            F.col("feature_a").alias("fa"), F.col("feature_b").alias("fb"),
        ),
        F.struct(
            F.col("feature_b").alias("fa"), F.col("feature_a").alias("fb"),
        ),
    )
    return (
        triplets.select("batch_id", "score", F.explode(both).alias("p"))
        .select(
            "batch_id",
            F.col("p.fa").alias("feature_a"),
            F.col("p.fb").alias("feature_b"),
            "score",
        )
    )
