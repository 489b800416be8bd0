"""End-to-end feature-ranking pipeline (the flagship job).

Spark lifecycle equivalent of the reference's ``--task ranking`` +
``--task ranking_summary`` (task_ranking.py:37-303, task_summary.py;
SURVEY.md §3.1):

  1. deterministic subsample of the input (hash-mod, order-free);
  2. ONE vectorized scan building all per-column sketches
     (parity-HLL cardinality, bounded counter, CMS) via the mergeable
     sketch operator + exact one-pass coverage/bounds aggregates;
  3. minibatch pair scoring: batch assignment -> ``applyInPandas``
     scoring of the planned pair list -> symmetrized triplets;
  4. median-of-batches aggregation: ``groupBy(a, b).agg(median)``;
  5. driver-side finalization: ``name-(card; cov)`` feature renaming
     (task_ranking.py:247-268), singles summary with min-max
     normalization for MI heuristics (task_summary.py:33-48),
     interaction re-aggregation, 3MR post-processing.

Stages 2 and 3 are the only passes over data; both shuffle a tiny
fraction of the input (sketch blobs / subsampled scoring columns).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


from outrank_spark.operators.pair_scoring import (
    deterministic_subsample,
    score_batches,
    symmetrize,
)
from outrank_spark.operators.sketch_build import SketchPlan, build_sketches
from outrank_spark.plans.combinations import CombinationPlanner
from outrank_spark.hashing import qcol

__all__ = ["RankingConfig", "RankingResult", "run_ranking",
           "feature_singles_summary", "aggregate_interactions"]


@dataclass
class RankingConfig:
    """Mirrors the reference CLI defaults (__main__.py:38-253)."""

    label_column: str = "label"
    heuristic: str = "MI-numba-randomized"
    target_ranking_only: bool = True
    combination_number_upper_bound: int = 2 ** 15
    minibatch_size: int = 2 ** 14
    subsampling: int = 1
    mi_stratified_sampling_ratio: float = 1.0
    include_cardinality_in_feature_names: bool = True
    missing_value_symbols: tuple[str, ...] = ("", "{}")
    feature_columns: list[str] | None = None
    interaction_order: int = 1
    max_unique_hist_constraint: int = 30_000
    seed: int = 123
    # extra sketch kinds beyond the reference's HLL + bounded counter
    # (e.g. {"cms": {"depth": 6, "width": 2**13}}); kept OUT of the
    # default plan — per-partition CMS blobs dominate shuffle bytes and
    # the reference's ranking flow never consumes a CMS
    extra_sketches: dict | None = None
    # parity-HLL precision: p=19 reproduces the reference bitwise;
    # smaller p bounds the per-partition blob for very wide feature
    # sets (name cardinalities cap at 2^p, like the reference's 2^19)
    hll_p: int | None = None
    # exact value counters only make sense for base columns — derived
    # feature values (interaction hashes, transformer outputs) are
    # near-unique and blow up the partial-counter shuffle
    counter_exclude_derived: bool = True
    # scoring fan-out floor: ensure at least this many minibatch groups
    # per core so the applyInPandas stage saturates the cluster (each
    # batch still >= min_batch_rows, the reference's remainder floor)
    batches_per_core: int = 2
    min_batch_rows: int = 2 ** 10
    # optional reference-model JSON: candidates are scored conditioned
    # on the model's features, and pairs touching model features are
    # dropped (core_ranking.py:205-215; importance_estimator.py:55-71)
    reference_model_json: str = ""
    # when set, ride a RareValueCounter (bound = this value) along the
    # sketch scan — reference --rare_value_count_upper_bound
    # (__main__.py:156-161, default 1 there; None = off, the rare pass
    # is only needed for the identify_rare_values report)
    rare_value_count_upper_bound: int | None = None


@dataclass
class RankingResult:
    pairwise: pd.DataFrame          # FeatureA, FeatureB, Score (asc)
    singles: pd.DataFrame           # Feature, Score <heuristic>
    sketches: dict                  # SketchCollection
    coverage: dict[str, float]      # column -> mean non-missing %
    cardinalities: dict[str, int]   # column -> HLL estimate
    planner: CombinationPlanner = field(default=None)
    triplets_raw: pd.DataFrame = field(default=None)  # pre-rename medians


def sketch_plan_for(cfg: RankingConfig, columns: list[str]) -> SketchPlan:
    """The ranking job's per-column sketch plan: cardinality (parity
    HLL), bounded value counts, coverage, optional rare-value counter,
    with exact-count kinds guarded off derived (near-unique) columns."""
    sketch_kinds = {
        "parity_hll": ({} if cfg.hll_p is None else {"p": cfg.hll_p}),
        "counter": {"bound": cfg.max_unique_hist_constraint},
        "coverage": {"missing_symbols": cfg.missing_value_symbols},
        **(cfg.extra_sketches or {}),
    }
    if cfg.rare_value_count_upper_bound is not None:
        sketch_kinds["rare"] = {"bound": cfg.rare_value_count_upper_bound}
    kind_columns = None
    if cfg.counter_exclude_derived:
        base_cols = [
            c for c in columns
            if " AND" not in c and "_tr_" not in c
            and not c.startswith(("CONTROL-", "SUBFEATURE", "MULTIEX-"))
        ]
        # derived values (interaction hashes etc.) are near-unique —
        # exact value state on them explodes; same guard for both
        # exact-count kinds
        kind_columns = {"counter": base_cols, "rare": base_cols}
    return SketchPlan(columns=columns, sketches=sketch_kinds,
                      kind_columns=kind_columns)


def run_ranking(spark, df: DataFrame, cfg: RankingConfig,
                planner: CombinationPlanner | None = None) -> RankingResult:
    columns = cfg.feature_columns or list(df.columns)
    planner = planner or CombinationPlanner(seed=cfg.seed)

    # two lazy passes over the (possibly upstream-cached) input —
    # a cache write of wide string columns costs more than the scans,
    # and the sketch scan and the scoring scan are INDEPENDENT jobs
    # (cardinality/coverage only feed the post-hoc feature renaming),
    # so they run concurrently on one scheduler (guide §2.6 overlap:
    # the sketch job's tail back-fills executor slots while the
    # scoring stages run, and vice versa) — measured 4.5 s -> ~3.3 s
    # on the 300k-page bench job (OPTIMIZATION_r06.md)
    sub = deterministic_subsample(df.select(*[qcol(c).alias(c) for c in columns]), cfg.subsampling,
                                  key_cols=columns)

    # --- sketch scan (background): cardinality + counts + coverage --
    plan = sketch_plan_for(cfg, columns)
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    pool = ThreadPoolExecutor(max_workers=1)
    sketch_future = pool.submit(
        inheritable_thread_target(lambda: build_sketches(sub, plan)))

    try:
        # one cheap metadata job (count of the subsample — row-count
        # pruned to the scan, no sketch state) unblocks the batch
        # planning that used to wait on the coverage sketch's total
        n_rows = sub.count()

        # enough minibatch groups to saturate the cluster, without
        # dropping below the reference's remainder floor (2^10 rows)
        parallelism = spark.sparkContext.defaultParallelism
        n_batches = max(1, math.ceil(n_rows / cfg.minibatch_size))
        n_batches = max(n_batches, cfg.batches_per_core * parallelism)
        n_batches = min(n_batches, max(1, n_rows // cfg.min_batch_rows))

        # --- pair scoring --------------------------------------------
        pairs = planner.plan(columns, cfg.label_column, cfg.heuristic,
                             cfg.target_ranking_only,
                             cfg.combination_number_upper_bound)
        model_features: list[str] = []
        if cfg.reference_model_json:
            from outrank_spark.plans.reference_model import (
                filter_pairs,
                model_feature_names,
            )

            model_features = [
                m for m in model_feature_names(cfg.reference_model_json)
                if m in columns
            ]
            pairs = filter_pairs(pairs, model_features)
        if cfg.heuristic == "MI-table-exact":
            # fully-distributed exact plug-in MI over the WHOLE
            # (sampled) table — no minibatching, no per-batch median;
            # one grouping-sets scan per pair chunk
            # (operators/mi_distributed.py).  Engine addition beyond
            # the reference (whose MI heuristics are always
            # minibatch-sampled).
            from outrank_spark.operators.mi_distributed import (
                mi_table_scores,
            )

            triplets = mi_table_scores(sub, pairs).withColumn(
                "batch_id", F.lit(0),
            )
        else:
            triplets = score_batches(
                sub, columns, pairs, cfg.heuristic, cfg.label_column,
                n_batches, cfg.mi_stratified_sampling_ratio,
                model_features=model_features,
            )
        grouped = (
            symmetrize(triplets)
            .groupBy("feature_a", "feature_b")
            .agg(F.median("score").alias("score"))
            .toPandas()
        )
        # join the concurrent sketch job (raises here if it failed)
        sketches = sketch_future.result()
    finally:
        pool.shutdown(wait=True)
    cards = {c: sketches[(c, "parity_hll")].estimate() for c in columns}
    coverage = {
        c: sketches[(c, "coverage")].coverage() for c in columns
    }

    # --- finalize (driver-side, small) -------------------------------
    grouped.columns = ["FeatureA", "FeatureB", "Score"]
    raw = grouped.copy()
    if cfg.include_cardinality_in_feature_names:
        def rename(name: str) -> str:
            cov = int(round(coverage[name], 1))
            return f"{name}-({cards[name]}; {cov})"

        grouped["FeatureA"] = grouped["FeatureA"].map(rename)
        grouped["FeatureB"] = grouped["FeatureB"].map(rename)
    pairwise = grouped.sort_values(by=["Score"]).reset_index(drop=True)

    singles = feature_singles_summary(pairwise, cfg.label_column,
                                      cfg.heuristic)
    return RankingResult(
        pairwise=pairwise, singles=singles, sketches=sketches,
        coverage=coverage, cardinalities=cards, planner=planner,
        triplets_raw=raw,
    )


def feature_singles_summary(pairwise: pd.DataFrame, label_column: str,
                            heuristic: str) -> pd.DataFrame:
    """Port of task_summary.py:20-48 — label-touching rows, partner
    feature extracted, per-feature median, min-max normalized for MI
    heuristics."""
    triplets = pairwise.sort_values(by="Score", ascending=False)
    ranking = []
    for _, row in triplets.iterrows():
        fa, fb, score = row["FeatureA"], row["FeatureB"], row["Score"]
        if label_column == fa.split("-")[0]:
            ranking.append([fb, score])
        elif label_column == fb.split("-")[0]:
            ranking.append([fa, score])
    col = f"Score {heuristic}"
    final_df = pd.DataFrame(ranking, columns=["Feature", col])
    final_df = (
        final_df.groupby("Feature").median().reset_index()
        .sort_values(by=col, ascending=False)
    )
    if "MI" in heuristic:
        lo, hi = final_df[col].min(), final_df[col].max()
        final_df[col] = (final_df[col] - lo) / (hi - lo)
    return final_df.reset_index(drop=True)


def aggregate_interactions(singles: pd.DataFrame, heuristic: str,
                           interaction_order: int) -> pd.DataFrame:
    """Port of task_summary.py:63-84 — median of member scores for
    ``A AND B`` interaction names."""
    score_col = f"Score {heuristic}"
    store: dict[str, list[float]] = {}
    for _, row in singles.iterrows():
        fname = row["Feature"]
        if "AND" in fname:
            for el in fname.split("-")[0].split(" AND "):
                store.setdefault(el, []).append(row[score_col])
    out_col = f"Combined score (order: {interaction_order}, {heuristic})"
    return pd.DataFrame(
        [{"Feature": k, out_col: float(np.median(v))} for k, v in store.items()],
    )
