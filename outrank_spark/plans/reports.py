"""Ranking report sinks — the reference's output-file surface.

Writes the same files ``outrank --task ranking`` +
``ranking_summary`` produce (task_ranking.py:244-297,
task_summary.py:51-89), from a :class:`RankingResult`:

  pairwise_ranks.tsv                    triplets, Score ascending
  feature_singles.tsv                   per-feature medians (normalized)
  feature_singles_aggregated.tsv        interaction re-aggregation
  feature_singles_transformers_only_imp.tsv
  memory.tsv                            per-feature avg encoded bytes
  value_repetitions.json                counter histogram profile
  combination_estimation_counts.json    planner prior counts
  timings.json / arguments.json         run metadata
  3mr_ranks.tsv                         (when 3MR ran)

Large relations would go to parquet at scale; these report files are
deliberately small driver-side artifacts, exactly like the reference.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
from pyspark.sql import DataFrame, functions as F

from outrank_spark.plans.ranking_job import (
    RankingConfig,
    RankingResult,
    aggregate_interactions,
)

__all__ = ["write_reports", "feature_memory_estimate"]


def feature_memory_estimate(df: DataFrame, columns: list[str]) -> dict[str, float]:
    """Average encoded bytes per value per column — exact one-pass
    version of ``compute_feature_memory_consumption``
    (core_ranking.py:394-406)."""
    row = df.agg(
        *[
            F.avg(F.length(F.encode(F.col(c).cast("string"), "utf-8")))
            .alias(c)
            for c in columns
        ],
    ).first()
    return {c: float(row[c]) if row[c] is not None else 0.0 for c in columns}


def write_reports(result: RankingResult, cfg: RankingConfig,
                  output_folder: str,
                  memory: dict[str, float] | None = None,
                  timings: list[dict] | None = None,
                  three_mr=None) -> list[str]:
    os.makedirs(output_folder, exist_ok=True)
    written = []

    def _path(name: str) -> str:
        written.append(name)
        return os.path.join(output_folder, name)

    result.pairwise.to_csv(_path("pairwise_ranks.tsv"), sep="\t", index=False)
    result.singles.to_csv(_path("feature_singles.tsv"), sep="\t", index=False)

    if cfg.interaction_order > 1:
        agg = aggregate_interactions(result.singles, cfg.heuristic,
                                     cfg.interaction_order)
        agg.to_csv(_path("feature_singles_aggregated.tsv"), sep="\t",
                   index=False)

    transformers_only = result.singles[
        result.singles["Feature"].str.contains("_tr_")
    ]
    transformers_only.to_csv(
        _path("feature_singles_transformers_only_imp.tsv"), sep="\t",
        index=False,
    )

    if memory:
        import pandas as pd

        pd.Series(memory, name="NormalizedSize").to_csv(
            _path("memory.tsv"), sep="\t",
        )

    # value_repetitions.json — the reference's repetition profile
    # (task_ranking.py:282-288): per column, how many distinct values
    # repeat more than {0, 1, 10, 100, ...} times
    out_dict = {}
    for (col, kind), sk in result.sketches.items():
        if kind != "counter":
            continue
        hist = np.array(list(sk.counts.values())) if len(sk) else np.array([0])
        out_dict[col] = {
            str(t): int((hist > t).sum())
            for t in [0] + [10 ** x for x in range(6)]
        }
    with open(_path("value_repetitions.json"), "w") as f:
        json.dump(out_dict, f)

    if result.planner is not None:
        with open(_path("combination_estimation_counts.json"), "w") as f:
            json.dump(
                {k.replace("\x1f", ","): v
                 for k, v in result.planner.state().items()}, f,
            )

    with open(_path("timings.json"), "w") as f:
        json.dump(timings or [], f)
    with open(_path("arguments.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, default=str)

    if three_mr is not None:
        three_mr.to_csv(_path("3mr_ranks.tsv"), sep="\t", index=False)
    return written
