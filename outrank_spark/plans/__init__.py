from __future__ import annotations

from outrank_spark.plans.combinations import CombinationPlanner
from outrank_spark.plans.ranking_job import RankingConfig, RankingResult, run_ranking

__all__ = ["CombinationPlanner", "RankingConfig", "RankingResult", "run_ranking"]
