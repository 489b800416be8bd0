from __future__ import annotations

from outrank_spark.jobs.rank_job import build_parser, main, run_task

__all__ = ["build_parser", "main", "run_task"]
