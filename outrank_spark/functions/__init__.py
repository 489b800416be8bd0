"""Scoring + scalar kernels (pure numpy/pandas, zero Spark dependency).

These run *inside* Arrow batches on executors (applyInPandas /
mapInPandas) — never per-row Python.
"""
from __future__ import annotations

from outrank_spark.functions.mi import mutual_info_estimator, stratified_subsampling
from outrank_spark.functions.coverage import max_pair_coverage

__all__ = ["mutual_info_estimator", "stratified_subsampling", "max_pair_coverage"]
