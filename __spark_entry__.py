"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship feature-ranking query; ``queries`` /
``oracle_sql`` expose the operator suite from SURVEY.md §2 with DuckDB
oracles for every SQL-expressible operator (sketch/ranking results are
rows-only by nature — their accuracy is bound-tested in tests/).
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sketch-backed feature ranking of the documents table
    (label = lang) at sf0.001 — scan -> derived features -> mergeable
    sketch build -> pair scoring -> median aggregation -> singles."""
    from outrank_spark.plans.queries import q23_ranking_flagship

    return q23_ranking_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from outrank_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from outrank_spark.plans.queries import ORACLES

    return dict(ORACLES)
