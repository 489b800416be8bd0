from __future__ import annotations

from outrank_spark.sources.pages import generate_pages, pages_pandas
from outrank_spark.sources.ranking_matrix import generate_ranking_matrix

__all__ = ["generate_pages", "pages_pandas", "generate_ranking_matrix"]
