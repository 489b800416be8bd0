from __future__ import annotations

from outrank_spark.sources.bucketed import (
    assert_no_shuffle_exchange,
    bucketed_join,
    write_bucketed,
)
from outrank_spark.sources.pages import generate_pages, pages_pandas
from outrank_spark.sources.ranking_matrix import generate_ranking_matrix
from outrank_spark.sources.warc import (
    pages_from_warc,
    read_warc,
    read_warc_with_stats,
    read_wet,
)

__all__ = [
    "generate_pages", "pages_pandas", "generate_ranking_matrix",
    "read_warc", "read_warc_with_stats", "read_wet", "pages_from_warc",
    "write_bucketed", "bucketed_join", "assert_no_shuffle_exchange",
]
