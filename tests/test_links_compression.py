"""extract_links / link_host_outdegree lexical extraction and the zlib
compression-ratio quality signal."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.derived import (extract_links,
                                             link_host_outdegree)
from outrank_spark.operators.text import compression_ratio


@pytest.fixture(scope="module")
def html_df(spark):
    rows = [
        # both quote styles, case-insensitive attr, query/fragment
        (1, '<a HREF="http://a.example.com/x?q=1#f">t</a>'
            "<a href='https://b.example.org/y'>u</a>"),
        # relative + protocol-relative + unquoted attr value (ignored)
        (2, '<a href="/rel/path">r</a><a href=//nohost/z>v</a>'
            '<img src="http://img.example.net/i.png">'),
        # port stripped from host, uppercase host folded
        (3, '<a href="http://A.EXAMPLE.COM:8080/p">w</a>'),
        # no links at all
        (4, "<p>plain</p>"),
    ]
    return spark.createDataFrame(rows, "doc_id long, page_html string")


def test_extract_links_lexical_rules(html_df):
    got = {r["doc_id"]: r["links"] for r in extract_links(
        html_df, html_col="page_html").collect()}
    assert got[1] == ["http://a.example.com/x?q=1#f",
                      "https://b.example.org/y"]
    # href only by default: img src not matched; unquoted value skipped
    assert got[2] == ["/rel/path"]
    assert got[3] == ["http://A.EXAMPLE.COM:8080/p"]
    assert got[4] == []


def test_extract_links_attrs_and_binary(spark):
    df = spark.createDataFrame(
        [(bytearray('<img src="http://c.example.com/i">'
                    '<a href="http://d.example.com/p">x</a>', "utf-8"),)],
        "html binary",
    )
    got = extract_links(df, html_col="html",
                        attrs=("href", "src")).collect()[0]["links"]
    assert got == ["http://c.example.com/i", "http://d.example.com/p"]


def test_link_host_outdegree(html_df):
    linked = extract_links(html_df, html_col="page_html",
                           attrs=("href", "src"))
    deg = {r["link_host"]: r["n_links"]
           for r in link_host_outdegree(linked).collect()}
    # relative links carry no host; the port is stripped (host regex
    # stops at ':') and the uppercase host folds, so doc3 merges into
    # doc1's a.example.com
    assert deg == {"a.example.com": 2, "b.example.org": 1,
                   "img.example.net": 1}


def test_compression_ratio_ordering_and_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),                                   # repeated
            (2, " ".join(f"word{i} and some prose here {i%7}"
                         for i in range(120))),                   # prose
            (3, "".join(chr(c) for c in np.random.default_rng(0)
                        .integers(33, 123, 2000))),               # junk
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cr"] for r in compression_ratio(
        docs, text_col="text", out="cr").collect()}
    assert out[4] is None and out[5] is None
    assert out[1] < out[2] < out[3]
    assert out[1] < 0.1                        # heavy repetition
    assert out[3] > 0.5                        # high entropy

    # deterministic across partitionings (it's a sampling weight)
    re_out = {r["doc_id"]: r["cr"] for r in compression_ratio(
        docs.repartition(7), text_col="text", out="cr").collect()}
    assert re_out == out


def test_compression_ratio_output_collision(spark):
    docs = spark.createDataFrame([(1, "x", 0.5)],
                                 "doc_id long, text string, cr double")
    with pytest.raises(ValueError):
        compression_ratio(docs, text_col="text", out="cr")
