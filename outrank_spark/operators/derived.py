"""Derived web features over the pages table (north-rule additions).

SURVEY.md §2.3 (last row): url host/TLD, text length, token counts,
timestamp buckets, token n-gram hashes — all as *built-in* Spark
column expressions so they stay inside WholeStageCodegen and Catalyst
can prune/push down around them.  No Python runs per row anywhere
here; the only UDF-shaped thing (html -> text extraction check) is
also a built-in regexp.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "with_web_features",
    "extract_text_from_html",
    "canonicalize_url",
    "WEB_FEATURE_COLS",
]

WEB_FEATURE_COLS = [
    "host", "tld", "text_len", "n_token", "ts_hour", "ts_day",
]


def with_web_features(pages: DataFrame) -> DataFrame:
    """host, tld, text_len, n_token, hour/day buckets as F.* exprs."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        pages
        .withColumn("host", host)
        # everything after the first label ("site0000.co.uk" -> "co.uk")
        .withColumn("tld", F.regexp_replace(F.col("host"), r"^[^.]+\.", ""))
        .withColumn("text_len", F.length("text"))
        .withColumn("n_token", F.size(F.split(F.col("text"), " ")))
        .withColumn("ts_hour", F.date_trunc("hour", F.col("warc_ts")))
        .withColumn("ts_day", F.date_trunc("day", F.col("warc_ts")))
    )


def with_token_ngram_hashes(pages: DataFrame, n: int = 3,
                            col: str = "text",
                            out: str = "ngram_hashes") -> DataFrame:
    """Array of xxhash64 values of token n-grams (shingles), fully
    JVM-side: split -> sliding slices -> xxhash64.  Explode downstream
    to sketch shingle cardinality / feed MinHash."""
    toks = F.split(F.col(col), " ")
    expr = (
        f"transform(sequence(0, greatest(size(split({col}, ' ')) - {n}, -1)), "
        f"i -> xxhash64(concat_ws(' ', slice(split({col}, ' '), i + 1, {n}))))"
    )
    return pages.withColumn(out, F.expr(expr)).withColumn(
        out, F.when(F.size(toks) >= n, F.col(out)).otherwise(F.array()),
    )


def extract_text_from_html(pages: DataFrame,
                           out: str = "extracted_text") -> DataFrame:
    """Deterministic text extractor over the binary html column.

    The fixture html wraps text as <body>...</body>; the north-rule
    per-row invariant is that this extraction equals the stored
    ``text`` byte-identically (BASELINE.json input_hint).
    """
    return pages.withColumn(
        out,
        F.regexp_extract(F.decode(F.col("html"), "UTF-8"),
                         "<body>(.*)</body>", 1),
    )


TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src)$"
)


def canonicalize_url(df: DataFrame, url_col: str = "url",
                     out: str = "url_canonical") -> DataFrame:
    """Canonical URL form for dedup/grouping, entirely JVM expressions:

    - scheme + host lowercased, default ports stripped (:80 http,
      :443 https), leading ``www.`` dropped;
    - fragment removed;
    - tracking query params (utm_*, fbclid, gclid, ...) removed, the
      survivors sorted by name (stable order -> equal URLs compare
      equal); empty query drops the ``?``;
    - trailing slash trimmed from non-root paths.

    The classic crawl-dedup normalizer (cf. RFC 3986 §6 syntax-based
    normalization) — at corpus scale this runs inside the scan
    projection, no shuffle.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*):",
                                      1))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    # Spark's parse_url has no PORT part — take it from AUTHORITY
    port = F.regexp_extract(
        F.coalesce(F.parse_url(u, F.lit("AUTHORITY")), F.lit("")),
        r":(\d+)$", 1,
    )
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.expr(f"substring(parse_url({url_col}, 'PATH'), 1, "
               f"length(parse_url({url_col}, 'PATH')) - 1)"),
    ).otherwise(path)
    # RFC 3986 §6.2.3: empty path normalizes to "/" so bare-host and
    # root-slash forms compare equal
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    kept_params = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~F.regexp_extract(
                p, r"^([^=]*)", 1,
            ).rlike(TRACKING_PARAM_RE),
        ),
    )
    query_part = F.when(
        F.size(kept_params) > 0,
        F.concat(F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path, query_part,
    )
    return df.withColumn(out, canon)
