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

from outrank_spark.hashing import sql_ident as _qu

__all__ = [
    "with_web_features",
    "extract_text_from_html",
    "canonicalize_url",
    "host_suffix_blocklist",
    "extract_links",
    "link_host_outdegree",
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
        F.expr(f"substring(parse_url({_qu(url_col)}, 'PATH'), 1, "
               f"length(parse_url({_qu(url_col)}, 'PATH')) - 1)"),
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


def host_suffix_blocklist(df: DataFrame, blocklist: DataFrame,
                          host_col: str = "host",
                          domain_col: str = "domain",
                          keep_blocked: bool = False) -> DataFrame:
    """Domain-suffix blocklist filter — the first gate of every web
    curation pipeline (CCNet/RefinedWeb-style URL filtering): a row is
    BLOCKED when its host equals a blocklist domain or ends with
    ``"." + domain`` (so ``example.org`` blocks the apex and every
    subdomain, while ``ads.example.com`` blocks only that subtree and
    leaves ``example.com`` alive).  ``keep_blocked=True`` inverts the
    filter (audit mode: what WOULD be dropped).

    Scale shape — blocking is a pure function of the HOST, so the
    verdict is computed once per distinct host, never per corpus row:

    * ``distinct(host)`` first (unique hosts are orders of magnitude
      fewer than pages — the web is Zipf by site);
    * each distinct host explodes into its dot-suffix chain
      (``a.b.c.tld`` -> 4 rows), bounded by the label count (~4-6),
      all JVM exprs;
    * ONE equi-join against the blocklist on the suffix — hash join,
      broadcast when the blocklist is small, shuffle when it is
      web-scale (real blocklists run to millions of rows; an
      ``endswith`` predicate join would be O(corpus x blocklist)
      nested-loop and is never generated here);
    * the distinct blocked hosts semi/anti-join the corpus back on
      the host column — body columns never ride through the explode,
      and no synthetic row id is needed (a ``monotonically_
      increasing_id`` bridge would be non-deterministic across the
      two lineage branches).

    Rows with a NULL host match no blocked host (null-safe anti join
    keeps them; semi drops them) — an unparseable URL is not blocked.
    """
    suffixes = F.expr(
        f"transform(sequence(0, size(split({host_col}, '[.]')) - 1), "
        f"i -> array_join(slice(split({host_col}, '[.]'), i + 1, "
        f"size(split({host_col}, '[.]'))), '.'))"
    )
    blocked_hosts = (
        df.select(host_col).where(F.col(host_col).isNotNull()).distinct()
        .select(F.col(host_col), F.explode(suffixes).alias("__suffix"))
        .join(
            blocklist.select(F.col(domain_col).alias("__suffix")),
            "__suffix",
        )
        .select(host_col)
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(blocked_hosts, host_col, how)


def extract_links(df: DataFrame, html_col: str = "html",
                  out: str = "links",
                  attrs: tuple[str, ...] = ("href",)) -> DataFrame:
    """All link targets from an HTML column as an ``array<string>`` —
    the edge extractor feeding host link graphs (PageRank over
    ``operators.graph``), outlink-count quality features, and
    crawl-frontier dedup.

    Pure JVM regex (``regexp_extract_all``), zero shuffle, so it runs
    inside the scan partition at corpus scale; accepts either a
    ``binary`` html column (north-rule pages shape — decoded UTF-8
    first) or a pre-decoded string column.  Attribute values are
    matched in both quote styles, case-insensitively; relative links
    are kept verbatim (resolution against the page url is a separate
    concern).  This is deliberately a *lexical* extractor, same class
    as ``extract_text_from_html`` — no DOM parse, deterministic, and
    expressible in any RE2/PCRE engine (the q108 DuckDB oracle uses
    the identical pattern).
    """
    dtype = dict(df.dtypes).get(html_col)
    src = (F.decode(F.col(html_col), "UTF-8") if dtype == "binary"
           else F.col(html_col))
    alt = "|".join(attrs)
    pat = r'(?i)(?:' + alt + r')\s*=\s*["' + "'" + r']([^"' + "'" + r'<>\s]+)["' + "'" + r']'
    return df.withColumn(
        out, F.regexp_extract_all(src, F.lit(pat), F.lit(1)),
    )


def link_host_outdegree(df: DataFrame, links_col: str = "links") -> DataFrame:
    """Host-level outlink degree table ``(link_host, n_links)``
    from an extracted-links array column: explode ->
    absolute-link host regex -> one map-side-combinable groupBy.
    Relative links (no scheme) carry no host and are excluded.  The
    (page, host) pair stream collapses by host BEFORE any join with
    page metadata — at corpus scale the hot boilerplate hosts (CDNs,
    social widgets) are exactly the Zipf head this pre-aggregation
    absorbs map-side."""
    link = F.explode(F.col(links_col)).alias("link")
    host = F.lower(F.regexp_extract(
        F.col("link"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    return (
        df.select(link)
        .select(host.alias("link_host"))
        .where(F.col("link_host") != "")
        .groupBy("link_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
