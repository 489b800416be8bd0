"""Deterministic Common-Crawl-style ``pages`` table generator.

The north-rule input table (BASELINE.json ``input_hint``):
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  Every cell is a pure function of (row index, seed) —
FIXTURES.md §A — so any partitioning of ``spark.range`` produces
byte-identical rows, and the html wraps the text so a deterministic
extractor can recover ``text`` byte-identically (the per-row invariant
the driver checks).

Skew is real: hosts are Zipf(alpha=1.1) over 1,000 synthetic domains
across 50 TLDs, so the head domain holds ~7% of rows — exercising the
salted-merge path.  Generation is vectorized numpy inside
``mapInPandas`` batches; the only per-row Python is the final token
join (C-level ``str.join`` per document).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from outrank_spark.hashing import GOLDEN_GAMMA, splitmix64

__all__ = ["generate_pages", "pages_pandas", "read_pages_table",
           "PAGES_SCHEMA", "PAGES_COLUMNS", "LANGS", "TLDS"]

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

LANGS = ["en", "de", "fr", "es", "ja", "it", "nl", "pt"]
_LANG_PROBS = np.array([0.50, 0.12, 0.10, 0.08, 0.06, 0.05, 0.05, 0.04])
_LANG_CUM = np.cumsum(_LANG_PROBS)

TLDS = [
    "com", "org", "net", "de", "jp", "fr", "es", "it", "nl", "pt",
    "co.uk", "io", "edu", "gov", "info", "biz", "ru", "cn", "in", "br",
    "au", "ca", "ch", "se", "no", "fi", "dk", "pl", "cz", "at",
    "be", "gr", "hu", "ie", "kr", "mx", "nz", "ro", "sg", "sk",
    "tr", "tw", "ua", "ar", "cl", "co", "hk", "id", "il", "th",
]

N_HOSTS = 1000
ZIPF_ALPHA = 1.1
VOCAB_SIZE = 10_000
_BASE_TS_US = np.int64(
    pd.Timestamp("2024-01-01T00:00:00").value // 1000,
)  # microseconds
_SPAN_US = np.int64(180) * 86_400 * 1_000_000

# Host popularity CDF (Zipf alpha=1.1 over N_HOSTS ranks).
_host_w = 1.0 / np.power(np.arange(1, N_HOSTS + 1), ZIPF_ALPHA)
_HOST_CUM = np.cumsum(_host_w / _host_w.sum())
_TLD_PER_HOST = np.array([TLDS[h % len(TLDS)] for h in range(N_HOSTS)])
_HOST_NAMES = np.array(
    [f"site{h:04d}.{_TLD_PER_HOST[h]}" for h in range(N_HOSTS)], dtype=object,
)


def _u01(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Uniform [0,1) as a pure function of (row index, stream, seed)."""
    h = splitmix64(idx.astype(np.uint64) * GOLDEN_GAMMA
                   ^ splitmix64(np.uint64(seed * 1_000_003 + stream)))
    return h.astype(np.float64) / 18446744073709551616.0  # 2^64


def pages_pandas(idx: np.ndarray, seed: int = 42,
                 max_tokens: int = 512) -> pd.DataFrame:
    """Generate the pages rows for the given row indices (vectorized)."""
    idx = np.asarray(idx, dtype=np.int64)
    n = idx.size

    host_id = np.searchsorted(_HOST_CUM, _u01(idx, 0, seed), side="right")
    host_id = np.minimum(host_id, N_HOSTS - 1)
    hosts = _HOST_NAMES[host_id]

    path_hash = splitmix64(idx.astype(np.uint64) ^ np.uint64(seed + 2))
    paths = np.char.mod("%016x", path_hash.astype(np.uint64))

    url = np.char.add(
        np.char.add(np.char.add("https://", hosts.astype(str)), "/"), paths,
    )

    ts_off = (splitmix64(idx.astype(np.uint64) ^ np.uint64(seed + 3))
              % np.uint64(_SPAN_US)).astype(np.int64)
    warc_ts = pd.to_datetime(_BASE_TS_US + ts_off, unit="us")

    lang_id = np.searchsorted(_LANG_CUM, _u01(idx, 1, seed), side="right")
    lang_id = np.minimum(lang_id, len(LANGS) - 1)
    lang = np.array(LANGS, dtype=object)[lang_id]

    # token count ~ lognormal(mu=5, sigma=1) via Box-Muller on two
    # hash-derived uniforms, clipped to [3, max_tokens]
    u1 = np.clip(_u01(idx, 2, seed), 1e-12, 1.0)
    u2 = _u01(idx, 3, seed)
    normal = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    n_tok = np.clip(np.exp(5.0 + normal), 3, max_tokens).astype(np.int64)

    # token ids: Zipf-ish power map of per-(row, position) uniforms
    # into a per-lang vocab slice -> "«lang»w«id»"
    doc_of_token = np.repeat(np.arange(n), n_tok)
    tok_pos = np.concatenate([np.arange(k) for k in n_tok]) if n else np.empty(0, np.int64)
    tok_hash = splitmix64(
        (idx[doc_of_token].astype(np.uint64) * GOLDEN_GAMMA)
        ^ splitmix64(tok_pos.astype(np.uint64) + np.uint64(seed * 7 + 11)),
    )
    tok_u = tok_hash.astype(np.float64) / 18446744073709551616.0
    tok_id = (VOCAB_SIZE * np.power(tok_u, 3.0)).astype(np.int64)
    tok_id = np.minimum(tok_id, VOCAB_SIZE - 1)
    tokens = pd.Series(
        np.char.add(
            np.char.add(lang[doc_of_token].astype(str), "w"),
            tok_id.astype(str),
        ),
    )
    text = tokens.groupby(doc_of_token).agg(" ".join).reindex(
        np.arange(n), fill_value="",
    ).to_numpy(dtype=object)

    title = hosts
    html = np.array(
        [
            b"<html><head><title>%s</title></head><body>%s</body></html>"
            % (t.encode("utf-8"), x.encode("utf-8"))
            for t, x in zip(title, text)
        ],
        dtype=object,
    )

    return pd.DataFrame(
        {
            "url": url.astype(object),
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "lang": lang,
        },
    )


def generate_pages(spark, n_rows: int, seed: int = 42,
                   partitions: int | None = None, max_tokens: int = 512):
    """Distributed deterministic pages table: ``spark.range`` drives the
    row-index space; each partition materializes its slice vectorized.
    Any partition count yields identical rows (pure function of index).
    """
    rng_df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield pages_pandas(pdf["id"].to_numpy(), seed=seed,
                               max_tokens=max_tokens)

    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_pages_table(spark, source: str, fmt: str = "auto"):
    """Load a pages table from its production home (an Iceberg table)
    or the in-sandbox stand-in (a parquet directory), normalized to the
    north-rule shape ``(url, warc_ts, html, text, lang)``.

    Resolution: ``fmt='iceberg'`` forces the Iceberg DataSource (raises
    a clear error when the runtime jar is absent, as in this sandbox);
    ``fmt='auto'`` treats a dotted name with no path separator as a
    catalog table (``spark.read.table`` — how an Iceberg catalog is
    addressed), a directory containing ``metadata/`` as an Iceberg
    path, and anything else as parquet.  Extra columns are dropped so
    downstream plans can rely on the canonical five; Catalyst still
    prunes ``html`` from the physical scan unless a consumer asks for
    it (plan-asserted in tests/test_plan_audit.py).
    """
    import os

    from pyspark.sql import functions as F

    df = None
    if fmt == "auto":
        if "/" not in source and "." in source:
            df = spark.read.table(source)
        elif os.path.isdir(os.path.join(source, "metadata")):
            fmt = "iceberg"
        else:
            fmt = "parquet"
    if df is None and fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception as exc:
            msg = str(exc)
            # only blame the jar when the DataSource itself is missing;
            # real read errors (table absent, bad metadata, permissions)
            # surface untouched
            if ("Failed to find" in msg or "ClassNotFound" in msg
                    or "DATA_SOURCE_NOT_FOUND" in msg):
                raise RuntimeError(
                    "Iceberg DataSource unavailable — submit with "
                    "--packages org.apache.iceberg:iceberg-spark-runtime-"
                    "<spark-version> (and a catalog config); parquet "
                    "stand-in: read_pages_table(spark, path, "
                    "fmt='parquet')",
                ) from exc
            raise
    elif df is None and fmt == "parquet":
        df = spark.read.parquet(source)
    elif df is None:
        raise ValueError(f"unknown fmt {fmt!r}: use 'auto', 'iceberg' "
                         "or 'parquet'")
    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"pages table at {source} lacks {missing}")
    return df.select(
        F.col("url").cast("string"),
        F.col("warc_ts").cast("timestamp"),
        F.col("html").cast("binary"),
        F.col("text").cast("string"),
        F.col("lang").cast("string"),
    )
