"""Sequence-packing manifest — the concatenate-and-chunk preparation
step of LM training pipelines (GPT-style: documents are concatenated
into one token stream per shard and split into fixed ``seq_len``
windows; a document whose span crosses a boundary contributes to two
consecutive packs).

This operator computes the PACKING MANIFEST — for every document its
shard (bucket), global token offset within the shard stream, and the
pack it starts in — without materializing any token stream.  The
manifest is what a downstream tokenizer/writer consumes to emit the
actual training shards.

Spark-first shape: documents are hash-assigned to ``buckets``
independent shard streams, and the running token offset is one
window cumulative sum PER BUCKET — so the sort parallelism is the
bucket count, never a global single-task sort.  Order within a bucket
is the md5-prefix key of the id (deterministic, order-free,
reproducible at any parallelism — and bit-identical in DuckDB, which
is what makes the q66 oracle exact).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from outrank_spark.operators.sampling import _md5_key

__all__ = ["pack_sequences", "chunk_documents"]


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", seq_len: int = 2048,
                   buckets: int = 16,
                   rows_per_bucket: int | None = 4_000_000) -> DataFrame:
    """Packing manifest: ``(id, n_tokens, bucket, start_offset,
    pack_id)`` where ``start_offset`` is the document's first-token
    position in its bucket's concatenated stream and ``pack_id =
    floor(start_offset / seq_len)``.

    Scale: one shuffle+sort keyed by bucket; skew-free because the
    bucket key is a hash.  The bucket count AUTOSCALES from one
    count(): ``buckets = max(buckets, ceil(n / rows_per_bucket))``
    (the semantic_dedup k-autoscale recipe), so each bucket's window
    sorts at most ~``rows_per_bucket`` manifest rows (id + counts,
    no text) at ANY corpus size — a 10^12-doc corpus gets ~250k
    shard streams instead of 16 corpus-sized single-task sorts.
    ``rows_per_bucket=None`` disables the count and pins ``buckets``
    exactly (callers that need a reproducible shard count across
    differently-sized inputs)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if rows_per_bucket is not None:
        if rows_per_bucket < 1:
            raise ValueError(
                f"rows_per_bucket must be >= 1, got {rows_per_bucket}")
        n = df.count()
        buckets = max(int(buckets), -(-n // int(rows_per_bucket)))
    key = _md5_key(id_col)
    # null or empty/whitespace-only text packs as ZERO tokens (matches
    # quality_model._flat_buckets): a bare size(split(...)) would emit
    # null manifest rows for null text and count "" as one token,
    # silently inflating every later start_offset in the bucket.
    txt = F.col(text_col)
    n_tokens = (
        F.when(txt.isNull() | (F.trim(txt) == ""), F.lit(0))
        .otherwise(F.size(F.split(txt, " ")))
    )
    base = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.pmod(key, F.lit(buckets)).alias("bucket"),
        key.alias("__k"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__k", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn(
            "start_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .cast("long"),
        )
        .withColumn(
            "pack_id",
            F.floor(F.col("start_offset") / F.lit(seq_len)),
        )
        .drop("__k")
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 512,
                    overlap: int = 0,
                    chunk_text_col: str = "chunk_text") -> DataFrame:
    """RAG-style overlapping chunker: split each document's
    whitespace token stream into windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive windows
    (stride = chunk_tokens - overlap).

    Chunk-count rule (integer-exact, so the q79 DuckDB oracle is
    bitwise): a doc of n tokens yields 1 chunk if ``n <=
    chunk_tokens``, else ``floor((n - chunk_tokens + stride - 1) /
    stride) + 1`` — the last chunk always reaches the end of the
    document and may be shorter; no chunk past the end, no duplicate
    tail.  Docs with 0 tokens (null/empty/whitespace text) yield NO
    rows — filter upstream if empty docs must be kept.

    All-JVM: one split + one ``posexplode(sequence(...))`` map — no
    shuffle at all; chunk rows inherit the input's partitioning, so
    a downstream embed/index stage parallelizes over chunks for
    free.  Output: ``(id, chunk_id, start_token, n_chunk_tokens,
    chunk_text)``.
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda w: w != "")
    base = df.select(
        F.col(id_col), toks.alias("_toks"),
    ).withColumn("_n", F.size("_toks")).where(F.col("_n") > 0)
    n_chunks = F.when(
        F.col("_n") <= chunk_tokens, F.lit(1),
    ).otherwise(
        F.floor((F.col("_n") - chunk_tokens + stride - 1) / stride) + 1,
    )
    return (
        base.withColumn("_k", n_chunks)
        .select(
            id_col, "_toks", "_n",
            F.posexplode(F.sequence(F.lit(0), F.col("_k") - 1))
            .alias("chunk_id", "_i"),
        )
        .select(
            id_col,
            "chunk_id",
            (F.col("_i") * stride).alias("start_token"),
            F.least(F.lit(chunk_tokens),
                    F.col("_n") - F.col("_i") * stride)
            .cast("int").alias("n_chunk_tokens"),
            F.concat_ws(
                " ",
                F.slice(F.col("_toks"),
                        F.col("_i") * stride + 1,
                        F.lit(chunk_tokens)),
            ).alias(chunk_text_col),
        )
    )
