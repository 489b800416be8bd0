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

__all__ = ["pack_sequences"]


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", seq_len: int = 2048,
                   buckets: int = 16) -> DataFrame:
    """Packing manifest: ``(id, n_tokens, bucket, start_offset,
    pack_id)`` where ``start_offset`` is the document's first-token
    position in its bucket's concatenated stream and ``pack_id =
    floor(start_offset / seq_len)``.

    Scale: one shuffle+sort keyed by bucket; skew-free because the
    bucket key is a hash.  Raise ``buckets`` with corpus size — each
    bucket's window sorts ~N/buckets manifest rows (id + counts, no
    text)."""
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
