"""Approximate-nearest-neighbor search over an embedding column.

* :func:`brute_force_topk` — exact cosine top-k of a (small,
  broadcast) query set against the full table; JVM array algebra
  (zip_with/aggregate) + a per-query window — the correctness
  baseline at any scale where queries are few.
* :func:`lsh_topk` — the scale path: random-hyperplane buckets
  (shared with the dedup LSH) prune the table to bucket-mates before
  the exact rerank; recall is tunable via (n_planes, n_tables) —
  multiprobe over all tables means a candidate only needs to collide
  in ONE table.
* :func:`ivf_topk` — IVF-style variant: coarse centroids are sampled
  deterministically from the data (hash-ordered sample, k-means++-ish
  single refinement pass in numpy), vectors are assigned to their
  nearest centroid JVM-side is impossible without a UDF, so
  assignment runs in one vectorized Arrow pass; queries probe the
  ``n_probe`` nearest cells.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["brute_force_topk", "lsh_topk", "ivf_topk"]


def _cosine_cols(qv, ev):
    dot = F.aggregate(
        F.zip_with(qv, ev, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda a, x: a + x * x))
    n2 = F.sqrt(F.aggregate(ev, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (n1 * n2)


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact top-k: broadcast queries x full scan, window rerank.
    ``queries``: (query_id, qv array<double>)."""
    emb = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
    )
    scored = (
        F.broadcast(queries).crossJoin(emb)
        .withColumn("cosine", _cosine_cols(F.col("qv"), F.col("v")))
        .select("query_id", id_col, "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_buckets(df: DataFrame, vec_col: str, id_col: str,
                   n_planes: int, n_tables: int, seed: int,
                   dim: int) -> DataFrame:
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            sgn = np.einsum("tpd,nd->ntp", planes, vecs) > 0
            weights = 1 << np.arange(n_planes, dtype=np.int64)
            buckets = (sgn * weights[None, None, :]).sum(axis=2)
            yield pd.DataFrame({
                "id": np.repeat(ids, n_tables),
                "table": np.tile(np.arange(n_tables), len(ids)),
                "bucket": buckets.reshape(-1),
            })

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema="id long, table int, bucket long",
    )


def lsh_topk(df: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_planes: int = 12, n_tables: int = 8,
             seed: int = 20141025) -> DataFrame:
    """LSH-pruned top-k: exact rerank over bucket-mates only.
    ``queries``: (query_id, qv array<double>)."""
    dim = len(queries.select("qv").first()[0])
    data_buckets = _plane_buckets(df, vec_col, id_col, n_planes,
                                  n_tables, seed, dim)
    qdf = queries.select(
        F.col("query_id").alias("vec_id_q"), F.col("qv"),
    )
    query_buckets = _plane_buckets(
        qdf.withColumnRenamed("qv", "v"), "v", "vec_id_q",
        n_planes, n_tables, seed, dim,
    ).withColumnRenamed("id", "query_id")
    cand = (
        query_buckets.join(data_buckets, ["table", "bucket"])
        .select("query_id", F.col("id").alias(id_col))
        .distinct()
    )
    emb = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
    )
    scored = (
        cand.join(F.broadcast(queries), "query_id")
        .join(emb, id_col)
        .withColumn("cosine", _cosine_cols(F.col("qv"), F.col("v")))
        .select("query_id", id_col, "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 64, n_probe: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 20141025, sample_size: int = 4096) -> DataFrame:
    """IVF: coarse-quantize the table into ``n_cells`` cells, probe the
    ``n_probe`` nearest cells per query, exact rerank inside."""
    # --- train centroids on a deterministic sample (driver, tiny) ----
    sample = np.stack(
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_size)
        .toPandas()[vec_col]
        .to_numpy(),
    ).astype(np.float64)
    rng = np.random.Generator(np.random.PCG64(seed))
    centroids = sample[rng.choice(len(sample), n_cells, replace=False)]
    for _ in range(5):  # few Lloyd iterations on the sample
        d = sample @ centroids.T
        assign = d.argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    centroids = centroids / np.maximum(norms, 1e-12)

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12,
            )
            cell = (vn @ centroids.T).argmax(axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(), "cell": cell.astype(np.int32),
            })

    cells = df.select(id_col, vec_col).mapInPandas(
        assign_cells, schema="id long, cell int",
    ).withColumnRenamed("id", id_col)

    qpdf = queries.toPandas()
    qvecs = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
    qn = qvecs / np.maximum(np.linalg.norm(qvecs, axis=1, keepdims=True), 1e-12)
    probe_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    spark = df.sparkSession
    probes = spark.createDataFrame(
        pd.DataFrame({
            "query_id": np.repeat(qpdf["query_id"].to_numpy(), n_probe),
            "cell": probe_cells.reshape(-1).astype(np.int32),
        }),
    )
    emb = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
    ).join(cells, id_col)
    scored = (
        F.broadcast(probes).join(emb, "cell")
        .join(F.broadcast(queries), "query_id")
        .withColumn("cosine", _cosine_cols(F.col("qv"), F.col("v")))
        .select("query_id", id_col, "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
