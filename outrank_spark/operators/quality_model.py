"""Trainable document-quality classifier — the fastText-filter shape
(CCNet / GPT-3 WebText-vs-CommonCrawl quality model): a logistic
regression over hashed bag-of-tokens features, trained distributed,
scored as one Arrow pass.

Spark-first training loop (no MLlib dependency, deterministic):

* features: token -> ``xxhash64 % dim`` bucket counts, built
  vectorized inside Arrow batches (dim defaults to 2^18 -> the weight
  vector is a 2 MB float64 array, trivially broadcastable);
* optimization: FULL-BATCH gradient descent — each epoch broadcasts
  the current weights, one ``mapInPandas`` pass emits per-partition
  gradient partial sums (rows to the driver = n_partitions x dim-
  sparse summaries, shipped dense at 2 MB each), the driver reduces
  and steps.  Full-batch makes the result independent of row order
  and partitioning up to float-sum association — there is no SGD
  sampling order to reproduce;
* scoring: broadcast weights, one ``mapInPandas`` sigmoid pass.

At 100 TB you train on a SAMPLE (quality models always are — CCNet
uses ~Wikipedia-sized positives) and score the full corpus: training
cost is epochs x one scan of the sample; scoring is one scan, no
shuffle.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from outrank_spark.hashing import hash_values

__all__ = ["train_quality_classifier", "score_quality"]


def _bucketize(texts, dim: int) -> list[np.ndarray]:
    """Per-doc hashed token bucket index arrays."""
    out = []
    for t in texts:
        toks = str(t).split(" ")
        if not toks:
            out.append(np.empty(0, dtype=np.int64))
            continue
        h = hash_values(np.asarray(toks, dtype=object))
        out.append((h % np.uint64(dim)).astype(np.int64))
    return out


def _doc_matrix(bucket_lists: list[np.ndarray], dim: int) -> np.ndarray:
    """Dense (n_docs, dim) normalized count matrix for a batch.
    Batch-local dense is fine: Arrow batches are bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    X = np.zeros((len(bucket_lists), dim), dtype=np.float64)
    for r, idx in enumerate(bucket_lists):
        if len(idx):
            np.add.at(X[r], idx, 1.0)
            X[r] /= len(idx)  # mean-of-embeddings normalization
    return X


def train_quality_classifier(positives: DataFrame, negatives: DataFrame,
                             text_col: str = "text", dim: int = 2 ** 18,
                             epochs: int = 20, lr: float = 10.0,
                             l2: float = 1e-6) -> np.ndarray:
    """Train the hashed-bag logistic model; returns weights
    ``[dim + 1]`` (bias last).  ``positives`` / ``negatives`` are the
    reference-quality and background corpora (any size — sample
    upstream; the loop scans whichever you pass per epoch)."""
    labeled = (
        positives.select(F.col(text_col).alias("t"),
                         F.lit(1.0).alias("y"))
        .unionByName(
            negatives.select(F.col(text_col).alias("t"),
                             F.lit(0.0).alias("y")))
    ).cache()
    n_total = labeled.count()  # also materializes the cache
    if n_total == 0:
        raise ValueError("no training rows")

    w = np.zeros(dim + 1, dtype=np.float64)
    spark = positives.sparkSession
    for _ in range(epochs):
        bc = spark.sparkContext.broadcast(w)

        def grad_pass(batches: Iterator[pd.DataFrame],
                      ) -> Iterator[pd.DataFrame]:
            wt = bc.value
            g = np.zeros_like(wt)
            loss = 0.0
            n = 0
            for pdf in batches:
                X = _doc_matrix(_bucketize(pdf["t"], dim), dim)
                y = pdf["y"].to_numpy(np.float64)
                z = X @ wt[:-1] + wt[-1]
                p = 1.0 / (1.0 + np.exp(-z))
                err = p - y
                g[:-1] += X.T @ err
                g[-1] += err.sum()
                eps = 1e-12
                loss += float(-(y * np.log(p + eps)
                                + (1 - y) * np.log(1 - p + eps)).sum())
                n += len(y)
            yield pd.DataFrame({"g": [g.tobytes()], "n": [n],
                                "loss": [loss]})

        parts = labeled.mapInPandas(
            grad_pass, schema="g binary, n long, loss double",
        ).collect()
        g = np.zeros_like(w)
        n = 0
        for row in parts:
            g += np.frombuffer(bytes(row["g"]), dtype=np.float64)
            n += row["n"]
        g /= max(n, 1)
        g[:-1] += l2 * w[:-1]
        w = w - lr * g
        bc.unpersist()
    labeled.unpersist()
    return w


def score_quality(df: DataFrame, weights: np.ndarray,
                  text_col: str = "text",
                  out_col: str = "quality_score") -> DataFrame:
    """Append the sigmoid quality score — one Arrow pass, weights
    broadcast, zero shuffle."""
    dim = len(weights) - 1
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(weights, dtype=np.float64))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
    ) + f", `{out_col}` double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wt = bc.value
        for pdf in batches:
            X = _doc_matrix(_bucketize(pdf[text_col], dim), dim)
            z = X @ wt[:-1] + wt[-1]
            pdf[out_col] = 1.0 / (1.0 + np.exp(-z))
            yield pdf

    return df.mapInPandas(fn, schema=schema)
