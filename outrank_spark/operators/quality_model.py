"""Trainable document-quality classifier — the fastText-filter shape
(CCNet / GPT-3 WebText-vs-CommonCrawl quality model): a logistic
regression over hashed bag-of-tokens features, trained distributed,
scored as one Arrow pass.

Spark-first training loop (no MLlib dependency, deterministic):

* features: token -> hashed bucket (``outrank_spark.hashing.
  hash_values % dim``; dim defaults to 2^18 -> the weight vector is a
  2 MB float64 array, trivially broadcastable), mean-aggregated per
  document;
* optimization: FULL-BATCH gradient descent — each epoch broadcasts
  the current weights, one ``mapInPandas`` pass emits per-partition
  gradient partial sums (one dense ``dim+1`` array per partition, 2 MB
  each), the driver reduces and steps.  Full-batch makes the result
  independent of row order and partitioning up to float-sum
  association — there is no SGD sampling order to reproduce;
* scoring: broadcast weights, one ``mapInPandas`` sigmoid pass.

Everything is SPARSE per document: features are index lists, the
forward pass is segment-means over ``wt[flat_idx]`` and the backward
pass one ``np.add.at`` scatter — no (batch x dim) dense matrix ever
exists (a dense batch at dim=2^18 would be ~20 GiB).

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


def _flat_buckets(texts, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch features as (flat bucket indices, per-doc token counts).
    Empty/whitespace-only documents get zero tokens (count 0)."""
    idx_parts: list[np.ndarray] = []
    lens = np.zeros(len(texts), dtype=np.int64)
    for r, t in enumerate(texts):
        if t is None or (isinstance(t, float) and np.isnan(t)):
            continue  # null text == empty doc, not a 'None' token
        toks = [tok for tok in str(t).split(" ") if tok]
        if not toks:
            continue
        h = hash_values(np.asarray(toks, dtype=object))
        idx_parts.append((h % np.uint64(dim)).astype(np.int64))
        lens[r] = len(toks)
    flat = (np.concatenate(idx_parts) if idx_parts
            else np.empty(0, dtype=np.int64))
    return flat, lens


def _forward(flat: np.ndarray, lens: np.ndarray,
             wt: np.ndarray) -> np.ndarray:
    """Per-doc logit: mean of wt over the doc's token buckets + bias.
    Zero-token docs get the bias alone."""
    z = np.full(len(lens), wt[-1], dtype=np.float64)
    if len(flat):
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        seg = np.add.reduceat(wt[:-1][flat], starts[lens > 0])
        z[lens > 0] += seg / lens[lens > 0]
    return z


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
            n = 0
            for pdf in batches:
                flat, lens = _flat_buckets(pdf["t"], dim)
                y = pdf["y"].to_numpy(np.float64)
                z = _forward(flat, lens, wt)
                err = 1.0 / (1.0 + np.exp(-z)) - y
                if len(flat):
                    # scatter err_r / len_r onto each token bucket
                    per_tok = np.repeat(
                        err[lens > 0] / lens[lens > 0],
                        lens[lens > 0],
                    )
                    np.add.at(g[:-1], flat, per_tok)
                g[-1] += err.sum()
                n += len(y)
            yield pd.DataFrame({"g": [g.tobytes()], "n": [n]})

        parts = labeled.mapInPandas(
            grad_pass, schema="g binary, n long",
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
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists — pass a "
            "different out_col (or drop/rename the existing one)",
        )
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
            flat, lens = _flat_buckets(pdf[text_col], dim)
            z = _forward(flat, lens, wt)
            pdf[out_col] = 1.0 / (1.0 + np.exp(-z))
            yield pdf

    return df.mapInPandas(fn, schema=schema)
