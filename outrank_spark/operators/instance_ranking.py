"""Per-row (instance) quality scoring — Spark port of the reference's
``task_instance_ranking`` (task_instance_ranking.py:22-105).

Per row: Shannon entropy summed over the character distributions of
its fields, missing/zero proportions, and length-threshold shares;
then density histograms per label instead of matplotlib PDFs — the
distributed output is the histogram relation itself
``(label, metric, bucket, density)``, exact via width_bucket +
groupBy (no driver-side loops, no plotting dependency).

The entropy kernel is vectorized with a bincount over the byte values
of each field (numpy inside the Arrow batch).
"""
from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["shannon_entropy", "score_instances", "instance_histograms"]

_LEN_THRESHOLDS = (30, 60, 100, 200, 300)

_METRICS = [
    "empty_string_prop", "empty_dict", "all_empty", "all_zero",
    "row_entropy",
] + [f"all_more_{j}_chars" for j in _LEN_THRESHOLDS]


def shannon_entropy(string: str) -> float:
    """Character-level Shannon entropy in bits (reference
    task_instance_ranking.py:22-25)."""
    if not string:
        return 0.0
    arr = np.frombuffer(str(string).encode("utf-8", "replace"), dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    freq = counts[counts > 0] / arr.size
    return float(-(freq * np.log2(freq)).sum())


def _column_entropy(col: pd.Series) -> np.ndarray:
    """Whole-column Shannon entropy: one flat byte buffer + a single
    (rows x 256) bincount — no per-row Python in the Arrow batch.
    Bit-identical to mapping :func:`shannon_entropy` row by row."""
    enc = [str(x).encode("utf-8", "replace") for x in col.to_numpy(object)]
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    if n == 0 or int(lens.sum()) == 0:
        return np.zeros(n)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount(
        row_ids * 256 + buf, minlength=n * 256,
    ).reshape(n, 256)
    p = counts / np.maximum(lens, 1)[:, None]
    logp = np.zeros_like(p)
    np.log2(p, out=logp, where=p > 0)
    ent = -(p * logp).sum(axis=1)
    ent[lens == 0] = 0.0
    return ent


def _score_batch(pdf: pd.DataFrame, columns: Sequence[str]) -> pd.DataFrame:
    vals = pdf[list(columns)].astype(str)
    n_fields = len(columns)
    empty = (vals == "").sum(axis=1) / n_fields
    empty_dict = (vals == "{}").sum(axis=1) / n_fields
    zero = (vals == "0").sum(axis=1) / n_fields
    lengths = vals.apply(lambda s: s.str.len())
    entropy = pd.Series(
        np.sum([_column_entropy(vals[c]) for c in vals.columns], axis=0),
        index=vals.index,
    )
    out = pd.DataFrame({
        "empty_string_prop": empty,
        "empty_dict": empty_dict,
        "all_empty": empty + empty_dict,
        "all_zero": zero,
        "row_entropy": entropy,
    })
    for j in _LEN_THRESHOLDS:
        out[f"all_more_{j}_chars"] = (lengths > j).sum(axis=1) / n_fields
    return out


def score_instances(df: DataFrame, label_column: str,
                    columns: Sequence[str] | None = None) -> DataFrame:
    """Append the per-row quality metrics; one Arrow pass."""
    columns = [c for c in (columns or df.columns)]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{m}` double" for m in _METRICS],
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = _score_batch(pdf, columns)
            yield pd.concat(
                [pdf.reset_index(drop=True), scores.reset_index(drop=True)],
                axis=1,
            )

    return df.mapInPandas(fn, schema=schema)


def instance_histograms(df: DataFrame, label_column: str,
                        columns: Sequence[str] | None = None,
                        bins: int = 100) -> DataFrame:
    """(label, metric, bucket, n, density): exact per-label histograms
    of every instance metric — the distributed replacement for the
    reference's matplotlib histogram PDFs."""
    scored = score_instances(df, label_column, columns)
    # global min/max for every metric in ONE agg, then bucket all
    # metrics in a single select + explode
    bounds = scored.agg(
        *[F.min(m).alias(f"lo_{m}") for m in _METRICS],
        *[F.max(m).alias(f"hi_{m}") for m in _METRICS],
    ).first()
    bucket_structs = []
    for m in _METRICS:
        lo, hi = bounds[f"lo_{m}"], bounds[f"hi_{m}"]
        if lo is None or hi is None or hi == lo:
            hi = (lo or 0.0) + 1.0
            lo = lo or 0.0
        bucket_structs.append(
            F.struct(
                F.lit(m).alias("metric"),
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col(m) - F.lit(lo)) / F.lit(hi - lo) * bins),
                ).cast("int").alias("bucket"),
            ),
        )
    exploded = scored.select(
        F.col(label_column).alias("label"),
        F.explode(F.array(*bucket_structs)).alias("mb"),
    ).select("label", F.col("mb.metric").alias("metric"),
             F.col("mb.bucket").alias("bucket"))
    counts = exploded.groupBy("label", "metric", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
    )
    totals = counts.groupBy("label", "metric").agg(
        F.sum("n").alias("total"),
    )
    return (
        counts.join(totals, ["label", "metric"])
        .withColumn("density", F.col("n") / F.col("total"))
        .select("label", "metric", "bucket", "n", "density")
        .orderBy("label", "metric", "bucket")
    )
