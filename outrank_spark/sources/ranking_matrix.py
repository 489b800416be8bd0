"""Deterministic synthetic ranking matrices (FIXTURES.md §B/§C).

Byte-identical reproductions of the reference's seeded generators
(np.random.seed(123) + MT19937 randint), used for the end-to-end
golden tests:

* ``naive`` — package selftest matrix
  (``generator_naive.py:9-18``): uniform ints [10, 100); ``target``
  is a *view* of column 30, so the in-place binarization (<40 -> 0,
  else 1) rewrites ``f30`` too — hence ``label`` == ``f30`` exactly
  and both end up binary.  Selftest golden: 201 triplet rows, top
  feature ``label-(2; 100)`` (task_selftest.py:32-34).
* ``bench_naive`` — benchmarks variant
  (``benchmarks/generator_naive.py:10-19``): ``f31 = target * 19``
  echo column, target zeroed below 20 (needle: f30 rank-1).
* ``second_order`` / ``third_order`` — label = f30+f50 (+f20),
  zeroed below 20 (benchmarks/generator_second_order.py,
  generator_third_order.py); needles are the interaction features.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["generate_ranking_matrix", "ranking_matrix_pandas"]


def ranking_matrix_pandas(num_features: int = 100, size: int = 20000,
                          variant: str = "naive",
                          seed: int = 123) -> pd.DataFrame:
    np.random.seed(seed)
    sample = np.random.randint(10, 100, size=(size, num_features))

    if variant == "naive":
        target = sample[:, 30]          # view: binarization hits f30 too
        target[target < 40] = 0
        target[target > 39] = 1
    elif variant == "bench_naive":
        target = sample[:, 30]          # view
        sample[:, 31] = target * 19
        target[target < 20] = 0
    elif variant == "second_order":
        target = sample[:, 30] + sample[:, 50]
        target[target < 20] = 0
    elif variant == "third_order":
        target = sample[:, 30] + sample[:, 50] + sample[:, 20]
        target[target < 20] = 0
    else:
        raise ValueError(f"unknown variant {variant!r}")

    dfx = pd.DataFrame(sample)
    dfx.columns = [f"f{x}" for x in range(dfx.shape[1])]
    dfx["label"] = target
    return dfx


def generate_ranking_matrix(spark, num_features: int = 100,
                            size: int = 20000, variant: str = "naive",
                            seed: int = 123, partitions: int = 8):
    """Spark DataFrame over the (driver-generated, seeded) matrix.

    The reference generator is a single seeded MT19937 stream, which is
    inherently sequential — so the matrix is materialized on the driver
    (fixture scale: <= 2M x 300 ints) and parallelized.  The *engine*
    never depends on this: real inputs arrive via parquet/Iceberg scans.
    """
    pdf = ranking_matrix_pandas(num_features, size, variant, seed)
    # Strings mirror the reference's csv-raw round-trip (all columns
    # are read back as strings, core_utils.py:389-400).
    return spark.createDataFrame(pdf.astype(str)).repartition(partitions)
