"""Deterministic, vectorized 64-bit hashing for sketch kernels.

The reference engine (outbrain-inc/outrank) hashes values with ``xxhash``
(``core_utils.py:46-48`` xxh32 ``internal_hash``; ``counting_cms.py:10-13``
``hash()``-based CMS rows).  ``xxhash`` is not available in this
environment, so every sketch in this package hashes through a single
deterministic family built from:

* ``pandas.util.hash_array`` — a vectorized, C-implemented 64-bit hash of
  arbitrary arrays (strings included) with a fixed key, stable across
  processes and machines (pandas documents the default ``hash_key``), and
* ``splitmix64`` — a public-domain 64-bit finalizer/mixer (Steele et al.,
  "Fast splittable pseudorandom number generators", OOPSLA 2014) used to
  derive independent seeded hash functions from the base hash.

All functions operate on whole numpy arrays (no per-row Python), per the
north-rule requirement of vectorized Arrow-side execution.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

def qcol(name: str):
    """Column reference by EXACT name, backtick-quoted.

    ``F.col(name)`` parses dots as struct-field access, so derived
    feature names containing dots (e.g. the verbose vault's
    ``f1_tr_boxcox_lambda_0.5``) resolve to nothing.  Quoting makes
    the name literal; backticks inside the name are escaped."""
    from pyspark.sql import functions as F

    return F.col("`" + name.replace("`", "``") + "`")


__all__ = [
    "qcol",
    "splitmix64",
    "hash_values",
    "hash_with_seed",
    "derive_seeds",
    "GOLDEN_GAMMA",
]

# splitmix64 increment (odd constant, 2^64/phi)
GOLDEN_GAMMA = np.uint64(0x9E3779B97F4A7C15)

_MUL1 = np.uint64(0xBF58476D1CE4E5B9)
_MUL2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64.

    Bijective, so it never loses entropy; used to (a) derive seed
    streams and (b) re-mix the base hash with a seed for independent
    hash functions (CMS rows, Bloom probes, MinHash permutations).
    """
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + GOLDEN_GAMMA).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(30))) * _MUL1).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(27))) * _MUL2).astype(np.uint64)
        z = z ^ (z >> np.uint64(31))
    return z


def hash_values(values) -> np.ndarray:
    """Hash an arbitrary 1-D array-like to uint64, vectorized.

    Strings, ints, floats, categoricals all accepted; NaN/None hash to a
    fixed value.  Deterministic across runs and processes (fixed pandas
    hash key), which is what makes the resulting sketches mergeable
    across Spark executors.
    """
    if isinstance(values, pd.Series):
        arr = values.to_numpy()
    else:
        arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        # Fast pure-numpy path for integer keys.
        return splitmix64(arr.astype(np.uint64, copy=False))
    if arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr).astype(np.uint64, copy=False)


def hash_with_seed(hashes: np.ndarray, seed: int | np.uint64) -> np.ndarray:
    """Derive an independent hash function by mixing pre-hashed uint64
    values with a seed through splitmix64."""
    with np.errstate(over="ignore"):
        return splitmix64(hashes ^ np.uint64(seed))


def derive_seeds(master_seed: int, n: int) -> np.ndarray:
    """Deterministic seed stream: n independent uint64 seeds.

    The reference CMS draws its row seeds from an *unseeded*
    ``np.random.randint`` (``counting_cms.py:23``), which makes two CMS
    instances unmergeable — a bug SURVEY.md §2.4 flags.  Here every
    sketch derives seeds from a constant master seed so that sketches
    built on different executors merge exactly.
    """
    base = splitmix64(np.arange(1, n + 1, dtype=np.uint64) * GOLDEN_GAMMA
                      + np.uint64(master_seed))
    return base.astype(np.uint64)
