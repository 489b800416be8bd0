"""Byte-parity tests for the pure-numpy xxHash family.

The reference hashes interaction values with
``xxhash.xxh64(concat).hexdigest()`` (reference core_ranking.py:219)
and sketch inputs with ``xxhash.xxh32(s, seed=20141025).hexdigest()``
(reference core_utils.py:46-48).  The ``xxhash`` C extension is absent
in this runtime, so parity is established three ways:

1. pinned PUBLISHED test vectors (xxHash spec / Wikipedia /
   python-xxhash README) covering every code path;
2. a differential fuzz against an INDEPENDENTLY WRITTEN scalar
   implementation of the public spec (below, per-byte Python — test
   only), over all lengths 0..200 including multi-stripe inputs;
3. golden interaction hex tokens through the Spark
   ``parity_hashes=True`` path.
"""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.hashing import (
    xxh32,
    xxh32_hexdigest,
    xxh64,
    xxh64_hexdigest,
)

# ---------------------------------------------------------------------------
# Scalar spec implementations (test-only, deliberately written in the
# most literal per-byte style so a bug in the vectorized masked-lane
# logic cannot be replicated here).
# ---------------------------------------------------------------------------

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1


def _rot64(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _rot32(x, r):
    return ((x << r) | (x >> (32 - r))) & M32


def scalar_xxh64(data: bytes, seed: int = 0) -> int:
    p1, p2, p3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    p4, p5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + p1 + p2) & M64, (seed + p2) & M64,
             seed & M64, (seed - p1) & M64]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v[j] = (_rot64((v[j] + lane * p2) & M64, 31) * p1) & M64
            i += 32
        h = (_rot64(v[0], 1) + _rot64(v[1], 7)
             + _rot64(v[2], 12) + _rot64(v[3], 18)) & M64
        for j in range(4):
            h = ((h ^ (_rot64((v[j] * p2) & M64, 31) * p1) & M64)
                 * p1 + p4) & M64
    else:
        h = (seed + p5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h = (_rot64(h ^ ((_rot64((lane * p2) & M64, 31) * p1) & M64), 27)
             * p1 + p4) & M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = (_rot64(h ^ ((lane * p1) & M64), 23) * p2 + p3) & M64
        i += 4
    while i < n:
        h = (_rot64(h ^ ((data[i] * p5) & M64), 11) * p1) & M64
        i += 1
    h ^= h >> 33
    h = (h * p2) & M64
    h ^= h >> 29
    h = (h * p3) & M64
    h ^= h >> 32
    return h


def scalar_xxh32(data: bytes, seed: int = 0) -> int:
    p1, p2, p3, p4, p5 = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D,
                          0x27D4EB2F, 0x165667B1)
    n, i = len(data), 0
    if n >= 16:
        v = [(seed + p1 + p2) & M32, (seed + p2) & M32,
             seed & M32, (seed - p1) & M32]
        while i + 16 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 4 * j:i + 4 * j + 4], "little")
                v[j] = (_rot32((v[j] + lane * p2) & M32, 13) * p1) & M32
            i += 16
        h = (_rot32(v[0], 1) + _rot32(v[1], 7)
             + _rot32(v[2], 12) + _rot32(v[3], 18)) & M32
    else:
        h = (seed + p5) & M32
    h = (h + n) & M32
    while i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = (_rot32((h + lane * p3) & M32, 17) * p4) & M32
        i += 4
    while i < n:
        h = (_rot32((h + data[i] * p5) & M32, 11) * p1) & M32
        i += 1
    h ^= h >> 15
    h = (h * p2) & M32
    h ^= h >> 13
    h = (h * p3) & M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# 1. Published vectors
# ---------------------------------------------------------------------------

class TestPublishedVectors:
    def test_xxh64_spec_vectors(self):
        # "" / "a" / "abc": canonical vectors published across xxHash
        # ports; fox sentence: Wikipedia's xxHash article (len 43 ->
        # one 32-byte stripe + u64 lane + 3 tail bytes)
        cases = {
            "": 0xEF46DB3751D8E999,
            "a": 0xD24EC4F1A98C6E5B,
            "abc": 0x44BC2CF5AD770999,
            "The quick brown fox jumps over the lazy dog":
                0x0B242D361FDA71BC,
        }
        got = xxh64(list(cases), seed=0)
        for (s, want), g in zip(cases.items(), got):
            assert int(g) == want, s

    def test_xxh64_u32_lane_path_pinned(self):
        # len 6 -> u32 tail lane + 2 bytes, plus a nonzero seed; pinned
        # against the independently-written scalar spec impl (and
        # frozen as regression constants)
        assert int(xxh64(["xxhash"], 0)[0]) \
            == scalar_xxh64(b"xxhash", 0) == 0x32DD38952C4BC720
        assert int(xxh64(["xxhash"], 20141025)[0]) \
            == scalar_xxh64(b"xxhash", 20141025) == 0xB559B98D844E0635

    def test_xxh32_spec_vectors(self):
        cases = {
            "": 0x02CC5D05,
            "a": 0x550D7456,
            "abc": 0x32D153FF,
            "The quick brown fox jumps over the lazy dog": 0xE85EA4DE,
        }
        got = xxh32(list(cases), seed=0)
        for (s, want), g in zip(cases.items(), got):
            assert int(g) == want, s

    def test_hexdigest_formatting(self):
        # hexdigest(): fixed-width lowercase hex, leading zeros kept
        assert xxh64_hexdigest(
            ["The quick brown fox jumps over the lazy dog"], 0,
        )[0] == "0b242d361fda71bc"
        assert xxh32_hexdigest([""], 0)[0] == "02cc5d05"


# ---------------------------------------------------------------------------
# 2. Differential fuzz vs the scalar spec implementation
# ---------------------------------------------------------------------------

class TestDifferential:
    @pytest.mark.parametrize("seed", [0, 20141025, 2 ** 64 - 1])
    def test_xxh64_all_lengths(self, seed):
        rng = np.random.default_rng(11)
        strs = ["".join(chr(33 + int(c)) for c in rng.integers(0, 90, ln))
                for ln in range(201)]
        got = xxh64(strs, seed)
        want = [scalar_xxh64(s.encode(), seed) for s in strs]
        assert [int(x) for x in got] == want

    @pytest.mark.parametrize("seed", [0, 20141025, 2 ** 32 - 1])
    def test_xxh32_all_lengths(self, seed):
        rng = np.random.default_rng(12)
        strs = ["".join(chr(33 + int(c)) for c in rng.integers(0, 90, ln))
                for ln in range(201)]
        got = xxh32(strs, seed)
        want = [scalar_xxh32(s.encode(), seed) for s in strs]
        assert [int(x) for x in got] == want

    def test_multibyte_utf8(self):
        # hashing operates on UTF-8 BYTES (like xxhash.xxh64(str) which
        # encodes utf-8): multibyte chars must round through encoding
        strs = ["café", "日本語", "naïve — o"]
        got = xxh64(strs, 0)
        want = [scalar_xxh64(s.encode("utf-8"), 0) for s in strs]
        assert [int(x) for x in got] == want

    def test_mixed_length_batch_matches_singletons(self):
        # masked-lane batching must not bleed state across rows
        strs = ["", "a" * 31, "b" * 32, "c" * 33, "d" * 100, "e" * 7]
        batch = xxh64(strs, 0)
        singles = [int(xxh64([s], 0)[0]) for s in strs]
        assert [int(x) for x in batch] == singles


# ---------------------------------------------------------------------------
# 3. Spark parity path: reference-shaped interaction tokens
# ---------------------------------------------------------------------------

class TestInteractionParity:
    def test_parity_hashes_golden(self, spark):
        """parity_hashes=True emits xxh64-hexdigest tokens of the
        separator-less string concatenation — byte-identical to the
        reference's combine_features (core_ranking.py:211-219).
        Golden constants pinned from the vector-validated impl."""
        from outrank_spark.operators.interactions import (
            with_interaction_features,
        )

        df = spark.createDataFrame(
            [("red", "blue", 1, 0), ("red", "1", 2, 1),
             ("blue", "2", 3, 0), ("green", "3", 4, 1)],
            "f1 string, f2 string, f3 long, label long",
        )
        out, names = with_interaction_features(
            df, label_column="label", interaction_order=2,
            columns=["f1", "f2"], parity_hashes=True,
        )
        assert names == ["f1 AND f2"]
        vals = {r["f1"]: r["f1 AND f2"]
                for r in out.select("f1", "`f1 AND f2`").collect()}
        # reference semantics: df[f1].astype(str) + df[f2].astype(str)
        # then xxh64(x).hexdigest()
        assert vals["red"] in {"0ec6a40e9b0ace7c",   # "redblue"
                               "e5f658b02e4ec693"}   # "red1"
        assert vals["green"] == "83974f82b331e085"   # "green3"
        assert vals["blue"] == "0dc1b3b92093f5b9"    # "blue2"
        # every token is a 16-char lowercase hexdigest
        assert all(len(v) == 16 and v == v.lower() for v in vals.values())

    def test_parity_hashes_int_members(self, spark):
        """Integer feature members cast to their decimal string, like
        pandas astype(str) on int columns."""
        from outrank_spark.operators.interactions import (
            with_interaction_features,
        )

        df = spark.createDataFrame(
            [("a", 0, 0), ("1", 1, 1)], "x string, y long, label long",
        )
        out, _ = with_interaction_features(
            df, label_column="label", interaction_order=2,
            parity_hashes=True,
        )
        got = {r["x"]: r["x AND y"]
               for r in out.select("x", "`x AND y`").collect()}
        assert got["a"] == "f095e781a7125e70"   # "a0"
        assert got["1"] == "228d3fa5008c9ec2"   # "11"

    def test_internal_hash_shape(self):
        """internal_hash parity surface: 8 lowercase hex chars with the
        reference's hardcoded seed default (core_utils.py:46-48)."""
        out = xxh32_hexdigest(["feature_value"])
        assert len(out[0]) == 8
        assert out[0] == format(
            scalar_xxh32(b"feature_value", 20141025), "08x")


class TestNulBytes:
    def test_trailing_and_interior_nuls_hash_correctly(self):
        """Fixed-width numpy buffers drop trailing NULs; the encoder
        must still hash the full byte string (dirty web text contains
        embedded NULs)."""
        import numpy as np

        from outrank_spark.hashing import xxh32, xxh64

        vals = ["a\x00", "a", "\x00", "", "a\x00b", "x\x00\x00",
                "caf\u00e9\x00"]
        arr = np.array(vals, dtype=object)
        got64 = xxh64(arr, seed=7)
        got32 = xxh32(arr, seed=7)
        for i, v in enumerate(vals):
            b = v.encode("utf-8")
            assert int(got64[i]) == scalar_xxh64(b, 7), v
            assert int(got32[i]) == scalar_xxh32(b, 7), v
        # the regression this pins: "a\x00" must differ from "a"
        assert got64[0] != got64[1]


class TestHashValuesDtypeCanonical:
    """hash_values must be batch-dtype-independent: the same key hashes
    identically whether its Arrow batch arrived as int64 or as float64
    (which is what a nullable bigint column becomes in pandas)."""

    def test_integral_float_matches_int64(self):
        from outrank_spark.hashing import hash_values
        ints = np.array([0, 1, -5, 2**40, -(2**40), 123456789],
                        dtype=np.int64)
        assert (hash_values(ints.astype(np.float64))
                == hash_values(ints)).all()

    def test_mixed_batch_with_nan_matches_on_integral_slots(self):
        from outrank_spark.hashing import hash_values
        ints = np.array([7, 14, 21], dtype=np.int64)
        mixed = np.array([7.0, np.nan, 14.0, 2.5, 21.0])
        h_mixed = hash_values(mixed)
        h_int = hash_values(ints)
        assert h_mixed[0] == h_int[0]
        assert h_mixed[2] == h_int[1]
        assert h_mixed[4] == h_int[2]

    def test_true_floats_and_nan_deterministic(self):
        from outrank_spark.hashing import hash_values
        import pandas as pd
        arr = np.array([1.5, np.nan, np.inf, -np.inf, 2.5])
        a, b = hash_values(arr), hash_values(arr.copy())
        assert (a == b).all()
        # non-integral floats keep the pandas hash path
        assert a[0] == pd.util.hash_array(arr).astype(np.uint64)[0]

    def test_float32_matches_int(self):
        from outrank_spark.hashing import hash_values
        ints = np.array([3, 9, 27], dtype=np.int64)
        assert (hash_values(ints.astype(np.float32))
                == hash_values(ints)).all()

    def test_out_of_int64_range_no_crash(self):
        from outrank_spark.hashing import hash_values
        arr = np.array([1e300, -1e300, float(2**63), 42.0])
        h = hash_values(arr)
        ref = hash_values(np.array([42], dtype=np.int64))
        assert h[3] == ref[0]
        assert len(set(h.tolist())) == 4


def test_sql_ident_and_sql_str_escaping():
    from outrank_spark.hashing import sql_ident, sql_str
    assert sql_ident("a`b") == "`a``b`"
    assert sql_ident("plain") == "`plain`"
    assert sql_str("it's") == r"'it\'s'"
    assert sql_str("back\\slash") == r"'back\\slash'"
