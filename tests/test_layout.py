"""Z-order layout operators (operators/layout.py): Morton
interleave vs a pure-python reference, audit span math on planted
grids, and the no-shuffle plan shape of the key projection."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.layout import (
    zorder_key,
    zorder_layout_audit,
)


def _morton(vals, bits):
    k = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


class TestZorderKey:
    def test_matches_python_reference_2d(self, spark):
        rows = [(x, y) for x in (0, 1, 5, 170, 255)
                for y in (0, 3, 128, 254)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {(r["x"], r["y"]): r["zkey"]
               for r in zorder_key(df, ["x", "y"]).collect()}
        for x, y in rows:
            assert got[(x, y)] == _morton((x, y), 8), (x, y)

    def test_three_columns_and_masking(self, spark):
        df = spark.createDataFrame([(1, 2, 3), (257, 2, 3)],
                                   "a long, b long, c long")
        out = zorder_key(df, ["a", "b", "c"], bits=4).collect()
        z = {r["a"]: r["zkey"] for r in out}
        assert z[1] == _morton((1, 2, 3), 4)
        assert z[257] == _morton((257 & 15, 2, 3), 4)  # masked

    def test_locality_property(self, spark):
        # points close in both dims get closer z-keys than points far
        # in one dim: z(3,3) - z(2,2) << z(3,128) - z(3,3) region gap
        df = spark.createDataFrame(
            [(2, 2), (3, 3), (3, 128)], "x long, y long")
        z = {(r["x"], r["y"]): r["zkey"]
             for r in zorder_key(df, ["x", "y"]).collect()}
        assert abs(z[(3, 3)] - z[(2, 2)]) < abs(z[(3, 128)] - z[(3, 3)])

    def test_errors(self, spark):
        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError, match="at least 2"):
            zorder_key(df, ["a"])
        with pytest.raises(ValueError, match="unknown column"):
            zorder_key(df, ["a", "zz"])
        with pytest.raises(ValueError, match="bits"):
            zorder_key(df, ["a", "b"], bits=40)

    def test_pure_projection_no_exchange(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("a"), (F.col("id") * 7).alias("b"))
        plan = zorder_key(df, ["a", "b"])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestZorderLayoutAudit:
    def test_full_grid_spans(self, spark):
        # complete 16x16 grid, bits=4, file_bits=2 -> 4 files.
        # zorder: each file is an 8x8 quadrant -> span 8/16 = 0.5 on
        # both columns.  linear: files are 4-wide x-slabs -> x span
        # 4/16 = 0.25, y span 16/16 = 1.0.
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {(r["layout"], r["column"]): r for r in
               zorder_layout_audit(df, ["x", "y"], bits=4,
                                   file_bits=2).collect()}
        for c in ("x", "y"):
            assert got[("zorder", c)]["n_files"] == 4
            assert got[("zorder", c)]["avg_span_frac"] == 0.5
            assert got[("zorder", c)]["max_span_frac"] == 0.5
        assert got[("linear", "x")]["avg_span_frac"] == 0.25
        assert got[("linear", "y")]["avg_span_frac"] == 1.0

    def test_zorder_beats_linear_on_second_column(self, spark):
        import random

        rnd = random.Random(3)
        rows = [(rnd.randrange(256), rnd.randrange(256))
                for _ in range(4000)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {(r["layout"], r["column"]): r["avg_span_frac"] for r in
               zorder_layout_audit(df, ["x", "y"]).collect()}
        assert got[("zorder", "y")] < got[("linear", "y")] / 2
        assert got[("linear", "x")] <= got[("zorder", "x")]

    def test_file_bits_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        with pytest.raises(ValueError, match="file_bits"):
            zorder_layout_audit(df, ["x", "y"], bits=4, file_bits=6)
