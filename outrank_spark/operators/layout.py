"""Multi-dimensional storage-layout operators: Z-order (Morton)
clustering keys and a data-skipping audit that measures what a layout
buys before anything is rewritten.

Why this exists (100 TB story): parquet/Iceberg/Delta data skipping
prunes a file when the predicate falls outside the file's min/max
zone map.  Sorting by ONE column gives perfect pruning on that column
and none on any other; interleaving the bits of k columns (Z-order,
the Delta OPTIMIZE ZORDER / Iceberg sort-order primitive) gives every
interleaved column short per-file value spans, so point/range
predicates on ANY of them prune most files.  Rewriting 100 TB to test
that is absurd — :func:`zorder_layout_audit` computes the expected
scan fraction per column for both layouts from ONE aggregate over the
prospective file assignment, so the decision is made from a report,
not an experiment.

Scale shape: the Z-key is a pure-JVM bitwise projection (zero
shuffle, WholeStageCodegen); the audit is one map-side-combinable
groupBy on the candidate file id (2^file_bits cells) followed by a
file-count-sized roll-up.  Nothing corpus-sized ever shuffles or
sorts — the audit SIMULATES the layout's zone maps without building
the layout.

All arithmetic is integer shifts/masks, bit-identical across engines,
so the DuckDB oracle (q137) replays it exactly.  No reference-repo
counterpart: the reference engine is single-node and has no storage
layout; this is Spark/lakehouse-native infrastructure next to
sources/bucketed.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["zorder_key", "zorder_layout_audit"]


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8,
               out: str = "zkey") -> DataFrame:
    """Add a Morton (Z-order) key interleaving the low ``bits`` bits
    of each column in ``cols``: bit ``i`` of column ``j`` lands at
    position ``i * k + j``.  Columns must be non-negative integers;
    values are masked to ``bits`` bits (callers normalize first —
    e.g. a modulo, a bucket id, or a quantile rank — exactly as
    lakehouse Z-ordering ranks columns before interleaving).  The key
    is a single codegen'd projection; sorting or range-partitioning
    by it co-clusters all k dimensions at once.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if not (1 <= bits * k <= 62):
        raise ValueError(f"bits*k must be in [1, 62], got {bits * k}")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"unknown column {c!r}")
    expr = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(
                F.lit(1))
            expr = expr + bit * F.lit(1 << (i * k + j))
    return df.withColumn(out, expr.cast("long"))


def zorder_layout_audit(df: DataFrame, cols: list[str],
                        bits: int = 8, file_bits: int = 6,
                        round_to: int = 6) -> DataFrame:
    """Compare prospective file layouts WITHOUT rewriting data: assign
    every row to one of ``2^file_bits`` candidate files under (a) the
    Z-order layout (top bits of the interleaved key) and (b) a linear
    layout sorted by the FIRST column only, then report each layout's
    per-column zone-map quality: ``(layout, column, n_files,
    avg_span_frac, max_span_frac)``.

    ``avg_span_frac`` is the mean over files of
    ``(max - min + 1) / 2^bits`` — exactly the expected fraction of
    files a uniform point predicate on that column cannot prune
    (a value hits a file iff it lies inside the file's span).  A good
    layout reads small span fractions on EVERY column; the linear
    layout reads ~0 on its sort column and ~1 on the others.  The
    verdict at 100 TB: multiply ``avg_span_frac`` by the table's file
    bytes to estimate scanned bytes per predicate under each layout.

    File assignment is value-range bucketing on the layout key's top
    ``file_bits`` bits — pure integer arithmetic, so the DuckDB
    oracle replays bit-for-bit; real writers range-partition by the
    same key and get files with the same zone-map structure.
    """
    k = len(cols)
    if not (1 <= file_bits <= bits):
        raise ValueError(
            f"file_bits must be in [1, bits={bits}], got {file_bits}")
    zk = zorder_key(df, cols, bits=bits, out="__zk")
    masked = [F.col(c).cast("long")
              .bitwiseAND(F.lit((1 << bits) - 1)).alias(f"__m{j}")
              for j, c in enumerate(cols)]
    with_files = zk.select(
        *masked,
        F.shiftright(F.col("__zk"), bits * k - file_bits)
        .alias("__fz"),
        F.shiftright(
            F.col(cols[0]).cast("long").bitwiseAND(
                F.lit((1 << bits) - 1)),
            bits - file_bits).alias("__fl"),
    )
    out = None
    for layout, fcol in (("zorder", "__fz"), ("linear", "__fl")):
        # one corpus aggregate -> <=2^file_bits span rows; one roll-up
        # over them produces every column's stats; stack unpivots the
        # single result row (never a job per column)
        spans = with_files.groupBy(fcol).agg(*[
            a for j in range(k) for a in (
                F.min(f"__m{j}").alias(f"mn{j}"),
                F.max(f"__m{j}").alias(f"mx{j}"),
            )
        ])
        aggs = [F.count(F.lit(1)).cast("long").alias("n_files")]
        for j in range(k):
            frac = (F.col(f"mx{j}") - F.col(f"mn{j}") + 1) \
                / float(1 << bits)
            aggs += [F.round(F.avg(frac), round_to).alias(f"af{j}"),
                     F.round(F.max(frac), round_to).alias(f"mf{j}")]
        from outrank_spark.hashing import sql_str

        cells = ", ".join(
            f"{sql_str(c)}, n_files, af{j}, mf{j}"
            for j, c in enumerate(cols))
        row = spans.agg(*aggs).selectExpr(
            f"'{layout}' AS layout",
            f"stack({k}, {cells}) AS "
            "(column, n_files, avg_span_frac, max_span_frac)",
        )
        out = row if out is None else out.unionByName(row)
    return out.select("layout", "column", "n_files",
                      "avg_span_frac", "max_span_frac")
