"""Quantile binning (operators/discretize.py) and PMI collocations
(operators/text.pmi_collocations).

Binning oracle: pandas rank-based equal-frequency assignment with the
same rounded-boundary rule; PMI oracle: hand-computed counts over a
tiny corpus plus a numpy recomputation over the real documents table.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from outrank_spark.operators.discretize import (
    discretize_features,
    quantile_bin,
)
from outrank_spark.operators.text import pmi_collocations

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- binning

def _np_bins(values: np.ndarray, n_bins: int, dp: int = 4) -> np.ndarray:
    """Reference assignment: numpy linear-interp quantile boundaries
    (same formula as percentile()/quantile_cont), rounded, then
    1 + #(boundaries < v)."""
    probs = [i / n_bins for i in range(1, n_bins)]
    bounds = np.round(
        np.quantile(values, probs, method="linear"), dp)
    return 1 + (values[:, None] > bounds[None, :]).sum(axis=1)


def test_ungrouped_bins_match_numpy(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    out = quantile_bin(li, "l_extendedprice", 4).toPandas() \
        .sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    exp = _np_bins(out["l_extendedprice"].to_numpy(), 4)
    assert (out["bin"].to_numpy() == exp).all()
    # equal-frequency: on near-unique values every bin holds ~n/4
    counts = out["bin"].value_counts()
    n = len(out)
    assert set(counts.index) == {1, 2, 3, 4}
    assert counts.max() - counts.min() <= max(4, n * 0.02)


def test_grouped_bins_match_numpy_per_group(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                "l_extendedprice")
    out = quantile_bin(li, "l_extendedprice", 3, "l_returnflag") \
        .toPandas()
    assert len(out) == li.count()  # no rows dropped
    for g, sub in out.groupby("l_returnflag"):
        exp = _np_bins(sub["l_extendedprice"].to_numpy(), 3)
        assert (sub["bin"].to_numpy() == exp).all(), g


def test_null_values_get_null_bin(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (4, 4.0), (5, 5.0)],
        "id long, v double")
    out = quantile_bin(df, "v", 2).toPandas().set_index("id")
    assert pd.isna(out.loc[3, "bin"])
    assert out.loc[[1, 2], "bin"].tolist() == [1, 1]
    assert out.loc[[4, 5], "bin"].tolist() == [2, 2]


def test_duplicate_heavy_values_keep_row_invariant(spark):
    # one dominant value -> coinciding boundaries -> merged bins, but
    # every row still gets a bin in range
    df = spark.createDataFrame(
        [(i, 7.0 if i < 90 else float(i)) for i in range(100)],
        "id long, v double")
    out = quantile_bin(df, "v", 4).toPandas()
    assert len(out) == 100
    assert out["bin"].between(1, 4).all()
    # the dominant value lands entirely in bin 1
    assert (out.loc[out["v"] == 7.0, "bin"] == 1).all()


def test_approx_method_close_to_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    exact = quantile_bin(li, "l_extendedprice", 4).toPandas() \
        .sort_values(["l_orderkey", "l_linenumber"])["bin"].to_numpy()
    approx = quantile_bin(li, "l_extendedprice", 4, method="approx") \
        .toPandas() \
        .sort_values(["l_orderkey", "l_linenumber"])["bin"].to_numpy()
    # KLL-backed boundaries differ at most near the cut points
    assert (exact == approx).mean() > 0.95


def test_bad_args(spark):
    df = spark.range(10).withColumn("v", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        quantile_bin(df, "v", 1)
    with pytest.raises(ValueError):
        quantile_bin(df, "v", 4, method="nope")


# ------------------------------------------------------------------- PMI

def test_pmi_hand_computed(spark):
    # corpus: "a b" x4, "a c" x1, "c b" x1 -> bigrams N=6
    # c(a b)=4, c(a ·)=5, c(· b)=5 -> pmi = ln(4*6/25)
    rows = [("a b",)] * 4 + [("a c",), ("c b",)]
    df = spark.createDataFrame(rows, "text string")
    out = pmi_collocations(df, min_count=1, top_k=10).toPandas()
    got = out.set_index(["w1", "w2"])
    assert got.loc[("a", "b"), "pair_count"] == 4
    assert got.loc[("a", "b"), "pmi"] == round(math.log(4 * 6 / 25), 6)
    assert got.loc[("a", "c"), "pmi"] == round(math.log(1 * 6 / 5), 6)
    assert got.loc[("c", "b"), "pmi"] == round(math.log(1 * 6 / 5), 6)
    # single-token docs contribute nothing
    df2 = df.union(spark.createDataFrame([("z",)], "text string"))
    out2 = pmi_collocations(df2, min_count=1, top_k=10).toPandas()
    assert len(out2) == len(out)


def test_pmi_min_count_filters_pairs_not_marginals(spark):
    rows = [("a b",)] * 4 + [("a c",), ("c b",)]
    df = spark.createDataFrame(rows, "text string")
    out = pmi_collocations(df, min_count=2, top_k=10).toPandas()
    # only (a, b) survives the floor...
    assert out[["w1", "w2"]].values.tolist() == [["a", "b"]]
    # ...but its marginals still count the filtered-out pairs
    assert out["pmi"][0] == round(math.log(4 * 6 / 25), 6)


def test_pmi_documents_vs_numpy(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pmi_collocations(docs, min_count=5, top_k=50).toPandas()

    texts = docs.select("text").toPandas()["text"]
    from collections import Counter
    c2, cx, cy = Counter(), Counter(), Counter()
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - 1):
            c2[(w[i], w[i + 1])] += 1
            cx[w[i]] += 1
            cy[w[i + 1]] += 1
    n = sum(c2.values())
    scored = sorted(
        ((round(math.log(c * n / (cx[x] * cy[y])), 6), x, y, c)
         for (x, y), c in c2.items() if c >= 5),
        key=lambda r: (-r[0], r[1], r[2]))[:50]
    exp = pd.DataFrame(scored, columns=["pmi", "w1", "w2", "pair_count"])
    got = out[["pmi", "w1", "w2", "pair_count"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"pair_count": "int64"}),
        exp.astype({"pair_count": "int64"}),
        check_like=True)


# -------------------------------------------------- feature bridge

def test_discretize_features_matches_per_column_approx(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
                "l_quantity")
    wide = discretize_features(
        li, ["l_extendedprice", "l_quantity"], n_bins=4).toPandas() \
        .sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    for c in ("l_extendedprice", "l_quantity"):
        single = quantile_bin(li, c, 4, method="approx",
                              bin_col="b").toPandas() \
            .sort_values(["l_orderkey", "l_linenumber"]) \
            .reset_index(drop=True)
        assert (wide[c + "_bin"].astype(int).to_numpy()
                == single["b"].to_numpy()).all()
    # bins are strings, ready for the categorical ranking path
    assert wide["l_quantity_bin"].map(type).eq(str).all()


def test_discretize_features_null_handling(spark):
    df = spark.createDataFrame(
        [(1, 1.0, None), (2, 2.0, None), (3, None, None),
         (4, 4.0, None)],
        "id long, v double, empty double")
    out = discretize_features(df, ["v", "empty"], n_bins=2).toPandas() \
        .set_index("id")
    assert pd.isna(out.loc[3, "v_bin"])
    assert out["empty_bin"].isna().all()
    with pytest.raises(ValueError):
        discretize_features(df, [])


def test_numeric_feature_ranking_composition(spark):
    """discretize_features -> run_ranking: a numeric feature carrying
    the label signal must outrank a numeric noise feature."""
    from outrank_spark.plans.ranking_job import (
        RankingConfig,
        run_ranking,
    )

    n = 4000
    df = spark.range(n).select(
        (F.col("id") % 2).cast("string").alias("label"),
        # signal: disjoint value ranges per class + deterministic jitter
        ((F.col("id") % 2) * 10.0
         + (F.col("id") * 2654435761 % 997) / 997.0).alias("sig"),
        # noise: label-independent deterministic pseudo-uniform
        ((F.col("id") * 40503 % 1009) / 1009.0).alias("noise"),
    )
    feats = discretize_features(df, ["sig", "noise"], n_bins=4)
    cfg = RankingConfig(
        subsampling=1,
        feature_columns=["label", "sig_bin", "noise_bin"],
        include_cardinality_in_feature_names=False,
    )
    res = run_ranking(spark, feats, cfg)
    singles = res.singles[res.singles["Feature"] != "label"]
    ranked = list(singles["Feature"])
    assert ranked.index("sig_bin") < ranked.index("noise_bin")


def test_round_half_up_matches_spark_f_round(spark):
    """The literal assignment path (Python _round_half_up) and the
    expression path (F.round) must round identically, ties included
    — Python's builtin banker's round would split them on 0.03125."""
    from outrank_spark.operators.discretize import _round_half_up

    vals = [0.03125, -0.03125, 1.23455, 2.5e-4, 7.0, 123.456789,
            0.00005, -1.5e-4]
    got = spark.createDataFrame([(v,) for v in vals], "v double") \
        .select(F.round("v", 4).alias("r")).toPandas()["r"].tolist()
    assert got == [_round_half_up(v, 4) for v in vals]
    # and the builtin would NOT match (the divergence class)
    assert round(0.03125, 4) != _round_half_up(0.03125, 4)
