"""Bloom runtime-filter semi/anti join: exactness vs plain joins,
prefilter superset/subset direction, approximate-mode error bound."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from outrank_spark.operators.runtime_filter import (bloom_prefilter,
                                                    bloom_semijoin,
                                                    build_key_bloom)


@pytest.fixture(scope="module")
def tables(spark):
    rng = np.random.default_rng(3)
    probe = spark.createDataFrame(pd.DataFrame({
        "k": rng.integers(0, 10_000, 20_000).astype(np.int64),
        "payload": np.arange(20_000).astype(np.int64),
    })).repartition(11)
    build = spark.createDataFrame(pd.DataFrame({
        "bk": (np.arange(700) * 3).astype(np.int64),   # sparse member set
    })).repartition(5)
    return probe, build


def _ids(df):
    return sorted(r["payload"] for r in df.select("payload").collect())


def test_semijoin_exact_matches_plain_semi(tables):
    probe, build = tables
    got = bloom_semijoin(probe, build, key="k", build_key="bk",
                         how="semi", exact=True)
    want = probe.join(build.withColumnRenamed("bk", "k").distinct(),
                      on="k", how="left_semi")
    assert _ids(got) == _ids(want)


def test_antijoin_exact_matches_plain_anti(tables):
    probe, build = tables
    got = bloom_semijoin(probe, build, key="k", build_key="bk",
                         how="anti", exact=True)
    want = probe.join(build.withColumnRenamed("bk", "k").distinct(),
                      on="k", how="left_anti")
    assert _ids(got) == _ids(want)


def test_prefilter_directions(tables):
    """Semi prefilter keeps a SUPERSET of true members (no false
    negatives); anti prefilter keeps a SUBSET of true non-members; the
    over-keep is within ~2x the configured fpp."""
    probe, build = tables
    blob = build_key_bloom(build.withColumnRenamed("bk", "k"), "k",
                           fpr=0.01)
    members = set(r["bk"] for r in build.collect())
    kept_semi = bloom_prefilter(probe, "k", blob, keep_members=True)
    kept_anti = bloom_prefilter(probe, "k", blob, keep_members=False)
    semi_keys = [r["k"] for r in kept_semi.collect()]
    anti_keys = [r["k"] for r in kept_anti.collect()]
    assert all(k not in members for k in anti_keys)
    true_member_rows = [r["k"] for r in probe.collect() if r["k"] in members]
    assert len(semi_keys) >= len(true_member_rows)
    # false-positive rate over the non-member probe rows
    n_nonmember = probe.count() - len(true_member_rows)
    fp = len(semi_keys) - len(true_member_rows)
    assert fp / max(n_nonmember, 1) <= 0.02, fp
    # the two legs partition the probe exactly
    assert len(semi_keys) + len(anti_keys) == probe.count()


def test_approx_semi_overkeeps_at_most_fpp(tables):
    probe, build = tables
    approx = bloom_semijoin(probe, build, key="k", build_key="bk",
                            how="semi", exact=False)
    exact = bloom_semijoin(probe, build, key="k", build_key="bk",
                           how="semi", exact=True)
    extra = approx.count() - exact.count()
    assert extra >= 0
    assert extra / probe.count() <= 0.02


def test_null_probe_keys(spark, tables):
    """Null probe keys behave like SQL joins: dropped by semi, kept by
    anti (null never equals any key)."""
    _, build = tables
    probe = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([0, None, 3, None], dtype="Int64"),
                      "payload": [1, 2, 3, 4]}))
    semi = bloom_semijoin(probe, build, key="k", build_key="bk",
                          how="semi", exact=True)
    anti = bloom_semijoin(probe, build, key="k", build_key="bk",
                          how="anti", exact=True)
    assert sorted(r["payload"] for r in semi.collect()) == [1, 3]
    assert sorted(r["payload"] for r in anti.collect()) == [2, 4]


def test_how_validation(tables):
    probe, build = tables
    with pytest.raises(ValueError):
        bloom_semijoin(probe, build, key="k", build_key="bk", how="inner")


def test_nullable_long_keys_no_false_negatives(spark):
    """Arrow hands a long column containing ANY null to pandas as
    float64 — the hash path must still match the (int64) build side,
    or true members get dropped (Bloom false negatives, ADVICE r4).
    One partition of the probe is all-null-free (int64 batch), one
    contains nulls (float64 batch); both must agree with the build."""
    import pandas as pd
    build = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(0, 5000, 7, dtype=np.int64)}))
    rows = [(int(v), int(v)) for v in range(0, 5000, 7)]
    rows += [(None, -1), (None, -2)]
    rows += [(int(v), 10_000 + v) for v in range(1, 5000, 97)]
    probe = spark.createDataFrame(rows, "k long, payload long") \
        .repartition(7)
    blob = build_key_bloom(build, "k")
    kept = bloom_prefilter(probe, "k", blob, keep_members=True)
    kept_ids = {r["payload"] for r in kept.collect()}
    member_ids = {int(v) for v in range(0, 5000, 7)}
    # NO false negatives: every true member survives the prefilter
    assert member_ids <= kept_ids
    # null keys are never members (semi drops them)
    assert -1 not in kept_ids and -2 not in kept_ids
    got = bloom_semijoin(probe, build, key="k", how="semi", exact=True)
    want = probe.join(build.distinct(), on="k", how="left_semi")
    assert _ids(got) == _ids(want)
