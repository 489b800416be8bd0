"""edit_distance_join (operators/similarity.py) vs a brute-force
pure-Python DP Levenshtein over every in-contract pair, including the
repeat-heavy strings that stress the occurrence-numbered gram bound
and the shared-constant-prefix key space that motivates the ED-Join
rarest-gram prefix filter."""
from __future__ import annotations

import pytest

from outrank_spark.operators.similarity import edit_distance_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d, q):
    floor = q * (d + 1)
    ok = [(i, s) for i, s in rows if len(s) >= floor]
    return {
        (i, j): _lev(si, sj)
        for ai, (i, si) in enumerate(ok)
        for j, sj in ok[ai + 1:]
        if _lev(si, sj) <= d
    }


def _check(spark, rows, d, q=2):
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in edit_distance_join(df, "s", id_col="id",
                                    max_distance=d, q=q).collect()
    }
    assert got == _brute(rows, d, q)
    return got


def test_matches_bruteforce_mixed_corpus(spark):
    rows = [
        (0, "kitten"), (1, "sitten"), (2, "sittin"), (3, "sitting"),
        (4, "mitten"), (5, "flour"), (6, "flower"), (7, "flowers"),
        (8, "abc"),               # below the len >= 4 contract floor
        (9, "kitten"),            # exact duplicate of 0
    ]
    got = _check(spark, rows, d=1)
    assert (0, 9) in got and got[(0, 9)] == 0
    assert (0, 1) in got and got[(0, 1)] == 1
    assert all(8 not in pair for pair in got)


def test_repeat_heavy_strings_not_falsely_pruned(spark):
    # "aaaaaa" has ONE distinct 2-gram; a multiset count filter run on
    # distinct grams would reject even its exact duplicate
    rows = [(0, "aaaaaa"), (1, "aaaaaa"), (2, "aaaaab"),
            (3, "aabaaa"), (4, "cccccc")]
    got = _check(spark, rows, d=1)
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 1 and got[(0, 3)] == 1
    assert all(4 not in pair for pair in got)


def test_distance_two_and_larger_q(spark):
    rows = [(0, "abcdefgh"), (1, "abXdefgh"), (2, "abXdeYgh"),
            (3, "abXdeYgZ"), (4, "hgfedcba")]
    got2 = _check(spark, rows, d=2, q=2)
    assert got2[(0, 2)] == 2 and (0, 3) not in got2
    _check(spark, rows, d=2, q=3)


def test_zero_distance_is_exact_dup_pairs(spark):
    rows = [(0, "abcd"), (1, "abcd"), (2, "abcd"), (3, "abce")]
    got = _check(spark, rows, d=0)
    assert set(got) == {(0, 1), (0, 2), (1, 2)}


def test_validation(spark):
    df = None  # never touched
    with pytest.raises(ValueError, match="max_distance"):
        edit_distance_join(df, "s", max_distance=-1)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_join(df, "s", q=0)


def test_shared_prefix_keyspace_complete_and_prunes(spark):
    # every string shares the long constant head; the discriminating
    # signal lives in the numeric tail — the regime where joining on
    # ALL grams is quadratic in n (this exact shape wedged q86 at
    # sf0.1 before the rarest-gram prefix filter)
    rows = [(i, f"Customer#{i:09d}") for i in range(0, 400, 3)]
    rows += [(1000 + i, f"Customer#{i:09d}") for i in (0, 3, 9)]  # dups
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["id_a"], r["id_b"]): r["distance"]
           for r in edit_distance_join(df, "s", id_col="id",
                                       max_distance=1).collect()}
    assert got == _brute(rows, 1, 2)
    assert got[(0, 1000)] == 0                # planted exact dup
