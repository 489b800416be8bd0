"""hits@k ranking-robustness analyser (tools/analyse_rankings.py)."""
from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from analyse_rankings import analyse, extract_ranking, hits_at_k


def _write_singles(dirpath, features):
    os.makedirs(dirpath, exist_ok=True)
    pd.DataFrame({
        "Feature": features,
        "Score MI": [1.0 - i * 0.01 for i in range(len(features))],
    }).to_csv(os.path.join(dirpath, "feature_singles.tsv"),
              sep="\t", index=False)


class TestHitsAtK:
    def test_exact_overlap_and_misses(self):
        ref = [f"f{i}" for i in range(30)]
        same = list(ref)
        assert hits_at_k(same, ref, 10) == 100.0
        shuffled_top = ref[:10][::-1] + ref[10:]
        assert hits_at_k(shuffled_top, ref, 10) == 100.0  # set overlap
        half_wrong = ["x0", "x1", "x2", "x3", "x4"] + ref[:5]
        assert hits_at_k(half_wrong, ref, 10) == 50.0

    def test_analyse_table(self, tmp_path):
        base = [f"f{i}" for i in range(25)]
        _write_singles(str(tmp_path / "ranking_1000"),
                       ["z0", "z1"] + base[:18])
        _write_singles(str(tmp_path / "ranking_4000"), base[:20])
        table = analyse(str(tmp_path))
        assert list(table["n_rows"]) == [1000, 4000]
        big = table[table["n_rows"] == 4000].iloc[0]
        assert big["hits@20"] == 100.0  # reference vs itself
        small = table[table["n_rows"] == 1000].iloc[0]
        assert small["hits@1"] == 0.0   # z0 not in reference top-1
        assert small["proportion_pct"] == 25.0

    def test_extract_ranking_order(self, tmp_path):
        _write_singles(str(tmp_path / "ranking_10"), ["b", "a", "c"])
        assert extract_ranking(
            str(tmp_path / "ranking_10" / "feature_singles.tsv"),
        ) == ["b", "a", "c"]
