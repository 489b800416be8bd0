"""mRMR selection (plans/feature_selection.py): hand-computed greedy
picks, redundancy bookkeeping, tie and edge behavior."""
from __future__ import annotations

import pandas as pd
import pytest

from outrank_spark.plans.feature_selection import mrmr_select


def _table(rows):
    return pd.DataFrame(rows, columns=["FeatureA", "FeatureB", "Score"])


class TestMrmrSelect:
    def test_hand_computed_greedy_order(self):
        # relevance: a=0.9, b=0.8, c=0.5
        # MI(a,b)=0.7 (b is nearly a copy of a), MI(a,c)=0.1, MI(b,c)=0.1
        t = _table([
            ("label", "a", 0.9), ("b", "label", 0.8), ("label", "c", 0.5),
            ("a", "b", 0.7), ("a", "c", 0.1), ("b", "c", 0.1),
        ])
        out = mrmr_select(t, label="label", k=3)
        # pick1: a (0.9).  pick2: b -> 0.8-0.7=0.1 vs c -> 0.5-0.1=0.4: c.
        # pick3: b -> 0.8 - mean(0.7, 0.1) = 0.4
        assert list(out["feature"]) == ["a", "c", "b"]
        assert list(out["rank"]) == [1, 2, 3]
        assert out["mrmr_score"].tolist() == pytest.approx([0.9, 0.4, 0.4])
        assert out["redundancy"].tolist() == pytest.approx([0.0, 0.1, 0.4])

    def test_k_truncates(self):
        t = _table([("label", "a", 0.9), ("label", "b", 0.1),
                    ("a", "b", 0.0)])
        out = mrmr_select(t, label="label", k=1)
        assert list(out["feature"]) == ["a"] and len(out) == 1

    def test_tie_breaks_lexicographic(self):
        t = _table([("label", "x", 0.5), ("label", "m", 0.5),
                    ("x", "m", 0.0)])
        assert list(mrmr_select(t, "label", 2)["feature"]) == ["m", "x"]

    def test_missing_pair_counts_zero_redundancy(self):
        t = _table([("label", "a", 0.9), ("label", "b", 0.8)])
        out = mrmr_select(t, "label", 2)
        assert out["redundancy"].tolist() == pytest.approx([0.0, 0.0])

    def test_symmetric_input_order_irrelevant(self):
        rows = [("label", "a", 0.9), ("b", "label", 0.8),
                ("label", "c", 0.5), ("a", "b", 0.7),
                ("c", "a", 0.1), ("b", "c", 0.1)]
        a = mrmr_select(_table(rows), "label", 3)
        b = mrmr_select(_table(rows[::-1]), "label", 3)
        pd.testing.assert_frame_equal(a, b)

    def test_self_pairs_ignored_and_errors(self):
        t = _table([("label", "a", 0.9), ("a", "a", 1.0)])
        assert list(mrmr_select(t, "label", 5)["feature"]) == ["a"]
        with pytest.raises(ValueError):
            mrmr_select(t, "label", 0)
        with pytest.raises(ValueError):
            mrmr_select(_table([("a", "b", 0.1)]), "label", 1)
