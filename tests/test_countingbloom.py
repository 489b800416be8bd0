"""Counting Bloom filter: deletion semantics, merge laws, Bloom
equivalence, wire."""
from __future__ import annotations

import numpy as np
import pytest

from outrank_spark.sketches.bloom import BloomFilter
from outrank_spark.sketches.countingbloom import CountingBloomFilter


def _members(n, tag="m"):
    return np.array([f"{tag}{i}" for i in range(n)], dtype=object)


class TestCountingBloom:
    def test_no_false_negatives_and_fpr_bound(self):
        cbf = CountingBloomFilter(capacity=5000, fpr=0.01)
        mem = _members(5000)
        cbf.add(mem)
        assert cbf.contains(mem).all()
        probe = np.array([f"x{i}" for i in range(20000)], dtype=object)
        fpr = cbf.contains(probe).mean()
        assert fpr <= 0.02  # 2x the 1% target, same margin as Bloom tests

    def test_remove_unmarks_and_keeps_others(self):
        cbf = CountingBloomFilter(capacity=2000, fpr=0.001)
        keep, drop = _members(800, "k"), _members(800, "d")
        cbf.add(keep).add(drop).remove(drop)
        assert cbf.contains(keep).all()          # never a false negative
        assert cbf.contains(drop).mean() < 0.01  # back to FP-rate noise
        assert cbf.min_negative() == 0

    def test_merge_bitwise_any_order_with_out_of_order_removes(self):
        mem = _members(3000)
        gone = mem[::3]
        single = CountingBloomFilter(capacity=4000).add(mem).remove(gone)
        # partition 1 sees ONLY the removals (negative intermediate
        # counters), partitions 2/3 see the adds — any merge order
        # must equal the single pass bitwise
        p1 = CountingBloomFilter(capacity=4000).remove(gone)
        p2 = CountingBloomFilter(capacity=4000).add(mem[:1500])
        p3 = CountingBloomFilter(capacity=4000).add(mem[1500:])
        assert p1.min_negative() < 0
        a = CountingBloomFilter.from_bytes(p1.to_bytes()).merge(p2).merge(p3)
        b = p3.merge(p1).merge(p2)
        assert a.to_bytes() == b.to_bytes() == single.to_bytes()
        assert a.min_negative() == 0

    def test_net_state_matches_plain_bloom(self):
        mem = _members(2500)
        gone = _members(900, "g")
        cbf = (CountingBloomFilter(capacity=3000, fpr=0.01)
               .add(mem).add(gone).remove(gone))
        plain = BloomFilter(capacity=3000, fpr=0.01).update(mem)
        assert (cbf.m, cbf.k) == (plain.m, plain.k)
        assert cbf.to_bloom().bits.tobytes() == plain.bits.tobytes()

    def test_wire_roundtrip_and_guards(self):
        cbf = CountingBloomFilter(capacity=100).add(_members(50))
        rt = CountingBloomFilter.from_bytes(cbf.to_bytes())
        assert rt.to_bytes() == cbf.to_bytes()
        assert rt.contains(_members(50)).all()
        with pytest.raises(ValueError, match="incompatible"):
            cbf.merge(CountingBloomFilter(capacity=999))
        with pytest.raises(ValueError, match="tag"):
            CountingBloomFilter.from_bytes(
                b"\x01" + b"\x00" * 16)

    def test_update_alias_and_registry(self):
        from outrank_spark.sketches import SKETCH_REGISTRY, sketch_from_bytes
        cbf = SKETCH_REGISTRY["cbf"](capacity=64)
        cbf.update(_members(10))
        rt = sketch_from_bytes("cbf", cbf.to_bytes())
        assert rt.contains(_members(10)).all()
