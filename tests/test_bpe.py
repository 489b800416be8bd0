"""BPE tokenizer training/encoding (operators/bpe.py): merge rules
pinned on the Sennrich et al. 2016 classic corpus, cross-checked
against an independently written brute-force learner, and the Spark
train/encode path proven partition-invariant and round-trippable."""
from __future__ import annotations

import pytest

from outrank_spark.operators.bpe import (
    _word_symbols, bpe_encode, learn_bpe, train_bpe, word_histogram,
)


# ---------------------------------------------------------------- reference

def _brute_force_bpe(histogram, num_merges):
    """Deliberately different implementation: recompute ALL pair
    counts from scratch every iteration (no inverted index, no
    incremental update) — slow but obviously correct."""
    vocab = {}
    for w, n in histogram:
        syms = list(w)
        if not syms:
            continue
        syms[-1] += "</w>"
        vocab[tuple(syms)] = vocab.get(tuple(syms), 0) + n
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        eligible = {p: n for p, n in pairs.items() if n >= 2}
        if not eligible:
            break
        top = max(eligible.values())
        best = min(p for p, n in eligible.items() if n == top)
        merges.append((best[0], best[1], top))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and (syms[i], syms[i + 1]) == best):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


class TestLearnBpe:
    def test_sennrich_first_merges_pinned(self):
        merges = learn_bpe(SENNRICH, 4)
        assert merges[0] == ("e", "s", 9)          # newest+widest
        assert merges[1] == ("es", "t</w>", 9)
        assert merges[2] == ("l", "o", 7)          # low+lower
        # 6-way tie (e,w) / (n,e) / (w,est</w>) breaks lexicographic
        assert merges[3] == ("e", "w", 6)

    def test_matches_brute_force_reference(self):
        hist = [("banana", 4), ("bandana", 3), ("ananas", 2),
                ("nab", 7), ("a", 9), ("abba", 1)]
        for k in (1, 3, 8, 50):
            assert learn_bpe(hist, k) == _brute_force_bpe(hist, k)

    def test_stops_when_no_pair_repeats(self):
        merges = learn_bpe([("ab", 1), ("cd", 1)], 10)
        assert merges == []

    def test_histogram_order_irrelevant(self):
        assert learn_bpe(SENNRICH, 6) == learn_bpe(SENNRICH[::-1], 6)

    def test_word_symbols_eow(self):
        assert _word_symbols("low") == ("l", "o", "w</w>")
        assert _word_symbols("a") == ("a</w>",)
        assert _word_symbols("") == ()


class TestSparkBpe:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(i, " ".join(w for w, n in SENNRICH for _ in range(n)))
                for i in range(4)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_histogram_counts_and_cap(self, spark, corpus):
        hist = {r["word"]: r["n"] for r in
                word_histogram(corpus, vocab_cap=3).collect()}
        # 4 docs x SENNRICH counts; cap keeps the 3 most frequent
        assert hist == {"newest": 24, "low": 20, "widest": 12}

    def test_train_matches_local_learner(self, spark, corpus):
        got = [(r["left"], r["right"], r["pair_count"]) for r in
               train_bpe(corpus, num_merges=6).orderBy("rank").collect()]
        want = learn_bpe([(w, 4 * n) for w, n in SENNRICH], 6)
        assert got == want

    def test_train_partition_invariant(self, spark, corpus):
        a = train_bpe(corpus.repartition(1), num_merges=5).collect()
        b = train_bpe(corpus.repartition(7), num_merges=5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_encode_roundtrip_and_monotone(self, spark, corpus):
        merges = train_bpe(corpus, num_merges=8)
        out = bpe_encode(corpus, merges).collect()
        for r in out:
            joined = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
            assert joined == " ".join(r["text"].lower().split())
            assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
        # zero merges == characters; more merges never lengthens
        chars = bpe_encode(corpus, []).collect()
        n8 = {r["doc_id"]: r["n_bpe_tokens"] for r in out}
        for r in chars:
            assert n8[r["doc_id"]] <= r["n_bpe_tokens"]
            assert all(len(t.replace("</w>", "")) == 1
                       for t in r["bpe_tokens"])

    def test_encode_learned_units_appear(self, spark, corpus):
        merges = train_bpe(corpus, num_merges=2)   # es, est</w>
        toks = bpe_encode(corpus, merges).first()["bpe_tokens"]
        assert "est</w>" in toks and "es" not in toks

    def test_null_and_empty_text(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "  "), (4, "ok ok")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
        assert out[1]["n_bpe_tokens"] == 0 and out[1]["bpe_tokens"] == []
        assert out[2]["n_bpe_tokens"] == 0
        assert out[3]["n_bpe_tokens"] == 0
        assert out[4]["bpe_tokens"] == ["o", "k</w>", "o", "k</w>"]
