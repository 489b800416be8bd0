"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding subword tokenization (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units")
— the tokenizer-training stage of an LLM data pipeline, re-expressed
the way production trainers actually scale:

* **Training never iterates over the corpus.**  Merge rules are a
  function of the word-frequency histogram only, so the corpus is
  touched exactly once: a whitespace tokenize + ``explode`` +
  map-side-combined ``groupBy(word).count()`` (one shuffle), capped to
  the ``vocab_cap`` most frequent words.  At 100 TB that histogram is
  a few million rows regardless of corpus size; the capped table
  (deterministic ``count DESC, word ASC`` order) is the ONLY thing
  collected to the driver.  Merge learning then runs on that bounded
  table with the classic inverted-index update (only words containing
  the merged pair are revisited) — O(vocab) memory, independent of N.

* **Encoding never ships the merge table per row.**  The learned
  ranks dict is broadcast once; an Arrow-batched ``mapInPandas`` pass
  encodes each *distinct* word in a batch exactly once (per-batch
  memo), so Zipf-distributed text pays per-type, not per-token.

Reference scope note: the OutRank reference has no subword tokenizer
(its text handling stops at hashed categorical tokens,
core_utils.py); this operator is part of the LLM-pipeline family the
engine adds beyond the reference, alongside packing
(operators/packing.py) and the quality classifier
(operators/quality_model.py).

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the merge sequence is a pure function of the
histogram — partition-count invariant, cluster-size invariant.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["word_histogram", "learn_bpe", "train_bpe", "bpe_encode"]

_EOW = "</w>"


# ---------------------------------------------------------------- corpus scan

def word_histogram(df: DataFrame, text_col: str = "text",
                   vocab_cap: int = 50_000,
                   lowercase: bool = True) -> DataFrame:
    """One-shuffle word-frequency table: ``(word, n)``, capped to the
    ``vocab_cap`` most frequent words (ties broken ``word ASC`` so the
    cap boundary is deterministic).  All-JVM: split + explode + hash
    aggregate (map-side partials), then a top-k — never a global sort
    of the full vocabulary when Catalyst can TakeOrdered it."""
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = df.select(
        F.explode(
            F.filter(F.split(txt, r"\s+"), lambda w: w != ""),
        ).alias("word"),
    )
    hist = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return hist.orderBy(F.desc("n"), F.asc("word")).limit(vocab_cap)


# ------------------------------------------------------- driver-side learning

def _word_symbols(word: str) -> Tuple[str, ...]:
    """chars[:-1] + [last_char + '</w>'] — subword-nmt's end-of-word
    convention, so 'est' mid-word and 'est' word-finally are distinct
    merge targets."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] += _EOW
    return tuple(chars)


def learn_bpe(histogram: Sequence[Tuple[str, int]],
              num_merges: int) -> List[Tuple[str, str, int]]:
    """Classic BPE merge learning over a ``(word, count)`` histogram.

    Returns up to ``num_merges`` rules ``(left, right, pair_count)``
    in merge order.  Stops early when no pair occurs twice (merging
    singletons would just memorize the tail).  Inverted-index
    incremental update: each merge revisits only the words that
    contain the merged pair, the standard subword-nmt optimization —
    O(affected words), not O(vocab), per iteration.
    """
    vocab: List[List[str]] = []
    counts: List[int] = []
    for w, n in histogram:
        syms = _word_symbols(str(w))
        if syms:
            vocab.append(list(syms))
            counts.append(int(n))

    pair_counts: dict = {}
    pair_words: dict = {}

    def add_word(idx: int, sign: int) -> None:
        syms, n = vocab[idx], counts[idx] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + n
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)

    for i in range(len(vocab)):
        add_word(i, +1)

    merges: List[Tuple[str, str, int]] = []
    for _ in range(num_merges):
        best, best_n = None, 1
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None
                              and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append((best[0], best[1], best_n))
        joined = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            add_word(idx, -1)          # retract old pair contributions
            syms, out, i = vocab[idx], [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[idx] = out
            add_word(idx, +1)          # re-add with the pair merged
        # drop exhausted entries so the argmax scan stays tight
        for p in [p for p, n in pair_counts.items() if n <= 0]:
            del pair_counts[p]
            pair_words.pop(p, None)
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 200, vocab_cap: int = 50_000,
              lowercase: bool = True) -> DataFrame:
    """End-to-end training: corpus -> histogram (one shuffle, capped
    collect) -> driver merge learning.  Returns the merge table as a
    DataFrame ``(rank, left, right, pair_count)`` — rank is merge
    order, the encoder's priority."""
    hist = [(r["word"], r["n"]) for r in
            word_histogram(df, text_col, vocab_cap, lowercase).collect()]
    merges = learn_bpe(hist, num_merges)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank long, left string, right string, pair_count long",
    )


# ------------------------------------------------------------------ encoding

def _encode_word(word: str, ranks: dict) -> Tuple[str, ...]:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               out_col: str = "bpe_tokens",
               lowercase: bool = True) -> DataFrame:
    """Append ``out_col`` (array<string> of subword tokens, '</w>'
    marking word ends) and ``n_bpe_tokens``.  ``merges`` is the
    DataFrame from :func:`train_bpe` or a ``[(left, right), ...]``
    list.  The rank dict is broadcast once; inside each Arrow batch
    every DISTINCT word is encoded once and splatted (Zipf text pays
    per word type).  Round-trip invariant (pytest):
    ``''.join(tokens).replace('</w>', ' ')`` restores the normalized
    text."""
    if isinstance(merges, DataFrame):
        rules = [(r["left"], r["right"]) for r in
                 merges.orderBy("rank").collect()]
    else:
        rules = [(a, b) for a, b, *_ in
                 ([*m, None] for m in merges)]  # accept 2- or 3-tuples
    ranks = {pair: i for i, pair in enumerate(rules)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = (f"{fields}, `{out_col}` array<string>, "
                  f"`n_bpe_tokens` long")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = bc.value
        memo: dict = {}
        for pdf in batches:
            toks, lens = [], []
            for text in pdf[text_col]:
                if text is None:
                    toks.append([])
                    lens.append(0)
                    continue
                norm = text.lower() if lowercase else text
                row: List[str] = []
                for w in norm.split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, r)
                        memo[w] = enc
                    row.extend(enc)
                toks.append(row)
                lens.append(len(row))
            out = pdf.copy()
            out[out_col] = toks
            out["n_bpe_tokens"] = lens
            yield out

    return df.mapInPandas(fn, schema=out_schema)
