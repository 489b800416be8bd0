"""Text-analysis kernels: language ID, quality scoring, tokenization,
fingerprinting.  Pure numpy/pandas (used inside Arrow batches) plus
Spark-expression builders for the fully-JVM variants.

Language ID is a character-n-gram profile heuristic (Cavnar & Trenkle
1994 shape): per-language trigram profiles are *learned from labeled
data* (fit once on a sample, broadcast as plain dicts) and documents
score by profile overlap — no external models.
"""
from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

__all__ = [
    "char_ngrams", "fit_language_profiles", "detect_language_batch",
    "quality_features_batch", "token_count_batch", "rolling_fingerprint",
    "BPE_ISH_TOKEN_RE",
]

# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, punctuation runs, whitespace
BPE_ISH_TOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+",
)


def char_ngrams(text: str, n: int = 3, limit: int = 400) -> Counter:
    padded = f"  {text.lower()}  "
    grams = Counter(
        padded[i:i + n] for i in range(max(len(padded) - n + 1, 0))
    )
    return Counter(dict(grams.most_common(limit)))


def fit_language_profiles(texts, langs, n: int = 3,
                          profile_size: int = 300) -> dict[str, list[str]]:
    """Rank-ordered trigram profile per language."""
    per_lang: dict[str, Counter] = {}
    for text, lang in zip(texts, langs):
        per_lang.setdefault(lang, Counter()).update(char_ngrams(text, n))
    return {
        lang: [g for g, _ in cnt.most_common(profile_size)]
        for lang, cnt in per_lang.items()
    }


def detect_language_batch(texts: pd.Series,
                          profiles: dict[str, list[str]],
                          n: int = 3) -> pd.Series:
    """Out-of-place rank distance (Cavnar-Trenkle) against each
    profile; argmin wins."""
    ranks = {
        lang: {g: i for i, g in enumerate(prof)}
        for lang, prof in profiles.items()
    }
    max_rank = max(len(p) for p in profiles.values())

    def detect(text: str) -> str:
        grams = [g for g, _ in char_ngrams(str(text), n).most_common(100)]
        best, best_d = None, np.inf
        for lang, rank in ranks.items():
            d = sum(rank.get(g, max_rank) for g in grams)
            if d < best_d:
                best, best_d = lang, d
        return best

    return texts.map(detect)


_STOPWORDS = frozenset(
    "a the of and to in is it for on with as at by an be this that".split(),
)


def quality_features_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized quality metrics: length, token stats, punctuation /
    digit / stopword ratios, repetition (distinct ratio)."""
    s = texts.astype(str)
    n_chars = s.str.len()
    tokens = s.str.split(" ")
    n_tok = tokens.str.len()
    n_uniq = tokens.map(lambda t: len(set(t)))
    punct = s.str.count(r"[^\w\s]")
    digits = s.str.count(r"[0-9]")
    stop = tokens.map(lambda t: sum(1 for x in t if x in _STOPWORDS))
    n_tok_safe = n_tok.replace(0, 1)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_token": n_tok,
        "ttr": (n_uniq / n_tok_safe).round(6),
        "punct_ratio": (punct / n_chars.replace(0, 1)).round(6),
        "digit_ratio": (digits / n_chars.replace(0, 1)).round(6),
        "stopword_ratio": (stop / n_tok_safe).round(6),
        "mean_tok_len": ((n_chars - (n_tok - 1)) / n_tok_safe).round(6),
    })


def token_count_batch(texts: pd.Series, mode: str = "whitespace") -> pd.Series:
    if mode == "whitespace":
        return texts.astype(str).str.split().str.len()
    if mode == "bpe-ish":
        return texts.astype(str).map(
            lambda t: len(BPE_ISH_TOKEN_RE.findall(t)),
        )
    raise ValueError(f"unknown token mode {mode!r}")


def rolling_fingerprint(texts: pd.Series, window: int = 8,
                        keep: int = 4) -> pd.Series:
    """Winnowing-style document fingerprint (Schleimer et al. 2003
    shape): rolling hash over token windows, keep the ``keep`` minimal
    hashes, combine order-independently."""
    def fp(text: str) -> int:
        toks = str(text).split(" ")
        if len(toks) < window:
            arr = pd.util.hash_array(np.array([str(text)], dtype=object))
            return int(arr.astype(np.int64)[0])
        h = pd.util.hash_array(
            np.array(
                [" ".join(toks[i:i + window])
                 for i in range(len(toks) - window + 1)],
                dtype=object,
            ),
        ).astype(np.uint64)
        mins = np.sort(h)[:keep]
        return int(np.bitwise_xor.reduce(mins).astype(np.int64))

    return texts.map(fp)
