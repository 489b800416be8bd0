"""Spark text-analysis operators: language ID, quality scoring, token
counting, fingerprinting over a documents table — Arrow-batched, never
per-row Python.
"""
from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from outrank_spark.functions.text import (
    detect_language_batch,
    fit_language_profiles,
    quality_features_batch,
    rolling_fingerprint,
    token_count_batch,
)

__all__ = ["fit_langid", "with_language_id", "with_quality_features",
           "redact_pii", "PII_PATTERNS",
           "with_token_counts", "with_fingerprints", "tfidf_top_terms",
           "ngram_logprob_scores", "normalize_text",
           "pmi_collocations", "inverted_index", "bm25_topk",
           "ngram_diversity", "zipf_fit", "compression_ratio",
           "with_readability"]


def fit_langid(df: DataFrame, text_col: str = "text",
               lang_col: str = "lang", sample_per_lang: int = 200,
               n: int = 3, profile_size: int = 300,
               prefilter_keep: int = 4096) -> dict[str, list[str]]:
    """Learn per-language trigram profiles from a labeled sample
    (deterministic hash-ordered sample per language, driver-side fit
    on a few hundred docs — the profiles are tiny plain dicts).

    A cheap hash-threshold prefilter runs BEFORE the per-language
    window so the sort never touches the full corpus: the window only
    ranks ~``prefilter_keep``-per-2^20 of the rows (pushed to the scan;
    at 100 TB the old plan shuffled+sorted every document to keep a few
    hundred).  The retry loop doubles the keep rate if a rare language
    would end up under-sampled; one pass suffices on any corpus where
    languages aren't thinner than ~keep/2^20 of rows."""
    keep = prefilter_keep
    while True:
        sample = _langid_sample_plan(
            df, text_col, lang_col, sample_per_lang, keep,
        ).toPandas()
        # keep == 2^20 means the prefilter passed EVERYTHING — whatever
        # came back is all there is (possibly nothing: empty corpus),
        # so stop unconditionally rather than loop forever
        if keep >= (1 << 20):
            break
        if len(sample) and (sample.groupby(lang_col)[text_col].count()
                            >= sample_per_lang).all():
            break
        keep *= 4
    return fit_language_profiles(
        sample[text_col], sample[lang_col], n=n, profile_size=profile_size,
    )


def _langid_sample_plan(df: DataFrame, text_col: str, lang_col: str,
                        sample_per_lang: int, keep: int) -> DataFrame:
    """Lazy per-language sample: hash prefilter FIRST, window second."""
    from pyspark.sql.window import Window

    h = F.pmod(F.xxhash64(F.col(text_col)), F.lit(1 << 20))
    w = Window.partitionBy(lang_col).orderBy(F.xxhash64(F.col(text_col)))
    return (
        df.select(text_col, lang_col)
        .filter(h < F.lit(keep))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sample_per_lang)
    )


def with_language_id(df: DataFrame, profiles: dict[str, list[str]],
                     text_col: str = "text",
                     out: str = "lang_pred") -> DataFrame:
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out} string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out] = detect_language_batch(pdf[text_col], profiles)
            yield pdf

    return df.mapInPandas(fn, schema=schema)


def with_quality_features(df: DataFrame,
                          text_col: str = "text") -> DataFrame:
    cols = ["n_chars_q", "n_token_q", "ttr", "punct_ratio", "digit_ratio",
            "stopword_ratio", "mean_tok_len"]
    schema = (
        f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, "
        "n_chars_q long, n_token_q long, ttr double, punct_ratio double, "
        "digit_ratio double, stopword_ratio double, mean_tok_len double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            q = quality_features_batch(pdf[text_col])
            q.columns = cols
            yield pd.concat([pdf.reset_index(drop=True), q.reset_index(drop=True)], axis=1)

    return df.mapInPandas(fn, schema=schema)


def with_token_counts(df: DataFrame, text_col: str = "text",
                      mode: str = "whitespace",
                      out: str = "n_tokens") -> DataFrame:
    if mode == "whitespace":
        # pure JVM fast path
        return df.withColumn(out, F.size(F.split(F.col(text_col), r"\s+")))
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out} long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out] = token_count_batch(pdf[text_col], mode=mode)
            yield pdf

    return df.mapInPandas(fn, schema=schema)


def with_fingerprints(df: DataFrame, text_col: str = "text",
                      out: str = "fingerprint", window: int = 8) -> DataFrame:
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out} long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out] = rolling_fingerprint(pdf[text_col], window=window)
            yield pdf

    return df.mapInPandas(fn, schema=schema)


def tfidf_top_terms(df, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3, decimals: int | None = None,
                    cache_tf: bool = True):
    """Top-k TF-IDF terms per document, corpus-level IDF.

    Smoothed sklearn-style idf = ln((1 + N) / (1 + df)) + 1 where df
    counts documents containing the term.  All-JVM, fully LAZY plan
    (no action until the caller runs one): one explode, tf via
    groupBy(doc, token), df via a partial-agg groupBy(token) over tf,
    N as a broadcast 1-row countDistinct aggregate over the pruned id
    column, idf joined back, row_number top-k with (score desc,
    token asc) tiebreak so results are total-ordered.

    Scale: shuffles keyed by token are Zipf-skewed — the df aggregate
    is a partial-agg groupBy (map-side combine collapses the head
    token to one row per map task), and the tf->idf join gets AQE
    skew splitting.  A window over token would be one lineage but NO
    skew mitigation (every row of a stopword token in one task — a
    job killer on a web corpus), so the branch-and-join shape is
    deliberate.  ``cache_tf=True`` persists the tf relation
    (MEMORY_AND_DISK, spill-safe: |distinct(doc, token)| rows, no raw
    text) so both consumers materialize the text scan once; pass
    False to trade a second corpus scan for zero cache footprint.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"),
    )
    if cache_tf:
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    # N inside the DAG: a 1-row countDistinct aggregate broadcast onto
    # the idf relation.  No eager action — calling this function must
    # not run a Spark job (it used to `.count()` here: a second full
    # pass over the corpus before the real job, and an eager surprise
    # in composed pipelines).
    n_docs_df = df.agg(
        F.count_distinct(F.col(id_col)).alias("__n_docs"),
    )
    doc_freq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
    )
    idf = doc_freq.crossJoin(F.broadcast(n_docs_df)).select(
        "token",
        (F.log((1.0 + F.col("__n_docs")) / (1.0 + F.col("df"))) + 1.0)
        .alias("idf"),
    )
    score = F.col("tf") * F.col("idf")
    if decimals is not None:
        # round BEFORE ranking: makes the ordering identical across
        # engines' ln() implementations (cross-engine oracle use)
        score = F.round(score, decimals)
    scored = tf.join(idf, "token").select(
        id_col, "token", score.alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("token"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# PII patterns chosen for identical semantics under Java regex (Spark)
# and RE2 (DuckDB oracle): character classes + greedy quantifiers only,
# no backreferences or lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d().\- ]{6,}\d\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
               out_col: str | None = None) -> DataFrame:
    """Corpus PII scrubbing: replace email / IPv4 / phone matches with
    ``[KIND]`` tokens and count matches per kind.

    Adds ``<out_col>`` (default: redacts ``text_col`` in place) plus
    one ``n_<kind>`` count column per requested kind.  Pure JVM
    ``regexp_replace`` / ``regexp_extract_all`` — a scan-level
    projection with zero shuffle, so it composes into any cleaning
    pipeline for free at 100 TB.  Redaction order is the ``kinds``
    order: earlier patterns consume their text before later ones run
    (email before phone keeps digits inside addresses from
    double-matching).  The reference engine has no PII stage; the
    pattern set follows the C4/CCNet-style cleaning recipes.
    """
    out_col = out_col or text_col
    clash = {f"n_{k}" for k in kinds} & set(df.columns)
    if out_col != text_col and out_col in df.columns:
        clash.add(out_col)
    if clash:
        raise ValueError(
            f"column names collide with redact_pii outputs: "
            f"{sorted(clash)}; rename them first",
        )
    red = F.col(text_col)
    counts = []
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        counts.append(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
            .alias(f"n_{kind}"),
        )
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    other = [c for c in df.columns if c != out_col]
    return df.select(*other, red.alias(out_col), *counts)


def _adjacent_bigrams(df: DataFrame, text_col: str,
                      id_col: str | None = None) -> DataFrame:
    """The (w1, w2) adjacent-bigram relation from a split text column
    — single source of truth for ngram_logprob_scores AND
    pmi_collocations (one JVM transform/explode, no positional
    self-join).  Documents with fewer than 2 tokens contribute
    nothing; ``id_col`` is carried through when given."""
    keep = [F.col(id_col)] if id_col else []
    toks = df.select(
        *keep, F.split(F.col(text_col), " ").alias("__a"),
    ).where(F.size("__a") >= 2)
    names = [id_col] if id_col else []
    return toks.select(
        *names,
        F.explode(F.expr(
            "transform(sequence(1, size(__a) - 1), "
            "i -> struct(element_at(__a, i) AS w1, "
            "element_at(__a, i + 1) AS w2))",
        )).alias("__bg"),
    ).select(*names, "__bg.w1", "__bg.w2")


def ngram_logprob_scores(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         alpha: float = 0.5,
                         cache_bigrams: bool = True) -> DataFrame:
    """Corpus-trained bigram-LM quality scores (the CCNet/Gopher
    LM-filter shape): mean ln P(w2 | w1) per document with Laplace
    smoothing, P = (C(w1,w2) + alpha) / (C(w1) + alpha * V), where
    counts and vocabulary V (= distinct successor words) come from the
    corpus itself.  Low scores flag gibberish/boilerplate; high scores
    flag natural repetition of corpus-frequent transitions.

    All-JVM: one explode into bigrams, two partial-agg groupBys for
    the counts, joins back keyed by (w1, w2) / w1 (Zipf-skewed heads
    handled by map-side combine on the aggregates and AQE skew
    splitting on the joins), V and nothing else crosses as a 1-row
    broadcast.  Output: (id, avg_logprob, n_bigrams); documents with
    fewer than 2 tokens have no bigrams and are absent.
    ``cache_bigrams=True`` persists the exploded bigram relation so
    its four consumers materialize the corpus scan once; pass False
    to trade repeated scans for zero cache footprint.
    """
    big = _adjacent_bigrams(df, text_col, id_col)
    if cache_bigrams:
        # four consumers (c2, c1, v, the join base) would otherwise
        # each re-scan and re-explode the corpus; same optional-
        # persist pattern as tfidf_top_terms
        from pyspark.storagelevel import StorageLevel

        big = big.persist(StorageLevel.MEMORY_AND_DISK)
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = big.agg(F.count_distinct("w2").alias("v"))
    a = float(alpha)
    return (
        big.join(c2, ["w1", "w2"]).join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(F.log(
                (F.col("c2") + a) / (F.col("c1") + a * F.col("v")),
            )), 6).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def normalize_text(df: DataFrame, text_col: str = "text",
                   unicode_form: str | None = "NFC",
                   strip_control: bool = True,
                   collapse_whitespace: bool = True,
                   lowercase: bool = False,
                   out_col: str | None = None) -> DataFrame:
    """Canonical text normalization — the first stage of every web
    corpus pipeline: strip C0/C1 control characters, collapse runs of
    whitespace to one space + trim, optional lowercasing, optional
    Unicode normalization.

    The regex stages are pure JVM ``regexp_replace`` (zero shuffle, a
    scan-level projection at 100 TB).  Unicode normalization has no
    Spark SQL builtin, so ``unicode_form`` adds ONE Arrow-batched
    ``mapInPandas`` pass over ``unicodedata.normalize`` — pass
    ``unicode_form=None`` to stay entirely JVM-side on corpora known
    to be normalized already.  Order (control -> unicode -> whitespace
    -> lower) matches what a streaming normalizer would do:
    composition can't re-introduce control characters, and collapsing
    after NFC means composed spaces fold too.
    """
    out = out_col or text_col
    col = F.col(text_col)
    if strip_control:
        col = F.regexp_replace(
            col, "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "",
        )
    staged = df.withColumn(out, col)
    if unicode_form is not None:
        form = str(unicode_form)
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in staged.schema.fields
        )

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import unicodedata

            for pdf in batches:
                pdf[out] = [
                    unicodedata.normalize(form, t)
                    if isinstance(t, str) else t
                    for t in pdf[out]
                ]
                yield pdf

        staged = staged.mapInPandas(fn, schema=schema)
    col = F.col(out)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, "\\s+", " "))
    if lowercase:
        col = F.lower(col)
    return staged.withColumn(out, col)


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     min_count: int = 10, top_k: int = 100,
                     decimals: int = 6) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information — the word2vec/phrase-mining preprocessing step
    (Mikolov et al.'s phrase detection uses the same count form).

    PMI(x, y) = ln( c(x,y) * N / (c(x,·) * c(·,y)) ) over adjacent
    bigram events: c(x,·) counts x as a LEFT word, c(·,y) counts y as
    a RIGHT word, N = total bigrams.  Marginals are computed from the
    UNFILTERED bigram counts (filtering first would bias every
    probability), while the ``min_count`` floor prunes the candidate
    set before the joins — the classic guard against PMI's
    rare-pair explosion (a pair seen once between two rare words
    maxes the score).

    Scale shape: tokenization + bigram formation are one pure-JVM
    map (slice/transform — no self-join on position), the single big
    shuffle is ``groupBy(w1, w2)`` with map-side combine (the
    Zipf-head pair collapses to one row per map task), the three
    count relations are vocabulary-sized, N is a broadcast 1-row
    aggregate, and the final ordering is a TakeOrdered top-k, not a
    full sort.  PMI is rounded BEFORE ranking so the (pmi desc, w1,
    w2) total order is identical across engines (cross-engine oracle
    use, same convention as tfidf_top_terms).
    """
    pairs = _adjacent_bigrams(df, text_col)
    c2 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("pair_count"))
    cx = c2.groupBy("w1").agg(F.sum("pair_count").alias("__cx"))
    cy = c2.groupBy("w2").agg(F.sum("pair_count").alias("__cy"))
    n = c2.agg(F.sum("pair_count").alias("__n"))
    return (
        c2.where(F.col("pair_count") >= min_count)
        .join(cx, "w1").join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1", "w2", "pair_count",
            F.round(F.log(
                (F.col("pair_count").cast("double") * F.col("__n"))
                / (F.col("__cx").cast("double") * F.col("__cy"))
            ), decimals).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", posting_cap: int = 20,
                   min_df: int = 1, lowercase: bool = True,
                   salt_buckets: int | None = None) -> DataFrame:
    """Capped inverted index: per token, document frequency,
    collection frequency, and a posting list of the ``posting_cap``
    LOWEST doc ids (comma-joined text, ascending) — the retrieval-
    side artifact of a corpus pipeline (BM25/keyword search), built
    the bounded-state way.

    Scale shape: term stats (df, cf) come from ONE map-side-combined
    groupBy over the exploded (token, doc) pairs.  The posting list
    is the scale hazard — a stopword's full posting list is
    corpus-sized — so it is capped by a SALTED two-stage bounded
    top-k, never a per-token window over the raw occurrence stream
    (which would land a stopword's entire distinct (token, doc) set
    in ONE task's sort):

      stage 1  distinct (token, doc) pairs -> row_number over
               ``(token, salt)`` with ``salt = xxhash64(doc) mod S``
               -> keep the ``posting_cap`` smallest ids per salt
               group; the hottest group holds ~df/S rows and the
               window sort is a spillable partition-local sort;
      stage 2  merge the survivors — <= S * posting_cap rows per
               token — with one array_sort + slice per token.

    The global cap-smallest set is a subset of the union of the
    per-salt cap-smallest sets, so the result is EXACT.  ``S``
    autoscales to ``ceil(sqrt(n_docs / posting_cap))`` (one count()),
    which equalizes the stage-1 group bound (n_docs/S) and the
    stage-2 merge bound (S * posting_cap) at ~sqrt(n_docs *
    posting_cap) rows — ~4.5M rows per task at 10^12 docs, bounded
    and parallel at any corpus size.  Pass ``salt_buckets`` to pin S.

    Returns ``(token, df, cf, posting)`` with ``df >= min_df``.
    """
    from pyspark.sql import Window

    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    occ = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.filter(F.split(txt, r"\s+"), lambda w: w != ""),
        ).alias("token"),
    )
    stats = occ.groupBy("token").agg(
        F.count_distinct("_doc").alias("df"),
        F.count(F.lit(1)).alias("cf"),
    )
    if salt_buckets is None:
        n_docs = max(1, df.count())  # upper bound of any token's df
        salt_buckets = int(math.ceil(math.sqrt(n_docs / posting_cap)))
    salt_buckets = max(1, int(salt_buckets))
    w = Window.partitionBy("token", "_salt").orderBy("_doc")
    posting = (
        occ.distinct()
        .withColumn("_salt", F.pmod(F.xxhash64(F.col("_doc")),
                                    F.lit(salt_buckets)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= posting_cap)
        .groupBy("token")
        .agg(F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_list(F.col("_doc"))),
                         1, posting_cap),
        ).alias("posting"))
    )
    return (
        stats.where(F.col("df") >= min_df)
        .join(posting, "token")
        .select("token", "df", "cf", "posting")
    )


def bm25_topk(df: DataFrame, query_terms: list, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              lowercase: bool = True) -> DataFrame:
    """BM25 keyword retrieval (Robertson-Walker Okapi weighting with
    the Lucene-style non-negative idf): top-``k`` documents for a bag
    of query terms.

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d)    = sum_t idf(t) * tf * (k1+1) /
                         (tf + k1 * (1 - b + b * dl / avgdl))

    Scale shape, all JVM: one scan computes per-doc length; the
    exploded token stream is filtered to the query terms IMMEDIATELY
    (a handful of terms — the filter collapses the corpus to the
    matching postings before any shuffle), one groupBy(doc, term)
    count, per-term df as a tiny broadcast, and a TakeOrdered top-k —
    never a global sort.  Scores are rounded to 6 decimals BEFORE
    ranking (doc-id tiebreak after), so the cut is deterministic and
    cross-engine reproducible (q81's DuckDB oracle is exact).

    Returns ``(doc_id, score, n_matched)`` ordered by
    ``score DESC, doc_id``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms] if lowercase else list(query_terms)
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.filter(F.split(txt, r"\s+"), lambda w: w != "").alias("_t"),
    ).withColumn("_dl", F.size("_t"))
    corpus = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    hits = (
        toks.select("_doc", "_dl", F.explode("_t").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("_doc", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(
        F.count_distinct("_doc").alias("_df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_idf",
            F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5)
                  / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_s",
            F.col("_idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b
                                   + b * F.col("_dl") / F.col("_avgdl"))),
        )
        .groupBy(F.col("_doc").alias(id_col))
        .agg(F.round(F.sum("_s"), 6).alias("score"),
             F.count(F.lit(1)).alias("n_matched"))
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def ngram_diversity(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Per-document n-gram diversity (distinct-n, Li et al. 2016
    "A Diversity-Promoting Objective Function for Neural Conversation
    Models"): ``distinct n-grams / total n-grams`` over whitespace
    tokens — the standard repetition/diversity score used to flag
    degenerate (copy-paste, template, model-generated) text in
    training-data curation; 1.0 = every n-gram unique, -> 0 for
    loopy text.

    ZERO shuffle: tokens, the n-gram array, and both counts are one
    JVM ``transform``/``array_distinct`` expression per row — each
    document is scored inside the scan partition that read it, so the
    operator inherits the scan's parallelism at any corpus size (the
    q79 chunking property).  Documents with fewer than ``n`` tokens
    get NULL diversity (no n-grams exist; 0 would fake "maximally
    repetitive" and poison downstream filters).

    Returns the input plus ``n_ngrams``, ``n_distinct``,
    ``diversity``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    reserved = {"__toks", "__grams"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"column names collide with internals: {clash}")
    toks = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__toks, i, {n})))",
    )
    out = (
        df.withColumn("__toks", toks)
        .withColumn(
            "__grams",
            F.when(F.size("__toks") >= n, grams),
        )
        .withColumn("n_ngrams", F.size("__grams"))
        .withColumn("n_distinct", F.size(F.array_distinct("__grams")))
        .withColumn(
            "diversity",
            F.when(
                F.col("n_ngrams") > 0,
                F.col("n_distinct").cast("double") / F.col("n_ngrams"),
            ),
        )
    )
    return out.drop("__toks", "__grams")


def zipf_fit(df: DataFrame, text_col: str = "text",
             min_count: int = 2, top_k: int | None = None) -> DataFrame:
    """Corpus Zipf-law fit: OLS slope/intercept/r2 of
    ``ln(freq) ~ ln(rank)`` over the token frequency table — the
    rank-frequency diagnostic (Zipf 1949; Piantadosi 2014 review)
    data-quality audits use to spot corpora that are "off-profile"
    (slope far from -1 flags boilerplate floods, deduplication
    failures, or synthetic text).

    Plan: one explode + map-side-combinable ``groupBy(token)`` count
    (the only stage that sees token volume); the regression runs over
    the VOCABULARY, not the corpus — ``min_count`` floors the tail
    (rank-ordering of hapax ties is meaningless and the floor bounds
    the sorted set), ``top_k`` optionally caps it further for
    100 TB-vocabulary runs.  Ranks come from one ``row_number`` over
    ``(count DESC, token)`` — the token tiebreak makes ranks (and so
    the fit) deterministic and engine-portable; slope/intercept/r2
    are Spark's built-in ``regr_*`` aggregates (one reduce, nothing
    collected).

    Returns one row ``(n_types, n_tokens, slope, intercept, r2)``
    with the regression values rounded to 6 dp (cross-engine float
    comparability).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    counts = (
        df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .where(F.col("__tok") != "")
        .groupBy("__tok").agg(F.count(F.lit(1)).alias("__n"))
    )
    floored = counts.where(F.col("__n") >= min_count)
    w = Window.orderBy(F.col("__n").desc(), F.col("__tok"))
    ranked = floored.select(
        F.col("__n"),
        F.row_number().over(w).alias("__rank"),
    )
    if top_k is not None:
        ranked = ranked.where(F.col("__rank") <= top_k)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("__n").alias("n_tokens"),
        F.round(
            F.expr("regr_slope(ln(__n), ln(__rank))"), 6,
        ).alias("slope"),
        F.round(
            F.expr("regr_intercept(ln(__n), ln(__rank))"), 6,
        ).alias("intercept"),
        F.round(
            F.expr("regr_r2(ln(__n), ln(__rank))"), 6,
        ).alias("r2"),
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      out: str = "compression_ratio",
                      level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio ``deflate_len / raw_len`` —
    the repetition/boilerplate signal RefinedWeb and Gopher-family
    pipelines gate on (highly repetitive or templated pages compress
    far below natural prose, random/binary junk compresses above it).

    Arrow-batched ``mapInPandas`` (zlib is stdlib; one C call per doc,
    no third-party dep).  Deterministic for a fixed ``level`` and
    zlib build, so it can be a reproducible sampling weight; not
    SQL-expressible, so queries over it are rows-only (pytest pins
    ordering properties: repeated text < prose < high-entropy junk).
    Null/empty text -> NULL ratio (no fake 0, same convention as
    ngram_diversity).  Scale: zero shuffle — the ratio is computed
    inside the scan partition; project only (id, text) upstream.
    """
    import zlib

    cols = df.columns
    if out in cols:
        raise ValueError(f"output column {out!r} already exists")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            txt = pdf[text_col]
            ratios = []
            for t in txt:
                if t is None or not isinstance(t, str) or len(t) == 0:
                    ratios.append(None)
                    continue
                raw = t.encode("utf-8")
                ratios.append(len(zlib.compress(raw, level)) / len(raw))
            pdf = pdf.copy()
            pdf[out] = pd.array(ratios, dtype="float64")
            yield pdf

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out}` double"
    return df.mapInPandas(fn, schema=schema)


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append Flesch reading-ease inputs and score: ``n_words``
    (non-space runs), ``n_sentences`` (runs of ``.!?``, floored at 1
    so headline-style fragments don't divide by zero), ``n_syllables``
    (the standard vowel-group approximation — runs of ``aeiouy``,
    case-insensitive), and

        flesch = 206.835 - 1.015·(words/sentences)
                         - 84.6·(syllables/words)

    (Flesch 1948; the Kincaid et al. 1975 recalibration uses the same
    three counts, so callers can derive grade level from these
    columns).  Empty/whitespace-only text yields 0 words and a null
    score.  Readability is a standard quality-tier signal next to the
    Gopher repetition gates: machine-generated and boilerplate text
    skews to degenerate word/sentence shapes.

    Scale shape: three ``regexp_extract_all`` + ``size`` projections
    and arithmetic — pure WholeStageCodegen, zero shuffle, and the
    regexes are Java/RE2-portable so a SQL oracle replays them
    byte-identically.
    """
    from outrank_spark.hashing import sql_ident as _qu

    words = F.size(F.expr(
        f"regexp_extract_all({_qu(text_col)}, '\\\\S+', 0)"))
    sents = F.greatest(
        F.size(F.expr(
            f"regexp_extract_all({_qu(text_col)}, '[.!?]+', 0)")),
        F.lit(1))
    syll = F.size(F.expr(
        f"regexp_extract_all(lower({_qu(text_col)}), '[aeiouy]+', 0)"))
    out = (
        df.withColumn("n_words", words)
        .withColumn("n_sentences", sents)
        .withColumn("n_syllables", syll)
    )
    return out.withColumn(
        "flesch",
        F.when(
            F.col("n_words") > 0,
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
            - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
        ),
    )
