"""Document deduplication operators — the web-corpus cleaning family.

All variants keep the heavy work JVM-side or in vectorized Arrow
batches, and every approximate method is a *candidate generator*
followed by an exact verification join (so precision is exact and only
recall depends on the sketch parameters):

* :func:`exact_dedup` — content-hash groupBy (one shuffle on the hash).
* :func:`minhash_signatures` / :func:`minhash_lsh_candidates` —
  shingle -> xxhash64 -> k min-aggregates (pure codegen, no UDF!) ->
  banded LSH bucket join (Broder 1997; Leskovec et al. MMDS ch.3).
  With b bands of r rows, P(candidate) = 1 - (1 - s^r)^b.
* :func:`simhash_signatures` / :func:`simhash_candidates` — 64-bit
  Charikar fingerprints via vectorized bit-voting in ``mapInPandas``;
  near-dups share at least one of 4 16-bit chunks (Hamming <= 3 over
  64 bits implies a shared chunk by pigeonhole).
* :func:`ngram_jaccard_pairs` — exact shingle-set Jaccard via
  explode + self-join (the verification primitive, also standalone).
* :func:`embedding_neardup_candidates` — random-hyperplane LSH over
  an embedding column, verified by exact cosine.

Scale notes: every join key (shingle, band hash, chunk, hyperplane
bucket) is a hash — uniformly distributed, so the shuffles are
skew-free by construction except the shingle join, where stop-shingles
are capped by ``max_shingle_freq`` (a df filter, the classic
stop-words-in-LSH mitigation).
"""
from __future__ import annotations

from typing import Iterator, Sequence

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from outrank_spark.hashing import derive_seeds, hash_with_seed

__all__ = [
    "exact_dedup", "shingle_df", "shingle_array_expr",
    "jaccard_prefix_join",
    "contamination_scores",
    "minhash_signatures",
    "minhash_lsh_candidates", "minhash_delta_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures", "simhash_candidates",
    "embedding_neardup_candidates", "near_dedup_corpus",
    "winnowed_span_pairs", "dedup_paragraphs",
    "duplicated_spans_exact", "containment_join",
    "sorted_neighborhood_pairs",
    "fellegi_sunter_em",
]


def _content_key(text_col: str):
    """128-bit content key as two independent 64-bit xxhash64 lanes.

    A single 64-bit hash hits birthday collisions around ~4B documents
    (p(collision) ~ n^2 / 2^65), which is inside this engine's target
    scale — a collision would silently merge distinct documents into
    one 'exact' cluster and drop one of them.  Two lanes (the second
    seeded by a constant prefix) push the birthday bound to 2^64 docs
    while keeping the key a narrow 16-byte pair of longs (vs 32/64
    bytes for hex md5/sha2) and staying in WholeStageCodegen."""
    return (
        F.xxhash64(F.col(text_col)),
        F.xxhash64(F.lit("outrank-lane2"), F.col(text_col)),
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: ``(hash, hash2, keeper_id, n_copies)`` — survivors
    keep the minimum id.  Single shuffle keyed by the 128-bit content
    key (see :func:`_content_key` for why not one xxhash64)."""
    h1, h2 = _content_key(text_col)
    return (
        df.withColumn("_h", h1).withColumn("_h2", h2)
        .groupBy("_h", "_h2")
        .agg(
            F.min(id_col).alias("keeper_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .withColumnRenamed("_h", "content_hash")
        .withColumnRenamed("_h2", "content_hash2")
    )


def shingle_array_expr(text_col: str = "text", n: int = 3) -> str:
    """SQL expression for a doc's DISTINCT token n-gram shingle-hash
    array (one JVM projection, no shuffle).  Shared by the exploded
    relation (:func:`shingle_df`) and by zero-shuffle per-doc shingle
    COUNTS (``size(...)``) so both sides of a containment/Jaccard
    denominator agree by construction."""
    toks = f"split({text_col}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> xxhash64(concat_ws(' ', slice({toks}, i, {n}))))) "
        f"ELSE array(xxhash64({text_col})) END"
    )


def shingle_df(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle_hash) pairs: token n-gram shingles hashed JVM-side."""
    return df.select(
        F.col(id_col),
        F.explode(F.expr(shingle_array_expr(text_col, n))).alias("shingle"),
    )


def contamination_scores(corpus: DataFrame, benchmark: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 3,
                         broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark decontamination (train/test overlap): for each corpus
    document, the fraction of its distinct token n-gram shingles that
    occur anywhere in the benchmark set.  Returns
    ``(id, n_shingles, n_contaminated, contamination)``.

    Scale shape: the benchmark side is an evaluation suite (thousands
    of documents, not billions), so it reduces to a distinct
    shingle-hash set and is broadcast — the 100 TB corpus pays ONE
    explode + broadcast hash join + one groupBy(id) shuffle, and is
    never re-partitioned by shingle.  Set
    ``broadcast_benchmark=False`` for an oversized benchmark; the
    fallback shuffle join keys on the uniform xxhash64 shingle hash,
    skew-free by construction.

    The n-gram-overlap definition follows the published
    decontamination procedure of large-LM training pipelines (GPT-3
    appendix C; Gopher appendix A.3).  The reference engine has no
    counterpart operator.
    """
    bench = (shingle_df(benchmark, text_col, id_col, n)
             .select("shingle").distinct())
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    sh = shingle_df(corpus, text_col, id_col, n)
    return (
        sh.join(bench.withColumn("__hit", F.lit(1)), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       k: int = 128) -> DataFrame:
    """k-permutation MinHash signature per document, computed as k
    ``min`` aggregates over re-seeded shingle hashes — pure
    WholeStageCodegen, one shuffle on the id."""
    sh = shingle_df(df, text_col, id_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           k: int = 128, bands: int = 32,
                           verify_threshold: float | None = 0.7) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) with the MinHash
    similarity estimate; when ``verify_threshold`` is set, candidates
    are verified with *exact* shingle Jaccard and filtered."""
    rows = k // bands
    sig = minhash_signatures(df, text_col, id_col, n, k).cache()
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"mh{b * rows + r}") for r in range(rows)],
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # MinHash similarity estimate: fraction of matching signature slots
    sig_a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)],
    )
    sig_b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(k)
    )
    est = (
        cand.join(sig_a, "id_a").join(sig_b, "id_b")
        .withColumn("minhash_sim", matches / F.lit(float(k)))
        .select("id_a", "id_b", "minhash_sim")
    )
    if verify_threshold is None:
        return est
    exact = ngram_jaccard_pairs(
        df, text_col, id_col, n, candidate_pairs=est,
    )
    return exact.filter(F.col("jaccard") >= verify_threshold)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        candidate_pairs: DataFrame | None = None,
                        max_shingle_freq: int | None = 100_000) -> DataFrame:
    """Exact shingle-set Jaccard.

    Without ``candidate_pairs`` this is the full explode + self-join —
    **quadratic in near-dup cluster size; oracle/baseline use only**
    (the flagship q14 shape).  At corpus scale route through
    :func:`minhash_lsh_candidates`, which bounds this verification to
    its LSH candidate pairs.

    With ``candidate_pairs`` the work is candidate-bounded end to end:
    shingles are first semi-joined to the candidate doc ids, and the
    intersection is computed by walking ``candidates -> shingles(id_a)
    -> shingles(id_b)`` — no all-pairs shuffle ever materializes, so
    cost is O(sum of candidate docs' shingles), not O(cluster^2).
    ``max_shingle_freq`` (default 100k) drops stop-shingles via a
    broadcast **anti**-join against the tiny heavy-hitter set (the
    classic stop-words-in-LSH mitigation; broadcasting the *kept* side
    would ship nearly the whole vocabulary).  Sizes are computed from
    the same filtered universe as intersections, so Jaccard stays an
    unbiased set similarity over the capped shingle space.
    """
    sh = shingle_df(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        # stop-shingle frequencies over the FULL corpus, BEFORE any
        # candidate pruning — otherwise the candidate-bounded path
        # would filter against a different universe than the full join
        # and return different Jaccard values for the same pair
        stop = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
            .filter(F.col("f") > max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(stop), "shingle", "left_anti")
    if candidate_pairs is not None:
        cand = candidate_pairs.select("id_a", "id_b").distinct()
        # explode, not union-of-two-selects: union evaluates the
        # candidate DAG twice; exploding the id pair consumes it once
        # (callers with an expensive candidate plan should ALSO
        # persist it — see jaccard_prefix_join)
        cand_ids = (
            cand.select(
                F.explode(F.array("id_a", "id_b")).alias(id_col))
            .distinct()
        )
        sh = sh.join(cand_ids, id_col, "left_semi")
    # numerator and denominator over the SAME (filtered) universe
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidate_pairs is None:
        a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            cand.join(sh_a, "id_a")
            .join(sh_b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter
        .join(sizes.select(F.col(id_col).alias("id_a"),
                           F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"),
                           F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_prefix_join(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """EXACT all-pairs Jaccard-threshold join via prefix filtering
    (AllPairs: Bayardo/Ma/Srikant WWW'07; PPJoin: Xiao et al.
    SIGMOD'08) — every pair with ``jaccard >= threshold``, no LSH
    recall loss, and no full shingle self-join.

    Why it is exact: order each document's distinct shingles by a
    global canonical order (document frequency ascending, shingle id
    as tie-break — rarest first).  For ``J(a, b) >= t`` the overlap
    obeys ``|a & b| >= t * max(|a|, |b|)`` (since ``J <= min/max``),
    so the smallest COMMON shingle under the global order sits at
    position ``<= |x| - ceil(t * |x|) + 1`` in BOTH documents: at
    most ``|x| - overlap`` non-shared shingles can precede it.
    Joining only those prefixes therefore loses no qualifying pair;
    an exact verification pass (:func:`ngram_jaccard_pairs` in its
    candidate-bounded mode) then removes false candidates, so the
    result equals the brute-force join filtered at ``threshold``.

    Scale shape (the reason this replaces the q14 full self-join at
    corpus size):

    * prefix lengths shrink as ``(1 - t) * |d|`` — at t=0.8 only ~20%
      of each document's shingles enter the candidate join;
    * rarest-FIRST ordering pushes Zipf-head shingles (boilerplate,
      stopword runs) to the END of every document, so hot shingles
      almost never appear in a prefix: the candidate join is
      skew-resistant by construction, the opposite of the naive
      shingle join where the hottest key dominates;
    * the length filter ``min_sz >= t * max_sz`` (a necessary
      condition for ``J >= t``) prunes cross-size candidates before
      the pair distinct;
    * verification is candidate-bounded: O(sum of candidate docs'
      shingles), never corpus^2.

    One window (partitionBy doc) ranks shingles per document; document
    frequency comes from one groupBy over the same exploded relation.
    Float guard: ``ceil`` thresholds subtract 1e-9 before rounding up
    so ``t * sz`` landing on an exact integer (e.g. 0.4 * 5) cannot
    drift to ``k + 1`` and silently drop a qualifying pair.

    The reference engine has no counterpart operator (its near-dup
    path is MinHash-shaped); this is the exact companion to
    :func:`minhash_lsh_candidates` for thresholds where exactness is
    required (license compliance, eval-set decontamination audits).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    sh = shingle_df(df, text_col, id_col, n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("__df", "shingle")),
        )
        .withColumn(
            "__sz",
            F.count(F.lit(1)).over(Window.partitionBy(id_col)),
        )
    )
    # prefix length p = sz - ceil(t * sz) + 1 (rarest-first order)
    prefix = ranked.filter(
        F.col("__rn")
        <= F.col("__sz") - F.ceil(F.lit(t) * F.col("__sz") - 1e-9) + 1,
    ).select(id_col, "shingle", "__sz")
    a = prefix.select(F.col(id_col).alias("id_a"), "shingle",
                      F.col("__sz").alias("sz_a"))
    b = prefix.select(F.col(id_col).alias("id_b"), "shingle",
                      F.col("__sz").alias("sz_b"))
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t forces min(|a|,|b|) >= t*max(|a|,|b|)
            & (F.least("sz_a", "sz_b")
               >= F.lit(t) * F.greatest("sz_a", "sz_b") - 1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
        # the verify pass reads the candidate relation twice (id set +
        # pair walk); without a persist each read would re-run the df
        # groupBy + prefix window + candidate join from scratch —
        # measured 122 s -> 31 s at 50k docs.  Cached state is tiny
        # (two longs per candidate pair)
        .persist()
    )
    verified = ngram_jaccard_pairs(
        df, text_col=text_col, id_col=id_col, n=n,
        candidate_pairs=cands, max_shingle_freq=None,
    )
    return verified.filter(F.col("jaccard") >= t - 1e-12)


# ------------------------------------------------------------ SimHash
def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit Charikar SimHash per document — pure JVM bit voting.

    Tokens are exploded JVM-side (token multiplicity = vote weight, so
    no per-token count pass is needed), hashed with Spark's built-in
    ``xxhash64`` (seed pinned inside Spark — signatures are stable
    across Spark/pandas/numpy versions, unlike the previous
    ``pd.util.hash_array`` path), and each of the 64 bits contributes
    ``+1``/``-1`` to one of 64 ``sum`` aggregates.  One explode + one
    shuffle keyed by doc id, all inside WholeStageCodegen — no Python
    anywhere in the hot path.
    """
    h = F.col("_h")
    tok = (
        df.select(
            id_col,
            F.explode(
                F.split(F.coalesce(F.col(text_col).cast("string"),
                                   F.lit("")), " "),
            ).alias("_tok"),
        )
        .withColumn("_h", F.xxhash64(F.col("_tok")))
    )
    votes = tok.groupBy(id_col).agg(*[
        F.sum(
            F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)).cast("long")
            * 2 - 1,
        ).alias(f"v{i}")
        for i in range(64)
    ])
    sig = None
    for i in range(64):
        bit = F.when(
            F.col(f"v{i}") >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return votes.select(id_col, sig.alias("simhash"))


def simhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found via
    4x16-bit chunk buckets (pigeonhole: <=3 differing bits over 64 ->
    at least one identical chunk)."""
    sig = simhash_signatures(df, text_col, id_col).cache()
    chunks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                )
                for i in range(4)
            ]),
        ).alias("cc"),
    ).select(id_col, "simhash", F.col("cc.chunk").alias("chunk"),
             F.col("cc.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(
        F.col(f"a.simhash").bitwiseXOR(F.col(f"b.simhash")),
    )
    return (
        a.join(b, ["chunk", "cv"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------- embedding near-dup
def embedding_neardup_candidates(df: DataFrame, vec_col: str = "embedding",
                                 id_col: str = "vec_id", n_planes: int = 16,
                                 n_tables: int = 4, seed: int = 20141025,
                                 dim: int | None = None,
                                 cos_threshold: float = 0.95) -> DataFrame:
    """Random-hyperplane LSH (Charikar 2002): ``n_tables`` independent
    ``n_planes``-bit sign buckets; bucket-mates verified with exact
    cosine.  Plane matrix is derived from the seed, so every executor
    regenerates it identically — nothing is broadcast."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            rows = {"id": np.repeat(ids, n_tables),
                    "table": np.tile(np.arange(n_tables), len(ids))}
            sgn = np.einsum("tpd,nd->ntp", planes, vecs) > 0
            weights = (1 << np.arange(n_planes, dtype=np.int64))
            buckets = (sgn * weights[None, None, :]).sum(axis=2)
            rows["bucket"] = buckets.reshape(-1)
            yield pd.DataFrame(rows)

    buckets = df.select(id_col, vec_col).mapInPandas(
        bucketize, schema="id long, table int, bucket long",
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a_, x: a_ + x * x))
    return (
        cand
        .join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= cos_threshold)
        .select("id_a", "id_b", "cosine")
    )


def near_dedup_corpus(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3, k: int = 128,
                      bands: int = 32, threshold: float = 0.7,
                      method: str = "minhash",
                      max_hamming: int = 3) -> DataFrame:
    """One-call corpus near-dedup, the whole family composed:

    1. exact pass — content-hash star edges (identical texts always
       cluster, independent of LSH parameters);
    2. approximate pass — ``method='minhash'``: banded-LSH candidates
       verified with candidate-bounded exact shingle Jaccard
       ``>= threshold``; ``method='simhash'``: 64-bit Charikar
       fingerprints with Hamming distance ``<= max_hamming`` (chunk-
       bucketed, exact Hamming verify built in);
    3. connected components over the union of both edge sets
       (large-star/small-star — duplicates that chain A~B~C across
       passes land in ONE cluster);
    4. keep the minimum-id member per cluster.

    Returns ``df`` minus every non-canonical duplicate.  All stages are
    shuffles on hash keys; nothing quadratic in corpus size (the exact
    verification is bounded to LSH/chunk candidates).
    """
    from outrank_spark.operators.components import keep_canonical

    h1, h2 = _content_key(text_col)
    hashed = df.select(
        F.col(id_col), h1.alias("_h"), h2.alias("_h2"),
    )
    mins = hashed.groupBy("_h", "_h2").agg(F.min(id_col).alias("dst"))
    exact_edges = (
        hashed.join(mins, ["_h", "_h2"])
        .where(F.col(id_col) != F.col("dst"))
        .select(F.col(id_col).alias("src"), "dst")
    )
    if method == "minhash":
        near = minhash_lsh_candidates(
            df, text_col, id_col, n=n, k=k, bands=bands,
            verify_threshold=threshold,
        )
    elif method == "simhash":
        near = simhash_candidates(
            df, text_col, id_col, max_hamming=max_hamming,
        )
    else:
        raise ValueError(f"unknown near-dedup method {method!r}")
    near_edges = near.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"),
    )
    return keep_canonical(
        df, exact_edges.union(near_edges), id_col=id_col,
    )


def winnowed_span_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", ngram: int = 3,
                        window: int = 4, hash_fn: str = "xxhash64",
                        max_fp_freq: int | None = 100_000) -> DataFrame:
    """Duplicated-SPAN candidates by winnowing (Schleimer et al. 2003,
    the MOSS fingerprinting scheme; substring-level dedup a la Lee et
    al. 2022): hash every token ``ngram``, keep the minimum hash of
    each sliding ``window`` of grams — any shared substring of at
    least ``window + ngram - 1`` tokens is GUARANTEED to share a
    fingerprint — then pair documents by shared fingerprints.

    Fully JVM-side: grams + winnow are one array expression at the
    scan (no shuffle until the fingerprint explode), the pair join is
    keyed by fingerprint hashes (uniform), and ``max_fp_freq`` drops
    boilerplate fingerprints via a broadcast anti-join exactly like
    the shingle path.  ``hash_fn='md5'`` swaps the gram hash for the
    md5-prefix key, which DuckDB reproduces bit-for-bit — the
    cross-engine oracle path (q62).

    Returns ``(id_a, id_b, n_shared_fps)``.
    """
    if hash_fn == "xxhash64":
        gram = (f"xxhash64(concat_ws(' ', "
                f"slice(split({text_col}, ' '), i, {ngram})))")
    elif hash_fn == "md5":
        gram = (f"CAST(conv(substr(md5(concat_ws(' ', "
                f"slice(split({text_col}, ' '), i, {ngram}))), 1, 8), "
                f"16, 10) AS BIGINT)")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    # CASE guards, not greatest(.., 0): sequence(1, 0) DESCENDS in
    # Spark ([1, 0]) and the lambda then calls slice(.., 0, k) which
    # throws — one sub-6-token document would abort the whole job
    grams_expr = (
        f"CASE WHEN size(split({text_col}, ' ')) >= {ngram} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) "
        f"- {ngram} + 1), i -> {gram}) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    winnow_expr = (
        f"CASE WHEN size(grams) >= {window} THEN "
        f"array_distinct(transform("
        f"sequence(1, size(grams) - {window} + 1), "
        f"j -> array_min(slice(grams, j, {window})))) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    # two projections so the gram array materializes ONCE per doc —
    # inlining it re-hashes every gram `window` times
    fps = (
        df.select(F.col(id_col), F.expr(grams_expr).alias("grams"))
        .select(F.col(id_col), F.explode(F.expr(winnow_expr)).alias("fp"))
    )
    if max_fp_freq is not None:
        stop = (
            fps.groupBy("fp").agg(F.count(F.lit(1)).alias("f"))
            .filter(F.col("f") > max_fp_freq)
            .select("fp")
        )
        fps = fps.join(F.broadcast(stop), "fp", "left_anti")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


def duplicated_spans_exact(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           min_length: int = 8) -> DataFrame:
    """ExactSubstr-style duplicated-span statistics (Lee, Ippolito et
    al. — "Deduplicating Training Data Makes Language Models Better",
    ACL 2022): every token ``min_length``-gram that occurs >= 2 times
    ANYWHERE in the corpus marks its coverage as duplicated; per doc,
    overlapping duplicated coverage merges into maximal spans.  Any
    duplicated substring of >= ``min_length`` tokens is contained in a
    reported span (no false negatives); a span is the union of
    overlapping duplicated grams, so its parts may duplicate against
    different partners.  Where :func:`winnowed_span_pairs` SAMPLES
    fingerprints to find partner pairs, this is the exact
    coverage-accounting view — the corpus-curation "what fraction of
    my tokens is boilerplate" number.

    Scale shape: the gram stream is the q14 shingle shuffle (built by
    one JVM array expression at the scan, no Python); duplicated keys
    come from one map-side-combinable count, and only occurrences of
    those keys survive the semi-join — singleton grams (the vast
    majority on real text) never reach the window.  Span merging is a
    per-doc window over DUPLICATED positions only, bounded by document
    length — never a corpus-wide sort.  No self-join exists anywhere,
    so a Zipf-head boilerplate gram costs a big count cell, not a
    quadratic pair blowup.  Grams are keyed by the 128-bit
    :func:`_content_key` pair (collision-safe at corpus scale); the
    q85 DuckDB oracle groups on gram CONTENT — identical modulo hash
    collisions, the q73 argument.

    Returns ``(id, n_tokens, n_spans, dup_tokens, dup_frac)``.
    """
    L = int(min_length)
    if L < 2:
        raise ValueError(f"min_length must be >= 2, got {min_length}")
    # token array projected ONCE before the lambda (the
    # winnowed_span_pairs two-projection pattern): transform is
    # CodegenFallback, so an inlined split would re-split the whole
    # document per gram position — O(tokens^2) on the scan path
    gram = f"concat_ws(' ', slice(_toks, i, {L}))"
    grams_expr = (
        f"CASE WHEN size(_toks) >= {L} THEN "
        f"transform(sequence(1, size(_toks) - {L - 1}), "
        f"i -> struct(i AS pos, xxhash64({gram}) AS g1, "
        f"xxhash64('outrank-lane2', {gram}) AS g2)) "
        f"ELSE CAST(array() AS array<struct<pos:int,g1:bigint,"
        f"g2:bigint>>) END"
    )
    occ = (
        df.select(F.col(id_col),
                  F.split(F.col(text_col), " ").alias("_toks"))
        .select(F.col(id_col), F.explode(F.expr(grams_expr)).alias("g"))
        .select(id_col, "g.pos", "g.g1", "g.g2")
    )
    dup_keys = (
        occ.groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("g1", "g2")
    )
    dup = occ.join(dup_keys, ["g1", "g2"], "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.withColumn(
            "_new",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") > F.lag("pos").over(w) + (L - 1)),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w))
    )
    spans = islands.groupBy(id_col, "_island").agg(
        F.min("pos").alias("_s"),
        (F.max("pos") + (L - 1)).alias("_e"),
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("_e") - F.col("_s") + 1).alias("dup_tokens"),
    )
    return (
        df.select(F.col(id_col),
                  F.size(F.split(F.col(text_col), " ")).alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col, "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_tokens"), 6,
            ).alias("dup_frac"),
        )
    )


def dedup_paragraphs(df: DataFrame, paras_col: str = "paras",
                     id_col: str = "doc_id", joiner: str = " ",
                     text_out: str = "text") -> DataFrame:
    """Paragraph-level (intra-document-unit) dedup: across the WHOLE
    corpus, each distinct paragraph survives only at its first
    occurrence in ``(id, position)`` order; every document is then
    rebuilt from its surviving paragraphs in original order — the
    boilerplate-removal stage of CCNet (Wenzek et al. 2020) and
    RefinedWeb (Penedo et al. 2023), where repeated headers, nav bars
    and license blurbs are struck from every copy but the first.

    Shape, built for the 100 TB path:
      1. ``posexplode`` paragraphs; key each by the 128-bit content
         hash (:func:`_content_key` — birthday-safe at corpus scale).
      2. ``groupBy(hash).agg(min(struct(id, pos)))`` — the owner per
         paragraph.  min() is map-side combinable, so a boilerplate
         paragraph on 10M pages collapses to one row per partition
         before the shuffle (no hot-key sort, unlike a window over
         the paragraph key).
      3. join occurrences back on the hash (AQE handles residual
         skew), keep only the owning occurrence.
      4. rebuild per doc: collect_list + array_sort on pos, one
         shuffle keyed by doc — per-group state is the document's own
         paragraphs, bounded by document size, never corpus-wide.
    A left join from the input ids keeps fully-boilerplate documents
    as empty rows (n_kept = 0) instead of dropping them silently.

    Returns ``(id, text_out, n_paras, n_kept)``.  Exact-oracle
    verified end-to-end by q73; the DuckDB equivalent groups on
    paragraph CONTENT — identical modulo 128-bit collisions.
    """
    occ = df.select(
        F.col(id_col),
        F.posexplode(F.col(paras_col)).alias("pos", "para"),
    ).withColumn("_h", F.xxhash64(F.col("para"))) \
     .withColumn("_h2", F.xxhash64(F.lit("outrank-lane2"), F.col("para")))
    owners = occ.groupBy("_h", "_h2").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
    )
    kept = (
        occ.join(owners, ["_h", "_h2"])
        .where((F.col(f"_first.{id_col}") == F.col(id_col))
               & (F.col("_first.pos") == F.col("pos")))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("para"))),
                ),
                lambda s: s.getField("para"),
            ),
        ).alias(text_out),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(
        F.col(id_col), F.size(F.col(paras_col)).alias("n_paras"),
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(text_out), F.lit("")).alias(text_out),
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def containment_join(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3,
                     threshold: float = 0.5,
                     max_df: int | None = None) -> DataFrame:
    """Directional shingle containment C(A in B) = |S(A) ∩ S(B)| /
    |S(A)| over distinct token ``n``-gram shingles: all ORDERED pairs
    (a, b), a != b, with containment >= ``threshold`` — the
    near-SUPERSET detector (Broder 1997's containment, the asymmetric
    companion of resemblance/Jaccard).  Jaccard misses exactly the
    pairs this catches: a short document wholly quoted inside a long
    one scores near-zero Jaccard but containment 1.0, which is why
    curation pipelines (RefinedWeb §3.3's "contained" duplicates)
    test both directions.

    Scale shape — the q14/q85 discipline, never corpus², and the
    corpus-wide shingle explode is STRUCTURALLY single-pass (no
    reliance on Catalyst exchange reuse, which a plan audit showed
    does NOT fire for the two-sided self-join formulation):

    1. shingles are one JVM expression (``shingle_df``), distinct per
       doc, so a repeated phrase inside one doc never multiplies
       pair rows;
    2. per-doc shingle counts (the containment denominators) are a
       zero-shuffle ``size(array)`` projection over the doc rows —
       they never touch the exploded relation;
    3. ONE ``groupBy(shingle).collect_list(id)`` shuffle replaces the
       self-join: singleton shingles (df == 1) die right after it —
       they cannot intersect — and co-occurring id pairs stream out
       of each surviving list via ``posexplode`` + a tail ``slice``
       explode, so no task ever materializes a shingle's k²/2 pairs
       at once (peak per-row state is the id list itself, 8·k
       bytes), and the corpus is exploded exactly once;
    4. pairs are canonicalized (least, greatest) — collect_list
       order is partition-dependent, the canonical form is not —
       then one map-side-combinable ``groupBy`` counts shared
       shingles; both directions are emitted from that ONE unordered
       pair table.

    Zipf caveat: a shingle shared by k docs still streams ~k²/2
    pair rows — identical to q14's exact-join cost.  ``max_df``
    (document-frequency cap) drops hotter shingles from pair
    generation entirely — boilerplate runs and stopword shingles at
    web scale carry no containment signal but dominate the pair
    count; route capped heads through ``minhash_lsh_candidates``
    when they matter.  Default None = exact (the q96 oracle shape).
    Exactness of the threshold cut needs no float care: containment
    compares as ``shared * 1.0 / size`` with a >= on a ratio of
    small ints, reproduced verbatim by the q96 oracle.

    Returns ``(id_a, id_b, shared, size_a, containment)`` — "id_a is
    contained in id_b to degree containment".
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_df is not None and max_df < 2:
        raise ValueError(f"max_df must be >= 2, got {max_df}")
    sh = shingle_df(df, text_col, id_col, n)
    # containment denominators are per-doc distinct-shingle COUNTS —
    # a zero-shuffle size(array) projection over the doc rows, NOT a
    # groupBy(id) over the exploded relation (that shape re-ran the
    # whole corpus explode a second time and paid a 15M-row shuffle
    # for numbers each doc row already knows)
    sizes = df.select(
        F.col(id_col),
        F.size(F.expr(shingle_array_expr(text_col, n))).alias("__sz"),
    )
    lists = sh.groupBy("shingle").agg(
        F.collect_list(id_col).alias("__ids"),
    ).where(F.size("__ids") >= 2)
    if max_df is not None:
        lists = lists.where(F.size("__ids") <= max_df)
    # stream co-occurring pairs: k rows per shingle, each carrying the
    # id list once; the tail slice explodes lazily inside the stage
    pairs = (
        lists.select(
            F.col("__ids"),
            F.posexplode("__ids").alias("__i", "__x"),
        )
        .select(
            F.col("__x"),
            F.explode(
                F.slice(
                    F.col("__ids"),
                    F.col("__i") + F.lit(2),
                    F.size("__ids"),
                ),
            ).alias("__y"),
        )
        .select(
            F.least("__x", "__y").alias("__ia"),
            F.greatest("__x", "__y").alias("__ib"),
        )
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # both directions from ONE pass over the pair table: a union of
    # two selects duplicates the entire pair-generation lineage in the
    # physical plan (the corpus shingle explode ran twice — plan
    # audit: 3 parquet scans), whereas a 2-element array explode keeps
    # a single pipeline and merely doubles the (already aggregated)
    # pair rows
    both = pairs.select(
        F.explode(F.array(
            F.struct(F.col("__ia").alias("id_a"),
                     F.col("__ib").alias("id_b")),
            F.struct(F.col("__ib").alias("id_a"),
                     F.col("__ia").alias("id_b")),
        )).alias("__p"),
        "shared",
    ).select("__p.id_a", "__p.id_b", "shared")
    return (
        both.join(
            sizes.select(F.col(id_col).alias("id_a"),
                         F.col("__sz").alias("size_a")),
            "id_a",
        )
        .withColumn(
            "containment",
            F.col("shared") * F.lit(1.0) / F.col("size_a"),
        )
        .where(F.col("containment") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "shared", "size_a", "containment")
    )


def minhash_delta_candidates(new_df: DataFrame, index_sig: DataFrame,
                             text_col: str = "text",
                             id_col: str = "doc_id", n: int = 3,
                             k: int = 128, bands: int = 32,
                             verify_threshold: float | None = None,
                             index_text: DataFrame | None = None,
                             ) -> DataFrame:
    """Incremental near-dup check: NEW documents against a stored
    MinHash signature index, without touching the existing corpus's
    text.

    A continuously-crawled corpus cannot re-run corpus-wide LSH per
    batch — O(corpus) work for an O(batch) question.  Instead the
    pipeline persists :func:`minhash_signatures` output once
    (``id_col, mh0..mh{k-1}``; ~1 KB/doc, shingle-order independent)
    and each new batch: (1) signs ONLY the batch, (2) bands both
    sides with the same ``xxhash64`` band keys, (3) equi-joins
    new -> index on ``(band, bh)``.  Returns ``(id_new, id_index,
    minhash_sim)`` — the slot-match similarity estimate — filtered to
    ``>= verify_threshold`` when set.  When ``index_text`` (``id_col,
    text_col``) is also given, candidates are re-verified with EXACT
    shingle Jaccard via :func:`ngram_jaccard_pairs`'s candidate-
    bounded path and ``jaccard`` replaces the estimate.

    Self-pairs within the batch are NOT emitted (that's the ordinary
    :func:`minhash_lsh_candidates` over the batch); ids present in
    both inputs match themselves trivially and are filtered.

    Scale shape (100 TB index, GB batch): the index is banded once
    per batch — a column-pruned scan of the signature table (never
    the corpus text) — and the join shuffles the index by ``(band,
    bh)``; persist the banded index bucketed on that key and the
    per-batch cost drops to a co-located join against the small,
    broadcastable batch side.  Signature compute is O(batch).
    Band keys depend only on (k, bands, shingle n) — the index is
    reusable across batches as long as those match (asserted by
    column count).
    """
    rows = k // bands
    sig_cols = [f"mh{i}" for i in range(k)]
    missing = [c for c in sig_cols if c not in index_sig.columns]
    if missing:
        raise ValueError(
            f"index_sig lacks {len(missing)} of {k} signature "
            f"columns (first missing: {missing[0]}) — was the index "
            f"built with a different k?")

    def banded(sig: DataFrame, out_id: str) -> DataFrame:
        band_cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh{b * rows + r}") for r in range(rows)],
                ).alias("bh"),
            )
            for b in range(bands)
        ]
        return sig.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array(*band_cols)).alias("bb"),
        ).select(out_id, F.col("bb.band").alias("band"),
                 F.col("bb.bh").alias("bh"))

    # localCheckpoint (NOT .cache()): the batch signatures are read
    # twice (banding + the slot-match join), but a CacheManager entry
    # would outlive this call — for an operator designed to run every
    # crawl batch that is a permanent executor-storage leak.  Local-
    # checkpoint blocks are released by the ContextCleaner once the
    # returned DataFrame is dropped, so each batch cleans up after
    # itself without the caller owning an unpersist.
    sig_new = minhash_signatures(new_df, text_col, id_col, n, k) \
        .localCheckpoint(eager=True)
    cand = (
        banded(sig_new, "id_new")
        .join(banded(index_sig, "id_index"), ["band", "bh"])
        .filter(F.col("id_new") != F.col("id_index"))
        .select("id_new", "id_index")
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(k)
    )
    est = (
        cand
        .join(sig_new.select(
            F.col(id_col).alias("id_new"),
            *[F.col(c).alias(f"a{i}") for i, c in enumerate(sig_cols)],
        ), "id_new")
        .join(index_sig.select(
            F.col(id_col).alias("id_index"),
            *[F.col(c).alias(f"b{i}") for i, c in enumerate(sig_cols)],
        ), "id_index")
        .withColumn("minhash_sim", matches / F.lit(float(k)))
        .select("id_new", "id_index", "minhash_sim")
    )
    if verify_threshold is not None and index_text is None:
        return est.filter(F.col("minhash_sim") >= verify_threshold)
    if index_text is None:
        return est
    texts = (
        new_df.select(id_col, text_col)
        .unionByName(index_text.select(id_col, text_col))
        .distinct()
    )
    pairs = est.select(F.col("id_new").alias("id_a"),
                       F.col("id_index").alias("id_b"))
    exact = ngram_jaccard_pairs(
        texts, text_col, id_col, n, candidate_pairs=pairs,
    ).select(F.col("id_a").alias("id_new"),
             F.col("id_b").alias("id_index"), "jaccard")
    if verify_threshold is not None:
        exact = exact.filter(F.col("jaccard") >= verify_threshold)
    return exact


def sorted_neighborhood_pairs(df: DataFrame, key_col: str,
                              id_col: str = "doc_id",
                              window: int = 3,
                              num_partitions: int | None = None,
                              ) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): sort
    the corpus by a blocking key and emit every pair within
    ``window`` positions — the record-linkage candidate generator for
    TYPO-shaped duplicates that hash blocking scatters (LSH needs
    shared shingles; a sort key like a normalized name puts
    near-spellings adjacent).  Returns ``(id_a, id_b, key_a, key_b,
    gap)`` with gap in [1, window]; output size is exactly
    ``window·n − window(window+1)/2`` — LINEAR in the corpus, the
    method's defining guarantee.  Null keys are excluded (they would
    all sort adjacent and pair meaninglessly).

    Scale shape (100 TB): the global sort is the two-pass
    range-partition rank (the roc_auc/ks_drift discipline — NEVER a
    single-partition window): range-partition + in-partition sort by
    (key, id), pass 1 ships one count per partition whose cumulative
    offsets make every local index global, pass 2 stamps ranks
    independently per partition.  Neighbor pairs come from an explode
    of the window offsets + ONE equi-join on the stamped rank —
    skew-free by construction (ranks are unique).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    import pandas as pd

    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    data = (
        df.select(F.col(id_col).alias("__id"),
                  F.col(key_col).cast("string").alias("__k"))
        .where(F.col("__k").isNotNull())
        .repartitionByRange(n_part, "__k", "__id")
        .sortWithinPartitions("__k", "__id")
        .persist()
    )
    try:
        def counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            n = sum(len(p) for p in batches)
            if n:
                yield pd.DataFrame({"pid": [pid], "n": [n]})

        meta = data.mapInPandas(counts, "pid int, n long") \
            .toPandas().sort_values("pid")
        if meta.empty:
            return spark.createDataFrame(
                [], "id_a long, id_b long, key_a string, "
                    "key_b string, gap int")
        meta["off"] = meta["n"].cumsum() - meta["n"]
        offsets = {int(r.pid): int(r.off)
                   for r in meta.itertuples(index=False)}

        def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            base = offsets.get(pid, 0)
            seen = 0
            for pdf in batches:
                pdf = pdf.copy()
                pdf["rank"] = range(base + seen, base + seen + len(pdf))
                seen += len(pdf)
                yield pdf

        ranked = data.mapInPandas(
            stamp, "__id long, __k string, rank long",
        ).localCheckpoint(eager=True)
    finally:
        data.unpersist()
    right = ranked.select(
        F.col("rank").alias("__r2"),
        F.col("__id").alias("id_b"), F.col("__k").alias("key_b"))
    return (
        ranked.withColumn(
            "gap", F.explode(F.array(
                *[F.lit(k) for k in range(1, window + 1)])))
        .select(
            F.col("__id").alias("id_a"), F.col("__k").alias("key_a"),
            (F.col("rank") + F.col("gap")).alias("__r2"), "gap")
        .join(right, "__r2")
        .select("id_a", "id_b", "key_a", "key_b", "gap")
    )


def fellegi_sunter_em(pairs: DataFrame, agreement_cols: Sequence[str],
                      iters: int = 2, init_m: float = 0.9,
                      init_u: float = 0.1, init_p: float = 0.2,
                      round_to: int = 6) -> DataFrame:
    """Fellegi-Sunter record-linkage parameter estimation via EM
    (Winkler's classic unsupervised fit): from candidate pairs with
    binary field-agreement indicators, estimate per-field m
    (P(agree | match)) and u (P(agree | non-match)) and the match/
    non-match log2 weights that score every future pair.  This is the
    decision layer on top of the blocking operators
    (:func:`sorted_neighborhood_pairs`, LSH candidates): blocking
    proposes, Fellegi-Sunter weighs.

    Returns one row per field: ``(field, m, u, w_agree, w_disagree)``
    with ``w_agree = log2(m/u)``, ``w_disagree = log2((1-m)/(1-u))``,
    rounded; plus a final ``__prior__`` row carrying the fitted match
    prior p in the ``m`` column (u/w columns null).

    Scale shape: the ONLY distributed work is one map-side-combinable
    groupBy over the agreement vector — at most ``2^k`` pattern rows
    for k fields regardless of pair count (NULL agreement values
    count as disagreement, conservatively).  EM then iterates on that
    <= 2^k-row table driver-side with plain floats: a 10^10-pair
    candidate set and a 10^3-pair one cost the same EM.  Iteration
    count is FIXED (``iters``), so the whole fit is deterministic and
    the q136 oracle replays it as unrolled SQL stages (the q84/q125
    fixed-iteration discipline).  Conditional independence across
    fields is the standard FS assumption; correlated fields bias m/u
    like they do every FS implementation.
    """
    k = len(agreement_cols)
    if k == 0:
        raise ValueError("agreement_cols must be non-empty")
    if not (1 <= iters <= 50):
        raise ValueError(f"iters must be in [1, 50], got {iters}")
    for c in agreement_cols:
        if c not in pairs.columns:
            raise ValueError(f"unknown column {c!r}")
    gs = [F.coalesce(F.col(c).cast("int"), F.lit(0)).alias(f"g{j}")
          for j, c in enumerate(agreement_cols)]
    pat = (
        pairs.select(*gs)
        .groupBy(*[f"g{j}" for j in range(k)])
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    patterns = sorted(
        (tuple(int(r[f"g{j}"]) for j in range(k)), int(r["c"]))
        for r in pat
    )
    if not patterns:
        raise ValueError("pairs is empty — nothing to fit")
    eps = 1e-9
    clamp = lambda x: min(max(x, eps), 1.0 - eps)  # noqa: E731
    m = [clamp(float(init_m))] * k
    u = [clamp(float(init_u))] * k
    p = clamp(float(init_p))
    total = float(sum(c for _, c in patterns))
    for _ in range(iters):
        s_post = 0.0
        s_mg = [0.0] * k
        s_ug = [0.0] * k
        for g, c in patterns:
            wm = p
            wu = 1.0 - p
            for j in range(k):
                wm *= m[j] if g[j] else (1.0 - m[j])
                wu *= u[j] if g[j] else (1.0 - u[j])
            den = wm + wu
            # clamped parameters keep wm, wu > 0, but the k-fold
            # product can underflow to exactly 0.0 for large k —
            # fall back to the prior rather than divide by zero
            post = wm / den if den > 0.0 else p
            s_post += c * post
            for j in range(k):
                if g[j]:
                    s_mg[j] += c * post
                    s_ug[j] += c * (1.0 - post)
        # clamp EVERY iteration, not just before output: a degenerate
        # agreement pattern can drive p or m[j]/u[j] to exactly 0/1,
        # which would make wm + wu == 0 on the NEXT iteration
        p = clamp(s_post / total)
        m = [clamp(s_mg[j] / s_post) if s_post > 0.0 else m[j]
             for j in range(k)]
        u = [clamp(s_ug[j] / (total - s_post))
             if total > s_post else u[j] for j in range(k)]
    rows = []
    for j, c in enumerate(agreement_cols):
        mj, uj = clamp(m[j]), clamp(u[j])
        rows.append((
            c, round(mj, round_to), round(uj, round_to),
            round(math.log2(mj / uj), round_to),
            round(math.log2((1.0 - mj) / (1.0 - uj)), round_to),
        ))
    rows.append(("__prior__", round(clamp(p), round_to),
                 None, None, None))
    return pairs.sparkSession.createDataFrame(
        rows, "field string, m double, u double, "
              "w_agree double, w_disagree double",
    )
