"""Product quantization (PQ) for embedding columns: compress each
``d``-dim vector to ``m`` one-byte codes, then answer top-k similarity
queries from the codes alone via asymmetric distance computation (ADC),
reranking only a bounded candidate pool exactly (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Why this exists (100 TB story): at 10^12 documents a 64-dim float
embedding column is ~256 TB — it cannot be rescanned per query and no
executor can hold a shard of raw vectors hot.  PQ codes at m=8 are
8 bytes/row (32x smaller); the ADC scan streams codes through a
lookup-table ``np.take``+sum (no float algebra per dimension), each
task forwards only its local top candidates, and the full-precision
vectors are touched just once per query for the final exact rerank of
``rerank_factor * k`` rows.  Composes with IVF (similarity.ivf_topk)
exactly like FAISS IVF-PQ: coarse cells bound which codes are scanned,
PQ bounds the bytes per scanned row.

The reference engine has no vector search; this extends the
LLM-pipeline family (SURVEY §2.9b) beside brute/LSH/IVF top-k.

Scale/plan notes:
* codebooks are tiny (m * 2^nbits * d/m floats — 64 KB at the
  defaults) and ride to executors inside the Arrow-batch closure, the
  same broadcast shape as the IVF centroids;
* encoding is one ``mapInPandas`` pass, vectorized argmin per
  subspace, no shuffle;
* the ADC scan emits at most ``pool`` rows per (Arrow batch, query) —
  the shuffle into the global per-query top-``pool`` window is bounded
  by batches x queries x pool, never by the corpus;
* vectors are L2-normalized before encoding so the ADC inner product
  approximates cosine; the rerank recomputes EXACT cosine on raw
  vectors, so approximation affects only candidate selection.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["PQCodebook", "pq_fit", "pq_encode", "pq_topk"]


class PQCodebook:
    """Per-subspace centroid tables: ``centroids[j]`` is the
    ``(ksub, dsub)`` table for subspace ``j``; codes index into it."""

    def __init__(self, centroids: np.ndarray):
        centroids = np.asarray(centroids, dtype=np.float64)
        if centroids.ndim != 3:
            raise ValueError(
                f"centroids must be (m, ksub, dsub), got {centroids.shape}",
            )
        self.centroids = centroids

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ksub(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def to_bytes(self) -> bytes:
        """Checkpointable blob (same contract as the sketch family)."""
        head = np.array(self.centroids.shape, dtype=np.int64).tobytes()
        return head + self.centroids.astype(np.float64).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PQCodebook":
        m, ksub, dsub = np.frombuffer(blob[:24], dtype=np.int64)
        cents = np.frombuffer(blob[24:], dtype=np.float64).reshape(
            int(m), int(ksub), int(dsub),
        )
        return cls(cents.copy())


def _normalize(vecs: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs / np.maximum(norms, 1e-12)


def pq_fit(df: DataFrame, vec_col: str = "embedding",
           id_col: str = "vec_id", m: int = 8, nbits: int = 8,
           sample_size: int = 8192, iters: int = 10,
           seed: int = 20141025) -> PQCodebook:
    """Fit ``m`` per-subspace codebooks of ``2**nbits`` centroids each
    on a deterministic driver sample (xxhash64 order — the same
    sample recipe as ``ivf_topk``; codebook training needs thousands
    of vectors, not the corpus).  Vectors are L2-normalized first so
    downstream ADC scores approximate cosine."""
    if m <= 0 or nbits <= 0 or nbits > 16:
        raise ValueError(f"need m > 0 and 0 < nbits <= 16, got {m=} {nbits=}")
    sample = np.stack(
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_size)
        .toPandas()[vec_col]
        .to_numpy(),
    ).astype(np.float64)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    sample = _normalize(sample)
    dsub = dim // m
    ksub = min(1 << nbits, len(sample))
    rng = np.random.Generator(np.random.PCG64(seed))
    sub = sample.reshape(len(sample), m, dsub)
    centroids = np.empty((m, ksub, dsub))
    for j in range(m):
        x = sub[:, j, :]
        cents = x[rng.choice(len(x), ksub, replace=False)]
        for _ in range(iters):
            # argmin ||x - c||^2 == argmax (x.c - ||c||^2 / 2)
            score = x @ cents.T - 0.5 * (cents * cents).sum(axis=1)
            assign = score.argmax(axis=1)
            for c in range(ksub):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        centroids[j] = cents
    return PQCodebook(centroids)


def pq_encode(df: DataFrame, codebook: PQCodebook,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """``(id, pq_code array<int>)`` — one zero-shuffle ``mapInPandas``
    pass; each row's storage drops from ``dim`` floats to ``m`` small
    ints.  Null vectors are skipped (no code row — a vector that
    cannot be searched must not pretend to be)."""
    cents = codebook.centroids
    m, dsub = codebook.m, codebook.dsub

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            vecs = _normalize(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64),
            )
            sub = vecs.reshape(len(vecs), m, dsub)
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                score = (sub[:, j, :] @ cents[j].T
                         - 0.5 * (cents[j] * cents[j]).sum(axis=1))
                codes[:, j] = score.argmax(axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(),
                "pq_code": list(codes),
            })

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema="id long, pq_code array<int>",
    ).withColumnRenamed("id", id_col)


def pq_topk(df: DataFrame, queries: DataFrame, k: int = 10,
            codebook: PQCodebook | None = None,
            codes: DataFrame | None = None,
            vec_col: str = "embedding", id_col: str = "vec_id",
            m: int = 8, nbits: int = 8, rerank_factor: int = 10,
            seed: int = 20141025) -> DataFrame:
    """Top-k cosine neighbors via PQ-ADC candidate generation + exact
    rerank.  ``queries``: (query_id, qv array<double>), broadcast-
    small like the other top-k variants.

    Stages: (1) fit-or-reuse codebook, (2) encode (or reuse ``codes``
    — at scale the codes are written once next to the corpus and this
    argument is the hot path), (3) ADC scan: per Arrow batch build the
    per-query LUT ``lut[j, c] = q_j . centroid[j, c]`` once, score
    every code row with ``np.take`` + sum, emit only the batch-local
    top ``rerank_factor * k`` per query, (4) global per-query top-pool
    window over those bounded emissions, (5) exact cosine rerank of
    the pool against raw vectors — identical scoring/tie-break
    (desc cosine, asc id) to ``brute_force_topk``, so with a generous
    pool the two agree row-for-row."""
    if rerank_factor < 1:
        raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
    if codebook is None:
        codebook = pq_fit(df, vec_col=vec_col, id_col=id_col, m=m,
                          nbits=nbits, seed=seed)
    if codes is None:
        codes = pq_encode(df, codebook, vec_col=vec_col, id_col=id_col)
    pool = rerank_factor * k
    cents = codebook.centroids
    mm, dsub = codebook.m, codebook.dsub

    qpdf = queries.toPandas()
    qids = qpdf["query_id"].to_numpy()
    qvecs = _normalize(np.stack(qpdf["qv"].to_numpy()).astype(np.float64))
    # luts[q, j, c] = qsub . centroid — built ONCE on the driver,
    # shipped in the closure (n_queries * m * ksub doubles, tiny)
    qsub = qvecs.reshape(len(qvecs), mm, dsub)
    luts = np.einsum("qjd,jcd->qjc", qsub, cents)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            code_mat = np.stack(pdf["pq_code"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids)):
                # approx dot: sum_j lut[qi, j, code[:, j]]
                approx = np.take_along_axis(
                    luts[qi], code_mat.T, axis=1,
                ).sum(axis=0)
                take = min(pool, len(approx))
                top = np.argpartition(-approx, take - 1)[:take]
                out_q.append(np.full(take, qids[qi]))
                out_id.append(ids[top])
                out_s.append(approx[top])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_id),
                "approx": np.concatenate(out_s),
            })

    local_tops = codes.mapInPandas(
        adc, schema=f"query_id long, {id_col} long, approx double",
    )
    w_pool = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.col(id_col),
    )
    cand = (
        local_tops.withColumn("_pr", F.row_number().over(w_pool))
        .filter(F.col("_pr") <= pool)
        .select("query_id", id_col)
    )
    emb = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x),
    )
    # The candidate set is hard-bounded at queries x pool rows by the
    # row_number filter above, so it is ALWAYS broadcastable — hint it
    # explicitly: post-window relations carry no size estimate, and
    # without the hint the planner's only alternatives at corpus scale
    # are shuffling the full vector table into a sort-merge join or
    # (at toy sizes) broadcasting the CORPUS side, both wrong at 100 TB.
    # With the hint the raw-vector scan flows straight into the build-
    # side-right BHJ — zero Exchange on the corpus in the rerank.
    scored = (
        emb.join(
            F.broadcast(cand.join(F.broadcast(queries), "query_id")),
            id_col,
        )
        .withColumn("cosine", dot / (norm(F.col("qv")) * norm(F.col("v"))))
        .select("query_id", id_col, "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col(id_col),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
