"""Deterministic sampling operators for training-mix construction.

A large-scale pipeline assembles its training mix by quota: "k
documents per language / source / domain", reproducibly, regardless of
row order, partitioning, or cluster size.  :func:`stratified_sample`
does that with a portable salted hash as the pseudo-random order (the
same md5-derived key as the deterministic subsampling filter, so DuckDB
can replay the exact selection as a SQL oracle).

The reference engine subsamples only by row position
(``core_ranking.py:641-642`` every-n-th-line); per-stratum quotas have
no counterpart there — this is part of the LLM-data-pipeline family.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["stratified_sample", "weighted_sample", "reservoir_sample",
           "priority_sample", "temperature_rebalance", "dsir_logratio",
           "mixture_sample", "hash_split", "bootstrap_replicate_stats",
           "bootstrap_mean_ci", "negative_samples", "temporal_split",
           "POISSON1_CDF"]

_KEY_SPACE = 1 << 32  # md5-prefix keys are uniform in [0, 2^32)


def _md5_key(id_col: str, seed: str = ""):
    """Uniform 32-bit key from any id, identical in Spark and DuckDB:
    first 8 hex chars of md5(seed || id-as-string) parsed as a long.
    The single implementation of the engine-portable acceptance key —
    keep any change in sync with the q51/q59/q60/q66 DuckDB oracles
    (q66's packing order key replicates it too)."""
    keyed = (F.concat(F.lit(seed), F.col(id_col).cast("string"))
             if seed else F.col(id_col).cast("string"))
    return F.conv(
        F.substring(F.md5(keyed), 1, 8), 16, 10,
    ).cast("long")


def _md5_uniform(id_col: str, seed: str):
    """md5-prefix key scaled to a [0, 1) double."""
    return _md5_key(id_col, seed).cast("double") / F.lit(float(_KEY_SPACE))


def _reject_internal_collisions(df: DataFrame, names: tuple[str, ...],
                                fn: str) -> None:
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"{fn} uses internal column(s) {clash} which already exist "
            "in the input — rename them first",
        )


def stratified_sample(df: DataFrame, strata_col: str, k: int,
                      id_col: str = "doc_id",
                      keep_frac: float | None = None) -> DataFrame:
    """The ``k`` rows with the smallest salted hash of ``id_col`` per
    stratum — a reproducible, order-free quota sample (ties broken by
    id, so the result is a pure function of the data).

    Scale shape: an exact quota needs a per-stratum rank, i.e. one
    window sort *within each stratum*.  At 100 TB that sort must not
    touch the full corpus, so ``keep_frac`` installs a hash-threshold
    prefilter (``key < keep_frac * 2^32``) ahead of the window — the
    same pushed-filter pattern as the langid fit sample.  Because the
    sample IS the k smallest keys, any threshold that keeps >= k rows
    of a stratum preserves that stratum's sample bitwise; strata the
    prefilter left deficient (possible for tiny or unlucky strata) are
    detected with one aggregate and re-pooled from the unfiltered rows
    of just those strata, so the output is IDENTICAL for every
    ``keep_frac`` — the knob trades scan width for sort width only.
    Size it so expected survivors per stratum ~ 10k on real data
    (e.g. quota 1k over 1e9-row strata -> keep_frac 1e-5).
    """
    clash = {"_key", "_rn"} & set(df.columns)
    if clash:
        raise ValueError(
            f"column names collide with stratified_sample internals: "
            f"{sorted(clash)}; rename them first",
        )
    keyed = df.withColumn("_key", _md5_key(id_col))
    pool = keyed
    if keep_frac is not None:
        thresh = int(keep_frac * _KEY_SPACE)
        surv = keyed.filter(F.col("_key") < thresh)
        ok = (
            surv.groupBy(strata_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= k)
            .select(strata_col)
        )
        # strata fully covered by the prefilter use the thin pool;
        # deficient ones (incl. strata with zero survivors) fall back
        # to their unfiltered rows — exactness is never at stake
        pool = surv.join(ok, strata_col, "left_semi").unionByName(
            keyed.join(ok, strata_col, "left_anti"),
        )
    w = Window.partitionBy(strata_col).orderBy("_key", id_col)
    return (
        pool.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_key", "_rn")
    )


def weighted_sample(df: DataFrame, weight_col: str, frac: float,
                    id_col: str = "doc_id",
                    seed: str = "ws1") -> DataFrame:
    """Quality-weighted deterministic sampling (the DSIR/temperature-
    resampling shape): keep each row with probability
    ``min(1, frac * w / mean(w))`` so the expected kept fraction is
    ~``frac`` while higher-weight rows are over-represented.

    The acceptance uniform is the md5-prefix key of ``(seed, id)`` —
    engine-portable (md5 is bit-identical everywhere, unlike
    xxhash64), order-free, and reproducible at any parallelism.  The
    only global state is one broadcast mean — a 1-row aggregate, so
    the plan stays a scan + filter at 100 TB.  Raise ``frac`` toward
    the cap-aware effective fraction if many weights saturate
    ``min(1, .)``."""
    _reject_internal_collisions(df, ("__mean_w",), "weighted_sample")
    stats = df.agg(F.avg(F.col(weight_col)).alias("__mean_w"))
    u = _md5_uniform(id_col, seed)
    keep_p = F.least(
        F.lit(1.0), F.lit(float(frac)) * F.col(weight_col)
        / F.col("__mean_w"),
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .where(u < keep_p)
        .drop("__mean_w")
    )


def mixture_sample(df: DataFrame, source_col: str,
                   target_weights: dict, total_tokens: int,
                   token_col: str, id_col: str = "doc_id",
                   seed: str = "mix1") -> DataFrame:
    """Training-mix assembly by source proportions under a token
    budget: "60% web, 30% books, 10% code, 500B tokens total".  Each
    source ``s`` gets a token budget ``total_tokens * w_s / sum(w)``;
    its sampling rate is ``min(1, budget_s / available_s)`` where
    ``available_s = sum(token_col)`` over that source's rows; rows are
    kept when the engine-portable md5-prefix uniform of ``(seed, id)``
    falls under the rate — deterministic, order-free, replayable as a
    SQL oracle (the :func:`weighted_sample` acceptance key).

    Semantics notes: rate-threshold sampling hits each budget in
    EXPECTATION (per-source token sums concentrate tightly at corpus
    scale); a source whose available tokens are under budget is kept
    whole (rate caps at 1 — its shortfall is NOT redistributed, so
    realized proportions are transparent, never silently skewed);
    sources absent from ``target_weights`` are dropped.

    Scale shape: one map-side-combinable ``groupBy(source)`` token
    sum whose result (one row per MIXTURE SOURCE — a config-sized
    list, never corpus-sized) is collected to compute rates, then one
    scan + JVM md5 filter with the rates inlined as a literal map.
    No window, no join, no Python.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if any(w < 0 for w in target_weights.values()):
        raise ValueError("target weights must be >= 0")
    wsum = float(sum(target_weights.values()))
    if wsum <= 0 or total_tokens <= 0:
        raise ValueError("need positive total weight and token budget")
    avail = {
        r["s"]: float(r["toks"])
        for r in (
            df.where(F.col(source_col).isin(list(target_weights)))
            .groupBy(F.col(source_col).alias("s"))
            .agg(F.sum(F.col(token_col).cast("double")).alias("toks"))
            .collect()
        )
        # all-null token column sums to null -> treat as zero tokens
        if r["toks"] is not None
    }
    rates = {
        s: min(1.0, (float(total_tokens) * w / wsum) / avail[s])
        for s, w in target_weights.items()
        if avail.get(s)  # absent or zero-token sources: nothing to keep
    }
    if not rates:
        return df.where(F.lit(False))
    rate_map = F.create_map(
        *[x for s, r in sorted(rates.items())
          for x in (F.lit(s), F.lit(r))],
    )
    u = _md5_uniform(id_col, seed)
    # null rate (source not in the mix) compares false -> dropped
    return df.where(u < rate_map[F.col(source_col)])


def dsir_logratio(docs: DataFrame, target_col,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int | None = None,
                  alpha: float = 1.0) -> DataFrame:
    """DSIR importance weights: per-document log-likelihood ratio of a
    bag-of-bigrams model fit on a TARGET subset vs the RAW corpus
    (Xie, Santurkar, Ma, Liang — "Data Selection for Language Models
    via Importance Resampling", NeurIPS 2023).  The returned
    ``logratio`` column is exactly the weight :func:`weighted_sample`
    consumes, so ``weighted_sample(dsir_logratio(docs, pred), ...)``
    is the full DSIR select-then-resample pipeline.

    ``target_col`` is a boolean Column marking in-domain rows (e.g.
    ``F.col("lang") == "en"`` or a quality-classifier verdict).  Per
    doc: ``Σ_b  ln p̂_target(b) − ln p̂_raw(b)`` over its bigram
    OCCURRENCES (repeats count), each p̂ Laplace-smoothed with
    ``alpha`` over the raw corpus' bigram vocabulary — smoothing is
    what keeps target-unseen bigrams finite, where the paper's
    hashed-MLE relies on bucket collisions to the same effect.

    Scale shape: bigrams are built JVM-side (``transform`` over the
    token array — no Python), exploded once, counted once with a
    single grouped agg producing BOTH distributions (raw count +
    conditional target count — the corpus is never scanned twice),
    then joined back and re-aggregated per doc.  ``num_buckets``
    hashes bigrams into a bounded feature space (the paper's
    construction): the per-feature table becomes ≤ ``num_buckets``
    rows, the join-back broadcastable, and the explode shuffle narrow
    (int keys, not strings).  ``num_buckets=None`` keeps exact bigram
    identity — the engine-portable mode the q83 DuckDB oracle replays.
    Docs with < 2 tokens get ``n_features = 0, logratio = 0.0``.
    """
    _reject_internal_collisions(
        docs, ("__feat", "__is_t", "__toks", "__raw_n", "__tgt_n",
               "__lr", "__R", "__T", "__V", "n_features", "logratio"),
        "dsir_logratio")
    if num_buckets is not None and num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive or None, "
                         f"got {num_buckets}")
    # slice-then-zip, NOT sequence(1, n-1): Spark's sequence(1, 0)
    # (a 1-token doc) is the DESCENDING [1, 0], and ANSI element_at
    # then faults on index 2 — slice(a, 1, 0) is the empty array.
    # The token array is projected ONCE before the lambda: transform
    # is CodegenFallback (interpreted per element), so an inlined
    # split would re-split the whole document per bigram — O(n^2)
    bigrams = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
        "(x, j) -> concat(x, ' ', element_at(__toks, j + 2)))",
    )
    feat = (F.pmod(F.xxhash64(F.col("__feat")), F.lit(num_buckets))
            if num_buckets is not None else F.col("__feat"))
    ex = (
        docs.select(
            F.col(id_col), target_col.alias("__is_t"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .select(id_col, "__is_t", F.explode(bigrams).alias("__feat"))
        .withColumn("__feat", feat)
    )
    counts = ex.groupBy("__feat").agg(
        F.count(F.lit(1)).alias("__raw_n"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__tgt_n"),
    )
    tot = counts.agg(
        F.sum("__raw_n").alias("__R"), F.sum("__tgt_n").alias("__T"),
        F.count(F.lit(1)).alias("__V"),
    )
    lr = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "__feat",
            (
                F.log((F.col("__tgt_n") + alpha)
                      / (F.col("__T") + alpha * F.col("__V")))
                - F.log((F.col("__raw_n") + alpha)
                        / (F.col("__R") + alpha * F.col("__V")))
            ).alias("__lr"),
        )
    )
    if num_buckets is not None and num_buckets <= (1 << 21):
        lr = F.broadcast(lr)
    scored = (
        ex.join(lr, "__feat")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_features"),
             F.sum("__lr").alias("logratio"))
    )
    return (
        docs.join(scored, id_col, "left")
        .withColumn("n_features", F.coalesce("n_features", F.lit(0)))
        .withColumn("logratio", F.coalesce("logratio", F.lit(0.0)))
    )


def temperature_rebalance(df: DataFrame, group_col: str,
                          tau: float = 0.5,
                          id_col: str = "doc_id",
                          seed: str = "tr1") -> DataFrame:
    """Temperature-based group rebalancing (the multilingual
    data-balancing scheme of mT5/XLM-R): downsample so group shares
    become proportional to ``share^tau``.  ``tau < 1`` flattens the
    distribution toward rare groups; ``tau = 1`` is a no-op; ``tau =
    0`` targets uniform shares.

    Sampling-only (no replication): per-group keep fraction is
    ``share^(tau-1)`` scaled so the most-upweighted group (the
    smallest, for tau < 1) is kept in full.  Acceptance uses the
    md5-prefix uniform on ``(seed, id)`` — deterministic, order-free,
    engine-portable.  Plan: one grouped count (a few rows), a
    broadcast join of the per-group fractions, one filter — scan-
    dominated at any corpus size.
    """
    _reject_internal_collisions(
        df, ("__n", "__tot", "__raw", "__max_raw", "__keep_frac",
             "__grp"), "temperature_rebalance")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(F.sum("__n").alias("__tot"))
    raw = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.pow(F.col("__n") / F.col("__tot"), F.lit(tau - 1.0))
            .alias("__raw"),
        )
    )
    scale = raw.agg(F.max("__raw").alias("__max_raw"))
    fracs = (
        raw.crossJoin(F.broadcast(scale))
        .select(
            group_col,
            (F.col("__raw") / F.col("__max_raw")).alias("__keep_frac"),
        )
    )
    u = _md5_uniform(id_col, seed)
    # null-safe join: a NULL group is a legitimate stratum (real
    # corpora routinely carry null lang/source) — an equi-join would
    # silently DELETE it while its count still skews __tot
    fr = fracs.withColumnRenamed(group_col, "__grp")
    return (
        df.join(F.broadcast(fr),
                F.col(group_col).eqNullSafe(F.col("__grp")))
        .where(u < F.col("__keep_frac"))
        .drop("__keep_frac", "__grp")
    )


def hash_split(df: DataFrame, id_col: str,
               fracs: dict[str, float],
               seed: str = "split1") -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a split
    label from its md5-uniform key against the cumulative ``fracs``
    thresholds — the leakage-safe way to split a corpus, because
    membership is a pure function of the row id: re-runs, re-orders,
    repartitions, and INCREMENTAL additions never move an existing
    row across splits (a ``randomSplit`` reshuffles everything each
    run; a row-number split moves the boundary whenever upstream
    order or volume changes — both silently leak val/test into
    train over pipeline iterations).

    ZERO shuffle: the label is one JVM expression (md5 prefix + a
    CASE ladder over literal thresholds), evaluated inside the scan
    partition.  ``fracs`` must sum to 1 (±1e-9); exact observed
    proportions converge to ``fracs`` at corpus scale (binomial
    noise at small n — by design: determinism over exact quotas;
    ``stratified_sample`` is the exact-quota tool).  The key is the
    engine-portable ``_md5_key`` shared with q51/q59/q60/q66 oracles.

    Returns the input plus a ``split`` string column.
    """
    if not fracs:
        raise ValueError("fracs must name at least one split")
    if any(f < 0 for f in fracs.values()):
        raise ValueError(f"negative split fraction in {fracs}")
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    _reject_internal_collisions(df, ("split", "__u"), "hash_split")
    u = _md5_uniform(id_col, seed)
    expr = None
    acc = 0.0
    names = list(fracs)
    for name in names[:-1]:
        acc += fracs[name]
        branch = (F.when(F.col("__u") < F.lit(acc), F.lit(name))
                  if expr is None else
                  expr.when(F.col("__u") < F.lit(acc), F.lit(name)))
        expr = branch
    last = F.lit(names[-1])
    label = last if expr is None else expr.otherwise(last)
    return (
        df.withColumn("__u", u)
        .withColumn("split", label)
        .drop("__u")
    )


def reservoir_sample(df: DataFrame, k: int, id_col: str = "doc_id",
                     weight_col: str | None = None, seed: str = "",
                     keep_frac: float | None = None) -> DataFrame:
    """Global ``k``-row sample without replacement — the ``k`` rows
    with the smallest deterministic key, so the result is a pure
    function of the data (order-, partitioning- and cluster-size-free,
    replayable row-for-row by a SQL oracle).

    * ``weight_col=None``: uniform bottom-k of the salted md5 key —
      every row equally likely over the seed family.
    * ``weight_col=w``: Efraimidis–Spirakis A-ES keys. A row's key is
      ``-ln(u) / w`` with ``u`` the row's md5-uniform in (0, 1];
      taking the ``k`` SMALLEST keys is exactly sampling without
      replacement with inclusion probability proportional to ``w``
      (Efraimidis & Spirakis 2006, the mergeable weighted-reservoir
      scheme). Rows with null or non-positive weight are excluded
      (a zero-weight row must never be sampled; raising instead would
      make dirty data fatal mid-scan).

    Scale shape: ``orderBy(key).limit(k)`` plans
    ``TakeOrderedAndProject`` — each task keeps its own k-row bounded
    heap and ships ONLY k rows to a single merge; the corpus is never
    globally sorted and no full-sort shuffle exists in the plan
    (asserted in tests/test_sampling.py).  The merge step ships
    ``tasks x k`` rows, so for k beyond ~1M rows prefer
    :func:`stratified_sample` over a hash-stratum (quota ``k/s`` per
    stratum) which keeps the merge per-stratum.  For the uniform mode,
    ``keep_frac`` installs the same hash-threshold prefilter as
    :func:`stratified_sample` — any threshold keeping >= k rows
    preserves the sample bitwise (the sample IS the k smallest keys),
    and a deficient prefilter is detected with one count and falls
    back to the unfiltered scan, so exactness is never at stake.

    The reference engine's only sampler is positional every-n-th-line
    (``core_ranking.py:641-642``); reproducible uniform / weighted
    quotas are part of the LLM-data-pipeline family.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    _reject_internal_collisions(df, ("_key",), "reservoir_sample")
    if weight_col is None:
        keyed = df.withColumn("_key", _md5_key(id_col, seed))
        if keep_frac is not None:
            thresh = int(keep_frac * _KEY_SPACE)
            surv = keyed.filter(F.col("_key") < thresh)
            # one metadata count decides prefiltered vs full scan —
            # never both, never a wrong answer
            if surv.count() >= k:
                keyed = surv
    else:
        if keep_frac is not None:
            raise ValueError(
                "keep_frac requires uniform keys; the weighted key "
                "-ln(u)/w has no weight-free acceptance threshold",
            )
        u = (_md5_key(id_col, seed) + F.lit(1)).cast("double") / F.lit(
            float(_KEY_SPACE))
        w = F.col(weight_col).cast("double")
        keyed = (
            df.filter(w.isNotNull() & (w > 0))
            .withColumn("_key", -F.log(u) / w)
        )
    return keyed.orderBy("_key", id_col).limit(k).drop("_key")


def priority_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", seed: str = "") -> DataFrame:
    """Priority sampling (Duffield, Lund, Thorup, JACM 2007): a
    ``k``-row weighted sample WITHOUT replacement that carries an
    unbiased, near-variance-optimal SUBSET-SUM estimator — the piece
    :func:`reservoir_sample`'s A-ES keys don't give you.

    Each row gets priority ``q = w / u`` with ``u`` the row's
    engine-portable md5-uniform in (0, 1]; the sample is the ``k``
    highest priorities and ``tau`` is the (k+1)-th.  The returned
    ``est_w = max(w, tau)`` column satisfies, for ANY row predicate P,

        E[ sum of est_w over sampled rows matching P ]
            = sum of w over ALL rows matching P

    (DLT Theorem 1), with variance within a factor (1 + o(1)) of the
    best possible off-line scheme for k-row summaries (Szegedy, STOC
    2006).  So one global k-row sample answers every later group-by /
    filter total-weight question unbiasedly — the "sample once, slice
    forever" corpus-summary primitive (est. total tokens per language
    from one 10k-row sample of a 10^12-row corpus).

    Determinism + oracle: ``u`` is the md5-prefix uniform shared with
    q113/q114, both engines compute ``w/u`` and ``max(w, tau)`` on
    IEEE-754 doubles, ties break on ``id_col`` — DuckDB replays the
    sample AND the estimator column row-for-row (ORACLE_Q151).

    Scale shape: one ``TakeOrderedAndProject`` keeps k+1 rows (per-task
    bounded heap, no full sort — asserted in tests); the tau window +
    broadcast stat join then run over those <= k+1 rows only.  Rows
    with null/non-positive weight are excluded, as in
    :func:`reservoir_sample`.  The reference engine has no weighted
    sampler at all (``core_ranking.py:641-642`` is positional).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    _reject_internal_collisions(
        df, ("_prio", "_rn", "_tau"), "priority_sample")
    u = (_md5_key(id_col, seed) + F.lit(1)).cast("double") / F.lit(
        float(_KEY_SPACE))
    w = F.col(weight_col).cast("double")
    top = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_prio", w / u)
        .orderBy(F.desc("_prio"), F.asc(id_col))
        .limit(k + 1)
    )
    # everything below operates on <= k+1 rows: the unpartitioned
    # window is a deliberate single-task sort of a bounded stat table,
    # not a corpus window
    ranked = top.withColumn(
        "_rn",
        F.row_number().over(Window.orderBy(F.desc("_prio"),
                                           F.asc(id_col))),
    )
    tau = ranked.agg(F.coalesce(
        F.max(F.when(F.col("_rn") == k + 1, F.col("_prio"))),
        F.lit(0.0)).alias("_tau"))
    return (
        ranked.filter(F.col("_rn") <= k)
        .crossJoin(F.broadcast(tau))
        .withColumn("est_w", F.greatest(w, F.col("_tau")))
        .drop("_prio", "_rn", "_tau")
    )


# cumulative Poisson(1) CDF, P(X <= k) for k = 0..9, full double
# precision.  SHARED with the q126 DuckDB oracle generator (the SQL
# embeds these exact literals), so the two engines' CASE ladders bin
# the identical md5-uniform key identically — keep any change in sync.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
    0.9999998885745216,
]


def _poisson1_weight(u):
    """Inverse-CDF Poisson(1) draw from a uniform column: the weight
    ladder of the online bootstrap.  Truncated at 10 (P ~ 1e-8 mass
    beyond the table — one row in a hundred million gets clamped)."""
    expr = None
    for k, c in enumerate(POISSON1_CDF):
        branch = (F.when(u < F.lit(c), F.lit(k)) if expr is None
                  else expr.when(u < F.lit(c), F.lit(k)))
        expr = branch
    return expr.otherwise(F.lit(len(POISSON1_CDF)))


def bootstrap_replicate_stats(df: DataFrame, value_col: str,
                              id_col: str, B: int = 32,
                              seed: str = "boot") -> DataFrame:
    """Online (Poisson) bootstrap replicates of the mean in ONE scan:
    classic resampling-with-replacement is impossible at corpus scale
    (it needs n independent draws per replicate), but Poisson(1) row
    weights approximate the multinomial exactly as n grows (Oza &
    Russell 2001; the streaming-bootstrap standard).  Replicate ``b``
    weighs each row by an inverse-CDF Poisson(1) draw from the
    md5-uniform key of ``(seed|b|id)`` — deterministic, re-run and
    partitioning invariant, and engine-portable (the q51/q100 key
    family), so an exact SQL oracle can replay every replicate.
    Returns ``(rep, n_eff, wmean)``: the weighted row count and
    weighted mean per replicate; the spread of ``wmean`` across
    replicates IS the sampling distribution of the mean.

    Scale shape (100 TB): all ``B`` replicates come from ONE pass —
    2B mergeable aggregates (weighted count + weighted sum) inside a
    single 1-row hash aggregate, unpivoted with ``stack``; the weight
    columns are pure JVM md5/CASE projections.  Never loop B scans.
    An empty replicate (possible only at toy n) reports a null mean.
    """
    if B < 1:
        raise ValueError(f"B must be >= 1, got {B}")
    v = F.col(value_col)
    base = df.where(v.isNotNull())
    aggs = []
    for b in range(B):
        w = _poisson1_weight(_md5_uniform(id_col, f"{seed}|{b}|"))
        aggs += [
            F.sum(w).cast("long").alias(f"n__{b}"),
            F.sum(w * v).alias(f"s__{b}"),
        ]
    wide = base.agg(*aggs)
    cells = ", ".join(
        f"{b}, `n__{b}`, CASE WHEN `n__{b}` > 0 "
        f"THEN `s__{b}` / `n__{b}` END"
        for b in range(B)
    )
    return wide.selectExpr(
        f"stack({B}, {cells}) AS (rep, n_eff, wmean)",
    ).orderBy("rep")


def bootstrap_mean_ci(df: DataFrame, value_col: str, id_col: str,
                      B: int = 64, alpha: float = 0.05,
                      seed: str = "boot") -> dict:
    """Percentile bootstrap confidence interval for the mean of
    ``value_col``: runs :func:`bootstrap_replicate_stats` (one scan)
    and takes the empirical (alpha/2, 1-alpha/2) quantiles of the B
    replicate means driver-side (B rows — metadata, never data).
    Returns ``{"mean", "lo", "hi", "B"}``."""
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    import numpy as np

    reps = bootstrap_replicate_stats(
        df, value_col, id_col, B, seed).collect()
    means = np.array([r["wmean"] for r in reps
                      if r["wmean"] is not None], dtype=float)
    if means.size == 0:
        raise ValueError("no non-empty bootstrap replicates "
                         "(empty input?)")
    point = df.agg(F.avg(value_col)).first()[0]
    return {
        "mean": float(point),
        "lo": float(np.quantile(means, alpha / 2)),
        "hi": float(np.quantile(means, 1 - alpha / 2)),
        "B": int(means.size),
    }


def negative_samples(positives: DataFrame, items: DataFrame,
                     user_col: str, item_col: str,
                     k: int = 5, seed: str = "neg") -> DataFrame:
    """Deterministic uniform negative sampling for implicit-feedback
    ranking training: for every distinct user in ``positives``, draw
    ``k`` candidate items from the ``items`` catalog by the engine's
    md5 key (draw j of user u hits catalog INDEX
    ``md5(seed|u|j) mod n_items``) and drop draws that collide with
    the user's own positives.  Returns ``(user, draw, item)`` — up to
    ``k`` rows per user; collisions are DROPPED, not resampled
    (the standard uniform-then-filter scheme: resampling loops are
    data-dependent, this stays one-shot deterministic and
    engine-replayable; with catalogs >> per-user positives the loss
    is a few draws per thousand).

    Scale shape: distinct-users x k explode (a projection), catalog
    indexed once by a dimension-sized window (row_number over the
    item id — items tables are the SMALL side by definition),
    broadcast join draws->items on the dense index, one anti-join
    against positives on (user, item).  Nothing corpus-sized shuffles
    except the positives anti-join, which is the join any trainer
    performs anyway.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for c, d in ((user_col, positives), (item_col, positives)):
        if c not in d.columns:
            raise ValueError(f"unknown column {c!r} in positives")
    if item_col not in items.columns:
        raise ValueError(f"unknown column {item_col!r} in items")
    from pyspark.sql import Window

    n_items = items.count()
    if n_items == 0:
        raise ValueError("items catalog is empty")
    indexed = items.select(
        F.col(item_col).alias("__item"),
        (F.row_number().over(Window.orderBy(item_col)) - 1)
        .alias("__idx"),
    )
    users = positives.select(
        F.col(user_col).alias("__user")).distinct()
    draws = users.select(
        "__user",
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)]))
        .alias("draw"),
    )
    key = F.conv(
        F.substring(F.md5(F.concat_ws(
            "|", F.lit(seed), F.col("__user").cast("string"),
            F.col("draw").cast("string"))), 1, 8), 16, 10,
    ).cast("long")
    cand = draws.select(
        "__user", "draw", F.pmod(key, F.lit(n_items)).alias("__idx"))
    resolved = cand.join(F.broadcast(indexed), "__idx")
    pos = positives.select(
        F.col(user_col).alias("__user"),
        F.col(item_col).alias("__item"),
    ).distinct()
    return (
        resolved.join(pos, ["__user", "__item"], "left_anti")
        .select(F.col("__user").alias(user_col), "draw",
                F.col("__item").alias(item_col))
    )


def temporal_split(df: DataFrame, ts_col: str,
                   test_frac: float = 0.2,
                   embargo_seconds: float = 0.0,
                   out: str = "split") -> DataFrame:
    """Leakage-safe TIME-based train/test split with an optional
    embargo gap — the split rule for anything with temporal
    structure (event models, forecasts, crawl-freshness features),
    where :func:`hash_split`'s random assignment would leak the
    future into training:

    * ``cutoff`` = the exact interpolated ``1 - test_frac`` quantile
      of the timestamp (the engine's two-pass distributed selection —
      no group ever buffers in one task);
    * ``test``   = rows at/after the cutoff;
    * ``train``  = rows strictly before ``cutoff - embargo_seconds``;
    * ``embargo``= rows in between — DROPPED from both sides by
      time-series-CV practice (a trailing-window feature computed
      just before the cutoff still contains test-period signal;
      the gap purges it).  Rows with null timestamps get a null
      split (they belong to neither side).

    The assignment is one broadcast-literal comparison per row (the
    cutoff is metadata), so the split column costs a projection.
    Oracle-exact: the cutoff replays as ``quantile_cont(epoch(ts))``
    and the boundaries are plain comparisons (q122's quantile-replay
    convention).
    """
    if not (0.0 < test_frac < 1.0):
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    if embargo_seconds < 0:
        raise ValueError(
            f"embargo_seconds must be >= 0, got {embargo_seconds}")
    if ts_col not in df.columns:
        raise ValueError(f"unknown column {ts_col!r}")
    from outrank_spark.operators.quantiles import exact_grouped_quantiles

    # timezone-free epoch seconds for BOTH timestamp types (the
    # sessionize() NTZ idiom: unix_micros rejects TIMESTAMP_NTZ, and
    # casting NTZ->LTZ would bind the cutoff to the session timezone)
    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        secs = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})",
        ) / F.lit(1_000_000.0)
    elif dict(df.dtypes)[ts_col] in ("double", "float", "bigint",
                                     "int", "long"):
        secs = F.col(ts_col).cast("double")
    else:
        secs = F.unix_micros(F.col(ts_col)) / F.lit(1_000_000.0)

    p = 1.0 - float(test_frac)
    q = exact_grouped_quantiles(
        df.select(F.lit("all").alias("__g"), secs.alias("__v")),
        "__g", "__v", [p],
    )
    if q.empty:
        raise ValueError("no non-null timestamps to split on")
    cutoff = float(q.iloc[0, 1])
    lo = cutoff - float(embargo_seconds)
    ts = secs
    return df.withColumn(
        out,
        F.when(ts.isNull(), F.lit(None).cast("string"))
        .when(ts >= cutoff, F.lit("test"))
        .when(ts < lo, F.lit("train"))
        .otherwise(F.lit("embargo")),
    )
