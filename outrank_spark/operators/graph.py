"""Weighted PageRank over DataFrame edge lists (link-graph ranking).

The companion to connected components (operators/components.py):
components answer "which pages are the same document"; PageRank
answers "which pages matter" — the canonical web-graph signal a
Common-Crawl training pipeline uses for quality weighting and crawl
prioritization (Page, Brin, Motwani, Winograd — "The PageRank
Citation Ranking", Stanford InfoLab 1999; damping + dangling-mass
redistribution per the standard power-iteration formulation).

The graph itself can come from anywhere that yields (src, dst[, w])
rows; ``transition_edges`` derives one from an event log (per-user
consecutive-visit transitions — a browsing graph), the same shape a
crawler's outlink table or a host-level link graph would have.

Scale notes (the 100 TB story):
- ranks are O(|V|) and edges O(|E|); every iteration is ONE join of
  the static contribution table with the current rank vector plus one
  ``groupBy(dst)`` re-aggregation — the minimal shuffle shape for
  distributed power iteration.  The contribution table (edge weight /
  source out-weight) is computed once, repartitioned by ``src`` and
  persisted, so the per-iteration join reuses a stable partitioning
  instead of re-shuffling the edge set every round.
- dangling mass (rank parked on nodes with no out-edges) is collected
  with a 1-row lazy aggregate cross-joined back in — no driver action,
  no ``collect`` — and redistributed uniformly, so rank mass is
  conserved exactly (sums to 1 every iteration; pinned in pytest).
- each iteration ends in ``localCheckpoint(eager=True)``: iterative
  lineage is truncated, the classic Spark iterative-plan blowup
  (also used by connected_components and kmeans_fit).
- fixed iteration count (no convergence action in the loop) keeps the
  job's stage graph static — predictable on a shared cluster and
  resumable mid-scan by re-running from the checkpointed rank vector.

There is no reference-repo counterpart (the reference has no graph
operators); this is a north-rule web-corpus operator.  Exact-oracle
proof: q84 replays the same fixed-iteration recurrence as generated
DuckDB SQL (plans/queries.py ORACLE_Q84).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["transition_edges", "pagerank", "hits"]


def transition_edges(events: DataFrame, user_col: str, order_cols: list,
                     node_col: str, drop_self_loops: bool = True,
                     ) -> DataFrame:
    """Per-user consecutive transitions -> weighted edge list
    ``(src, dst, weight)``.

    One user-keyed shuffle; the lag window sorts only each user's own
    events (bounded by per-user activity, the q18 sessionization
    shape).  Self-loops (consecutive identical nodes) are dropped by
    default — they only feed rank back to themselves.
    """
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    t = (
        events.select(
            F.col(node_col).alias("dst"),
            F.lag(node_col).over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
    )
    if drop_self_loops:
        t = t.where(F.col("src") != F.col("dst"))
    return t.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight"),
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, damping: float = 0.85,
             iterations: int = 10,
             start_ranks: DataFrame | None = None) -> DataFrame:
    """Weighted PageRank by fixed-count power iteration.

    ``r_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} w(u,v)/outw(u) · r_t(u)
    + dangling_t/N)`` where ``dangling_t`` is the rank mass on nodes
    with no out-edges and ``N = |V|``.  Unweighted graphs
    (``weight=None``) use w ≡ 1.  Returns ``(node, rank)`` with
    Σ rank = 1 (mass conservation is exact, not approximate).

    ``start_ranks`` is the resume path (the north rule's mid-job
    checkpoint shape): pass a previously returned/persisted
    ``(node, rank)`` table and the recurrence continues from it —
    ``pagerank(e, iterations=10)`` equals
    ``pagerank(e, iterations=5, start_ranks=pagerank(e,
    iterations=5))``, pinned in tests.  The iteration count is a
    function of the RECURRENCE, not of who ran the earlier rounds, so
    a long job can persist ranks every k rounds and restart from the
    last table.  Nodes missing from ``start_ranks`` contribute zero
    mass (they are still re-seeded by the (1-d)/N floor).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        (F.col(weight).cast("double") if weight else F.lit(1.0))
        .alias("w"),
    )
    if weight:
        # a null or non-positive weight carries no rank mass; keeping
        # it would either drop mass silently (null skipped by sum
        # while the source still counts as non-dangling) or divide
        # 0/0 into NaN ranks — drop the edge instead; a source whose
        # edges all drop is correctly re-classified as dangling
        e = e.where(F.col("w") > 0)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one tiny action; |V|, not |E|
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # static contribution fractions, co-partitioned by src once so the
    # per-iteration rank join never re-shuffles the edge set
    contrib = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("frac"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    srcs = contrib.select("src").distinct()

    if start_ranks is not None:
        ranks = (
            nodes.join(start_ranks.select("node", "rank"), "node", "left")
            .select("node",
                    F.coalesce("rank", F.lit(0.0)).alias("rank"))
            .localCheckpoint(eager=True)
        )
    else:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        # rank mass parked on dangling nodes (no out-edges), 1 lazy row
        dangling = (
            ranks.join(srcs, ranks["node"] == srcs["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        flowed = (
            contrib.join(ranks, contrib["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("c"))
        )
        ranks = (
            nodes.join(flowed, nodes["node"] == flowed["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * (F.coalesce(F.col("c"), F.lit(0.0))
                                 + F.col("dm") / n)
                ).alias("rank"),
            )
            # eager checkpoint EVERY iteration, measured choice: the
            # next round consumes `ranks` three ways (dangling, flow
            # join, node join) — un-materialized it is recomputed per
            # consumer, which probed WORSE (0.58 efficiency) than
            # paying the per-round barrier (0.77, bench --scaling-ops
            # pagerank); the barrier is also what truncates iterative
            # lineage
            .localCheckpoint(eager=True)
        )
    return ranks


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iterations: int = 20) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) by fixed-count power
    iteration: ``a = A^T h / ||A^T h||_2``, ``h = A a / ||A a||_2``
    each round.  Returns ``(node, hub, authority)`` over all nodes —
    a pure source has authority 0, a pure sink hub 0.  Duplicate
    edges are collapsed first (HITS is defined on the unweighted
    adjacency; a repeated link must not double-vote).

    Complements :func:`pagerank` for link-quality features: PageRank
    rewards being linked FROM anywhere important; HITS separates
    directories/portals (hubs) from referenced content (authorities)
    — the standard pair of link signals for crawl prioritization.

    Scale shape: the deduped edge list is repartitioned by each join
    side once and localCheckpointed (same discipline as
    :func:`pagerank` — the per-round barrier both truncates iterative
    lineage and beats recompute-per-consumer, measured there); each
    half-round is one join + one groupBy over the edges, and the L2
    norm enters as a broadcast 1-row aggregate, never a driver
    action.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.isEmpty():
        return nodes.withColumn("hub", F.lit(0.0)) \
                    .withColumn("authority", F.lit(0.0))
    state = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority"))
    for _ in range(iterations):
        auth_raw = (
            e.join(state.select(F.col("node").alias("src"), "hub"),
                   "src")
            .groupBy("dst").agg(F.sum("hub").alias("a_raw"))
        )
        a_full = nodes.join(
            auth_raw, nodes["node"] == auth_raw["dst"], "left",
        ).select(
            "node", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
        # materialize the raw vector BEFORE the norm: the norm
        # aggregate and the normalized projection both consume it,
        # and un-materialized the join+groupBy subtree runs TWICE
        # per half-round (measured: 0.52 -> 0.80 2->8-core
        # efficiency, bench --scaling-ops hits)
        ).localCheckpoint(eager=True)
        a_norm = a_full.agg(
            F.sqrt(F.sum(F.col("a_raw") * F.col("a_raw"))).alias("nz"))
        a = a_full.crossJoin(F.broadcast(a_norm)).select(
            "node",
            F.when(F.col("nz") > 0, F.col("a_raw") / F.col("nz"))
            .otherwise(F.lit(0.0)).alias("authority"),
        )
        hub_raw = (
            e.join(a.select(F.col("node").alias("dst"), "authority"),
                   "dst")
            .groupBy("src").agg(F.sum("authority").alias("h_raw"))
        )
        h_full = nodes.join(
            hub_raw, nodes["node"] == hub_raw["src"], "left",
        ).select(
            "node", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
        ).localCheckpoint(eager=True)
        h_norm = h_full.agg(
            F.sqrt(F.sum(F.col("h_raw") * F.col("h_raw"))).alias("nz"))
        h = h_full.crossJoin(F.broadcast(h_norm)).select(
            "node",
            F.when(F.col("nz") > 0, F.col("h_raw") / F.col("nz"))
            .otherwise(F.lit(0.0)).alias("hub"),
        )
        # no checkpoint here: lineage is already truncated at the
        # materialized a_full/h_full, and the next round reads state
        # exactly once — a third per-round barrier bought nothing
        # (each eager checkpoint is a full job launch; the fixed
        # scheduler cost is the serial share that caps small-graph
        # 2->8-core efficiency, see BENCH.md hits probe)
        state = h.join(a, "node").select("node", "hub", "authority")
    return state
