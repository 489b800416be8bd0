"""Connected components over candidate-pair graphs (dedup clustering).

The dedup family (operators/dedup.py) ends at *verified pairs*; turning
pairs into duplicate CLUSTERS — so a corpus keeps exactly one canonical
document per near-dup group even when duplicates chain A~B~C across
different blocking keys — is a connected-components problem.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", ACM SoCC 2014).  Converges in O(log^2 n) rounds on any
graph (O(log n) in practice), each round a constant number of
DataFrame shuffles; the final edge set is a star per component, every
node pointing at its component's minimum id.

Scale notes:
- per-node neighbor minima use ``groupBy().agg(min)`` + a shuffle join
  back, NOT a window: partial (map-side) aggregation keeps head nodes
  (a giant duplicate cluster) from serializing one partition, and the
  join inherits AQE skew splitting.  A window over ``partitionBy(node)``
  would sort the whole star in one task.
- each round ends in ``localCheckpoint(eager=True)`` so the iterative
  plan doesn't accumulate lineage (the classic iterative-algorithm
  failure mode on Spark).
- convergence is detected with one tiny aggregate (count + hash-sum
  checksum of the oriented edge set) instead of a full subtract.

There is no reference-repo counterpart (the reference has no dedup at
all); this is a north-rule training-data-pipeline operator.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "duplicate_clusters",
           "keep_canonical", "golden_records"]


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, where m(u) = min(Γ(u) ∪ u)."""
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("mn"),
    )
    # no trailing distinct: the very next op is _small_star's
    # orient+distinct, which dedupes the same rows in its own shuffle
    # — a distinct here would shuffle the full edge set once more for
    # nothing
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (big, small); point every small neighbor and u at the
    minimum; keeps the graph's components, shrinks its diameter."""
    o = (
        edges.select(F.greatest("src", "dst").alias("src"),
                     F.least("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    mins = o.groupBy("src").agg(F.min("dst").alias("mn"))
    joined = o.join(mins, "src")
    point_neighbors = joined.select(
        F.col("dst").alias("src"), F.col("mn").alias("dst"),
    )
    # point_self left un-deduped: the union's trailing distinct
    # dedupes it in the same shuffle, so a pre-distinct would be one
    # extra full pass to save only the duplicate (src, mn) rows
    point_self = joined.select("src", F.col("mn").alias("dst"))
    return (
        point_neighbors.union(point_self)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: a long sum of 64-bit hashes overflows ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(pairs: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """(id, cluster_id) for every node in ``pairs``; cluster_id is the
    component's minimum node id.  Ids must be integral (cast to long).
    Nodes absent from ``pairs`` are singletons by definition — callers
    union them back if needed (see :func:`keep_canonical`)."""
    edges = (
        pairs.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _checksum(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds",
        )
    # star edges = (node, root); roots appear only on the dst side
    roots = edges.select(F.col("dst").alias("id")).distinct().select(
        "id", F.col("id").alias("cluster_id"),
    )
    members = edges.select(F.col("src").alias("id"),
                           F.col("dst").alias("cluster_id"))
    return members.union(roots).distinct()


def duplicate_clusters(pairs: DataFrame, src: str = "src",
                       dst: str = "dst", min_size: int = 2) -> DataFrame:
    """Per-cluster summary (cluster_id, n_docs) over the pair graph,
    clusters of at least ``min_size`` members."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_size)
    )


def golden_records(df: DataFrame, pairs: DataFrame,
                   quality_col: str, id_col: str = "doc_id",
                   src: str = "src", dst: str = "dst",
                   min_size: int = 2) -> DataFrame:
    """Survivorship (record-linkage "golden record" selection): per
    duplicate cluster, the member that wins on quality.  Returns
    ``(cluster_id, survivor_id, n_members, survivor_quality)`` for
    clusters of at least ``min_size`` members; the survivor is the
    max-``quality_col`` member, ties broken by MINIMUM id so the
    pick is deterministic and engine-replayable.

    Where :func:`keep_canonical` keeps the minimum-id member (pure
    dedup), this keeps the BEST member — the ER survivorship rule
    (longest text, freshest snapshot, highest completeness score).

    Scale shape: components via large-star/small-star, then ONE
    broadcast-joinable component map against the corpus and ONE
    mergeable aggregate — the argmax is ``max(struct(quality, -id))``,
    which merges associatively across partitions; no window over
    corpus rows.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    joined = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(quality_col).alias("q"),
    ).join(comp, "id")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.struct(
                F.col("q").alias("q"),
                (-F.col("id")).alias("nid"),
            )).alias("m"),
        )
        .where(F.col("n_members") >= min_size)
        .select(
            "cluster_id",
            (-F.col("m.nid")).cast("long").alias("survivor_id"),
            F.col("n_members").cast("long"),
            F.col("m.q").alias("survivor_quality"),
        )
    )


def keep_canonical(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Drop every non-canonical duplicate: keep the minimum-id member
    of each component plus all documents that never appear in a pair.
    One anti-join against the (small) non-canonical member set."""
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col),
    )
    return df.join(losers, id_col, "left_anti")
