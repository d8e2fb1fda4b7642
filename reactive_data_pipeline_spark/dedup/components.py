"""Connected components over near-duplicate pairs -> dedup groups.

Pairwise near-dup detection (ngram/minhash/simhash/embedding) yields
edges; the deliverable of a dedup pipeline is the *partition into
groups* (keep one doc per component). Component id = min doc id
reachable through the edge set.

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SOCC 2014). Each round rewires the EDGE SET
toward one star per component rooted at the component minimum:

* large-star(u): connect every strictly-larger neighbor of u to
  ``m = min(N(u) + {u})`` — emit ``(v, m)`` for ``v in N(u), v > u``.
* small-star(u): with all edges pointing large->small, connect every
  (smaller) neighbor and u itself to ``m = min(N(u))`` — emit
  ``(v, m)`` and ``(u, m)``.

Both steps preserve connectivity and never grow the edge set; the
composition converges in O(log^2 n) rounds (O(diameter) for the label
propagation this replaces). The property that matters at scale: the
shuffled frame each round is the LIVE edge set, and dense components
collapse immediately — a k-clique's k(k-1)/2 edges become k-1 star
edges after one large-star — so late rounds shuffle only the
unconverged frontier instead of the full label frame every round.
(Near-dup graphs are exactly the dense-clique case: the sf4 volume
fixture's 174M-edge dup graph was the motivating single-box bound.)

Each star step is ONE hash-partition shuffle (a partition-window min),
no join; convergence is detected by an order-insensitive
(count, xxhash64-sum) checksum of the checkpointed edge set.

Exact and deterministic given deterministic edges -> oracle-checked via
a DuckDB recursive CTE in the catalog (oracle unchanged across the
round-7 rewrite; output semantics are identical to the round-1..6
min-label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every adjacency row (u, v) with v > u, m = min(N(u)+{u})."""
    adj = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        adj.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Input edges all point large->small (large-star output). Re-point
    every neighbor and the center itself at the minimum neighbor."""
    w = Window.partitionBy("u")
    withm = edges.withColumn("m", F.min("v").over(w))
    return (
        withm.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(withm.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 50,
    stats_out: list | None = None,
) -> DataFrame:
    """(id, component) with component = min reachable id.

    ``nodes``: one column ``node_col`` (isolated nodes become singleton
    components). ``edges``: undirected pairs (``src_col``, ``dst_col``).
    ``stats_out``: optional list; appended one ``{"round": i, "edges": n}``
    per completed large+small round (the frontier-shrink evidence the
    plan tests pin). Raises ``RuntimeError`` if the edge set has not
    reached its star fixpoint within ``max_iter`` rounds — an
    unconverged labeling must fail loudly, not return quietly-wrong
    groups.
    """
    # localCheckpoint (not persist): an iterative loop's lineage doubles
    # per round — checkpointing truncates it to the materialized
    # partitions, the required discipline for looped DataFrame work.
    live = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig: tuple[int, int] | None = None
    for i in range(max_iter):
        live = _small_star(_large_star(live)).localCheckpoint()
        # bit_xor is order-insensitive and cannot overflow under ANSI
        # (a SUM of xxhash64 longs does); the edge set is distinct, so
        # XOR-cancellation of duplicates cannot occur.
        row = live.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (row.n, row.h)
        if stats_out is not None:
            stats_out.append({"round": i + 1, "edges": row.n})
        if sig == prev_sig or row.n == 0:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components: no star fixpoint within {max_iter} rounds"
        )
    # Fixpoint edge set is one (node, component-root) edge per non-root
    # node; roots and isolated nodes label themselves.
    roots = live.groupBy(F.col("u").alias("id")).agg(F.min("v").alias("_comp"))
    return (
        nodes.select(F.col(node_col).alias("id"))
        .join(roots, "id", "left")
        .select("id", F.coalesce(F.col("_comp"), F.col("id")).alias("component"))
    )


def neardup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Dedup deliverable: (doc_id, group_id, group_size, is_keeper) -
    keeper = the min doc id of each component."""
    comp = connected_components(
        docs.select(id_col), pairs, node_col=id_col, src_col="doc_a", dst_col="doc_b"
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("group_id"),
            "group_size",
            (F.col("id") == F.col("component")).alias("is_keeper"),
        )
    )
