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

Each star step is a min-neighbor hash aggregate (map-side partial,
node-bounded result) joined back onto the adjacency (AQE broadcasts it
at dup-graph node counts; picks a shuffle join at billion-node scale)
plus a sized dedup; convergence is detected by an order-insensitive
(count, bit_xor(xxhash64)) checksum of the checkpointed edge set.

Exact and deterministic given deterministic edges -> oracle-checked via
a DuckDB recursive CTE in the catalog (oracle unchanged across the
round-7 rewrite; output semantics are identical to the round-1..6
min-label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import free_local_checkpoint


#: Target rows per task inside the star loop: bounds the reduce-side
#: aggregate maps; ~1M two-long rows keeps each well under 100 MB
#: however many cores run concurrently. (The conf-sized version OOM'd
#: the 40x volume fixture: 174M edges / 32 partitions = 5.4M-key hash
#: maps x 32 concurrent tasks in one JVM.)
_ROWS_PER_TASK = 1_000_000


def _sized(n_rows: int, base: int = 32, cap: int = 4096) -> int:
    return int(min(cap, max(base, -(-n_rows // _ROWS_PER_TASK))))


def _min_neighbors(adj: DataFrame) -> DataFrame:
    """(u, __m) with __m = min neighbor of u. A hash aggregate, NOT a
    partition window: the window form sorts the full adjacency per
    round and holds the sort buffers concurrently with the dedup
    aggregate's hash maps - the combination exhausted one 16 GiB JVM at
    the 40x volume fixture (174M edges). The aggregate's map-side
    partials are tiny (one long per distinct u per task), its shuffle
    carries partials only, and the result frame is node-bounded - small
    enough that AQE broadcasts the join back onto the adjacency, which
    then never shuffles at all (at cluster scale with billions of
    nodes, AQE picks a shuffle join instead; both are the right plan
    for their regime)."""
    return adj.groupBy("u").agg(F.min("v").alias("__m"))


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every adjacency row (u, v) with v > u, m = min(N(u)+{u}).

    ``distinct`` keeps its partial aggregate - on clique-heavy dup
    graphs clique members re-emit the same ``(v, min)`` edges, so the
    map side collapses much of the shuffle; cross-task duplicates
    collapse on the (small, post-dedup) reduce side."""
    adj = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = _min_neighbors(adj).select(
        "u", F.least(F.col("__m"), F.col("u")).alias("__m")
    )
    return (
        adj.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Input edges all point large->small (large-star output). Re-point
    every neighbor and the center itself at the minimum neighbor."""
    m = _min_neighbors(edges)  # all neighbors are < u here
    return (
        edges.join(m, "u")
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .union(m.select("u", F.col("__m").alias("v")))
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
    # Entry materialization is DISK_ONLY, not localCheckpoint: the edge
    # producer is often a heavy pipeline (the exact ngram join emits
    # 174M pairs at the 40x fixture), and checkpoint's deserialized
    # MEMORY_AND_DISK blocks squeeze the execution pool WHILE that
    # pipeline's final stages still shuffle - the spill storm exhausted
    # the process file-descriptor limit. DISK_ONLY leaves execution
    # memory to the producer and streams back in for round 1.
    # No entry dedup: the star steps tolerate duplicate edges and round
    # 1's sized distinct removes them anyway — an unsized dedup of a
    # 174M-row unique pair set was itself an OOM (5.4M-key hash maps at
    # conf-32 partitions x 32 concurrent tasks in one JVM).
    from pyspark.storagelevel import StorageLevel

    entry = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .persist(StorageLevel.DISK_ONLY)
    )
    live = entry
    spark = live.sparkSession
    n_live = live.count()
    prev_sig: tuple[int, int] | None = None
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    try:
        # AQE partition coalescing merges exchanges back to ~64 MB of
        # SHUFFLE BYTES per task - but a hash-aggregate's memory is
        # keys x ~48 B, ~3x its 16 B/row shuffle footprint, so byte-
        # targeted coalescing rebuilds exactly the multi-million-key
        # maps the row-count sizing exists to prevent (observed: 40x
        # fixture, UNABLE_TO_ACQUIRE_MEMORY with 32 concurrent sized-
        # then-coalesced tasks). Off inside the loop, restored after.
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        for i in range(max_iter):
            # Size EVERY exchange this round plans (the min-neighbor
            # aggregate and the dedup's reduce side) by the measured
            # live edge count: per-task state stays ~_ROWS_PER_TASK rows
            # however large the frontier. Conf is captured at planning
            # time; restored after the loop.
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(_sized(2 * n_live))
            )
            # localCheckpoint per round: an iterative loop's lineage
            # doubles per round — checkpointing truncates it to the
            # materialized partitions (node-bounded after round 1).
            # The PREVIOUS round's checkpoint is dead the moment the
            # new one materializes (eager) — unpersist it, or the loop
            # pins O(rounds x frontier) deserialized blocks in the
            # unified pool for the session's lifetime (the round-10
            # mid-sweep-drag mechanism: leaked storage squeezes later
            # queries' execution memory into spill).
            prev_live = live
            # DISK_ONLY (round-11, the kcore lesson): the default level
            # unrolls DESERIALIZED UnsafeRow copies of an EDGE-scale
            # frame through the heap - with two generations in flight a
            # dense-enough graph OOMs a 16g local JVM outright (kcore's
            # co-purchase edges did at 40x). Serialized disk blocks are
            # page-cache-backed and each round reads the frontier once.
            live = _small_star(_large_star(live)).localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
            if prev_live is not entry:
                free_local_checkpoint(prev_live)
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
            n_live = row.n
        else:
            raise RuntimeError(
                f"connected_components: no star fixpoint within {max_iter} rounds"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce
        )
        entry.unpersist()
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
