"""Connected components over near-duplicate pairs -> dedup groups.

Pairwise near-dup detection (ngram/minhash/simhash/embedding) yields
edges; the deliverable of a dedup pipeline is the *partition into
groups* (keep one doc per component). Component id = min doc id
reachable through the edge set.

Algorithm: iterative min-label propagation ("hash-to-min" simplified) -
each round every node takes the minimum label among itself and its
neighbors; fixpoint in O(component diameter) rounds. Near-dup components
are tiny and dense (diameter 2-3), so 3-6 rounds close real corpora.
Each round is one join + one groupBy (shuffles keyed on node id); labels
are persisted per round and the loop exits on a converged count - the
standard Spark shape for iterative graph algorithms (GraphFrames does
the same underneath; this stays dependency-free).

Exact and deterministic given deterministic edges -> oracle-checked via
a DuckDB recursive CTE in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 15,
) -> DataFrame:
    """(id, component) with component = min reachable id.

    ``nodes``: one column ``node_col`` (isolated nodes become singleton
    components). ``edges``: undirected pairs (``src_col``, ``dst_col``).
    """
    # localCheckpoint (not persist): an iterative loop's lineage doubles
    # per round - caching keeps the DATA but the logical plan still grows
    # until the driver chokes on it. Checkpointing truncates lineage to
    # the materialized partitions each round (the required discipline for
    # any looped DataFrame computation).
    both = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(node_col).alias("id"), F.col(node_col).alias("component")
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.v == labels.id)
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


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
