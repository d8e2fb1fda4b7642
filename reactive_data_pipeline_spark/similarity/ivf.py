"""IVF (inverted-file) approximate nearest-neighbor search.

The classic two-level ANN index: a k-means coarse quantizer partitions
the vector space into ``n_cells`` Voronoi cells; each vector is assigned
to its nearest centroid; a query scores only the vectors in the
``nprobe`` cells whose centroids are closest to it. Recall/cost dial:
``nprobe = n_cells`` degenerates to exact brute force, ``nprobe = 1``
scans ~1/n_cells of the table.

Spark shape: the quantizer is ``pyspark.ml.clustering.KMeans`` (fit on
the table - at 100 TB you fit on a small sample instead, the API is the
same); assignment is ``model.transform`` (one narrow map). The probe is
fully declarative - query row and centroid table are broadcast, cell
selection is a top-k over n_cells rows, candidates come from an equi
join on the cell id - so nothing is collected to the driver and the
whole search is one partition-prunable plan. Writing the assigned table
``partitionBy('ivf_cell')`` turns the probe into a pruned file scan,
which is the deployment layout at scale.

Approximate by construction -> rows-only driver check; the exact
baseline is similarity.brute.knn_brute (and tests assert exact equality
at nprobe = n_cells).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.relational import ensure_parallelism, top_k

DEFAULT_SEED = 42


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit the coarse quantizer and assign every row to a cell.

    Returns (table + ``ivf_cell`` column, centroid list). The centroid
    list is tiny (n_cells x dim) and becomes a broadcast literal table in
    the probe plan.
    """
    emb = ensure_parallelism(emb)
    with_vec = emb.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="ivf_cell").fit(
        with_vec
    )
    assigned = model.transform(with_vec).drop("__v")
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centers


def knn_ivf(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Approximate top-k cosine neighbors of ``query_id`` scanning only
    ``nprobe`` of ``n_cells`` inverted lists. Columns: vec_id, cos_sim
    (same schema as knn_brute)."""
    assigned, centers = ivf_assign(emb, n_cells=n_cells, vec_col=vec_col, seed=seed)
    spark = emb.sparkSession
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "ivf_cell int, center array<double>"
    )
    q = assigned.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__q"))
    # nprobe closest centroids to the query - a top-k over n_cells rows.
    probe_cells = top_k(
        cent.crossJoin(F.broadcast(q)).select(
            "ivf_cell", cosine("center", "__q").alias("__d")
        ),
        [F.desc("__d"), F.asc("ivf_cell")],
        nprobe,
    ).select("ivf_cell")
    cand = (
        assigned.join(F.broadcast(probe_cells), "ivf_cell")
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(vec_col, "__q"), 6).alias("cos_sim"),
        )
    )
    return top_k(cand, [F.desc("cos_sim"), F.asc("vec_id")], k)
