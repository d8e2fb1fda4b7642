"""Round-4 closing additions: containment dedup and two-stage
retrieval, both with exact cross-engine oracles.

* ``prefix_containment_pairs`` - containment (prefix) deduplication,
  the RefinedWeb/Pile curation step that exact-hash dedup misses: a
  document that is a truncation of another is a duplicate even though
  its fingerprint differs. Candidate generation is a keyed self-join
  on the first-32-char prefix (any containment pair with the shorter
  side >= 32 chars shares that key), so the plan is one prefix-keyed
  exchange, never the corpus cross-product.
* ``retrieve_rerank_cell`` - the canonical two-stage retrieval shape
  (coarse candidate generation -> exact re-rank) made oracle-exact by
  using the decimal-exact nearest-centroid assignment from
  ``similarity/centroid.py`` as the coarse index (IVF with
  centroids = label centroids, nprobe=1): candidates are the query's
  own cell, the re-rank is exact cosine, top-5 per query.

Determinism rules follow llm3: cosines rounded to 6dp BEFORE any
ranking, e6-scaled integer outputs, rank ties broken on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..similarity.centroid import label_centroids, nearest_centroid
from . import register
from .llm import _cos_sql, _docs, _emb
from .llm3 import _ASSIGN_CTES, _E6, _e6

#: Prefix-key length for containment candidate generation. Every true
#: containment pair whose SHORTER side has >= _PK chars shares the
#: first-_PK-char key; pairs with a shorter side below _PK chars are
#: out of scope by contract (at 100 TB you don't containment-dedup
#: tweets against books on a 31-char prefix anyway).
_PK = 32


@register(
    "prefix_containment_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, n_chars, substr(text, 1, {_PK}) AS pk
      FROM documents WHERE n_chars >= {_PK}
    ),
    cand AS (
      SELECT CASE WHEN a.n_chars <= b.n_chars THEN a.doc_id ELSE b.doc_id END
               AS short_id,
             CASE WHEN a.n_chars <= b.n_chars THEN b.doc_id ELSE a.doc_id END
               AS long_id,
             CASE WHEN a.n_chars <= b.n_chars THEN a.n_chars ELSE b.n_chars END
               AS short_chars,
             CASE WHEN a.n_chars <= b.n_chars THEN b.n_chars ELSE a.n_chars END
               AS long_chars,
             CASE WHEN a.n_chars <= b.n_chars THEN a.text ELSE b.text END
               AS short_text,
             CASE WHEN a.n_chars <= b.n_chars THEN b.text ELSE a.text END
               AS long_text
      FROM d a JOIN d b ON a.pk = b.pk AND a.doc_id < b.doc_id
    )
    SELECT short_id, long_id, short_chars, long_chars
    FROM cand WHERE starts_with(long_text, short_text)
    """,
    tags=("dedup", "containment", "text"),
)
def prefix_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: (short, long) document pairs where the short
    text is a PREFIX of the long one - truncations/extensions that
    exact-fingerprint dedup (``dedup_exact_docs``) cannot see because
    the hashes differ. The reference has no dedup at all; this extends
    the mandated dedup family (SURVEY.md section 2, LLM-pipeline rows)
    with the curation step RefinedWeb applies after exact dedup.

    Plan: filter to docs >= 32 chars, key each by its first-32-char
    prefix, self-join on that key (ONE hash exchange per side, the
    catalog-wide plan guard forbids CartesianProduct), verify each
    candidate with a single ``startswith`` - O(L) per candidate, and
    candidates are bounded by the prefix-group sizes, never N^2.

    Scale notes: the failure mode at 100 TB is boilerplate prefixes
    (license headers, templated pages) blowing up one key's group.
    Mitigations, in order: lengthen the key (64/128 chars catches the
    same pairs for shorter-side >= key), append a coarse length BAND of
    the shorter side to the key, or cap group size and route the
    overflow keys through a MinHash pass (they are near-dups by
    construction). Deterministic tie rule: the SHORTER side is 'short';
    on equal lengths the lower doc_id (equal-length containment means
    identical text, which exact dedup already owns).
    """
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") >= _PK)
        .select(
            "doc_id", "text", "n_chars", F.substring("text", 1, _PK).alias("pk")
        )
    )
    a = d.select(
        F.col("pk"),
        F.col("doc_id").alias("a_id"),
        F.col("text").alias("a_text"),
        F.col("n_chars").alias("a_chars"),
    )
    b = d.select(
        F.col("pk"),
        F.col("doc_id").alias("b_id"),
        F.col("text").alias("b_text"),
        F.col("n_chars").alias("b_chars"),
    )
    a_short = F.col("a_chars") <= F.col("b_chars")
    cand = (
        a.join(b, "pk")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            F.when(a_short, F.col("a_id")).otherwise(F.col("b_id")).alias("short_id"),
            F.when(a_short, F.col("b_id")).otherwise(F.col("a_id")).alias("long_id"),
            F.when(a_short, F.col("a_chars"))
            .otherwise(F.col("b_chars"))
            .alias("short_chars"),
            F.when(a_short, F.col("b_chars"))
            .otherwise(F.col("a_chars"))
            .alias("long_chars"),
            F.when(a_short, F.col("a_text")).otherwise(F.col("b_text")).alias("__s"),
            F.when(a_short, F.col("b_text")).otherwise(F.col("a_text")).alias("__l"),
        )
    )
    return cand.filter(F.startswith(F.col("__l"), F.col("__s"))).select(
        "short_id", "long_id", "short_chars", "long_chars"
    )


@register(
    "retrieve_rerank_cell",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    q AS (
      SELECT vec_id AS query_id, cluster, embedding AS qv
      FROM assigned WHERE vec_id % 100 = 0
    ),
    cand AS (
      SELECT q.query_id, a.vec_id,
             round({_cos_sql('a.embedding', 'q.qv')}, 6) AS cos
      FROM assigned a JOIN q
        ON a.cluster = q.cluster AND a.vec_id <> q.query_id
    )
    SELECT query_id, vec_id,
           {_E6.format(x='cos')} AS cos_e6,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, vec_id) AS rn
          FROM cand)
    WHERE rn <= 5
    """,
    tags=("similarity", "retrieval", "rerank", "clustering"),
)
def retrieve_rerank_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval under the value hash: coarse candidate
    generation (the query's nearest-centroid CELL - IVF with nprobe=1
    over the decimal-exact label centroids, so BOTH stages are
    oracle-reproducible, unlike random-plane LSH whose quality is
    gated by ``ann_recall_contract`` instead) followed by an exact
    cosine re-rank, top-5 per query for the whole query batch (every
    100th vector). This is the retrieve->rerank shape every RAG /
    hard-example-mining pipeline runs; ``knn_batch_cosine`` is its
    exact full-scan twin.

    Plan: centroids broadcast (k x dim), assignment is the map-combined
    argmax (similarity/centroid.py), the assigned frame is
    localCheckpoint-ed so the query/candidate subtrees don't recompute
    it, the tiny query block broadcasts into the cell-keyed candidate
    join (corpus side scanned ONCE, scored only against queries in its
    own cell), and the only exchange after scoring is the query-keyed
    ranking, carrying O(candidates-in-cell) rows, never the score
    matrix. At 100 TB: raise k so cells stay bounded, nprobe > 1 for
    recall (then the oracle becomes a recall contract like
    ``ann_recall_contract``).
    """
    emb = _emb(spark, sf_dir)
    assigned = nearest_centroid(emb, label_centroids(emb))
    vecs = (
        emb.select("vec_id", "embedding")
        .join(
            assigned.select("vec_id", F.col("assigned_label").alias("cluster")),
            "vec_id",
        )
        .localCheckpoint(eager=True)
    )
    q = vecs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("cluster"),
        F.col("embedding").alias("qv"),
    )
    cand = (
        vecs.join(F.broadcast(q), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine("embedding", "qv"), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", _e6(F.col("cos")).alias("cos_e6"), "rank")
    )
