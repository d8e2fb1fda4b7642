"""Round-4 late additions: semantic dedup and curation operators from
the recent LLM-data literature, each with an exact cross-engine oracle.

* ``semdedup_cluster_pairs`` - SemDeDup (Abbas et al. 2023,
  arXiv:2303.09540): cluster the embedding space, then look for
  near-duplicate pairs ONLY within a cluster - the O(N^2/k) scale form
  of semantic dedup (the all-pairs form is the deliberately-labeled
  ground-truth twin ``embedding_neardup_pairs``).
* ``hard_negative_mining`` - contrastive-training data prep: for every
  vector, the most cosine-similar vector with a DIFFERENT label inside
  its assigned cluster (semantically close, differently labeled - the
  classic hard negative).
* ``quality_topfrac_by_source`` - FineWeb-style per-domain dynamic
  thresholding: keep the top half of each source by quality score
  instead of one global cutoff (a global cutoff lets a clean domain
  crowd out a noisy one entirely).
* ``bigram_logprob_docs`` - bigram LM scoring (the CCNet perplexity
  filter one order up from ``unigram_logprob_docs``), trained on the
  corpus itself with a keyed count join instead of a giant broadcast.

Determinism rules are the module family's usual ones: integer-exact
e12 centroid sums, cosines/log-probs rounded to 6dp BEFORE any
argmax / threshold / fold, sequential left folds in document order on
both engines, e6-scaled integer outputs wherever a double would ride
through an aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.vectors import cosine
from ..similarity.centroid import label_centroids, nearest_centroid
from . import register
from .llm import _NORM, _TOKS, _cos_sql, _docs, _emb, _stop_sql

# ---------------------------------------------------------------------------
# Shared oracle SQL: decimal-exact per-label centroids + rounded argmax
# assignment (identical rules to similarity/centroid.py - see
# nearest_centroid_confusion in queries/llm2.py for the same chain).
# ---------------------------------------------------------------------------

_ASSIGN_CTES = f"""
    comp AS (
      SELECT label, pos, CAST(embedding[pos] AS DOUBLE) AS v
      FROM (SELECT label, embedding,
                   unnest(generate_series(1, len(embedding))) AS pos
            FROM embeddings)
    ),
    cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(CAST(v AS DECIMAL(20,12)) * 1000000000000 AS BIGINT))
                  AS DOUBLE) / (COUNT(*) * 1e12) AS c
      FROM comp GROUP BY label, pos
    ),
    cvecs AS (SELECT label AS cand_label, list(c ORDER BY pos) AS cvec
              FROM cent GROUP BY label),
    scored AS (
      SELECT e.vec_id, e.label AS true_label, e.embedding, c.cand_label,
             round({_cos_sql('e.embedding', 'c.cvec')}, 6) AS cos
      FROM embeddings e CROSS JOIN cvecs c
    ),
    assigned AS (
      SELECT vec_id, true_label, embedding, cand_label AS cluster
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cand_label) AS rn
            FROM scored)
      WHERE rn = 1
    )"""

#: SemDeDup similarity threshold on the 6dp-rounded cosine. Chosen so
#: the synthetic corpus yields a non-degenerate pair set at every SF
#: (within-cluster cosines top out ~0.47; ~1% of pairs clear 0.30).
_SEM_TAU = 0.30

_E6 = "CAST(CAST({x} AS DECIMAL(10,6)) * 1000000 AS BIGINT)"


def _e6(col) -> F.Column:
    return (col.cast("decimal(10,6)") * F.lit(10**6)).cast("long")


@register(
    "semdedup_cluster_pairs",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    pairs AS (
      SELECT x.cluster, x.vec_id AS a_id, y.vec_id AS b_id,
             round({_cos_sql('x.embedding', 'y.embedding')}, 6) AS cos
      FROM assigned x JOIN assigned y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    ),
    hits AS (
      SELECT cluster,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COUNT(DISTINCT b_id) AS BIGINT) AS n_removed,
             CAST(SUM({_E6.format(x='cos')}) AS BIGINT) AS sum_cos_e6
      FROM pairs WHERE cos >= {_SEM_TAU} GROUP BY cluster
    ),
    sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs
              FROM assigned GROUP BY cluster)
    SELECT s.cluster, s.n_vecs,
           COALESCE(h.n_pairs, 0) AS n_pairs,
           COALESCE(h.n_removed, 0) AS n_removed,
           COALESCE(h.sum_cos_e6, 0) AS sum_cos_e6
    FROM sizes s LEFT JOIN hits h ON s.cluster = h.cluster
    """,
    tags=("dedup", "similarity", "clustering", "semdedup"),
)
def semdedup_cluster_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: per-cluster semantic near-duplicate report - pair
    count, vectors the keep-lowest-id rule would drop, and the e6
    cosine mass of the qualifying pairs.

    Scale shape: centroids broadcast (k x dim), assignment is the
    map-combined argmax (similarity/centroid.py), and the pair join is
    keyed by CLUSTER - each side shuffles once on the cluster id and
    candidate generation is O(sum of cluster_size^2) = O(N^2/k) under
    balanced k, never the corpus cross-product (the plan guard forbids
    CartesianProduct over the whole catalog). The assigned frame is
    localCheckpoint-ed so the self-join's two subtrees don't recompute
    the assignment; skewed clusters are a real failure mode at 100 TB -
    cap cluster size upstream (raise k) or salt the join, see SCALE.md.
    """
    emb = _emb(spark, sf_dir)
    assigned = nearest_centroid(emb, label_centroids(emb))
    vecs = (
        emb.select("vec_id", "embedding")
        .join(
            assigned.select(
                "vec_id", F.col("assigned_label").alias("cluster")
            ),
            "vec_id",
        )
        .localCheckpoint(eager=True)
    )
    a = vecs.select(
        F.col("cluster"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_vec"),
    )
    b = vecs.select(
        F.col("cluster"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_vec"),
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "cluster",
            "b_id",
            F.round(cosine("a_vec", "b_vec"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(_SEM_TAU))
    )
    hits = pairs.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("b_id").cast("long").alias("n_removed"),
        F.sum(_e6(F.col("cos"))).cast("long").alias("sum_cos_e6"),
    )
    sizes = vecs.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    return sizes.join(hits, "cluster", "left").select(
        "cluster",
        "n_vecs",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        F.coalesce("sum_cos_e6", F.lit(0)).cast("long").alias("sum_cos_e6"),
    )


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    cand AS (
      SELECT x.vec_id, x.true_label, y.vec_id AS neg_id,
             y.true_label AS neg_label,
             round({_cos_sql('x.embedding', 'y.embedding')}, 6) AS cos
      FROM assigned x JOIN assigned y
        ON x.cluster = y.cluster AND x.true_label <> y.true_label
    )
    SELECT vec_id, true_label,
           neg_id AS hard_neg_id, neg_label AS hard_neg_label,
           {_E6.format(x='cos')} AS cos_e6
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY cos DESC, neg_id) AS rn
          FROM cand)
    WHERE rn = 1
    """,
    tags=("similarity", "contrastive", "clustering"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each vector's
    most cosine-similar DIFFERENT-label vector within its assigned
    cluster (vectors whose whole cluster shares their label emit no
    row, identically on both engines).

    Scale shape: same cluster-keyed candidate join as SemDeDup (one
    exchange per side, O(N^2/k) candidates), then the argmax collapses
    map-side via ``min_by`` under the composite (-cos, neg_id) key -
    the shuffle after scoring carries one candidate per (vector,
    partition), never the score matrix.
    """
    emb = _emb(spark, sf_dir)
    assigned = nearest_centroid(emb, label_centroids(emb))
    vecs = (
        emb.select("vec_id", "label", "embedding")
        .join(
            assigned.select(
                "vec_id", F.col("assigned_label").alias("cluster")
            ),
            "vec_id",
        )
        .localCheckpoint(eager=True)
    )
    x = vecs.select(
        "cluster",
        F.col("vec_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("x_vec"),
    )
    y = vecs.select(
        "cluster",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("y_vec"),
    )
    cand = (
        x.join(y, "cluster")
        .filter(F.col("true_label") != F.col("neg_label"))
        .select(
            "vec_id",
            "true_label",
            "neg_id",
            "neg_label",
            F.round(cosine("x_vec", "y_vec"), 6).alias("cos"),
        )
    )
    best = cand.groupBy("vec_id", "true_label").agg(
        F.min_by(
            F.struct(
                F.col("neg_id").alias("hard_neg_id"),
                F.col("neg_label").alias("hard_neg_label"),
                _e6(F.col("cos")).alias("cos_e6"),
            ),
            F.struct((-F.col("cos")).alias("a"), F.col("neg_id").alias("b")),
        ).alias("__best")
    )
    return best.select(
        "vec_id",
        "true_label",
        "__best.hard_neg_id",
        "__best.hard_neg_label",
        "__best.cos_e6",
    )


@register(
    "quality_topfrac_by_source",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             round(least(1.0, CAST(n_words AS DOUBLE) / 50.0) * 0.5
                   + least(1.0, stop_ratio * 5.0) * 0.3
                   + (1.0 - least(1.0, punct_ratio * 10.0)) * 0.2, 6) AS quality
      FROM (
        SELECT doc_id, source,
               len(string_split(norm, ' ')) AS n_words,
               CAST({_stop_sql('en')} AS DOUBLE)
                 / len(string_split(norm, ' ')) AS stop_ratio,
               CAST(len(regexp_extract_all(text, '{TX.PUNCT_CLASS}')) AS DOUBLE)
                 / length(text) AS punct_ratio
        FROM (SELECT doc_id, source, text, {_NORM} AS norm FROM documents)
      )
    ),
    r AS (
      SELECT doc_id, source, quality,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM q
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN rn * 2 <= n + 1 THEN 1 END) AS BIGINT) AS n_kept,
           CAST(MIN(CASE WHEN rn * 2 <= n + 1
                         THEN {_E6.format(x='quality')} END) AS BIGINT)
             AS cutoff_quality_e6,
           CAST(SUM(CASE WHEN rn * 2 <= n + 1
                         THEN {_E6.format(x='quality')} END) AS BIGINT)
             AS sum_kept_quality_e6
    FROM r GROUP BY source
    """,
    tags=("curation", "quality", "window"),
)
def quality_topfrac_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dynamic quality thresholding (the FineWeb recipe's
    per-domain form): keep the top ``ceil(n/2)`` documents of EACH
    source by (quality desc, doc_id) - so a noisy source keeps its best
    half instead of being wiped out by a global cutoff - and report the
    per-source kept count, the effective cutoff score, and the kept
    quality mass (e6 integers).

    Scale shape: the quality score is per-row JVM expressions (no
    shuffle); the ranking is one window exchange keyed by source. A
    pathologically hot source is the usual skew story - mitigate with
    the approx-quantile cutoff variant (one pass, no per-source sort)
    when a source no longer fits a partition's sort spill budget.
    """
    d = _docs(spark, sf_dir)
    q = d.select("doc_id", "source", TX.quality_score("text").alias("quality"))
    rank_w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    src_w = Window.partitionBy("source")
    r = q.select(
        "source",
        F.col("quality"),
        F.row_number().over(rank_w).alias("rn"),
        F.count(F.lit(1)).over(src_w).alias("n"),
    )
    kept = F.col("rn") * 2 <= F.col("n") + 1
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.min(F.when(kept, _e6(F.col("quality"))))
        .cast("long")
        .alias("cutoff_quality_e6"),
        F.sum(F.when(kept, _e6(F.col("quality"))))
        .cast("long")
        .alias("sum_kept_quality_e6"),
    )


@register(
    "bigram_logprob_docs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    big AS (
      SELECT doc_id, len(t) AS n_tokens, i AS pos, t[i] AS t1,
             t[i] || ' ' || t[i + 1] AS bg
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    c2 AS (SELECT bg, t1, COUNT(*) AS n2 FROM big GROUP BY bg, t1),
    c1 AS (SELECT t1, COUNT(*) AS n1 FROM big GROUP BY t1),
    lp AS (
      SELECT bg,
             CAST(floor(ln(CAST(n2 AS DOUBLE) / n1) * 1000000 + 0.5)
                  AS BIGINT) AS lp_e6
      FROM c2 JOIN c1 USING (t1)
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp_e6) AS BIGINT) AS sum_lp_e6
    FROM big JOIN lp USING (bg) GROUP BY doc_id, n_tokens
    """,
    tags=("text", "quality", "lm", "curation"),
)
def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring (one order above
    ``unigram_logprob_docs``): train bigram MLE probabilities
    p(y|x) = c(x,y)/c(x,.) on the corpus itself and score each document
    by its mean bigram log-probability - the CCNet-style fluency filter
    that catches shuffled/unnatural token order a unigram model cannot.

    Determinism: each log-prob becomes an e6-scaled INTEGER via the
    engine-neutral ``floor(x * 1e6 + 0.5)`` (cross-engine finding #6 in
    ROUND4_NOTES.md - ``round(x, 6)`` disagrees between engines when a
    6dp-exact sum divided by a small n lands a half exactly on the 7th
    decimal, which the first cut of this query hit on doc 4), and the
    per-document score is then an order-independent integer SUM - no
    sequential fold needed at all. Count ratios are exact-integer
    divisions so the pre-floor doubles agree bit-for-bit.

    Scale shape: unlike the unigram query's broadcast vocabulary map, a
    bigram table is too wide to broadcast on an open crawl - so the
    scores flow through KEYED joins instead: bigram counts collapse
    map-side, the (bg -> logp) table joins back to the exploded bigram
    stream on the bigram key, and the per-document re-assembly is one
    doc_id exchange. Nothing is ever driver-side or broadcast-unbounded;
    cap the model with a top-K + floor on open vocabularies (noted,
    not needed at the synthetic corpus's closed vocabulary).
    """
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", TX.tokens("text").alias("t"))
        .filter(F.size("t") >= 2)
    )
    pairs = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda x, y: F.struct(
                    x.alias("t1"), F.concat_ws(" ", x, y).alias("bg")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "n_tokens", "p.t1", "p.bg")
    c2 = pairs.groupBy("bg", "t1").agg(F.count(F.lit(1)).alias("n2"))
    c1 = pairs.groupBy("t1").agg(F.count(F.lit(1)).alias("n1"))
    lp = c2.join(c1, "t1").select(
        "bg",
        F.floor(
            F.log(F.col("n2").cast("double") / F.col("n1")) * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lp_e6"),
    )
    return (
        pairs.join(lp, "bg")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("lp_e6").cast("long").alias("sum_lp_e6"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "n_bigrams",
            "sum_lp_e6",
        )
    )


@register(
    "split_leakage_audit",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, md5({_NORM}) AS fingerprint,
             CASE WHEN doc_id % 10 < 9 THEN 'train' ELSE 'val' END AS split
      FROM documents
    ),
    g AS (
      SELECT fingerprint,
             MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train
      FROM d GROUP BY fingerprint
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_val_docs,
           CAST(SUM(has_train) AS BIGINT) AS n_leaked,
           CAST(COALESCE(SUM(CASE WHEN has_train = 1 THEN doc_id END), 0)
                AS BIGINT) AS leaked_id_sum
    FROM d JOIN g USING (fingerprint)
    WHERE split = 'val'
    GROUP BY source
    """,
    tags=("curation", "split", "dedup", "contamination"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split leakage audit: a validation document whose exact
    content fingerprint also appears in the training split measures
    nothing (its loss is memorization, not generalization). Reports,
    per source, how many val documents are leaked this way plus an
    id-sum checksum of the leaked set - the audit every split pipeline
    should run AFTER dedup-by-split decisions and BEFORE training
    (``train_val_split`` assigns by doc_id residue, so exact duplicates
    with different ids can straddle the boundary). On THIS synthetic
    corpus every document is exact-unique, so the audit correctly
    reports zero leaks at every SF - the non-degenerate companion is
    ``neardup_split_leakage``, which catches the near-dup leakage this
    corpus actually has (and which an exact audit structurally misses).

    Scale shape: one fingerprint-keyed aggregate (map-combined boolean
    OR), one fingerprint-keyed join back to the val slice, one final
    source-keyed aggregate - all keyed exchanges on bounded keys; no
    all-pairs anything.
    """
    from ..functions.text import fingerprint_md5

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        fingerprint_md5("text").alias("fingerprint"),
        F.when(F.col("doc_id") % 10 < 9, "train").otherwise("val").alias("split"),
    )
    g = d.groupBy("fingerprint").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("has_train")
    )
    val = d.filter(F.col("split") == "val").join(g, "fingerprint")
    return val.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_val_docs"),
        F.sum("has_train").cast("long").alias("n_leaked"),
        F.coalesce(
            F.sum(F.when(F.col("has_train") == 1, F.col("doc_id"))), F.lit(0)
        )
        .cast("long")
        .alias("leaked_id_sum"),
    )


@register(
    "cross_source_dup_matrix",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, source,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN generate_series(1, len(t) - 2)]) AS g
      FROM toks
    ),
    pairs AS (
      SELECT least(a.source, b.source) AS source_a,
             greatest(a.source, b.source) AS source_b,
             CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
               / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jac
      FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_neardup_pairs
    FROM pairs WHERE jac >= 0.5 GROUP BY source_a, source_b
    """,
    tags=("dedup", "curation", "corpus-analytics", "ngram"),
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplication matrix between sources: for each source pair,
    how many near-duplicate document pairs (word-trigram Jaccard >=
    0.5, the ``ngram3_jaccard_pairs`` rule) straddle them - the
    provenance analytic that tells you feed b is substantially a
    re-crawl/mirror of feed a, which dedup ordering and mixture weights
    both depend on. The diagonal counts within-source near-dup pairs.
    (An EXACT-fingerprint matrix is the cheap first pass, but this
    corpus - like most cleaned corpora - has zero exact duplicates;
    all its duplication is near-dup, which is the realistic case.)

    Scale shape: the pair relation is the inverted-index gram join
    (shuffle keyed by GRAM, per-gram fan-out capped via max_doc_freq on
    open crawls; MinHash-banded first pass at web scale), and the
    matrix aggregate collapses it onto a sources^2-bounded key space -
    map-combined, constant-size output.
    """
    from ..dedup.ngram import ngram_jaccard_pairs

    d = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    labels = d.select("doc_id", "source")
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardup_pairs"))
    )


@register(
    "neardup_split_leakage",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 10 < 9 THEN 'train' ELSE 'val' END AS split,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN generate_series(1, len(t) - 2)]) AS g
      FROM toks
    ),
    pairs AS (
      SELECT b.doc_id AS val_id, b.source AS val_source,
             CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
               / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jac
      FROM grams a JOIN grams b
        ON a.split = 'train' AND b.split = 'val'
    ),
    leaked AS (
      SELECT DISTINCT val_id, val_source FROM pairs WHERE jac >= 0.5
    ),
    vals AS (SELECT source, COUNT(*) AS n_val_docs FROM grams
             WHERE split = 'val' GROUP BY source)
    SELECT v.source,
           CAST(v.n_val_docs AS BIGINT) AS n_val_docs,
           CAST(COUNT(l.val_id) AS BIGINT) AS n_leaked,
           CAST(COALESCE(SUM(l.val_id), 0) AS BIGINT) AS leaked_id_sum
    FROM vals v LEFT JOIN leaked l ON l.val_source = v.source
    GROUP BY v.source, v.n_val_docs
    """,
    tags=("curation", "split", "dedup", "contamination", "ngram"),
)
def neardup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEAR-dup extension of ``split_leakage_audit``: a validation
    document whose word-trigram Jaccard against ANY training document
    reaches 0.5 is leaked even though its exact fingerprint differs -
    the contamination mode exact-hash audits miss entirely (Lee et al.
    2022 measured it on real corpora). Reports per-source leaked-val
    counts + id-sum checksum.

    Scale shape: the candidate pairs come from the same inverted-index
    gram join as ``ngram3_jaccard_pairs`` (shuffle keyed by GRAM, fan
    out bounded by per-gram document frequency - cap with max_doc_freq
    on an open crawl), restricted to train x val pairs - so the
    candidate volume is a strict subset of the full near-dup join's. At
    web scale you run the MinHash-banded form first and this join only
    on band-collision candidates (dedup/minhash.py machinery).

    The DuckDB oracle brute-forces all train x val pairs - fine at gate
    scale, deliberately NOT the Spark plan.
    """
    from ..dedup.ngram import ngram_jaccard_pairs

    d = _docs(spark, sf_dir).withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 9, "train").otherwise("val"),
    )
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    labels = d.select("doc_id", "source", "split")
    # A pair leaks when its two sides sit in different splits; the pair
    # relation is a<b-oriented, so the val doc can be either side.
    la = labels.select(
        F.col("doc_id").alias("doc_a"),
        F.col("source").alias("src_a"),
        F.col("split").alias("split_a"),
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"),
        F.col("source").alias("src_b"),
        F.col("split").alias("split_b"),
    )
    cross = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            F.when(F.col("split_a") == "val", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("val_id"),
            F.when(F.col("split_a") == "val", F.col("src_a"))
            .otherwise(F.col("src_b"))
            .alias("val_source"),
        )
        .distinct()
    )
    vals = (
        labels.filter(F.col("split") == "val")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_val_docs"))
    )
    return (
        vals.join(cross, vals.source == cross.val_source, "left")
        .groupBy("source", "n_val_docs")
        .agg(
            F.count("val_id").cast("long").alias("n_leaked"),
            F.coalesce(F.sum("val_id"), F.lit(0))
            .cast("long")
            .alias("leaked_id_sum"),
        )
    )


def _lang_by_source_sql() -> str:
    """source x predicted-language matrix SQL: the same stopword-argmax
    CASE chain as queries/llm.py::_lang_case_sql, keyed by source."""
    scores = {lang: _stop_sql(lang) for lang in TX.STOPWORDS}
    best = "greatest(" + ", ".join(f"s_{l}" for l in TX.STOPWORDS) + ")"
    whens = "\n".join(f"WHEN s_{l} = best THEN '{l}'" for l in TX.STOPWORDS)
    inner = ",\n".join(f"{sql} AS s_{l}" for l, sql in scores.items())
    return f"""
    SELECT source, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
      SELECT source,
             CASE WHEN best <= 0 THEN 'und'
                  {whens}
                  ELSE 'und' END AS lang_pred
      FROM (
        SELECT source, s_en, s_es, s_fr, s_de, {best} AS best
        FROM (SELECT source, {inner}
              FROM (SELECT source, {_NORM} AS norm FROM documents))
      )
    )
    GROUP BY source, lang_pred
    """


@register(
    "lang_mix_by_source",
    oracle=_lang_by_source_sql(),
    tags=("text", "curation", "corpus-analytics"),
)
def lang_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source x predicted-language document counts - the matrix mixture
    design actually consumes (per-feed language shares decide sampling
    weights and routing to per-language pipelines), built on the same
    deterministic stopword-argmax language ID as ``lang_id_docs``.

    Scale shape: language ID is per-row JVM regex/HOF work with zero
    shuffle; the matrix aggregate collapses map-side onto a
    sources x languages key space - constant-size output.
    """
    return (
        _docs(spark, sf_dir)
        .select("source", TX.lang_id("text").alias("lang_pred"))
        .groupBy("source", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@register(
    "user_activity_freq_spectrum",
    oracle="""
    SELECT n_events,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(uid) AS BIGINT) AS user_id_sum
    FROM (SELECT user_id AS uid, COUNT(*) AS n_events
          FROM events GROUP BY user_id)
    GROUP BY n_events
    """,
    tags=("analytics", "profiling", "skew"),
)
def user_activity_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies spectrum of user activity: how many
    users emitted exactly k events, with an id-sum checksum per stratum.
    This is the skew-planning analytic - the tail of this spectrum IS
    the hot-key population that decides whether a per-user shuffle
    needs salting (operators/skew.py), and its head sizes the state
    store for per-user streaming operators.

    Scale shape: two map-combined aggregates back to back - per-user
    counts (one user-keyed exchange), then the spectrum (one exchange
    on the bounded count domain). Nothing else; output is bounded by
    the distinct activity levels, not the user count.
    """
    from ..sources import read_table

    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy(F.col("user_id").alias("uid")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_user.groupBy("n_events").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("uid").cast("long").alias("user_id_sum"),
    )
