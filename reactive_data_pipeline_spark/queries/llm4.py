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
* ``bpe_train_rounds`` - ITERATIVE BPE tokenizer training (Sennrich et
  al. 2016) under the value hash: ``bpe_pair_merges`` is the single
  induction step; this runs the actual merge LOOP - count adjacent
  symbol pairs, merge the most frequent, re-count - for 4 rounds, with
  the greedy left-to-right merge expressed as an ``aggregate`` HOF fold
  on Spark and the IDENTICAL fold as a DuckDB ``list_reduce`` in the
  unrolled chained-CTE oracle (the pagerank/kmeans pattern extended to
  string states).

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


# ---------------------------------------------------------------------------
# Iterative BPE training (the merge loop, not just one step)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 4
#: Symbol separator for the string-encoded fold state. 0x1f (unit
#: separator) cannot appear in the whitespace-normalized corpus words,
#: so symbol boundaries are unambiguous on both engines.
_US = "chr(31)"

#: One greedy left-to-right merge pass as a fold over the symbol list,
#: with the state encoded as a chr(31)-joined string (DuckDB's
#: list_reduce requires acc type == element type, and the IDENTICAL
#: encoding is used on the Spark side so both engines walk the same
#: states). Rule: if the last emitted symbol is `a` and the incoming
#: one is `b`, replace the tail with the merged token; the merged token
#: is strictly longer than `a`, so it can never re-match as the left
#: element in the same pass - exactly greedy non-overlapping LTR.
_MERGE_FOLD_SQL = f"""list_reduce(s.syms, (acc, x) -> CASE
           WHEN acc = b.a AND x = b.b THEN b.a || b.b
           WHEN ends_with(acc, {_US} || b.a) AND x = b.b
             THEN left(acc, length(acc) - length(b.a) - 1)
                  || {_US} || b.a || b.b
           ELSE acc || {_US} || x END)"""


def _bpe_ctes(rounds: int) -> list[str]:
    """The unrolled training CTE chain (w0, s0, then p/b/s per round),
    carrying the word ``w`` through every state so downstream consumers
    (the encode query) can join encoded lengths back to the corpus.
    Every s_r is MATERIALIZED (the kcore lesson: a CTE its successors
    reference 3x re-expands exponentially under default inlining), and
    the per-round best pair is a 1-row MATERIALIZED CTE cross-joined
    into the merge, mirroring Spark's broadcast."""
    ctes = [
        # Word eligibility mirrors _bpe_words exactly: empty words are
        # excluded (a blank document normalizes to [''], whose symbol
        # expansion DIVERGES across engines - Spark sequence(1,0) is
        # the descending [1,0] while DuckDB generate_series(1,0) is
        # empty and list_reduce errors on []), and so is any word
        # containing the chr(31) state separator, which would corrupt
        # the fold's boundary checks identically on both engines.
        r"""w0 AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        FROM documents)
      WHERE w <> '' AND NOT contains(w, chr(31))
      GROUP BY w
    )""",
        """s0 AS MATERIALIZED (
      SELECT w, cnt, list_transform(generate_series(1, length(w)),
                                    i -> substr(w, i, 1)) AS syms
      FROM w0
    )""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""p{r} AS (
      SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS i
            FROM s{p})
      GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT a, b, c FROM p{r} "
            f"ORDER BY c DESC, a, b LIMIT 1)"
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
      SELECT s.w, s.cnt, string_split({_MERGE_FOLD_SQL}, {_US}) AS syms
      FROM s{p} s CROSS JOIN b{r} b
    )"""
        )
    return ctes


def _bpe_oracle(rounds: int) -> str:
    """Per-round trajectory report over the training chain."""
    ctes = _bpe_ctes(rounds)
    selects = []
    for r in range(1, rounds + 1):
        selects.append(
            f"""SELECT {r} AS round, b.a AS sym_a, b.b AS sym_b,
           b.c AS pair_count,
           (SELECT CAST(COUNT(DISTINCT y) AS BIGINT)
            FROM (SELECT unnest(syms) AS y FROM s{r})) AS n_types_after,
           (SELECT CAST(SUM(cnt * len(syms)) AS BIGINT) FROM s{r})
             AS corpus_tokens_after
    FROM b{r} b"""
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL\n    ".join(selects)


@register(
    "bpe_train_rounds",
    oracle=_bpe_oracle(_BPE_ROUNDS),
    tags=("text", "tokenizer", "iterative"),
)
def bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training: 4 merge rounds over the
    whitespace-normalized corpus vocabulary, emitting per round the
    merged pair, its (word-frequency-weighted) occurrence count, the
    symbol-type count after the merge, and the total corpus length in
    symbols after the merge. ``bpe_pair_merges`` is the single step;
    this is the loop a real tokenizer build runs (Sennrich et al. 2016)
    - each round's statistics depend on every previous merge, so the
    value hash proves the whole trajectory, not one aggregation.

    Plan per round, all lazy (ZERO driver-side collects): one pair
    explode + map-combined count over the word-frequency table (which
    is vocabulary-sized, NOT corpus-sized - the classic BPE trick: fold
    the corpus to (word, count) once, then iterate over distinct words
    only), a TakeOrderedAndProject picking the best pair (1 row,
    broadcast), and the greedy left-to-right merge as an ``aggregate``
    HOF fold with the SAME string-encoded state as the oracle's
    ``list_reduce`` (chr(31)-separated; the merged token is longer than
    its left element, so one fold pass IS greedy non-overlapping LTR -
    verified char-identical across engines including the tricky
    equal-symbol runs like 'aaaaa'). localCheckpoint per round keeps
    the iterative lineage flat (the pagerank/kmeans/kcore pattern).

    Scale: the iterated frame is the DISTINCT VOCABULARY (Heaps' law:
    ~10^7-10^8 types at 100 TB, kilobytes per row), not the corpus;
    the corpus is touched exactly once to build w0. Each round is one
    vocabulary-keyed aggregate + a broadcast - at 1000 executors the
    per-round wall time is dominated by scheduling, which is why real
    builds batch many merges per materialization; the fold/oracle
    machinery here is unchanged by that batching.
    """
    _final, rows = _bpe_loop(spark, sf_dir, _BPE_ROUNDS)
    out = rows[0]
    for s in rows[1:]:
        out = out.unionByName(s)
    return out


def _bpe_word_eligible(w) -> F.Column:
    """Word-eligibility contract, identical to the oracle's w0 filter:
    no empty words (a blank document's '' word has DIVERGENT symbol
    expansions - Spark sequence(1,0) = [1,0] descending vs DuckDB
    generate_series(1,0) = [], where list_reduce errors), and no word
    containing the chr(31) fold-state separator (it would corrupt the
    merge's boundary checks identically on both engines)."""
    c = F.col(w) if isinstance(w, str) else w
    return (c != "") & (~c.contains("\x1f"))


def _bpe_loop(spark: SparkSession, sf_dir: str, rounds: int):
    """The shared Spark training loop over the corpus vocabulary.
    Returns ``(final, stats)``: ``final`` is the (w, cnt, syms)
    vocabulary after all merges (the trained tokenizer applied to every
    word), ``stats`` one 1-row DataFrame per round (round, sym_a,
    sym_b, pair_count, n_types_after, corpus_tokens_after)."""
    from ..functions.text import tokens

    words = (
        _docs(spark, sf_dir)
        .select(F.explode(tokens("text")).alias("w"))
        .filter(_bpe_word_eligible("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return _bpe_iterate(words, rounds)


def _bpe_iterate(words: DataFrame, rounds: int):
    """The merge loop proper, over any (w, cnt) frame of non-empty,
    separator-free words (the property test drives it with adversarial
    synthetic vocabularies). Everything is lazy except the per-round
    localCheckpoint."""
    sep = F.lit("\x1f")
    cur = words.select(
        "w",
        "cnt",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    rows = []
    for r in range(1, rounds + 1):
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .select("cnt", "p.a", "p.b")
        )
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.col("a").alias("ba"),
                F.col("b").alias("bb"),
                F.col("c").alias("bc"),
            )
        )
        merged = (
            cur.crossJoin(F.broadcast(best))
            .select(
                "w",
                "cnt",
                F.split(
                    F.aggregate(
                        F.slice("syms", 2, F.size("syms") - 1),
                        F.element_at("syms", 1),
                        lambda acc, x: F.when(
                            (acc == F.col("ba")) & (x == F.col("bb")),
                            F.concat(F.col("ba"), F.col("bb")),
                        )
                        .when(
                            acc.endswith(F.concat(sep, F.col("ba")))
                            & (x == F.col("bb")),
                            F.concat(
                                F.substring(
                                    acc,
                                    F.lit(1),
                                    F.length(acc) - F.length(F.col("ba")) - 1,
                                ),
                                sep,
                                F.col("ba"),
                                F.col("bb"),
                            ),
                        )
                        .otherwise(F.concat(acc, sep, x)),
                    ),
                    "\x1f",
                ).alias("syms"),
                "ba",
                "bb",
                "bc",
            )
            .localCheckpoint(eager=True)
        )
        cur = merged.select("w", "cnt", "syms")
        types = (
            merged.select(F.explode("syms").alias("y"))
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n_types_after"))
        )
        toks = merged.agg(
            F.sum(F.col("cnt") * F.size("syms"))
            .cast("long")
            .alias("corpus_tokens_after")
        )
        rows.append(
            merged.select("ba", "bb", "bc")
            .limit(1)
            .crossJoin(F.broadcast(types))
            .crossJoin(F.broadcast(toks))
            .select(
                F.lit(r).cast("int").alias("round"),
                F.col("ba").alias("sym_a"),
                F.col("bb").alias("sym_b"),
                F.col("bc").alias("pair_count"),
                "n_types_after",
                "corpus_tokens_after",
            )
        )
    return cur, rows


_ENCODE_SELECT = f"""sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT source, unnest(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
        FROM documents)
      WHERE w <> '' AND NOT contains(w, chr(31))
      GROUP BY source, w
    ),
    enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS el FROM s{_BPE_ROUNDS})
    SELECT sw.source,
           CAST(SUM(sw.c) AS BIGINT) AS n_words,
           CAST(SUM(sw.c * length(sw.w)) AS BIGINT) AS n_chars,
           CAST(SUM(sw.c * enc.el) AS BIGINT) AS n_tokens,
           CAST(SUM(sw.c * length(sw.w)) * 1000000
                // SUM(sw.c * enc.el) AS BIGINT) AS chars_per_token_e6
    FROM sw JOIN enc ON sw.w = enc.w
    GROUP BY sw.source"""


@register(
    "bpe_encode_by_source",
    oracle="WITH "
    + ",\n    ".join(_bpe_ctes(_BPE_ROUNDS))
    + ",\n    "
    + _ENCODE_SELECT,
    tags=("text", "tokenizer", "curation"),
)
def bpe_encode_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained tokenizer: encode the whole corpus with the
    4-round BPE merge table and report per-source compression - word,
    char, and TOKEN counts plus exact chars-per-token (e6 integer
    division, no float ratio). Train->apply is the full tokenizer
    lifecycle; the compression spread across sources is the signal a
    mixture designer actually reads (a source the tokenizer compresses
    badly is under-represented in the training corpus).

    Plan: the corpus is scanned and exploded exactly ONCE, into the
    checkpointed per-(source, word) counts; the training vocabulary is
    the word-level re-aggregate of that same frame (never a second
    corpus scan), and applying the merge table is ONE word-keyed
    broadcast join of the encoded lengths - at 100 TB the encoded
    vocabulary is broadcast-size (Heaps' law) so the apply join needs
    no fact-side shuffle beyond the (source, word) aggregate.
    """
    from ..functions.text import tokens

    sw = (
        _docs(spark, sf_dir)
        .select("source", F.explode(tokens("text")).alias("w"))
        .filter(_bpe_word_eligible("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    words = sw.groupBy("w").agg(F.sum("c").cast("long").alias("cnt"))
    final, _rows = _bpe_iterate(words, _BPE_ROUNDS)
    enc = final.select("w", F.size("syms").cast("long").alias("el"))
    joined = sw.join(F.broadcast(enc), "w")
    return joined.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.col("c") * F.length("w")).cast("long").alias("n_chars"),
        F.sum(F.col("c") * F.col("el")).cast("long").alias("n_tokens"),
    ).select(
        "source",
        "n_words",
        "n_chars",
        "n_tokens",
        F.expr("(n_chars * 1000000) div n_tokens").alias("chars_per_token_e6"),
    )


@register(
    "mm_codec_roundtrip",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             coalesce(list_sum(list_transform(
               range(1, least(length(text), 64) + 1),
               i -> unicode(text[i]) % 256)), 0) AS s
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(s AS BIGINT) AS png_sum,
           CAST(s AS BIGINT) AS gif_sum,
           CAST(s AS BIGINT) AS bmp_sum,
           CAST(s % 256 AS BIGINT) AS jpeg_dc
    FROM base
    """,
    tags=("multimodal", "codec", "pandas_udf"),
)
def mm_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-decode integrity under the VALUE HASH: each document's
    first 64 code points (mod 256, zero-padded) become an 8x8 gray
    image that round-trips through every pure-stdlib codec ON THE
    EXECUTORS (Arrow ``mapInPandas``) - PNG with the scanline filter
    chosen by ``doc_id % 5`` (so all five filters run across the
    corpus), GIF (real LZW + palette), BMP, and a solid-block JPEG
    whose DC path is EXACTLY invertible at quality 95 (q_dc = 2: the
    quantized DC ``round(8 v' / 2) = 4 v'`` is integral, so
    dequant + IDCT reproduces the input byte - the lossless corner of
    a lossy codec). The decoded pixel sums must equal the analytic
    sums DuckDB recomputes straight from the text - the oracle never
    touches the codecs, so a convention error anywhere in
    encode->decode (zigzag, filter math, LZW table growth, YCbCr,
    stride padding) breaks the hash.

    This is the driver-visible leg of the round-8 gap-#3 closure
    (media_codecs.py + jpeg.py): the round-7 verdict listed "PIL pixel
    decode" as environment-gated; the stdlib codecs opened that gate,
    and this entry pins it every time it enters the check window.

    ASCII pin: both sides index CHARACTERS (Python slice / DuckDB
    ``text[i]``), which agree on this corpus (verified pure ASCII at
    sf0.001/0.01/0.1); a regenerated non-ASCII fixture would need the
    same re-validation recipe as the `_unscaled_long` pin.

    Scale shape: embarrassingly parallel map over one scan, no
    shuffle; per-row cost is bounded (64 pixels) - the plan a 100 TB
    integrity sweep of a binary-payload corpus would use.
    """
    import numpy as np
    import pandas as pd

    from ..jpeg import jpeg_decode, jpeg_encode
    from ..media_codecs import (
        bmp_decode,
        bmp_encode,
        gif_decode,
        gif_encode,
        png_decode,
        png_encode,
    )

    schema = (
        "doc_id long, png_sum long, gif_sum long, bmp_sum long, jpeg_dc long"
    )

    def run(batches):
        for batch in batches:
            if not len(batch):
                continue
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                cps = [ord(c) % 256 for c in (text or "")[:64]]
                arr = np.zeros(64, dtype=np.uint8)
                arr[: len(cps)] = cps
                img = arr.reshape(8, 8, 1)
                s = int(arr.sum())
                _, _, _, p = png_decode(
                    png_encode(img, filter_type=int(doc_id) % 5)
                )
                rgb = np.repeat(img, 3, axis=2)
                _, _, _, g = gif_decode(gif_encode(rgb))
                _, _, _, m = bmp_decode(bmp_encode(rgb))
                _, _, _, j = jpeg_decode(
                    jpeg_encode(np.full((8, 8), s % 256, np.uint8), quality=95)
                )
                rows.append(
                    (int(doc_id), int(p.sum()), int(g[:, :, 0].sum()),
                     int(m[:, :, 0].sum()), int(j[0, 0, 0]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "png_sum", "gif_sum", "bmp_sum", "jpeg_dc"],
            )

    return (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .mapInPandas(run, schema=schema)
    )
