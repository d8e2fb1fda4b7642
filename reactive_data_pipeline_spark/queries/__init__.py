"""Named query catalog: the engine's oracle-checked surface.

Every operator family from SURVEY.md section 2 (plus the section 7.5
LLM-pipeline operators) is represented by at least one named query. Each
entry pairs

* ``build(spark, sf_dir) -> DataFrame`` - the Spark-native implementation,
* ``oracle`` - equivalent ANSI SQL executed by DuckDB on the same parquet
  (``None`` for genuinely non-SQL-expressible ops -> driver records a
  rows-only check).

Determinism rules (enforced throughout, see operators.relational):
aliases match between Spark and SQL; double sums go through decimal;
timestamps leave as epoch-micros/dates; every LIMIT has a total order.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Runtime-settable SQL confs every catalog query depends on; applied
#: defensively because the driver harness supplies its own session.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The driver's vanilla session defaults to 200 shuffle partitions;
    # at correctness-gate scale that is pure scheduling overhead (AQE
    # coalesces, but fewer initial partitions are still cheaper).
    "spark.sql.shuffle.partitions": "32",
}


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate catalog query {name!r}")

        @functools.wraps(fn)
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            for k, v in RUNTIME_CONF.items():
                spark.conf.set(k, v)
            return fn(spark, sf_dir)

        QUERIES[name] = CatalogQuery(name=name, build=build, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


# Import for side effects: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_ext2  # noqa: E402,F401
from . import relational_ext3  # noqa: E402,F401
from . import reference  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import llm2  # noqa: E402,F401
from . import llm3  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import llm4  # noqa: E402,F401

#: The external gate checks a prefix of the catalog in registration
#: order (exactly the first 50). Cumulative driver coverage after five
#: rounds: 206/228 (per-round key sets frozen in
#: tests/test_catalog_order.py). Round 6 is the CLOSURE rotation
#: (verdict #1): the window carries ALL 22 never-driver-checked
#: queries - the 14 deferred single-shape analytics plus the 8
#: formerly-rows-only entries (4 of which were hardened into DuckDB
#: oracle contracts this round: minhash_neardup_pairs,
#: minhash_dedup_groups, knn_ivf_cosine, knn_lsh_cosine; the other 4
#: stay rows-only with justifications in CATALOG.md) - so after this
#: round every catalog query has a driver row at least once
#: (228/228). The remaining 28 slots are canaries (flagship v1+v2, q1,
#: the reactive stream) and re-checks biased toward this round's
#: changed machinery: the IVF quantizer swap (pyspark.ml KMeans ->
#: deterministic decimal-exact Lloyd), the ann_recall floor change,
#: the pyds sink staging scope, and the oracle twins of the four
#: hardened contracts. Everything not listed keeps its original
#: relative order after the head; local tools/parity.py checks all
#: entries regardless.
CHECK_PRIORITY: tuple[str, ...] = (
    # --- canaries: flagships, relational anchor, streaming path ---
    "training_data_pipeline",
    "q1_pricing_summary",
    "reactive_ticker_meta_stream",
    "training_data_pipeline_v2",
    # --- the 14 deferred oracle-paired analytics (round-5 pool) ---
    "dup_ngram_coverage",
    "nearest_centroid_confusion",
    "temperature_mix_rates",
    "winsorized_quantity_stats",
    "token_cooccurrence_top",
    "arrow_char_lengths",
    "source_vocab_jaccard",
    "dedup_rate_by_source",
    "embedding_dim_moments",
    "cross_source_dup_matrix",
    "user_activity_freq_spectrum",
    "event_gap_log_histogram",
    "events_dow_hour_heatmap",
    "customer_rfm_segments",
    # --- the 4 hardened former-rows-only entries (now contracts) ---
    "minhash_neardup_pairs",
    "minhash_dedup_groups",
    "knn_ivf_cosine",
    "knn_lsh_cosine",
    # --- the 4 justified rows-only entries (weak check, closes 228/228) ---
    "simhash_near_pairs",
    "embedding_neardup_lsh",
    "mm_resize",
    "mm_frame_sample",
    # --- re-checks: this round's changed machinery + oracle twins.
    # Round-6 continuations rewrote: the exact-sum radix digits (q1/q6/
    # sessionize/events_daily/salted/reagg ride them), the score-once
    # barrier in pipelines v1/v2 + corpus ingest, tokens() (udtf/ngram
    # consumers), the prefix-filtered ngram join (+ its CC consumer),
    # degree-oriented triangles, the kcore loop, the 30d window revert,
    # and the pyds sink staging (earlier in round 6). ---
    "ann_recall_contract",
    "knn_brute_cosine",
    "ngram_jaccard_pairs",
    "triangle_count_copurchase",
    "kcore_peel_rounds",
    "minhash_recall_contract",
    "simhash_recall_contract",
    "embedding_recall_contract",
    "embedding_neardup_pairs",
    "ngram3_jaccard_pairs",
    "neardup_groups_connected",
    "pyds_ticker_feed",
    "pyds_ticker_roundtrip",
    # --- re-checks: broad-family regression spread ---
    "training_shards_manifest",
    "scd2_stream_dim",
    "corpus_ingest_incremental",
    "streaming_neardup_contract",
    "salted_user_totals",
    "reagg_daily_to_weekly",
    "udtf_trigram_top",
    "window_range_30d_totals",
    "q6_forecast_revenue",
    "sessionize_events",
    "events_daily_activity",
)

_missing = [n for n in CHECK_PRIORITY if n not in QUERIES]
if _missing:  # fail at import, not at driver time
    raise RuntimeError(f"CHECK_PRIORITY names unknown queries: {_missing}")
_rest = {n: q for n, q in QUERIES.items() if n not in set(CHECK_PRIORITY)}
_head = {n: QUERIES[n] for n in CHECK_PRIORITY}
QUERIES.clear()
QUERIES.update(_head)
QUERIES.update(_rest)

__all__ = ["QUERIES", "CatalogQuery", "register", "CHECK_PRIORITY"]
