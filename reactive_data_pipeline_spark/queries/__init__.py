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
#: order (exactly the first 50). Rounds 1-3 drove cumulative coverage
#: to 115/168 (union of CORRECTNESS_r01..r03 keys; frozen in
#: tests/test_catalog_order.py); round 4's rotated cohort (50/50 green)
#: brought the cumulative to 160/228. Round 5 rotates to the FOURTH
#: cohort: 4 canaries - the flagship pipeline, the q1 relational
#: anchor, the reactive streaming path, and weighted_median (whose
#: pandas-UDF registration form changed this round, so its r4 row
#: hashes retired code) - plus 46 oracle-paired queries that had no
#: driver row in any prior round (the round-4 continuation additions:
#: pipeline v2, SCD2/upsert machinery, SemDeDup/k-core/BPE train+encode,
#: containment dedup, retrieve-rerank, the Spark-4 SQL surfaces,
#: statestore introspection, and the Python DataSource pair).
#: Cumulative after this round: 206/228; the 22 remaining are 14
#: low-risk single-shape analytics (deferred to round 6, all
#: oracle-paired and parity-green) + 8 rows-only by construction (LSH
#: bucket contents / raw binary payloads whose QUALITY is hash-proven
#: via the recall/digest contract twins already checked). Everything
#: not listed keeps its original relative order after the head; local
#: tools/parity.py checks all entries regardless.
CHECK_PRIORITY: tuple[str, ...] = (
    # --- canaries: flagship, relational anchor, streaming path, and the
    # --- one query whose implementation changed this round ---
    "training_data_pipeline",
    "q1_pricing_summary",
    "reactive_ticker_meta_stream",
    "weighted_median_price_by_flag",
    # --- composed pipeline v2 + decontamination/mixing machinery ---
    "training_data_pipeline_v2",
    "bloom_decontam_contract",
    "quality_topfrac_by_source",
    "bigram_logprob_docs",
    "lang_mix_by_source",
    # --- dedup / similarity / clustering (round-4 additions) ---
    "semdedup_cluster_pairs",
    "hard_negative_mining",
    "prefix_containment_pairs",
    "retrieve_rerank_cell",
    "kmeans_embedding_clusters",
    "split_leakage_audit",
    "neardup_split_leakage",
    "group_kfold_sources",
    "epoch_shuffle_order",
    # --- BPE tokenizer lifecycle ---
    "bpe_pair_merges",
    "bpe_train_rounds",
    "bpe_encode_by_source",
    # --- pandas/Arrow UDF surfaces ---
    "asof_cogroup_pandas",
    "user_gap_stats_pandas",
    "udtf_trigram_top",
    # --- streaming / CDC / upsert machinery ---
    "corpus_ingest_incremental",
    "streaming_neardup_contract",
    "scd2_user_tier_dim",
    "scd2_stream_dim",
    "upsert_orders_snapshot",
    "stream_join_attribution_outer",
    "statestore_inspect_counts",
    "hopping_window_event_counts",
    # --- Python DataSource connector (batch + roundtrip) ---
    "pyds_ticker_feed",
    "pyds_ticker_roundtrip",
    # --- Spark-4 SQL surfaces ---
    "sql_api_nation_revenue",
    "recursive_cte_bfs",
    "pipe_syntax_type_stats",
    "collated_lang_counts",
    "variant_props_by_type",
    "xml_roundtrip_by_type",
    # --- time-series / sequence / graph analytics ---
    "interval_attribution_counts",
    "ohlc_hourly_user_value",
    "ewma_user_purchase_value",
    "retention_weekly_cohorts",
    "event_type_transitions",
    "event_pattern_counts",
    "cusum_daily_changepoint",
    "linreg_value_on_hour",
    "triangle_count_copurchase",
    "kcore_peel_rounds",
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
