"""The external gate hash-checks a prefix of the catalog (the first 50
registrations). Round 2 proved a family-spanning head (50/50 green in
CORRECTNESS_r02.json); round 3 rotates the window to queries with no
prior driver row. These tests pin the rotation contract: the head stays
the registration prefix, spends its slots on oracle-paired queries, is
mostly NEW (>= 45 without a prior driver row), and the CUMULATIVE
checked set across rounds still spans every operator family."""

from reactive_data_pipeline_spark.queries import CHECK_PRIORITY, QUERIES

CHECKED_WINDOW = 50

#: The 50 queries the driver verified green in round 2 (frozen history:
#: the keys of CORRECTNESS_r02.json). The rotation policy is defined
#: relative to this set.
ROUND2_CHECKED = frozenset(
    {
        "ticker_count", "ticker_last5", "symbol_minmax", "ticker_meta_build",
        "window_running_minmax_ticker", "events_daily_activity",
        "events_dedup_stats", "reactive_ticker_meta_stream", "text_stats",
        "lang_id_docs", "doc_fingerprints", "dedup_exact_docs", "dedup_keep_one",
        "ngram_jaccard_pairs", "neardup_groups_connected",
        "minhash_recall_contract", "ann_recall_contract", "knn_brute_cosine",
        "stream_join_attribution", "embedding_neardup_pairs", "mm_decode",
        "chunk_docs", "pack_chunk_bins", "train_val_split",
        "training_data_pipeline", "json_props_by_type", "event_types_per_user",
        "approx_distinct_users", "corr_qty_price_by_flag",
        "contamination_ngram_overlap", "streaming_dedup_docs",
        "training_shards_manifest", "q1_pricing_summary",
        "count_distinct_lineitem", "rollup_lineitem_flags",
        "pivot_priority_status", "orders_by_month", "filter_events_click",
        "proj_part_catalog", "topk_orders", "q3_shipping_priority",
        "broadcast_nation_region", "semi_customers_with_orders",
        "anti_customers_no_urgent", "asof_purchase_before_click",
        "range_join_value_bands", "full_outer_daily_mix",
        "set_nations_intersect", "window_top3_orders_per_cust",
        "sessionize_events",
    }
)


def test_priority_head_is_the_registration_prefix():
    names = list(QUERIES)
    assert names[: len(CHECK_PRIORITY)] == list(CHECK_PRIORITY)
    assert len(CHECK_PRIORITY) <= CHECKED_WINDOW


def test_head_rotates_to_unchecked_queries():
    """>= 45 of the checked window must be queries with NO round-2
    driver row (the judge's rotation directive); the remainder are
    deliberate canaries."""
    head = list(QUERIES)[:CHECKED_WINDOW]
    fresh = [n for n in head if n not in ROUND2_CHECKED]
    assert len(fresh) >= 45, f"only {len(fresh)} newly-checked queries in the window"


def test_cumulative_checked_set_spans_every_family():
    """Families proven in round 2 stay proven; the union of all
    driver-checked cohorts must cover every SURVEY section-2 /
    section-7.5 family tag."""
    cumulative = ROUND2_CHECKED | set(list(QUERIES)[:CHECKED_WINDOW])
    required_tags = {
        "reference", "streaming", "reactive", "text", "dedup", "minhash",
        "similarity", "pandas_udf", "multimodal", "chunking", "packing",
        "split", "pipeline", "agg", "filter", "project", "topk", "join",
        "broadcast", "semi", "anti", "asof", "range", "outer", "setop",
        "distinct", "window", "session", "rollup", "pivot", "datetime",
        "json", "collection", "sketch", "stats",
        # families first driver-checked in round 3
        "tpch", "subquery", "correlated", "exists", "quality", "quantization",
        "cdc", "drift", "skew", "percentile", "gapfill", "unpivot", "funnel",
        "cohort", "tfidf", "pii", "grouping_sets", "contract",
    }
    covered = {t for n in cumulative if n in QUERIES for t in QUERIES[n].tags}
    missing = required_tags - covered
    assert not missing, f"families missing from cumulative checked set: {missing}"


def test_priority_head_fully_oracle_checked():
    """Rows-only entries get only the weak check - the rotated window
    spends every slot on value-hash-checkable queries."""
    head = list(QUERIES)[:CHECKED_WINDOW]
    rows_only = [n for n in head if QUERIES[n].oracle is None]
    assert not rows_only, rows_only


def test_doc_counts_match_registry():
    """README/COVERAGE/CATALOG counts must track the live registry -
    the round-2 advice item (stale '145 oracle-checked') as a test."""
    import re
    from pathlib import Path

    total = len(QUERIES)
    oracled = sum(1 for q in QUERIES.values() if q.oracle)
    root = Path(__file__).resolve().parent.parent
    for fname in ("README.md", "COVERAGE.md", "CATALOG.md"):
        text = (root / fname).read_text()
        m = re.search(r"(\d+) queries[,;] (\d+) (?:oracle-checked|DuckDB-oracle)", text)
        assert m, f"{fname}: no count line found"
        assert (int(m.group(1)), int(m.group(2))) == (total, oracled), (
            f"{fname} says {m.group(0)!r}, registry has {total}/{oracled} - "
            f"regenerate CATALOG.md and update the docs"
        )
