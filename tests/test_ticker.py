"""Reference-semantics tests over the ticker fixture (SURVEY.md
section 5.3: timezone day bucketing, min/max aggregation, last-5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reactive_data_pipeline_spark.operators import ticker as tk


def _events(spark):
    rows = [
        # Bangkok-day boundary: 16:59:59Z belongs to the same BKK day,
        # 17:00:00Z tips into the next (UTC+7).
        (0, dt.datetime(2024, 1, 1, 16, 59, 59), 0, "click", 10.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 17, 0, 0), 0, "click", 20.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 12, 0, 0), 1, "view", 5.0, "{}"),
        (3, dt.datetime(2024, 1, 2, 1, 0, 0), 0, "view", 30.0, "{}"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )


def test_derive_ticker_deterministic_mapping(spark):
    t = tk.derive_ticker(_events(spark))
    rows = {r.id: r for r in t.collect()}
    assert rows[0].symbol == "XT" and rows[2].symbol == "SCHX"
    assert rows[0].market_price == 10.0
    assert rows[0].created_at == dt.datetime(2024, 1, 1, 16, 59, 59)
    assert set(t.columns) == set(
        "id name quote_type symbol nav_price market_price market_open day_high day_low previous_close created_at updated_at".split()
    )


def test_ticker_meta_bangkok_day_boundary(spark):
    meta = tk.build_ticker_meta(tk.derive_ticker(_events(spark)))
    got = {(r.symbol, r["partition"]): (r.monthly_min_market_price, r.monthly_max_market_price) for r in meta.collect()}
    # events 0 -> day 20240101; 1 and 3 -> day 20240102 (BKK +7h)
    assert got[("XT", "20240101")] == (10.0, 10.0)
    assert got[("XT", "20240102")] == (20.0, 30.0)
    assert got[("SCHX", "20240101")] == (5.0, 5.0)


def test_symbol_minmax_single_scan(spark):
    mm = tk.symbol_minmax(tk.derive_ticker(_events(spark)), "XT").collect()[0]
    assert (mm.min_market_price, mm.max_market_price, mm.symbol) == (10.0, 30.0, "XT")


def test_ticker_last5_tiebreak(spark):
    t = tk.derive_ticker(_events(spark))
    rows = tk.ticker_last5(t).collect()
    assert [r.id for r in rows] == [3, 1, 0, 2]
