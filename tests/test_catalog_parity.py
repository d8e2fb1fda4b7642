"""Differential test: every oracle-paired catalog query vs DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01 - SURVEY.md
section 5.2)."""

from __future__ import annotations

import duckdb
import pytest

from reactive_data_pipeline_spark.queries import QUERIES

from .conftest import SF_DIR
from .helpers import canon

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_oracle_parity(spark, oracle, name):
    q = QUERIES[name]
    sdf = q.build(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = oracle.sql(q.oracle)
    ocols, orows = list(res.columns), res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert canon(srows, sdf.columns) == canon(orows, ocols)


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle is None])
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].build(spark, SF_DIR)
    assert df.collect() is not None
