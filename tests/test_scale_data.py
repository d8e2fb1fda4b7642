"""tools/scale_data.py - the volume scaler behind the SCALING.md
ratio-curve evidence must preserve the invariants the catalog relies
on: driver-identical schemas/layout, disjoint per-copy keys,
referential integrity per copy, copy-0 byte-identity (literal-key
anchors like vec_id=0 keep existing), and consistent derived columns
(documents.n_chars vs the rotated text)."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

from .conftest import REPO, SF_DIR

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
COPIES = 2
STRIDE = 1_000_000_000


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("scale") / "sfx"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "scale_data.py"), str(COPIES),
         "--src", SF_DIR, "--out", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return str(out)


def _one(con, sql):
    return con.sql(sql).fetchone()[0]


def test_rowcounts_and_fixed_dims(scaled_dir):
    con = duckdb.connect()
    for t in TABLES:
        n_src = _one(con, f"SELECT count(*) FROM '{SF_DIR}/{t}.parquet'")
        n_out = _one(con, f"SELECT count(*) FROM '{scaled_dir}/{t}.parquet'")
        want = n_src if t in ("nation", "region") else n_src * COPIES
        assert n_out == want, (t, n_src, n_out)


def test_schemas_identical_to_driver_layout(scaled_dir):
    con = duckdb.connect()
    for t in TABLES:
        a = con.sql(f"DESCRIBE SELECT * FROM '{scaled_dir}/{t}.parquet'").fetchall()
        b = con.sql(f"DESCRIBE SELECT * FROM '{SF_DIR}/{t}.parquet'").fetchall()
        assert a == b, t


def test_keys_unique_and_fks_hold(scaled_dir):
    con = duckdb.connect()
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id")]:
        assert _one(con, f"SELECT count(*)=count(DISTINCT {k}) FROM '{scaled_dir}/{t}.parquet'"), t
    for fk, pk, ft, pt in [("o_custkey", "c_custkey", "orders", "customer"),
                           ("l_orderkey", "o_orderkey", "lineitem", "orders"),
                           ("l_partkey", "p_partkey", "lineitem", "part"),
                           ("l_suppkey", "s_suppkey", "lineitem", "supplier")]:
        dangling = _one(con, f"""
            SELECT count(*) FROM '{scaled_dir}/{ft}.parquet' f
            LEFT JOIN '{scaled_dir}/{pt}.parquet' p ON f.{fk} = p.{pk}
            WHERE p.{pk} IS NULL""")
        assert dangling == 0, (ft, fk)


def test_copy0_identity_and_copies_perturbed(scaled_dir):
    con = duckdb.connect()
    # copy 0 is byte-identical (anchor rows like vec_id=0 survive)
    assert _one(con, f"""
        SELECT count(*)=0 FROM '{scaled_dir}/documents.parquet' s
        JOIN '{SF_DIR}/documents.parquet' o USING (doc_id)
        WHERE s.text <> o.text""")
    assert _one(con, f"SELECT count(*)=1 FROM '{scaled_dir}/embeddings.parquet' WHERE vec_id=0")
    # copy 1 text is letter-rotated (differs) but length-preserving
    assert _one(con, f"""
        SELECT count(*)>0 FROM '{scaled_dir}/documents.parquet' s
        JOIN '{SF_DIR}/documents.parquet' o ON s.doc_id = o.doc_id + {STRIDE}
        WHERE s.text <> o.text""")
    assert _one(con, f"""
        SELECT count(*)=0 FROM '{scaled_dir}/documents.parquet'
        WHERE length(text) <> n_chars""")
    # copy 1 embeddings are direction-perturbed, not rescaled copies
    assert _one(con, f"""
        SELECT count(*)>0 FROM '{scaled_dir}/embeddings.parquet' s
        JOIN '{SF_DIR}/embeddings.parquet' o ON s.vec_id = o.vec_id + {STRIDE}
        WHERE s.embedding <> o.embedding""")


def test_cross_copy_embeddings_decorrelated(scaled_dir):
    """Cross-copy cosine must NOT cluster near 1.0: a weak perturbation
    gave every vector K-1 near-duplicates at cos~0.987 and the banded
    near-dup queries hit quadratic pair mass (70 GB of sort spill at
    K=40). The cyclic shift keeps copies as distinct directions."""
    con = duckdb.connect()
    dot = ("list_reduce(list_prepend(0.0, [CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)"
           " FOR i IN generate_series(1, len(a.e))]), (x, y) -> x + y)")
    nrm = ("sqrt(list_reduce(list_prepend(0.0, [CAST({v}.e[i] AS DOUBLE) ** 2"
           " FOR i IN generate_series(1, len({v}.e))]), (x, y) -> x + y))")
    mean_cos, max_cos = con.sql(f"""
        WITH a AS (SELECT vec_id, embedding e FROM '{scaled_dir}/embeddings.parquet'
                   WHERE vec_id < {STRIDE}),
             b AS (SELECT vec_id - {STRIDE} AS vec_id, embedding e
                   FROM '{scaled_dir}/embeddings.parquet'
                   WHERE vec_id >= {STRIDE} AND vec_id < 2 * {STRIDE})
        SELECT avg(cos), max(cos) FROM (
          SELECT {dot} / ({nrm.format(v='a')} * {nrm.format(v='b')}) AS cos
          FROM a JOIN b USING (vec_id))""").fetchone()
    assert abs(mean_cos) < 0.2 and max_cos < 0.9, (mean_cos, max_cos)
