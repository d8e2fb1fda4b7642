"""DuckDB twin of bench.py: times each bench-tagged catalog query's
oracle SQL on the same parquet, warm, with the same thread budget -
the denominator of BENCH_NOTES.md's ratio table.

    SPARK_GRAFT_CPUS=32 python tools/bench_duckdb.py [sf_dir]

Prints one JSON line mirroring bench.py's shape. Queries without an
oracle (engine-specific LSH/minhash paths) are reported as null, as
are queries whose oracle is an exact O(N^2) ground-truth twin of an
approximately-linear Spark path (BENCH_ORACLE_UNFAIR below): the
oracle exists for CORRECTNESS - it recomputes the all-pairs truth the
LSH pipeline must match - but timing it as the ratio denominator
would charge DuckDB quadratic work against Spark's linear plan
(flattering our ratio ~100x for free AND taking minutes at sf0.1).
The ratio contract stays on queries where both engines do comparable
work.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: bench-tagged queries whose oracle is the exact all-pairs ground
#: truth of an approximate linear path (round-6 hardening) - timed as
#: null, see the module docstring.
BENCH_ORACLE_UNFAIR = {"minhash_neardup_pairs"}


def run_twin(sf_dir: str, threads: int) -> dict:
    """Time each bench-tagged query's oracle on DuckDB, warm, and return
    the artifact dict (the same JSON shape main() prints)."""
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    times: dict[str, float | None] = {}
    total = 0.0
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        if q.oracle is None or name in BENCH_ORACLE_UNFAIR:
            times[name] = None
            continue
        con.sql(q.oracle).fetchall()  # warm (IO cache + plan)
        t0 = time.time()
        con.sql(q.oracle).fetchall()
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt
    con.close()
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    return {
        "metric": "duckdb_total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "threads": threads,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_twin(sf_dir, threads)))


if __name__ == "__main__":
    main()
