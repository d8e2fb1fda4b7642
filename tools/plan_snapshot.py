"""Snapshot ``explain("formatted")`` for bench queries into plans/r12/.

    python tools/plan_snapshot.py before [query ...]
    python tools/plan_snapshot.py after  [query ...]

With no query names, snapshots every bench-tagged catalog query. The
files are the optimization round's evidence trail: <query>_before.txt
is the plan at the round's start, <query>_after.txt after the change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", ROUND)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, q in QUERIES.items() if q.bench]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-snapshot", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = QUERIES[name]
        df = q.build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
