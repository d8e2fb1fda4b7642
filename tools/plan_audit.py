"""Generate PLAN_AUDIT.md: machine-extracted physical-plan properties
for EVERY catalog query - the executable companion to SCALE.md's
shuffle arithmetic. Where SCALE.md argues and tests/test_plans.py pins
individual shapes, this table lets a reviewer scan the whole catalog
for the properties that decide 100 TB behavior:

* hash exchanges (shuffles) and broadcast exchanges per query,
* join strategies actually chosen (broadcast hash / sort-merge /
  broadcast-nested-loop; CartesianProduct is forbidden by the guard
  test and would show up here),
* windows (all keyed - the guard test forbids empty partitionSpec),
* Python nodes, split into Arrow-batched (legitimate: pandas_udf /
  mapInPandas / grouped map / mapInArrow / Python data source) vs
  row-at-a-time BatchEvalPython, which must be ZERO catalog-wide.

Regenerate after plan-affecting changes:

    python tools/plan_audit.py > PLAN_AUDIT.md

Building a query materializes its inputs (streaming queries run their
availableNow micro-batches), so this takes a few minutes.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: (column header, regex counted over the executed plan string)
PROPS = [
    ("shuffles", r"Exchange hashpartitioning"),
    ("bcasts", r"BroadcastExchange"),
    ("BHJ", r"BroadcastHashJoin"),
    ("SMJ", r"SortMergeJoin"),
    ("BNLJ", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("windows", r"\bWindow\b"),
    ("arrow_py", r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                 r"|FlatMapCoGroupsInPandas|MapInArrow|PythonMapInArrow"
                 r"|AggregateInPandas|BatchScan .*PythonScan|PythonDataSource"),
    ("rowpy", r"BatchEvalPython"),
]


def main() -> None:
    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, q in QUERIES.items():
        df = q.build(spark, SF_DIR)
        # EXECUTE before reading the plan: executedPlan() on an
        # un-executed frame is the INITIAL adaptive plan
        # (isFinalPlan=false) - AQE's join demotions/shuffle coalescing
        # only exist after a run. Drain with bench.py's cost model:
        # top-k frames collect, everything else goes through noop.
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        if opt.startswith("GlobalLimit") or "TakeOrdered" in opt:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append((name, [len(re.findall(pat, plan)) for _, pat in PROPS]))
    rows.sort(key=lambda r: (-r[1][0], r[0]))

    print("# PLAN AUDIT — physical-plan properties of every catalog query")
    print()
    print(f"Auto-generated over {len(rows)} queries at sf0.001 "
          "(`python tools/plan_audit.py > PLAN_AUDIT.md`). Every query is")
    print("EXECUTED before its plan is read, so the counts are the FINAL "
          "adaptive plan")
    print("(post-AQE join demotions and shuffle coalescing at this SF; at "
          "larger SFs AQE")
    print("may choose differently - the per-shape guarantees live in "
          "tests/test_plans.py).")
    print("`rowpy` (row-at-a-time BatchEvalPython) must be zero everywhere; "
          "`cartesian`")
    print("likewise (both also pinned by catalog-wide guard tests). Sorted "
          "by shuffle")
    print("count - the top of this table is where 100 TB wall-clock goes.")
    print()
    totals = [sum(r[1][i] for r in rows) for i in range(len(PROPS))]
    print("| query | " + " | ".join(h for h, _ in PROPS) + " |")
    print("|---|" + "---|" * len(PROPS))
    for name, counts in rows:
        print(f"| `{name}` | " + " | ".join(str(c) for c in counts) + " |")
    print("| **total** | " + " | ".join(f"**{t}**" for t in totals) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
