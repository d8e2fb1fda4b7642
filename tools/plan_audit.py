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
        # EXECUTE before reading the plan, and execute via collect():
        # executedPlan() on an un-executed frame is the INITIAL
        # adaptive plan (isFinalPlan=false), and a noop WRITE executes
        # a *different* QueryExecution (the write command wraps the
        # logical plan in a fresh one), leaving this frame's own plan
        # un-finalized - verified empirically in round 5: after a noop
        # drain isFinalPlan stays false; after collect() it is true.
        # collect() runs the dataset's own QueryExecution, so the
        # re-read below sees AQE's real output (join demotions, shuffle
        # coalescing, skew splits). Result sizes at sf0.001 are tiny.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # RuntimeError, not assert: this guard is what keeps the audit
        # from regressing to counting pre-AQE initial plans (the r1-r4
        # bug), and an assert would vanish under `python -O`.
        if "AdaptiveSparkPlan" in plan and "isFinalPlan=true" not in plan:
            raise RuntimeError(f"plan not finalized (pre-AQE) for {name}")
        # The finalized AdaptiveSparkPlan prints BOTH sections
        # ("== Final Plan ==" then "== Initial Plan =="); counting the
        # whole string would double every node. Keep the final section
        # only.
        plan = plan.split("== Initial Plan ==")[0]
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
    print("Counts are EXECUTED operators: a subtree the final plan reuses "
          "(ReusedExchange)")
    print("prints - and counts - once, so these are lower than the initial-"
          "plan counts")
    print("rounds 1-4 reported (which also, it turned out, were what the "
          "noop-drained")
    print("audit was actually reading - see ROUND5_NOTES.md).")
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
