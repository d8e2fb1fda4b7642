"""Generate PLANS.md: the formatted physical plans of the flagship
queries, with the scale-relevant properties called out. Evidence that
the declarative operators actually get the Catalyst treatment the
docstrings claim - regenerate after plan-affecting changes:

    python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.plans import physical_plan  # noqa: E402
from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: (query, what to look for in the plan)
SHOWCASE = [
    (
        "q1_pricing_summary",
        "Pushed filter reaches the scan (`PushedFilters`); two "
        "`HashAggregate`s = partial (map-side) + final; one exchange.",
    ),
    (
        "q5_region_revenue",
        "Six-table star: every dimension broadcasts (`BroadcastHashJoin`); "
        "the single `Exchange hashpartitioning` is the lineitem⋈orders "
        "fact-fact join.",
    ),
    (
        "asof_purchase_before_click",
        "As-of via union+window: exactly ONE hash exchange (the window's), "
        "no range cross-product.",
    ),
    (
        "training_data_pipeline_v2",
        "The full curation pipeline: bloom build + broadcast verify (no "
        "corpus shuffle for decontamination/mixing), content-keyed dedup "
        "window, KEYED pack window - 6 hash exchanges total.",
    ),
    (
        "training_data_pipeline",
        "The composed quality→dedup→chunk→pack pipeline as one plan; the "
        "pack window is KEYED (`__bucket`) - no unpartitioned WindowExec "
        "anywhere.",
    ),
    (
        "minhash_neardup_pairs",
        "Banded LSH: signatures are JVM higher-order functions (no Python "
        "nodes), candidates come from the band-bucket equi join - never an "
        "all-pairs product.",
    ),
    (
        "nearest_centroid_confusion",
        "Codebook broadcasts (`BroadcastNestedLoopJoin` on a 10-row dim); "
        "argmax is a map-combined `min_by` partial aggregate - the corpus "
        "itself never shuffles.",
    ),
    (
        "interval_attribution_counts",
        "Point-in-interval join lowered to a keyed EQUI join on "
        "(user, hour-bucket) with the exact bound as a residual filter - "
        "no BroadcastNestedLoopJoin on the fact side.",
    ),
    (
        "scd2_user_tier_dim",
        "Three window functions (lag change-detect, lead closure, "
        "row_number versioning) share ONE user_id exchange.",
    ),
    (
        "semdedup_cluster_pairs",
        "SemDeDup: centroid codebook broadcasts, assignment argmax is a "
        "map-combined min_by, and the pair join is a hash join KEYED BY "
        "CLUSTER over the checkpointed assignment - O(N^2/k) candidates, "
        "no CartesianProduct.",
    ),
    (
        "bigram_logprob_docs",
        "Bigram LM without a broadcast model: counts collapse map-side, "
        "the (bigram -> logp) table returns via a KEYED hash join on the "
        "gram, per-doc scores are integer partial aggregates.",
    ),
    (
        "kcore_peel_rounds",
        "Iterative peel: each round is a map-combined degree aggregate + "
        "two vertex-keyed joins over the localCheckpoint-ed edge frame - "
        "lineage stays flat across 8 rounds.",
    ),
    (
        "pyds_ticker_feed",
        "Custom Python DataSource scan: `BatchScan tickerfeed` with one "
        "input partition per symbol (planned Python-side), no exchange - "
        "rows enter the JVM already partitioned by the connector.",
    ),
    (
        "prefix_containment_pairs",
        "Containment dedup: the candidate join is a HASH join keyed by "
        "the 32-char prefix (`pk`) - one exchange per side, startswith "
        "verify as a post-join filter, never a cross product.",
    ),
    (
        "retrieve_rerank_cell",
        "Two-stage retrieval: the query block BROADCASTS into the "
        "cell-keyed candidate join (corpus scanned once over the "
        "checkpointed assignment); the only exchange after scoring is "
        "the query-keyed ranking window.",
    ),
    (
        "bpe_train_rounds",
        "Iterative BPE: each round is ONE vocabulary-keyed hash "
        "aggregate + a 1-row TakeOrdered broadcast; the greedy merge "
        "fold is a JVM higher-order function (no Python nodes), and "
        "localCheckpoint keeps round-4 lineage flat.",
    ),
    (
        "recursive_cte_bfs",
        "WITH RECURSIVE (Spark 4): the engine plans the BFS loop "
        "itself - each recursion step is a vertex-keyed hash join of "
        "the frontier against the edge list, the same per-round plan "
        "the hand-rolled pagerank/kcore loops build.",
    ),
    (
        "xml_roundtrip_by_type",
        "Native XML: serialize + from_xml parse are per-row JVM "
        "expressions inside whole-stage codegen; one map-combined "
        "aggregate - no Python nodes anywhere in the XML path.",
    ),
]


def main() -> None:
    spark = get_spark("plan-report", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    print("# PLANS — flagship physical plans (auto-generated)\n")
    print(
        "Formatted `.explain` output at sf0.001 (plan SHAPE is "
        "sf-independent; AQE may re-plan exchanges at runtime). "
        "Regenerate: `python tools/plan_report.py > PLANS.md`.\n"
    )
    for name, note in SHOWCASE:
        df = QUERIES[name].build(spark, SF_DIR)
        print(f"## {name}\n\n{note}\n")
        print("```")
        plan = physical_plan(df)
        # keep the operator tree + details, drop trailing whitespace noise
        print("\n".join(line.rstrip() for line in plan.splitlines()))
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
