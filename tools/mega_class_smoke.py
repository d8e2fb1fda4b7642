"""Mega-class (degenerate dup-multiplicity) smoke for the linear
dedup-groups path at volume - the round-9 skew pin, promoted to a
committed tool for the round-10 400x cell of the volume x skew matrix.

Shape: the fixture's documents UNIONed with ``--copies`` exact copies
of doc 0 (boilerplate at corpus scale: ONE content class at six-figure
multiplicity on top of the fixture's own ~4.4-copy classes). The
quotient path must keep candidate mass representative-driven (the
mega class collapses map-side on the 128-bit content key), produce
exactly one group for the planted class + doc 0's genuine near-dups,
and keep the keeper at min id 0.

Planted IDs sit above 40e9: scale_data's copy encoding pushes fixture
doc_ids toward 39e9, and an overlapping planted range silently merges
planted rows with fixture rows (the round-9 first-attempt bug).

Usage: python tools/mega_class_smoke.py [sf_dir] [--copies N]
           [--threshold T]

Prints one JSON line: wall seconds, group count, mega-group size,
keeper id, singleton checksum.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from reactive_data_pipeline_spark import get_spark  # noqa: E402
from reactive_data_pipeline_spark.dedup import minhash_neardup_groups  # noqa: E402
from reactive_data_pipeline_spark.queries import _apply_runtime_conf  # noqa: E402
from reactive_data_pipeline_spark.sources import read_table  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])

    def opt(flag: str, default, cast):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    copies = opt("--copies", 100_000, int)
    threshold = opt("--threshold", 0.9, float)
    sf_dir = args[0] if args else "/tmp/spark_graft_scale/sf4"

    spark = get_spark()
    _apply_runtime_conf(spark)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_text = docs.filter(F.col("doc_id") == 0).select("text").first()[0]
    n_docs = docs.count()
    planted = spark.range(copies).select(
        (F.col("id") + F.lit(50_000_000_000)).alias("doc_id"),
        F.lit(base_text).alias("text"),
    )
    corpus = docs.unionByName(planted)

    t0 = time.time()
    out = minhash_neardup_groups(corpus, n=1, threshold=threshold)
    mega = (
        out.filter(F.col("group_id") == 0)
        .agg(
            F.count(F.lit(1)).alias("members"),
            F.min(F.when(F.col("is_keeper"), F.col("doc_id"))).alias("keeper"),
        )
        .first()
    )
    counts = out.agg(
        F.countDistinct("group_id").alias("groups"),
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("group_size") == 1, 1).otherwise(0)).alias(
            "singletons"
        ),
    ).first()
    wall = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "metric": "mega_class_smoke",
                "sf_dir": sf_dir,
                "copies": copies,
                "docs": n_docs,
                "wall_sec": wall,
                "rows": counts["rows"],
                "groups": counts["groups"],
                "singletons": counts["singletons"],
                "mega_members": mega["members"],
                "mega_keeper": mega["keeper"],
            }
        )
    )
    assert counts["rows"] == n_docs + copies, "row drop/dup in groups output"
    assert mega["keeper"] == 0, "mega-class keeper must be min id 0"
    assert mega["members"] > copies, "planted class failed to group"
    spark.stop()


if __name__ == "__main__":
    main()
