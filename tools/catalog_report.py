"""Generate CATALOG.md: one row per registered query (name, check kind,
tags, bench flag, docstring summary). Run after adding queries:

    python tools/catalog_report.py > CATALOG.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    print("# CATALOG — every registered query (auto-generated)\n")
    print(
        f"{len(QUERIES)} queries; {n_oracle} DuckDB-oracle value-hash checked, "
        f"{len(QUERIES) - n_oracle} rows-only (hash-/sketch-/UDF-specific). "
        "Regenerate with `python tools/catalog_report.py > CATALOG.md`.\n"
    )
    print("| query | check | bench | tags | summary |")
    print("|---|---|---|---|---|")
    for name, q in QUERIES.items():
        doc = (q.build.__wrapped__.__doc__ or q.build.__doc__ or "").strip()
        summary = " ".join(doc.split("\n\n")[0].split())
        if len(summary) > 110:
            summary = summary[:107] + "..."
        check = "oracle" if q.oracle is not None else "rows-only"
        bench = "yes" if q.bench else ""
        print(f"| `{name}` | {check} | {bench} | {', '.join(q.tags)} | {summary} |")


if __name__ == "__main__":
    main()
