"""Print the checked-window rotation state: which catalog queries have
a driver CORRECTNESS row from some round's 50-query window, and which
are still unchecked (the pool the next round's CHECK_PRIORITY should
promote, oracle-paired first).

    python tools/next_cohort.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark.queries import CHECK_PRIORITY, QUERIES  # noqa: E402
from tests.test_catalog_order import CHECKED_WINDOW, PRIOR_ROUNDS_CHECKED  # noqa: E402


def main() -> None:
    head = set(list(QUERIES)[:CHECKED_WINDOW])
    checked = PRIOR_ROUNDS_CHECKED | head
    pool = [n for n in QUERIES if n not in checked]
    oracle_pool = [n for n in pool if QUERIES[n].oracle]
    print(f"catalog: {len(QUERIES)}  driver-checked so far: {len(checked & set(QUERIES))}")
    print(f"never-checked pool: {len(pool)} ({len(oracle_pool)} oracle-paired)\n")
    print("# oracle-paired candidates for the next CHECK_PRIORITY head:")
    for n in oracle_pool:
        print(f'    "{n}",')
    rows_only = [n for n in pool if not QUERIES[n].oracle]
    if rows_only:
        print("\n# rows-only (weak check; spend head slots on these last):")
        for n in rows_only:
            print(f"    # {n}")
    assert list(QUERIES)[: len(CHECK_PRIORITY)] == list(CHECK_PRIORITY)


if __name__ == "__main__":
    main()
