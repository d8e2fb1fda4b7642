"""Steady-state check-window state: per-query driver-evidence age and
the mechanically derived next window (round-6 verdict #1).

Rounds 1-6 rotated the driver's 50-query window for coverage; the
never-checked pool hit 0 in round 6. From round 7 the window follows
the staleness-clock policy implemented in
``tests/test_catalog_order.py::derive_check_window`` (canaries +
``queries.ROUND_CHANGED`` + rows-only entries + oldest-last-green
fill). This tool reports evidence age per query and emits the derived
window for pasting into ``queries/__init__.py::CHECK_PRIORITY``.

    python tools/next_cohort.py          # age histogram + drift check
    python tools/next_cohort.py --emit   # print the derived window
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from reactive_data_pipeline_spark.queries import (  # noqa: E402
    CHECK_PRIORITY,
    QUERIES,
    ROUND_CHANGED,
)
from tests.test_catalog_order import (  # noqa: E402
    CANARIES,
    CHECKED_WINDOW,
    ROUND_HISTORY,
    derive_check_window,
    last_green_round,
)


def main() -> None:
    derived = derive_check_window()
    if "--emit" in sys.argv:
        print("CHECK_PRIORITY: tuple[str, ...] = (")
        sections = {
            "canaries": set(CANARIES),
            "this round's changed machinery": set(ROUND_CHANGED) - set(CANARIES),
            "rows-only (weak check keeps executing)": {
                n for n in QUERIES if QUERIES[n].oracle is None
            },
        }
        emitted: set[str] = set()
        for label, members in sections.items():
            print(f"    # --- {label} ---")
            for n in derived:
                if n in members and n not in emitted:
                    print(f'    "{n}",')
                    emitted.add(n)
        print("    # --- stale fill: oldest last-green round first ---")
        for n in derived:
            if n not in emitted:
                print(f'    "{n}",  # r{last_green_round(n)}')
        print(")")
        return

    this_round = max(ROUND_HISTORY) + 1
    ages = {n: this_round - last_green_round(n) for n in QUERIES}
    hist = Counter(ages.values())
    print(f"catalog: {len(QUERIES)}  window: {CHECKED_WINDOW}  round: {this_round}")
    print("evidence age (rounds since last green driver row):")
    for age in sorted(hist):
        print(f"  age {age}: {hist[age]} queries")
    stale = sorted(ages, key=lambda n: (-ages[n], n))[:10]
    print("\noldest evidence:")
    for n in stale:
        print(f"  r{last_green_round(n)}  {n}")
    head = list(QUERIES)[:CHECKED_WINDOW]
    if tuple(head) != derived or tuple(CHECK_PRIORITY) != derived:
        print("\nDRIFT: CHECK_PRIORITY != derived window - regenerate with --emit")
        sys.exit(1)
    covered = set(head)
    post = [this_round - last_green_round(n) for n in QUERIES if n not in covered]
    print(f"\nwindow OK (matches policy); worst post-round age: {max(post, default=0)}")


if __name__ == "__main__":
    main()
