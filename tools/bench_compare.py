"""Bench-regression comparator (round-6 verdict #4): compare two bench
artifacts with probe normalization and enforce the >1.5x-needs-a-
plan-diff rule that BENCH_NOTES.md previously applied by hand.

    python tools/bench_compare.py BENCH_r06.json BENCH_r07.json

Per query present in both artifacts it prints old/new seconds, the raw
ratio, and the probe-normalized ratio (each time divided by its
window's probe_sec). Neither ratio alone is trustworthy across
dissimilar windows: if the old window was busy (high probe), raw
ratios flatter the new run; linear probe normalization over-corrects
in exactly that case (probe measures scheduling state, which does not
scale query times linearly - observed: a 0.268->0.178 probe drift
turned a 1.18x raw total into a fictitious 1.78x normalized one while
the same-window DuckDB pair was unchanged at 0.97x). A GENUINE
regression shows in BOTH, so the flag fires on min(raw, normalized).
Entries over --threshold (default 1.5x) with a runtime above --floor
(default 0.4 s - below that, local scheduling jitter dominates and a
ratio is noise) REQUIRE an annotation line in BENCH_NOTES.md of the
form

    plan_changed[<query>]: <one-line reason>   # a genuine plan restatement
    flag_ok[<query>]: <one-line reason>        # investigated; not a plan
                                               # change (e.g. the old value
                                               # was an outlier vs the
                                               # query's artifact history)

otherwise the tool exits 1. An annotation for a query that is NOT
flagged is reported as stale (but not fatal) so the notes file cannot
accrete dead waivers.

Annotations SHOULD be scoped to the artifact pair they adjudicate
(round-9: an unscoped annotation applies to every future pair, so an
adjudicated waiver degrades into permanent stale-warning noise that
can mask a real one):

    plan_changed[<query>@r07r08]: <reason>

A scoped annotation is active only when comparing BENCH_r07 vs
BENCH_r08 (round numbers parsed from the artifact filenames); on any
other pair it is ignored entirely - neither a waiver nor a stale
warning. Unscoped annotations remain accepted for in-flight runs whose
new artifact has no round number yet, and are flagged as stale once
un-flagged so they get scoped or retired.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent


def load(path_arg: str) -> dict:
    p = Path(path_arg)
    if not p.exists() and not path_arg.endswith(".json"):
        p = _ROOT / f"{path_arg}.json"
    if not p.exists():
        p = _ROOT / path_arg
    data = json.loads(p.read_text())
    parsed = data.get("parsed", data)  # driver artifact wraps the JSON line
    if "queries" not in parsed:
        raise SystemExit(f"{p}: no 'queries' payload")
    return parsed


def artifact_round(path_arg: str) -> int | None:
    m = re.search(r"r(\d+)", Path(path_arg).name)
    return int(m.group(1)) if m else None


def _pair_key(pair: str | None) -> tuple[int, int] | None:
    """Numeric form of an ``rNNrMM`` scope so hand-written ``@r9r10``
    matches the computed zero-padded ``r09r10``."""
    if pair is None:
        return None
    m = re.fullmatch(r"r(\d+)r(\d+)", pair)
    return (int(m.group(1)), int(m.group(2))) if m else None


def annotations(pair: str | None = None, all_scopes: bool = False) -> dict[str, str]:
    """Waiver lines from BENCH_NOTES.md. A scoped annotation
    (``plan_changed[q@rNNrMM]:``) is active ONLY on its artifact pair:
    with ``pair`` (e.g. "r07r08"), other pairs' waivers are dropped -
    they adjudicated a different comparison and have aged out. With
    ``pair=None`` (a pair-less comparison, e.g. an in-flight artifact
    whose filename carries no round) scoped waivers are dropped too -
    a waiver adjudicated for a specific pair cannot waive regressions
    in an unidentified one; only unscoped annotations apply. Scope
    round numbers compare numerically (``@r9r10`` == ``r09r10``).
    ``all_scopes=True`` returns everything (ad-hoc inspection)."""
    notes = _ROOT / "BENCH_NOTES.md"
    if not notes.exists():
        return {}
    want = _pair_key(pair)
    out: dict[str, str] = {}
    for m in re.finditer(
        r"^\s*(plan_changed|flag_ok)\[([a-z0-9_]+)(?:@(r\d+r\d+))?\]:\s*(.+)$",
        notes.read_text(), re.M,
    ):
        scope = m.group(3)
        if scope is not None and not all_scopes and _pair_key(scope) != want:
            continue
        out[m.group(2)] = f"{m.group(1)}: {m.group(4).strip()}"
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] for a in sys.argv[1:] if "=" in a}
    threshold = float(opts.get("--threshold", 1.5))
    floor = float(opts.get("--floor", 0.4))
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    po, pn = old.get("probe_sec"), new.get("probe_sec")
    norm = (pn / po) if po and pn else 1.0
    print(f"probe_sec: {po} -> {pn}  (normalizer {norm:.3f}); "
          f"threshold {threshold}x above {floor}s")
    ro, rn = artifact_round(args[0]), artifact_round(args[1])
    pair = f"r{ro:02d}r{rn:02d}" if ro is not None and rn is not None else None
    if pair:
        print(f"artifact pair: {pair} (scoped annotations for other pairs ignored)")
    notes = annotations(pair)
    flagged: list[str] = []
    common = [q for q in old["queries"] if q in new["queries"]]
    print("\n| query | old s | new s | raw | norm | |")
    print("|---|---|---|---|---|---|")
    rows = []
    for q in common:
        a, b = old["queries"][q], new["queries"][q]
        raw = b / a if a else float("inf")
        rows.append((min(raw, raw / norm), q, a, b, raw))
    for ratio, q, a, b, raw in sorted(rows, reverse=True):
        mark = ""
        if ratio > threshold and max(a, b) >= floor:
            mark = f"ANNOTATED: {notes[q]}" if q in notes else "**REGRESSION**"
            if q not in notes:
                flagged.append(q)
        print(
            f"| {q} | {a:.3f} | {b:.3f} | {raw:.2f}x | {raw / norm:.2f}x | {mark} |"
        )
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    skipped = set(new.get("skipped", []))
    if only_old:
        labeled = [q + (" (SKIP env)" if q in skipped else "") for q in only_old]
        print(f"\ndropped from bench set: {labeled}")
    if only_new:
        print(f"added to bench set: {only_new}")
    stale = sorted(
        q for q in notes
        if q in new["queries"]
        and not any(q == r[1] and r[0] > threshold and max(r[2], r[3]) >= floor
                    for r in rows)
    )
    if stale:
        print(f"\nstale plan_changed annotations (query no longer flagged): {stale}")
    tot_o = sum(old["queries"][q] for q in common)
    tot_n = sum(new["queries"][q] for q in common)
    print(f"\ncommon-set total: {tot_o:.2f}s -> {tot_n:.2f}s over {len(common)} "
          f"queries (raw {tot_n / tot_o:.2f}x, norm {(tot_n / tot_o) / norm:.2f}x)")
    if flagged:
        print(
            f"\nFAIL: {len(flagged)} unannotated >{threshold}x entries: {flagged}\n"
            "add `plan_changed[<query>]: reason` lines to BENCH_NOTES.md "
            "(only for genuine plan restatements - fix real regressions instead)"
        )
        sys.exit(1)
    print("\nOK: no unannotated regressions")


if __name__ == "__main__":
    main()
