"""Compute the next driver-gate window from the CORRECTNESS record.

The external correctness gate checks the FIRST 50 registered catalog
queries each round (plans/catalog.py reorders registration around a
_PRIORITY list). Since round 6 the window rotates by RECORD AGE:

  1. RED rows first — any name whose most recent driver row is not
     green (the gate must re-check a failure immediately);
  2. names whose plan/oracle changed since their last record
     (pass them via --changed; the script cannot infer this);
  3. everything else oldest-latest-green-round first, alphabetical
     within a round (a deterministic tiebreak so successive rounds
     never skip a name).

This script reads CORRECTNESS_r*.json at the repo root, computes each
catalog name's latest green round, and prints the recommended
_PRIORITY block ready to paste into plans/catalog.py, plus the
staleness distribution before/after. It is a generator, not a CI
gate: records change every round by construction, so the catalog
keeps a hand-committed list and the round log records the evidence.

Run: python scripts/rotate_window.py [--slots 50] [--changed a,b,c]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_records(root: str = ROOT) -> dict[str, list[tuple[int, bool]]]:
    """name -> [(round, green)] across every CORRECTNESS_r*.json."""
    recs: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
            )
            recs.setdefault(name, []).append((rnd, green))
    return recs


def latest_green(recs: dict[str, list[tuple[int, bool]]]) -> dict[str, int]:
    """name -> highest round with a green row (names with none omitted)."""
    out = {}
    for name, rows in recs.items():
        greens = [r for r, ok in rows if ok]
        if greens:
            out[name] = max(greens)
    return out


def currently_red(recs: dict[str, list[tuple[int, bool]]]) -> set[str]:
    """Names whose MOST RECENT driver row is not green."""
    out = set()
    for name, rows in recs.items():
        last_round = max(r for r, _ in rows)
        if not any(ok for r, ok in rows if r == last_round):
            out.add(name)
    return out


def recommend(
    names: list[str],
    ages: dict[str, int],
    red: set[str],
    changed: list[str],
    slots: int = 50,
) -> list[str]:
    """The window: red rows, then --changed, then oldest-first.
    Never-checked names (no green row at all) sort oldest of all."""
    window: list[str] = []
    for n in sorted(red) + [c for c in changed if c not in red]:
        if n in names and n not in window:
            window.append(n)
    rest = [n for n in names if n not in window]
    rest.sort(key=lambda n: (ages.get(n, 0), n))
    window.extend(rest)
    return window[:slots]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument(
        "--changed",
        default="",
        help="comma-list of names whose plan/oracle changed this round",
    )
    args = ap.parse_args()
    changed = [c for c in args.changed.split(",") if c]

    from flink_ms_spark.plans.registry import QUERIES  # pre-reorder set

    import flink_ms_spark.plans.catalog  # noqa: F401  (registers all)

    names = list(QUERIES)
    recs = load_records()
    ages = latest_green(recs)
    red = currently_red(recs)
    unknown = [c for c in changed if c not in QUERIES]
    if unknown:
        print(f"ERROR: --changed names not in catalog: {unknown}")
        return 1

    window = recommend(names, ages, red, changed, args.slots)
    dist = Counter(ages.get(n, 0) for n in names)
    print(f"# staleness (latest-green round -> names): {dict(sorted(dist.items()))}")
    print(f"# red rows: {sorted(red) or 'none'}")
    print(f"# window ({len(window)} slots): red + changed + oldest-first")
    print("_PRIORITY = [")
    for n in window:
        tag = " # RED" if n in red else (" # changed" if n in changed else "")
        print(f'    "{n}",{tag}')
    print("]")
    after = Counter(
        max(ages.get(n, 0), 99) if n in window else ages.get(n, 0) for n in names
    )
    oldest_after = min(k for k in after if k != 99) if len(after) > 1 else 99
    print(f"# oldest record age after this window's driver run: r{oldest_after}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
