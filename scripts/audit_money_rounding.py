"""Audit the catalog for float-aggregate money rounding hazards.

The r4 `rfm_segments` red row was a cross-engine float-rounding flip:
``round(<float agg of money-magnitude values>, d)`` where the true
value sits within the engines' accumulation-order error (~1e-9..1e-5
at 1e8..1e9 sum magnitudes) of a d-dp rounding boundary, so the gate
hash flips run-to-run. The r5 sweep converts every such site to exact
integer-cents / basis-point arithmetic (see plans/relational.py
`_EXT_CENTS` block): integer sums are order-independent, and one
final double division + one round is bit-deterministic.

This script walks EVERY resolved oracle and every registered pure-SQL
Spark query text and reports any remaining hazard site. Exit 0 iff
none are found.

Hazard classes flagged:
  H1  round(avg(<money col>), d)        — averages are off-grid; the
      accumulation error over >=1e4 rows of 1e4..1e5-magnitude values
      reaches ~1e-9, vs a 5e-7 boundary half-spacing at 6 dp
      (~0.1% flip probability per cell per fixture draw).
  H2  round(sum(<money col>), d>=3)     — a 2-dp-exact column's sum is
      mathematically ON the 2-dp grid, but at 6 dp the half-spacing is
      5e-7 while accumulation error on 1e8-magnitude sums is ~1e-7
      (the rfm_segments class).
  H3  sum(<money col> * ...)            — float products (e.g.
      l_extendedprice * (1 - l_discount)) are 4/6-dp values; ~1% of
      cells sit EXACTLY on a half-cent boundary when rounded at 2 dp.

Classes deliberately NOT flagged (safe by analysis, margin >= 1e2):
  S1  round(sum(<2-dp money col>), 2)   — true value on-grid; flip
      needs error > 0.005, vs <=1e-5 observed worst-case.
  S2  round(sum|avg(value), 6) over events.value per (type, day/window)
      group — 2-dp column, group sums <=1e4 magnitude over <=1e3 rows:
      error <=1e-10 vs the 5e-7 boundary.
  S3  round(avg(<money>), 2)            — off-grid but error ~1e-9 vs
      a 0.005 boundary.
  S4  ratios of money sums already rounded/deterministic upstream
      (mom_growth, cusum mu) and integer-exact aggregates
      (l_quantity, counts).

Run: python scripts/audit_money_rounding.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MONEY = r"(?:totalprice|extendedprice|acctbal|retailprice|supplycost)"
COL = rf"[a-z_0-9\.]*{MONEY}[a-z_0-9]*"

HAZARDS = {
    # H1: avg directly over a raw money column, any rounding dp
    "H1 avg(money)": re.compile(
        rf"round\s*\(\s*avg\s*\(\s*{COL}\s*\)", re.IGNORECASE
    ),
    # H2: sum of a raw money column rounded at >= 3 dp
    "H2 round(sum(money), >=3dp)": re.compile(
        rf"round\s*\(\s*sum\s*\(\s*{COL}\s*\)\s*,\s*[3-9]", re.IGNORECASE
    ),
    # H3: float product of a money column inside sum()
    "H3 sum(money * ...)": re.compile(
        rf"sum\s*\(\s*{COL}\s*\*", re.IGNORECASE
    ),
    # H3b: product written with the money column second
    "H3b sum(... * money)": re.compile(
        rf"sum\s*\(\s*\(?[0-9.]+\s*[-+*]\s*[a-z_0-9\.]+\)?\s*\*\s*{COL}",
        re.IGNORECASE,
    ),
}

# Python-DSL (pyspark.sql.functions) forms of the same hazards, scanned
# over flink_ms_spark/plans/*.py source. Round-6 extension (ADVICE r5):
# the r4 red row's exact shape was a plain STRING-arg float sum —
# F.round(F.sum('o_totalprice'), 6) — which the original regex (only
# F.avg/F.mean and F.sum(F.col(...) * ...)) did not match, so that
# class could be reintroduced in DSL form without tripping the CI gate.
# Now flagged: any bare F.sum of a raw money column (string or F.col
# form, with or without a product) and any F.round(F.sum(...)) whose
# sum argument names a raw money column. The sanctioned integer-cents
# pattern — F.sum(F.round(F.col(money) * 100, 0).cast("long")) — stays
# unflagged: its sum argument starts with F.round(, and the post-sum
# division sites reference *_cents columns that don't match COL.
PY_DSL_HAZARD = re.compile(
    rf"F\.(?:avg|mean)\(\s*[\"']{COL}[\"']\s*\)"
    rf"|F\.(?:avg|mean)\(\s*F\.col\([\"']{COL}[\"']\)\s*\)"
    rf"|F\.sum\(\s*[\"']{COL}[\"']\s*\)"
    rf"|F\.sum\(\s*F\.col\([\"']{COL}[\"']\)\s*[)*]"
    rf"|F\.round\(\s*F\.sum\([^()]*{COL}",
    re.IGNORECASE,
)


def main() -> int:
    from flink_ms_spark.plans.catalog import QUERIES
    from flink_ms_spark.plans.registry import resolve_oracles

    texts: dict[str, list[str]] = {}
    for name, sql in resolve_oracles().items():
        texts.setdefault(name, []).append(sql)
    # register_sql queries carry their Spark SQL in __doc__
    for name, fn in QUERIES.items():
        doc = getattr(fn, "__doc__", None)
        if doc and fn.__name__ == f"q_{name}" and "SELECT" in doc.upper():
            texts.setdefault(name, []).append(doc)

    bad: list[tuple[str, str, str]] = []
    for name, sqls in sorted(texts.items()):
        for sql in sqls:
            for label, rx in HAZARDS.items():
                for m in rx.finditer(sql):
                    bad.append((name, label, m.group(0).replace("\n", " ")))

    # The python-DSL plan sources: flag the same patterns in F.* form
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "flink_ms_spark",
        "plans",
    )
    py_rx = PY_DSL_HAZARD
    for fname in sorted(os.listdir(plan_dir)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(plan_dir, fname)) as f:
            for i, line in enumerate(f, 1):
                if py_rx.search(line):
                    bad.append((f"{fname}:{i}", "H-py DSL money agg", line.strip()))

    if bad:
        print(f"{len(bad)} unconverted money-aggregate hazard site(s):")
        for name, label, frag in bad:
            print(f"  [{label}] {name}: {frag[:100]}")
        return 1
    print(
        f"0 hazard sites across {len(texts)} query texts "
        "(integer-cents sweep holds)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
