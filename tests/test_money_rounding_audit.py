"""The integer-cents sweep (r5) must not regress: any new catalog
query that rounds a float aggregate of money-magnitude values
reintroduces the r4 `rfm_segments` cross-engine hash-flip class.
scripts/audit_money_rounding.py is the gate; run it as a test so a
hazard site fails CI before it ever reaches the external driver."""

from __future__ import annotations

import importlib.util
import os


def test_no_money_float_aggregate_hazards():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "audit_money_rounding",
        os.path.join(root, "scripts", "audit_money_rounding.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0


def test_dsl_hazard_regex_catches_the_r4_shape():
    """Negative fixtures for the Python-DSL scan (ADVICE r5): the gate
    is only a gate if a synthetic hazard line is actually flagged. The
    r4 red row's exact shape — a plain string-arg float sum wrapped in
    round — was invisible to the original regex; pin every hazard form
    hot, and the sanctioned integer-cents pattern cold."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "audit_money_rounding",
        os.path.join(root, "scripts", "audit_money_rounding.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rx = mod.PY_DSL_HAZARD

    hazards = [
        # the literal r4 rfm_segments shape (string-arg sum in round)
        'F.round(F.sum("o_totalprice"), 6).alias("monetary")',
        "F.round(F.sum('o_totalprice'), 6)",
        # bare float sums, string and col form
        'F.sum("l_extendedprice").alias("rev")',
        'F.sum(F.col("o_totalprice")).alias("rev")',
        # float product inside sum
        'F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))',
        # float averages
        'F.avg("c_acctbal")',
        'F.mean(F.col("p_retailprice"))',
    ]
    for line in hazards:
        assert rx.search(line), f"hazard line NOT flagged: {line}"

    safe = [
        # the sanctioned integer-cents pattern (exact BIGINT sum)
        'F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))',
        # post-sum division over a cents column (not a money column name)
        'F.round(F.sum("ext_cents") / 100, 2)',
        # non-money aggregates
        'F.sum("l_quantity")',
        'F.avg(F.col("value"))',
    ]
    for line in safe:
        assert not rx.search(line), f"safe line falsely flagged: {line}"


def test_fixture_money_columns_are_exact_2dp(sf_smoke):
    """The cents conversion round(x*100) -> BIGINT is only exact if the
    fixture's money columns are genuine 2-dp values (measured deviation
    < 4e-9 at sf0.1 when the sweep landed). The driver REGENERATES
    fixtures every round — if the generator ever emits full-precision
    money, this guard fails before a silently-lossy cents cast does."""
    import duckdb

    cols = {
        "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
        "part": ["p_retailprice"],
        "events": ["value"],
    }
    con = duckdb.connect()
    for table, names in cols.items():
        for c in names:
            dev = con.execute(
                f"SELECT coalesce(max(abs({c}*100 - round({c}*100, 0))), 0) "
                f"FROM '{sf_smoke}/{table}.parquet'"
            ).fetchone()[0]
            # far from the 0.5 boundary where engines could disagree
            assert dev < 1e-6, f"{table}.{c} is not 2-dp exact (dev={dev})"
