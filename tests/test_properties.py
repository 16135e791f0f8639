"""Property-based tests (hypothesis): codec round-trips and
latest-per-key semantics hold for arbitrary inputs, not just the
fixtures. Each example batches all generated rows into ONE Spark job
(per-example jobs would be prohibitively slow)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from flink_ms_spark.functions.codecs import format_model_row, parse_model_line
from flink_ms_spark.serving.store import latest_per_key

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**31 - 1),
            st.sampled_from(["U", "I"]),
            st.lists(finite_doubles, min_size=1, max_size=12),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_model_row_roundtrip_exact(spark, rows):
    """T5∘T4/T2 identity: format → parse returns the exact doubles
    (Java shortest-roundtrip repr) and the composite key."""
    df = spark.createDataFrame(
        [(str(i), k, f) for i, k, f in rows],
        "id STRING, kind STRING, factors ARRAY<DOUBLE>",
    )
    line = df.select(format_model_row("id", "kind", "factors").alias("value"))
    back = line.select(*parse_model_line("value")).collect()
    got = sorted((r.id, r.kind, tuple(r.factors)) for r in back)
    want = sorted((str(i), k, tuple(f)) for i, k, f in rows)
    assert len(got) == len(want)
    for (gi, gk, gf), (wi, wk, wf) in zip(got, want):
        assert (gi, gk) == (wi, wk)
        assert len(gf) == len(wf)
        for g, w in zip(gf, wf):
            assert g == w or (math.isnan(g) and math.isnan(w))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # few keys → collisions
            st.text(alphabet="abcxyz", min_size=0, max_size=6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_latest_per_key_matches_pandas(spark, rows):
    """K4 upsert semantics ≡ pandas 'last row per key by ordinal'."""
    data = [(str(k), i, p) for i, (k, p) in enumerate(rows)]  # unique ords
    df = spark.createDataFrame(data, "key STRING, _ord LONG, payload STRING")
    got = {r.key: r.payload for r in latest_per_key(df).collect()}
    pdf = pd.DataFrame(data, columns=["key", "_ord", "payload"])
    want = pdf.sort_values("_ord").groupby("key")["payload"].last().to_dict()
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.floats(min_value=0.05, max_value=2.0),
)
def test_unimax_waterfill_matches_iterative_reference(spark, token_counts, frac):
    """The closed-form first-crossing waterfill must equal the
    textbook iterative algorithm (alloc_i = min(cap_i,
    remaining/(langs left)), ascending) for arbitrary language
    profiles and budget fractions."""
    from flink_ms_spark.operators.mixing import unimax_alloc

    rows = [(f"l{i:02d}", "w " * n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, ["lang", "text"])
    got = {
        r.lang: r.alloc_tokens
        for r in unimax_alloc(df, budget_frac=frac, max_epochs=2).collect()
    }

    # HALF_UP like Spark/DuckDB round(), not Python banker's round —
    # hypothesis found the exact-.5 budget edge (counts=[1], frac=.5)
    budget = math.floor(sum(token_counts) * frac + 0.5)
    caps = sorted(
        ((n * 2, f"l{i:02d}") for i, n in enumerate(token_counts)),
    )
    want, remaining = {}, float(budget)
    for j, (cap, lang) in enumerate(caps):
        share = remaining / (len(caps) - j)
        a = min(float(cap), share)
        want[lang] = a
        remaining -= a
    for lang, a in want.items():
        assert got[lang] == pytest.approx(round(a, 4), abs=1e-3), (
            lang, token_counts, frac,
        )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["Accept cookies", "accept COOKIES ", "alpha",
                             "beta beta", "", "  ", "unique %d",
                             "Accept cookies\r", "\taccept cookies"]),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=8,
    )
)
def test_line_dedup_matches_python_reference(spark, doc_lines):
    """drop_duplicated_lines == the obvious sequential implementation:
    count normalized non-blank lines across distinct docs, drop those
    in >= 3 docs, keep everything else in order."""
    from flink_ms_spark.operators.text import drop_duplicated_lines

    docs = [
        (i, "\n".join(line if "%d" not in line else line % i for line in lines))
        for i, lines in enumerate(doc_lines)
    ]

    from collections import defaultdict

    seen = defaultdict(set)
    for doc_id, text in docs:
        for line in text.split("\n"):
            norm = line.strip().lower()
            if norm:
                seen[norm].add(doc_id)
    boiler = {n for n, ids in seen.items() if len(ids) >= 3}

    want = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines if l.strip().lower() not in boiler]
        want[doc_id] = (len(lines), len(kept), "\n".join(kept))

    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_lines, r.n_lines_kept, r.text_clean)
        for r in drop_duplicated_lines(df, min_docs=3).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # left rows: (id, ts)
        st.integers(min_value=0, max_value=400),
        min_size=1, max_size=25,
    ),
    st.lists(  # right timestamps
        st.integers(min_value=0, max_value=400),
        min_size=0, max_size=25,
    ),
    st.integers(min_value=-50, max_value=0),   # lower
    st.integers(min_value=1, max_value=60),    # upper - lower offset
    st.integers(min_value=1, max_value=80),    # bucket width
)
def test_banded_range_join_matches_bruteforce(spark, lts, rts, lower, width, bucket):
    """banded_range_join(inner + left) == the O(n·m) reference on
    arbitrary integer timestamps, band bounds, and bucket widths — the
    bucket quantization must never change the matched-pair set."""
    from flink_ms_spark.operators.rangejoin import banded_range_join

    upper = lower + width
    l = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lts)], "lid LONG, l_ts LONG"
    )
    r = spark.createDataFrame(
        [(100 + j, t) for j, t in enumerate(rts)], "rid LONG, r_ts LONG"
    )
    want_inner = {
        (i, 100 + j)
        for i, lt in enumerate(lts)
        for j, rt in enumerate(rts)
        if lt + lower <= rt < lt + upper
    }
    got_inner = {
        (x.lid, x.rid)
        for x in banded_range_join(
            l, r, "l_ts", "r_ts", lower, upper, bucket=bucket
        ).collect()
    }
    assert got_inner == want_inner, (lts, rts, lower, upper, bucket)

    matched_left = {i for i, _ in want_inner}
    want_left = want_inner | {
        (i, None) for i in range(len(lts)) if i not in matched_left
    }
    got_left = {
        (x.lid, x.rid)
        for x in banded_range_join(
            l, r, "l_ts", "r_ts", lower, upper, bucket=bucket,
            how="left", left_keys=["lid"],
        ).collect()
    }
    assert got_left == want_left, (lts, rts, lower, upper, bucket)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # membership rows: (node, group)
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1, max_size=50,
    )
)
def test_bipartite_cc_matches_union_find(spark, members):
    """connected_components_bipartite == plain union-find over the
    'share a group' projection, for arbitrary bipartite memberships —
    including single-member groups (excluded by contract: they imply
    no candidate pair) and nodes in many groups (transitive chains)."""
    from flink_ms_spark.operators.cluster import connected_components_bipartite

    members = list(set(members))
    df = spark.createDataFrame(members, "node LONG, grp LONG")
    got = {
        (r.node, r.component)
        for r in connected_components_bipartite(
            df, node_col="node", group_col="grp"
        ).collect()
    }

    # reference: union-find over nodes, joined within each multi-node group
    from collections import defaultdict

    groups = defaultdict(set)
    for n, g in members:
        groups[g].add(n)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    covered = set()
    for g, nodes in groups.items():
        if len(nodes) < 2:
            continue  # no candidate pair -> outside the working set
        covered |= nodes
        first = min(nodes)
        for n in nodes:
            union(first, n)
    # min-label components: re-find until stable, then take min per root
    comp = defaultdict(set)
    for n in covered:
        comp[find(n)].add(n)
    want = {(n, min(ns)) for ns in comp.values() for n in ns}
    assert got == want, members


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # a sequence of upsert batches of (key, value) rows
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=-1000, max_value=1000),
            ),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=4,
    ),
    st.integers(min_value=0, max_value=6),  # dict cap
)
def test_store_spill_parity_under_random_upserts(spark, batches, cap):
    """For ANY upsert sequence and ANY max_dict_keys cap, the spilled
    DataFrame backend and the uncapped dict backend answer identically
    (every key's latest value, misses, len) — the spill point must be
    semantically invisible."""
    from flink_ms_spark.serving.store import ModelStore

    capped = ModelStore(spark, "P_CAP", max_dict_keys=cap)
    plain = ModelStore(spark, "P_REF")
    expected = {}
    for rows in batches:
        df = spark.createDataFrame(
            [(str(k), i, v) for i, (k, v) in enumerate(rows)],
            "key STRING, ord LONG, v LONG",
        )
        capped.upsert_batch(df, ordinal_col="ord")
        plain.upsert_batch(df, ordinal_col="ord")
        for k, v in rows:  # input order == ordinal order
            expected[str(k)] = v
    assert len(capped) == len(plain) == len(expected)
    for k, v in expected.items():
        assert capped.lookup(k).v == plain.lookup(k).v == v
    assert capped.lookup("miss") is None and plain.lookup("miss") is None


# --------------------------------------------------------------------------
# Content-defined chunking: the numpy prefix-product path must agree
# with a direct scalar replay of the boundary contract on ARBITRARY
# unicode, and always partition the text.


def _scalar_cdc(text: str, w: int, mn: int, mx: int, dv: int):
    import hashlib

    from flink_ms_spark.operators.chunking import BASE

    mask = (1 << 64) - 1
    bw = pow(BASE, w, 1 << 64)
    h, last, bounds = 0, 0, []
    for i in range(1, len(text) + 1):
        h = (h * BASE + ord(text[i - 1])) & mask
        if i > w:
            h = (h - ord(text[i - 1 - w]) * bw) & mask
        if (i - last >= mn and h % dv == 0) or (i - last >= mx):
            bounds.append(i)
            last = i
    if last < len(text):
        bounds.append(len(text))
    out, s = [], 0
    for b in bounds:
        out.append((s, b - s, hashlib.md5(text[s:b].encode()).hexdigest()))
        s = b
    return out


@given(
    text=st.text(
        # full unicode minus surrogates (unencodable in utf-8)
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=1500,
    )
)
@settings(max_examples=150, deadline=None)
def test_cdc_chunker_matches_scalar_replay(text):
    from flink_ms_spark.operators.chunking import _doc_chunks_numpy

    got = _doc_chunks_numpy(text, 8, 16, 128, 16)
    assert got == _scalar_cdc(text, 8, 16, 128, 16)
    # partition property: contiguous, complete, bounded
    pos = 0
    for start, length, _ in got:
        assert start == pos and 1 <= length <= 128
        pos += length
    assert pos == len(text)
