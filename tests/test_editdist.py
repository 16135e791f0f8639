"""Contract tests for the bit-parallel Myers Levenshtein kernel
(functions/editdist.py) — the lev_neardup verify stage rides it, so its
distances must be exactly the classic unit-cost edit distance."""

import numpy as np
import pytest

from flink_ms_spark.functions.editdist import _lev_chunk, lev_pairs


def ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


HAND_CASES = [
    ("", ""),
    ("a", ""),
    ("", "abc"),
    ("abc", "abc"),
    ("kitten", "sitting"),
    ("flaw", "lawn"),
    ("a" * 63, "a" * 63 + "b"),  # word-boundary straddles
    ("a" * 64, "a" * 64 + "b"),
    ("a" * 65, "a" * 64),
    ("x" * 65, "y" * 130),  # multi-word, all-substitution + insertions
    ("ab" * 100, "ba" * 100),
    ("café", "cafe"),  # non-ASCII codepoint counts as one edit
    ("\U0001f600abc", "abc"),  # supplementary plane = one codepoint
]


def test_hand_cases_match_reference():
    got = lev_pairs([a for a, _ in HAND_CASES], [b for _, b in HAND_CASES])
    for (a, b), g in zip(HAND_CASES, got):
        assert g == ref_lev(a, b), (a[:20], b[:20], int(g))


def test_symmetry_and_bounds_random():
    rng = np.random.default_rng(7)
    alphabet = "abcdef "
    pairs = []
    for _ in range(200):
        la, lb = rng.integers(0, 200, 2)
        a = "".join(rng.choice(list(alphabet), la))
        b = "".join(rng.choice(list(alphabet), lb))
        pairs.append((a, b))
    fw = lev_pairs([a for a, _ in pairs], [b for _, b in pairs])
    bw = lev_pairs([b for _, b in pairs], [a for a, _ in pairs])
    assert (fw == bw).all()
    for (a, b), d in zip(pairs, fw):
        assert d == ref_lev(a, b)
        assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))


def test_chunk_boundaries_do_not_change_results():
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(50):
        la, lb = rng.integers(1, 300, 2)
        a = "".join(rng.choice(list("xyz"), la))
        b = "".join(rng.choice(list("xyz"), lb))
        pairs.append((a, b))
    ta = [a for a, _ in pairs]
    tb = [b for _, b in pairs]
    full = lev_pairs(ta, tb, chunk=1024)
    tiny = lev_pairs(ta, tb, chunk=3)
    assert (full == tiny).all()


def test_empty_input():
    assert len(lev_pairs([], [])) == 0
    assert len(_lev_chunk([], [])) == 0


@pytest.mark.parametrize("n_words", [1, 2, 5])
def test_long_identical_prefixes(n_words):
    # distances around multiples of the 64-bit word width
    base = "q" * (64 * n_words - 1)
    assert lev_pairs([base], [base + "zz"])[0] == 2
    assert lev_pairs([base + "z"], [base])[0] == 1
