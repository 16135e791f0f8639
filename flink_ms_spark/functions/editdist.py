"""Exact Levenshtein distance, bit-parallel and vectorized across pairs.

Myers' 1999 bit-vector algorithm (the multi-word formulation of Hyyrö
2003): one dynamic-programming COLUMN is encoded as two machine words of
vertical deltas (VP/VN), and each text character advances the whole
column with ~15 word operations instead of O(m) cell updates. Here the
word operations are numpy uint64 vectors across a CHUNK of pairs, so
one pass of the step loop advances every pair in the chunk at once —
the per-step numpy dispatch overhead amortizes over the chunk instead
of being paid per pair.

Measured on the lev_neardup candidate set at sf0.1 (21,926 pairs,
mean text ~300 chars): 247 µs/pair single-core vs 579 µs/pair for
DuckDB's C++ full DP and ~1.2 ms/pair for the JVM threshold-banded
``levenshtein(a, b, k)`` codegen form — and validated bit-identical to
DuckDB's levenshtein on all 36,271 raw candidate pairs plus the edge
cases below (empty strings, equal strings, 64/65-char word boundaries).

Exactness: full unit-cost edit distance over unicode CODEPOINTS
(strings are decoded via utf-32-le, so supplementary-plane characters
count as one edit like they do for Spark's and DuckDB's levenshtein),
no band, no early exit. NULL handling is the caller's job.
"""

from __future__ import annotations

import numpy as np

_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)
_S63 = np.uint64(63)


def _lev_chunk(pats: list[np.ndarray], txts: list[np.ndarray]) -> np.ndarray:
    """Exact Levenshtein for one chunk of (pattern, text) uint32
    codepoint arrays, vectorized across pairs. ``pats[i]`` must be the
    shorter side of pair i (cost is symmetric; the pattern side bounds
    the word count W). Returns int64 distances."""
    n = len(pats)
    m = np.fromiter((len(p) for p in pats), np.int64, n)
    tl = np.fromiter((len(t) for t in txts), np.int64, n)
    if n == 0:
        return np.empty(0, np.int64)
    if m.max() == 0:  # empty pattern: distance = text length
        return tl.copy()
    steps = int(tl.max())
    if steps == 0:  # all texts empty (then all patterns empty too)
        return m.copy()
    W = int((m.max() + 63) // 64)

    # Dense per-chunk alphabet; index A is the padding character that
    # matches no pattern position.
    all_codes = np.concatenate(pats + txts)
    alpha = np.unique(all_codes)
    A = len(alpha)

    # Peq[p, a, w]: bitmask of positions where char a occurs in pattern p.
    Peq = np.zeros((n, A + 1, W), np.uint64)
    pat_codes = np.searchsorted(alpha, np.concatenate(pats))
    pair_idx = np.repeat(np.arange(n), m)
    pos = np.concatenate([np.arange(len(p)) for p in pats])
    np.bitwise_or.at(
        Peq,
        (pair_idx, pat_codes, pos // 64),
        _ONE << (pos % 64).astype(np.uint64),
    )

    # Text codes padded to `steps` with the padding index A.
    T = np.full((n, steps), A, np.int64)
    tcat = np.searchsorted(alpha, np.concatenate(txts))
    tpair = np.repeat(np.arange(n), tl)
    tpos = np.concatenate([np.arange(len(t)) for t in txts])
    T[tpair, tpos] = tcat

    # VP starts all-ones over the low m bits (whole first column is +1
    # vertical deltas), VN all-zeros.
    VP = np.zeros((W, n), np.uint64)
    VN = np.zeros((W, n), np.uint64)
    for w in range(W):
        rem = np.clip(m - 64 * w, 0, 64).astype(np.uint64)
        VP[w] = np.where(rem == 64, _FULL, (_ONE << rem) - _ONE)

    score = m.copy()
    widx = ((m - 1) // 64).astype(np.int64)
    bmask = _ONE << ((m - 1) % 64).astype(np.uint64)
    rng = np.arange(n)

    for j in range(steps):
        active = tl > j
        Eq = Peq[rng, T[:, j], :].T  # (W, n)
        # Xh = (((Eq & VP) + VP) ^ VP) | Eq, carry-propagating the
        # addition across words.
        Xh = np.empty((W, n), np.uint64)
        carry = np.zeros(n, np.uint64)
        for w in range(W):
            a = Eq[w] & VP[w]
            s1 = a + VP[w]
            c1 = s1 < a
            s2 = s1 + carry
            c2 = s2 < s1
            carry = (c1 | c2).astype(np.uint64)
            Xh[w] = (s2 ^ VP[w]) | Eq[w]
        Ph = VN | ~(Xh | VP)
        Mh = VP & Xh
        # Score tracks the DP cell at pattern position m-1 (per-pair
        # word/bit); pairs whose text already ended stop updating —
        # their VP/VN keep evolving on padding input, which is fine
        # because the score is frozen.
        ph_bit = (Ph[widx, rng] & bmask) != 0
        mh_bit = (Mh[widx, rng] & bmask) != 0
        score += np.where(active & ph_bit, 1, 0)
        score -= np.where(active & mh_bit, 1, 0)
        # Shift Ph/Mh up one row; Ph gets the +1 boundary carry-in
        # (the first row of the DP grows by one per text char).
        ph_carry = np.ones(n, np.uint64)
        mh_carry = np.zeros(n, np.uint64)
        for w in range(W):
            ph_hi = Ph[w] >> _S63
            mh_hi = Mh[w] >> _S63
            Ph[w] = (Ph[w] << _ONE) | ph_carry
            Mh[w] = (Mh[w] << _ONE) | mh_carry
            ph_carry = ph_hi
            mh_carry = mh_hi
        Xv = Eq | VN
        VP = Mh | ~(Xv | Ph)
        VN = Ph & Xv
    return score


def lev_pairs(
    ta_list: list[str], tb_list: list[str], chunk: int = 1024
) -> np.ndarray:
    """Exact Levenshtein over parallel string lists (no NULLs).

    Pairs are re-ordered so chunks hold similar (word-count, text-len)
    shapes — the step loop and word loop run to the chunk maximum, so
    mixing a 60-char pair into a 500-char chunk would pay the long
    pair's iteration count for every member. chunk=1024 measured best
    (512: +48%, 8192: +26%, one giant chunk: +104%)."""
    n = len(ta_list)
    codes_a = [np.frombuffer(s.encode("utf-32-le"), np.uint32) for s in ta_list]
    codes_b = [np.frombuffer(s.encode("utf-32-le"), np.uint32) for s in tb_list]
    pats, txts = [], []
    for a, b in zip(codes_a, codes_b):
        if len(a) <= len(b):
            pats.append(a)
            txts.append(b)
        else:
            pats.append(b)
            txts.append(a)
    order = sorted(range(n), key=lambda i: (len(pats[i]), len(txts[i])))
    out = np.empty(n, np.int64)
    for lo in range(0, n, chunk):
        idx = order[lo : lo + chunk]
        out[idx] = _lev_chunk([pats[i] for i in idx], [txts[i] for i in idx])
    return out
