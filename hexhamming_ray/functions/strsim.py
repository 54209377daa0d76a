"""Vectorized byte-level string-similarity kernels for fuzzy entity
resolution: batch Levenshtein and Jaro-Winkler over padded uint8
matrices, matching DuckDB's ``levenshtein`` / ``jaro_winkler_similarity``
semantics exactly (BYTE-based, not codepoint-based — pinned by probe:
``levenshtein('é','e') = 2`` in DuckDB 1.0, and the Winkler boost is
applied only when the Jaro similarity exceeds 0.7).

Shape: both kernels are DP/scan loops over the (short, bounded) KEY
LENGTH with every step vectorized across ALL candidate pairs of the
batch — the same loop-over-length-not-rows structure as the hamming
tile scorer (stages/scoring.py). No Python-level per-pair work.

The conformance sweep in tests/test_strsim.py pins both kernels
value-exact against DuckDB over random byte strings, empties, and
prefix/boost boundary cases."""

from __future__ import annotations

import numpy as np


def pad_matrix(col, *, width: int | None = None):
    """Arrow string/binary column (or list of bytes) -> (mat, lens):
    a zero-padded ``P x L`` uint8 matrix and per-row byte lengths.
    Built from the column's flattened value buffer via
    :func:`~hexhamming_ray.functions.hashing.utf8_view` — one scatter,
    no per-row Python objects."""
    import pyarrow as pa

    if isinstance(col, (list, tuple)):
        col = pa.array(col, pa.binary())
    from hexhamming_ray.functions.hashing import utf8_view

    buf, lens, starts = utf8_view(col)
    n = lens.shape[0]
    width = int(width if width is not None else (lens.max() if n else 0))
    mat = np.zeros((n, max(width, 1)), dtype=np.uint8)
    if n and lens.sum():
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        # utf8_view guarantees docs back-to-back in buf from starts[0]
        vals = buf[starts[0]: starts[0] + int(lens.sum())]
        keep = cols < width  # rows longer than an explicit width clip
        if not keep.all():
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
        mat[rows, cols] = vals
    return mat, np.minimum(lens, width)


def levenshtein_batch(amat, alen, bmat, blen):
    """Exact Levenshtein distance for every row-pair ``(amat[i],
    bmat[i])`` -> int64[P]. Row-DP over ``a``'s length with the
    insertion recurrence's intra-row dependency removed by the
    prefix-min identity ``new[j] = min_{k<=j}(cand[k] + (j-k))``
    (one ``np.minimum.accumulate`` per row), so each of the
    ``max(alen)`` iterations is fully vectorized across pairs."""
    P = alen.shape[0]
    if P == 0:
        return np.empty(0, dtype=np.int64)
    Lb = bmat.shape[1]
    ar = np.arange(Lb + 1, dtype=np.int32)
    dp = np.tile(ar, (P, 1))
    res = blen.astype(np.int64).copy()  # correct for alen == 0
    cand = np.empty((P, Lb + 1), dtype=np.int32)
    rows = np.arange(P)
    for i in range(1, int(alen.max()) + 1 if P else 0):
        cost = (amat[:, i - 1][:, None] != bmat).astype(np.int32)
        cand[:, 0] = i
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=cand[:, 1:])
        # new[j] = ar[j] + cummin(cand - ar): folds in insertions
        np.subtract(cand, ar, out=cand)
        np.minimum.accumulate(cand, axis=1, out=cand)
        np.add(cand, ar, out=cand)
        dp, cand = cand, dp
        snap = alen == i
        if snap.any():
            res[snap] = dp[rows[snap], blen[snap]]
    return res


def jaro_winkler_batch(amat, alen, bmat, blen):
    """Jaro-Winkler similarity for every row-pair -> float64[P],
    DuckDB semantics: byte-level, matches found greedily left-to-right
    within the standard ``max(la,lb)//2 - 1`` window, transpositions =
    ``floor(mismatched_matches / 2)``, Winkler prefix boost (scale
    0.1, prefix capped at 4) applied only when jaro > 0.7, and 0.0
    when either side is empty. The scan loops over ``a``'s positions
    with the first-eligible-match argmax vectorized across pairs."""
    P = alen.shape[0]
    if P == 0:
        return np.empty(0, dtype=np.float64)
    Lb = bmat.shape[1]
    win = np.maximum(np.maximum(alen, blen) // 2 - 1, 0)
    colj = np.arange(Lb, dtype=np.int64)[None, :]
    in_b = colj < blen[:, None]
    matched2 = np.zeros((P, Lb), dtype=bool)
    seq_w = max(1, min(amat.shape[1], Lb))
    s1seq = np.zeros((P, seq_w), dtype=np.uint8)
    m1 = np.zeros(P, dtype=np.int64)
    for i in range(int(alen.max()) if P else 0):
        elig = (
            (amat[:, i][:, None] == bmat)
            & ~matched2
            & in_b
            & (colj >= (i - win)[:, None])
            & (colj <= (i + win)[:, None])
            & (i < alen)[:, None]
        )
        hit = elig.any(axis=1)
        j = elig.argmax(axis=1)
        matched2[hit, j[hit]] = True
        s1seq[hit, m1[hit]] = amat[hit, i]
        m1[hit] += 1
    m = m1
    # s2 matched chars in j order, packed left via run-reset ranks
    pp, jj = np.nonzero(matched2)
    s2seq = np.zeros_like(s1seq)
    if pp.shape[0]:
        new = np.empty(pp.shape[0], dtype=bool)
        new[0] = True
        new[1:] = pp[1:] != pp[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(pp.shape[0], dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, pp.shape[0]])
        )
        s2seq[pp, rank] = bmat[pp, jj]
    kk = np.arange(seq_w, dtype=np.int64)[None, :]
    diffs = ((s1seq != s2seq) & (kk < m[:, None])).sum(axis=1)
    t = diffs // 2
    safe_m = np.maximum(m, 1)
    la = np.maximum(alen, 1).astype(np.float64)
    lb = np.maximum(blen, 1).astype(np.float64)
    jaro = (m / la + m / lb + (m - t) / safe_m) / 3.0
    jaro = np.where((m > 0) & (alen > 0) & (blen > 0), jaro, 0.0)
    # common prefix (cap 4, bounded by both lengths)
    pw = min(4, amat.shape[1], Lb)
    pm = (amat[:, :pw] == bmat[:, :pw]) & (
        np.arange(pw, dtype=np.int64)[None, :]
        < np.minimum(alen, blen)[:, None]
    )
    prefix = np.cumprod(pm, axis=1).sum(axis=1).astype(np.float64)
    return np.where(jaro > 0.7, jaro + 0.1 * prefix * (1.0 - jaro), jaro)
