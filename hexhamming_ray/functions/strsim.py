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


def damerau_levenshtein_batch(amat, alen, bmat, blen,
                              chunk: int = 16384):
    """TRUE (unrestricted) Damerau-Levenshtein distance for every
    row-pair -> int64[P], DuckDB ``damerau_levenshtein`` semantics
    (byte-based; probe: ``damerau_levenshtein('CA','ABC') = 2`` — the
    unrestricted distance, not the OSA restriction's 3).

    Lowrance-Wagner DP vectorized across pairs: the full (P, La+2,
    Lb+2) distance cube is kept because the transposition term gathers
    from ARBITRARY earlier rows (``d[k-1, l-1]`` with ``k`` the last
    row where ``b[j]`` occurred in ``a``); the per-row intra-row
    insertion dependency is removed with the same prefix-min identity
    as :func:`levenshtein_batch`, and the within-row "last match
    column" ``db`` is a masked running max — every step is a whole-row
    vector op across all pairs. Pairs are processed in ``chunk``-sized
    sub-batches so the cube stays ~chunk x key_len^2 x 4 bytes."""
    P = alen.shape[0]
    out = np.empty(P, dtype=np.int64)
    for s in range(0, P, chunk):
        e = min(s + chunk, P)
        out[s:e] = _dl_chunk(amat[s:e], alen[s:e], bmat[s:e], blen[s:e])
    return out


def _dl_chunk(amat, alen, bmat, blen):
    P = alen.shape[0]
    if P == 0:
        return np.empty(0, dtype=np.int64)
    La = int(alen.max())
    Lb = bmat.shape[1]
    maxd = np.int32(La + Lb + 1)
    # cube index (i+1, j+1) holds d[i, j] of the classic formulation
    # (i, j prefix lengths; index 0 is the maxdist border row/col)
    D = np.empty((P, La + 2, Lb + 2), dtype=np.int32)
    D[:, 0, :] = maxd
    D[:, :, 0] = maxd
    D[:, 1, 1:] = np.arange(Lb + 1, dtype=np.int32)[None, :]
    if La:
        D[:, 2:, 1] = np.arange(2, La + 2, dtype=np.int32)[None, :] - 1
    res = blen.astype(np.int64).copy()  # alen == 0 -> blen
    da = np.zeros((P, 256), dtype=np.int64)  # last row of char in a
    rows = np.arange(P)
    jj = np.arange(1, Lb + 1, dtype=np.int32)[None, :]  # 1-based j
    arj = np.arange(Lb + 1, dtype=np.int32)[None, :]  # slope-1 ramp
    bmat64 = bmat.astype(np.int64)
    for i in range(1, La + 1):
        ai = amat[:, i - 1]
        cost = (ai[:, None] != bmat).astype(np.int32)
        # db[j]: last j' < j (1-based) with b[j'] == a[i], else 0
        run = np.maximum.accumulate(
            np.where(ai[:, None] == bmat, jj, 0), axis=1
        )
        db = np.zeros((P, Lb), dtype=np.int32)
        db[:, 1:] = run[:, :-1]
        k = np.take_along_axis(da, bmat64, axis=1)  # (P, Lb)
        # transposition: d[k-1, l-1] + (i-k-1) + 1 + (j-l-1)
        trans = D[rows[:, None], k, db] + (
            np.int32(i - 1) + jj - k.astype(np.int32) - db
        )
        # substitution d[i-1,j-1]+cost, deletion d[i-1,j]+1
        core = np.minimum(D[:, i, 1:Lb + 1] + cost, D[:, i, 2:] + 1)
        np.minimum(core, trans, out=core)
        # fold the insertion chain: new[j] = min_{k<=j} cand[k] + (j-k)
        cand = np.empty((P, Lb + 1), dtype=np.int32)
        cand[:, 0] = i  # border d[i, 0] = i seeds the chain
        cand[:, 1:] = core
        np.subtract(cand, arj, out=cand)
        np.minimum.accumulate(cand, axis=1, out=cand)
        np.add(cand, arj, out=cand)
        D[:, i + 1, 1:] = cand
        da[rows, amat[:, i - 1].astype(np.int64)] = i
        snap = alen == i
        if snap.any():
            res[snap] = D[snap, i + 1, blen[snap] + 1]
    return res


def charset_jaccard_batch(amat, alen, bmat, blen):
    """DuckDB ``jaccard`` for every row-pair -> float64[P]: the
    similarity of the two strings' DISTINCT BYTE sets (probe:
    ``jaccard('abc','cba') = 1.0`` — set-of-bytes, order-free;
    ``jaccard('éa','ea') = 0.25`` — bytes, not codepoints). One
    256-slot presence bitmap per side, built with a vector scatter per
    key column; the division is a single IEEE op on small integers, so
    the result is bit-identical to the oracle's. DuckDB RAISES on an
    empty argument — callers must mask out ``alen == 0 | blen == 0``
    pairs; this kernel returns 0.0 for them."""
    P = alen.shape[0]
    if P == 0:
        return np.empty(0, dtype=np.float64)
    pres_a = np.zeros((P, 256), dtype=bool)
    pres_b = np.zeros((P, 256), dtype=bool)
    for i in range(amat.shape[1]):
        sel = np.flatnonzero(alen > i)
        pres_a[sel, amat[sel, i]] = True
    for i in range(bmat.shape[1]):
        sel = np.flatnonzero(blen > i)
        pres_b[sel, bmat[sel, i]] = True
    inter = (pres_a & pres_b).sum(axis=1).astype(np.float64)
    union = (pres_a | pres_b).sum(axis=1).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        j = inter / union
    return np.where(union > 0, j, 0.0)


def jaro_batch(amat, alen, bmat, blen):
    """Plain Jaro similarity for every row-pair -> float64[P],
    DuckDB ``jaro_similarity`` semantics: byte-level, matches found
    greedily left-to-right within the standard ``max(la,lb)//2 - 1``
    window, transpositions = ``floor(mismatched_matches / 2)``, and
    0.0 when either side is empty. The scan loops over ``a``'s
    positions with the first-eligible-match argmax vectorized across
    pairs. ``jaro_winkler_batch`` layers the Winkler prefix boost on
    this exact value, so the two stay bit-consistent by construction."""
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
    return np.where((m > 0) & (alen > 0) & (blen > 0), jaro, 0.0)


def jaro_winkler_batch(amat, alen, bmat, blen):
    """Jaro-Winkler similarity for every row-pair -> float64[P]:
    :func:`jaro_batch` plus the Winkler prefix boost (scale 0.1,
    common prefix capped at 4 bytes), applied only when jaro > 0.7 —
    the DuckDB ``jaro_winkler_similarity`` semantics, pinned by the
    conformance sweep in tests/test_strsim.py."""
    jaro = jaro_batch(amat, alen, bmat, blen)
    P = alen.shape[0]
    if P == 0:
        return jaro
    Lb = bmat.shape[1]
    # common prefix (cap 4, bounded by both lengths)
    pw = min(4, amat.shape[1], Lb)
    pm = (amat[:, :pw] == bmat[:, :pw]) & (
        np.arange(pw, dtype=np.int64)[None, :]
        < np.minimum(alen, blen)[:, None]
    )
    prefix = np.cumprod(pm, axis=1).sum(axis=1).astype(np.float64)
    return np.where(jaro > 0.7, jaro + 0.1 * prefix * (1.0 - jaro), jaro)
