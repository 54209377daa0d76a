"""Vectorized fingerprint functions: sha256, 256-bit simhash, minhash,
rolling-hash document fingerprints, stable ids.

The simhash is computed over byte 8-gram shingles with a fully
vectorized numpy path: one concatenated buffer per batch, rolling
uint64 window hashes built from 8 shifted adds, a splitmix64 finisher,
bit-unpacking, and cumsum-based segment sums per document. No per-row
Python work except offset bookkeeping (SURVEY.md §4.3: the scorer/
fingerprint hot paths must be batch-level, never row-at-a-time).
"""

from __future__ import annotations

import hashlib

import numpy as np

FP_BYTES = 32  # 256-bit fingerprints
_LANE_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)
_SPLIT_K1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLIT_K2 = np.uint64(0x94D049BB133111EB)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over a uint64 array."""
    z = z ^ (z >> np.uint64(30))
    z = z * _SPLIT_K1
    z = z ^ (z >> np.uint64(27))
    z = z * _SPLIT_K2
    return z ^ (z >> np.uint64(31))


def _rolling_u64(buf: np.ndarray, sc: "_SimhashScratch") -> np.ndarray:
    """Injective uint64 value of every 8-byte window of a uint8 buffer
    (little-endian packing via ONE unaligned strided-view copy into
    preallocated scratch).

    The previous 8x shift-OR cascade made ~17 full passes over
    8-bytes-per-byte arrays and capped the whole fingerprint stage at
    ~39 MB content/s/core on this memory-constrained sandbox; the
    single unaligned copy measures 840 MB/s/core (21x) and cuts the
    kernel's bandwidth pressure, which is what throttled multi-worker
    scaling (BASELINE.md §C). Any injective packing works — the window
    hash feeds splitmix64 mixing — so LE byte order is as good as BE.

    Returns a view of scratch of length ``len(buf) - 7``.
    """
    m = buf.shape[0]
    if m < 8:
        return np.empty(0, dtype=np.uint64)
    sc.ensure(m)
    out = sc.u64_b[: m - 7]
    view = np.ndarray(
        shape=(m - 7,), dtype=np.uint64, buffer=buf.data, strides=(1,)
    )
    np.copyto(out, view)
    return out


# ---------------------------------------------------------------------------
# simhash: content-defined sampled byte 8-grams + bincount bit histogram
# ---------------------------------------------------------------------------
# This sandbox faults fresh pages very slowly (BASELINE.md §B: 32 MB XOR
# 2.7 s cold), and numpy's reduceat over 2D bit matrices is slow, so the
# hot path (a) samples ~1/4 of windows content-defined (sampling depends
# only on window bytes, so it is insertion/shift-robust), and (b) turns
# per-bit counting into per-byte histograms: one np.bincount per
# (doc, lane) over offset-tagged hash bytes, folded to 64 bit counts by
# an (8*256, 64) matmul with a precomputed expansion LUT. All large
# buffers live in per-process scratch, reused across batches.

_GOLD = np.uint64(0x9E3779B97F4A7C15)
# keep windows whose (h*GOLD) top 2 bits == 0 (~1/4). Sampling rate is
# the single biggest lever on fingerprint cost (every sampled window
# costs 4 lane mixes + 32 histogram entries) — but 1/8 was MEASURED to
# break clustering: same-language UNRELATED files (shared keyword/
# boilerplate shingle mass) sit at simhash distance ~25-40, and the
# extra sampling variance (x1.41 spread) pushed a heavy tail of them
# under threshold 20 — 82 hub clusters merged into one 12k-file
# component on the 60k bench corpus while pairwise F1 stayed 1.0 (the
# labels' negatives are consecutive-rep pairs, blind to hub-hub
# merges; test_hub_isolation pins this). Do not raise this shift
# without re-checking the unrelated-pair distance tail.
_SAMPLE_SHIFT = np.uint64(62)
_SAMPLE_THRESH = np.uint64(1) << _SAMPLE_SHIFT
_SMALL_DOC_WINDOWS = 128  # docs with fewer windows use all of them
_MERSENNE = np.uint64((1 << 61) - 1)

# (8*256, 64) float32: row p*256+v maps byte value v at byte position p
# to its 8 bit indicators at bit positions p*8..p*8+7
_HISTLUT = np.zeros((8 * 256, 64), dtype=np.float32)
for _p in range(8):
    _bits = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)
    _HISTLUT[_p * 256 : (_p + 1) * 256, _p * 8 : (_p + 1) * 8] = _bits
_POFF = (np.arange(8, dtype=np.uint16) * 256)[None, :]
# docs per grouped-histogram matmul: caps the bincount range at
# _HIST_GROUP*2048 bins independent of batch doc count
_HIST_GROUP = 512
# sub-batches with at least this many docs take the grouped path (avg
# doc < ~1 KB at the 1 MB sub-batch size); below it the per-doc
# bincount loop wins on memory traffic — see the regime-switch comment
_HIST_GROUPED_MIN_DOCS = 2048


class _SimhashScratch:
    def __init__(self):
        self.cap = 0
        self.wcap = 0

    def ensure(self, nbytes: int) -> None:
        if nbytes > self.cap:
            cap = max(nbytes, 1 << 20, self.cap * 2)
            self.u64_b = np.empty(cap, dtype=np.uint64)
            self.u64_c = np.empty(cap, dtype=np.uint64)
            self.cap = cap

    def ensure_windows(self, nwin: int) -> None:
        if nwin > self.wcap:
            wcap = max(nwin, 1 << 18, self.wcap * 2)
            self.g = np.empty(wcap, dtype=np.uint64)
            self.offs = np.empty((wcap, 8), dtype=np.uint16)
            self.wcap = wcap
            self.kcap = 0

    def ensure_keys(self, nwin: int) -> None:
        # (doc, bin) keys for the grouped histogram matmul — allocated
        # only when the tiny-doc grouped path actually runs
        if nwin > getattr(self, "kcap", 0):
            kcap = max(nwin, 1 << 18, getattr(self, "kcap", 0) * 2)
            self.key = np.empty(kcap * 8, dtype=np.int64)
            self.docbase = np.empty(kcap * 8, dtype=np.int64)
            self.kcap = kcap


_SCRATCH: _SimhashScratch | None = None


def _scratch() -> _SimhashScratch:
    global _SCRATCH
    if _SCRATCH is None:
        _SCRATCH = _SimhashScratch()
    return _SCRATCH


def _view_from_contents(contents: list[bytes]):
    """list[bytes] -> the (buf, lens, starts) contiguous view the hash
    cores consume (ONE join; the legacy entry-point adapter)."""
    n = len(contents)
    lens = np.fromiter((len(c) for c in contents), dtype=np.int64, count=n)
    if n == 0:
        return (np.empty(0, dtype=np.uint8), lens,
                np.empty(0, dtype=np.int64))
    buf = np.frombuffer(b"".join(contents), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return buf, lens, starts


def utf8_view(col):
    """Arrow string/binary column -> (buf uint8, lens int64, starts
    int64) directly over the column's flattened value buffer —
    ZERO-COPY, no per-document Python string/bytes objects (VERDICT
    r03 #4: the ``[t.encode() for t in to_pylist()]`` re-encode copied
    every document through Python objects in the hottest stage of the
    flagship; a string column's data buffer already IS the utf-8
    stream ``encode()`` would produce).

    Docs are contiguous in ``buf`` (Arrow guarantees monotone offsets
    with no gaps), which the window kernels' boundary invalidation
    relies on. Null slots are fill_null'ed to empty first (rare; costs
    a rebuild only when nulls exist)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return (np.empty(0, dtype=np.uint8),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    if col.null_count:
        fill = b"" if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type) else ""
        col = pc.fill_null(col, fill)
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        odt, osz = np.int64, 8
    else:
        odt, osz = np.int32, 4
    bufs = col.buffers()
    off = np.frombuffer(
        bufs[1], dtype=odt, count=n + 1, offset=col.offset * osz
    ).astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    base = off[0]
    return data[base:off[-1]], np.diff(off), off[:-1] - base


def _chunk_ranges(lens: np.ndarray, limit: int):
    """Index ranges of cumulative byte size <= limit (an oversized doc
    forms its own range). Keeps per-call scratch/temporary arrays at a
    fixed small size: large fresh allocations page-fault serially
    across workers in this environment (measured: an 8x-content
    fingerprint stage stopped scaling with CPUs entirely until
    sub-batching was added)."""
    n = lens.shape[0]
    start = 0
    total = 0
    ll = lens.tolist()
    for i in range(n):
        if i > start and total + ll[i] > limit:
            yield start, i
            start = i
            total = 0
        total += ll[i]
    if start < n:
        yield start, n


def _sampled_windows(buf, lens, starts):
    """Shared shingle extractor: content-defined-sampled byte-8-gram
    window hashes for a batch given its contiguous (buf, lens, starts)
    view. Returns (hv, docv, seg_starts, seg_ends) with hv the
    concatenated sampled window hashes (uint64) and the segment bounds
    per document (empty segments for docs shorter than 8 bytes), or
    None when the batch has no windows at all."""
    n = lens.shape[0]
    if n == 0 or int(lens.sum()) == 0:
        return None
    nwin_doc = np.maximum(lens - 7, 0)
    total_win = int(nwin_doc.sum())
    if total_win == 0:
        return None
    sc = _scratch()
    hv, docv = _select_windows(buf, lens, starts, nwin_doc, n, sc)
    if hv.shape[0] == 0:
        return None
    seg_starts = np.searchsorted(docv, np.arange(n), side="left")
    seg_ends = np.searchsorted(docv, np.arange(n), side="right")
    return hv, docv, seg_starts, seg_ends


def _select_windows(buf, lens, starts, nwin_doc, n, sc):
    """Sampled (hv, docv) window selection, mask-first.

    Selects exactly the windows the original gather did — sampled ones
    (``(h * GOLD) >> 62 == 0``) plus every valid window of small docs —
    but builds the predicate directly on the rolling-hash array and only
    then derives doc ids for SURVIVORS via searchsorted. The previous
    formulation materialized doc-id / offset / gather-index int64
    arrays over the FULL window space (~24 bytes/window before
    sampling), tripling the kernel's memory traffic; on this
    bandwidth-throttled host that traffic was what limited multi-worker
    scaling (BASELINE.md §C)."""
    with np.errstate(over="ignore"):
        h = _rolling_u64(buf, sc)
        nbuf = h.shape[0]
        if nbuf == 0:
            return (np.empty(0, dtype=np.uint64),
                    np.empty(0, dtype=np.int64))
        t = sc.u64_c[:nbuf]
        np.multiply(h, _GOLD, out=t)
        # fused predicate: (t >> SHIFT) == 0  <=>  t < 2^SHIFT
        # (saves one full read+write pass over the window array)
        keep = t < _SAMPLE_THRESH
    # windows crossing a document boundary are invalid: for every
    # interior boundary e, positions e-7..e-1 (tiny docs' windows all
    # sit within 7 of a boundary, so this also clears them)
    if n > 1:
        ends = (starts + lens)[:-1]
        inv = (ends[:, None] + np.arange(-7, 0)[None, :]).ravel()
        inv = inv[(inv >= 0) & (inv < nbuf)]
        keep[inv] = False
    # small docs keep every valid window (sampling variance would
    # otherwise dominate their fingerprints)
    small = np.flatnonzero((nwin_doc > 0) & (nwin_doc < _SMALL_DOC_WINDOWS))
    for d in small:
        keep[starts[d] : starts[d] + nwin_doc[d]] = True
    pos = np.flatnonzero(keep)
    if pos.shape[0] == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    hv = h[pos]
    docv = np.searchsorted(starts, pos, side="right") - 1
    return hv, docv


def minhash_bytes_batch(
    contents: list[bytes], num_perm: int = 64, seed: int = 42
) -> np.ndarray:
    """list[bytes] adapter over :func:`minhash_view`."""
    return minhash_view(*_view_from_contents(contents),
                        num_perm=num_perm, seed=seed)


def minhash_view(buf, lens, starts, num_perm: int = 64,
                 seed: int = 42) -> np.ndarray:
    """Sub-batched wrapper over the one-permutation MinHash core (same
    fixed-scratch rationale as simhash_view) taking the contiguous
    (buf, lens, starts) view — feed it :func:`utf8_view` of an Arrow
    string column for the zero-copy path."""
    n = lens.shape[0]
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for s0, s1 in _chunk_ranges(lens, _SUBBATCH_BYTES):
        b0 = int(starts[s0])
        b1 = b0 + int(lens[s0:s1].sum())
        out[s0:s1] = _minhash_core_view(
            buf[b0:b1], lens[s0:s1], starts[s0:s1] - b0, num_perm, seed
        )
    return out


def _minhash_core_view(
    buf, lens, starts, num_perm: int = 64, seed: int = 42
) -> np.ndarray:
    """One-permutation MinHash over byte-8-gram shingles -> (N, num_perm)
    uint64 (num_perm must be a power of two).

    A single splitmix64 pass over the batch's sampled window stream;
    each hash is routed to bucket ``v >> (64 - log2 P)`` and the
    per-(doc, bucket) minimum taken with one scatter-min — 64x less
    memory traffic than P independent permutation passes (this sandbox
    is memory-bandwidth-bound). Empty buckets are densified by circular
    borrow from the nearest filled bucket (rotation densification);
    documents without windows keep the all-max sentinel signature."""
    n = lens.shape[0]
    maxv = np.iinfo(np.uint64).max
    sigs = np.full((n, num_perm), maxv, dtype=np.uint64)
    sw = _sampled_windows(buf, lens, starts)
    if sw is None:
        return sigs
    hv, docv, seg_starts, seg_ends = sw
    shift = np.uint64(64 - int(np.log2(num_perm)))
    salt = np.random.default_rng(seed).integers(
        0, maxv, dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        v = hv ^ salt
        v ^= v >> np.uint64(30)
        v *= _SPLIT_K1
        v ^= v >> np.uint64(27)
        v *= _SPLIT_K2
        v ^= v >> np.uint64(31)
        bucket = (v >> shift).astype(np.int64)
    key = docv * num_perm + bucket
    flat = sigs.reshape(-1)
    np.minimum.at(flat, key, v)
    # rotation densification (skip docs with no windows at all)
    has_win = seg_ends > seg_starts
    filled = sigs != maxv
    need = has_win & ~filled.all(axis=1)
    if need.any():
        x = np.concatenate([sigs[need], sigs[need]], axis=1)
        pos = np.where(x != maxv, np.arange(2 * num_perm)[None, :], -1)
        np.maximum.accumulate(pos, axis=1, out=pos)
        val = np.take_along_axis(x, np.maximum(pos, 0), axis=1)
        dense = np.where(pos >= 0, val, maxv)[:, num_perm:]
        sigs[need] = dense
    return sigs


_SUBBATCH_BYTES = 1 << 20


def simhash_batch(contents: list[bytes]) -> np.ndarray:
    """list[bytes] adapter over :func:`simhash_view`."""
    return simhash_view(*_view_from_contents(contents))


def simhash_view(buf, lens, starts) -> np.ndarray:
    """256-bit simhash per document -> (N, 32) uint8, from the
    contiguous (buf, lens, starts) view (:func:`utf8_view` of an Arrow
    string column for the zero-copy path). Processes in ~1 MB content
    sub-batches through fixed-size scratch."""
    n = lens.shape[0]
    out = np.zeros((n, FP_BYTES), dtype=np.uint8)
    for s0, s1 in _chunk_ranges(lens, _SUBBATCH_BYTES):
        b0 = int(starts[s0])
        b1 = b0 + int(lens[s0:s1].sum())
        out[s0:s1] = _simhash_core_view(
            buf[b0:b1], lens[s0:s1], starts[s0:s1] - b0
        )
    return out


def _simhash_core_view(buf, lens, starts) -> np.ndarray:
    """256-bit simhash per document -> (N, 32) uint8.

    Majority vote per bit position over four salted splitmix64 lanes of
    the document's sampled byte-8-gram window hashes. Documents shorter
    than 8 bytes get the all-zero sentinel fingerprint (they are handled
    by the exact sha256 path, never near-dup scored).
    """
    n = lens.shape[0]
    out = np.zeros((n, FP_BYTES), dtype=np.uint8)
    if n == 0 or int(lens.sum()) == 0:
        return out
    nwin_doc = np.maximum(lens - 7, 0)
    total_win = int(nwin_doc.sum())
    if total_win == 0:
        return out
    sc = _scratch()
    hv, docv = _select_windows(buf, lens, starts, nwin_doc, n, sc)
    m = hv.shape[0]
    if m == 0:
        return out
    with np.errstate(over="ignore"):
        sc.ensure_windows(m)
        seg_starts = np.searchsorted(docv, np.arange(n), side="left")
        seg_ends = np.searchsorted(docv, np.arange(n), side="right")
        wcounts = seg_ends - seg_starts
        counts = np.empty((n, 4, 64), dtype=np.float32)
        g = sc.g[:m]
        offs = sc.offs[:m]
        # REGIME SWITCH (both branches bit-identical — _HISTLUT is 0/1
        # and histogram counts are small integers, so every float32 dot
        # is an exact integer regardless of summation order):
        # - many tiny docs: grouped (doc, bin) bincount + one BLAS
        #   matmul per group — the per-doc path's 2 Python calls per
        #   doc per lane dominate (~2.5x measured on 15-byte docs).
        # - few large docs (the ER corpus regime): per-doc bincounts —
        #   the grouped path's int64 key build is two extra full passes
        #   at 8 bytes/entry over u16 data (~6x the memory traffic),
        #   which saturates the shared bus at high worker counts
        #   (measured: fingerprint stage 26.5 s -> 35 s at 16 CPUs on
        #   the 60k/scale-24 corpus when grouped ran unconditionally).
        grouped = n >= _HIST_GROUPED_MIN_DOCS
        if grouped:
            sc.ensure_keys(m)
            # lane-independent (doc * 2048) base per flat window byte
            sc.docbase[: m * 8].reshape(m, 8)[:] = (
                docv * np.int64(2048)
            )[:, None]
        for lane in range(4):
            np.bitwise_xor(hv, _LANE_SALTS[lane], out=g)
            g ^= g >> np.uint64(30)
            g *= _SPLIT_K1
            g ^= g >> np.uint64(27)
            g *= _SPLIT_K2
            g ^= g >> np.uint64(31)
            gb = g.view(np.uint8).reshape(m, 8)
            np.add(gb, _POFF, out=offs, casting="unsafe")
            flat = offs.reshape(-1)
            if not grouped:
                for d in range(n):
                    s8, e8 = seg_starts[d] * 8, seg_ends[d] * 8
                    if s8 == e8:
                        counts[d, lane] = 0.0
                        continue
                    hist = np.bincount(
                        flat[s8:e8], minlength=2048
                    ).astype(np.float32)
                    counts[d, lane] = hist @ _HISTLUT
                continue
            for d0 in range(0, n, _HIST_GROUP):
                d1 = min(d0 + _HIST_GROUP, n)
                s8 = seg_starts[d0] * 8
                e8 = seg_ends[d1 - 1] * 8
                if s8 == e8:
                    counts[d0:d1, lane] = 0.0
                    continue
                k = sc.key[: e8 - s8]
                np.subtract(
                    sc.docbase[s8:e8], np.int64(d0 * 2048), out=k
                )
                np.add(k, flat[s8:e8], out=k, casting="unsafe")
                hist = np.bincount(
                    k, minlength=(d1 - d0) * 2048
                ).astype(np.float32).reshape(d1 - d0, 2048)
                counts[d0:d1, lane] = hist @ _HISTLUT
    maj = (counts.reshape(n, 256) * 2 > wcounts[:, None]).astype(np.uint8)
    packed = np.packbits(maj, axis=1, bitorder="big")
    nonzero = wcounts > 0
    out[nonzero] = packed[nonzero]
    return out


def sha256_batch(contents: list[bytes]) -> list[str]:
    """Hex sha256 digest per document (per-row invariant vs the
    reference corpus, BASELINE.json input_hint)."""
    return [hashlib.sha256(c).hexdigest() for c in contents]


def sha256_view(buf, lens, starts) -> list[str]:
    """Hex sha256 per document from the contiguous view — the digest
    loop is irreducibly per-doc (hashlib), but each doc is fed as a
    zero-copy memoryview slice of the Arrow buffer instead of a
    freshly copied bytes object."""
    mv = memoryview(buf)
    return [
        hashlib.sha256(mv[s:s + l]).hexdigest()
        for s, l in zip(starts.tolist(), lens.tolist())
    ]


def stable_id(repo: str, path: str, commit: str) -> int:
    """Deterministic 63-bit positive file id from (repo, path, commit)
    (FIXTURES.md §B: first 8 bytes of sha256, masked into int64)."""
    d = hashlib.sha256(f"{repo}|{path}|{commit}".encode()).digest()
    return int.from_bytes(d[:8], "big") & 0x7FFFFFFFFFFFFFFF


def stable_id_batch(repos, paths, commits) -> np.ndarray:
    return np.fromiter(
        (stable_id(r, p, c) for r, p, c in zip(repos, paths, commits)),
        dtype=np.int64,
        count=len(repos),
    )


# ---------------------------------------------------------------------------
# minhash (word-shingle) for the documents-table near-dup pipeline
# ---------------------------------------------------------------------------



def minhash_batch(
    token_lists: list[list[bytes]],
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 42,
) -> np.ndarray:
    """MinHash signatures -> (N, num_perm) uint64.

    Word ``shingle``-grams hashed with blake2b(8); ``num_perm``
    universal-hash permutations ``(a*x + b) mod p`` applied vectorized.
    Empty docs get all-max signatures (never collide).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    n = len(token_lists)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        if len(toks) < shingle:
            grams = [b" ".join(toks)] if toks else []
        else:
            grams = [b" ".join(toks[j : j + shingle]) for j in range(len(toks) - shingle + 1)]
        if not grams:
            continue
        hv = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(g, digest_size=8).digest(), "big")
                for g in set(grams)
            ),
            dtype=np.uint64,
        )
        with np.errstate(over="ignore"):
            # (P, S) universal hashes; modulo a Mersenne prime keeps the
            # distribution uniform under uint64 wraparound
            vals = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
        sigs[i] = vals.min(axis=1)
    return sigs


def band_keys_from_minhash(sigs: np.ndarray, bands: int) -> np.ndarray:
    """LSH band keys -> (N, bands) uint64: hash of each band's rows."""
    n, p = sigs.shape
    r = p // bands
    with np.errstate(over="ignore"):
        keys = np.zeros((n, bands), dtype=np.uint64)
        for bidx in range(bands):
            seg = sigs[:, bidx * r : (bidx + 1) * r]
            acc = np.full(n, 0x9E3779B97F4A7C15, dtype=np.uint64)
            for col in range(r):
                acc = _mix64(acc ^ seg[:, col])
            keys[:, bidx] = acc
    return keys


# ---------------------------------------------------------------------------
# vectorized token-3-gram shingle hashing (prefix-sum polynomial hash)
# ---------------------------------------------------------------------------
# Replaces the round-2 per-gram hashlib.blake2b inner loop (the hot
# path of both ngram pipelines — VERDICT r02 "what's wrong" #3): the
# per-doc Python work is now exactly split / join / encode (three C
# calls per doc); every per-GRAM operation is a numpy pass over the
# batch's concatenated byte buffer.
#
# Scheme: a gram is a byte window [l, r) of the whitespace-normalized
# (" ".join(text.split())) document, so hash(gram) is a polynomial
# window hash mod 2^64:   H(l, r) = sum_{j=l}^{r-1} (b[j]+1) * p^(j-l)
# computed for ALL windows at once from prefix sums —
#   S[i] = sum_{j<=i} (b[j]+1) * p^j      (one cumsum, wraps mod 2^64)
#   H(l, r) = (S[r-1] - S[l-1]) * p^(-l)  (p odd => invertible mod 2^64)
# then finished with splitmix64 over (H + len*GOLD) so trailing-NUL
# polynomials and low-bit linearity can't alias. p^j / p^-j tables are
# process-cached (grow-on-demand), and the batch is internally
# sub-chunked so scratch stays O(_SHINGLE_CHUNK) regardless of block
# size — at 100 TB the block size, not this function, is the knob.
#
# Hash VALUES differ from round 2's blake2b (any injective-in-practice
# 64-bit gram hash yields the same Jaccard/DF semantics — the oracle
# compares set overlap, never hash values); determinism across workers
# is preserved (pure arithmetic, fixed constants).

_POLY_P = np.uint64(0x00000100000001B3)
_POLY_P_INV = np.uint64(pow(0x00000100000001B3, -1, 1 << 64))
_SHINGLE_CHUNK = 4 << 20  # bytes of normalized text per internal chunk


class _PowTables:
    """Process-cached p^j and p^-j tables, grown on demand."""

    def __init__(self):
        self.n = 0

    def ensure(self, n: int) -> None:
        if n > self.n:
            cap = max(n, 1 << 16, self.n * 2)
            with np.errstate(over="ignore"):
                base = np.full(cap, _POLY_P, dtype=np.uint64)
                base[0] = 1
                self.pw = np.cumprod(base)
                base.fill(_POLY_P_INV)
                base[0] = 1
                self.ipw = np.cumprod(base)
            self.n = cap


_POW = _PowTables()


_WH_SCRATCH = np.empty(0, dtype=np.uint64)


def _window_hashes(buf: np.ndarray, l: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Polynomial hashes of byte windows [l, r) of ``buf`` (uint8),
    all at once. Windows must be non-empty. The prefix-sum pass runs
    in a process-cached scratch buffer (this sandbox faults fresh
    pages slowly — BASELINE.md §B)."""
    global _WH_SCRATCH
    m = buf.shape[0]
    _POW.ensure(m)
    if _WH_SCRATCH.shape[0] < m:
        _WH_SCRATCH = np.empty(max(m, 1 << 20), dtype=np.uint64)
    with np.errstate(over="ignore"):
        S = _WH_SCRATCH[:m]
        np.copyto(S, buf, casting="unsafe")
        S += np.uint64(1)
        S *= _POW.pw[:m]
        np.cumsum(S, out=S)
        hi = S[r - 1]
        lo = np.where(l > 0, S[np.maximum(l, 1) - 1], np.uint64(0))
        H = (hi - lo) * _POW.ipw[l]
        return _mix64(H + (r - l).astype(np.uint64) * _GOLD)


def shingle_hashes_batch(
    texts: list, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-unique 64-bit token-``n``-gram shingle hashes for a
    BATCH of documents, vectorized.

    Returns ``(values, counts)``: ``values`` is the per-doc sorted
    unique uint64 hashes concatenated in doc order, ``counts[i]`` the
    number of hashes for ``texts[i]``. Semantics match the round-1
    frozenset contract: docs with < ``n`` tokens contribute their
    joined token string as the single shingle; empty/whitespace-only
    docs contribute none. Tokenization is exactly ``str.split()`` (any
    unicode whitespace), so the DuckDB oracles' gram sets are
    reproduced bit-for-bit at the SET level.
    """
    n_docs = len(texts)
    counts_out = np.zeros(n_docs, dtype=np.int64)
    values_parts: list[np.ndarray] = []
    # internal sub-chunking keeps scratch bounded irrespective of the
    # caller's block size
    start = 0
    while start < n_docs:
        end = start
        nbytes = 0
        parts: list[bytes] = []
        tokc: list[int] = []
        while end < n_docs and (nbytes < _SHINGLE_CHUNK or end == start):
            toks = texts[end].split()
            joined = " ".join(toks).encode()
            parts.append(joined)
            tokc.append(len(toks))
            nbytes += len(joined)
            end += 1
        vals, cnts = _shingle_chunk(
            parts, np.asarray(tokc, dtype=np.int64), n
        )
        values_parts.append(vals)
        counts_out[start:end] = cnts
        start = end
    values = (
        np.concatenate(values_parts)
        if values_parts
        else np.empty(0, dtype=np.uint64)
    )
    return values, counts_out


def _shingle_chunk(
    parts: list, tok_counts: np.ndarray, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    n_docs = len(parts)
    doc_lens = np.fromiter((len(p) for p in parts), np.int64, n_docs)
    doc_off = np.concatenate([[0], np.cumsum(doc_lens)])
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8)

    # gram-window counts per doc (frozenset-fallback semantics)
    gcnt = np.where(
        tok_counts == 0,
        0,
        np.where(tok_counts < n, 1, tok_counts - (n - 1)),
    )
    w_off = np.concatenate([[0], np.cumsum(gcnt)])
    total_w = int(w_off[-1])
    if total_w == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs, dtype=np.int64)

    # token starts: doc starts (non-empty docs) + byte after each 0x20.
    # Tokens cannot contain whitespace and UTF-8 multibyte sequences
    # never contain 0x20, so separators are exactly the space bytes.
    # Both source arrays are already sorted and disjoint (no doc ends
    # with a space), so a searchsorted merge beats a full re-sort.
    sp1 = np.flatnonzero(buf == 0x20)
    sp1 += 1
    starts_nz = doc_off[:-1][doc_lens > 0]
    token_starts = np.insert(sp1, np.searchsorted(sp1, starts_nz), starts_nz)
    n_tok = token_starts.shape[0]
    # token end (exclusive): next token's start - 1 (the separator),
    # overridden with the doc end for each doc's last token
    tok_end = np.empty(n_tok, dtype=np.int64)
    if n_tok > 1:
        tok_end[:-1] = token_starts[1:] - 1
    tok_end[-1:] = doc_off[-1]
    tok_cum = np.concatenate([[0], np.cumsum(tok_counts)])
    nz = tok_counts > 0
    tok_end[tok_cum[1:][nz] - 1] = doc_off[1:][nz]

    # window bounds, doc-major: normal docs take the ragged arange of
    # token triples; short docs (1-2 tokens) take the whole joined doc
    doc_of_w = np.repeat(np.arange(n_docs, dtype=np.int64), gcnt)
    intra = np.arange(total_w, dtype=np.int64) - np.repeat(w_off[:-1], gcnt)
    ti = np.minimum(tok_cum[doc_of_w] + intra, n_tok - 1)
    short = (tok_counts < n)[doc_of_w]
    l = np.where(short, doc_off[doc_of_w], token_starts[ti])
    r = np.where(
        short,
        doc_off[doc_of_w + 1],
        tok_end[np.minimum(ti + (n - 1), n_tok - 1)],
    )

    h = _window_hashes(buf, l, r)

    # per-doc sorted unique: windows are already doc-contiguous, so an
    # in-place sort per doc SEGMENT (a numpy view — no copies, ~1.5 us
    # per doc) plus ONE vectorized adjacent-duplicate sweep replaces a
    # global lexsort (measured 4x cheaper on the sf0.1 corpus, where
    # lexsort was half the whole function's cost)
    wo = w_off.tolist()
    for i in range(n_docs):
        a, b = wo[i], wo[i + 1]
        if b - a > 1:
            h[a:b].sort()
    keep = np.empty(total_w, dtype=bool)
    keep[1:] = h[1:] != h[:-1]
    keep[w_off[:-1][gcnt > 0]] = True  # segment heads always survive
    return h[keep], np.bincount(doc_of_w[keep], minlength=n_docs).astype(np.int64)


def bigram_repetition_batch(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word-BIGRAM repetition counts for a batch of documents,
    vectorized — the duplicated-n-gram quality signal of the Gopher
    rules (Rae et al. 2021): a document whose bigram stream is
    dominated by repeats is boilerplate/template text.

    Returns ``(n_bigrams, n_dup)`` int64 arrays, one entry per input
    text: ``n_bigrams[i]`` is the number of overlapping word bigrams
    (``len(tokens) - 1``; 0 when the doc has < 2 tokens) and
    ``n_dup[i]`` the number of bigram INSTANCES whose bigram occurs
    >= 2 times within the document. Tokenization is ``str.split()``
    (identical token streams to the DuckDB ``regexp_extract_all(text,
    '\\S+')`` oracle), and bigram identity is byte equality of
    ``tok[i] + ' ' + tok[i+1]`` via the same 64-bit polynomial window
    hash the shingle explode uses (collisions would need two distinct
    bigrams of one doc to collide in 64 mixed bits).
    """
    n_docs = len(texts)
    n_big = np.zeros(n_docs, dtype=np.int64)
    n_dup = np.zeros(n_docs, dtype=np.int64)
    start = 0
    while start < n_docs:
        end = start
        nbytes = 0
        parts: list[bytes] = []
        tokc: list[int] = []
        while end < n_docs and (nbytes < _SHINGLE_CHUNK or end == start):
            toks = texts[end].split()
            joined = " ".join(toks).encode()
            parts.append(joined)
            tokc.append(len(toks))
            nbytes += len(joined)
            end += 1
        b, d = _bigram_rep_chunk(parts, np.asarray(tokc, dtype=np.int64))
        n_big[start:end] = b
        n_dup[start:end] = d
        start = end
    return n_big, n_dup


def _bigram_rep_chunk(
    parts: list, tok_counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    n_docs = len(parts)
    doc_lens = np.fromiter((len(p) for p in parts), np.int64, n_docs)
    doc_off = np.concatenate([[0], np.cumsum(doc_lens)])
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8)

    gcnt = np.maximum(tok_counts - 1, 0)  # one window per adjacent pair
    w_off = np.concatenate([[0], np.cumsum(gcnt)])
    total_w = int(w_off[-1])
    zeros = np.zeros(n_docs, dtype=np.int64)
    if total_w == 0:
        return gcnt.copy(), zeros

    # token boundaries: same space-separator derivation as _shingle_chunk
    sp1 = np.flatnonzero(buf == 0x20)
    sp1 += 1
    starts_nz = doc_off[:-1][doc_lens > 0]
    token_starts = np.insert(sp1, np.searchsorted(sp1, starts_nz), starts_nz)
    n_tok = token_starts.shape[0]
    tok_end = np.empty(n_tok, dtype=np.int64)
    if n_tok > 1:
        tok_end[:-1] = token_starts[1:] - 1
    tok_end[-1:] = doc_off[-1]
    tok_cum = np.concatenate([[0], np.cumsum(tok_counts)])
    nz = tok_counts > 0
    tok_end[tok_cum[1:][nz] - 1] = doc_off[1:][nz]

    # window [start of tok i, end of tok i+1) — covers "tok_i tok_{i+1}"
    doc_of_w = np.repeat(np.arange(n_docs, dtype=np.int64), gcnt)
    intra = np.arange(total_w, dtype=np.int64) - np.repeat(w_off[:-1], gcnt)
    ti = tok_cum[doc_of_w] + intra
    h = _window_hashes(buf, token_starts[ti], tok_end[ti + 1])

    # duplicate-instance count per doc: sort each doc SEGMENT in place
    # (windows are doc-contiguous), then one adjacent-equality sweep —
    # an instance is a dup iff it equals a neighbour in sorted order
    wo = w_off.tolist()
    for i in range(n_docs):
        a, b = wo[i], wo[i + 1]
        if b - a > 1:
            h[a:b].sort()
    eq_prev = np.zeros(total_w, dtype=bool)
    eq_prev[1:] = h[1:] == h[:-1]
    eq_prev[w_off[:-1][gcnt > 0]] = False  # never compare across docs
    dup = eq_prev.copy()
    dup[:-1] |= eq_prev[1:]  # first element of a run of equals is a dup too
    return gcnt.copy(), np.bincount(
        doc_of_w, weights=dup, minlength=n_docs
    ).astype(np.int64)
