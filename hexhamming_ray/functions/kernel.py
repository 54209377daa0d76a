"""Hamming-distance kernels: scalar conformance + vectorized batch.

Scalar functions reproduce the reference semantics bit-for-bit
(reference: /root/reference/hexhamming/python_hexhamming.cc and
python_hexhamming.h; v2.2.3), including its verified quirks:

* case-insensitive hex decode via ``(c & ~0x20) - 55`` for ``c > '9'``
  (python_hexhamming.h:225-226), which silently accepts ``'@'`` (0x40)
  and ``'`'`` (0x60) as nibble value 9;
* exact ``ValueError`` messages (python_hexhamming.cc:105,115,158,208,
  227,261,266,271);
* ``check_hexstrings_within_dist``: inclusive threshold
  (python_hexhamming.cc:62-64), byte-identity short-circuit that skips
  hex validation (python_hexhamming.cc:39-41), and the early-True when
  ``max_dist > len(a)`` — character count, not bit count
  (python_hexhamming.cc:212-214);
* ``check_bytes_arrays_within_dist``: ordered scan, first index with
  ``dist <= max_dist`` inclusive, else -1 (python_hexhamming.cc:276-283).

Batch kernels are the engine's hot path: vectorized numpy XOR+popcount
over ``(N, W) uint8`` fingerprint matrices (zero-copy views of Arrow
FixedSizeBinary buffers). Two implementations mirror the reference's
``set_algo`` runtime-swappable kernels (python_hexhamming.cc:294-344):
``"lut8"`` (8-bit popcount table, analog of the PSHUFB LUT kernels) and
``"swar64"`` (uint64 shift/mask/multiply, analog of popcnt64__classic,
python_hexhamming.h:155-165). All kernels must agree exactly — pinned by
the conformance sweep in tests (mirrors test/test_hexhamming.py:69-77).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# decode tables (module-level constants, built once per process/actor)
# ---------------------------------------------------------------------------

# nibble value per ASCII byte under the reference's quirky decode:
#   val = (c > '9') ? (c & ~0x20) - 55 : (c - '0'); valid iff 0 <= val <= 15
# -1 marks invalid. Reproduces '@'/'`' -> 9 acceptance.
_NIBBLE = np.full(256, -1, dtype=np.int16)
for _c in range(256):
    if _c > ord("9"):
        _v = (_c & ~0x20) - 55
    else:
        _v = _c - ord("0")
    if 0 <= _v <= 15:
        _NIBBLE[_c] = _v

# popcount of a 4-bit value (reference LOOKUP[16], python_hexhamming.h:204)
_LOOKUP4 = np.array([0, 1, 1, 2, 1, 2, 2, 3, 1, 2, 2, 3, 2, 3, 3, 4], dtype=np.uint8)

# popcount of an 8-bit value
POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


# ---------------------------------------------------------------------------
# scalar conformance API (reference-exact)
# ---------------------------------------------------------------------------


def _decode_hex_bytes(raw: bytes) -> np.ndarray:
    """UTF-8 byte string -> int16 nibble array; raises on invalid char."""
    vals = _NIBBLE[np.frombuffer(raw, dtype=np.uint8)]
    if vals.size and vals.min() < 0:
        raise ValueError("hex string contains invalid char")
    return vals


def hamming_distance_string(a: str, b: str) -> int:
    """Bitwise Hamming distance of two equal-length hex strings.

    Reference: hamming_distance_string_wrapper, python_hexhamming.cc:79-122.
    The reference receives the UTF-8 C string (PyArg_ParseTuple "s") and
    compares strlen of the ENCODED bytes, so non-ASCII inputs length-
    compare by byte count and then fail per-byte validation — e.g.
    ('é', 'ab') proceeds past the length check (2 bytes each) and
    raises 'hex string contains invalid char', not a length error."""
    if not isinstance(a, str) or not isinstance(b, str):
        raise ValueError("error occurred while parsing arguments")
    ra = a.encode("utf-8")
    rb = b.encode("utf-8")
    if len(ra) != len(rb):
        raise ValueError("strings are NOT the same length")
    va = _decode_hex_bytes(ra)
    vb = _decode_hex_bytes(rb)
    return int(_LOOKUP4[(va ^ vb).astype(np.uint8)].sum())


def hamming_distance_bytes(a: bytes, b: bytes) -> int:
    """Bitwise Hamming distance of two equal-length byte buffers.

    Reference: hamming_distance_bytes_wrapper, python_hexhamming.cc:133-166.
    """
    if not isinstance(a, (bytes, bytearray)) or not isinstance(b, (bytes, bytearray)):
        raise ValueError("error occurred while parsing arguments")
    if len(a) != len(b):
        raise ValueError("bytes are NOT the same length")
    if not a:
        return 0
    xa = np.frombuffer(bytes(a), dtype=np.uint8)
    xb = np.frombuffer(bytes(b), dtype=np.uint8)
    return int(POP8[xa ^ xb].sum())


def check_hexstrings_within_dist(a: str, b: str, max_dist: int) -> bool:
    """Inclusive thresholded predicate ``dist(a, b) <= max_dist``.

    Reference wrapper python_hexhamming.cc:177-234; scalar kernel :31-68.
    Guard order and quirks preserved: equal length -> max_dist sign ->
    early-True when ``max_dist > len(a)`` -> byte-identity short-circuit
    (no hex validation) -> LUT accumulation with early exit.
    """
    if not isinstance(a, str) or not isinstance(b, str) or not isinstance(max_dist, int):
        raise ValueError("error occurred while parsing arguments")
    ra = a.encode("utf-8")  # reference strlen semantics: byte counts
    rb = b.encode("utf-8")
    if len(ra) != len(rb):
        raise ValueError("strings are NOT the same length")
    if max_dist < 0:
        raise ValueError("`max_dist` must be >0")
    if max_dist > len(ra):
        return True
    if ra == rb:
        return True
    va = _decode_hex_bytes(ra)
    vb = _decode_hex_bytes(rb)
    return int(_LOOKUP4[(va ^ vb).astype(np.uint8)].sum()) <= max_dist


def check_bytes_arrays_within_dist(
    array_of_elems: bytes, elem_to_compare: bytes, max_dist: int
) -> int:
    """1-vs-N probe over a packed fixed-width element array.

    Returns the index of the *first* element (scan order) with
    ``dist <= max_dist`` (inclusive), else -1.
    Reference: python_hexhamming.cc:246-284.

    Cost-model note: the reference early-exits per chunk as soon as a
    match is found (python_hexhamming.h:533-541); this implementation
    computes all N distances vectorized and takes the first index —
    semantically identical (tested), but on early-match-heavy scans the
    reference does less work while this path amortizes better on
    match-late/no-match scans (one numpy pass vs N branchy iterations).
    """
    if not isinstance(array_of_elems, (bytes, bytearray)) or not isinstance(
        elem_to_compare, (bytes, bytearray)
    ):
        raise ValueError("error occurred while parsing arguments")
    if len(elem_to_compare) == 0:
        raise ValueError("`elem_to_compare` size must be >0")
    if max_dist < 0:
        raise ValueError("`max_dist` must be >=0")
    w = len(elem_to_compare)
    if len(array_of_elems) % w != 0:
        raise ValueError(
            "`array_of_elems` size must be multiplier of `elem_to_compare`"
        )
    n = len(array_of_elems) // w
    if n == 0:
        return -1
    block = np.frombuffer(bytes(array_of_elems), dtype=np.uint8).reshape(n, w)
    probe = np.frombuffer(bytes(elem_to_compare), dtype=np.uint8)
    # vectorized over the whole array; "first match" recovered by argmax on
    # the inclusive mask (replaces the reference's early-exit ordered scan
    # with an order-equivalent batch computation)
    dists = POP8[block ^ probe].sum(axis=1, dtype=np.int64)
    hits = np.flatnonzero(dists <= max_dist)
    return int(hits[0]) if hits.size else -1


# ---------------------------------------------------------------------------
# batch kernels (the engine hot path)
# ---------------------------------------------------------------------------


def _popcount_rows_lut8(x: np.ndarray) -> np.ndarray:
    """Sum of popcounts along the last axis of a uint8 array."""
    return POP8[x].sum(axis=-1, dtype=np.int64)


def _swar64_popcount(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit SWAR popcount (analog of popcnt64__classic,
    python_hexhamming.h:155-165); input uint64, output uint64 per lane."""
    v = v - ((v >> np.uint64(1)) & _M1)
    v = (v & _M2) + ((v >> np.uint64(2)) & _M2)
    v = (v + (v >> np.uint64(4))) & _M4
    return (v * _H01) >> np.uint64(56)


def _popcount_rows_swar64(x: np.ndarray) -> np.ndarray:
    """Sum of popcounts along last axis; requires last-dim % 8 == 0."""
    v = np.ascontiguousarray(x).view(np.uint64)
    return _swar64_popcount(v).sum(axis=-1, dtype=np.int64)


_KERNELS = {"lut8": _popcount_rows_lut8, "swar64": _popcount_rows_swar64}


def available_kernels(width: int) -> list[str]:
    """Kernel names usable for fingerprints of `width` bytes (analog of the
    reference's CPUID capability probe, python_hexhamming.h:79-126)."""
    names = ["lut8"]
    if width % 8 == 0:
        names.append("swar64")
    return names


def select_kernel(width: int, name: str | None = None):
    """Pick a popcount-rows kernel, mirroring set_algo semantics
    (python_hexhamming.cc:294-344): explicit name, else the process
    default chosen by ``set_algo``, else best available. Raises
    ValueError with the reference's error texts for unknown /
    unsupported names (``set_algo`` below is the return-string-contract
    twin for conformance with python_hexhamming.cc:342, :479)."""
    avail = available_kernels(width)
    if name is None:
        name = _SELECTED if _SELECTED in avail else avail[-1]
    if name not in _KERNELS:
        raise ValueError("Library was built without this algorithm.")
    if name not in avail:
        raise ValueError("CPU doesnt support this feature.")
    return _KERNELS[name]


# Reference algo names -> engine kernels. The reference's set_algo
# sweep uses ['extra', 'native', 'sse41', 'classic']
# (test/test_hexhamming.py:69-77): 'classic' is the scalar SWAR path
# (popcnt64__classic) -> swar64; 'extra'/'native' are the SIMD paths,
# whose engine analog is the vectorized LUT kernel; 'sse41' has no
# engine analog and reports CPU-unsupported, exercising the sweep's
# skip branch exactly as a non-SSE4.1 host would.
_ALGO_ALIASES = {
    "classic": "swar64",
    "native": "lut8",
    "extra": "lut8",
    "lut8": "lut8",
    "swar64": "swar64",
}
_SELECTED: str | None = None


def set_algo(name: str) -> str:
    """Process-global kernel selection with the reference's RETURN-
    STRING error contract (python_hexhamming.cc:294-344): returns ``""``
    on success, ``"CPU doesnt support this feature."`` when the named
    algorithm exists but this host/width can't run it (formatted with
    a capability hex in the reference, python_hexhamming.cc:479 — the
    engine has no CPUID so the suffix is omitted), and ``"Library was
    built without this algorithm."`` for unknown names
    (python_hexhamming.cc:342). Never raises.

    Scope: affects the CALLING process only (each Ray worker selects
    independently); scorer actors pass ``kernel=`` explicitly — the
    reference's global pointer mutation is not thread-safe
    (SURVEY.md §4.1), so cross-worker mutation is deliberately not
    offered."""
    global _SELECTED
    if name == "sse41":
        return "CPU doesnt support this feature."
    if name not in _ALGO_ALIASES:
        return "Library was built without this algorithm."
    kernel = _ALGO_ALIASES[name]
    from hexhamming_ray.functions.hashing import FP_BYTES

    if kernel not in available_kernels(FP_BYTES):
        return "CPU doesnt support this feature."
    _SELECTED = kernel
    return ""


def hamming_rowwise(
    a: np.ndarray, b: np.ndarray, kernel: str | None = None
) -> np.ndarray:
    """Row-wise Hamming distances between two (N, W) uint8 matrices."""
    if a.shape != b.shape:
        raise ValueError("bytes are NOT the same length")
    fn = select_kernel(a.shape[-1], kernel)
    return fn(a ^ b)


class AllPairsScorer:
    """All-pairs / cross-block Hamming scorer with preallocated tiles.

    This sandbox faults fresh numpy pages slowly (BASELINE.md §B), so the
    XOR scratch buffer is allocated once and reused across calls — the
    stateful-actor shape: construct once per actor in ``__init__``, call
    per batch.

    Default ``tile=256``: the 2 MB XOR tile (plus the popcount kernel's
    same-sized temporaries) stays L2/L3-resident — measured 11.6 M
    pair-cmp/s/core vs 6.5 M at tile=1024 (whose 32 MB working set
    thrashes cache), and the per-worker first-touch fault cost of the
    scratch drops 16x, which is what let the distributed score stage
    scale (16 workers faulting ~100 MB each semi-serialized was the
    stage's dominant cold cost).
    """

    def __init__(self, width: int, tile: int = 256, kernel: str | None = None):
        self.width = width
        self.tile = tile
        self.kernel_name = kernel or available_kernels(width)[-1]
        self._fn = select_kernel(width, kernel)
        self._xor = np.empty((tile, tile, width), dtype=np.uint8)

    def pairs_within(
        self, block: np.ndarray, max_dist: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All unordered pairs (i < j) within one (N, W) block with
        ``dist <= max_dist`` (inclusive, per reference §1.2.4).

        Returns (i_idx, j_idx, dist) int64/int64/int64 arrays.
        """
        n = block.shape[0]
        t = self.tile
        out_i: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for i0 in range(0, n, t):
            ai = block[i0 : i0 + t]
            for j0 in range(i0, n, t):
                bj = block[j0 : j0 + t]
                buf = self._xor[: ai.shape[0], : bj.shape[0]]
                np.bitwise_xor(ai[:, None, :], bj[None, :, :], out=buf)
                d = self._fn(buf)
                ii, jj = np.nonzero(d <= max_dist)
                gi = ii + i0
                gj = jj + j0
                keep = gi < gj  # strict upper triangle across tiles
                if keep.any():
                    out_i.append(gi[keep])
                    out_j.append(gj[keep])
                    out_d.append(d[ii[keep], jj[keep]])
        if not out_i:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return (
            np.concatenate(out_i),
            np.concatenate(out_j),
            np.concatenate(out_d),
        )

    def probe(
        self, block: np.ndarray, queries: np.ndarray, max_dist: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Cross product queries × block under threshold (batched 1-vs-N,
        the vectorized analog of check_bytes_arrays_within_dist).

        Returns (q_idx, b_idx, dist)."""
        t = self.tile
        out_q: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for q0 in range(0, queries.shape[0], t):
            qs = queries[q0 : q0 + t]
            for b0 in range(0, block.shape[0], t):
                bs = block[b0 : b0 + t]
                buf = self._xor[: qs.shape[0], : bs.shape[0]]
                np.bitwise_xor(qs[:, None, :], bs[None, :, :], out=buf)
                d = self._fn(buf)
                qi, bi = np.nonzero(d <= max_dist)
                if qi.size:
                    out_q.append(qi + q0)
                    out_b.append(bi + b0)
                    out_d.append(d[qi, bi])
        if not out_q:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return np.concatenate(out_q), np.concatenate(out_b), np.concatenate(out_d)


def fsb_to_matrix(arr) -> np.ndarray:
    """Zero-copy view of a pyarrow FixedSizeBinaryArray as (N, W) uint8."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    width = arr.type.byte_width
    buf = arr.buffers()[1]
    mat = np.frombuffer(buf, dtype=np.uint8)
    off = arr.offset * width
    return mat[off : off + len(arr) * width].reshape(len(arr), width)
