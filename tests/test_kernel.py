"""Kernel conformance corpus (FIXTURES.md §A) + property tests.

Every scalar vector comes from the reference test suite
(/root/reference/test/test_hexhamming.py) plus quirks verified against a
local build of hexhamming v2.2.3 (see SURVEY.md §1.2). Batch kernels are
swept against the scalar oracle, mirroring the reference's set_algo
sweep (test/test_hexhamming.py:69-77).
"""

import numpy as np
import pytest

from hexhamming_ray.functions import kernel as K

# ---------------------------------------------------------------------------
# A.1 hamming_distance vectors
# ---------------------------------------------------------------------------

STRING_VECTORS = [
    ("abc", "abc", 0),
    ("000", "001", 1),
    ("ABCDEF", "000001", 16),
    ("", "", 0),
    ("f" * 64, "0" * 64, 256),
    ("f" * 64, "f" * 64, 0),
    ("0" * 64, "0" * 64, 0),
    ("f" * 10000, "0" * 10000, 40000),
    ("f" * 10000, "f" * 10000, 0),
    ("DeadBEEF", "deadbeef", 0),
    ("@", "0", 2),  # quirk: '@' decodes to nibble 9
    ("`", "9", 0),  # quirk: '`' decodes to nibble 9
]

BYTE_VECTORS = [
    (b"\xab\x0c", b"\xab\x0c", 0),
    (b"\x00", b"\x01", 1),
    (b"\xab\xcd\xef", b"\x00\x00\x01", 16),
    (b"", b"", 0),
    (b"\xff" * 32, b"\x00" * 32, 256),
    (b"\xff" * 5000, b"\x00" * 5000, 40000),
    (b"\xff" * 5000, b"\xff" * 5000, 0),
]


@pytest.mark.parametrize("a,b,expected", STRING_VECTORS)
def test_hamming_distance_string(a, b, expected):
    assert K.hamming_distance_string(a, b) == expected


@pytest.mark.parametrize("a,b,expected", BYTE_VECTORS)
def test_hamming_distance_bytes(a, b, expected):
    assert K.hamming_distance_bytes(a, b) == expected


# ---------------------------------------------------------------------------
# A.2 error contract
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "a,b,sub",
    [
        ("abc", 3, "error occurred while parsing arguments"),
        ("abc", "a", "strings are NOT the same length"),
        ("lol", "foo", "hex string contains invalid char"),
        ("000abcdef", "011abcdgf", "hex string contains invalid char"),
        ("f" * 32, "f" * 31 + "g", "hex string contains invalid char"),
        ("f" * 30, "f" * 29 + "g", "hex string contains invalid char"),
        ("ggg", "ggg", "hex string contains invalid char"),
        ("g" * 15 + "fff", "g" * 15 + "000", "hex string contains invalid char"),
    ],
)
def test_string_errors(a, b, sub):
    with pytest.raises(ValueError, match=sub):
        K.hamming_distance_string(a, b)


def test_check_errors():
    with pytest.raises(ValueError, match="error occurred while parsing arguments"):
        K.check_hexstrings_within_dist("000abcdef", "011abcdef", "HELLO")
    with pytest.raises(ValueError, match="error occurred while parsing arguments"):
        K.check_hexstrings_within_dist("000abcdef", "011abcdef", None)
    with pytest.raises(ValueError, match=r"`max_dist` must be >0"):
        K.check_hexstrings_within_dist("000abcdef", "011abcdef", -1)
    with pytest.raises(ValueError, match="strings are NOT the same length"):
        K.check_hexstrings_within_dist("011abcdef", "00", 3)


def test_probe_errors():
    with pytest.raises(ValueError, match=r"`max_dist` must be >=0"):
        K.check_bytes_arrays_within_dist(b"\x00" * 32, b"\x00" * 16, -1)
    with pytest.raises(
        ValueError,
        match=r"`array_of_elems` size must be multiplier of `elem_to_compare`",
    ):
        K.check_bytes_arrays_within_dist(b"\x00" * 31, b"\x00" * 16, 3)
    with pytest.raises(ValueError, match=r"`elem_to_compare` size must be >0"):
        K.check_bytes_arrays_within_dist(b"\x00" * 32, b"", 3)
    with pytest.raises(ValueError, match="bytes are NOT the same length"):
        K.hamming_distance_bytes(b"\x00", b"\x00\x00")


# ---------------------------------------------------------------------------
# A.3 check_hexstrings_within_dist vectors (incl. verified quirks)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "a,b,max_dist,expected",
    [
        ("000abcdef", "011abcdef", 3, True),
        ("1f0abcdef", "011abcdef", 3, False),
        ("011abcdef", "011abcdef", 1000, True),
        ("ffff", "fffe", 2, True),
        ("ffff", "0000", 2, False),
        ("ffff", "fffe", 1, True),
        ("ffff", "fffc", 1, False),
        ("zz", "zz", 1, True),  # identity short-circuit skips validation
        ("ffff", "0000", 5, True),  # early-True: max_dist > len(a)
        ("ab", "ab", 0, True),
        ("", "", 0, True),
    ],
)
def test_check_hexstrings_within_dist(a, b, max_dist, expected):
    assert K.check_hexstrings_within_dist(a, b, max_dist) is expected


# ---------------------------------------------------------------------------
# A.4 check_bytes_arrays_within_dist vectors
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "arr,elem,max_dist,expected",
    [
        (b"\x00" * 16, b"\xff" * 16, 50, -1),
        (b"\x00" * 16, b"\x00" * 15 + b"\x0f", 4, 0),
        (b"\xff" * (16 * 8) + b"\x0f" * 16, b"\x00" * 2 + b"\x0f" * 14, 8, 8),
        (b"\xf0" * 64 + b"\x0a" * 64, b"\x0f" * 64, 192, 1),
        (b"\x03", b"\x00", 2, 0),  # inclusive boundary
        (b"\x03", b"\x00", 1, -1),
    ],
)
def test_check_bytes_arrays_within_dist(arr, elem, max_dist, expected):
    assert K.check_bytes_arrays_within_dist(arr, elem, max_dist) == expected


# ---------------------------------------------------------------------------
# A.5 kernel sweep: batch kernels vs scalar oracle
# ---------------------------------------------------------------------------


def _oracle(a_hex: str, b_hex: str) -> int:
    return bin(int(a_hex, 16) ^ int(b_hex, 16)).count("1") if a_hex else 0


@pytest.mark.parametrize("kernel", ["lut8", "swar64"])
def test_rowwise_vs_oracle(kernel):
    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, size=(257, 32), dtype=np.uint8)
    b = rng.integers(0, 256, size=(257, 32), dtype=np.uint8)
    d = K.hamming_rowwise(a, b, kernel=kernel)
    for i in range(0, 257, 17):
        assert d[i] == _oracle(a[i].tobytes().hex(), b[i].tobytes().hex())


@pytest.mark.parametrize("kernel", ["lut8", "swar64"])
def test_allpairs_vs_bruteforce(kernel):
    rng = np.random.default_rng(7)
    n, w = 50, 32
    base = rng.integers(0, 256, size=(n, w), dtype=np.uint8)
    # plant near-duplicates: rows 10..14 are row 0 with 1-2 flipped bits
    for i in range(10, 15):
        base[i] = base[0]
        base[i, i % w] ^= 1 << (i % 8)
    scorer = K.AllPairsScorer(width=w, tile=16, kernel=kernel)
    ii, jj, dd = scorer.pairs_within(base, max_dist=8)
    got = {(int(i), int(j)): int(d) for i, j, d in zip(ii, jj, dd)}
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            d = K.hamming_distance_bytes(base[i].tobytes(), base[j].tobytes())
            if d <= 8:
                expect[(i, j)] = d
    assert got == expect


@pytest.mark.parametrize("kernel", ["lut8", "swar64"])
def test_probe_vs_scalar(kernel):
    rng = np.random.default_rng(3)
    block = rng.integers(0, 256, size=(40, 32), dtype=np.uint8)
    queries = block[:5].copy()
    queries[0, 0] ^= 0x03
    scorer = K.AllPairsScorer(width=32, tile=8, kernel=kernel)
    qi, bi, dd = scorer.probe(block, queries, max_dist=4)
    got = {(int(q), int(b)): int(d) for q, b, d in zip(qi, bi, dd)}
    for q in range(5):
        for b in range(40):
            d = K.hamming_distance_bytes(queries[q].tobytes(), block[b].tobytes())
            if d <= 4:
                assert got[(q, b)] == d
            else:
                assert (q, b) not in got


def test_set_algo_analog():
    assert K.select_kernel(32, "swar64") is not None
    with pytest.raises(ValueError, match="Library was built without this algorithm"):
        K.select_kernel(32, "avx512")
    with pytest.raises(ValueError, match="CPU doesnt support this feature"):
        K.select_kernel(31, "swar64")  # width not a multiple of 8


def test_hypothesis_oracle():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    hexchars = "0123456789abcdefABCDEF"

    @given(
        st.integers(0, 400).flatmap(
            lambda n: st.tuples(
                st.text(alphabet=hexchars, min_size=n, max_size=n),
                st.text(alphabet=hexchars, min_size=n, max_size=n),
            )
        )
    )
    @settings(max_examples=200, deadline=None)
    def inner(pair):
        a, b = pair
        assert K.hamming_distance_string(a, b) == _oracle(a, b)

    inner()


class TestSetAlgoContract:
    """Return-string contract of set_algo, mirroring the reference's
    sweep harness (test/test_hexhamming.py:69-77 skips an algo when
    set_algo(algo) returns a non-empty string; python_hexhamming.cc:342
    and :479 define the two error strings; never raises)."""

    def teardown_method(self):
        from hexhamming_ray.functions import kernel as K

        K._SELECTED = None  # reset process-global selection

    def test_unknown_algo_returns_error_string(self):
        from hexhamming_ray.functions.kernel import set_algo

        assert set_algo("bogus") == "Library was built without this algorithm."

    def test_unsupported_algo_returns_cpu_string(self):
        from hexhamming_ray.functions.kernel import set_algo

        assert set_algo("sse41").startswith("CPU doesnt support this feature.")

    def test_sweep_agreement(self):
        """Every selectable algo yields identical distances (the
        reference's N-implementations-must-agree design)."""
        from hexhamming_ray.functions.kernel import (
            hamming_distance_string,
            set_algo,
        )

        cases = [
            ("abcdef", "000001"),
            ("f" * 64, "0" * 64),
            ("DeadBEEF", "deadbeef"),
            ("", ""),
        ]
        results = {}
        for algo in ("extra", "native", "sse41", "classic"):
            err = set_algo(algo)
            if err != "":
                assert algo == "sse41"  # only sse41 lacks an engine analog
                continue
            results[algo] = [hamming_distance_string(a, b) for a, b in cases]
        assert len(results) >= 2
        vals = list(results.values())
        assert all(v == vals[0] for v in vals[1:])

    def test_set_algo_never_raises(self):
        from hexhamming_ray.functions.kernel import set_algo

        for name in ("", "EXTRA", "classic2", None):
            try:
                out = set_algo(name) if name is not None else set_algo("x")
            except Exception as e:  # pragma: no cover
                raise AssertionError(f"set_algo raised {e!r}")
            assert isinstance(out, str)


def test_non_ascii_strlen_semantics():
    """Reference operates on the UTF-8 C string: 'é' is 2 bytes, so
    ('é', 'ab') passes the length check and fails VALIDATION, while
    ('é', 'abc') is a length error (ADVICE round 1; python_hexhamming.cc
    parses with "s" -> UTF-8, length check at :104-107)."""
    import pytest

    from hexhamming_ray.functions.kernel import (
        check_hexstrings_within_dist,
        hamming_distance_string,
    )

    with pytest.raises(ValueError, match="invalid char"):
        hamming_distance_string("é", "ab")
    with pytest.raises(ValueError, match="NOT the same length"):
        hamming_distance_string("é", "abc")
    # byte-identity short-circuit still skips validation for non-ASCII
    assert check_hexstrings_within_dist("éé", "éé", 1) is True
