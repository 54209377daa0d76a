"""Text-analysis scalar/batch functions for the documents pipelines:
token counting, quality features, heuristic language ID, document
fingerprinting. All batch-level (pyarrow.compute / numpy) — no per-row
Python in hot paths except where a C-backed per-row call is unavoidable
(hashlib digests)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"

# tiny deterministic stopword lists for the n-gram/marker heuristic
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with"),
    "es": ("el", "la", "de", "que", "los", "con"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "de": ("der", "die", "das", "und", "ist", "mit"),
}


def token_count(text_col) -> pa.Array:
    """Number of whitespace-separated tokens (matches of \\S+)."""
    return pc.count_substring_regex(text_col, TOKEN_RE).cast(pa.int64())


def quality_features(text_col) -> dict[str, pa.Array]:
    """Integer quality-signal columns (integers only: exactly
    reproducible in the DuckDB oracle, no float hashing hazards)."""
    n_chars = pc.utf8_length(text_col).cast(pa.int64())
    n_tokens = token_count(text_col)
    n_upper = pc.count_substring_regex(text_col, r"[A-Z]").cast(pa.int64())
    n_digits = pc.count_substring_regex(text_col, r"[0-9]").cast(pa.int64())
    n_punct = pc.count_substring_regex(text_col, r"[^\w\s]").cast(pa.int64())
    quality_ok = pc.and_(
        pc.greater_equal(n_tokens, 5),
        pc.less_equal(pc.multiply(n_punct, 5), pc.add(n_chars, 1)),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_upper": n_upper,
        "n_digits": n_digits,
        "n_punct": n_punct,
        "quality_ok": quality_ok,
    }


def langid_batch(text_col) -> pa.Array:
    """Heuristic language ID: CJK-codepoint ratio first, then marker-word
    counts per language; deterministic tie-break by language name.
    Returns a string array of predicted codes ('und' when no signal)."""
    cjk = pc.count_substring_regex(text_col, r"[一-鿿]").cast(pa.int64())
    n_chars = pc.utf8_length(text_col).cast(pa.int64())
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        scores[lang] = pc.count_substring_regex(
            pc.utf8_lower(text_col), pat
        ).cast(pa.int64())
    n = len(text_col)
    cjk_np = cjk.to_numpy(zero_copy_only=False)
    nch = n_chars.to_numpy(zero_copy_only=False)
    langs = sorted(scores)
    mat = np.stack([scores[l].to_numpy(zero_copy_only=False) for l in langs])
    best = np.argmax(mat, axis=0)  # first max wins -> sorted-name tie-break
    best_score = mat[best, np.arange(n)]
    out = np.array(langs, dtype=object)[best]
    out[best_score == 0] = "und"
    out[(cjk_np * 10) > np.maximum(nch, 1)] = "zh"
    return pa.array(out.tolist(), type=pa.string())


def md5_prefix_batch(texts: list[str], prefix: int = 16) -> list[str]:
    """First ``prefix`` hex chars of md5 — the SQL-oracle-friendly
    document fingerprint (DuckDB: substr(md5(text), 1, prefix))."""
    return [hashlib.md5(t.encode()).hexdigest()[:prefix] for t in texts]


def rolling_fingerprint_batch(texts: list[str]) -> np.ndarray:
    """64-bit rolling polynomial content fingerprint per document
    (Karp-Rabin style, base 257 mod 2^64) — the 'document
    fingerprinting' primitive for shift-tolerant chunk signatures."""
    out = np.zeros(len(texts), dtype=np.uint64)
    base = np.uint64(257)
    offset = np.uint64(1469598103934665603)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
            m = b.shape[0]
            if m == 0:
                out[i] = offset
                continue
            # acc = offset*base^m + sum b[k]*base^(m-1-k), all mod 2^64,
            # evaluated with a vectorized cumulative power table
            powers = np.ones(m + 1, dtype=np.uint64)
            np.cumprod(np.full(m, base, dtype=np.uint64), out=powers[1:])
            out[i] = offset * powers[m] + np.sum(b * powers[m - 1 :: -1])
    return out
