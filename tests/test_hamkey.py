"""Hamming-key ER family: pigeonhole band blocking must be EXACT
(recall 1.0, exactly-once emission) against a brute-force reference,
at any partitioning, on degenerate corpora, and under both label-remap
paths. Mirrors the reference predicate semantics
(``check_hexstrings_within_dist``, python_hexhamming.h:149-151) at
corpus scale."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hexhamming_ray.pipelines import hamkey as HK

SF_DIR = "/root/testdata/sf0.001"


def test_band_offsets_properties():
    for key_len, n_bands in [(32, 7), (32, 4), (30, 7), (7, 7), (8, 3)]:
        offs = HK._band_offsets(key_len, n_bands)
        widths = np.diff(offs)
        assert offs[0] == 0 and offs[-1] == key_len
        assert widths.min() >= 0 and widths.max() - widths.min() <= 1
        assert len(widths) == n_bands


def _brute_pairs(texts, key_len, max_dist):
    keys = [
        bytes(b for b in t.encode() if 0x20 <= b <= 0x7E)[
            :key_len
        ].ljust(key_len, b" ")
        for t in texts
    ]
    mat = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(
        len(keys), key_len
    )
    out = []
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            d = int((mat[i] != mat[j]).sum())
            if d <= max_dist:
                out.append((i, j, d))
    return pd.DataFrame(out, columns=["a_id", "b_id", "ham_dist"])


def _write_corpus(tmp_path, texts, name="hk"):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _planted_texts(seed=11, n_base=12, n_mut=70):
    """Base strings plus mutated copies at 0..10 byte substitutions —
    dense coverage of the keep/drop boundary at max_dist."""
    rng = random.Random(seed)
    alpha = "abcdefghij "
    bases = [
        "".join(rng.choice(alpha) for _ in range(40)) for _ in range(n_base)
    ]
    texts = list(bases)
    for _ in range(n_mut):
        b = list(rng.choice(bases))
        for _ in range(rng.randint(0, 10)):
            b[rng.randrange(32)] = rng.choice(alpha)
        texts.append("".join(b))
    return texts


def test_pairs_match_bruteforce_planted(ray_session, tmp_path):
    texts = _planted_texts()
    d = _write_corpus(tmp_path, texts)
    got = (
        HK.hamming_key_pairs(d, num_partitions=8)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = (
        _brute_pairs(texts, 32, 6)
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the planted boundary is exercised on BOTH sides
    all7 = _brute_pairs(texts, 32, 7)
    assert (want.ham_dist == 6).any()
    assert (all7.ham_dist == 7).any()
    assert len(all7) > len(want)
    # exactly-once emission even for identical keys
    assert not got.duplicated(["a_id", "b_id"]).any()


def test_pairs_partition_invariance(ray_session):
    def run(nparts):
        return (
            HK.hamming_key_pairs(SF_DIR, num_partitions=nparts)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    one = run(1)
    many = run(32)
    pd.testing.assert_frame_equal(one, many)
    assert len(one) > 0


def test_identical_keys_emitted_once(ray_session, tmp_path):
    texts = ["same prefix forty characters long here!! tail A",
             "same prefix forty characters long here!! tail B",
             "same prefix forty characters long here!! tail C",
             "completely different text that matches nothing"]
    d = _write_corpus(tmp_path, texts)
    got = HK.hamming_key_pairs(d).to_pandas()
    assert len(got) == 3  # C(3,2), each once
    assert (got.ham_dist == 0).all()
    assert not got.duplicated(["a_id", "b_id"]).any()


@pytest.mark.parametrize("n_docs", [0, 1, 3])
def test_tiny_corpora_vs_oracle(ray_session, tmp_path, n_docs):
    """Degenerate sizes incl. docs SHORTER than key_len (space padding
    must agree with DuckDB rpad) and the empty corpus."""
    texts = ["short", "short!",
             "a lönger döcument wéll past the key 中文"]
    d = _write_corpus(tmp_path, texts[:n_docs], name=f"tiny{n_docs}")
    entry = __import__("__ray_entry__")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for name in ["hamming_key_pairs", "hamming_key_clusters"]:
        got = entry.queries()[name](d).to_pandas()
        want = con.sql(entry.oracle_sql()[name]).df()
        assert len(got) == len(want), (name, len(got), len(want))
        if len(want):
            cols = sorted(got.columns)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            w = want[cols].sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(g, w, check_dtype=False)
    con.close()


def test_clusters_label_paths_agree(ray_session, tmp_path):
    texts = _planted_texts(seed=29, n_base=6, n_mut=40)
    d = _write_corpus(tmp_path, texts)

    def run():
        return (
            HK.hamming_key_clusters(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    broadcast = run()
    old = HK.HAMKEY_LABEL_BROADCAST_CAP
    try:
        HK.HAMKEY_LABEL_BROADCAST_CAP = -1  # force distributed remap
        remap = run()
    finally:
        HK.HAMKEY_LABEL_BROADCAST_CAP = old
    pd.testing.assert_frame_equal(broadcast, remap)
    assert broadcast.component.nunique() < len(broadcast)


def test_unicode_projection(ray_session, tmp_path):
    """Non-printable / non-ASCII codepoints vanish from the key on
    BOTH engines: a doc differing from its twin only by interleaved
    CJK/accents/newlines is Hamming-0 after projection."""
    base = "the quick brown fox jumps over the lazy dog"
    texts = [
        base,
        # base with unicode/control INSERTIONS only — the projection
        # is byte-identical to base, so the pair is Hamming-0
        "the 中quick brown\né fox jumps over\t the lazy dog",
        "a completely different document altogether here",
    ]
    d = _write_corpus(tmp_path, texts, name="uni")
    got = (
        HK.hamming_key_pairs(d)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = (
        _brute_pairs(texts, 32, 6)
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (0, 1, 0) in {tuple(r) for r in got.itertuples(index=False)}


def test_hamming_decontaminate_planted(ray_session, tmp_path):
    """Benchmark docs are doc_id % 50 == 0 (ids 0 and 50 here). Doc 1
    = bench 0 with 2 substitutions (kept), doc 2 = bench 0 with 8
    (dropped, > max_dist), doc 51 = bench 50 verbatim (kept, dist 0);
    fillers are seeded random 40-char strings (pairwise Hamming ~29).
    Orientation: doc_id is always the training side."""
    rng = random.Random(99)
    alpha = "abcdefghij "
    fill = lambda: "".join(rng.choice(alpha) for _ in range(40))  # noqa: E731
    A, B = fill(), fill()
    texts = []
    for i in range(55):
        texts.append(fill())
    texts[0] = A
    texts[50] = B
    a1 = list(A)
    a1[3], a1[17] = "z", "z"
    texts[1] = "".join(a1)
    a2 = list(A)
    for p in (1, 4, 9, 13, 20, 25, 28, 30):
        a2[p] = "z"
    texts[2] = "".join(a2)
    texts[51] = B
    d = _write_corpus(tmp_path, texts, name="dec")
    dec = (
        HK.hamming_decontaminate(d)
        .to_pandas()
        .sort_values(["doc_id", "bench_id"])
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in dec.itertuples(index=False)] == [
        (1, 0, 2), (51, 50, 0)
    ]
    # cross-filtered pair set must agree with the unfiltered pairs
    pairs = HK.hamming_key_pairs(d).to_pandas()
    cross = pairs[(pairs.a_id % 50 == 0) != (pairs.b_id % 50 == 0)]
    assert len(cross) == len(dec)
    assert (dec.bench_id % 50 == 0).all()
    assert (dec.doc_id % 50 != 0).all()


def test_er_hamming_eval_consistency(ray_session):
    """The report's pairs_pred must equal the blocker's own pair
    count, and both ppm ratios must be exact integer arithmetic on
    the three counts."""
    rep = HK.er_hamming_eval(SF_DIR).to_pandas().iloc[0]
    n_pairs = HK.hamming_key_pairs(SF_DIR).count()
    assert rep.pairs_pred == n_pairs
    assert 0 <= rep.pairs_both <= min(rep.pairs_pred, rep.pairs_truth)
    if rep.pairs_pred:
        assert rep.precision_ppm == 1_000_000 * rep.pairs_both // rep.pairs_pred
    if rep.pairs_truth:
        assert rep.recall_ppm == 1_000_000 * rep.pairs_both // rep.pairs_truth


def test_band_value_overflow_guard():
    with pytest.raises(ValueError):
        HK.hamming_key_pairs(SF_DIR, key_len=64, max_dist=1)
