"""token_cosine_pairs: the distinct-token binary cosine/Dice scan must
match a local set-arithmetic reference on planted corpora that exercise
the keep/drop threshold boundary and the DF cap, be partition-invariant,
and produce identical results on both finalize plans."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hexhamming_ray.pipelines import text as T

SF_DIR = "/root/testdata/sf0.001"


def _write_corpus(tmp_path, texts, name="tc"):
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


def _local_ref(texts, max_df, min_x1000):
    sets = [set(t.split()) for t in texts]
    df = {}
    for s in sets:
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    sets = [{t for t in s if df[t] <= max_df} for s in sets]
    rows = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            c = len(sets[i] & sets[j])
            if c == 0:
                continue
            na, nb = len(sets[i]), len(sets[j])
            cos = math.floor(1000.0 * c / math.sqrt(na * nb))
            dice = math.floor(2000.0 * c / (na + nb))
            if cos >= min_x1000:
                rows.append((i, j, c, cos, dice))
    return pd.DataFrame(
        rows,
        columns=["id_lo", "id_hi", "inter", "cosine_x1000",
                 "dice_x1000"],
    )


PLANTED = [
    "apple banana cherry date elderberry",      # 0
    "apple banana cherry date fig",             # 1: cos vs 0 = 4/5
    "apple banana grape kiwi lemon",            # 2: cos vs 0 = 2/5
    "apple banana cherry date elderberry",      # 3: dup of 0 -> 1000
    "mango nectarine orange papaya",            # 4: disjoint
    "mango nectarine orange papaya quince",     # 5: cos vs 4 ~ 0.894
    "stop stop stop word word",                 # 6: all high-df? no
    "stop word unique1",                        # 7
    "stop word unique2",                        # 8
]


@pytest.mark.parametrize("min_x1000", [0, 600, 800, 1000])
def test_planted_thresholds(ray_session, tmp_path, min_x1000):
    d = _write_corpus(tmp_path, PLANTED, name=f"t{min_x1000}")
    got = (
        T.token_cosine_pairs(d, min_x1000=min_x1000)
        .to_pandas()
        .sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    want = (
        _local_ref(PLANTED, 64, min_x1000)
        .sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    if min_x1000 == 0:
        assert len(want) > 5  # the planted grid is non-trivial
    if min_x1000 == 1000:
        # only the exact-duplicate set survives
        assert (want.cosine_x1000 == 1000).all()
        assert len(want) >= 1


def test_df_cap_drops_stopwords(ray_session, tmp_path):
    """With max_df=2 the 'stop'/'word' tokens (df=3) vanish: docs 7/8
    no longer pair through them, and doc 6 (only capped tokens) drops
    out of every pair."""
    d = _write_corpus(tmp_path, PLANTED, name="cap")
    got = (
        T.token_cosine_pairs(d, min_x1000=0, max_df=2)
        .to_pandas()
        .sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    want = (
        _local_ref(PLANTED, 2, 0)
        .sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not ((got.id_lo == 7) & (got.id_hi == 8)).any()
    assert not (got.id_lo == 6).any() and not (got.id_hi == 6).any()


def test_partition_invariance(ray_session):
    def run(nparts):
        return (
            T.token_cosine_pairs(SF_DIR, num_partitions=nparts)
            .to_pandas()
            .sort_values(["id_lo", "id_hi"])
            .reset_index(drop=True)
        )

    one = run(1)
    many = run(32)
    pd.testing.assert_frame_equal(one, many)
    assert len(one) > 0


def test_finalize_paths_agree(ray_session):
    """Forced join fallback (cap -1) must equal the broadcast plan."""

    def run():
        return (
            T.token_cosine_pairs(SF_DIR)
            .to_pandas()
            .sort_values(["id_lo", "id_hi"])
            .reset_index(drop=True)
        )

    broadcast = run()
    old = T.BROADCAST_PAIR_CAP
    try:
        T.BROADCAST_PAIR_CAP = -1
        joined = run()
    finally:
        T.BROADCAST_PAIR_CAP = old
    pd.testing.assert_frame_equal(broadcast, joined)
    assert len(broadcast) > 0


def test_empty_and_tiny(ray_session, tmp_path):
    for n, name in [(0, "e0"), (1, "e1")]:
        d = _write_corpus(tmp_path, PLANTED[:n], name=name)
        got = T.token_cosine_pairs(d).to_pandas()
        assert len(got) == 0
        assert sorted(got.columns) == sorted(
            ["id_lo", "id_hi", "inter", "cosine_x1000", "dice_x1000"]
        )
