"""Conformance and structure tests for the fuzzy-ER family:
functions/strsim.py kernels pinned bit-exact against DuckDB's
levenshtein / jaro_winkler_similarity, and the sorted-neighborhood
machinery's partition- and path-invariance."""

import os
import random
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hexhamming_ray.functions.strsim import (  # noqa: E402
    charset_jaccard_batch,
    damerau_levenshtein_batch,
    jaro_batch,
    jaro_winkler_batch,
    levenshtein_batch,
    pad_matrix,
)

SF_DIR = "/root/testdata/sf0.001"

EDGE_CASES = [
    ("", ""),
    ("a", ""),
    ("", "a"),
    ("abc", "abc"),
    ("kitten", "sitting"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("duane", "dwayne"),
    # Winkler boost boundary: jaro == 0.6 < 0.7 -> NO boost (DuckDB)
    ("abcdxxxxxx", "abcdyyyyyy"),
    # heavy transpositions
    ("abcdef", "badcfe"),
    ("aaaa", "aaaa"),
    ("ab", "ba"),
]


def _rand_cases(n, seed=11, alphabet="abcdefgh XYZ#123", max_len=14):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, max_len), rng.randint(0, max_len)
        out.append(
            (
                "".join(rng.choice(alphabet) for _ in range(la)),
                "".join(rng.choice(alphabet) for _ in range(lb)),
            )
        )
    return out


def _duck_ref(cases):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, x, y) for i, (x, y) in enumerate(cases)],
    )
    ref = con.sql(
        "SELECT levenshtein(a, b), jaro_winkler_similarity(a, b), "
        "damerau_levenshtein(a, b), jaro_similarity(a, b), "
        # DuckDB jaccard RAISES on '' input — sentinel those (the
        # engine kernel returns 0.0 and callers mask them out)
        "CASE WHEN a = '' OR b = '' THEN -1.0 ELSE jaccard(a, b) END "
        "FROM t ORDER BY i"
    ).fetchall()
    con.close()
    return ref


def _kernels(cases):
    a = pa.array([c[0] for c in cases])
    b = pa.array([c[1] for c in cases])
    amat, alen = pad_matrix(a)
    bmat, blen = pad_matrix(b)
    cj = charset_jaccard_batch(amat, alen, bmat, blen)
    cj = np.where((alen == 0) | (blen == 0), -1.0, cj)
    return (
        levenshtein_batch(amat, alen, bmat, blen),
        jaro_winkler_batch(amat, alen, bmat, blen),
        damerau_levenshtein_batch(amat, alen, bmat, blen),
        jaro_batch(amat, alen, bmat, blen),
        cj,
    )


def test_kernels_bit_exact_vs_duckdb():
    """4k random + edge cases: Levenshtein equal as ints, Jaro-Winkler
    equal as exact doubles (same formula, same op order)."""
    cases = EDGE_CASES + _rand_cases(4000)
    lev, jw, dl, jr, cj = _kernels(cases)
    ref = _duck_ref(cases)
    for i, (rl, rj, rd, rjr, rc) in enumerate(ref):
        assert int(lev[i]) == rl, (cases[i], int(lev[i]), rl)
        assert float(jw[i]) == rj, (cases[i], float(jw[i]), rj)
        assert int(dl[i]) == rd, (cases[i], int(dl[i]), rd)
        assert float(jr[i]) == rjr, (cases[i], float(jr[i]), rjr)
        assert float(cj[i]) == rc, (cases[i], float(cj[i]), rc)


def test_kernels_low_alphabet_sweep():
    """2-letter alphabet maximizes matches/transposition collisions —
    the hard corner of the greedy Jaro matcher."""
    cases = _rand_cases(2000, seed=23, alphabet="ab", max_len=10)
    lev, jw, dl, jr, cj = _kernels(cases)
    ref = _duck_ref(cases)
    for i, (rl, rj, rd, rjr, rc) in enumerate(ref):
        assert int(lev[i]) == rl
        assert float(jw[i]) == rj
        assert int(dl[i]) == rd, (cases[i], int(dl[i]), rd)
        assert float(jr[i]) == rjr
        assert float(cj[i]) == rc


def test_levenshtein_symmetry_and_bounds():
    cases = _rand_cases(500, seed=5)
    lev_ab, _, dl_ab, _, cj_ab = _kernels(cases)
    lev_ba, _, dl_ba, _, cj_ba = _kernels([(b, a) for a, b in cases])
    assert (lev_ab == lev_ba).all()
    assert (dl_ab == dl_ba).all()
    assert (cj_ab == cj_ba).all()
    la = np.array([len(a) for a, _ in cases])
    lb = np.array([len(b) for _, b in cases])
    assert (lev_ab >= np.abs(la - lb)).all()
    assert (lev_ab <= np.maximum(la, lb)).all()
    # Damerau never exceeds Levenshtein (extra op available), and a
    # transposition saves at most half the substitutions
    assert (dl_ab <= lev_ab).all()
    assert (dl_ab * 2 >= lev_ab).all()


def test_pad_matrix_width_clips():
    mat, lens = pad_matrix(pa.array(["abcdef", "x", ""]), width=3)
    assert mat.shape == (3, 3)
    assert bytes(mat[0]) == b"abc"
    assert list(lens) == [3, 1, 0]


def test_sorted_neighborhood_partition_invariance(ray_session):
    """The overlap-replication pair emission must be identical at any
    partitioning: span=very small (many group boundaries) vs one
    group. Pins the grp-equality / native-row dedup logic."""
    from hexhamming_ray.pipelines.strmatch import (
        _sn_scored_pairs,
    )

    def run(nparts):
        return (
            _sn_scored_pairs(SF_DIR, 24, 4, None, num_partitions=nparts)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    one = run(1)
    many = run(64)  # span ~8 at 500 docs: boundaries every 8 ranks
    pd.testing.assert_frame_equal(one, many)
    assert len(one) > 0


def test_er_fuzzy_clusters_label_paths_agree(ray_session):
    """er_fuzzy_clusters uses the shared size-switched label_nodes:
    the broadcast lookup (default at test scale) and the distributed
    sorted-run remap must produce IDENTICAL clusters."""
    from hexhamming_ray.pipelines import strmatch as SM
    from hexhamming_ray.stages import annsearch as A

    def run():
        return (
            SM.er_fuzzy_clusters(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    broadcast = run()
    old = A.GRAPH_LABEL_BROADCAST_CAP
    try:
        A.GRAPH_LABEL_BROADCAST_CAP = -1  # force the distributed remap
        remap = run()
    finally:
        A.GRAPH_LABEL_BROADCAST_CAP = old
    pd.testing.assert_frame_equal(broadcast, remap)
    assert broadcast.cluster_id.nunique() < len(broadcast)  # real merges


def test_consensus_vote_lattice(ray_session):
    """votes>=3 ⊆ votes>=2 ⊆ votes>=1, and the 3-vote set equals the
    intersection of the three single-scorer matchers at the same
    thresholds (the ensemble cannot invent or lose a unanimous
    pair)."""
    from hexhamming_ray.pipelines import strmatch as SM

    def pairs(ds, cols=("a_id", "b_id")):
        df = ds.to_pandas()
        return set(zip(df[cols[0]], df[cols[1]]))

    v1 = pairs(SM.fuzzy_match_consensus(SF_DIR, min_votes=1))
    v2 = pairs(SM.fuzzy_match_consensus(SF_DIR, min_votes=2))
    v3 = pairs(SM.fuzzy_match_consensus(SF_DIR, min_votes=3))
    assert v3 <= v2 <= v1
    lev = pairs(SM.fuzzy_match_levenshtein(SF_DIR))
    jw = pairs(SM.fuzzy_match_jw(SF_DIR))
    cj = pairs(SM.fuzzy_match_charjac(SF_DIR))
    assert v3 == (lev & jw & cj)
    assert len(v2) > 0


@pytest.mark.parametrize("n_docs", [0, 1, 3])
def test_strmatch_tiny_corpora(ray_session, tmp_path, n_docs):
    """Degenerate corpus sizes: fewer docs than the window (and the
    empty corpus) must produce the oracle's result, not crash on
    empty exchanges or all-empty rank buckets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["alpha doc one", "alpha doc two", "zeta doc"][:n_docs]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(["s"] * n_docs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / f"tiny{n_docs}"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    entry = __import__("__ray_entry__")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for name in ["sorted_neighborhood_pairs", "fuzzy_match_jw",
                 "fuzzy_match_multikey", "fuzzy_match_token_sort",
                 "er_fuzzy_clusters", "fuzzy_dedup_survivors",
                 "fuzzy_match_consensus", "fuzzy_match_jaro"]:
        got = entry.queries()[name](str(d)).to_pandas()
        want = con.sql(entry.oracle_sql()[name]).df()
        assert len(got) == len(want), (name, len(got), len(want))
        if len(want):
            g = got[sorted(got.columns)].sort_values(
                list(sorted(got.columns))).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(
                list(sorted(want.columns))).reset_index(drop=True)
            pd.testing.assert_frame_equal(g, w, check_dtype=False)
    con.close()


def test_sn_refinement_paths_agree(ray_session):
    """Skew refinement: forcing EVERY bucket hot (factor 0) and NO
    bucket hot (huge factor) must produce identical pairs — ranks are
    exact under any unit decomposition."""
    from hexhamming_ray.pipelines import strmatch as SM

    def run():
        return (
            SM.sorted_neighborhood_pairs(SF_DIR)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    old = SM._REFINE_FACTOR
    try:
        SM._REFINE_FACTOR = 10 ** 9  # never refine
        unrefined = run()
        SM._REFINE_FACTOR = 0  # refine everything
        refined = run()
    finally:
        SM._REFINE_FACTOR = old
    pd.testing.assert_frame_equal(unrefined, refined)
    assert len(unrefined) > 0


def test_sn_skewed_prefix_corpus(ray_session, tmp_path):
    """A corpus where EVERY key shares the same 2-char prefix lands in
    ONE top-12-bit bucket; the refinement must still produce the
    oracle's pairs (and spread the rank work)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    texts = [
        "Th" + "".join(chr(97 + c) for c in rng.integers(0, 26, 30))
        for _ in range(400)
    ]
    texts += [texts[7], texts[7] + " tail", texts[21][:20]]  # near keys
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
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    entry = __import__("__ray_entry__")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for name in ["sorted_neighborhood_pairs", "fuzzy_match_jw"]:
        got = entry.queries()[name](str(d)).to_pandas()
        want = con.sql(entry.oracle_sql()[name]).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
        assert len(g) > 0
    con.close()


def test_sn_checkpoint_resume(ray_session, tmp_path):
    """checkpoint_dir: a re-run resumes the narrow key table from
    Parquet (manifest marks the stage complete) and produces the
    identical pair set."""
    import json
    import os

    from hexhamming_ray.pipelines import strmatch as SM

    ck = str(tmp_path / "sn_ck")

    def run():
        return (
            SM.fuzzy_match_jw(SF_DIR, checkpoint_dir=ck)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    first = run()
    manifest = json.load(open(os.path.join(ck, "manifest.json")))
    assert manifest["sn_keys_prefix_24"]["complete"]
    resumed = run()  # second run re-reads the checkpointed stage
    pd.testing.assert_frame_equal(first, resumed)
    assert len(first) > 0


def test_token_sort_keys_sliced_input():
    """_token_sort_keys must be slice-safe: a sliced text array (and
    the sliced ListArray split_pattern_regex yields) produces the same
    keys as the equivalent unsliced array."""
    from hexhamming_ray.pipelines.strmatch import _token_sort_keys

    texts = ["zz top aa", "  ", "gamma beta alpha", "one", "b a c b"]
    big = pa.array(["IGNORED lead row"] + texts)
    sliced = big.slice(1)
    fresh = pa.array(texts)
    assert _token_sort_keys(sliced, 24).to_pylist() == \
        _token_sort_keys(fresh, 24).to_pylist()
    assert _token_sort_keys(fresh, 24).to_pylist() == [
        "aa top zz", "", "alpha beta gamma", "one", "a b b c"]


def test_hypothesis_strsim_vs_duckdb():
    """Property fuzz: arbitrary printable-ASCII + Latin-1 + CJK
    strings, kernels bit-exact vs DuckDB (shrinks to a minimal
    counterexample on failure)."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    alphabet = st.sampled_from(
        list("abcXYZ 019#.-") + ["é", "ß", "中", "文"]
    )
    con = duckdb.connect()

    @given(
        st.text(alphabet=alphabet, max_size=16),
        st.text(alphabet=alphabet, max_size=16),
    )
    @settings(max_examples=250, deadline=None)
    def inner(a, b):
        lev, jw, dl, jr, cj = _kernels([(a, b)])
        rl, rj, rd, rjr, rc = con.execute(
            "SELECT levenshtein(?, ?), jaro_winkler_similarity(?, ?), "
            "damerau_levenshtein(?, ?), jaro_similarity(?, ?), "
            "CASE WHEN ? = '' OR ? = '' THEN -1.0 ELSE jaccard(?, ?) END",
            [a, b, a, b, a, b, a, b, a, b, a, b],
        ).fetchone()
        assert int(lev[0]) == rl, (a, b)
        assert float(jw[0]) == rj, (a, b)
        assert int(dl[0]) == rd, (a, b)
        assert float(jr[0]) == rjr, (a, b)
        assert float(cj[0]) == rc, (a, b)

    inner()
    con.close()


def test_qgram_blocking_partition_invariance(ray_session):
    """q-gram pair counts must be identical at any partition count
    (both keyed exchanges reorganize, never change, the pair set)."""
    from hexhamming_ray.pipelines.strmatch import _qgram_pair_counts

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a = canon(_qgram_pair_counts(SF_DIR, 20, 24, 8, num_partitions=1))
    b = canon(_qgram_pair_counts(SF_DIR, 20, 24, 8, num_partitions=7))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_meta_blocking_wep_checkpoint_resume(ray_session, tmp_path):
    """WEP's double-consumed edge table resumes from Parquet: the
    manifest marks the stage complete and the re-run's survivor set is
    identical."""
    import json

    from hexhamming_ray.pipelines import strmatch as SM

    ck = str(tmp_path / "wep_ck")

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    first = canon(SM.meta_blocking_wep(SF_DIR, checkpoint_dir=ck))
    man = json.load(open(f"{ck}/manifest.json"))
    stage = next(iter(man))
    assert man[stage]["complete"]
    again = canon(SM.meta_blocking_wep(SF_DIR, checkpoint_dir=ck))
    pd.testing.assert_frame_equal(first, again)
    assert len(first) > 0


def test_wep_prunes_strictly_above_mean(ray_session):
    """WEP semantics on the raw graph: survivors are exactly the edges
    with weight strictly above the unpruned graph's mean weight."""
    from hexhamming_ray.pipelines.strmatch import (
        _qgram_pair_counts,
        meta_blocking_wep,
    )

    raw = _qgram_pair_counts(SF_DIR, 20, 24, 8).to_pandas()
    mu = raw["n_common"].mean()
    want = raw[raw["n_common"] > mu]
    got = meta_blocking_wep(SF_DIR).to_pandas()
    key = ["a_id", "b_id", "n_common"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_cnp_retention_properties(ray_session):
    """CNP survivors are a subset of the raw graph, and every raw edge
    in the top-k of either endpoint survives (redundancy-positive
    semantics, recomputed in pandas from the raw graph)."""
    from hexhamming_ray.pipelines.strmatch import (
        _qgram_pair_counts,
        cnp_blocking_pairs,
    )

    raw = _qgram_pair_counts(SF_DIR, 20, 24, 8).to_pandas()
    got = cnp_blocking_pairs(SF_DIR).to_pandas()
    d = pd.concat([
        raw.rename(columns={"a_id": "node", "b_id": "other"}),
        raw.rename(columns={"b_id": "node", "a_id": "other"}),
    ])
    d = d.sort_values(["node", "n_common", "other"],
                      ascending=[True, False, True])
    d["rk"] = d.groupby("node").cumcount()
    top = d[d.rk < 2]
    want = set(zip(np.minimum(top.node, top.other),
                   np.maximum(top.node, top.other)))
    have = set(zip(got.a_id, got.b_id))
    assert have == want
    assert have <= set(zip(raw.a_id, raw.b_id))
    assert len(got) > 0


def test_golden_record_agrees_with_survivor_pick(ray_session):
    """golden_record's rep_doc_id must equal fuzzy_dedup_survivors'
    per-cluster pick (same longest-member rule), and total/member
    counts must reconcile with the raw cluster labels."""
    from hexhamming_ray.pipelines import strmatch as SM

    golden = SM.golden_record_docs(SF_DIR).to_pandas()
    surv = SM.fuzzy_dedup_survivors(SF_DIR).to_pandas()
    m = golden.merge(surv, on="cluster_id", how="outer",
                     indicator=True)
    assert (m._merge == "both").all()
    assert (m.rep_doc_id == m.doc_id).all()
    labels = SM.er_fuzzy_clusters(SF_DIR).to_pandas()
    sizes = labels.groupby("cluster_id").size()
    g = golden.set_index("cluster_id").sort_index()
    assert g.index.equals(sizes.sort_index().index)
    assert (g.n_members.to_numpy()
            == sizes.sort_index().to_numpy()).all()
    assert g.n_members.sum() == len(labels)
