"""Cluster-level ER evaluation + match-decision operators: property
tests and forced-fallback plan-equality pins (the oracle value check
runs in test_queries_oracle via the shared parametrization)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_fs_attr_paths_agree(ray_session):
    """fs_match_scores' attr plans (broadcast sorted lut vs two native
    hash joins) must emit IDENTICAL scored pairs."""
    from hexhamming_ray.pipelines import ermetrics as EM

    def run(force_join):
        return (
            EM.fs_match_scores(SF_DIR, force_join=force_join)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    broadcast = run(False)
    joined = run(True)
    pd.testing.assert_frame_equal(broadcast, joined)
    assert len(broadcast) > 0
    assert set(broadcast.decision) <= {"match", "possible", "nonmatch"}
    # the corpus plants real near-dups: some pairs must clear the
    # match band, and the clerical band must be non-degenerate
    assert (broadcast.decision == "match").any()


def test_mutual_best_match_properties(ray_session):
    """Reciprocal best match: (1) one-to-one — no id appears in two
    output pairs; (2) equals a driver-side reference computed from the
    full scored candidate set."""
    from hexhamming_ray.pipelines import ermetrics as EM
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw

    got = (
        EM.mutual_best_match(SF_DIR)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    ids = np.concatenate([got.a_id.to_numpy(), got.b_id.to_numpy()])
    assert np.unique(ids).shape[0] == ids.shape[0]

    cand = fuzzy_match_jw(SF_DIR).to_pandas()
    sym = pd.DataFrame(
        {
            "id": np.concatenate([cand.a_id, cand.b_id]),
            "partner": np.concatenate([cand.b_id, cand.a_id]),
            "jw_sim": np.concatenate([cand.jw_sim, cand.jw_sim]),
        }
    )
    sym = sym.sort_values(
        ["id", "jw_sim", "partner"], ascending=[True, False, True]
    )
    best = sym.groupby("id").first().reset_index()
    bmap = dict(zip(best.id, best.partner))
    ref = sorted(
        (i, p)
        for i, p in bmap.items()
        if i < p and bmap.get(p) == i
    )
    assert list(zip(got.a_id, got.b_id)) == ref
    assert len(ref) > 0


def test_triangles_vs_reference(ray_session):
    """Triangle census equals a brute-force set-intersection count
    over the same edge list."""
    from hexhamming_ray.pipelines import ermetrics as EM
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw

    got = EM.match_graph_triangles(SF_DIR).to_pandas().iloc[0]

    cand = fuzzy_match_jw(SF_DIR, min_sim=0.80).to_pandas()
    edges = set(
        (min(a, b), max(a, b)) for a, b in zip(cand.a_id, cand.b_id)
    )
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(
        len(n) * (len(n) - 1) // 2 for n in adj.values()
    )
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b
    )
    assert int(got.n_edges) == len(edges)
    assert int(got.n_wedges) == wedges
    assert int(got.n_triangles) == tri
    assert tri > 0  # the planted near-dup clusters close triangles
    expect_ppm = 1_000_000 * 3 * tri // wedges if wedges else 0
    assert int(got.clustering_ppm) == expect_ppm


def _bcubed_ref(pcid, tcid):
    """Driver-side integer B-cubed reference (dict counting)."""
    from collections import Counter

    cells = Counter(zip(pcid, tcid))
    psz = Counter(pcid)
    tsz = Counter(tcid)
    sp = sum(
        c * ((1_000_000 * c) // psz[p]) for (p, _), c in cells.items()
    )
    sr = sum(
        c * ((1_000_000 * c) // tsz[t]) for (_, t), c in cells.items()
    )
    return sp, sr


@pytest.mark.parametrize("seed", [0, 1])
def test_cell_stats_vs_reference(ray_session, seed):
    """_cell_stats partials reduce to the exact dict-counting B-cubed
    sums and pair counts on random joint labelings."""
    import pyarrow as pa
    import ray

    from hexhamming_ray.pipelines import ermetrics as EM

    rng = np.random.default_rng(seed)
    n = 5_000
    pcid = rng.integers(0, 40, n)
    tcid = rng.integers(0, 25, n)
    j = ray.data.from_arrow(
        pa.table(
            {
                "pcid": pa.array(pcid, pa.int64()),
                "tcid": pa.array(tcid, pa.int64()),
            }
        )
    ).repartition(8)
    sp_got, pk_got, pc_got, n_got = EM._stat_sums(
        EM._cell_stats(j, "pcid", "tcid", 8)
    )
    sp_ref, sr_ref = _bcubed_ref(pcid, tcid)
    assert (sp_got, n_got) == (sp_ref, n)
    from collections import Counter

    psz = Counter(pcid)
    cells = Counter(zip(pcid, tcid))
    assert pk_got == sum(v * (v - 1) // 2 for v in psz.values())
    assert pc_got == sum(v * (v - 1) // 2 for v in cells.values())
    # recall side via the transposed call
    sr_got, _, _, _ = EM._stat_sums(
        EM._cell_stats(j, "tcid", "pcid", 8)
    )
    assert sr_got == sr_ref


def test_bcubed_identity_is_perfect(ray_session):
    """B-cubed of a labeling against ITSELF is exactly 1.0 (ppm 1e6):
    run the stats machinery on pcid == tcid."""
    import pyarrow as pa
    import ray

    from hexhamming_ray.pipelines import ermetrics as EM

    rng = np.random.default_rng(7)
    lab = rng.integers(0, 30, 2_000)
    j = ray.data.from_arrow(
        pa.table(
            {
                "pcid": pa.array(lab, pa.int64()),
                "tcid": pa.array(lab, pa.int64()),
            }
        )
    ).repartition(4)
    sp, _, _, n = EM._stat_sums(EM._cell_stats(j, "pcid", "tcid", 4))
    # every record's cell == its cluster, so each contributes ppm(1)
    assert sp == 1_000_000 * n


def test_rand_index_consistency(ray_session):
    """pairs_same_both <= min(pred, truth) same-pairs, and the index
    recomputes from the emitted counts."""
    from hexhamming_ray.pipelines import ermetrics as EM

    row = EM.er_rand_index(SF_DIR).to_pandas().iloc[0]
    n11 = int(row.pairs_same_both)
    sp = int(row.pairs_same_pred)
    st = int(row.pairs_same_truth)
    total = int(row.pairs_total)
    assert n11 <= min(sp, st)
    n00 = total - sp - st + n11
    assert int(row.rand_index_ppm) == 1_000_000 * (n11 + n00) // total


def test_containment_catches_excerpt(ray_session, tmp_path):
    """A short doc fully contained in a long one: containment = 1.0
    (kept) while Jaccard is far below 0.5 (dropped) — the asymmetric
    measure detects the excerpt relation the symmetric one misses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines.text import (
        ngram_containment_pairs,
        ngram_jaccard_exact,
    )

    toks = [f"tok{i:03d}" for i in range(100)]
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [" ".join(toks), " ".join(toks[:20])], pa.string()
            ),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["a", "a"], pa.string()),
            "n_chars": pa.array(
                [len(" ".join(toks)), len(" ".join(toks[:20]))],
                pa.int64(),
            ),
        }
    )
    d = tmp_path / "excerpt"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    cont = ngram_containment_pairs(str(d)).to_pandas()
    jac = ngram_jaccard_exact(str(d)).to_pandas()
    assert len(jac) == 0  # jaccard 18/98 < 0.5
    assert len(cont) == 1
    assert (int(cont.id_lo[0]), int(cont.id_hi[0])) == (1, 2)
    assert int(cont.containment_x1000[0]) == 1000


def test_threshold_sweep_consistency(ray_session):
    """Sweep counts are monotone in the threshold, and the 880 row
    reproduces er_fuzzy_eval's pair counts (same matcher, same truth
    set, one scoring pass)."""
    from hexhamming_ray.pipelines import ermetrics as EM
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_eval

    sweep = EM.er_threshold_sweep(SF_DIR).to_pandas()
    assert list(sweep.threshold_x1000) == [850, 880, 900, 920, 950]
    assert (sweep.pairs_pred.diff()[1:] <= 0).all()
    assert (sweep.pairs_both.diff()[1:] <= 0).all()
    assert (sweep.pairs_both <= sweep.pairs_pred).all()
    assert (sweep.pairs_both <= sweep.pairs_truth).all()
    ref = er_fuzzy_eval(SF_DIR).to_pandas().iloc[0]
    row = sweep[sweep.threshold_x1000 == 880].iloc[0]
    assert int(row.pairs_pred) == int(ref.pairs_pred)
    assert int(row.pairs_truth) == int(ref.pairs_truth)
    assert int(row.pairs_both) == int(ref.pairs_both)


def test_dedup_rate_consistency(ray_session):
    """Report identities hold and cluster count equals the label
    table's distinct-label count."""
    from hexhamming_ray.pipelines import ermetrics as EM
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_clusters

    row = EM.dedup_rate_report(SF_DIR).to_pandas().iloc[0]
    assert int(row.n_docs) == int(row.n_clusters) + int(row.n_dup_docs)
    assert int(row.total_chars) == (
        int(row.survivor_chars) + int(row.saved_chars)
    )
    labels = er_fuzzy_clusters(SF_DIR).to_pandas()
    assert int(row.n_docs) == len(labels)
    assert int(row.n_clusters) == labels.cluster_id.nunique()


def test_weighted_jaccard_sees_repetition(ray_session, tmp_path):
    """Multiset Jaccard separates docs that set semantics cannot:
    identical vocabulary, different term frequencies."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines.text import weighted_jaccard_pairs

    t1 = "alpha beta gamma"
    t2 = "alpha beta gamma " + "alpha " * 9  # tf(alpha)=10 vs 1
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([t1, t2, t1], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["a"] * 3, pa.string()),
            "n_chars": pa.array(
                [len(t1), len(t2), len(t1)], pa.int64()
            ),
        }
    )
    d = tmp_path / "wjac"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    got = weighted_jaccard_pairs(str(d), threshold=0.0).to_pandas()
    got = got.set_index(["id_lo", "id_hi"])
    # identical docs: wj == 1.0
    assert int(got.loc[(1, 3)].wjaccard_x1000) == 1000
    # same vocabulary, repeated term: sum min = 3, sum max = 12
    assert int(got.loc[(1, 2)].inter_min) == 3
    assert int(got.loc[(1, 2)].wjaccard_x1000) == 250


def test_match_candidates_topk_properties(ray_session):
    """Per-doc queue: <= k rows per doc, ranks are 1..m, and the
    rank-1 row is the doc's argmax candidate (jw desc, partner asc)."""
    from hexhamming_ray.pipelines import ermetrics as EM
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw

    got = EM.match_candidates_topk(SF_DIR).to_pandas()
    per = got.groupby("doc_id")
    assert (per.size() <= 3).all()
    assert (
        per.rnk.apply(lambda r: sorted(r) == list(range(1, len(r) + 1)))
    ).all()

    cand = fuzzy_match_jw(SF_DIR, min_sim=0.85).to_pandas()
    sym = pd.DataFrame(
        {
            "id": np.concatenate([cand.a_id, cand.b_id]),
            "partner": np.concatenate([cand.b_id, cand.a_id]),
            "jw_sim": np.concatenate([cand.jw_sim, cand.jw_sim]),
        }
    ).sort_values(
        ["id", "jw_sim", "partner"], ascending=[True, False, True]
    )
    best = sym.groupby("id").first()
    top1 = got[got.rnk == 1].set_index("doc_id").sort_index()
    assert (top1.cand_id == best.partner.sort_index()).all()


def test_confusion_report_identities(ray_session):
    """Cluster-census identities: exact <= min(pred, truth) clusters;
    exact + split parts <= pure pred clusters = pred - merging; and a
    driver-side reference over the joint labels agrees."""
    from collections import Counter

    from hexhamming_ray.pipelines import ermetrics as EM
    from hexhamming_ray.pipelines.text import _default_partitions

    row = EM.er_confusion_report(SF_DIR).to_pandas().iloc[0]
    n_pred, n_truth = int(row.n_pred_clusters), int(row.n_truth_clusters)
    n_exact, n_merge = int(row.n_exact), int(row.n_merging_pred)
    n_split = int(row.n_split_parts)
    assert n_exact <= min(n_pred, n_truth)
    assert n_exact + n_split == n_pred - n_merge  # pure preds split

    jl = EM._joint_labels(
        SF_DIR, key_len=24, window=4, min_sim=0.88,
        num_partitions=_default_partitions(),
    ).to_pandas()
    cells = Counter(zip(jl.pcid, jl.tcid))
    kp = Counter(p for p, _ in cells)
    kt = Counter(t for _, t in cells)
    assert n_pred == len(kp) and n_truth == len(kt)
    assert n_merge == sum(1 for v in kp.values() if v > 1)
    assert n_exact == sum(
        1 for (p, t) in cells if kp[p] == 1 and kt[t] == 1
    )
    assert n_split == sum(
        1 for (p, t) in cells if kp[p] == 1 and kt[t] > 1
    )


def test_cross_source_paths_agree(ray_session):
    """cross_source_links' plans (in-block pair_filter over the
    broadcast source lut vs post-filter native joins) must emit
    IDENTICAL pairs."""
    from hexhamming_ray.pipelines import strmatch as SM

    def run(force_join):
        return (
            SM.cross_source_links(SF_DIR, force_join=force_join)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    broadcast = run(False)
    joined = run(True)
    pd.testing.assert_frame_equal(broadcast, joined)
    assert len(broadcast) > 0


def test_source_overlap_matrix_consistency(ray_session):
    """Matrix totals equal the link count; source pairs are ordered;
    no same-source cell exists."""
    from hexhamming_ray.pipelines import strmatch as SM

    links = SM.cross_source_links(SF_DIR).to_pandas()
    mat = SM.source_overlap_matrix(SF_DIR).to_pandas()
    assert mat.n_links.sum() == len(links)
    assert (mat.src_a < mat.src_b).all()


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.72])
def test_prefix_filter_is_lossless(ray_session, threshold):
    """ngram_jaccard_prefix == ngram_jaccard_allpairs at several
    thresholds: the AllPairs prefix lemma holds boundary-exactly
    (rational ceil, no float fuzz)."""
    from hexhamming_ray.pipelines.text import (
        ngram_jaccard_allpairs,
        ngram_jaccard_prefix,
    )

    a = (
        ngram_jaccard_prefix(SF_DIR, threshold=threshold)
        .to_pandas().sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    b = (
        ngram_jaccard_allpairs(SF_DIR, threshold=threshold)
        .to_pandas().sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_prefix_join_verify_path_agrees(ray_session):
    """Force the above-cap join verify (cap -> -1) and pin it equal
    to the broadcast verify."""
    from hexhamming_ray.pipelines import text as T

    def run():
        return (
            T.ngram_jaccard_prefix(SF_DIR)
            .to_pandas().sort_values(["id_lo", "id_hi"])
            .reset_index(drop=True)
        )

    broadcast = run()
    old = T.NGRAM_BROADCAST_CAP
    try:
        T.NGRAM_BROADCAST_CAP = -1
        joined = run()
    finally:
        T.NGRAM_BROADCAST_CAP = old
    pd.testing.assert_frame_equal(broadcast, joined)


def test_prefix_df_order_agrees(ray_session):
    """The df-ascending canonical order (the skew-safe scale path)
    returns the identical result set to hash order — the prefix lemma
    is order-agnostic."""
    from hexhamming_ray.pipelines.text import ngram_jaccard_prefix

    a = (
        ngram_jaccard_prefix(SF_DIR)
        .to_pandas().sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    b = (
        ngram_jaccard_prefix(SF_DIR, order="df")
        .to_pandas().sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_centered_sum_vs_reference(ray_session):
    """Centered ROWS frame equals a pandas rolling(center) reference
    on the same total order."""
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines.relational import user_centered_sum

    got = (
        user_centered_sum(SF_DIR)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).to_pandas()
    ev["cents"] = (
        (ev.value * 100).round().astype("int64")
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ref = (
        ev.groupby("user_id")["cents"]
        .rolling(5, center=True, min_periods=1).sum()
        .reset_index(level=0, drop=True)
    ).astype("int64")
    ev["centered_cents"] = ref
    ev = ev.sort_values("event_id").reset_index(drop=True)
    assert (got.centered_cents.to_numpy()
            == ev.centered_cents.to_numpy()).all()


def test_hamming_sweep_monotone(ray_session):
    """Hamming-distance sweep: pairs_pred grows with the distance
    bound, recall grows, precision is non-increasing once pairs exist;
    row 6 equals er_hamming_eval's counts."""
    from hexhamming_ray.pipelines.hamkey import (
        er_hamming_eval,
        hamming_threshold_sweep,
    )

    sweep = hamming_threshold_sweep(SF_DIR).to_pandas()
    assert list(sweep.max_dist) == list(range(7))
    assert (sweep.pairs_pred.diff()[1:] >= 0).all()
    assert (sweep.pairs_both.diff()[1:] >= 0).all()
    ref = er_hamming_eval(SF_DIR).to_pandas().iloc[0]
    row = sweep[sweep.max_dist == 6].iloc[0]
    assert int(row.pairs_pred) == int(ref.pairs_pred)
    assert int(row.pairs_both) == int(ref.pairs_both)


def test_fs_eval_consistency(ray_session):
    """FS decision-layer eval equals a recount over the decision
    table's 'match' band."""
    from hexhamming_ray.pipelines import ermetrics as EM

    row = EM.er_fs_eval(SF_DIR).to_pandas().iloc[0]
    fs = EM.fs_match_scores(SF_DIR).to_pandas()
    n_match = int((fs.decision == "match").sum())
    assert int(row.pairs_pred) == n_match
    assert int(row.pairs_both) <= min(
        int(row.pairs_pred), int(row.pairs_truth)
    )


def test_modularity_paths_agree(ray_session):
    """Broadcast label lut vs sort-based remap produce the identical
    modularity row; the value is sane (|Q| <= 1e6) and intra edges
    bound by total edges."""
    from hexhamming_ray.pipelines import ermetrics as EM

    a = EM.match_graph_modularity(SF_DIR).to_pandas()
    b = EM.match_graph_modularity(SF_DIR, force_remap=True).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    row = a.iloc[0]
    assert 0 < int(row.n_edges)
    assert 0 <= int(row.n_intra_edges) <= int(row.n_edges)
    assert -1_000_000 <= int(row.modularity_ppm) <= 1_000_000


@pytest.mark.parametrize("seed", [5, 23])
def test_metrics_random_corpora_vs_oracle(ray_session, tmp_path, seed):
    """End-to-end fuzz: er_bcubed_eval, er_confusion_report,
    mutual_best_match and er_error_samples vs their DuckDB oracles on
    RANDOMIZED corpora (near-dup families from a seed pool with word
    edits, multiple sources/langs) — inputs a fixed fixture cannot
    enumerate."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    entry = __import__("__ray_entry__")
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(30)]
    texts = []
    # 20 families of 1-4 members: members share a seed text with a
    # few word substitutions (drives both the SN matcher and the
    # Jaccard truth set into agree/disagree regimes)
    for fam in range(20):
        k = int(rng.integers(8, 20))
        base = list(rng.choice(words, k))
        for _ in range(int(rng.integers(1, 5))):
            t = list(base)
            for _ in range(int(rng.integers(0, 3))):
                t[int(rng.integers(0, len(t)))] = str(
                    rng.choice(words)
                )
            texts.append(" ".join(t))
    n = len(texts)
    d = tmp_path / f"fz{seed}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    np.array(["en", "de", "fr"])[
                        rng.integers(0, 3, n)
                    ],
                    pa.string(),
                ),
                "source": pa.array(
                    np.array(["sA", "sB"])[rng.integers(0, 2, n)],
                    pa.string(),
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for name in ("er_bcubed_eval", "er_confusion_report",
                 "mutual_best_match", "er_error_samples",
                 "cross_source_links"):
        got = _norm_like_driver(entry.queries()[name](str(d)))
        want = _norm_like_driver(con.sql(entry.oracle_sql()[name]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con.close()


def _norm_like_driver(res):
    import pyarrow as pa

    if isinstance(res, pa.Table):
        df = res.to_pandas()
    elif isinstance(res, pd.DataFrame):
        df = res
    else:
        df = res.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_composites_checkpoint_resume(ray_session, tmp_path):
    """checkpoint_dir threads through the evaluation composites: the
    SN key table persists as Parquet on the first run and the second
    run resumes from it with an identical result."""
    import os

    from hexhamming_ray.pipelines import ermetrics as EM

    ck = str(tmp_path / "ck")
    first = EM.er_threshold_sweep(SF_DIR, checkpoint_dir=ck).to_pandas()
    assert any(
        n.startswith("sn_keys") for n in os.listdir(ck)
    )
    second = EM.er_threshold_sweep(SF_DIR, checkpoint_dir=ck).to_pandas()
    pd.testing.assert_frame_equal(first, second)
    plain = EM.er_threshold_sweep(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(first, plain)


def test_cascade_paths_agree_and_monotone(ray_session):
    """Broadcast survivor masks vs seeded left_semi/left_anti joins
    produce the identical cascade; counts telescope (docs_out of one
    stage is docs_in of the next) and never grow."""
    from hexhamming_ray.pipelines import ermetrics as EM

    a = EM.dedup_cascade_report(SF_DIR).to_pandas()
    b = EM.dedup_cascade_report(SF_DIR, force_join=True).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert list(a.stage) == ["exact", "near", "fuzzy"]
    assert (a.docs_out <= a.docs_in).all()
    assert list(a.docs_in[1:]) == list(a.docs_out[:-1])
    assert (a.removed == a.docs_in - a.docs_out).all()


@pytest.mark.parametrize("seed", [2, 9])
def test_skyline_vs_bruteforce(ray_session, tmp_path, seed):
    """Distributed skyline-of-skylines equals the O(n^2) dominance
    reference on random parts with PLANTED exact ties (equal on both
    dimensions — all must survive) and duplicated skyline points."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines.relational import parts_skyline

    rng = np.random.default_rng(seed)
    n = 300
    price = np.round(rng.uniform(1, 100, n), 2)
    size = rng.integers(1, 40, n).astype(np.int32)
    # planted ties: rows 0/1 identical; rows 2/3 equal price,
    # different size; rows 4/5 equal size, different price
    price[1], size[1] = price[0], size[0]
    price[3] = price[2]
    size[5] = size[4]
    d = tmp_path / f"sk{seed}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, n + 1), pa.int64()),
                "p_name": pa.array([f"p{i}" for i in range(n)],
                                   pa.string()),
                "p_brand": pa.array(["B"] * n, pa.string()),
                "p_type": pa.array(["T"] * n, pa.string()),
                "p_size": pa.array(size, pa.int32()),
                "p_retailprice": pa.array(price, pa.float64()),
            }
        ),
        d / "part.parquet",
    )
    got = (
        parts_skyline(str(d)).to_pandas()
        .sort_values("p_partkey").reset_index(drop=True)
    )
    cents = np.round(price * 100).astype(np.int64)
    sz = size.astype(np.int64)
    keep = []
    for i in range(n):
        dominated = bool(
            np.any(
                (cents <= cents[i]) & (sz <= sz[i])
                & ((cents < cents[i]) | (sz < sz[i]))
            )
        )
        if not dominated:
            keep.append(i + 1)
    assert list(got.p_partkey) == keep
    assert len(keep) > 0


def test_er_evaluation_report_matches_siblings(ray_session):
    """The composite panel (one shared clustering pass, two exchanges)
    must reproduce er_bcubed_eval, er_rand_index and
    er_confusion_report column-for-column — same integer expressions,
    different physical plan."""
    from hexhamming_ray.pipelines import ermetrics as EM

    panel = EM.er_evaluation_report(SF_DIR).to_pandas().iloc[0]
    bc = EM.er_bcubed_eval(SF_DIR).to_pandas().iloc[0]
    ri = EM.er_rand_index(SF_DIR).to_pandas().iloc[0]
    cf = EM.er_confusion_report(SF_DIR).to_pandas().iloc[0]
    ar = EM.er_adjusted_rand(SF_DIR).to_pandas().iloc[0]

    for col in ("n_docs", "bcubed_precision_ppm", "bcubed_recall_ppm",
                "bcubed_f1_ppm"):
        assert panel[col] == bc[col], col
    for col in ("pairs_total", "pairs_same_both", "pairs_same_pred",
                "pairs_same_truth", "rand_index_ppm"):
        assert panel[col] == ri[col], col
    for col in ("ari_ppm", "fm2_ppm"):
        assert panel[col] == ar[col], col
    for col in ("n_pred_clusters", "n_truth_clusters", "n_exact",
                "n_merging_pred", "n_split_parts"):
        assert panel[col] == cf[col], col


def test_er_incremental_assign_properties(ray_session):
    """Assign-mode invariants: (1) output covers exactly the delta
    docs; (2) every non-singleton assignment points at a BASE cluster
    id (base ids never collide with delta ids, so cluster_id % 10 != 0
    or cluster_id == doc_id); (3) base clusters are computed base-only
    — every assigned cluster id appears as a cluster label of the
    base-only clustering."""
    import numpy as np

    from hexhamming_ray.pipelines import strmatch as SM

    got = SM.er_incremental_assign(SF_DIR).to_pandas()
    ids = got.doc_id.to_numpy()
    assert (ids % 10 == 0).all()
    assert np.unique(ids).shape[0] == ids.shape[0]

    cid = got.cluster_id.to_numpy()
    singleton = cid == ids
    assert ((cid[~singleton] % 10) != 0).all()

    rep = SM.er_incremental_report(SF_DIR).to_pandas().iloc[0]
    assert rep.n_delta == len(got)
    assert rep.n_assigned == int((~singleton).sum())
    assert rep.n_singletons == int(singleton.sum())
    assert rep.n_deferred_pairs >= 0
