"""End-to-end ER pipeline correctness on a tiny planted corpus:
cluster agreement with a brute-force local oracle, pairwise F1,
sha256 row invariant, edge canonicalization, checkpoint resume."""

import glob
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

CORPUS = "/tmp/hexray_test_corpus"
N_FILES = 400


@pytest.fixture(scope="session")
def corpus(ray_session):
    from hexhamming_ray.sources.synth import generate_corpus

    files_dir = generate_corpus(CORPUS, n_files=N_FILES, seed=42)
    return files_dir


@pytest.fixture(scope="session")
def pipeline_out(corpus):
    from hexhamming_ray.pipelines.er import run_pipeline

    out_dir = "/tmp/hexray_test_ck"
    shutil.rmtree(out_dir, ignore_errors=True)
    res = run_pipeline(corpus, out_dir=out_dir)
    return res, out_dir


def test_sha256_invariant(corpus, pipeline_out):
    """Per-row invariant (input_hint): fingerprint sha256 equals
    sha256 of the corpus row's content."""
    import hashlib

    res, _ = pipeline_out
    files = pq.read_table(glob.glob(os.path.join(corpus, "*.parquet"))[0])
    by_key = {}
    for r in files.to_pylist()[:200]:
        by_key[(r["repo"], r["path"], r["commit"])] = hashlib.sha256(
            r["content"].encode()
        ).hexdigest()
    checked = 0
    for b in res["fingerprints"].iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            k = (row["repo"], row["path"], row["commit"])
            if k in by_key:
                assert row["sha256"] == by_key[k]
                checked += 1
    assert checked >= 100


def test_edges_canonical(pipeline_out):
    res, _ = pipeline_out
    tbl = res["edges"].to_pandas()
    assert (tbl["id_lo"] < tbl["id_hi"]).all()
    assert not tbl.duplicated(["id_lo", "id_hi"]).any()
    from hexhamming_ray.stages.scoring import DEFAULT_THRESHOLD

    assert (tbl["dist"] <= DEFAULT_THRESHOLD).all()


def test_clusters_match_local_unionfind(pipeline_out):
    """Cluster assignment must equal transitive closure of the edge set
    (min-id representative), for every file."""
    from hexhamming_ray.state.unionfind import unionfind_local

    res, _ = pipeline_out
    edges = res["edges"].to_pandas()
    parent = unionfind_local(list(zip(edges["id_lo"], edges["id_hi"])))
    clusters = res["clusters"].to_pandas()
    assert len(clusters) == clusters["file_id"].nunique()
    for fid, cid in zip(clusters["file_id"], clusters["cluster_id"]):
        assert parent.get(fid, fid) == cid


def test_pairwise_f1(pipeline_out):
    from hexhamming_ray.pipelines.evaluate import pairwise_scores

    res, _ = pipeline_out
    from hexhamming_ray.sources.synth import labels_path

    scores = pairwise_scores(res["clusters"], labels_path(CORPUS, N_FILES))
    assert scores["n_labeled"] > 200
    assert scores["f1"] >= 0.99, scores


def test_checkpoint_resume(corpus, pipeline_out):
    """A re-run with the same checkpoint dir must skip completed stages
    (checkpoint files untouched) and produce identical clusters."""
    from hexhamming_ray.pipelines.er import run_pipeline

    res1, out_dir = pipeline_out
    stamp = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out_dir, "*", "*.parquet"))
    }
    res2 = run_pipeline(corpus, out_dir=out_dir)
    stamp2 = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out_dir, "*", "*.parquet"))
    }
    assert stamp == stamp2  # nothing recomputed
    c1 = res1["clusters"].to_pandas().sort_values("file_id").reset_index(drop=True)
    c2 = res2["clusters"].to_pandas().sort_values("file_id").reset_index(drop=True)
    assert c1.equals(c2)


def test_simhash_separation(ray_session):
    """Planted clones land within threshold; unrelated bases far."""
    from hexhamming_ray.functions.hashing import simhash_batch
    from hexhamming_ray.functions.kernel import hamming_rowwise
    from hexhamming_ray.sources.synth import make_cluster_rows

    rows_a = make_cluster_rows(3, 42)  # size >= 2 cluster
    rows_b = make_cluster_rows(5, 42)
    fps = simhash_batch(
        [r["content"].encode() for r in rows_a[:2] + rows_b[:1]]
    )
    d_clone = hamming_rowwise(fps[0:1], fps[1:2])[0]
    d_diff = hamming_rowwise(fps[0:1], fps[2:3])[0]
    assert d_clone <= 20
    assert d_diff > 40


def test_unrelated_same_lang_margin(ray_session):
    """UNRELATED same-language files must stay well above the scoring
    threshold. Pairwise F1 against the labels is blind here: the
    labels' negatives are consecutive-rep pairs, so merges between
    same-language hub clusters are invisible to it — measured: raising
    the simhash window-sampling rate to 1/8 pushed unrelated-pair
    distances (mean ~25-40 at content_scale 8) under threshold 20 and
    fused 82 hub clusters into one 12k-file component while F1 stayed
    1.000. This pins the margin the sampling rate must preserve."""
    import hexhamming_ray.sources.synth as S
    from hexhamming_ray.functions.hashing import simhash_batch
    from hexhamming_ray.functions.kernel import hamming_rowwise
    from hexhamming_ray.stages.scoring import DEFAULT_THRESHOLD

    old_scale = S.CONTENT_SCALE
    try:
        S.CONTENT_SCALE = 8  # longer files SHRINK unrelated distances
        texts = []
        for cid in range(0, 60, 5):  # same lang: cid % 5 == 0
            rows = S.make_cluster_rows(cid, 42)
            t = rows[0]["content"].encode()
            if t:
                texts.append(t)
        fps = simhash_batch(texts)
        dmin = 256
        for i in range(len(fps) - 1):
            d = hamming_rowwise(
                np.repeat(fps[i : i + 1], len(fps) - i - 1, axis=0),
                fps[i + 1 :],
            )
            dmin = min(dmin, int(d.min()))
        assert dmin > DEFAULT_THRESHOLD + 10, (
            f"unrelated same-lang margin collapsed: min dist {dmin} vs "
            f"threshold {DEFAULT_THRESHOLD}"
        )
    finally:
        S.CONTENT_SCALE = old_scale


def test_er_exact_clusters_with_planted_dups(ray_session, tmp_path):
    """er_exact_clusters on a corpus WITH exact duplicates: clusters
    must equal the text-equality partition with min-doc_id labels.
    (The driver testdata has no exact dups, where this query is
    trivially the identity map — this pins the non-trivial path.)"""
    import pyarrow as pa

    from hexhamming_ray.pipelines.text import er_exact_clusters

    texts, ids = [], []
    for g in range(20):
        body = f"document body {g} " + "tok ".join(str(g * 7 + k) for k in range(30))
        for m in range(g % 4 + 1):  # groups of size 1..4
            ids.append(len(ids))
            texts.append(body)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["synth"] * len(ids)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (
        er_exact_clusters(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # local oracle: min doc_id per identical text
    want = {}
    first = {}
    for i, t in zip(ids, texts):
        first.setdefault(t, i)
        want[i] = first[t]
    assert len(got) == len(ids)
    assert {int(r.doc_id): int(r.cluster_id) for r in got.itertuples()} == want
    sizes = got.groupby("cluster_id").size()
    assert (sizes > 1).sum() > 0, "planted duplicate groups must merge"


def test_incremental_update_matches_full_run(ray_session, corpus, tmp_path):
    """update_clusters (incremental ER over a checkpoint) must produce
    clusters IDENTICAL to a from-scratch run over old ∪ new — labels
    are min-node-id, so exact frame equality is the right check. The
    split deliberately cuts planted duplicate clusters across the
    old/new boundary."""
    import hashlib as _hl

    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray

    from hexhamming_ray.pipelines.er import run_pipeline, update_clusters

    full = pads.dataset(corpus).to_table()
    # deterministic 70/30 split by md5(path) — cuts clusters across
    # the boundary (clone files share repo but differ in path)
    is_new = pa.array(
        [
            int(_hl.md5(p.encode()).hexdigest(), 16) % 10 < 3
            for p in full.column("path").to_pylist()
        ]
    )
    old_tbl = full.filter(pa.compute.invert(is_new))
    new_tbl = full.filter(is_new)
    assert 0 < len(new_tbl) < len(full)

    def labels(ds):
        df = ds.to_pandas().sort_values("file_id").reset_index(drop=True)
        return df

    # ground truth: from-scratch run over everything
    truth = labels(run_pipeline(corpus)["clusters"])

    # checkpointed run over OLD only, then incremental update with NEW
    old_dir = str(tmp_path / "old_files")
    os.makedirs(old_dir, exist_ok=True)
    pq.write_table(old_tbl, os.path.join(old_dir, "part-0.parquet"))
    ckpt = str(tmp_path / "ck")
    run_pipeline(old_dir, out_dir=ckpt)
    merged = labels(update_clusters(ckpt, ray.data.from_arrow(new_tbl)))

    assert len(merged) == len(truth)
    pd.testing.assert_frame_equal(merged, truth)


def test_minhash_signature_checkpoint_resume(ray_session, tmp_path):
    """minhash_dup_pairs(checkpoint_dir=...) writes the corpus-sized
    signature table as partitioned Parquet with a lineage manifest,
    and a second run RESUMES from it: the signature stage is never
    rebuilt — proven by pointing the resumed run at a nonexistent
    sf_dir (only the signature builder touches sf_dir on this path,
    so the run can only succeed by reading the checkpoint)."""
    import json

    import pandas as pd

    from hexhamming_ray.pipelines.text import minhash_dup_pairs

    sf = "/root/testdata/sf0.001"

    def norm(ds):
        df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        return df.sort_values(["id_lo", "id_hi"]).reset_index(drop=True)

    base = norm(minhash_dup_pairs(sf))
    ck = str(tmp_path / "mh_ck")
    os.makedirs(ck)
    r1 = norm(minhash_dup_pairs(sf, checkpoint_dir=ck))
    with open(os.path.join(ck, "manifest.json")) as f:
        man = json.load(f)
    assert man["minhash_sigs"]["complete"]
    assert man["minhash_sigs"]["rows"] > 0
    assert man["minhash_sigs"]["partitions"]  # per-partition lineage
    pd.testing.assert_frame_equal(r1, base)
    # resume: a bogus sf_dir can only work if the checkpoint is read
    r2 = norm(minhash_dup_pairs(str(tmp_path / "no_such_sf"),
                                checkpoint_dir=ck))
    pd.testing.assert_frame_equal(r2, base)


def test_ngram_shingle_checkpoint_resume(ray_session, tmp_path):
    """ngram_jaccard_pairs(checkpoint_dir=...) on the ABOVE-CAP join
    path writes the corpus-sized shingle table as partitioned Parquet
    instead of pinning it in the object store (VERDICT r03 #2), and a
    second run resumes from it: cap forced to -1 so the join path
    runs at test scale; the resumed run points at a nonexistent
    sf_dir, so it can only succeed by reading the minhash-signature
    AND shingle checkpoints."""
    import json

    import pandas as pd

    from hexhamming_ray.pipelines import text as T

    sf = "/root/testdata/sf0.001"

    def norm(ds):
        df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        return df.sort_values(["id_lo", "id_hi"]).reset_index(drop=True)

    base = norm(T.ngram_jaccard_pairs(sf))
    ck = str(tmp_path / "ng_ck")
    os.makedirs(ck)
    old = T.NGRAM_BROADCAST_CAP
    try:
        T.NGRAM_BROADCAST_CAP = -1  # force the shuffle/join path
        r1 = norm(T.ngram_jaccard_pairs(sf, checkpoint_dir=ck))
        with open(os.path.join(ck, "manifest.json")) as f:
            man = json.load(f)
        assert man["ngram_shingles"]["complete"]
        assert man["ngram_shingles"]["rows"] > 0
        pd.testing.assert_frame_equal(r1, base)
        # resume: a bogus sf_dir can only work if both checkpoints are read
        r2 = norm(T.ngram_jaccard_pairs(str(tmp_path / "no_such_sf"),
                                        checkpoint_dir=ck))
        pd.testing.assert_frame_equal(r2, base)
    finally:
        T.NGRAM_BROADCAST_CAP = old
