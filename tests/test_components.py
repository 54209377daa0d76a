"""Component tests: distributed union-find vs local oracle, multimodal
plumbing, text functions, minhash properties, synth determinism."""

import numpy as np
import pyarrow as pa
import pytest


def test_connected_components_vs_local(ray_session):
    import ray

    from hexhamming_ray.state.unionfind import (
        connected_components,
        unionfind_local,
    )

    rng = np.random.default_rng(0)
    # chains + cliques + singleton-ish pairs; ids deliberately sparse
    pairs = []
    for c in range(30):
        base = c * 1000 + int(rng.integers(0, 50))
        size = int(rng.integers(2, 8))
        ids = base + np.cumsum(rng.integers(1, 9, size=size))
        for i in range(len(ids) - 1):
            pairs.append((int(ids[i]), int(ids[i + 1])))  # chain
    # one long path (stresses round count)
    path = np.arange(100000, 100040)
    pairs += [(int(a), int(b)) for a, b in zip(path[:-1], path[1:])]
    tbl = pa.table(
        {
            "id_lo": pa.array([p[0] for p in pairs], pa.int64()),
            "id_hi": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = {
        r["node"]: r["cluster_id"]
        for b in connected_components(ds).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    want = unionfind_local(pairs)
    assert got == want


def test_media_features_pipeline(ray_session):
    from hexhamming_ray.stages.multimodal import (
        MediaFeatureExtractor,
        media_features,
    )

    out = media_features(200).to_pandas()
    assert len(out) == 200
    assert set(out["kind"]) == {"image", "audio", "video"}
    assert all(len(f) == 64 for f in out["feature"])
    # deterministic
    out2 = media_features(200).to_pandas()
    assert (
        out.sort_values("media_id")["n_bytes"].tolist()
        == out2.sort_values("media_id")["n_bytes"].tolist()
    )
    with pytest.raises(NotImplementedError):
        import pyarrow as _pa

        MediaFeatureExtractor(decode="real")(
            _pa.table(
                {
                    "media_id": _pa.array([0], _pa.int64()),
                    "kind": _pa.array(["image"]),
                    "payload": _pa.array([b"x"], _pa.binary()),
                }
            )
        )


def test_media_features_injected_codec(ray_session):
    """decode="real" with an injected codec callable runs the full
    actor-pool pipeline end to end (the stub is only the MISSING
    library, not a missing integration point); the toy codec doubles
    every byte, so n_bytes must be exactly 2x the fake-decode path.

    The codec is a CLOSURE on purpose: cloudpickle ships it by value,
    so workers don't need the test module importable (a module-level
    function here would make the actor constructor fail on import and
    restart forever)."""
    from hexhamming_ray.stages.multimodal import media_features

    def _toy_codec(payload: bytes, kind: str):
        import numpy as np

        raw = np.frombuffer(payload, dtype=np.uint8)
        return np.repeat(raw, 2)

    fake = media_features(120).to_pandas().sort_values("media_id")
    real = (
        media_features(120, decode="real", codec=_toy_codec)
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(real) == 120
    assert real["n_bytes"].tolist() == (fake["n_bytes"] * 2).tolist()
    assert all(len(f) == 64 for f in real["feature"])
    # deterministic across runs
    real2 = (
        media_features(120, decode="real", codec=_toy_codec)
        .to_pandas()
        .sort_values("media_id")
    )
    assert real["n_bytes"].tolist() == real2["n_bytes"].tolist()


def test_media_wav_real_codec(ray_session):
    """The decode="real" surface against a NON-TOY codec: payloads are
    valid RIFF/WAVE containers and the injected codec is the stdlib
    `wave` module parsing them — a genuine container-format decode, not
    an injected fake. Decoded byte counts must equal the PCM payload
    size (2 bytes/frame, mono), and the decoded stream must match a
    driver-side wave.open of the same container."""
    import io
    import wave as wavelib

    import numpy as np

    from hexhamming_ray.stages.multimodal import (
        media_wav_features,
        synth_wav_batch,
        wav_codec,
    )

    out = media_wav_features(150).to_pandas().sort_values("media_id")
    assert len(out) == 150
    expect = [2 * (64 + (i % 129)) for i in range(150)]
    assert out["n_bytes"].tolist() == expect
    assert all(len(f) == 64 for f in out["feature"])

    # the codec really parses the container: driver-side reference
    tbl = synth_wav_batch({"id": np.arange(5, dtype=np.int64)})
    for i in range(5):
        payload = tbl.column("payload")[i].as_py()
        with wavelib.open(io.BytesIO(payload), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 8000
            ref = w.readframes(w.getnframes())
        got = wav_codec(payload, "audio")
        assert got.tobytes() == ref


def test_text_functions():
    import pyarrow as pa

    from hexhamming_ray.functions import text as T

    arr = pa.array(["Hello World 42!", "", "the cat and the dog", "el que la de"])
    assert T.token_count(arr).to_pylist() == [3, 0, 5, 4]
    q = T.quality_features(arr)
    assert q["n_upper"].to_pylist() == [2, 0, 0, 0]
    assert q["n_digits"].to_pylist() == [2, 0, 0, 0]
    langs = T.langid_batch(arr).to_pylist()
    assert langs[2] == "en"
    assert langs[3] == "es"
    assert langs[1] == "und"
    # rolling fingerprint: deterministic, content-sensitive
    f1 = T.rolling_fingerprint_batch(["abc", "abd", "abc"])
    assert f1[0] == f1[2] and f1[0] != f1[1]


def test_minhash_jaccard_estimate():
    from hexhamming_ray.functions.hashing import minhash_batch

    a = [f"w{i}".encode() for i in range(100)]
    b = a[:80] + [f"x{i}".encode() for i in range(20)]  # ~2/3 shingle overlap
    c = [f"z{i}".encode() for i in range(100)]
    sigs = minhash_batch([a, b, c], num_perm=128)
    est_ab = (sigs[0] == sigs[1]).mean()
    est_ac = (sigs[0] == sigs[2]).mean()
    assert est_ab > 0.4
    assert est_ac < 0.1


def test_synth_determinism():
    from hexhamming_ray.sources.synth import make_cluster_rows

    r1 = make_cluster_rows(7, 42)
    r2 = make_cluster_rows(7, 42)
    assert r1 == r2
    assert make_cluster_rows(7, 43) != r1


def test_scoreblock_cap_fallback():
    """Oversized blocks fall back to sorted-neighbor scoring with
    counted skipped comparisons — bounded work, honest metrics."""
    import pyarrow as pa

    from hexhamming_ray.stages.scoring import ScoreBlock

    rng = np.random.default_rng(5)
    n = 40
    mats = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    # plant two adjacent-sorting near-dups
    mats[10] = 0
    mats[11] = 0
    mats[11, 31] = 1  # dist 1, sorts adjacent to mats[10]
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    group = pa.table(
        {
            "bkey": pa.array(np.zeros(n, dtype=np.int64)),
            "file_id": pa.array(ids),
            "simhash": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(32), n, [None, pa.py_buffer(mats.tobytes())]
            ),
        }
    )
    sb = ScoreBlock(threshold=8, cap=10, window=4)  # force the fallback
    out = sb(group)
    pairs = {(r["id_lo"], r["id_hi"]) for r in out.to_pylist()}
    assert (1010, 1011) in pairs
    assert sb.pairs_capped > 0  # skipped comparisons are counted

    sb_full = ScoreBlock(threshold=8, cap=10_000, window=4)
    full_pairs = {(r["id_lo"], r["id_hi"]) for r in sb_full(group).to_pylist()}
    assert pairs <= full_pairs  # fallback finds a subset, never extras


def test_connected_components_distributed_loop(ray_session):
    """Force the iterative sym+sort+local-UF rounds (tail disabled) and
    check exact agreement with the local oracle on an adversarial mix
    of paths and cliques."""
    import pyarrow as pa
    import ray

    from hexhamming_ray.state.unionfind import (
        connected_components,
        unionfind_local,
    )

    rng = np.random.default_rng(3)
    pairs = []
    path = np.arange(50000, 50300)  # long path: worst case for rounds
    pairs += [(int(a), int(b)) for a, b in zip(path[:-1], path[1:])]
    for c in range(50):
        ids = c * 900 + rng.choice(800, size=6, replace=False)
        for i in range(len(ids) - 1):
            pairs.append((int(ids[i]), int(ids[i + 1])))
    tbl = pa.table(
        {
            "id_lo": pa.array([p[0] for p in pairs], pa.int64()),
            "id_hi": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(6)
    labels = connected_components(ds, single_block_edges=0)
    got = {
        r["node"]: r["cluster_id"]
        for b in labels.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert got == unionfind_local(pairs)


def test_salted_flood_preserves_connectivity():
    """A boilerplate flood far bigger than the cap must still come out
    CONNECTED (salted sub-blocks + representative cross-pass): the
    windowed fallback this replaces only linked rows within a fixed
    window, so a flood fragmented into >window slices lost recall.
    Here every pair is a true match (dist <= threshold), the block is
    16x the cap, and the emitted edges must span all rows as ONE
    union-find component while pairs_capped stays honest."""
    import numpy as np
    import pyarrow as pa

    from hexhamming_ray.stages.scoring import ScoreBlock

    from itertools import combinations

    rng = np.random.default_rng(7)
    n, cap = 800, 50
    base = rng.integers(0, 256, 32, dtype=np.uint8)
    mats = np.tile(base, (n, 1))
    # DISTINCT <=3-bit perturbations of the last 4 bytes per row
    # (pairwise distance <= 6 << threshold), bands 0..13 identical ->
    # every row is a distinct fingerprint and one block owns the flood
    patterns = [0]
    for k in (1, 2, 3):
        patterns.extend(
            sum(1 << b for b in c) for c in combinations(range(32), k)
        )
    assert len(patterns) >= n
    for i in range(n):
        mats[i, 28:32] ^= np.frombuffer(
            int(patterns[i]).to_bytes(4, "little"), dtype=np.uint8
        )
    ids = np.arange(n, dtype=np.int64)
    group = pa.table(
        {
            "bkey": pa.array(np.zeros(n, dtype=np.int64)),
            "file_id": pa.array(ids),
            "simhash": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(32), n, [None, pa.py_buffer(mats.tobytes())]
            ),
        }
    )
    sb = ScoreBlock(threshold=16, cap=cap)
    out = sb(group)
    assert sb.pairs_capped > 0  # the cap genuinely bound this block
    # union-find over emitted edges: flood must be one component
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in out.to_pylist():
        a, b = find(int(r["id_lo"])), find(int(r["id_hi"]))
        if a != b:
            parent[a] = b
    roots = {find(i) for i in range(n)}
    assert len(roots) == 1, f"flood fragmented into {len(roots)} components"


def test_embedding_near_dup_lsh_vs_exact(ray_session):
    """The LSH-bucketed near-dup path must emit a SUBSET of the exact
    block-pair-cartesian pairs (precision 1.0 — every candidate is
    exactly verified) and, at the default (n_bits, n_tables), recover
    every exact pair on the test corpus (recall 1.0)."""
    from hexhamming_ray.stages.annsearch import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["id_lo"], r["id_hi"])
        for r in embedding_near_dup_pairs(sf).take_all()
    }
    approx = {
        (r["id_lo"], r["id_hi"])
        for r in embedding_near_dup_lsh(sf).take_all()
    }
    assert approx <= exact, f"false positives: {sorted(approx - exact)[:5]}"
    missed = exact - approx
    assert not missed, f"recall < 1 at defaults: missed {sorted(missed)[:5]}"


def test_rolling_and_asof_tie_semantics(ray_session, tmp_path):
    """Equal timestamps are the corner the vectorized window/as-of
    passes must get right: RANGE frames include ALL equal-ts peers
    (even 'later' rows), and the as-of match order is pinned to
    (ts, event_id). Build a tiny events table full of exact ties and
    compare against DuckDB running the shipped oracle SQL."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: three events at the SAME ts, then one 30 min later,
    # then one 2 h later (outside the window of the first cluster)
    for i, (mins, etype, val) in enumerate(
        [(0, "view", 1.0), (0, "click", 2.0), (0, "view", 3.0),
         (30, "click", 4.0), (150, "click", 5.0)]
    ):
        rows.append((i, base + pd.Timedelta(minutes=mins), 1, etype, val))
    # user 2: a click with NO preceding view, then view+click tie
    for i, (mins, etype, val) in enumerate(
        [(0, "click", 1.5), (10, "view", 2.5), (10, "click", 3.5)], start=10
    ):
        rows.append((i, base + pd.Timedelta(minutes=mins), 2, etype, val))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{sf}/events.parquet")

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    sqls = E.oracle_sql()
    qs = E.queries()

    def norm(d):
        d = d[sorted(d.columns)]
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    for name in ("rolling_user_window", "asof_view_clicks"):
        got = norm(qs[name](sf).to_pandas())
        want = norm(con.sql(sqls[name]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_knn_ivf_vs_bruteforce(ray_session):
    """IVF with nprobe == nlist scans every cell and must equal the
    brute-force answer EXACTLY; at the pruned defaults recall@5 must
    stay high on the test corpus."""
    from hexhamming_ray.stages.annsearch import knn_bruteforce, knn_ivf

    sf = "/root/testdata/sf0.001"
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(sf).take_all()
    }
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(sf, nlist=16, nprobe=16).take_all()
    }
    assert full == brute, "nprobe==nlist must reproduce brute force"

    pruned = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(sf).take_all()
    }
    recall = len(pruned & brute) / len(brute)
    assert recall >= 0.8, f"IVF recall@5 too low: {recall:.2f}"


def test_kmeans_self_consistency_and_convergence(ray_session):
    """Distributed k-means invariants: (1) every returned assignment is
    the exact argmin against the final centroids, recomputed locally —
    the strongest exact check an iterative float algorithm admits; (2)
    k=1 reduces to the corpus mean; (3) a second run is bit-identical
    (deterministic init + block order)."""
    import numpy as np
    import pyarrow.parquet as pq

    from hexhamming_ray.stages.kmeans import kmeans_embeddings

    sf = "/root/testdata/sf0.001"
    out = kmeans_embeddings(sf, k=4, iters=4)
    cent = out._kmeans_centroids
    rows = out.take_all()
    assign = {int(r["vec_id"]): int(r["cluster"]) for r in rows}

    src = pq.read_table(f"{sf}/embeddings.parquet")
    ids = src.column("vec_id").to_numpy()
    mat = np.array(src.column("embedding").to_pylist(), dtype=np.float64)
    assert len(assign) == len(ids)
    half_c2 = 0.5 * (cent * cent).sum(axis=1)
    want = np.argmin(half_c2[None, :] - mat @ cent.T, axis=1)
    got = np.array([assign[int(i)] for i in ids])
    assert (got == want).all(), "assignments must be exact argmin"
    assert len(np.unique(got)) >= 2, "degenerate clustering"

    one = kmeans_embeddings(sf, k=1, iters=2)
    np.testing.assert_allclose(
        one._kmeans_centroids[0], mat.mean(axis=0), rtol=1e-12
    )

    again = kmeans_embeddings(sf, k=4, iters=4)
    np.testing.assert_array_equal(again._kmeans_centroids, cent)


def test_flaky_udf_retry_preserves_results(ray_session, tmp_path):
    """Fault-tolerance contract: a UDF that CRASHES once per worker
    process (then succeeds on retry) must produce exactly the same
    result as the clean run when the stage opts into
    retry_exceptions — the per-task retry knob every long 100 TB run
    relies on. The first-failure flag is per-process (a tmpdir
    sentinel), so each retried task re-reads its input block from the
    object store — also exercising lineage re-execution."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray

    marker_dir = str(tmp_path)

    def flaky_double(batch: pa.Table) -> pa.Table:
        sentinel = os.path.join(marker_dir, f"pid_{os.getpid()}")
        if not os.path.exists(sentinel):
            open(sentinel, "w").close()
            raise RuntimeError("injected first-call failure")
        return pa.table(
            {"x": pa.array(batch.column("id").to_numpy() * 2, pa.int64())}
        )

    ds = ray.data.range(10_000, override_num_blocks=8)
    out = ds.map_batches(
        flaky_double,
        batch_format="pyarrow",
        zero_copy_batch=True,
        retry_exceptions=True,  # map_batches forwards **ray_remote_args
    ).take_all()
    got = np.sort(np.array([r["x"] for r in out]))
    want = np.arange(10_000, dtype=np.int64) * 2
    np.testing.assert_array_equal(got, want)


def test_bloom_filter_no_false_negatives():
    """The Bloom pre-filter may pass extra keys (the exact join kills
    them) but must NEVER drop a true member — for any key set and any
    filter size, including heavy saturation."""
    import numpy as np

    from hexhamming_ray.pipelines.relational import (
        _bloom_build, _bloom_maybe,
    )

    rng = np.random.default_rng(3)
    for m_bits in (64, 1 << 10, 1 << 17):
        keys = rng.integers(0, 1 << 62, 5000).astype(np.int64)
        bits = _bloom_build(keys, m_bits)
        assert _bloom_maybe(bits, keys, m_bits).all()
        # disjoint probes: pass rate must collapse when the filter is
        # roomy (m_bits >> n) — the volume-cut property
        probes = keys + np.int64(1 << 62)
        fp = _bloom_maybe(bits, probes, m_bits).mean()
        if m_bits == 1 << 17:
            assert fp < 0.2, f"fp rate {fp:.3f} too high for roomy filter"


def test_cms_bounds_and_mergeability(ray_session):
    """Count-Min invariants: (1) the distributed per-block-merged
    sketch equals a single local build over all keys (merge is an
    elementwise sum — exact); (2) est >= true for every queried key;
    (3) est <= true + 2N/width for the top keys (the classic bound,
    deterministic here)."""
    import numpy as np
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines.relational import (
        _cms_build, _cms_query, cms_user_event_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = cms_user_event_counts(sf).to_pandas().set_index("user_id")

    uid = pq.read_table(
        f"{sf}/events.parquet", columns=["user_id"]
    ).column("user_id").to_numpy().astype(np.int64)
    n_total = len(uid)
    true = {int(u): int(c) for u, c in
            zip(*np.unique(uid, return_counts=True))}
    width = 4096
    for u, row in got.iterrows():
        t = true[int(u)]
        assert row.est_n >= t, f"CMS under-counted user {u}"
        assert row.est_n <= t + 2 * n_total / width + 1

    # mergeability: split keys into chunks, sum of chunk sketches ==
    # one-shot sketch
    one = _cms_build(uid, 4, width)
    parts = sum(
        _cms_build(c, 4, width) for c in np.array_split(uid, 7)
    )
    np.testing.assert_array_equal(one, parts)
    np.testing.assert_array_equal(
        _cms_query(one, uid[:50]), _cms_query(parts, uid[:50])
    )


def test_media_frame_sample_pipeline(ray_session):
    from hexhamming_ray.stages.multimodal import media_frame_sample

    out = media_frame_sample(150, k=4).to_pandas()
    # audio rows (media_id % 3 == 1) contribute no frames
    assert (out["media_id"] % 3 != 1).all()
    # images (id % 3 == 0) contribute exactly one whole-payload frame
    img = out[out["media_id"] % 3 == 0]
    assert (img.groupby("media_id").size() == 1).all()
    assert (img["frame_no"] == 0).all()
    # videos (id % 3 == 2) contribute 1..k frames, numbered densely
    vid = out[out["media_id"] % 3 == 2]
    per = vid.groupby("media_id")["frame_no"]
    assert per.count().between(1, 4).all()
    assert (per.max() == per.count() - 1).all()
    assert (out["frame_bytes"] ==
            out["frame_payload"].map(len)).all()
    # deterministic across runs
    out2 = media_frame_sample(150, k=4).to_pandas()
    a = out.sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    b = out2.sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    assert a.equals(b)


def test_media_frame_sample_injected_codec(ray_session):
    from hexhamming_ray.stages.multimodal import media_frame_sample

    # closure on purpose: cloudpickle ships it by value, so workers
    # don't need the test module importable (see the codec test above)
    def _toy_demux(payload: bytes, kind: str):
        h = len(payload) // 2
        return [payload[:h], payload[h:]]

    out = media_frame_sample(60, k=4, codec=_toy_demux).to_pandas()
    assert (out["media_id"] % 3 != 1).all()
    nonaudio = out[out["media_id"] % 3 != 1]
    assert (nonaudio.groupby("media_id").size() == 2).all()


def test_chunk_docs_overlap_vs_reference(ray_session, tmp_path):
    """chunk_docs with stride < chunk (overlapping windows) must match
    a plain-Python sliding-window reference, including sub-stride docs,
    empty docs, and whitespace edges."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines.text import chunk_docs

    rng = np.random.default_rng(7)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = ["", "  ", "one", "one two three"]
    texts += [
        " ".join(rng.choice(words, int(rng.integers(1, 40))))
        for _ in range(60)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], np.int64), pa.int64()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    chunk, stride = 8, 3
    got = (
        chunk_docs(str(tmp_path), chunk=chunk, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )

    rows = []
    for i, t in enumerate(texts):
        toks = t.split()
        start, cid = 0, 0
        while start < len(toks):
            w = toks[start:start + chunk]
            rows.append((i, cid, len(w), " ".join(w)))
            start += stride
            cid += 1
    want = pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "n_chunk_tokens",
                       "chunk_text"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("doc_id").size() > 1).any()


def test_bigram_repetition_batch_matches_python_reference():
    """The vectorized bigram dup counter vs a Counter-based reference
    on a randomized corpus including the tokenizer edge cases."""
    from collections import Counter

    import numpy as np

    from hexhamming_ray.functions.hashing import bigram_repetition_batch

    rng = np.random.default_rng(7)
    words = ["a", "bb", "ccc", "über", "中文", "x1", "the"]
    texts = ["", "  \t ", "solo", "two toks", "r r r r", "a  b\ta b"]
    for _ in range(200):
        k = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(words, k)))
    nb, nd = bigram_repetition_batch(texts)
    for i, t in enumerate(texts):
        toks = t.split()
        bigs = [(toks[j], toks[j + 1]) for j in range(len(toks) - 1)]
        c = Counter(bigs)
        assert nb[i] == len(bigs)
        assert nd[i] == sum(v for v in c.values() if v >= 2)


def test_binary_u64_view_layouts():
    """_binary_u64_view must be bit-identical to the per-row frombuffer
    reference across plain, sliced (unaligned start), chunked and
    empty-row layouts — it backs the loop-free Jaccard verify."""
    import numpy as np
    import pyarrow as pa

    from hexhamming_ray.pipelines.text import _binary_u64_view

    rng = np.random.default_rng(3)
    rows = [
        rng.integers(0, 2**63, size=int(k), dtype=np.uint64)
        for k in rng.integers(0, 9, size=40)
    ]
    arrs = [pa.array([r.tobytes() for r in rows], pa.binary())]
    # sliced view (row offset -> offsets buffer starts mid-buffer)
    arrs.append(arrs[0].slice(7, 25))
    # chunked column
    arrs.append(
        pa.chunked_array(
            [arrs[0].slice(0, 13), arrs[0].slice(13, 27)]
        )
    )
    # large_binary flavor
    arrs.append(arrs[0].cast(pa.large_binary()))
    for a in arrs:
        vals, lens = _binary_u64_view(a)
        col = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        ref_rows = [
            np.frombuffer(b, dtype=np.uint64)
            for b in col.to_pylist()
        ]
        ref_vals = (
            np.concatenate(ref_rows) if ref_rows
            else np.empty(0, np.uint64)
        )
        assert np.array_equal(lens, [len(r) for r in ref_rows])
        assert np.array_equal(vals, ref_vals)


def test_orc_datasource_multi_stripe(ray_session, tmp_path):
    """OrcDatasource must emit one block per STRIPE: a file written
    with a small stripe size yields more read blocks than files, and
    column projection applies at the read."""
    import numpy as np
    import pyarrow as pa
    from pyarrow import orc

    from hexhamming_ray.sources.orc import read_orc

    n = 200_000
    t = pa.table(
        {
            "a": pa.array(np.arange(n, dtype=np.int64)),
            "b": pa.array(np.arange(n, dtype=np.int64) * 2),
            "pad": pa.array(["x" * 40] * n),
        }
    )
    path = tmp_path / "multi.orc"
    orc.write_table(t, str(path), stripe_size=512 * 1024)
    nstripes = orc.ORCFile(str(path)).nstripes
    assert nstripes > 1  # the fixture really is multi-stripe
    ds = read_orc(str(path), columns=["a"])
    got = ds.to_pandas()
    assert list(got.columns) == ["a"]
    assert len(got) == n
    assert got["a"].sum() == n * (n - 1) // 2
