"""Documents-table pipelines: text analysis, exact/near dedup, ER over
documents — the training-data-pipeline operators (task brief) expressed
as Ray Data transforms over ``{sf_dir}/documents.parquet``.

Every function takes ``sf_dir`` and returns a Dataset whose column
names exactly match the corresponding ``oracle_sql`` aliases (the
driver's correctness compare is name-sensitive)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hexhamming_ray.functions import text as T
from hexhamming_ray.functions.hashing import (
    band_keys_from_minhash,
    minhash_bytes_batch,
    simhash_batch,
)


def _docs(sf_dir: str, columns=None):
    import ray

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns
    )


# ---------------------------------------------------------------------------
# text analysis (SQL-oracled)
# ---------------------------------------------------------------------------


def token_counts(sf_dir: str):
    """(doc_id, n_tokens) — whitespace token count per document."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": T.token_count(batch.column("text")),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def quality_scores(sf_dir: str):
    """(doc_id, n_chars_m, n_tokens, n_upper, n_digits, n_punct,
    quality_ok) — integer quality-signal features."""

    def f(batch: pa.Table) -> pa.Table:
        q = T.quality_features(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_m": q["n_chars"],
                "n_tokens": q["n_tokens"],
                "n_upper": q["n_upper"],
                "n_digits": q["n_digits"],
                "n_punct": q["n_punct"],
                "quality_ok": q["quality_ok"],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def doc_stats_by_lang(sf_dir: str):
    """(lang, n_docs, total_chars, max_chars, min_chars)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _docs(sf_dir, ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(), Sum("n_chars"), Max("n_chars"), Min("n_chars")
    )
    return out.rename_columns(
        ["lang", "n_docs", "total_chars", "max_chars", "min_chars"]
    )


def top_docs_by_len(sf_dir: str):
    """Top 10 longest documents: (doc_id, n_chars); deterministic
    tie-break on doc_id ascending."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def doc_fingerprints(sf_dir: str):
    """(doc_id, fp) — md5-prefix content fingerprint (exact-identity
    fingerprint; SQL-oracled via DuckDB md5)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(T.md5_prefix_batch(texts), type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def exact_dedup(sf_dir: str):
    """(h, keep_id, n_dups) — exact-duplicate groups by content hash;
    keep_id is the minimum doc_id of each group (hash-partition +
    per-group first, SURVEY.md §2.3 set-ops row)."""
    from ray.data.aggregate import Count, Min

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        return pa.table(
            {"h": pa.array(h, type=pa.string()), "doc_id": batch.column("doc_id")}
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    out = ds.groupby("h").aggregate(Min("doc_id"), Count())
    return out.rename_columns(["h", "keep_id", "n_dups"])


def langid_docs(sf_dir: str):
    """(doc_id, pred_lang) — marker-word / CJK-ratio language ID."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": T.langid_batch(batch.column("text")),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# near-dup & ER over documents (rows-only checks: not SQL-expressible)
# ---------------------------------------------------------------------------


def simhash_docs(sf_dir: str):
    """(doc_id, simhash_hex) — 256-bit simhash fingerprints."""

    def f(batch: pa.Table) -> pa.Table:
        raw = [t.encode() for t in batch.column("text").to_pylist()]
        fps = simhash_batch(raw)
        hexes = [fp.tobytes().hex() for fp in fps]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash_hex": pa.array(hexes, type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


class _MinhashBand:
    """Actor-pool stage: minhash signatures + LSH band keys per batch.

    Signatures are the fully-vectorized byte-8-gram MinHash
    (``minhash_bytes_batch``): the word-shingle variant costs one
    Python hash call per shingle, which dominated the stage wall time
    at bench scale; the byte-shingle stream reuses the simhash window
    scratch and runs at memory speed."""

    def __init__(self, num_perm: int = 64, bands: int = 16):
        self.num_perm = num_perm
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = [t.encode() for t in batch.column("text").to_pylist()]
        sigs = minhash_bytes_batch(raw, num_perm=self.num_perm)
        keys = band_keys_from_minhash(sigs, self.bands)
        n = len(raw)
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "bkey": pa.array(keys.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(ids, self.bands)),
                "sig": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(self.num_perm * 8),
                    n * self.bands,
                    [None, pa.py_buffer(np.repeat(sigs, self.bands, axis=0).tobytes())],
                ),
            }
        )


class _JaccardVerify:
    """Score candidate blocks: estimated jaccard from minhash signature
    agreement; emit pairs >= threshold."""

    def __init__(self, num_perm: int = 64, threshold: float = 0.5):
        self.num_perm = num_perm
        self.threshold = threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table(
            {
                "id_lo": pa.array([], pa.int64()),
                "id_hi": pa.array([], pa.int64()),
                "sim_x1000": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        ids = group.column("doc_id").to_numpy()
        sigs = np.stack(
            [
                np.frombuffer(s, dtype=np.uint64)
                for s in group.column("sig").to_pylist()
            ]
        )
        # de-dup doc ids within a block (same pair found in many bands
        # is deduped globally later)
        uniq_idx = np.unique(ids, return_index=True)[1]
        ids = ids[uniq_idx]
        sigs = sigs[uniq_idx]
        n = len(ids)
        if n < 2:
            return empty
        lo, hi, sim = [], [], []
        for i in range(n):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.nonzero(agree >= self.threshold)[0]
            for j, a in zip(hit, agree[hit]):
                x, y = ids[i], ids[i + 1 + j]
                lo.append(min(x, y))
                hi.append(max(x, y))
                sim.append(int(round(a * 1000)))
        return pa.table(
            {
                "id_lo": pa.array(lo, pa.int64()),
                "id_hi": pa.array(hi, pa.int64()),
                "sim_x1000": pa.array(sim, pa.int64()),
            }
        )


def minhash_dup_pairs(sf_dir: str, *, threshold: float = 0.5):
    """Near-duplicate candidate pairs via MinHash-LSH banding:
    shingle -> minhash -> band -> groupby(band key) -> verify
    (estimated Jaccard >= threshold). (id_lo, id_hi, sim_x1000)."""
    from ray.data.aggregate import Max

    from hexhamming_ray import pool_size

    ds = _docs(sf_dir, ["doc_id", "text"])
    banded = ds.map_batches(
        _MinhashBand,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(0.25),
        batch_size=None,
    )
    pairs = banded.groupby("bkey").map_groups(
        _JaccardVerify,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        concurrency=pool_size(0.25),
    )
    out = pairs.groupby(["id_lo", "id_hi"]).aggregate(Max("sim_x1000"))
    return out.rename_columns(["id_lo", "id_hi", "sim_x1000"])


def er_clusters_docs(sf_dir: str, *, threshold: int = 20):
    """Full ER pipeline over documents-as-corpus: (doc_id, cluster_id).
    Adapts documents to the files schema, then runs the flagship
    blocking + scoring + union-find pipeline."""
    from hexhamming_ray.pipelines.er import build_clusters, build_edges

    def adapt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        n = len(batch)
        return pa.table(
            {
                "_id": ids,  # fingerprint stage uses this as file_id
                "repo": batch.column("source").cast(pa.string()),
                "path": pa.array([f"doc/{i}" for i in ids.to_pylist()], pa.string()),
                "commit": pa.array(["0" * 40] * n, pa.string()),
                "lang": batch.column("lang").cast(pa.string()),
                "content": batch.column("text").cast(pa.string()),
            }
        )

    files = _docs(sf_dir).map_batches(
        adapt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    fps, edges = build_edges(files, threshold=threshold)
    clusters = build_clusters(fps, edges)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("file_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
            }
        )

    return clusters.map_batches(finish, batch_format="pyarrow", batch_size=None)


class _ExactJaccard:
    """Exact token-3-gram Jaccard for candidate pairs. The documents'
    shingle sets are broadcast once via ``ray.put`` (small side); at
    10^12-doc scale this becomes a hash join of candidate pairs against
    the corpus on doc_id — the candidate set, not the corpus, is what
    this stage iterates."""

    def __init__(self, docs_ref, threshold: float):
        self.ref = docs_ref
        self.threshold = threshold
        self._shingles = None

    @property
    def shingles(self):
        if self._shingles is None:
            import ray

            self._shingles = ray.get(self.ref)  # dict doc_id -> frozenset
        return self._shingles

    def __getstate__(self):
        return {"ref": self.ref, "threshold": self.threshold, "_shingles": None}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        out_lo, out_hi, out_j = [], [], []
        for a, b in zip(lo.tolist(), hi.tolist()):
            sa = self.shingles.get(a)
            sb = self.shingles.get(b)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= self.threshold:
                out_lo.append(a)
                out_hi.append(b)
                out_j.append(int(round(j * 1000)))
        return pa.table(
            {
                "id_lo": pa.array(out_lo, pa.int64()),
                "id_hi": pa.array(out_hi, pa.int64()),
                "jaccard_x1000": pa.array(out_j, pa.int64()),
            }
        )


def ngram_jaccard_pairs(sf_dir: str, *, threshold: float = 0.5):
    """Near-dup pairs with EXACT token-3-gram Jaccard >= threshold:
    MinHash-LSH proposes candidates (cheap, approximate), then the
    exact set Jaccard verifies — the estimate filters, the exact value
    decides. (id_lo, id_hi, jaccard_x1000)."""
    import ray

    # candidates from the minhash pipeline at a permissive threshold
    cands = minhash_dup_pairs(sf_dir, threshold=0.3)

    def shingle_set(text: str) -> frozenset:
        toks = text.split()
        if len(toks) < 3:
            return frozenset([" ".join(toks)]) if toks else frozenset()
        return frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )

    shingles = {}
    for b in _docs(sf_dir, ["doc_id", "text"]).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            shingles[r["doc_id"]] = shingle_set(r["text"])
    docs_ref = ray.put(shingles)

    # instance (not class) -> plain task UDF: this pipeline already has
    # two actor pools upstream, and a third pool would hold every CPU of
    # a small cluster and starve the shuffles between them
    return cands.map_batches(
        _ExactJaccard(docs_ref, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
