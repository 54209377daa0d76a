"""Similarity search over the embeddings table.

* ``knn_bruteforce`` — exact top-k cosine: the query matrix is
  broadcast once via ``ray.put`` and every batch runs one vectorized
  float64 matmul against it (the per-batch analog of the reference's
  1-vs-N packed scan, python_hexhamming.cc:246-284, lifted to dense
  vectors). Partial top-k per batch, merged by a final small groupby.
* ``knn_lsh`` — the scale path: random-hyperplane signature buckets
  (signs -> simhash-style bit keys) shuffle candidates into blocks via
  groupby; only within-bucket distances are computed. Recall < 1 by
  construction; multiprobe widens it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray import pool_size


def _emb(sf_dir: str):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


class _BruteScore:
    """Actor-pool stage: per batch, cosine of all rows vs the broadcast
    query matrix; emits each batch's top-k rows per query (partial
    top-k: the global merge only sees n_batches * k rows per query)."""

    def __init__(self, queries_ref, k: int):
        import ray

        self.qids, qmat = ray.get(queries_ref)
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qn = qn
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = self.qn @ mat.T  # (Q, N)
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                if ids[j] == self.qids[qi]:
                    continue  # exclude self-match
                out_q.append(self.qids[qi])
                out_n.append(ids[j])
                out_s.append(row[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def knn_bruteforce(sf_dir: str, *, n_queries: int = 10, k: int = 5):
    """Exact top-k cosine neighbors for the first ``n_queries`` vec_ids:
    (query_id, neighbor_id, rank). Deterministic tie-break on
    (cosine desc, neighbor_id asc)."""
    import ray

    ds = _emb(sf_dir)

    # queries: the n_queries smallest vec_ids (deterministic, tiny)
    qrows = sorted(
        (r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()),
        key=lambda r: r["vec_id"],
    )[:n_queries]
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    queries_ref = ray.put((qids, qmat))

    partial = ds.map_batches(
        _BruteScore,
        fn_constructor_args=(queries_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(0.5),
        batch_size=2048,
    )

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.to_pandas()
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(), pa.int64()),
                "neighbor_id": pa.array(g["neighbor_id"].to_numpy(), pa.int64()),
                "rank": pa.array(g["rank"].to_numpy(), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(
        final_topk, batch_format="pyarrow"
    )


class _HyperplaneBucket:
    """Random-hyperplane LSH bucketer (seeded, built once per actor)."""

    def __init__(self, dim: int, n_bits: int = 8, n_tables: int = 4, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        n = len(ids)
        out_key, out_id, out_vec = [], [], []
        weights = 1 << np.arange(self.planes.shape[1], dtype=np.int64)
        for t in range(self.n_tables):
            signs = (mat @ self.planes[t].T) > 0  # (N, bits)
            keys = signs.astype(np.int64) @ weights + (t << 32)
            out_key.append(keys)
            out_id.append(ids)
            out_vec.append(mat)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_key)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "vec": pa.array(
                    list(np.concatenate(out_vec, axis=0).astype(np.float32)),
                    type=pa.list_(pa.float32()),
                ),
            }
        )


def knn_lsh(sf_dir: str, *, n_queries: int = 10, k: int = 5,
            n_bits: int = 8, n_tables: int = 4):
    """Approximate top-k: hyperplane-LSH bucket groupby; queries are
    compared only within their buckets. (query_id, neighbor_id, rank)
    — approximate recall; the scale path for 10^12-row corpora."""
    import ray

    ds = _emb(sf_dir)
    first = ds.take(1)[0]
    dim = len(first["embedding"])

    qrows = sorted(
        (r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()),
        key=lambda r: r["vec_id"],
    )[:n_queries]
    qids = set(int(r["vec_id"]) for r in qrows)
    qids_ref = ray.put(np.array(sorted(qids), dtype=np.int64))

    # two stateful pools are live at once in this pipeline (bucketer ->
    # sort -> scorer): cap each at a quarter of the CPUs so the shuffle
    # tasks between them always have workers
    bucketed = ds.map_batches(
        _HyperplaneBucket,
        fn_constructor_args=(dim, n_bits, n_tables),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(0.25), batch_size=None)

    class ScoreBucket:
        def __init__(self):
            self.qids = ray.get(qids_ref)

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group.column("vec_id").to_numpy()
            qmask = np.isin(ids, self.qids)
            empty = pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
            if not qmask.any() or len(ids) < 2:
                return empty
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in group.column("vec").to_pylist()]
            )
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = vecs[qmask] @ vecs.T
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(ids[qmask]):
                row = sims[qi]
                for j in np.argsort(-row)[: k + 1]:
                    if ids[j] == qid:
                        continue
                    out_q.append(int(qid))
                    out_n.append(int(ids[j]))
                    out_s.append(float(row[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    partial = bucketed.groupby("bucket").map_groups(
        ScoreBucket, batch_format="pyarrow", concurrency=pool_size(0.25)
    )

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.to_pandas().drop_duplicates(["query_id", "neighbor_id"])
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(), pa.int64()),
                "neighbor_id": pa.array(g["neighbor_id"].to_numpy(), pa.int64()),
                "rank": pa.array(g["rank"].to_numpy(), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def embedding_near_dup_pairs(sf_dir: str, *, threshold: float = 0.45):
    """All pairs with cosine >= threshold (embedding near-dup dedup):
    (id_lo, id_hi). Brute-force within-batch vs broadcast full matrix —
    exact at test scale; the LSH-bucketed variant is the scale path."""
    import ray

    ds = _emb(sf_dir)
    ids_all, mats = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        i, m = _to_matrix(b)
        ids_all.append(i)
        mats.append(m)
    all_ids = np.concatenate(ids_all)
    all_mat = np.concatenate(mats, axis=0)
    all_mat = all_mat / np.linalg.norm(all_mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, all_mat))

    class Score:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(batch)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ self.mat.T
            bi, gj = np.nonzero(sims >= threshold)
            a = ids[bi]
            b = self.ids[gj]
            keep = a < b
            return pa.table(
                {
                    "id_lo": pa.array(a[keep], pa.int64()),
                    "id_hi": pa.array(b[keep], pa.int64()),
                }
            )

    return ds.map_batches(
        Score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(0.5),
        batch_size=2048,
    )
