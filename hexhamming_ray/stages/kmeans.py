"""Distributed Lloyd's k-means over the embeddings table — the
engine's iterative-algorithm surface (SURVEY.md §2.5).

The classic broadcast-iterate shape: each round broadcasts the k×dim
centroid matrix ONCE via ``ray.put``, every block computes assignments
and PARTIAL per-cluster (sum, count) vectors (k rows per block, not N),
and only those k×n_blocks partials reach the driver for the update —
the exchange volume per round is O(k · dim · n_blocks), independent of
corpus size. No shuffle at any point; the corpus is re-scanned per
round (at 100 TB, persist the read once as the ER pipeline does with
its checkpoint, or run over the int8-quantized codes).

Determinism: init is the k smallest vec_ids (distributed sort+limit),
block boundaries are deterministic, partials merge in dataset order —
so assignments are bit-reproducible run to run. Ties in the argmin
break to the lowest cluster index.

The reference has no iterative operator (its surface is 5 scalar
functions, python_hexhamming.cc:421-428); this is part of the
beyond-reference training-data toolkit like knn_ivf, whose driver-side
sampled k-means this generalizes to the full corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray.stages.annsearch import _emb, _to_matrix


class _AssignPartial:
    """Per-batch assign + partial (sum, count) per cluster. The
    centroid ref resolves once per task process (zero-copy plasma
    read), not per batch."""

    def __init__(self, cent_ref):
        self.cent_ref = cent_ref
        self._c = None

    def _centroids(self):
        if self._c is None:
            import ray

            c = ray.get(self.cent_ref)
            self._c = (c, 0.5 * (c * c).sum(axis=1))
        return self._c

    def __call__(self, batch: pa.Table) -> pa.Table:
        cent, half_c2 = self._centroids()
        k, dim = cent.shape
        _, mat = _to_matrix(batch)
        if mat.size == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.large_binary()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # argmin ||x-c||^2 == argmin (c^2/2 - x.c); ties -> lowest idx
        a = np.argmin(half_c2[None, :] - mat @ cent.T, axis=1)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, a, mat)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "vsum": pa.array(
                    [sums[i].tobytes() for i in range(k)],
                    pa.large_binary(),
                ),
                "n": pa.array(counts, pa.int64()),
            }
        )


def _init_centroids(ds, k: int) -> np.ndarray:
    rows = ds.sort("vec_id").limit(k).take_all()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def kmeans_embeddings(sf_dir: str, *, k: int = 8, iters: int = 5):
    """Distributed k-means: returns (vec_id, cluster) assignments after
    ``iters`` Lloyd rounds from a deterministic init (the k smallest
    vec_ids). Per round: one broadcast, one streaming pass, k×n_blocks
    partial rows to the driver. Empty clusters keep their previous
    centroid (the standard fix; deterministic)."""
    import ray

    ds = _emb(sf_dir)
    cent = _init_centroids(ds, k)

    for _ in range(iters):
        cref = ray.put(cent)
        partials = ds.map_batches(
            _AssignPartial(cref), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        ).take_all()  # k rows per block — bounded by k * n_blocks
        dim = cent.shape[1]
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in partials:
            c = int(r["cluster"])
            sums[c] += np.frombuffer(r["vsum"], dtype=np.float64)
            counts[c] += int(r["n"])
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / counts[nz, None]

    cref = ray.put(cent)

    class _FinalAssign:
        def __init__(self, ref):
            self.ref = ref
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._c is None:
                c = ray.get(self.ref)
                self._c = (c, 0.5 * (c * c).sum(axis=1))
            cent, half_c2 = self._c
            ids, mat = _to_matrix(batch)
            if mat.size == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                    }
                )
            a = np.argmin(half_c2[None, :] - mat @ cent.T, axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "cluster": pa.array(a.astype(np.int64), pa.int64()),
                }
            )

    out = ds.map_batches(
        _FinalAssign(cref), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )
    # stash the final centroids for callers/tests (self-consistency:
    # every returned assignment is the argmin against THESE centroids)
    out._kmeans_centroids = cent  # noqa: SLF001 — informational attach
    return out
