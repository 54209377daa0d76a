"""Blocking stages: exact-dup collapse, LSH banding, hot-key pruning.

Scale notes (10^12-file design, SURVEY.md §4.2):

* Exact collapse is ONE hash shuffle on ``sha256``; the wide ``content``
  column was already dropped by the fingerprint stage, so shuffled rows
  are ~120 bytes.
* Banding multiplies rows by ``n_bands`` (default 16 x 16-bit bands over
  the 256-bit simhash). By pigeonhole, any pair with Hamming distance
  < n_bands shares at least one exact band key, so recall is 1.0 for
  ``dist <= n_bands - 1`` candidates.
* Singleton band keys (the overwhelming majority) never reach the
  scorer: a small ``groupby().count()`` pass finds keys with >= 2
  members, which are broadcast once via ``ray.put`` and applied as a
  vectorized ``np.isin`` filter inside ``map_batches``. At extreme
  scale, swap the exact broadcast set for a Bloom filter built the same
  way — the pipeline shape is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray.functions.kernel import fsb_to_matrix

N_BANDS = 16
BAND_BITS = 16  # 256 / 16


def collapse_exact(group: pa.Table) -> pa.Table:
    """Per-sha256 group -> member rows annotated with the group
    representative (min file_id). Runs inside groupby('sha256')."""
    ids = group.column("file_id").to_numpy()
    rep = int(ids.min())
    n = len(group)
    return pa.table(
        {
            "file_id": group.column("file_id"),
            "rep_id": pa.array(np.full(n, rep, dtype=np.int64)),
            "simhash": group.column("simhash"),
            "n_tokens": group.column("n_tokens"),
        }
    )


def exact_collapse(fps_ds):
    """fingerprints -> (reps_ds, dup_edges_ds).

    ``reps``: one row per distinct content (file_id==rep_id), carrying
    the simhash. ``dup_edges``: star edges rep->dup with dist 0 (star,
    not clique: union-find only needs connectivity, so a k-duplicate
    group contributes k-1 edges instead of k(k-1)/2 — SURVEY.md §2.3
    set-ops row).
    """
    collapsed = (
        fps_ds.select_columns(["file_id", "sha256", "simhash", "n_tokens"])
        .groupby("sha256")
        .map_groups(collapse_exact, batch_format="pyarrow")
        .materialize()  # consumed twice: reps branch + dup-edges branch
    )
    reps = collapsed.map_batches(
        _keep_reps, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    dup_edges = collapsed.map_batches(
        _dup_to_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return reps, dup_edges


def _keep_reps(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mask = pc.equal(batch.column("file_id"), batch.column("rep_id"))
    return batch.filter(mask).select(["file_id", "simhash", "n_tokens"])


def _dup_to_edges(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    dup = batch.filter(
        pc.not_equal(batch.column("file_id"), batch.column("rep_id"))
    )
    return pa.table(
        {
            "id_lo": dup.column("rep_id"),
            "id_hi": dup.column("file_id"),
            "dist": pa.array(np.zeros(len(dup), dtype=np.int32)),
        }
    )


def make_bands(batch: pa.Table, *, n_bands: int = N_BANDS) -> pa.Table:
    """(file_id, simhash) batch -> n_bands rows per input row with an
    int64 combined band key ``band_idx * 2^16 + band_value``."""
    mat = fsb_to_matrix(batch.column("simhash"))  # (N, 32) uint8
    n = mat.shape[0]
    width = mat.shape[1] * 8 // n_bands  # bits per band
    bytes_per_band = mat.shape[1] // n_bands
    keys = np.empty((n, n_bands), dtype=np.int64)
    for b in range(n_bands):
        seg = mat[:, b * bytes_per_band : (b + 1) * bytes_per_band].astype(np.int64)
        val = np.zeros(n, dtype=np.int64)
        for c in range(bytes_per_band):
            val = (val << 8) | seg[:, c]
        keys[:, b] = (np.int64(b) << np.int64(width)) | val
    ids = batch.column("file_id").to_numpy()
    out_ids = np.repeat(ids, n_bands)
    out_keys = keys.reshape(-1)
    sim_idx = np.repeat(np.arange(n), n_bands)
    return pa.table(
        {
            "bkey": pa.array(out_keys),
            "file_id": pa.array(out_ids),
            "simhash": batch.column("simhash").take(pa.array(sim_idx)),
        }
    )


class HotKeyFilter:
    """Batch filter keeping only rows whose band key is in the
    broadcast >=2-member key set. Holds only the ObjectRef when
    pickled; ``ray.get`` on the worker resolves to the node-local
    plasma copy zero-copy (broadcast once, never re-shipped per batch).
    Usable as a plain task UDF — no actor pool spin-up needed for a
    stateless vectorized filter."""

    def __init__(self, hot_keys_ref):
        self.ref = hot_keys_ref
        self._keys = None

    @property
    def keys(self):
        if self._keys is None:
            import ray

            self._keys = ray.get(self.ref)  # sorted np.int64 array
        return self._keys

    def __getstate__(self):
        return {"ref": self.ref, "_keys": None}

    def __call__(self, batch: pa.Table) -> pa.Table:
        bk = batch.column("bkey").to_numpy()
        pos = np.searchsorted(self.keys, bk)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        mask = self.keys[pos] == bk if len(self.keys) else np.zeros(len(bk), bool)
        return batch.filter(pa.array(mask))
