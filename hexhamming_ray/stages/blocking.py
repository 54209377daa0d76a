"""Blocking stages: LSH banding (+ the broadcast hot-key filter kept
for pipelines that want explicit singleton pruning before a groupby).

Scale notes (10^12-file design, SURVEY.md §4.2):

* Banding multiplies rows by ``n_bands`` (default 16 x 16-bit bands over
  the 256-bit simhash). By pigeonhole, any pair with Hamming distance
  < n_bands shares at least one exact band key, so recall is 1.0 for
  ``dist <= n_bands - 1`` candidates. The wide ``content`` column was
  dropped by the fingerprint stage, so banded rows are ~50 bytes.
* Exact duplicates need no separate sha256 collapse shuffle: identical
  contents share a fingerprint and collapse inside the scorer's
  per-band identity classes (0-distance star edges).
* Singleton band keys are skipped vectorized by the sorted-run scorer
  (see stages/scoring.py). ``HotKeyFilter`` remains available for
  pipelines that prune before an explicit groupby: the >=2-member key
  set is broadcast once via ``ray.put`` and applied as a vectorized
  ``np.isin`` filter (swap in a Bloom filter at extreme scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray.functions.kernel import fsb_to_matrix

N_BANDS = 16
BAND_BITS = 16  # 256 / 16


def band_boundaries(num_parts: int, *, n_bands: int = N_BANDS,
                    band_bits: int = BAND_BITS) -> list[int]:
    """Evenly spaced partition boundaries over the combined band-key
    domain ``[0, n_bands << band_bits)`` for ``Dataset.sort(...,
    boundaries=...)``.

    Explicit boundaries FIX the sort's output-partition count. Without
    them Ray Data's range sort uses one output partition PER INPUT
    BLOCK, so the exchange creates mappers x mappers intermediate
    objects — measured here: a 3,448-block banding stage turned a
    10-second sort into a 36-minute driver-bound stall managing ~12M
    object refs (38 GB of driver heap). With P fixed the exchange is
    mappers x P (linear in data) and the sample pass disappears.

    Even spacing is justified because band values are simhash bits
    (hash-like, near-uniform within each band); residual skew from
    dup-heavy keys only shifts load between reduce tasks and is bounded
    by the scorer's flood cap. At cluster scale pick
    ``num_parts ~ 2 x total CPUs``."""
    top = n_bands << band_bits
    step = max(1, top // max(1, num_parts))
    return list(range(step, top, step))[: num_parts - 1]


def sampled_band_boundaries(
    fps, num_parts: int, *, target_sample: int = 200_000
) -> list[int]:
    """Exact band-key quantile boundaries from a deterministic hash
    sample of the fingerprints table.

    Evenly spaced boundaries (``band_boundaries``) assume uniform band
    values, but real band-value distributions skew (planted clone
    clusters, low-entropy content): measured on the 720k-file corpus,
    even spacing gave partition rows p50=143k / max=660k — a 4.6x
    straggler that dominated the 2-wave scoring schedule. Sampling
    ~200k fingerprints (a few MB — the fingerprints table is ~100
    bytes/row and already materialized), banding them locally, and
    taking exact quantiles balances partitions by actual row mass.

    The sample is taken DRIVER-SIDE from the already-materialized
    fingerprints: ``ray.get`` a bounded, evenly spaced subset of block
    refs (~100-byte rows) and band them locally. The previous
    formulation ran a separate 3-operator Dataset execution
    (filter -> make_bands -> iter_batches); its per-operator scheduling
    latency cost 4-10 s of pure SERIAL time per job — the single
    largest non-scaling term left in the ER pipeline after read fusion.
    Fetched bytes stay bounded at any corpus size (<= target_sample
    rows plus one block of slack); block positions are evenly spaced,
    so clone clusters (spread uniformly by construction of the band
    hash) are represented. Heavy single keys collapse duplicate
    quantiles; those are deduped (fewer, wider partitions) — an
    unsplittable key belongs to one range anyway and its in-run flood
    is the scorer cap's job, not the sort's."""
    import numpy as np
    import ray

    n_rows = fps.count()
    if n_rows <= 0:
        return band_boundaries(num_parts)
    refs = fps.select_columns(["file_id", "simhash"]).to_arrow_refs()
    if not refs:
        return band_boundaries(num_parts)
    rows_per_block = max(1, n_rows // len(refs))
    want_blocks = min(len(refs), max(8, -(-target_sample // rows_per_block)))
    idx = np.unique(np.linspace(0, len(refs) - 1, want_blocks).astype(int))
    tables = [t for t in ray.get([refs[i] for i in idx]) if t.num_rows]
    if not tables:
        return band_boundaries(num_parts)
    sample = pa.concat_tables(tables).combine_chunks()
    keys = band_key_matrix(sample.column("simhash")).reshape(-1)
    if keys.size == 0:
        return band_boundaries(num_parts)
    keys = np.sort(keys)
    qs = np.quantile(keys, np.linspace(0.0, 1.0, num_parts + 1)[1:-1],
                     method="nearest").astype(np.int64)
    out = sorted(set(int(q) for q in qs))
    return out or band_boundaries(num_parts)


def band_key_matrix(simhash_col, *, n_bands: int = N_BANDS) -> np.ndarray:
    """FixedSizeBinary simhash column -> (N, n_bands) int64 combined
    band keys ``band_idx * 2^band_bits + band_value``."""
    mat = fsb_to_matrix(simhash_col)  # (N, 32) uint8
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
    return keys


def make_bands(batch: pa.Table, *, n_bands: int = N_BANDS) -> pa.Table:
    """(file_id, simhash) batch -> n_bands rows per input row with an
    int64 combined band key ``band_idx * 2^16 + band_value``."""
    keys = band_key_matrix(batch.column("simhash"), n_bands=n_bands)
    n = keys.shape[0]
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
