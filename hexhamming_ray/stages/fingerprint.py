"""Fingerprint stage: content -> (file_id, sha256, simhash, n_tokens).

Stateless ``map_batches`` transform over zero-copy Arrow batches
(SURVEY.md §7 M1). Projects ``content`` away immediately after hashing
so the wide string column never crosses a shuffle boundary (SURVEY.md
§4.2 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hexhamming_ray.functions.hashing import (
    FP_BYTES,
    sha256_view,
    simhash_view,
    stable_id_batch,
    utf8_view,
)

_WS = np.zeros(256, dtype=bool)
_WS[[9, 10, 11, 12, 13, 32]] = True  # ASCII \s


def _token_counts_u8(content: pa.Array) -> np.ndarray:
    """Whitespace-delimited token count per string, computed on the
    string column's ZERO-COPY value buffer (one lookup + one cumsum
    pass). The Arrow regex kernel this replaces ran at ~50 MB/s/core
    and was co-dominant in the fused fingerprint task. Bytes >= 0x80
    (UTF-8 continuations/multibyte) count as non-space — identical to
    ``\\S+`` on ASCII, diverging only on exotic Unicode spaces, which
    this internal metadata column tolerates."""
    n = len(content)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    off = np.frombuffer(content.buffers()[1], dtype=np.int32)[
        content.offset : content.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(content.buffers()[2], dtype=np.uint8)
    lo = off[0]
    tok = ~_WS[data[lo : off[-1]]]
    if tok.shape[0] == 0:
        return np.zeros(n, dtype=np.int32)
    starts = tok.copy()
    starts[1:] &= ~tok[:-1]
    cs = np.zeros(tok.shape[0] + 1, dtype=np.int64)
    np.cumsum(starts, out=cs[1:])
    cnt = cs[off[1:] - lo] - cs[off[:-1] - lo]
    # a doc whose first byte is a token byte preceded by a token byte of
    # the PREVIOUS doc lost its leading run in the transition count
    first = off[:-1] - lo
    valid = off[:-1] < off[1:]  # non-empty docs
    inner = valid & (first > 0)
    fix = np.zeros(n, dtype=np.int64)
    fix[inner] = tok[first[inner]] & tok[first[inner] - 1]
    # the very first doc in the buffer: cumsum counted its leading run
    return (cnt + fix).astype(np.int32)


FINGERPRINT_SCHEMA = pa.schema(
    [
        ("file_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("sha256", pa.string()),
        ("simhash", pa.binary(FP_BYTES)),
        ("n_tokens", pa.int32()),
        ("n_chars", pa.int64()),
    ]
)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """One Arrow batch of files -> fingerprints (content dropped).

    Content is hashed straight from the string column's flattened
    utf-8 buffer (``utf8_view``) — no per-doc ``bytes`` objects are
    ever created; sha256 reads zero-copy memoryview slices of the same
    buffer (VERDICT r03 #4)."""
    content = batch.column("content")
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    n = len(content)
    buf, lens, starts = utf8_view(content)
    fps = simhash_view(buf, lens, starts)
    # contents shorter than one shingle window get a sha256-derived
    # fingerprint instead of the all-zero sentinel: exact-duplicate tiny
    # files then share a fingerprint (and collapse into one identity
    # class in-band), while DISTINCT tiny files land ~128 bits apart —
    # without this, every sub-8-byte file would collide on the sentinel
    mv = memoryview(buf)
    for i in np.flatnonzero(lens < 8).tolist():
        s = int(starts[i])
        fps[i] = np.frombuffer(
            hashlib.sha256(b"tiny|" + bytes(mv[s:s + int(lens[i])])).digest(),
            dtype=np.uint8,
        )
    n_tokens = pa.array(_token_counts_u8(content), pa.int32())
    n_chars = pc.utf8_length(content).cast(pa.int64())
    if "_id" in batch.schema.names:
        file_id = batch.column("_id").cast(pa.int64()).combine_chunks()
    else:
        file_id = pa.array(
            stable_id_batch(
                batch.column("repo").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("commit").to_pylist(),
            )
        )
    return pa.table(
        {
            "file_id": file_id,
            "repo": batch.column("repo"),
            "path": batch.column("path"),
            "commit": batch.column("commit"),
            "lang": batch.column("lang"),
            "sha256": pa.array(sha256_view(buf, lens, starts), type=pa.string()),
            "simhash": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(FP_BYTES), n, [None, pa.py_buffer(fps.tobytes())]
            ),
            "n_tokens": n_tokens,
            "n_chars": n_chars,
        },
        schema=FINGERPRINT_SCHEMA,
    )


def fingerprint_dataset(files_ds, *, batch_size: int = 256):
    """files Dataset -> fingerprints Dataset (stateless task stage)."""
    return files_ds.map_batches(
        fingerprint_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def fingerprint_from_parquet(files_dir: str, *, batch_size: int = 256,
                             hash_shuffle: bool = False):
    """Fused read+fingerprint source: one Ray task per (file, row-group)
    unit reads the parquet slice locally and emits only fingerprints.

    ``read_parquet -> map_batches`` ships every content block through
    the object store between the two operators; at multi-GB corpus
    sizes that plasma traffic became the dominant NON-scaling cost of
    the pipeline (measured: the serial fraction of the ER job grew
    linearly with content size until this fusion). Here the wide
    ``content`` column lives only inside the task — nothing but ~100-
    byte fingerprint rows ever enters the object store. Work units are
    enumerated from parquet footers on the driver (metadata only), so
    parallelism scales with row groups, not files.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq
    import ray

    units = []
    for path in sorted(_glob.glob(_os.path.join(files_dir, "*.parquet"))):
        meta = pq.ParquetFile(path).metadata
        for rg in range(meta.num_row_groups):
            units.append({"path": path, "rg": rg})

    TARGET_BATCH_BYTES = 4 << 20

    def fp_units(batch: pa.Table) -> pa.Table:
        outs = []
        for path, rg in zip(
            batch.column("path").to_pylist(), batch.column("rg").to_pylist()
        ):
            pf = pq.ParquetFile(path)
            # stream the row group in small record batches instead of
            # one monolithic read: a multi-10MB fresh read buffer per
            # task page-faults semi-serially across workers in this
            # environment (same pathology as the hashing scratch).
            # Rows per batch are BYTES-aware (from row-group metadata):
            # a fixed row count turns into huge buffers on big files.
            rg_meta = pf.metadata.row_group(rg)
            avg_row = max(1, rg_meta.total_byte_size // max(1, rg_meta.num_rows))
            rows = int(min(batch_size, max(16, TARGET_BATCH_BYTES // avg_row)))
            for rb in pf.iter_batches(
                batch_size=rows,
                row_groups=[rg],
                columns=["repo", "path", "commit", "lang", "content"],
            ):
                outs.append(fingerprint_batch(pa.Table.from_batches([rb])))
        return pa.concat_tables(outs) if outs else FINGERPRINT_SCHEMA.empty_table()

    from hexhamming_ray import pool_size, tune_data_context

    tune_data_context(hash_shuffle=hash_shuffle)
    # One block per unit up to ~4 tasks/CPU, then units coalesce into
    # multi-row-group tasks. Unbounded 1:1 blocks looked harmless but
    # poisoned the DOWNSTREAM sort: at 3,448 row groups the banding
    # stage inherited 3,448 tiny (~170 KB) blocks and the range
    # exchange went quadratic (see blocking.band_boundaries). Content
    # is streamed inside the task, so a task holding many row groups
    # stays memory-bounded; output blocks are ~100-byte rows either
    # way. ~4 waves balances row-group content skew against the sort
    # exchange's mappers x partitions object count (at 32 tasks/CPU
    # the 288-mapper x 64-partition exchange alone cost seconds of
    # scheduling; content skew amortizes inside multi-row-group tasks).
    n_tasks = min(len(units), pool_size(4.0, lo=16, hi=2048))
    return ray.data.from_items(
        units, override_num_blocks=max(1, n_tasks)
    ).map_batches(fp_units, batch_format="pyarrow", batch_size=1)
