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
    bigram_repetition_batch,
)


def _docs(sf_dir: str, columns=None, *, hash_shuffle: bool = False):
    import ray

    from hexhamming_ray import read_num_blocks, tune_data_context

    tune_data_context(hash_shuffle=hash_shuffle)
    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=read_num_blocks(path)
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


def ngram_repetition_docs(sf_dir: str):
    """(doc_id, n_bigrams, n_dup, dup_x1000) — the duplicated-n-gram
    document-quality signal (Gopher repetition rules): per document,
    the total overlapping word-bigram count, the number of bigram
    instances whose bigram occurs >= 2 times in the doc, and the dup
    fraction in exact integer permille (``1000 * n_dup // n_bigrams``
    — integer division on BOTH sides, so no float enters the oracle
    hash). Docs with < 2 tokens have no bigrams and are excluded,
    mirroring the oracle's ``len(t) >= 2`` guard.

    Scale shape: a pure per-batch map over the vectorized polynomial
    window hasher (``bigram_repetition_batch``) — the statistic is
    per-document, so it is exact with ZERO shuffle at any corpus size.
    """

    def f(batch: pa.Table) -> pa.Table:
        nb, nd = bigram_repetition_batch(
            batch.column("text").to_pylist())
        keep = nb > 0
        nb, nd = nb[keep], nd[keep]
        return pa.table(
            {
                "doc_id": pc.array_filter(
                    batch.column("doc_id"), pa.array(keep)),
                "n_bigrams": pa.array(nb),
                "n_dup": pa.array(nd),
                "dup_x1000": pa.array(1000 * nd // nb),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _normalize_text(col):
    """The engine's canonical normalization: Unicode lowercase,
    collapse whitespace runs to one space, strip. Three Arrow kernels,
    no per-row Python. Mirrored by the oracle SQL expression
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')`` —
    change BOTH together (clean_docs + prepare_corpus use this; their
    oracles embed the SQL form)."""
    t = pc.utf8_lower(col)
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim(t, characters=" ")


def _md5_hex(texts: list[str]) -> list[str]:
    """Per-row md5 hex of UTF-8 text (crypto is inherently per-value;
    matches DuckDB md5(varchar)). Shared by exact_dedup /
    prepare_corpus / doc fingerprinting."""
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def clean_docs(sf_dir: str):
    """(doc_id, clean_text, clean_chars) — the canonical text
    normalization stage of a training-data pipeline (see
    ``_normalize_text``); no shuffle, at corpus scale this runs at
    read bandwidth."""

    def f(batch: pa.Table) -> pa.Table:
        t = _normalize_text(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": t,
                "clean_chars": pc.utf8_length(t).cast(pa.int64()),
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
        h = _md5_hex(batch.column("text").to_pylist())
        return pa.table(
            {"h": pa.array(h, type=pa.string()), "doc_id": batch.column("doc_id")}
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    out = ds.groupby("h").aggregate(Min("doc_id"), Count())
    return out.rename_columns(["h", "keep_id", "n_dups"])


def prepare_corpus(sf_dir: str, *, num_partitions: int | None = None):
    """The canonical training-data preparation flow composed as ONE
    streaming pipeline: quality filter -> exact dedup (keep the min
    doc_id per content hash among quality survivors) -> Unicode
    normalization -> token count. (doc_id, lang, clean_text, n_tokens).

    Shape: one fused map computes quality signals, filters, hashes and
    normalizes (all Arrow kernels except the per-row md5 — crypto is
    inherently per-value); ONE keyed exchange on the content hash
    co-locates duplicate groups; a vectorized run-head pass keeps each
    group's first. Nothing materializes; the exchange carries only
    survivors."""
    num_partitions = num_partitions or _default_partitions()

    def prep(batch: pa.Table) -> pa.Table:
        q = T.quality_features(batch.column("text"))
        batch = batch.append_column("n_tokens", q["n_tokens"])
        batch = batch.filter(q["quality_ok"])
        txt = batch.column("text")
        clean = _normalize_text(txt)
        h = _md5_hex(txt.to_pylist())
        return pa.table(
            {
                "h": pa.array(h, pa.string()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang"),
                "clean_text": clean,
                "n_tokens": batch.column("n_tokens").cast(pa.int64()),
            }
        )

    def keep_first(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = ["doc_id", "lang", "clean_text", "n_tokens"]
        if n == 0:
            return batch.select(cols)
        h = np.asarray(batch.column("h").to_pylist())
        ids = batch.column("doc_id").to_numpy()
        order = np.lexsort((ids, h))
        heads = np.empty(n, dtype=bool)
        heads[0] = True
        heads[1:] = h[order][1:] != h[order][:-1]
        return batch.take(pa.array(order[heads])).select(cols)

    return (
        _docs(sf_dir, ["doc_id", "text", "lang"], hash_shuffle=True)
        .map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .repartition(num_blocks=num_partitions, keys=["h"], sort=True)
        .map_batches(
            keep_first, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )


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
        from hexhamming_ray.functions.hashing import simhash_view, utf8_view

        # zero-copy: hash the string column's utf-8 buffer directly
        # (identical bytes to the per-doc encode() this replaces)
        fps = simhash_view(*utf8_view(batch.column("text")))
        allhex = fps.tobytes().hex()  # one hex pass, sliced per doc
        hexes = [allhex[i * 64:(i + 1) * 64] for i in range(fps.shape[0])]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash_hex": pa.array(hexes, type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


NUM_PERM = 64
LSH_BANDS = 16


class _MinhashSig:
    """Task-pool UDF (passed as an instance — it holds no per-worker
    state, so an actor pool would only add process spawn cost):
    (doc_id, sig) minhash signatures per batch.

    Signatures are the fully-vectorized byte-8-gram MinHash
    (``minhash_bytes_batch``): the word-shingle variant costs one
    Python hash call per shingle, which dominated the stage wall time
    at bench scale; the byte-shingle stream reuses the simhash window
    scratch and runs at memory speed."""

    def __init__(self, num_perm: int = NUM_PERM):
        self.num_perm = num_perm

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import minhash_view, utf8_view

        # zero-copy: hash the string column's utf-8 buffer directly
        sigs = minhash_view(
            *utf8_view(batch.column("text")), num_perm=self.num_perm
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "sig": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(self.num_perm * 8),
                    sigs.shape[0],
                    [None, pa.py_buffer(sigs.tobytes())],
                ),
            }
        )


def _sig_matrix(col) -> np.ndarray:
    """FixedSizeBinary signature column -> (N, num_perm) uint64 view."""
    from hexhamming_ray.functions.kernel import fsb_to_matrix

    return fsb_to_matrix(col).view("<u8")


def _band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, sig) -> LSH_BANDS x (bkey, doc_id) rows. The 512-byte
    signature does NOT ride along: the band shuffle carries 16 bytes
    per row and signatures are re-joined only for surviving candidate
    pairs (the candidate set, not the corpus, bounds that join)."""
    sigs = _sig_matrix(batch.column("sig"))
    keys = band_keys_from_minhash(sigs, LSH_BANDS)
    ids = batch.column("doc_id").to_numpy()
    return pa.table(
        {
            "bkey": pa.array(keys.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(ids, LSH_BANDS)),
        }
    )


def _pairs_from_runs(batch: pa.Table) -> pa.Table:
    """Candidate pairs from equal-bkey runs of a hash-partitioned,
    in-block-sorted (bkey) batch. Hash partitioning co-locates every
    key in exactly one block, so there is no boundary pass. Length-2
    runs (the vast majority) are emitted in one vectorized pass;
    longer runs use np.triu_indices per run."""
    n = len(batch)
    empty = pa.table(
        {"id_lo": pa.array([], pa.int64()), "id_hi": pa.array([], pa.int64())}
    )
    if n < 2:
        return empty
    keys = batch.column("bkey").to_numpy()
    ids = batch.column("doc_id").to_numpy()
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    lens = ends - starts
    lo_l, hi_l = [], []
    m2 = lens == 2
    if m2.any():
        s = starts[m2]
        a, b = ids[s], ids[s + 1]
        lo_l.append(np.minimum(a, b))
        hi_l.append(np.maximum(a, b))
    for s, e in zip(starts[lens >= 3], ends[lens >= 3]):
        run = np.unique(ids[s:e])
        ii, jj = np.triu_indices(run.shape[0], k=1)
        lo_l.append(run[ii])
        hi_l.append(run[jj])
    if not lo_l:
        return empty
    return pa.table(
        {
            "id_lo": pa.array(np.concatenate(lo_l), pa.int64()),
            "id_hi": pa.array(np.concatenate(hi_l), pa.int64()),
        }
    )


def _join_col(pairs, table, key: str, out_name: str, value_col: str,
              num_partitions: int):
    """pairs JOIN table(doc_id, value_col) ON pairs[key] == doc_id,
    projecting value_col -> out_name (native hash join; both sides
    shuffle by the join key only)."""
    j = pairs.join(
        table,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key,),
        right_on=("doc_id",),
    )

    def project(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in batch.column_names if c != value_col}
        cols[out_name] = batch.column(value_col)
        return pa.table(cols)

    return j.map_batches(project, batch_format="pyarrow", batch_size=None)


def _default_partitions() -> int:
    """Exchange partition count when the caller doesn't pass one:
    ~cluster CPUs / 4, floor 8. Each hash-shuffle exchange spins
    `num_partitions` aggregator actors; on a small cluster the spin-up
    is a fixed cost per exchange, so fewer/larger partitions win until
    per-partition data no longer fits a worker heap. Callers running at
    corpus scale pass an explicit count sized to the data instead."""
    from hexhamming_ray import pool_size

    return pool_size(0.25, lo=8, hi=64)


def minhash_candidates(sigs, *, num_partitions: int = 16,
                       distinct: bool = True):
    """Candidate pairs (id_lo, id_hi) from LSH banding over a
    (doc_id, sig) signature Dataset: band -> hash-repartition by bkey
    (16-byte rows) -> run pairing. ``distinct=True`` adds the
    cross-band dedup exchange (hash-partition by pair, unique per
    block); ``distinct=False`` returns the raw per-band pairs for
    callers that dedup elsewhere (e.g. the broadcast verify, which
    dedups the driver-bounded pair table in one np.unique)."""
    banded = sigs.map_batches(
        _band_rows, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    cand = banded.repartition(
        num_blocks=num_partitions, keys=["bkey"], sort=True
    ).map_batches(_pairs_from_runs, batch_format="pyarrow",
                  zero_copy_batch=True, batch_size=None)
    if not distinct:
        return cand
    return _distinct_pairs(cand, num_partitions)


def _distinct_pairs(cand, num_partitions: int):
    """Cross-band pair dedup: hash-partition by pair, unique per
    block (hash partitioning co-locates every duplicate)."""

    def _distinct(batch: pa.Table) -> pa.Table:
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table(
            {
                "id_lo": pa.array(u[:, 0], pa.int64()),
                "id_hi": pa.array(u[:, 1], pa.int64()),
            }
        )

    return cand.repartition(
        num_blocks=num_partitions, keys=["id_lo", "id_hi"], sort=True
    ).map_batches(_distinct, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)


# Pair-count ceiling for the broadcast verify regime: 250k pairs is
# ~4 MB of pair rows on the driver and <= 500k candidate signatures
# (~260 MB) in ONE ray.put — comfortably object-store-resident. Above
# the cap the shuffle path (distinct exchange + two candidate-bounded
# hash joins) handles any scale.
BROADCAST_PAIR_CAP = 250_000


def _gather_table(ds, schema: pa.Schema) -> pa.Table:
    """Concat a (small, bounded) materialized Dataset's blocks on the
    driver. Empty blocks can carry a BARE schema (no columns) — Ray
    emits them when an upstream block is empty — and pa.concat_tables
    rejects the mix, so drop 0-row blocks and fall back to the known
    schema when everything is empty (same pitfall as
    er.py build_clusters' label gather)."""
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else schema.empty_table()


class _BroadcastSemiFilter:
    """Task-pool UDF instance: keep rows whose ``id_col`` is in the
    broadcast id set. The Arrow value_set is built lazily ONCE per
    instance deserialization (the _BruteScore / _NationRegionLookup
    pattern) — ray.get of the numpy ids is zero-copy from the local
    object store."""

    def __init__(self, ids_ref, id_col: str):
        self.ids_ref = ids_ref
        self.id_col = id_col
        self._vs = None

    def _value_set(self):
        if self._vs is None:
            import ray

            self._vs = pa.array(ray.get(self.ids_ref), pa.int64())
        return self._vs

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = pc.is_in(
            batch.column(self.id_col).cast(pa.int64()),
            value_set=self._value_set(),
        )
        return batch.filter(m)


class _SigPairVerify:
    """Task-pool UDF instance: estimated-Jaccard verify of (id_lo,
    id_hi) pairs against a broadcast (sorted ids, signature matrix)
    lookup — both numpy, so ray.get is zero-copy; cached per
    instance."""

    def __init__(self, lut_ref, threshold: float):
        self.lut_ref = lut_ref
        self.threshold = threshold
        self._lut = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._lut is None:
            import ray

            self._lut = ray.get(self.lut_ref)
        from hexhamming_ray.pipelines.relational import _lut_probe

        sid_, mat_ = self._lut
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        # _lut_probe invariant (clamped + membership-checked): every
        # candidate id has a signature row by construction
        plo, hlo = _lut_probe(sid_, lo)
        phi, hhi = _lut_probe(sid_, hi)
        assert hlo.all() and hhi.all(), "candidate id missing from sig lut"
        agree = (mat_[plo] == mat_[phi]).mean(axis=1)
        keep = agree >= self.threshold
        return pa.table(
            {
                "id_lo": batch.column("id_lo").filter(pa.array(keep)),
                "id_hi": batch.column("id_hi").filter(pa.array(keep)),
                "sim_x1000": pa.array(
                    np.rint(agree[keep] * 1000).astype(np.int64), pa.int64()
                ),
            }
        )


def _verify_pairs_broadcast(raw_pairs, sigs, threshold: float):
    """Small-candidate-regime verify (the broadcast-small-side rule
    applied to the signature re-join): the raw per-band pair table is
    driver-bounded (caller checked ``count() <= BROADCAST_PAIR_CAP``;
    16-byte rows), so cross-band dedup is one ``np.unique`` on the
    driver; the candidate signatures are gathered via a distributed
    semi-filter of the materialized signature table (candidate-bounded
    — the corpus never reaches the driver), broadcast once with
    ``ray.put``, and ONE vectorized map_batches verifies. Deletes all
    three post-band exchanges (pair distinct + two hash joins) that
    the scale path needs."""
    import ray

    tbl = _gather_table(
        raw_pairs,
        pa.schema([("id_lo", pa.int64()), ("id_hi", pa.int64())]),
    )
    if len(tbl) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_lo": pa.array([], pa.int64()),
                    "id_hi": pa.array([], pa.int64()),
                    "sim_x1000": pa.array([], pa.int64()),
                }
            )
        )
    pairs = np.unique(
        np.stack(
            [tbl.column("id_lo").to_numpy(), tbl.column("id_hi").to_numpy()],
            axis=1,
        ),
        axis=0,
    )
    ids_ref = ray.put(np.unique(pairs))

    cand_sigs = sigs.map_batches(
        _BroadcastSemiFilter(ids_ref, "doc_id"), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    ).materialize()
    st = _gather_table(
        cand_sigs,
        pa.schema(
            [("doc_id", pa.int64()),
             ("sig", pa.binary(NUM_PERM * 8))]
        ),
    )
    sid = st.column("doc_id").to_numpy()
    order = np.argsort(sid)
    lut_ref = ray.put((sid[order], _sig_matrix(st.column("sig"))[order].copy()))

    pairs_ds = ray.data.from_arrow(
        pa.table(
            {
                "id_lo": pa.array(pairs[:, 0], pa.int64()),
                "id_hi": pa.array(pairs[:, 1], pa.int64()),
            }
        )
    )
    return pairs_ds.map_batches(
        _SigPairVerify(lut_ref, threshold), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


def minhash_dup_pairs(sf_dir: str, *, threshold: float = 0.5,
                      num_partitions: int | None = None,
                      checkpoint_dir: str | None = None):
    """Near-duplicate pairs via MinHash-LSH banding:
    signature -> (bkey, doc_id) band shuffle -> run pairing ->
    distinct -> re-join signatures -> vectorized estimated-Jaccard
    verify. (id_lo, id_hi, sim_x1000 >= threshold*1000).

    Scale shape: the band shuffle moves 16 bytes/doc/band (not the
    512-byte signature x 16); signatures are joined back only for the
    candidate pairs, so both joins are candidate-bounded.

    Execution shape: each all-to-all stage (band repartition, pair
    distinct, the two hash joins) is materialized before the next
    starts. Fused, the streaming executor spins EVERY exchange's
    aggregator pool concurrently (2 joins + 2 keyed repartitions +
    the signature actor pool > cluster CPUs) and the pools starve
    each other — measured 78 s fused vs 13 s staged at sf0.1/32 CPUs
    (ENGINEERING_NOTES item 27). The intermediates are candidate-
    bounded (16-byte pair rows; pair+sig rows), object-store-resident
    and spillable — the corpus itself is never materialized.

    Join strategy is SIZE-SWITCHED on the measured candidate count
    (the broadcast-join-vs-shuffle-join rule every distributed engine
    applies): under ``BROADCAST_PAIR_CAP`` raw pairs, the dedup + both
    signature re-joins collapse into one broadcast lookup
    (``_verify_pairs_broadcast``); above it, the exchange path below
    runs at any scale.

    ``checkpoint_dir``: the signature table is CORPUS-sized and
    consumed twice (banding + candidate re-join). By default it is
    pinned in the object store (spillable); pass a directory to write
    it once as partitioned Parquet with a lineage manifest instead —
    both consumers then stream from disk, a killed run resumes past
    the (expensive) signature pass, and nothing corpus-sized stays
    plasma-resident (VERDICT r02 next-step #8, mirroring the ER
    Checkpointer)."""
    from hexhamming_ray.state.checkpoint import Checkpointer

    num_partitions = num_partitions or _default_partitions()

    def build_sigs():
        return _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True).map_batches(
            _MinhashSig(),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )

    # Checkpointer(None).stage == .materialize(): the default behavior
    # is unchanged; with a root it becomes write-once + re-read
    sigs = Checkpointer(checkpoint_dir).stage("minhash_sigs", build_sigs)
    raw = minhash_candidates(
        sigs, num_partitions=num_partitions, distinct=False
    ).materialize()
    if raw.count() <= BROADCAST_PAIR_CAP:
        return _verify_pairs_broadcast(raw, sigs, threshold)

    cand = _distinct_pairs(raw, num_partitions).materialize()
    j = _join_col(cand, sigs, "id_lo", "sig_lo", "sig",
                  num_partitions).materialize()
    j = _join_col(j, sigs, "id_hi", "sig_hi", "sig", num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        a = _sig_matrix(batch.column("sig_lo"))
        b = _sig_matrix(batch.column("sig_hi"))
        agree = (a == b).mean(axis=1)
        keep = agree >= threshold
        return pa.table(
            {
                "id_lo": batch.column("id_lo").filter(pa.array(keep)),
                "id_hi": batch.column("id_hi").filter(pa.array(keep)),
                "sim_x1000": pa.array(
                    np.rint(agree[keep] * 1000).astype(np.int64), pa.int64()
                ),
            }
        )

    return j.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _adapt_docs_to_files(batch: pa.Table) -> pa.Table:
    """documents row -> files-schema row (the ER pipeline's input
    contract); shared by every ER-over-documents query."""
    ids = batch.column("doc_id").cast(pa.int64())
    n = len(batch)
    # path derived vectorized (Arrow kernel, no per-row f-string);
    # commit is a repeated-constant column (list-multiply shares one
    # str object — no per-row formatting)
    path = pc.binary_join_element_wise(
        pa.scalar("doc"), pc.cast(ids, pa.string()), "/"
    )
    return pa.table(
        {
            "_id": ids,  # fingerprint stage uses this as file_id
            "repo": batch.column("source").cast(pa.string()),
            "path": path,
            "commit": pa.array(["0" * 40] * n, pa.string()),
            "lang": batch.column("lang").cast(pa.string()),
            "content": batch.column("text").cast(pa.string()),
        }
    )


#: exactly the documents columns the files-schema adapter consumes —
#: pass to ``_docs`` so the flagship reads stay pruned at the source
_ADAPT_COLUMNS = ["doc_id", "source", "lang", "text"]


def er_clusters_docs(sf_dir: str, *, threshold: int = 20):
    """Full ER pipeline over documents-as-corpus: (doc_id, cluster_id).
    Adapts documents to the files schema, then runs the flagship
    blocking + scoring + union-find pipeline."""
    from hexhamming_ray.pipelines.er import build_clusters, build_edges

    files = _docs(sf_dir, _ADAPT_COLUMNS).map_batches(
        _adapt_docs_to_files, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
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


def er_incremental(sf_dir: str):
    """Incremental ER demo over the documents corpus: 70% of the docs
    are clustered and checkpointed, then the remaining 30% are merged
    in via ``update_clusters`` — fingerprint(new) + banding over new ∪
    old fingerprints + scoring of new-containing runs only. Returns
    the merged (doc_id, cluster_id); IDENTICAL to a from-scratch run
    by construction (pinned in tests/test_er_pipeline.py)."""
    import tempfile

    from hexhamming_ray.pipelines.er import build_edges, update_clusters
    from hexhamming_ray.state.checkpoint import Checkpointer

    files = _docs(sf_dir, _ADAPT_COLUMNS).map_batches(
        _adapt_docs_to_files, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)

    def split(new_side: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("_id").to_numpy()
            return batch.filter(pa.array((ids % 10 < 3) == new_side))

        return f

    old = files.map_batches(
        split(False), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    new = files.map_batches(
        split(True), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)

    ckpt = tempfile.mkdtemp(prefix="hexray_er_incr_")
    try:
        # update_clusters needs only the fingerprints + edges stages of
        # the checkpoint — clustering the old 70% here would be wasted
        # work (the merged CC below covers everything)
        ck = Checkpointer(ckpt)
        build_edges(old, checkpointer=ck)
        # update_clusters materializes the merged clusters, so the
        # scratch checkpoint can be dropped immediately
        clusters = update_clusters(ckpt, new)
    finally:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("file_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
            }
        )

    return clusters.map_batches(finish, batch_format="pyarrow", batch_size=None)


def er_exact_clusters(sf_dir: str):
    """Exact-duplicate clusters via the FULL ER machinery (banding ->
    scoring -> distributed union-find) with a cryptographic-identity
    fingerprint: each document's 'simhash' is its sha256 digest, so
    dist == 0 iff contents are byte-identical and threshold=0 yields
    exactly the text-equality partition. (doc_id, cluster_id) with
    cluster_id = MIN(doc_id) of the equality class — SQL-oracle-able
    (min over a window partitioned by content hash), giving the
    flagship blocking/scoring/union-find path a value-level oracle."""
    from hexhamming_ray.pipelines.er import build_clusters, build_edges_from_fps

    def fp(batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import utf8_view

        # hash zero-copy memoryview slices of the Arrow value buffer
        # (the string column's data buffer IS the utf-8 stream
        # encode() would produce) — same digests as the old
        # per-doc `sha256(t.encode())`, no Python string objects
        buf, lens, starts = utf8_view(batch.column("text"))
        mv = memoryview(buf)
        digests = [
            hashlib.sha256(mv[s:s + l]).digest()
            for s, l in zip(starts.tolist(), lens.tolist())
        ]
        return pa.table(
            {
                "file_id": batch.column("doc_id").cast(pa.int64()),
                "simhash": pa.array(digests, pa.binary(32)),
            }
        )

    fps = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    fps, edges = build_edges_from_fps(fps, threshold=0)
    clusters = build_clusters(fps, edges)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("file_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
            }
        )

    return clusters.map_batches(finish, batch_format="pyarrow", batch_size=None)


def doc_sample(sf_dir: str, *, fraction_hex: str = "1999"):
    """Deterministic hash-based sample (the scalable eval-set builder:
    membership is a pure function of doc_id, so the same rows are
    sampled on every run, on any cluster, resumable for free):
    keep rows where the first 4 hex chars of md5(str(doc_id)) <
    ``fraction_hex`` (default 0x1999/0x10000 ~ 10%). (doc_id, n_chars)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = np.fromiter(
            (
                hashlib.md5(str(int(i)).encode()).hexdigest()[:4] < fraction_hex
                for i in ids
            ),
            dtype=bool,
            count=len(ids),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_chars": batch.column("n_chars").filter(pa.array(keep)),
            }
        )

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def random_sample_docs(sf_dir: str, *, fraction: float = 0.1,
                       seed: int = 42):
    """Seeded uniform row sample via the native ``Dataset.random_sample``
    (SURVEY.md §2.3 sampling row). Row membership depends on block
    layout, so this is the quick-subset tool; ``doc_sample`` is the
    reproducible-across-clusters eval-set builder."""
    return _docs(sf_dir, ["doc_id", "n_chars"]).random_sample(
        fraction, seed=seed
    )


def _shingle_hashes(text: str) -> np.ndarray:
    """Sorted unique 64-bit hashes of a document's token-3-gram shingle
    set — single-doc wrapper over the vectorized
    :func:`~hexhamming_ray.functions.hashing.shingle_hashes_batch`
    (deterministic across workers: pure arithmetic, fixed constants).
    Documents with < 3 tokens contribute their joined-token string as
    the single shingle; empty documents contribute none — the round-1
    frozenset semantics. Batch call sites use the batch function
    directly (VERDICT r02 #3: the per-gram blake2b loop was the hot
    inner loop of both ngram pipelines; the vectorized polynomial
    window hash measures 6.3x faster on the sf0.1 corpus)."""
    from hexhamming_ray.functions.hashing import shingle_hashes_batch

    values, _ = shingle_hashes_batch([text])
    return values


def _shingle_blob_array(values: np.ndarray, counts: np.ndarray) -> pa.Array:
    """Zero-copy ``large_binary`` column of per-doc shingle-hash blobs:
    doc i's blob is its sorted-unique uint64 hashes as raw LE bytes.
    Built straight from (values, counts) offsets — no per-doc
    ``tobytes`` loop."""
    off = np.empty(counts.shape[0] + 1, dtype=np.int64)
    off[0] = 0
    np.cumsum(counts, out=off[1:])
    off *= 8
    return pa.Array.from_buffers(
        pa.large_binary(),
        counts.shape[0],
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(values.tobytes())],
    )


def _shingle_table(sf_dir: str):
    """(doc_id, sh: binary) shingle-hash table; ``sh`` is the sorted
    unique uint64 hash array serialized as raw little-endian bytes
    (Acero hash joins don't accept list<> payload columns — a binary
    blob carries the same data through the join)."""

    def f(batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import shingle_hashes_batch

        values, counts = shingle_hashes_batch(
            batch.column("text").to_pylist()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "sh": _shingle_blob_array(values, counts),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# Lower cap than BROADCAST_PAIR_CAP: the broadcast payload here is
# per-doc shingle-hash blobs (~8 KB for a 1k-shingle doc), so 20k
# pairs bounds the one-shot ray.put at ~40k docs x blob (~320 MB worst
# case). Above the cap the join path is candidate-bounded at any scale.
NGRAM_BROADCAST_CAP = 20_000


def _ngram_verify_broadcast(sf_dir: str, cands, threshold: float,
                            *, floor_round: bool = False):
    """Small-candidate-regime exact-Jaccard verify: the candidate pair
    table is driver-bounded (caller checked the cap), so only the
    candidate DOCUMENTS are shingled — a semi-filter by broadcast id
    set runs at the read, the corpus-wide shingle pass never happens —
    and their blobs are gathered (candidate-bounded), broadcast once,
    and looked up in ONE verify map over the pairs. Zero all-to-all
    exchanges after LSH."""
    import ray

    tbl = _gather_table(
        cands,
        pa.schema([("id_lo", pa.int64()), ("id_hi", pa.int64())]),
    )
    if len(tbl) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_lo": pa.array([], pa.int64()),
                    "id_hi": pa.array([], pa.int64()),
                    "jaccard_x1000": pa.array([], pa.int64()),
                }
            )
        )
    lo = tbl.column("id_lo").to_numpy()
    hi = tbl.column("id_hi").to_numpy()
    ids_ref = ray.put(np.unique(np.concatenate([lo, hi])))

    def shingle_cand(batch: pa.Table) -> pa.Table:
        # semi-filter + shingle fused so non-candidate text is dropped
        # before the shingling pass
        from hexhamming_ray.functions.hashing import shingle_hashes_batch

        values, counts = shingle_hashes_batch(
            batch.column("text").to_pylist()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "sh": _shingle_blob_array(values, counts),
            }
        )

    sh = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            _BroadcastSemiFilter(ids_ref, "doc_id"), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
        .map_batches(
            shingle_cand, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .materialize()
    )
    st = _gather_table(
        sh,
        pa.schema([("doc_id", pa.int64()), ("sh", pa.large_binary())]),
    )
    # flat-array lut (sorted ids, element offsets, one concatenated
    # uint64 shingle stream): every piece is numpy, so workers ray.get
    # it ZERO-COPY — a dict of bytes would deserialize per task
    sid = st.column("doc_id").to_numpy()
    order = np.argsort(sid)
    # loop-free gather: the large_binary column's value buffer already
    # IS the concatenated uint64 stream; reorder the per-doc runs into
    # id-sorted order with one vectorized run-gather (repeat + cumsum)
    # instead of per-row frombuffer + concatenate
    from hexhamming_ray.functions.hashing import utf8_view

    buf, blens, bstarts = utf8_view(st.column("sh"))
    data_u64 = buf.view(np.uint64) if buf.size else np.empty(0, np.uint64)
    lens = (blens // 8)[order]
    starts_e = (bstarts // 8)[order]
    offsets = np.r_[np.int64(0), np.cumsum(lens)]
    tot = int(offsets[-1])
    if tot:
        idx = np.repeat(starts_e - offsets[:-1], lens) + np.arange(
            tot, dtype=np.int64
        )
        flat = data_u64[idx]
    else:
        flat = np.empty(0, dtype=np.uint64)
    lut_ref = ray.put((sid[order], offsets, flat))

    pairs_ds = ray.data.from_arrow(
        pa.table(
            {"id_lo": pa.array(lo, pa.int64()), "id_hi": pa.array(hi, pa.int64())}
        )
    )
    return pairs_ds.map_batches(
        _ShinglePairVerify(lut_ref, threshold, floor_round=floor_round),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


class _ShinglePairVerify:
    """Task-pool UDF instance: exact set-Jaccard verify of candidate
    pairs against the broadcast flat shingle lut (sorted ids, offsets,
    concatenated uint64 stream) — zero-copy ray.get, cached per
    instance; the per-CANDIDATE loop is bounded by the broadcast cap
    and each intersection is numpy."""

    def __init__(self, lut_ref, threshold: float, *,
                 floor_round: bool = False):
        self.lut_ref = lut_ref
        self.threshold = threshold
        # floor matches the SQL FLOOR(1000*j) oracle convention used by
        # the exact queries; the default rint matches ngram_jaccard_pairs
        self.floor_round = floor_round
        self._lut = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._lut is None:
            import ray

            self._lut = ray.get(self.lut_ref)
        from hexhamming_ray.pipelines.relational import _lut_probe

        sid, off, flat = self._lut
        blo = batch.column("id_lo").to_numpy()
        bhi = batch.column("id_hi").to_numpy()
        # _lut_probe invariant: every candidate id was shingled
        ilo, hlo = _lut_probe(sid, blo)
        ihi, hhi = _lut_probe(sid, bhi)
        assert hlo.all() and hhi.all(), "candidate id missing from shingle lut"
        n = len(blo)
        jac = np.zeros(n)
        for i in range(n):
            sa = flat[off[ilo[i]]:off[ilo[i] + 1]]
            sb = flat[off[ihi[i]]:off[ihi[i] + 1]]
            if sa.shape[0] == 0 or sb.shape[0] == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
            jac[i] = inter / (sa.shape[0] + sb.shape[0] - inter)
        keep = jac >= self.threshold
        rounded = (
            np.floor(jac[keep] * 1000)
            if self.floor_round
            else np.rint(jac[keep] * 1000)
        )
        return pa.table(
            {
                "id_lo": batch.column("id_lo").filter(pa.array(keep)),
                "id_hi": batch.column("id_hi").filter(pa.array(keep)),
                "jaccard_x1000": pa.array(
                    rounded.astype(np.int64), pa.int64()
                ),
            }
        )


def _binary_u64_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 values, per-row element counts) over a binary
    column whose every value is a packed uint64 array — zero-copy when
    the data buffer segment is 8-aligned, one bytes copy otherwise.
    The binary twin of ``hashing.utf8_view``; handles chunked and
    sliced layouts. Rows must be non-null (inner-join outputs)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    vals, lens = [], []
    for ch in chunks:
        if len(ch) == 0:
            continue
        assert ch.null_count == 0, "binary u64 view: nulls unsupported"
        width = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        offs = np.frombuffer(ch.buffers()[1], width)[
            ch.offset: ch.offset + len(ch) + 1
        ].astype(np.int64)
        data = np.frombuffer(ch.buffers()[2], np.uint8)
        seg = data[offs[0]: offs[-1]]
        if seg.nbytes % 8 == 0 and seg.ctypes.data % 8 == 0:
            u64 = seg.view(np.uint64)
        else:  # unaligned slice: one copy restores alignment
            u64 = np.frombuffer(seg.tobytes(), np.uint64)
        vals.append(u64)
        lens.append(np.diff(offs) // 8)
    if not vals:
        return (np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.int64))
    return np.concatenate(vals), np.concatenate(lens)


def ngram_jaccard_pairs(sf_dir: str, *, threshold: float = 0.5,
                        num_partitions: int | None = None,
                        checkpoint_dir: str | None = None):
    """Near-dup pairs with EXACT token-3-gram Jaccard >= threshold:
    MinHash-LSH proposes candidates (cheap, approximate), then the
    exact set Jaccard verifies — the estimate filters, the exact value
    decides. (id_lo, id_hi, jaccard_x1000).

    Scale shape: the candidate pairs are hash-JOINED back to the
    per-doc shingle-hash table on doc_id (twice: lo side, hi side) —
    the candidate set, not the corpus, bounds every post-LSH stage.
    Nothing corpus-sized ever reaches the driver. Exchanges are
    staged (materialized) for the same pool-starvation reason as
    ``minhash_dup_pairs``.

    Size-switched (like ``minhash_dup_pairs``): under
    ``NGRAM_BROADCAST_CAP`` candidate pairs, only the CANDIDATE
    documents are shingled (semi-filter at the read by broadcast id
    set — the corpus-wide shingle pass and both join exchanges
    disappear) and one broadcast-lookup map verifies.

    ``checkpoint_dir``: above the cap the per-doc shingle table is
    CORPUS-sized and consumed twice (lo join, hi join). By default it
    is pinned in the object store (spillable); pass a directory to
    write it once as partitioned Parquet with a lineage manifest —
    both joins then stream from disk, a killed run resumes past the
    shingling pass, and nothing corpus-sized stays plasma-resident
    (the exact treatment ``minhash_dup_pairs`` gives its signature
    table; VERDICT r03 next-step #2)."""
    from hexhamming_ray.state.checkpoint import Checkpointer

    num_partitions = num_partitions or _default_partitions()
    cands = minhash_dup_pairs(
        sf_dir, threshold=0.3, checkpoint_dir=checkpoint_dir
    ).select_columns(["id_lo", "id_hi"]).materialize()
    if cands.count() <= NGRAM_BROADCAST_CAP:
        return _ngram_verify_broadcast(sf_dir, cands, threshold)
    return _ngram_verify_join(sf_dir, cands, threshold, num_partitions,
                              checkpoint_dir)


def _ngram_verify_join(sf_dir: str, cands, threshold: float,
                       num_partitions: int,
                       checkpoint_dir: str | None = None,
                       *, floor_round: bool = False):
    """Above-cap exact-Jaccard verify: candidate pairs hash-join back
    to the per-doc shingle table (lo side, hi side) and one loop-free
    lexsort pass computes every intersection. Shared by
    ``ngram_jaccard_pairs`` (rint convention) and
    ``ngram_jaccard_prefix`` (floor — the SQL oracle convention)."""
    from hexhamming_ray.state.checkpoint import Checkpointer

    sh = Checkpointer(checkpoint_dir).stage(
        "ngram_shingles", lambda: _shingle_table(sf_dir)
    )
    j = _join_col(cands, sh, "id_lo", "sh_lo", "sh",
                  num_partitions).materialize()
    j = _join_col(j, sh, "id_hi", "sh_hi", "sh", num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        # loop-free exact Jaccard over ALL candidate pairs at once
        # (VERDICT r03 nit #5): view both binary set columns as flat
        # uint64 arrays + run lengths, tag every value with its pair
        # ordinal, and ONE lexsort finds the intersections — a value
        # common to a pair's two sides (each side is a unique set)
        # appears exactly twice adjacently under (pid, val) order.
        n = len(batch)
        lo_vals, lo_lens = _binary_u64_view(batch.column("sh_lo"))
        hi_vals, hi_lens = _binary_u64_view(batch.column("sh_hi"))
        pid = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int64), lo_lens),
                np.repeat(np.arange(n, dtype=np.int64), hi_lens),
            ]
        )
        val = np.concatenate([lo_vals, hi_vals])
        order = np.lexsort((val, pid))
        p, v = pid[order], val[order]
        dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(p[1:][dup], minlength=n).astype(np.int64)
        union = lo_lens + hi_lens - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        x1000 = (
            np.floor(jac[keep] * 1000)
            if floor_round
            else np.rint(jac[keep] * 1000)
        ).astype(np.int64)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").filter(pa.array(keep)),
                "id_hi": batch.column("id_hi").filter(pa.array(keep)),
                "jaccard_x1000": pa.array(x1000, pa.int64()),
            }
        )

    return j.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _sum_runs(key_cols, val_col, out_col):
    """Keyed-repartition finalizer: one vectorized reduceat per
    sorted block (replaces a full groupby aggregate — same
    exchange, no aggregator-per-group machinery). Shared by
    ngram_jaccard_exact and token_cosine_pairs."""

    def agg(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {**{k: pa.array([], pa.int64()) for k in key_cols},
                 out_col: pa.array([], pa.int64())}
            )
        keys = [batch.column(k).to_numpy() for k in key_cols]
        order = np.lexsort(tuple(reversed(keys)))
        keys = [k[order] for k in keys]
        vals = batch.column(val_col).to_numpy()[order]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for k in keys:
            new[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {**{kc: pa.array(k[starts], pa.int64())
                for kc, k in zip(key_cols, keys)},
             out_col: pa.array(
                 np.add.reduceat(vals, starts), pa.int64())}
        )

    return agg


def _jaccard_keep(c, na, nb, threshold):
    """Shared Jaccard finalize for both ngram_jaccard_exact plans:
    jac = |inter| / |union|, floored to x1000 — ONE place, so the
    broadcast and join paths cannot drift."""
    jac = c / (na + nb - c)
    keep = jac >= threshold
    return np.floor(jac[keep] * 1000).astype(np.int64), keep


def ngram_jaccard_exact(sf_dir: str, *, threshold: float = 0.5,
                        df_cap: int = 64,
                        num_partitions: int | None = None,
                        _score_fn=None,
                        _score_col: str = "jaccard_x1000"):
    """EXACT all-pairs token-3-gram Jaccard >= threshold over the
    DF-capped shingle space: shingles occurring in more than ``df_cap``
    documents are dropped from every set (stop-shingle removal — the
    standard skew guard: a boilerplate shingle shared by k docs would
    otherwise emit k^2/2 co-occurrence rows), and Jaccard is computed
    over the surviving sets. Deterministic and SQL-expressible, so this
    query carries a full value-level DuckDB oracle, unlike the
    LSH-candidate variants. (id_lo, id_hi, jaccard_x1000 floored).

    Shape: explode (shingle, doc_id) -> ONE hash-repartition by shingle
    -> per-run DF filter emitting pair rows AND sentinel-tagged
    kept-size rows from the SAME pass (pairs bounded df_cap^2/2 per
    shingle; both kinds partial-combined inside the emitting block) ->
    ONE keyed exchange summing both kinds -> materialize only the
    SMALL summed table -> join per-doc kept sizes (lo, hi) ->
    vectorized Jaccard. The corpus x shingles explode streams through
    exactly one exchange and is never materialized. All-to-alls: the
    shingle repartition, the pair/size repartition (reduceat
    finalizers), two candidate-bounded joins.

    ``_score_fn(c, na, nb) -> (x1000 ints, keep mask)`` /
    ``_score_col`` swap the set-overlap measure in BOTH finalize plans
    (default: Jaccard at ``threshold``) — the containment variant
    rides the identical machinery."""
    num_partitions = num_partitions or _default_partitions()
    if _score_fn is None:
        def _score_fn(c, na, nb):
            return _jaccard_keep(c, na, nb, threshold)

    def explode(batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import shingle_hashes_batch

        ids = batch.column("doc_id").to_numpy()
        values, counts = shingle_hashes_batch(
            batch.column("text").to_pylist()
        )
        return pa.table(
            {
                "s": pa.array(values.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            }
        )

    sh = _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def df_filter_and_pairs(batch: pa.Table) -> pa.Table:
        """One hash-partitioned, in-block-sorted (s) block: drop runs
        longer than df_cap, emit each run's doc pairs PRE-COUNTED
        (partial combine: the block's duplicate pairs collapse to one
        (id_lo, id_hi, c) row before the exchange)."""
        n = len(batch)
        empty = pa.table(
            {
                "id_lo": pa.array([], pa.int64()),
                "id_hi": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        keys = batch.column("s").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        lens = ends - starts
        lo_l, hi_l = [], []
        m2 = lens == 2
        if m2.any():
            s0 = starts[m2]
            a, b = ids[s0], ids[s0 + 1]
            lo_l.append(np.minimum(a, b))
            hi_l.append(np.maximum(a, b))
        for s0, e0 in zip(starts[(lens >= 3) & (lens <= df_cap)],
                          ends[(lens >= 3) & (lens <= df_cap)]):
            run = np.sort(ids[s0:e0])
            ii, jj = np.triu_indices(run.shape[0], k=1)
            lo_l.append(run[ii])
            hi_l.append(run[jj])
        if not lo_l:
            return empty
        pair = np.stack(
            [np.concatenate(lo_l), np.concatenate(hi_l)], axis=1
        )
        uniq, cnt = np.unique(pair, axis=0, return_counts=True)
        return pa.table(
            {
                "id_lo": pa.array(uniq[:, 0], pa.int64()),
                "id_hi": pa.array(uniq[:, 1], pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    def kept_sizes_rows(batch: pa.Table) -> pa.Table:
        """Per block: (doc_id, n_kept_partial) — shingle rows surviving
        the DF cap, pre-aggregated per doc inside the block (partial
        combine before the groupby)."""
        n = len(batch)
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_partial": pa.array([], pa.int64())}
            )
        keys = batch.column("s").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        lens = ends - starts
        keep_run = lens <= df_cap
        keep_mask = np.repeat(keep_run, lens)
        kept_ids = ids[keep_mask]
        uniq, cnt = np.unique(kept_ids, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_partial": pa.array(cnt, pa.int64()),
            }
        )

    def df_filter_pairs_and_sizes(batch: pa.Table) -> pa.Table:
        """ONE pass over each s-partitioned block emitting BOTH row
        kinds into one tagged stream (VERDICT r02 #2: the exploded
        corpus x shingles table used to be materialized and consumed
        twice — pair emission and kept sizes; now it streams through
        the s-exchange exactly once and is never object-store-pinned).
        Size rows are tagged with the sentinel ``id_hi == -1`` (doc_ids
        are non-negative): (doc_id, -1, n_partial)."""
        pairs_t = df_filter_and_pairs(batch)
        sizes_t = kept_sizes_rows(batch)
        size_rows = pa.table(
            {
                "id_lo": sizes_t.column("doc_id"),
                "id_hi": pa.array(
                    np.full(len(sizes_t), -1, dtype=np.int64), pa.int64()
                ),
                "c": sizes_t.column("n_partial"),
            }
        )
        return pa.concat_tables([pairs_t, size_rows])

    # shingle explode -> ONE s-exchange -> tagged pair/size emission ->
    # ONE (id_lo, id_hi) exchange summing both row kinds (size rows
    # group on (doc_id, -1), pair rows on the pair) -> materialize the
    # SMALL summed table (candidate pairs + one row per doc) for its
    # two consumers. The corpus x shingles intermediate streams with
    # backpressure and never hits a .materialize().
    summed = (
        sh.repartition(num_blocks=num_partitions, keys=["s"], sort=True)
        .map_batches(
            df_filter_pairs_and_sizes, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
        .repartition(
            num_blocks=num_partitions, keys=["id_lo", "id_hi"], sort=True
        )
        .map_batches(
            _sum_runs(["id_lo", "id_hi"], "c", "v"),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
        .materialize()
    )

    def split_inter(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("id_hi"), 0)
        kept = batch.filter(mask)
        return pa.table(
            {
                "id_lo": kept.column("id_lo"),
                "id_hi": kept.column("id_hi"),
                "inter": kept.column("v"),
            }
        )

    def split_sizes(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.less(batch.column("id_hi"), 0))
        return pa.table(
            {
                "doc_id": kept.column("id_lo"),
                "n_kept": kept.column("v"),
            }
        )

    inter = summed.map_batches(
        split_inter, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    sizes = summed.map_batches(
        split_sizes, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    # size-switched finalize (the _verify_pairs_broadcast shape): the
    # candidate-pair table is df_cap-bounded, so under the pair cap
    # gather it driver-side, semi-filter the per-doc kept sizes down to
    # the CANDIDATE ids (candidate-bounded — the full size table, one
    # row per corpus doc, never reaches the driver) and compute Jaccard
    # in one vectorized pass, deleting both candidate hash joins.
    inter = inter.materialize()  # count + gather: execute ONCE
    if inter.count() <= BROADCAST_PAIR_CAP:
        import ray

        it = _gather_table(
            inter,
            pa.schema([("id_lo", pa.int64()), ("id_hi", pa.int64()),
                       ("inter", pa.int64())]),
        )
        out_schema = pa.table(
            {
                "id_lo": pa.array([], pa.int64()),
                "id_hi": pa.array([], pa.int64()),
                _score_col: pa.array([], pa.int64()),
            }
        )
        if len(it) == 0:
            # stays a Dataset: er_fuzzy_eval / blocking_strategy_report
            # chain Dataset ops on the truth set
            return ray.data.from_arrow(out_schema)
        lo = it.column("id_lo").to_numpy()
        hi = it.column("id_hi").to_numpy()
        ids_ref = ray.put(np.unique(np.concatenate([lo, hi])))
        st = _gather_table(
            sizes.map_batches(
                _BroadcastSemiFilter(ids_ref, "doc_id"),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).materialize(),
            pa.schema([("doc_id", pa.int64()), ("n_kept", pa.int64())]),
        )
        sid = st.column("doc_id").to_numpy()
        order = np.argsort(sid)
        sid, sn = sid[order], st.column("n_kept").to_numpy()[order]
        from hexhamming_ray.pipelines.relational import _lut_probe

        c = it.column("inter").to_numpy().astype(np.float64)
        # _lut_probe invariant: every candidate id has a size row
        plo, hlo = _lut_probe(sid, lo)
        phi, hhi = _lut_probe(sid, hi)
        assert hlo.all() and hhi.all(), "candidate id missing from size lut"
        na = sn[plo].astype(np.float64)
        nb = sn[phi].astype(np.float64)
        jac_x1000, keep = _score_fn(c, na, nb)
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_lo": pa.array(lo[keep], pa.int64()),
                    "id_hi": pa.array(hi[keep], pa.int64()),
                    _score_col: pa.array(jac_x1000, pa.int64()),
                }
            )
        )

    j = _join_col(inter, sizes, "id_lo", "n_lo", "n_kept", num_partitions)
    j = _join_col(j, sizes, "id_hi", "n_hi", "n_kept", num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("inter").to_numpy().astype(np.float64)
        na = batch.column("n_lo").to_numpy().astype(np.float64)
        nb = batch.column("n_hi").to_numpy().astype(np.float64)
        jac_x1000, keep = _score_fn(c, na, nb)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").filter(pa.array(keep)),
                "id_hi": batch.column("id_hi").filter(pa.array(keep)),
                _score_col: pa.array(jac_x1000, pa.int64()),
            }
        )

    return j.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def ngram_jaccard_allpairs(sf_dir: str, *, threshold: float = 0.5):
    """EXACT all-pairs token-3-gram Jaccard with NO candidate pruning
    and NO DF cap: the candidate set is the full id cartesian and every
    pair is verified against the broadcast shingle lut. This is
    ``ngram_jaccard_pairs`` at its exhaustive point — the LSH candidate
    generator replaced by all pairs — so the candidate-verify plumbing
    runs under a full SQL value oracle (the same CTE as
    ``ngram_jaccard_exact`` minus the DF filter). Quadratic by
    construction: at corpus scale use the DF-capped pipeline or the
    LSH candidates; this query exists for the correctness gate.
    (id_lo, id_hi, jaccard_x1000 floored)."""
    import ray

    ids_t = _gather_table(
        _docs(sf_dir, ["doc_id"]), pa.schema([("doc_id", pa.int64())])
    )
    ids = np.sort(ids_t.column("doc_id").to_numpy())
    n = ids.shape[0]
    ids_ref = ray.put(ids)
    total = n * (n - 1) // 2

    # the cartesian is GENERATED distributed from a range dataset (the
    # driver holds only the sorted id vector, never the O(n^2) pair
    # table): linear pair index -> (i, j) by inverting the triangular
    # number, vectorized per batch
    def expand(batch: pa.Table) -> pa.Table:
        k_lin = batch.column("id").to_numpy()
        kf = k_lin.astype(np.float64)
        # row i of the upper triangle starts at T(i) = i*n - i(i+1)/2
        i = np.floor(
            (2 * n - 1 - np.sqrt((2 * n - 1) ** 2 - 8 * kf)) / 2
        ).astype(np.int64)
        # one-step correction for float jitter at exact row boundaries
        T = lambda r: r * n - r * (r + 1) // 2  # noqa: E731
        i = np.where(T(i) > k_lin, i - 1, i)
        i = np.where(T(i + 1) <= k_lin, i + 1, i)
        j = (k_lin - T(i)) + i + 1
        local = ray.get(ids_ref)
        return pa.table(
            {
                "id_lo": pa.array(local[i], pa.int64()),
                "id_hi": pa.array(local[j], pa.int64()),
            }
        )

    cands = ray.data.range(total).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    return _ngram_verify_broadcast(sf_dir, cands, threshold,
                                   floor_round=True)


def ngram_jaccard_prefix(sf_dir: str, *, threshold: float = 0.5,
                         num_partitions: int | None = None,
                         checkpoint_dir: str | None = None,
                         order: str = "hash"):
    """EXACT all-pairs token-3-gram Jaccard >= threshold with NO DF
    cap and NO quadratic scan: AllPairs/PPJoin-style PREFIX FILTERING
    (Bayardo et al. WWW'07; Xiao et al. WWW'08). Under a common total
    order of the shingle universe (ascending hash — the per-doc lists
    arrive sorted-unique already), two sets with J >= t MUST share an
    element among their first ``|x| - ceil(t |x|) + 1`` elements: if
    the smallest shared element were outside x's prefix, all shared
    elements would fit in x's last ``ceil(t |x|) - 1`` slots, fewer
    than the ``>= ceil(t |x|)`` matches J >= t forces (J >= t implies
    overlap >= t * union >= t * |x|). So indexing ONLY prefixes is
    LOSSLESS — this query returns exactly ``ngram_jaccard_allpairs``'s
    result (same SQL oracle) at near-linear candidate cost instead of
    the O(n^2) cartesian, and without the DF-cap approximation
    ``ngram_jaccard_exact`` trades for skew safety.
    (id_lo, id_hi, jaccard_x1000 floored).

    Shape: shingle explode emits ONLY prefix rows (shingle, doc_id,
    size — ceil computed in exact rational arithmetic from the
    threshold's float ratio, never a float ceil) -> ONE shingle
    exchange -> per-run pair emission with the LENGTH FILTER
    (t * max(|A|, |B|) <= min — a J >= t necessity) cutting
    mismatched-size pairs before they exist -> cross-run pair dedup
    (the shared ``_distinct_pairs`` exchange) -> size-switched exact
    verify (broadcast under ``NGRAM_BROADCAST_CAP``, shingle-table
    joins above; both floor-convention).

    Skew note: a prefix shingle shared by k docs emits k^2/2
    candidates. ``order="df"`` is the classic mitigation (Chaudhuri's
    canonical order): TWO extra full-stream exchanges compute each
    shingle's global df and re-sort every doc's set by (df, hash)
    ascending, so the RAREST shingles fill every prefix and boilerplate
    (max-df) shingles sort to the suffixes and never index — the
    candidate count collapses on skewed corpora, which is the 100 TB
    default. The lemma holds for ANY common total order, so both
    orders return identical results (pinned by a paths-agree test);
    ``order="hash"`` skips the df pass and wins when the corpus is
    skew-free or small."""
    import ray

    num_partitions = num_partitions or _default_partitions()
    # exact rational ceil: ceil(num * s / den) without float fuzz
    num_t, den_t = float(threshold).as_integer_ratio()

    def explode_prefix(batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import shingle_hashes_batch

        ids = batch.column("doc_id").to_numpy()
        values, counts = shingle_hashes_batch(
            batch.column("text").to_pylist()
        )
        sizes = counts
        # exact ceil(t*s) via PYTHON-int rational math per UNIQUE size
        # (float t ratios have huge numerators — int64 would overflow)
        uq = np.unique(sizes)
        ceil_map = np.array(
            [-((-num_t * int(s)) // den_t) for s in uq], dtype=np.int64
        )
        ceil_ts = ceil_map[np.searchsorted(uq, sizes)]
        plen = np.where(sizes > 0, sizes - ceil_ts + 1, 0)
        offs = np.concatenate(([0], np.cumsum(counts)))
        total = int(plen.sum())
        base = np.repeat(offs[:-1], plen)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(plen) - plen, plen
        )
        take = base + intra
        return pa.table(
            {
                "s": pa.array(values[take].view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, plen), pa.int64()),
                "sz": pa.array(np.repeat(sizes, plen), pa.int64()),
                "ct": pa.array(np.repeat(ceil_ts, plen), pa.int64()),
            }
        )

    empty_pairs = pa.table(
        {
            "id_lo": pa.array([], pa.int64()),
            "id_hi": pa.array([], pa.int64()),
        }
    )

    def pairs_from_prefix_runs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return empty_pairs
        keys = batch.column("s").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        szs = batch.column("sz").to_numpy()
        cts = batch.column("ct").to_numpy()
        order = np.lexsort((ids, keys))
        keys, ids, szs, cts = (
            keys[order], ids[order], szs[order], cts[order]
        )
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        lens = ends - starts
        lo_l, hi_l = [], []
        for s0, e0 in zip(starts[lens >= 2], ends[lens >= 2]):
            run_i = ids[s0:e0]
            run_s = szs[s0:e0]
            run_c = cts[s0:e0]
            ii, jj = np.triu_indices(run_i.shape[0], k=1)
            # length filter: J >= t forces overlap >= ceil(t * max
            # size) while overlap <= min size — ceil carried per row
            # in exact integers, so the cut is boundary-exact
            mn = np.minimum(run_s[ii], run_s[jj])
            ok = mn >= np.maximum(run_c[ii], run_c[jj])
            if ok.any():
                a, b = run_i[ii[ok]], run_i[jj[ok]]
                lo_l.append(np.minimum(a, b))
                hi_l.append(np.maximum(a, b))
        if not lo_l:
            return empty_pairs
        pair = np.unique(
            np.stack(
                [np.concatenate(lo_l), np.concatenate(hi_l)], axis=1
            ),
            axis=0,
        )
        return pa.table(
            {
                "id_lo": pa.array(pair[:, 0], pa.int64()),
                "id_hi": pa.array(pair[:, 1], pa.int64()),
            }
        )

    def explode_full(batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import shingle_hashes_batch

        ids = batch.column("doc_id").to_numpy()
        values, counts = shingle_hashes_batch(
            batch.column("text").to_pylist()
        )
        return pa.table(
            {
                "s": pa.array(values.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            }
        )

    empty_df = pa.table(
        {
            "s": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        }
    )

    def add_df(batch: pa.Table) -> pa.Table:
        """s-partitioned block: global df = run length (every
        occurrence of a shingle is co-resident)."""
        n = len(batch)
        if n == 0:
            return empty_df
        s = batch.column("s").to_numpy()
        d = batch.column("doc_id").to_numpy()
        order = np.argsort(s, kind="stable")
        s_s, d_s = s[order], d[order]
        new = np.concatenate(([True], s_s[1:] != s_s[:-1]))
        starts = np.flatnonzero(new)
        runs = np.diff(np.append(starts, n))
        return pa.table(
            {
                "s": pa.array(s_s, pa.int64()),
                "doc_id": pa.array(d_s, pa.int64()),
                "df": pa.array(np.repeat(runs, runs), pa.int64()),
            }
        )

    empty_prefix = pa.table(
        {
            "s": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "sz": pa.array([], pa.int64()),
            "ct": pa.array([], pa.int64()),
        }
    )

    def prefix_by_df(batch: pa.Table) -> pa.Table:
        """doc-partitioned block: rebuild each doc's set in (df, s)
        ascending order — the canonical rarest-first order — and emit
        only the prefix rows."""
        n = len(batch)
        if n == 0:
            return empty_prefix
        s = batch.column("s").to_numpy()
        d = batch.column("doc_id").to_numpy()
        df = batch.column("df").to_numpy()
        order = np.lexsort((s, df, d))
        s_s, d_s = s[order], d[order]
        new = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        uq = np.unique(sizes)
        ceil_map = np.array(
            [-((-num_t * int(x)) // den_t) for x in uq],
            dtype=np.int64,
        )
        ceil_ts = ceil_map[np.searchsorted(uq, sizes)]
        plen = sizes - ceil_ts + 1  # sizes >= 1 here by construction
        total = int(plen.sum())
        base = np.repeat(starts, plen)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(plen) - plen, plen
        )
        take = base + intra
        return pa.table(
            {
                "s": pa.array(s_s[take], pa.int64()),
                "doc_id": pa.array(d_s[take], pa.int64()),
                "sz": pa.array(np.repeat(sizes, plen), pa.int64()),
                "ct": pa.array(np.repeat(ceil_ts, plen), pa.int64()),
            }
        )

    from hexhamming_ray.state.checkpoint import Checkpointer

    def build_cands():
        if order == "df":
            prefix_rows = (
                _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
                .map_batches(explode_full, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
                .repartition(num_blocks=num_partitions, keys=["s"],
                             sort=False)
                .map_batches(add_df, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
                .repartition(num_blocks=num_partitions,
                             keys=["doc_id"], sort=False)
                .map_batches(prefix_by_df, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
            )
        else:
            prefix_rows = _docs(
                sf_dir, ["doc_id", "text"], hash_shuffle=True
            ).map_batches(explode_prefix, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        raw = prefix_rows.repartition(
            num_blocks=num_partitions, keys=["s"], sort=False
        ).map_batches(pairs_from_prefix_runs, batch_format="pyarrow",
                      zero_copy_batch=True, batch_size=None)
        return _distinct_pairs(raw, num_partitions)

    cands = Checkpointer(checkpoint_dir).stage(
        "prefix_cands", build_cands
    )
    if cands.count() <= NGRAM_BROADCAST_CAP:
        return _ngram_verify_broadcast(sf_dir, cands, threshold,
                                       floor_round=True)
    return _ngram_verify_join(sf_dir, cands, threshold, num_partitions,
                              checkpoint_dir, floor_round=True)


def _containment_keep(c, na, nb, threshold):
    """Containment finalize: |inter| / min(|A|, |B|) — the
    near-SUPERSET detector (a short doc fully contained in a long one
    scores 1.0 where Jaccard vanishes; Lee et al. 2021's substring-
    dedup signal at set granularity). Floored to x1000 with the same
    op order as the SQL oracle ((c / m) * 1000)."""
    cont = c / np.minimum(na, nb)
    keep = cont >= threshold
    return np.floor(cont[keep] * 1000).astype(np.int64), keep


def ngram_containment_pairs(sf_dir: str, *, threshold: float = 0.8,
                            df_cap: int = 64,
                            num_partitions: int | None = None):
    """EXACT all-pairs token-3-gram CONTAINMENT >= threshold over the
    DF-capped shingle space: containment = |A∩B| / min(|A|, |B|),
    the asymmetric near-duplicate measure that catches quote/excerpt/
    boilerplate-wrapper relations Jaccard misses (a 50-gram doc fully
    inside a 5000-gram doc has Jaccard 0.01 but containment 1.0).
    (id_lo, id_hi, containment_x1000 floored).

    Rides the :func:`ngram_jaccard_exact` machinery verbatim (ONE
    streaming shingle exchange, tagged pair+size emission, size-
    switched finalize) with only the finalize formula swapped — both
    plans share it, so they cannot drift."""

    def score(c, na, nb):
        return _containment_keep(c, na, nb, threshold)

    return ngram_jaccard_exact(
        sf_dir, df_cap=df_cap, num_partitions=num_partitions,
        _score_fn=score, _score_col="containment_x1000",
    )


def _cos_dice_keep(c, na, nb, min_x1000: int):
    """Shared token-set cosine/dice finalize for BOTH
    token_cosine_pairs plans (broadcast and join — one place, the two
    cannot drift): Salton binary cosine |A∩B| / sqrt(|A||B|) and Dice
    2|A∩B| / (|A|+|B|), floored to x1000; keep when the cosine floor
    clears ``min_x1000`` (integer compare — no float boundary
    asymmetry between engines)."""
    cos = np.floor(1000.0 * c / np.sqrt(na * nb)).astype(np.int64)
    dice = np.floor(2000.0 * c / (na + nb)).astype(np.int64)
    keep = cos >= min_x1000
    return cos[keep], dice[keep], keep


def token_cosine_pairs(sf_dir: str, *, min_x1000: int = 600,
                       max_df: int = 64,
                       num_partitions: int | None = None):
    """EXACT all-pairs DISTINCT-TOKEN cosine similarity (Salton binary
    term-vector cosine) over the DF-capped vocabulary: whitespace
    tokens occurring in more than ``max_df`` documents are dropped from
    every set (stop-word pruning — the same skew guard as
    ngram_jaccard_exact's stop-shingles), then every pair sharing a
    surviving token is scored with cosine = |A∩B| / sqrt(|A| |B|) and
    Dice = 2|A∩B| / (|A|+|B|), kept when the x1000-floored cosine
    clears ``min_x1000``. The token-level sibling of the 3-gram Jaccard
    scan — set semantics on WORDS, so it pairs documents that share
    vocabulary regardless of word order or local edits.
    (id_lo, id_hi, inter, cosine_x1000, dice_x1000).

    Shape (the ngram_jaccard_exact one-pass shape on a string key):
    per-block distinct (doc, tok) partials -> ONE tok-keyed exchange ->
    per-run DF filter emitting pair rows AND sentinel-tagged kept-size
    rows from the SAME pass -> ONE (id_lo, id_hi) exchange summing both
    kinds (shared ``_sum_runs`` reduceat finalizer) -> size-switched
    finalize (broadcast lut under ``BROADCAST_PAIR_CAP``, candidate-
    bounded hash joins above). The corpus x tokens explode streams
    through exactly one exchange and is never materialized; exchange
    rows are vocabulary-bounded after the per-block distinct."""
    num_partitions = num_partitions or _default_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        t = _doc_tok_tf(batch)
        return t.select(["doc_id", "tok"])

    tk = _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    def pairs_and_sizes(batch: pa.Table) -> pa.Table:
        """One tok-partitioned block: group to per-token doc lists,
        drop tokens over the DF cap (tok fully co-located by the hash
        exchange, so run length IS global df), emit pre-counted pair
        rows and sentinel-tagged (doc, -1, n_kept) size rows in ONE
        pass."""
        empty = pa.table(
            {
                "id_lo": pa.array([], pa.int64()),
                "id_hi": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        g = batch.group_by("tok").aggregate([("doc_id", "list")])
        lst = g.column("doc_id_list")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lens = pc.list_value_length(lst).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = lst.flatten().to_numpy()
        keep_run = lens <= max_df
        # sizes: per-doc count of DF-surviving tokens in this block
        kept_ids = flat[np.repeat(keep_run, lens)]
        uniq, cnt = np.unique(kept_ids, return_counts=True)
        sizes_t = pa.table(
            {
                "id_lo": pa.array(uniq, pa.int64()),
                "id_hi": pa.array(
                    np.full(uniq.shape[0], -1, dtype=np.int64), pa.int64()
                ),
                "c": pa.array(cnt, pa.int64()),
            }
        )
        # pairs from runs 2 <= len <= max_df
        offs = np.concatenate(([0], np.cumsum(lens)))
        lo_l, hi_l = [], []
        m2 = keep_run & (lens == 2)
        if m2.any():
            s0 = offs[:-1][m2]
            a, b = flat[s0], flat[s0 + 1]
            lo_l.append(np.minimum(a, b))
            hi_l.append(np.maximum(a, b))
        for s0, e0 in zip(offs[:-1][keep_run & (lens >= 3)],
                          offs[1:][keep_run & (lens >= 3)]):
            run = np.sort(flat[s0:e0])
            ii, jj = np.triu_indices(run.shape[0], k=1)
            lo_l.append(run[ii])
            hi_l.append(run[jj])
        if not lo_l:
            return sizes_t if len(sizes_t) else empty
        pair = np.stack(
            [np.concatenate(lo_l), np.concatenate(hi_l)], axis=1
        )
        upair, ucnt = np.unique(pair, axis=0, return_counts=True)
        pairs_t = pa.table(
            {
                "id_lo": pa.array(upair[:, 0], pa.int64()),
                "id_hi": pa.array(upair[:, 1], pa.int64()),
                "c": pa.array(ucnt, pa.int64()),
            }
        )
        return pa.concat_tables([pairs_t, sizes_t])

    summed = (
        tk.repartition(num_blocks=num_partitions, keys=["tok"], sort=False)
        .map_batches(
            pairs_and_sizes, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
        .repartition(
            num_blocks=num_partitions, keys=["id_lo", "id_hi"], sort=False
        )
        .map_batches(
            _sum_runs(["id_lo", "id_hi"], "c", "v"),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
        .materialize()
    )

    def split_inter(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater_equal(batch.column("id_hi"), 0))
        return pa.table(
            {
                "id_lo": kept.column("id_lo"),
                "id_hi": kept.column("id_hi"),
                "inter": kept.column("v"),
            }
        )

    def split_sizes(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.less(batch.column("id_hi"), 0))
        return pa.table(
            {"doc_id": kept.column("id_lo"), "n_kept": kept.column("v")}
        )

    inter = summed.map_batches(
        split_inter, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    sizes = summed.map_batches(
        split_sizes, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    out_schema = pa.table(
        {
            "id_lo": pa.array([], pa.int64()),
            "id_hi": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "cosine_x1000": pa.array([], pa.int64()),
            "dice_x1000": pa.array([], pa.int64()),
        }
    )
    if inter.count() <= BROADCAST_PAIR_CAP:
        import ray

        it = _gather_table(
            inter,
            pa.schema([("id_lo", pa.int64()), ("id_hi", pa.int64()),
                       ("inter", pa.int64())]),
        )
        if len(it) == 0:
            # a pa.Table keeps its schema at 0 rows, where a 0-row
            # Dataset.to_pandas() drops it (the q11 driver-contract fix)
            return out_schema
        lo = it.column("id_lo").to_numpy()
        hi = it.column("id_hi").to_numpy()
        ids_ref = ray.put(np.unique(np.concatenate([lo, hi])))
        st = _gather_table(
            sizes.map_batches(
                _BroadcastSemiFilter(ids_ref, "doc_id"),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).materialize(),
            pa.schema([("doc_id", pa.int64()), ("n_kept", pa.int64())]),
        )
        sid = st.column("doc_id").to_numpy()
        order = np.argsort(sid)
        sid, sn = sid[order], st.column("n_kept").to_numpy()[order]
        from hexhamming_ray.pipelines.relational import _lut_probe

        c = it.column("inter").to_numpy().astype(np.float64)
        plo, hlo = _lut_probe(sid, lo)
        phi, hhi = _lut_probe(sid, hi)
        assert hlo.all() and hhi.all(), "candidate id missing size row"
        na = sn[plo].astype(np.float64)
        nb = sn[phi].astype(np.float64)
        cos, dice, keep = _cos_dice_keep(c, na, nb, min_x1000)
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_lo": pa.array(lo[keep], pa.int64()),
                    "id_hi": pa.array(hi[keep], pa.int64()),
                    "inter": pa.array(
                        c[keep].astype(np.int64), pa.int64()
                    ),
                    "cosine_x1000": pa.array(cos, pa.int64()),
                    "dice_x1000": pa.array(dice, pa.int64()),
                }
            )
        )

    j = _join_col(inter, sizes, "id_lo", "n_lo", "n_kept", num_partitions)
    j = _join_col(j, sizes, "id_hi", "n_hi", "n_kept", num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema
        c = batch.column("inter").to_numpy().astype(np.float64)
        na = batch.column("n_lo").to_numpy().astype(np.float64)
        nb = batch.column("n_hi").to_numpy().astype(np.float64)
        cos, dice, keep = _cos_dice_keep(c, na, nb, min_x1000)
        keep_pa = pa.array(keep)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").filter(keep_pa),
                "id_hi": batch.column("id_hi").filter(keep_pa),
                "inter": batch.column("inter").filter(keep_pa),
                "cosine_x1000": pa.array(cos, pa.int64()),
                "dice_x1000": pa.array(dice, pa.int64()),
            }
        )

    return j.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def weighted_jaccard_pairs(sf_dir: str, *, threshold: float = 0.4,
                           max_df: int = 64,
                           num_partitions: int | None = None):
    """EXACT all-pairs WEIGHTED (multiset) Jaccard over token TF
    vectors: J_w(A, B) = sum_t min(tf_A, tf_B) / sum_t max(tf_A,
    tf_B), tokens with document frequency > ``max_df`` dropped from
    every vector. The TF-aware sibling of token_cosine_pairs — a doc
    that repeats a phrase 50 times no longer looks identical to one
    that uses it once (set semantics collapse repetition; multiset
    semantics preserve it, the signal Gopher-style repetition filters
    act on). (id_lo, id_hi, inter_min, wjaccard_x1000 floored).

    Identity used: sum max = T_A + T_B - sum min, so the pair pass
    only accumulates min(tf) and the per-doc kept-TF totals ride the
    same sentinel-row channel as every set scan here.

    Shape is token_cosine_pairs' one-pass tagged emission verbatim:
    per-block exact (doc, tok, tf) partials (docs never split blocks)
    -> ONE tok exchange -> per-run DF filter emitting min(tf)-weighted
    pair rows AND (doc, -1, kept_tf_sum) size rows in one pass ->
    ONE pair exchange (shared ``_sum_runs``) -> size-switched finalize
    (broadcast lut under ``BROADCAST_PAIR_CAP``, candidate-bounded
    joins above)."""
    num_partitions = num_partitions or _default_partitions()

    tk = _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True).map_batches(
        _doc_tok_tf, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    def pairs_and_sizes(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_lo": pa.array([], pa.int64()),
                "id_hi": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        g = batch.group_by("tok").aggregate(
            [("doc_id", "list"), ("tf", "list")]
        )
        dlst = g.column("doc_id_list")
        tlst = g.column("tf_list")
        if isinstance(dlst, pa.ChunkedArray):
            dlst = dlst.combine_chunks()
        if isinstance(tlst, pa.ChunkedArray):
            tlst = tlst.combine_chunks()
        lens = pc.list_value_length(dlst).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        docs = dlst.flatten().to_numpy()
        tfs = tlst.flatten().to_numpy()
        keep_run = lens <= max_df
        # sizes: per-doc KEPT-token tf sum in this block
        kmask = np.repeat(keep_run, lens)
        uniq, inv = np.unique(docs[kmask], return_inverse=True)
        tw = np.bincount(inv, weights=tfs[kmask]).astype(np.int64)
        sizes_t = pa.table(
            {
                "id_lo": pa.array(uniq, pa.int64()),
                "id_hi": pa.array(
                    np.full(uniq.shape[0], -1, dtype=np.int64),
                    pa.int64(),
                ),
                "c": pa.array(tw, pa.int64()),
            }
        )
        offs = np.concatenate(([0], np.cumsum(lens)))
        lo_l, hi_l, c_l = [], [], []
        m2 = keep_run & (lens == 2)
        if m2.any():
            s0 = offs[:-1][m2]
            a, b = docs[s0], docs[s0 + 1]
            lo_l.append(np.minimum(a, b))
            hi_l.append(np.maximum(a, b))
            c_l.append(np.minimum(tfs[s0], tfs[s0 + 1]))
        for s0, e0 in zip(offs[:-1][keep_run & (lens >= 3)],
                          offs[1:][keep_run & (lens >= 3)]):
            order = np.argsort(docs[s0:e0])
            run_d = docs[s0:e0][order]
            run_t = tfs[s0:e0][order]
            ii, jj = np.triu_indices(run_d.shape[0], k=1)
            lo_l.append(run_d[ii])
            hi_l.append(run_d[jj])
            c_l.append(np.minimum(run_t[ii], run_t[jj]))
        if not lo_l:
            return sizes_t if len(sizes_t) else empty
        lo = np.concatenate(lo_l)
        hi = np.concatenate(hi_l)
        cw = np.concatenate(c_l).astype(np.int64)
        # partial combine: collapse this block's duplicate pairs
        order = np.lexsort((hi, lo))
        lo_s, hi_s, cw_s = lo[order], hi[order], cw[order]
        new = np.concatenate(
            ([True], (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1]))
        )
        starts = np.flatnonzero(new)
        pairs_t = pa.table(
            {
                "id_lo": pa.array(lo_s[starts], pa.int64()),
                "id_hi": pa.array(hi_s[starts], pa.int64()),
                "c": pa.array(
                    np.add.reduceat(cw_s, starts), pa.int64()
                ),
            }
        )
        return pa.concat_tables([pairs_t, sizes_t])

    summed = (
        tk.repartition(num_blocks=num_partitions, keys=["tok"],
                       sort=False)
        .map_batches(
            pairs_and_sizes, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
        .repartition(
            num_blocks=num_partitions, keys=["id_lo", "id_hi"],
            sort=False,
        )
        .map_batches(
            _sum_runs(["id_lo", "id_hi"], "c", "v"),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .materialize()
    )

    def split_inter(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater_equal(batch.column("id_hi"), 0))
        return pa.table(
            {
                "id_lo": kept.column("id_lo"),
                "id_hi": kept.column("id_hi"),
                "inter": kept.column("v"),
            }
        )

    def split_sizes(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.less(batch.column("id_hi"), 0))
        return pa.table(
            {"doc_id": kept.column("id_lo"), "n_kept": kept.column("v")}
        )

    inter = summed.map_batches(
        split_inter, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    sizes = summed.map_batches(
        split_sizes, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    out_schema = pa.table(
        {
            "id_lo": pa.array([], pa.int64()),
            "id_hi": pa.array([], pa.int64()),
            "inter_min": pa.array([], pa.int64()),
            "wjaccard_x1000": pa.array([], pa.int64()),
        }
    )

    def emit(lo, hi, c, na, nb):
        wj_x1000, keep = _jaccard_keep(c, na, nb, threshold)
        return pa.table(
            {
                "id_lo": pa.array(lo[keep], pa.int64()),
                "id_hi": pa.array(hi[keep], pa.int64()),
                "inter_min": pa.array(
                    c[keep].astype(np.int64), pa.int64()
                ),
                "wjaccard_x1000": pa.array(wj_x1000, pa.int64()),
            }
        )

    if inter.count() <= BROADCAST_PAIR_CAP:
        import ray

        it = _gather_table(
            inter,
            pa.schema([("id_lo", pa.int64()), ("id_hi", pa.int64()),
                       ("inter", pa.int64())]),
        )
        if len(it) == 0:
            return ray.data.from_arrow(out_schema)
        lo = it.column("id_lo").to_numpy()
        hi = it.column("id_hi").to_numpy()
        ids_ref = ray.put(np.unique(np.concatenate([lo, hi])))
        st = _gather_table(
            sizes.map_batches(
                _BroadcastSemiFilter(ids_ref, "doc_id"),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).materialize(),
            pa.schema([("doc_id", pa.int64()), ("n_kept", pa.int64())]),
        )
        sid = st.column("doc_id").to_numpy()
        order = np.argsort(sid)
        sid, sn = sid[order], st.column("n_kept").to_numpy()[order]
        from hexhamming_ray.pipelines.relational import _lut_probe

        c = it.column("inter").to_numpy().astype(np.float64)
        plo, hlo = _lut_probe(sid, lo)
        phi, hhi = _lut_probe(sid, hi)
        assert hlo.all() and hhi.all(), "candidate id missing size row"
        return ray.data.from_arrow(
            emit(lo, hi, c, sn[plo].astype(np.float64),
                 sn[phi].astype(np.float64))
        )

    j = _join_col(inter, sizes, "id_lo", "n_lo", "n_kept",
                  num_partitions)
    j = _join_col(j, sizes, "id_hi", "n_hi", "n_kept", num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema
        return emit(
            batch.column("id_lo").to_numpy(),
            batch.column("id_hi").to_numpy(),
            batch.column("inter").to_numpy().astype(np.float64),
            batch.column("n_lo").to_numpy().astype(np.float64),
            batch.column("n_hi").to_numpy().astype(np.float64),
        )

    return j.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def top_tokens_per_lang(sf_dir: str, *, k: int = 10,
                        num_partitions: int | None = None):
    """Corpus vocabulary statistics: the ``k`` most frequent tokens per
    language, deterministic tie-break (count desc, token asc):
    (lang, tok, n, rnk).

    Shape: per-block token explode with an IN-BLOCK Arrow hash-
    aggregate combiner (duplicate (lang, tok) rows collapse before any
    data moves — the token stream is corpus-sized, the partial counts
    are vocabulary-sized) -> ONE keyed exchange on (lang, tok) ->
    per-block final sum + per-lang partial top-k (each block keeps at
    most k rows per lang) -> single tiny merge block for the global
    top-k + rank. The full vocabulary is never materialized driver-
    side and never crosses more than one exchange."""
    num_partitions = num_partitions or _default_partitions()

    def explode_count(batch: pa.Table) -> pa.Table:
        # fully Arrow tokenize/explode: utf8_split_whitespace matches
        # str.split() for \S+ tokens; lang repeats by list length
        toks = pc.utf8_split_whitespace(batch.column("text"))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lang_rep = batch.column("lang").take(
            pa.array(
                np.repeat(np.arange(len(batch), dtype=np.int64), counts)
            )
        )
        t = pa.table({"lang": lang_rep, "tok": toks.flatten()})
        # Arrow's split keeps empty tokens at string edges (str.split
        # drops them) — filter to match the \S+ oracle exactly
        t = t.filter(pc.not_equal(t.column("tok"), ""))
        c = t.group_by(["lang", "tok"]).aggregate([("tok", "count")])
        return pa.table(
            {
                "lang": c.column("lang"),
                "tok": c.column("tok"),
                "n": c.column("tok_count").cast(pa.int64()),
            }
        )

    def _topk_runs(t: pa.Table, *, with_rank: bool) -> pa.Table:
        # house-style finalizer (same lexsort + run-rank pass as
        # tfidf_top_terms): sort (lang asc, n desc, tok asc), rank =
        # position since the lang-run start, keep rnk <= k. Replaces
        # two pandas sort/groupby-head round-trips that copied the
        # vocabulary-sized stream per block (VERDICT r03 #5).
        n_rows = len(t)
        if n_rows == 0:
            return (
                t.append_column("rnk", pa.array([], pa.int64()))
                if with_rank else t
            )
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        tok = t.column("tok").to_numpy(zero_copy_only=False)
        cnt = t.column("n").to_numpy()
        order = np.lexsort((tok, -cnt, lang))
        lang_s = lang[order]
        new = np.zeros(n_rows, dtype=bool)
        new[0] = True
        new[1:] = lang_s[1:] != lang_s[:-1]
        starts = np.flatnonzero(new)
        rnk = (
            np.arange(n_rows, dtype=np.int64)
            - np.repeat(starts, np.diff(np.r_[starts, n_rows]))
            + 1
        )
        keep = rnk <= k
        out = t.take(pa.array(order[keep]))
        if with_rank:
            out = out.append_column("rnk", pa.array(rnk[keep], pa.int64()))
        return out

    def final_sum_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "tok": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        c = batch.group_by(["lang", "tok"]).aggregate([("n", "sum")])
        c = pa.table(
            {
                "lang": c.column("lang"),
                "tok": c.column("tok"),
                "n": c.column("n_sum").cast(pa.int64()),
            }
        )
        return _topk_runs(c, with_rank=False)

    def merge_rank(batch: pa.Table) -> pa.Table:
        return _topk_runs(batch, with_rank=True)

    return (
        _docs(sf_dir, ["lang", "text"], hash_shuffle=True)
        .map_batches(
            explode_count, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .repartition(num_blocks=num_partitions, keys=["lang", "tok"],
                     sort=True)
        .map_batches(
            final_sum_topk, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .repartition(num_blocks=1)  # <= k rows per (block, lang)
        .map_batches(
            merge_rank, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )


#: per-stratum md5-prefix thresholds (hex, 4 chars): 'en' kept at
#: ~5% (0x0ccc/0x10000), every other language at ~20% (0x3333/0x10000)
#: — the classic dominant-language downsampling for a training mix
_STRATA_THRESH = {"en": "0ccc"}
_STRATA_DEFAULT = "3333"


def stratified_sample_docs(sf_dir: str):
    """Per-stratum deterministic hash sample: keep a row iff the first
    4 hex chars of md5(str(doc_id)) fall under its language's
    threshold. Membership is a pure function of (doc_id, lang) — same
    rows on every run, on any cluster, resumable for free (the
    stratified extension of ``doc_sample``). Pure per-row predicate,
    zero shuffle. (doc_id, lang, n_chars)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        langs = batch.column("lang").to_pylist()
        keep = np.fromiter(
            (
                hashlib.md5(str(int(i)).encode()).hexdigest()[:4]
                < _STRATA_THRESH.get(lang, _STRATA_DEFAULT)
                for i, lang in zip(ids, langs)
            ),
            dtype=bool,
            count=len(ids),
        )
        mask = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(mask),
                "lang": batch.column("lang").filter(mask),
                "n_chars": batch.column("n_chars").filter(mask),
            }
        )

    return _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def union_distinct_docs(sf_dir: str, *, min_chars: int = 400,
                        lang: str = "de"):
    """Set-op surface: doc_ids of long documents UNION doc_ids of one
    language, deduplicated. (doc_id,).

    ``Dataset.union`` concatenates lazily (no data movement); the
    distinct is one hash aggregate over the already-projected 8-byte
    id column."""
    from ray.data.aggregate import Count

    long_docs = _docs(sf_dir, ["doc_id", "n_chars"]).filter(
        expr=f"n_chars > {min_chars}"
    ).select_columns(["doc_id"])
    lang_docs = _docs(sf_dir, ["doc_id", "lang"]).filter(
        expr=f"lang == '{lang}'"
    ).select_columns(["doc_id"])

    return (
        long_docs.union(lang_docs)
        .groupby("doc_id")
        .aggregate(Count())
        .select_columns(["doc_id"])
    )


def _set_op(ds_a, ds_b, op: str, key: str, num_partitions: int):
    """Distributed INTERSECT / EXCEPT (set semantics) on one key
    column: tagged lazy union (side 0 = a, side 1 = b) -> per-block
    partial distinct on (key, side) -> ONE hash exchange on the key ->
    per-block resolve (both sides of any key are co-located, so
    membership tests are run-local numpy). The same one-exchange shape
    as the distinct aggregate; works for arbitrary input Datasets, not
    just filters of one table."""

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy()
            u = np.unique(k)  # partial distinct before the exchange
            return pa.table(
                {
                    key: pa.array(u, pa.int64()),
                    "side": pa.array(
                        np.full(len(u), side, dtype=np.int64), pa.int64()
                    ),
                }
            )

        return f

    import ray

    from hexhamming_ray import tune_data_context

    # The keyed repartition below needs the HASH_SHUFFLE DataContext,
    # and a union's context snapshot comes from its LEFT-MOST input —
    # so pin the context NOW and lead with a 0-row seed created under
    # it. This makes _set_op independent of how/when the callers built
    # ds_a / ds_b (construction order was silently load-bearing before)
    # AND guarantees the output keeps its schema when both inputs are
    # empty (an all-empty dataset otherwise has no blocks → no schema).
    tune_data_context(hash_shuffle=True)
    # ONE-ROW sentinel seed with side=2: resolve() masks on side 0/1,
    # so the sentinel is invisible to the result — while giving the
    # union a metadata-known, NON-EMPTY leading input. (A 0-row seed
    # is not enough: the hash-shuffle aggregator infers the exchange
    # schema from the first non-empty metadata-known input, and with
    # none, EMPTY partitions finalize against an empty schema and
    # sort_by raises.)
    seed = ray.data.from_arrow(
        pa.table(
            {
                key: pa.array([0], pa.int64()),
                "side": pa.array([2], pa.int64()),
            }
        )
    )
    tagged = seed.union(
        ds_a.map_batches(
            tag(0), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ds_b.map_batches(
            tag(1), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
    )

    def resolve(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({key: pa.array([], pa.int64())})
        k = batch.column(key).to_numpy()
        s = batch.column("side").to_numpy()
        in_a = np.unique(k[s == 0])
        in_b = np.unique(k[s == 1])
        if op == "intersect":
            out = in_a[np.isin(in_a, in_b, assume_unique=True)]
        else:  # except
            out = in_a[~np.isin(in_a, in_b, assume_unique=True)]
        return pa.table({key: pa.array(out, pa.int64())})

    out = tagged.repartition(
        num_blocks=num_partitions, keys=[key], sort=True
    ).map_batches(
        resolve, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    # trailing 0-row seed: empty shuffle outputs can bypass resolve()
    # and surface with a bare or (key, side) schema (ENGINEERING_NOTES
    # 34), so guarantee at least one block carrying the OUTPUT schema
    return out.union(
        ray.data.from_arrow(pa.table({key: pa.array([], pa.int64())}))
    )


def _docs_set_op(sf_dir: str, op: str, min_chars: int, lang: str,
                 num_partitions: int | None):
    """Shared builder for the document set-op queries: a = long docs,
    b = one language's docs."""
    num_partitions = num_partitions or _default_partitions()
    a = _docs(sf_dir, ["doc_id", "n_chars"]).filter(
        expr=f"n_chars > {min_chars}"
    ).select_columns(["doc_id"])
    b = _docs(sf_dir, ["doc_id", "lang"]).filter(
        expr=f"lang == '{lang}'"
    ).select_columns(["doc_id"])
    return _set_op(a, b, op, "doc_id", num_partitions)


def docs_intersect(sf_dir: str, *, min_chars: int = 400, lang: str = "en",
                   num_partitions: int | None = None):
    """INTERSECT: doc_ids of long documents ∩ doc_ids of one language
    (set semantics). (doc_id,)."""
    return _docs_set_op(sf_dir, "intersect", min_chars, lang, num_partitions)


def docs_except(sf_dir: str, *, min_chars: int = 400, lang: str = "en",
                num_partitions: int | None = None):
    """EXCEPT: doc_ids of long documents ∖ doc_ids of one language
    (set semantics). (doc_id,)."""
    return _docs_set_op(sf_dir, "except", min_chars, lang, num_partitions)


def er_cluster_size_hist(sf_dir: str, *, num_partitions: int | None = None):
    """Dedup-rate report: the distribution of exact-duplicate cluster
    sizes — (cluster_size, n_clusters) with one cluster per distinct
    content hash. The summary a 100 TB dedup run actually ships to its
    operator (the full cluster table stays distributed; only the
    histogram — bounded by the largest cluster size — leaves).

    Shape: per-block md5 + in-block combine to (h, n) -> ONE keyed
    exchange on h -> per-block run-sum to cluster sizes, immediately
    folded to a per-block size histogram (rows = distinct sizes, not
    clusters) -> single-block final sum. The exchange carries one row
    per (block, distinct hash); cluster rows never concentrate."""
    num_partitions = num_partitions or _default_partitions()

    def part(batch: pa.Table) -> pa.Table:
        h = np.asarray(_md5_hex(batch.column("text").to_pylist()))
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(list(u), pa.string()),
                "n": pa.array(c, pa.int64()),
            }
        )

    def size_hist(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "cluster_size": pa.array([], pa.int64()),
                    "n_clusters": pa.array([], pa.int64()),
                }
            )
        h = np.asarray(batch.column("h").to_pylist())
        n = batch.column("n").to_numpy()
        order = np.argsort(h)
        h, n = h[order], n[order]
        heads = np.empty(len(h), dtype=bool)
        heads[0] = True
        heads[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(heads)
        sizes = np.add.reduceat(n, starts)
        u, c = np.unique(sizes, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(u, pa.int64()),
                "n_clusters": pa.array(c, pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        s = batch.column("cluster_size").to_numpy()
        c = batch.column("n_clusters").to_numpy()
        u = np.unique(s)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, np.searchsorted(u, s), c)
        return pa.table(
            {
                "cluster_size": pa.array(u, pa.int64()),
                "n_clusters": pa.array(sums, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["text"], hash_shuffle=True)
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["h"], sort=True)
        .map_batches(size_hist, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=1)
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    )


def docs_above_p90_len(sf_dir: str, *, q: float = 0.9):
    """Percentile-threshold filter (the scalar-subquery broadcast
    pattern): documents strictly longer than the corpus's exact p90
    length. (doc_id, n_chars).

    Shape — two passes, both cheap: (1) per-block value-count partial
    over n_chars (the value domain is DISTINCT LENGTHS, orders of
    magnitude smaller than rows) -> single-block merge -> the exact
    discrete quantile by cumulative count (DuckDB quantile_disc
    semantics: sorted[floor(q*(n-1))]); (2) a fresh predicate-pushdown
    read with the now-known literal threshold — non-matching row groups
    never leave storage. Only the (value, count) table and one scalar
    ever reach the driver."""
    import pyarrow.dataset as pads

    def value_counts(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy()
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "v": pa.array(u, pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    vc = (
        _docs(sf_dir, ["n_chars"])
        .map_batches(value_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=1)
        .map_batches(_merge_value_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    v = np.array([r["v"] for r in vc], dtype=np.int64)
    c = np.array([r["c"] for r in vc], dtype=np.int64)
    n = int(c.sum())
    rank = int(np.floor(q * (n - 1)))  # 0-based discrete quantile
    thr = int(v[np.searchsorted(np.cumsum(c), rank + 1)])
    return _docs_filtered(
        sf_dir, ["doc_id", "n_chars"], pads.field("n_chars") > thr
    )


def _merge_value_counts(batch: pa.Table) -> pa.Table:
    if len(batch) == 0:
        return batch
    v = batch.column("v").to_numpy()
    c = batch.column("c").to_numpy()
    u = np.unique(v)
    sums = np.zeros(len(u), dtype=np.int64)
    np.add.at(sums, np.searchsorted(u, v), c)
    return pa.table(
        {"v": pa.array(u, pa.int64()), "c": pa.array(sums, pa.int64())}
    )


def _docs_filtered(sf_dir: str, columns, filter_expr):
    """Predicate-pushdown documents read (mirror of relational._t_filtered)."""
    import ray

    from hexhamming_ray import read_num_blocks, tune_data_context

    tune_data_context()
    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=columns, filter=filter_expr,
        override_num_blocks=read_num_blocks(path),
    )


#: every doc_id divisible by this is "benchmark" (eval-set) content
_BENCHMARK_MOD = 50


def decontaminate_docs(sf_dir: str):
    """Training-set DECONTAMINATION: for every training document (all
    docs except the benchmark subset ``doc_id % 50 == 0``), count the
    distinct token-3-gram shingles it shares with ANY benchmark
    document; emit only contaminated docs. (doc_id, n_shared_grams).

    This is the standard eval-leakage scan run before LLM training. The
    shape exploits the regime's asymmetry — the benchmark side is tiny
    relative to the corpus BY DESIGN: pass 1 shingles only benchmark
    docs and gathers their global unique gram hashes to the driver
    (bounded by the benchmark vocabulary, not the corpus), one ray.put;
    pass 2 streams the training corpus through a vectorized
    searchsorted membership per batch. ZERO shuffles; the corpus is
    read once, the benchmark twice-nothing.

    Gram identity is the shared 64-bit shingle hash space (collision
    odds ~n²/2⁶⁴ — the same accepted trade as the oracled ngram
    pipelines); semantics (str.split tokens, <3-token fallback,
    per-doc distinct) match
    :func:`~hexhamming_ray.functions.hashing.shingle_hashes_batch`."""
    import ray

    from hexhamming_ray.functions.hashing import shingle_hashes_batch

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = ids % _BENCHMARK_MOD == 0
        texts = [
            t for t, k in zip(batch.column("text").to_pylist(), keep) if k
        ]
        values, _ = shingle_hashes_batch(texts)
        return pa.table({"g": pa.array(np.unique(values), pa.uint64())})

    bench_t = _gather_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            bench_grams, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        pa.schema([("g", pa.uint64())]),
    )
    bench = np.unique(bench_t.column("g").to_numpy())
    bench_ref = ray.put(bench)

    class _Contamination:
        def __init__(self, ref):
            self.ref = ref
            self._b = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._b is None:
                self._b = ray.get(self.ref)
            ids = batch.column("doc_id").to_numpy()
            train = ids % _BENCHMARK_MOD != 0
            texts = [
                t for t, k in zip(batch.column("text").to_pylist(), train)
                if k
            ]
            ids = ids[train]
            values, counts = shingle_hashes_batch(texts)
            hit = np.zeros(len(values), dtype=np.int64)
            if len(values) and len(self._b):
                pos = np.searchsorted(self._b, values)
                pos = np.minimum(pos, len(self._b) - 1)
                hit = (self._b[pos] == values).astype(np.int64)
            off = np.concatenate([[0], np.cumsum(counts)])
            shared = np.add.reduceat(
                np.r_[hit, 0], off[:-1]
            ) if len(counts) else np.empty(0, dtype=np.int64)
            shared = np.where(counts == 0, 0, shared)
            keep = shared >= 1
            return pa.table(
                {
                    "doc_id": pa.array(ids[keep], pa.int64()),
                    "n_shared_grams": pa.array(
                        shared[keep].astype(np.int64), pa.int64()
                    ),
                }
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _Contamination(bench_ref), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


def doc_line_stats(sf_dir: str):
    """Repetition/boilerplate signal (the Gopher-style dup-line rule):
    per document, total lines vs distinct lines —
    (doc_id, n_lines, n_distinct_lines). A doc whose distinct ratio is
    low is templated/boilerplate content.

    Pure per-batch map, zero shuffle. Lines are byte windows of the
    batch's flattened Arrow string buffer, so distinctness runs over
    vectorized 64-bit polynomial window hashes (the shingle machinery's
    trick applied to line boundaries) + the per-segment sort/sweep —
    no per-line Python strings. Same accepted 64-bit collision trade
    as the oracled ngram pipelines."""
    from hexhamming_ray.functions.hashing import _window_hashes

    _EMPTY_LINE = np.uint64(0x9E3779B97F4A7C15)

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_distinct_lines": pa.array([], pa.int64()),
                }
            )
        lines = pc.split_pattern(batch.column("text"), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        loff = lines.offsets.to_numpy()
        counts = np.diff(loff).astype(np.int64)
        flat = lines.values  # flattened line strings
        sb = flat.buffers()
        so = np.frombuffer(
            sb[1], dtype=np.int32, count=len(flat) + 1,
            offset=flat.offset * 4,
        ).astype(np.int64)
        buf = np.frombuffer(sb[2], dtype=np.uint8)
        l, r = so[:-1], so[1:]
        h = np.full(len(flat), _EMPTY_LINE, dtype=np.uint64)
        ne = r > l
        if ne.any():
            h[ne] = _window_hashes(buf, l[ne], r[ne])
        # per-doc distinct: lines are doc-contiguous — per-segment
        # in-place sort + one adjacent-duplicate sweep
        off = loff.astype(np.int64)
        for i in range(n):
            a, b = off[i], off[i + 1]
            if b - a > 1:
                h[a:b].sort()
        total = h.shape[0]
        keep = np.empty(total, dtype=bool)
        if total:
            keep[1:] = h[1:] != h[:-1]
            keep[off[:-1][counts > 0]] = True
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        distinct = np.bincount(doc_of[keep], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(counts, pa.int64()),
                "n_distinct_lines": pa.array(distinct, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    """Deterministic scratch dir for a format-roundtrip query; wiped
    per call so re-runs are idempotent. NOT deleted afterwards — the
    read-back Dataset is lazy and streams from it."""
    import hashlib as _hl
    import os
    import shutil

    key = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/hexray_roundtrip_{fmt}_{key}"
    if os.path.exists(d):
        shutil.rmtree(d)
    return d


def docs_csv_roundtrip(sf_dir: str):
    """Source/sink format conformance: documents written as CSV
    (Arrow quoting handles embedded newlines/quotes/unicode), read back
    with ``ray.data.read_csv``, then token-counted — (doc_id,
    n_tokens), oracled against the PARQUET originals, so any CSV
    encode/decode corruption breaks the value hash. Both the write and
    the read stream block-wise (one CSV file per input block)."""
    import ray
    from pyarrow import csv as pacsv

    d = _roundtrip_dir(sf_dir, "csv")
    _docs(sf_dir, ["doc_id", "lang", "text"]).write_csv(d)
    back = ray.data.read_csv(
        d,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
    )

    def f(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        # CSV has no empty-vs-null distinction for a fully-empty field;
        # the originals have no nulls, so read-back nulls ARE ""
        txt = txt.fill_null("")
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": T.token_count(txt),
            }
        )

    return back.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def docs_json_roundtrip(sf_dir: str):
    """Source/sink format conformance, JSONL flavor: documents written
    as newline-delimited JSON, read back with ``ray.data.read_json``,
    projected to (doc_id, lang, n_chars) — oracled against the parquet
    originals. Streaming on both sides, one JSONL file per block."""
    import ray

    d = _roundtrip_dir(sf_dir, "json")
    _docs(sf_dir, ["doc_id", "lang", "n_chars"]).write_json(d)
    back = ray.data.read_json(d)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang").cast(pa.string()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    return back.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def docs_partitioned_sink(sf_dir: str, *, lang: str = "de"):
    """Resumable-output sink demo: documents written as HIVE-PARTITIONED
    Parquet (one directory per lang — the SURVEY §4 resumable-output
    rule: a failed run skips finished partitions), then ONE partition
    read back via partition pruning (only that directory's files are
    listed/opened). (doc_id, n_chars) of the chosen lang, oracled
    against the originals so the partition write/prune round-trip is
    value-checked."""
    import ray

    d = _roundtrip_dir(sf_dir, "hive")
    _docs(sf_dir, ["doc_id", "lang", "n_chars"]).write_parquet(
        d, partition_cols=["lang"]
    )
    back = ray.data.read_parquet(f"{d}/lang={lang}")

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    return back.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def corpus_report(sf_dir: str):
    """The one-pass multi-metric corpus report an operator prints before
    a training run: per language — doc count, total tokens, total
    chars, quality-pass count, min/max doc length.
    (lang, n_docs, total_tokens, total_chars, n_quality_ok,
    min_chars, max_chars).

    Shape — the fused-aggregate rule: SEVEN metrics, ONE read, one
    fused map computing every per-(block, lang) partial (all metrics
    are additive or min/max, so partials merge exactly), a coalesce of
    the ≤ |langs| rows per block, and a single-block final merge. The
    naive alternative (one pipeline per metric) reads the corpus seven
    times; this reads it once."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "total_tokens": pa.array([], pa.int64()),
                "total_chars": pa.array([], pa.int64()),
                "n_quality_ok": pa.array([], pa.int64()),
                "min_chars": pa.array([], pa.int64()),
                "max_chars": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        q = T.quality_features(batch.column("text"))
        lang = np.asarray(batch.column("lang").to_pylist())
        ntok = q["n_tokens"].to_numpy()
        nch = batch.column("n_chars").to_numpy()
        ok = q["quality_ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lang)
        lang, ntok, nch, ok = (
            lang[order], ntok[order], nch[order], ok[order]
        )
        heads = np.empty(len(lang), dtype=bool)
        heads[0] = True
        heads[1:] = lang[1:] != lang[:-1]
        st = np.flatnonzero(heads)
        return pa.table(
            {
                "lang": pa.array(list(lang[st]), pa.string()),
                "n_docs": pa.array(
                    np.diff(np.r_[st, len(lang)]), pa.int64()
                ),
                "total_tokens": pa.array(
                    np.add.reduceat(ntok, st), pa.int64()
                ),
                "total_chars": pa.array(
                    np.add.reduceat(nch, st), pa.int64()
                ),
                "n_quality_ok": pa.array(
                    np.add.reduceat(ok, st), pa.int64()
                ),
                "min_chars": pa.array(
                    np.minimum.reduceat(nch, st), pa.int64()
                ),
                "max_chars": pa.array(
                    np.maximum.reduceat(nch, st), pa.int64()
                ),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        lang = np.asarray(batch.column("lang").to_pylist())
        order = np.argsort(lang, kind="stable")
        heads = np.empty(len(lang), dtype=bool)
        heads[0] = True
        heads[1:] = lang[order][1:] != lang[order][:-1]
        st = np.flatnonzero(heads)

        def red(col, op):
            v = batch.column(col).to_numpy()[order]
            return pa.array(op.reduceat(v, st), pa.int64())

        return pa.table(
            {
                "lang": pa.array(list(lang[order][st]), pa.string()),
                "n_docs": red("n_docs", np.add),
                "total_tokens": red("total_tokens", np.add),
                "total_chars": red("total_chars", np.add),
                "n_quality_ok": red("n_quality_ok", np.add),
                "min_chars": red("min_chars", np.minimum),
                "max_chars": red("max_chars", np.maximum),
            }
        )

    return (
        _docs(sf_dir, ["lang", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .repartition(num_blocks=1)  # <= |langs| rows per block
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    )


#: weighted-sample scale: P(keep) = n_chars * W_SCALE / 2^52
#: (~10% per 1000 chars) — deterministic, so the "random" sample is
#: reproducible on any cluster and resumable for free
_W_SCALE = (1 << 52) // 10_000


def weighted_sample_docs(sf_dir: str):
    """Length-WEIGHTED deterministic sample: keep each document with
    probability proportional to its length — the standard training-mix
    trick of sampling long documents more often — implemented as
    ``hash52(doc_id) < n_chars * scale`` with the md5-prefix hash, so
    membership is a pure function of the row (reproducible, resumable,
    zero shuffle, exact SQL twin). (doc_id, n_chars)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        nch = batch.column("n_chars").to_numpy()
        keep = np.fromiter(
            (
                int(hashlib.md5(str(int(i)).encode()).hexdigest()[:13], 16)
                < int(c) * _W_SCALE
                for i, c in zip(ids, nch)
            ),
            dtype=bool,
            count=len(ids),
        )
        mask = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(mask),
                "n_chars": batch.column("n_chars").filter(mask),
            }
        )

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def dedup_keep_longest(sf_dir: str, *, num_partitions: int | None = None):
    """Canonical-document dedup, keep-best flavor: group by the
    NORMALIZED content hash (md5 of lowercased, whitespace-collapsed,
    trimmed text — so re-spaced/re-cased copies collide) and keep the
    longest raw document of each group, ties to the smallest doc_id.
    (h, keep_id, keep_chars, n_dups).

    The "keep the best exemplar" selection every training-data dedup
    needs once duplicates aren't byte-identical. Shape: one fused map
    (normalize + hash + slim to 3 columns) -> ONE keyed exchange on the
    hash -> a vectorized run pass that takes each group's lexsort head
    and length. Exchange rows are (hash, id, chars) — content never
    shuffles."""
    num_partitions = num_partitions or _default_partitions()

    def prep(batch: pa.Table) -> pa.Table:
        norm = _normalize_text(batch.column("text"))
        return pa.table(
            {
                "h": pa.array(_md5_hex(norm.to_pylist()), pa.string()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    def keep_best(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.string()),
                    "keep_id": pa.array([], pa.int64()),
                    "keep_chars": pa.array([], pa.int64()),
                    "n_dups": pa.array([], pa.int64()),
                }
            )
        h = np.asarray(batch.column("h").to_pylist())
        ids = batch.column("doc_id").to_numpy()
        chars = batch.column("n_chars").to_numpy()
        order = np.lexsort((ids, -chars, h))
        h, ids, chars = h[order], ids[order], chars[order]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        runs = np.diff(np.r_[starts, n]).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h[starts], pa.string()),
                "keep_id": pa.array(ids[starts], pa.int64()),
                "keep_chars": pa.array(chars[starts], pa.int64()),
                "n_dups": pa.array(runs, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text", "n_chars"], hash_shuffle=True)
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["h"], sort=True)
        .map_batches(keep_best, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def scrub_docs(sf_dir: str):
    """PII scrubbing: emails -> '<EMAIL>' then digit runs -> '#'.
    (doc_id, clean_text, n_masked) where n_masked counts replacements.
    Pure per-batch map over RE2 kernels (pyarrow and DuckDB both run
    RE2, so the oracle is the same two regexp_replace calls), zero
    shuffle, zero per-row Python."""
    _EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

    def f(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        t1 = pc.replace_substring_regex(
            txt, pattern=_EMAIL, replacement="<EMAIL>")
        t2 = pc.replace_substring_regex(
            t1, pattern=r"[0-9]+", replacement="#")
        n_masked = pc.add(
            pc.count_substring_regex(txt, pattern=_EMAIL),
            pc.count_substring_regex(t1, pattern=r"[0-9]+"),
        ).cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": t2,
                "n_masked": n_masked,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


#: coalesce line-dedup's per-doc partial merge when the corpus has at
#: most this many documents; above it, a keyed exchange on doc_id
LINE_DEDUP_COALESCE_CAP = 2_000_000


def line_dedup_docs(sf_dir: str, *, num_partitions: int | None = None):
    """Corpus-wide exact line dedup (the CCNet/RefinedWeb boilerplate
    cut): a line is KEPT only at its first occurrence in the corpus,
    ordered by (doc_id, line_no); every later copy anywhere is
    dropped. Per document: (doc_id, n_lines, kept_lines).

    Shape: explode each batch to slim (line_hash, doc_id, line_no)
    rows — lines are byte windows of the flattened Arrow buffer hashed
    by the vectorized polynomial kernel, so the exchange carries
    16-byte rows, never line text. ONE keyed exchange on the hash
    co-locates all copies of a line; a lexsort-head pass marks each
    hash's global first; per-(block, doc) partial counts then meet in
    a second small exchange on doc_id. Same accepted 64-bit collision
    trade as doc_line_stats / the ngram pipelines."""
    from hexhamming_ray.functions.hashing import _window_hashes

    num_partitions = num_partitions or _default_partitions()
    _EMPTY_LINE = np.uint64(0x9E3779B97F4A7C15)

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "lh": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "line_no": pa.array([], pa.int64()),
                }
            )
        lines = pc.split_pattern(batch.column("text"), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        loff = lines.offsets.to_numpy().astype(np.int64)
        counts = np.diff(loff)
        flat = lines.values
        sb = flat.buffers()
        so = np.frombuffer(
            sb[1], dtype=np.int32, count=len(flat) + 1,
            offset=flat.offset * 4,
        ).astype(np.int64)
        buf = np.frombuffer(sb[2], dtype=np.uint8)
        l, r = so[:-1], so[1:]
        h = np.full(len(flat), _EMPTY_LINE, dtype=np.uint64)
        ne = r > l
        if ne.any():
            h[ne] = _window_hashes(buf, l[ne], r[ne])
        doc = np.repeat(
            batch.column("doc_id").cast(pa.int64()).to_numpy(), counts
        )
        line_no = np.arange(h.shape[0], dtype=np.int64) - np.repeat(
            loff[:-1], counts
        ) + 1
        return pa.table(
            {
                "lh": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "line_no": pa.array(line_no, pa.int64()),
            }
        )

    def mark_firsts(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_lines_p": pa.array([], pa.int64()),
                    "kept_p": pa.array([], pa.int64()),
                }
            )
        lh = batch.column("lh").to_numpy()
        doc = batch.column("doc_id").to_numpy()
        lno = batch.column("line_no").to_numpy()
        order = np.lexsort((lno, doc, lh))
        lh_s, doc_s = lh[order], doc[order]
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = lh_s[1:] != lh_s[:-1]
        # per-(doc) partials within this block: total + kept
        u, inv = np.unique(doc_s, return_inverse=True)
        tot = np.bincount(inv, minlength=u.shape[0])
        kept = np.bincount(inv[first], minlength=u.shape[0])
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_lines_p": pa.array(tot.astype(np.int64), pa.int64()),
                "kept_p": pa.array(kept.astype(np.int64), pa.int64()),
            }
        )

    part = (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(explode, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["lh"], sort=True)
        .map_batches(mark_firsts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    # the per-(block, doc) partials are <= num_partitions x |docs|
    # rows: under the cap (doc count from parquet metadata) one concat
    # block finishes the merge (~2 s cheaper than the aggregator
    # machinery at sf0.1); above it, a second keyed exchange on doc_id
    import pyarrow.parquet as _pq

    from hexhamming_ray.pipelines.relational import _combine_runs

    n_docs = _pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows
    if n_docs <= LINE_DEDUP_COALESCE_CAP:
        part = part.repartition(num_blocks=1)
    else:
        part = part.repartition(
            num_blocks=num_partitions, keys=["doc_id"], sort=True
        )
    out = part.map_batches(
        _combine_runs(["doc_id"], ["n_lines_p", "kept_p"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    return out.rename_columns(["doc_id", "n_lines", "kept_lines"])


def doc_rarity_scores(sf_dir: str, *, num_partitions: int | None = None):
    """Per-document vocabulary-rarity quality signal: how "common" a
    document's vocabulary is corpus-wide — documents whose tokens are
    mostly corpus-rare are disproportionately OCR noise / codes /
    boilerplate IDs (the df-based cousin of the Gopher frequency
    rules). Per doc over its DISTINCT tokens: count, the minimum
    document frequency, and the integer-surrogate mean df
    (doc_id, n_distinct_toks, min_df, mean_df_x1000 =
    1000 * sum(df) // n_distinct_toks).

    Shape (the tfidf two-exchange design): per-block distinct
    (doc, tok) partials collapse the corpus-sized token stream to
    distinct-pairs rows BEFORE any movement -> exchange 1 on tok
    (df = run length IN PARTITION — no df table gathered or
    broadcast; rows leave as slim (doc_id, df) int64 pairs, token
    text dropped) -> exchange 2 on doc_id -> vectorized per-run
    sum/min/count finalize. Driver holds nothing."""
    num_partitions = num_partitions or _default_partitions()

    def doc_tok(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch.column("text"))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "tok": toks.flatten(),
            }
        )
        t = t.filter(pc.not_equal(t.column("tok"), ""))
        # in-block distinct (a doc's tokens live in one batch, so this
        # IS the exact per-doc distinct)
        return t.group_by(["doc_id", "tok"]).aggregate([])

    def df_rows(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        tok = batch.column("tok").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy()
        order = np.argsort(tok, kind="stable")
        tok_s, doc_s = tok[order], doc[order]
        new = np.zeros(m, dtype=bool)
        new[0] = True
        new[1:] = tok_s[1:] != tok_s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, m])
        return pa.table(
            {
                "doc_id": pa.array(doc_s, pa.int64()),
                "df": pa.array(np.repeat(lens, lens), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_distinct_toks": pa.array([], pa.int64()),
                    "min_df": pa.array([], pa.int64()),
                    "mean_df_x1000": pa.array([], pa.int64()),
                }
            )
        doc = batch.column("doc_id").to_numpy()
        df = batch.column("df").to_numpy()
        order = np.argsort(doc, kind="stable")
        doc_s, df_s = doc[order], df[order]
        new = np.zeros(m, dtype=bool)
        new[0] = True
        new[1:] = doc_s[1:] != doc_s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, m])
        csum = np.cumsum(df_s)
        tot = csum[np.r_[starts[1:], m] - 1] - np.where(
            starts > 0, csum[starts - 1], 0
        )
        mins = np.minimum.reduceat(df_s, starts)
        return pa.table(
            {
                "doc_id": pa.array(doc_s[starts], pa.int64()),
                "n_distinct_toks": pa.array(lens, pa.int64()),
                "min_df": pa.array(mins, pa.int64()),
                "mean_df_x1000": pa.array(
                    1000 * tot // lens, pa.int64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(doc_tok, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["tok"], sort=True)
        .map_batches(df_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["doc_id"],
                     sort=True)
        .map_batches(finalize, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def bpe_pair_counts(sf_dir: str, *, k: int = 50,
                    num_partitions: int | None = None):
    """The first iteration of BPE-style tokenizer training at the
    word level: the ``k`` most frequent ADJACENT token pairs
    corpus-wide (the pair a merge step would fuse), deterministic
    tie-break (count desc, pair asc). (pair, n, rnk).

    Shape (the top_tokens_per_lang design, pairs instead of tokens):
    per-block adjacent-pair explode — one vectorized
    binary_join_element_wise over the flattened token buffer with
    cross-document boundaries masked, then an IN-BLOCK Arrow
    hash-aggregate combiner so only pair-vocabulary-sized partials
    move -> ONE keyed exchange on pair -> per-block final sum +
    partial top-k -> single tiny merge block."""
    num_partitions = num_partitions or _default_partitions()

    def pair_count(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch.column("text"))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        keep_tok = pc.not_equal(flat, "")
        flat = flat.filter(keep_tok)
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # non-empty token counts per doc (empty edge tokens dropped)
        keep_np = keep_tok.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64), counts
        )[keep_np]
        L = np.bincount(doc_idx, minlength=len(batch)).astype(np.int64)
        m = int(L.sum())
        if m < 2:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # adjacent pairs: positions whose successor is the same doc
        ends = np.cumsum(L) - 1  # last token index of each doc
        ends = ends[(ends >= 0) & (ends < m - 1)]
        valid = np.ones(m - 1, dtype=bool)
        valid[ends] = False
        pairs = pc.binary_join_element_wise(
            flat.slice(0, m - 1), flat.slice(1, m - 1), " "
        )
        t = pa.table({"pair": pairs}).filter(pa.array(valid))
        c = t.group_by(["pair"]).aggregate([("pair", "count")])
        return pa.table(
            {
                "pair": c.column("pair"),
                "n": c.column("pair_count").cast(pa.int64()),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        c = batch.group_by(["pair"]).aggregate([("n", "sum")])
        t = pa.table(
            {
                "pair": c.column("pair"),
                "n": c.column("n_sum").cast(pa.int64()),
            }
        )
        m = len(t)
        pair = t.column("pair").to_numpy(zero_copy_only=False)
        cnt = t.column("n").to_numpy()
        order = np.lexsort((pair, -cnt))
        keep = order[:k]
        return t.take(pa.array(keep))

    def merge_rank(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        pair = batch.column("pair").to_numpy(zero_copy_only=False)
        cnt = batch.column("n").to_numpy()
        order = np.lexsort((pair, -cnt))[:k]
        out = batch.take(pa.array(order))
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(pair_count, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["pair"], sort=True)
        .map_batches(final_topk, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=1)  # <= k rows per block
        .map_batches(merge_rank, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def dup_span_docs(sf_dir: str, *, n: int = 8,
                  num_partitions: int | None = None):
    """Cross-document duplicated-SPAN detection — the substring-level
    dedup signal of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better") at token-``n``-gram granularity:
    for each document, how many of its DISTINCT token-8-gram spans
    also occur in at least one OTHER document (docs shorter than
    ``n`` tokens contribute their whole joined text as one span, the
    shingle-contract fallback). (doc_id, n_spans, n_shared,
    shared_x1000) with shared_x1000 = 1000 * n_shared // n_spans.

    Shape (the line_dedup two-exchange design): the explode emits slim
    (span_hash, doc_id) distinct-per-doc rows — 16 bytes, span text
    never moves; exchange 1 on the hash co-locates every doc sharing a
    span (run length = containing-doc count, rows are per-doc
    distinct); per-(block, doc) partial counts then meet in a
    cap-gated coalesce or a second keyed exchange on doc_id. Same
    64-bit collision trade as the other gram pipelines."""
    from hexhamming_ray.functions.hashing import shingle_hashes_batch

    num_partitions = num_partitions or _default_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy()
        values, counts = shingle_hashes_batch(
            batch.column("text").to_pylist(), n
        )
        return pa.table(
            {
                "g": pa.array(values.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            }
        )

    def mark_shared(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_spans_p": pa.array([], pa.int64()),
                    "n_shared_p": pa.array([], pa.int64()),
                }
            )
        g = batch.column("g").to_numpy()
        doc = batch.column("doc_id").to_numpy()
        order = np.argsort(g, kind="stable")
        g_s, doc_s = g[order], doc[order]
        new = np.zeros(m, dtype=bool)
        new[0] = True
        new[1:] = g_s[1:] != g_s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, m])
        shared = np.repeat(lens >= 2, lens)  # rows are per-doc distinct
        u, inv = np.unique(doc_s, return_inverse=True)
        tot = np.bincount(inv, minlength=u.shape[0])
        shr = np.bincount(inv[shared], minlength=u.shape[0])
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_spans_p": pa.array(tot.astype(np.int64), pa.int64()),
                "n_shared_p": pa.array(shr.astype(np.int64), pa.int64()),
            }
        )

    part = (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(explode, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["g"], sort=True)
        .map_batches(mark_shared, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    import pyarrow.parquet as _pq

    from hexhamming_ray.pipelines.relational import _combine_runs

    n_docs = _pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows
    if n_docs <= LINE_DEDUP_COALESCE_CAP:
        part = part.repartition(num_blocks=1)
    else:
        part = part.repartition(
            num_blocks=num_partitions, keys=["doc_id"], sort=True
        )
    merged = part.map_batches(
        _combine_runs(["doc_id"], ["n_spans_p", "n_shared_p"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch.column("n_spans_p").to_numpy()
        sh = batch.column("n_shared_p").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_spans": pa.array(ns, pa.int64()),
                "n_shared": pa.array(sh, pa.int64()),
                "shared_x1000": pa.array(
                    1000 * sh // np.maximum(ns, 1), pa.int64()
                ),
            }
        )

    return merged.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def token_doc_freq(sf_dir: str, *, min_df: int = 5,
                   num_partitions: int | None = None):
    """Vocabulary statistics for tokenizer training: per token, the
    document frequency (distinct docs containing it) and total
    occurrence count, kept where df >= ``min_df``. (tok, df, n).

    Shape: per-block token explode with an in-block Arrow combiner —
    first to distinct (doc, tok) pairs (exact per-doc dedup: a doc's
    tokens live in one batch), then to per-token (df, n) partials, so
    the corpus-sized token stream collapses to vocabulary-sized rows
    before ANY data moves -> ONE keyed exchange on tok -> run-sum
    finalize + the df filter (the filter can't run earlier: a token
    under min_df in one block can cross it globally)."""
    num_partitions = num_partitions or _default_partitions()

    def explode_partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch.column("text"))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_rep = batch.column("doc_id").take(
            pa.array(np.repeat(np.arange(len(batch), dtype=np.int64),
                               counts))
        )
        t = pa.table({"doc_id": doc_rep, "tok": toks.flatten()})
        t = t.filter(pc.not_equal(t.column("tok"), ""))
        pairs = t.group_by(["doc_id", "tok"]).aggregate([("tok", "count")])
        per_tok = pairs.group_by("tok").aggregate(
            [("doc_id", "count"), ("tok_count", "sum")]
        )
        return pa.table(
            {
                "tok": per_tok.column("tok"),
                "df": per_tok.column("doc_id_count").cast(pa.int64()),
                "n": per_tok.column("tok_count_sum").cast(pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        c = batch.group_by("tok").aggregate([("df", "sum"), ("n", "sum")])
        c = c.filter(pc.greater_equal(c.column("df_sum"), min_df))
        return pa.table(
            {
                "tok": c.column("tok"),
                "df": c.column("df_sum").cast(pa.int64()),
                "n": c.column("n_sum").cast(pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(explode_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["tok"], sort=True)
        .map_batches(finalize, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def lang_confusion(sf_dir: str):
    """Language-ID quality report: the confusion matrix of labeled
    language vs the n-gram/marker-word predictor, (lang, pred_lang,
    n_docs). The standard evaluation artifact for a classifier stage —
    composed from the oracled langid machinery plus a grouped count.
    ~25 cells: per-block combine + coalesce, zero shuffle."""
    from hexhamming_ray.pipelines.relational import _combine_runs

    def prep(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return _combine_runs(["lang", "pred_lang"], [], "n_docs")(
            pa.table(
                {
                    "lang": batch.column("lang"),
                    "pred_lang": T.langid_batch(batch.column("text")),
                }
            )
        ) if n else pa.table(
            {
                "lang": pa.array([], pa.string()),
                "pred_lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .repartition(num_blocks=1)
        .map_batches(_combine_runs(["lang", "pred_lang"], ["n_docs"]),
                     batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    )


def chunk_docs(sf_dir: str, *, chunk: int = 64, stride: int | None = None):
    """Context-window chunking — the LLM pretraining 1->N explode:
    split each document into ``chunk``-token windows starting every
    ``stride`` tokens (default ``stride == chunk``: consecutive,
    non-overlapping — the SQL-oracled configuration; ``stride <
    chunk`` gives the overlapping windows an embedding pipeline wants,
    tested against a Python reference). (doc_id, chunk_id,
    n_chunk_tokens, chunk_text); 0-token docs emit 0 chunks.

    Shape: pure per-batch flat-map, ZERO shuffle — chunking is
    embarrassingly parallel and must stay that way at 100 TB. Tokens
    never leave Arrow: whitespace split -> empty-edge filter (to match
    the ``\\S+`` oracle) -> non-overlapping windows tile the flat
    token buffer exactly, so the chunk list array is rebuilt from
    boundary offsets alone (no take/gather of token data; overlapping
    windows take one vectorized index gather instead) and the chunk
    text is ONE vectorized ``binary_join`` per batch. Output grows
    ~chunk/stride x input text: consume with a sink, never take_all."""
    stride = chunk if stride is None else stride
    if not 0 < stride <= chunk:
        raise ValueError("stride must be in (0, chunk]")

    def f(batch: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_chunk_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )

        n = len(batch)
        if n == 0:
            return empty()
        toks = pc.utf8_split_whitespace(batch.column("text"))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = toks.flatten()
        # Arrow's split keeps empty tokens at string edges; \S+ doesn't
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)[keep_np]
        L = np.bincount(doc_idx, minlength=n).astype(np.int64)
        # windows start at 0, stride, 2*stride ... while start < L
        n_chunks = np.where(L > 0, (L - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return empty()
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        cum = np.concatenate(([0], np.cumsum(n_chunks)))
        chunk_id = (
            np.arange(total, dtype=np.int64)
            - np.repeat(cum[:-1], n_chunks)
        )
        doc_off = np.concatenate(([0], np.cumsum(L)))
        starts = doc_off[doc_rep] + chunk_id * stride
        ends = np.minimum(
            starts + chunk, doc_off[doc_rep] + L[doc_rep]
        )
        if stride == chunk:
            # consecutive windows tile the filtered token buffer
            # exactly (ends[i] == starts[i+1]), so boundaries ARE the
            # list offsets — zero-gather. int64 offsets (LargeList)
            # like the stride branch: a block whose token count passes
            # 2^31 would silently wrap an int32 cast (ADVICE r03)
            offsets = pa.array(
                np.concatenate((starts, [doc_off[-1]])), pa.int64()
            )
            windows = pa.LargeListArray.from_arrays(offsets, flat)
        else:
            # overlapping windows: one vectorized index gather. Output
            # tokens = block tokens x ~chunk/stride, which can pass
            # 2^31 on a large block at extreme ratios — int64 offsets
            # (LargeListArray) avoid the int32 overflow cliff
            lens = ends - starts
            out_cum = np.concatenate(([0], np.cumsum(lens)))
            idx = (
                np.repeat(starts, lens)
                + np.arange(int(out_cum[-1]), dtype=np.int64)
                - np.repeat(out_cum[:-1], lens)
            )
            windows = pa.LargeListArray.from_arrays(
                pa.array(out_cum, pa.int64()),
                flat.take(pa.array(idx)),
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(doc_rep)),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "n_chunk_tokens": pa.array(ends - starts, pa.int64()),
                "chunk_text": pc.binary_join(windows, " "),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


#: train/val/test boundaries on the first 2 hex chars of
#: md5(str(doc_id)): < 'cc' (204/256 ~ 79.7%) -> train,
#: < 'e6' (26/256 ~ 10.2%) -> val, else test (~10.2%)
_SPLIT_TRAIN, _SPLIT_VAL = "cc", "e6"


def dataset_split_docs(sf_dir: str):
    """Deterministic train/val/test assignment: split is a pure
    function of doc_id (md5-prefix banding, the ``doc_sample``
    machinery), so membership is identical on every run, on any
    cluster, and new data lands in stable splits without touching old
    rows. (doc_id, lang, split). Pure per-row map, zero shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        prefixes = [
            hashlib.md5(str(int(i)).encode()).hexdigest()[:2] for i in ids
        ]
        split = pa.array(
            [
                "train" if p < _SPLIT_TRAIN
                else ("val" if p < _SPLIT_VAL else "test")
                for p in prefixes
            ],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "split": split,
            }
        )

    return _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def shuffle_docs(sf_dir: str, *, num_partitions: int | None = None):
    """Deterministic global training-order shuffle: each document's
    1-based position in a reproducible pseudo-random permutation —
    rank in (md5(doc_id), doc_id) order. Unlike
    ``Dataset.random_shuffle`` (block-layout dependent), the position
    is a pure function of the corpus content, so the training order is
    identical on every run, any cluster size, and resumable mid-epoch.
    (doc_id, shuffle_pos).

    Shape: NO global sort operator — the pack_sequences distributed
    prefix sum applied to RANK assignment. Keys are the two big-endian
    uint64 halves of the md5 digest (byte order == hex-string order,
    so the SQL ``ORDER BY md5(..)`` oracle matches exactly); bucket =
    first digest byte, giving 256 ordered key ranges by construction.
    Pass A: per-block bucket histograms -> one tiny coalesce (256
    rows/block bound) -> the driver holds O(256) exclusive-prefix
    bases. Pass B: bucket-keyed exchange of 24-byte rows (text never
    moves), one lexsort by (k1, k2, doc_id) per block + run-reset
    cumcount + base[bucket]."""
    num_partitions = num_partitions or _default_partitions()

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy()
        # id-only md5 loop (metadata path, same as dataset_split_docs)
        dig = b"".join(
            hashlib.md5(str(int(i)).encode()).digest() for i in ids
        )
        k = np.frombuffer(dig, dtype=">u8").reshape(-1, 2)
        k1 = k[:, 0].astype(np.uint64)
        k2 = k[:, 1].astype(np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k1": pa.array(k1, pa.uint64()),
                "k2": pa.array(k2, pa.uint64()),
                "bucket": pa.array(
                    (k1 >> np.uint64(56)).astype(np.int64), pa.int64()
                ),
            }
        )

    keyed = (
        _docs(sf_dir, ["doc_id"], hash_shuffle=True)
        .map_batches(key_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .materialize()  # consumed twice: histogram pass + rank pass
    )

    counts = _bucket_counts(keyed, 256)
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def rank_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shuffle_pos": pa.array([], pa.int64()),
                }
            )
        ids = batch.column("doc_id").to_numpy()
        k1 = batch.column("k1").to_numpy()
        k2 = batch.column("k2").to_numpy()
        bk = batch.column("bucket").to_numpy()
        order = np.lexsort((ids, k2, k1))
        bk_s = bk[order]  # buckets contiguous in k1 order
        pos = bases[bk_s] + _run_reset_within(bk_s) + 1
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "shuffle_pos": pa.array(pos, pa.int64()),
            }
        )

    return (
        keyed.repartition(num_blocks=min(num_partitions, 256),
                          keys=["bucket"], sort=True)
        .map_batches(rank_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def pack_sequences(sf_dir: str, *, budget: int = 2048,
                   num_partitions: int | None = None):
    """Sequence packing for LLM pretraining: documents concatenated in
    doc_id order and cut into fixed ``budget``-token training
    sequences (docs straddle boundaries — the standard concat-then-
    split packing). Per doc: its global token offset and first/last
    sequence index. (doc_id, n_tokens, start_off, seq_start, seq_end,
    straddles).

    Shape — a DISTRIBUTED PREFIX SUM, the coordination pattern Ray
    Data has no native operator for:

    1. one pass computes (doc_id, n_tokens, bucket); ``bucket =
       doc_id // span`` maps doc_ids onto contiguous ordered ranges by
       arithmetic alone (no boundary sampling needed). Text is dropped
       immediately; the narrow 24-byte rows are materialized once and
       consumed twice (object-store-spillable; same note as the
       minhash signature table).
    2. per-block partial (bucket, token_sum) rows -> ONE keyed
       exchange -> <= num_partitions total rows gathered to the
       driver -> exclusive prefix over the bucket totals = per-bucket
       base offsets. The driver holds O(buckets), never O(docs).
    3. bucket-keyed exchange of the narrow rows; within each block one
       lexsort by doc_id (bucket is monotone in doc_id) and a
       run-reset cumsum + base[bucket] give exact global offsets.

    All arithmetic is int64; seq indices derive from integer division
    so the SQL twin (SUM OVER ... ROWS UNBOUNDED PRECEDING) matches
    bit-exactly."""
    import pyarrow.parquet as pq

    num_partitions = num_partitions or _default_partitions()
    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.ParquetFile(path).metadata.num_rows
    span = max(1, -(-n_docs // num_partitions))

    def tok_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": T.token_count(batch.column("text")),
                "bucket": pa.array(
                    ids.to_numpy() // span, pa.int64()
                ),
            }
        )

    from hexhamming_ray.pipelines.relational import _combine_runs

    toks = (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(tok_bucket, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .materialize()
    )

    # pass A: bucket totals -> driver (<= n_buckets rows) -> bases.
    # Per-block partials are <= n_buckets rows each, so under
    # COALESCE_KEY_CAP buckets ONE concat block (blocks x buckets tiny
    # rows, 24 B each) beats spinning the keyed exchange's aggregators;
    # above the cap (sparse doc_id domains can make bucket count >>
    # num_partitions) the keyed exchange carries the partials instead
    # of funneling blocks x buckets rows into one task (ADVICE r03).
    # The bucket-count bound comes from parquet doc_id column stats.
    from hexhamming_ray.pipelines.relational import COALESCE_KEY_CAP

    try:
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.to_arrow_schema().get_field_index("doc_id")
        maxid = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        n_buckets_bound = maxid // span + 1
    except Exception:
        n_buckets_bound = COALESCE_KEY_CAP + 1  # stats missing: exchange
    partials = toks.map_batches(
        _combine_runs(["bucket"], ["n_tokens"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    if n_buckets_bound <= COALESCE_KEY_CAP:
        partials = partials.repartition(num_blocks=1)
    else:
        partials = partials.repartition(
            num_blocks=num_partitions, keys=["bucket"], sort=True
        )
    totals = partials.map_batches(
        _combine_runs(["bucket"], ["n_tokens"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    ).take_all()
    buckets = np.array(sorted(r["bucket"] for r in totals), np.int64)
    sums = np.array(
        [r["n_tokens"] for r in sorted(totals, key=lambda r: r["bucket"])],
        np.int64,
    )
    bases = np.concatenate(([0], np.cumsum(sums)[:-1]))

    def finalize(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "start_off": pa.array([], pa.int64()),
                    "seq_start": pa.array([], pa.int64()),
                    "seq_end": pa.array([], pa.int64()),
                    "straddles": pa.array([], pa.bool_()),
                }
            )
        ids = batch.column("doc_id").to_numpy()
        nt = batch.column("n_tokens").to_numpy()
        bk = batch.column("bucket").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, nt, bk = ids[order], nt[order], bk[order]
        c = np.cumsum(nt)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(new)
        run_base = np.where(starts > 0, c[starts - 1], 0)
        within = c - nt - np.repeat(run_base, np.diff(np.r_[starts, n]))
        off = bases[np.searchsorted(buckets, bk)] + within
        last = off + np.maximum(nt, 1) - 1
        seq_start = off // budget
        seq_end = last // budget
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "start_off": pa.array(off, pa.int64()),
                "seq_start": pa.array(seq_start, pa.int64()),
                "seq_end": pa.array(seq_end, pa.int64()),
                "straddles": pa.array(seq_end > seq_start),
            }
        )

    return (
        toks.repartition(num_blocks=num_partitions, keys=["bucket"],
                         sort=True)
        .map_batches(finalize, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def _doc_tok_tf(batch: pa.Table) -> pa.Table:
    """Per-block distinct (doc_id, tok, tf) partials — exact because a
    document's rows never split across blocks (whole-block batches)."""
    toks = pc.utf8_split_whitespace(batch.column("text"))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    doc_rep = batch.column("doc_id").take(
        pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), counts))
    )
    t = pa.table({"doc_id": doc_rep, "tok": toks.flatten()})
    t = t.filter(pc.not_equal(t.column("tok"), ""))
    pairs = t.group_by(["doc_id", "tok"]).aggregate([("tok", "count")])
    return pa.table(
        {
            "doc_id": pairs.column("doc_id"),
            "tok": pairs.column("tok"),
            "tf": pairs.column("tok_count").cast(pa.int64()),
        }
    )


def tfidf_top_terms(sf_dir: str, *, k: int = 5,
                    num_partitions: int | None = None):
    """Per-document top-``k`` terms by tf-idf. Float idf is a cross-
    engine hash hazard, so the score is the integer surrogate
    ``tfidf_s = tf * (n_docs * 1_000_000 // df)`` — deterministic and
    bit-identical in SQL (the micro-unit trick from label_centroids).
    Overflow bound: the FULL product ``max_tf * n_docs * 1e6 // df``
    must fit int64 (numpy would silently wrap where DuckDB BIGINT
    raises — ADVICE r03), so the score stage asserts it; beyond that
    scale swap the multiplier for a float score and drop the value
    oracle. (doc_id, tok, tf, df, tfidf_s, rnk), ties broken by tok
    asc.

    Shape: per-block distinct (doc, tok, tf) partials collapse the
    corpus-sized token stream to distinct-pairs-sized rows BEFORE any
    data moves -> exchange 1 on tok (every token's rows co-located:
    df = run length, score per row — no df table is ever gathered or
    broadcast) -> exchange 2 on doc_id -> per-block per-doc top-k via
    one lexsort + run ranks. Two exchanges total, driver holds
    nothing."""
    import pyarrow.parquet as pq

    num_partitions = num_partitions or _default_partitions()
    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    def score_by_tok(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tok": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tfidf_s": pa.array([], pa.int64()),
                }
            )
        tok = batch.column("tok").to_numpy(zero_copy_only=False)
        order = np.argsort(tok, kind="stable")
        tok = tok[order]
        doc = batch.column("doc_id").to_numpy()[order]
        tf = batch.column("tf").to_numpy()[order]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, n])
        df = np.repeat(lens, lens).astype(np.int64)
        idf_s = (np.int64(n_docs) * 1_000_000) // df
        # guard the FULL bound (max_tf * n_docs * 1e6 // df): numpy
        # int64 wraps silently where the DuckDB oracle would raise,
        # so rankings could silently diverge (ADVICE r03)
        max_tf = int(tf.max()) if n else 0
        assert max_tf * (n_docs * 1_000_000) < 2 ** 63, (
            "tfidf_s would overflow int64 "
            f"(max_tf={max_tf}, n_docs={n_docs}); use a float score"
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "tok": pa.array(tok, pa.string()),
                "tf": pa.array(tf, pa.int64()),
                "df": pa.array(df, pa.int64()),
                "tfidf_s": pa.array(tf * idf_s, pa.int64()),
            }
        )

    def topk_by_doc(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column(
                "rnk", pa.array([], pa.int64())
            )
        doc = batch.column("doc_id").to_numpy()
        tok = batch.column("tok").to_numpy(zero_copy_only=False)
        score = batch.column("tfidf_s").to_numpy()
        order = np.lexsort((tok, -score, doc))
        doc_s = doc[order]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = doc_s[1:] != doc_s[:-1]
        starts = np.flatnonzero(new)
        rnk = (
            np.arange(n, dtype=np.int64)
            - np.repeat(starts, np.diff(np.r_[starts, n]))
            + 1
        )
        keep_idx = order[rnk <= k]
        out = batch.take(pa.array(keep_idx))
        return out.append_column("rnk", pa.array(rnk[rnk <= k], pa.int64()))

    return (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(_doc_tok_tf, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["tok"], sort=True)
        .map_batches(score_by_tok, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["doc_id"],
                     sort=True)
        .map_batches(topk_by_doc, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def inverted_index(sf_dir: str, *, min_df: int = 2, max_df: int = 385,
                   num_partitions: int | None = None):
    """Inverted-index build: per token in a document-frequency band,
    the posting list of doc_ids as a comma-joined sorted string
    (a list column would hash differently across engines). The
    ``max_df`` bound is load-bearing at scale: it drops stopword-like
    tokens whose postings would otherwise be corpus-sized rows.
    (tok, df, postings).

    Shape: per-block distinct (doc, tok) partials -> ONE keyed
    exchange on tok -> per-block lexsort (tok, doc_id), run-length df,
    posting lists rebuilt from run offsets over the sorted doc-id
    strings (one ListArray + one binary_join per block, no per-token
    Python), df-band filter at the final (a per-block filter would
    undercount df)."""
    num_partitions = num_partitions or _default_partitions()

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = _doc_tok_tf(batch)
        return t.select(["doc_id", "tok"])

    def build_postings(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        tok = batch.column("tok").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy()
        order = np.lexsort((doc, tok))
        tok, doc = tok[order], doc[order]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, n])
        doc_str = pc.cast(pa.array(doc, pa.int64()), pa.string())
        # int64 offsets + LargeList: a partition's (tok, doc) pair
        # count can exceed 2^31-1 at corpus scale (the same overflow
        # cliff chunk_docs guards with LargeListArray)
        offsets = pa.array(
            np.concatenate((starts, [n])).astype(np.int64), pa.int64()
        )
        postings = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, doc_str), ","
        )
        t = pa.table(
            {
                "tok": pa.array(tok[starts], pa.string()),
                "df": pa.array(lens.astype(np.int64), pa.int64()),
                "postings": postings,
            }
        )
        mask = pc.and_(
            pc.greater_equal(t.column("df"), min_df),
            pc.less_equal(t.column("df"), max_df),
        )
        return t.filter(mask)

    return (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(distinct_pairs, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["tok"], sort=True)
        .map_batches(build_postings, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def fuzzy_decontaminate_docs(sf_dir: str, *, threshold: float = 0.35):
    """Document-level eval-leakage scan (FUZZY decontamination — the
    cross-set near-dup filter LLM training runs beside the gram-overlap
    scan): exact token-3-gram Jaccard between every TRAINING doc and
    every BENCHMARK doc (the ``doc_id % 50 == 0`` subset — the same
    split as :func:`decontaminate_docs`), kept at ``jaccard >=
    threshold``. (doc_id, bench_id, jaccard_x1000 floored).

    Shape — the decontaminate_docs asymmetry exploited for PAIRED
    output: pass 1 gathers the benchmark docs' per-doc distinct gram
    hashes into ONE sorted (gram -> bench doc) broadcast (bounded by
    benchmark volume BY DESIGN — the benchmark is tiny relative to the
    corpus); pass 2 streams the training corpus, and each batch
    resolves its grams' bench postings with two searchsorteds + a
    repeat/cumsum range expansion, counts (train, bench) pair hits
    sparsely via ``np.unique`` (scratch bounded by matched-pair
    volume — contamination — never train x bench), and keeps threshold
    survivors. ZERO shuffles; gram identity is the shared 64-bit
    shingle hash space (the oracled ngram pipelines' accepted
    trade)."""
    import ray

    from hexhamming_ray.functions.hashing import shingle_hashes_batch

    def bench_doc_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = ids % _BENCHMARK_MOD == 0
        texts = [
            t for t, k in zip(batch.column("text").to_pylist(), keep) if k
        ]
        values, counts = shingle_hashes_batch(texts)
        return pa.table(
            {
                "g": pa.array(values, pa.uint64()),
                "bench_id": pa.array(
                    np.repeat(ids[keep], counts), pa.int64()
                ),
            }
        )

    bt = _gather_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            bench_doc_grams, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        ),
        pa.schema([("g", pa.uint64()), ("bench_id", pa.int64())]),
    )
    g_all = bt.column("g").to_numpy()
    bid_all = bt.column("bench_id").to_numpy()
    order = np.lexsort((bid_all, g_all))
    bench_ids, nb = np.unique(bid_all, return_counts=True)
    lut_ref = ray.put(
        (g_all[order], bid_all[order], bench_ids, nb)
    )

    class _FuzzyScan:
        def __init__(self, ref):
            self.ref = ref
            self._lut = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bench_id": pa.array([], pa.int64()),
                    "jaccard_x1000": pa.array([], pa.int64()),
                }
            )
            if self._lut is None:
                self._lut = ray.get(self.ref)
            g_s, bid_s, b_ids, b_n = self._lut
            ids = batch.column("doc_id").to_numpy()
            train = ids % _BENCHMARK_MOD != 0
            if g_s.shape[0] == 0 or not train.any():
                return empty
            texts = [
                t for t, k
                in zip(batch.column("text").to_pylist(), train) if k
            ]
            tids = ids[train]
            values, counts = shingle_hashes_batch(texts)
            if values.shape[0] == 0:
                return empty
            doc_rep = np.repeat(
                np.arange(tids.shape[0], dtype=np.int64), counts
            )
            lo = np.searchsorted(g_s, values, "left")
            lens = np.searchsorted(g_s, values, "right") - lo
            total = int(lens.sum())
            if total == 0:
                return empty
            out_cum = np.concatenate(([0], np.cumsum(lens)))
            pos = (
                np.repeat(lo, lens)
                + np.arange(total, dtype=np.int64)
                - np.repeat(out_cum[:-1], lens)
            )
            pairs = np.stack(
                [np.repeat(doc_rep, lens),
                 np.searchsorted(b_ids, bid_s[pos])],
                axis=1,
            )
            upairs, c = np.unique(pairs, axis=0, return_counts=True)
            na = counts[upairs[:, 0]].astype(np.float64)
            nbv = b_n[upairs[:, 1]].astype(np.float64)
            jac = c / (na + nbv - c)
            keep = jac >= threshold
            return pa.table(
                {
                    "doc_id": pa.array(
                        tids[upairs[keep, 0]], pa.int64()
                    ),
                    "bench_id": pa.array(
                        b_ids[upairs[keep, 1]], pa.int64()
                    ),
                    "jaccard_x1000": pa.array(
                        np.floor(jac[keep] * 1000).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _FuzzyScan(lut_ref), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


def _bag_set_op(a, b, key_cols: list[str], num_partitions: int,
                op: str):
    """Distributed bag-semantics set op: EXCEPT ALL (each key survives
    max(0, count_in_a - count_in_b) times) or INTERSECT ALL (min of the
    two counts). Works on arbitrary input Datasets sharing
    ``key_cols``.

    Shape: each side tags rows with per-side unit counts, the tagged
    union partial-combines per block (one row per key per block — the
    multiset analog of the partial-distinct rule), ONE keyed exchange
    co-locates each key's partials, and the finalize emits each key
    np.repeat'd by its surviving multiplicity. The exchange carries
    key-domain rows, never the input multisets."""
    from hexhamming_ray.pipelines.relational import _combine_runs

    def tag(ca: int, cb: int):
        def f(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {k: batch.column(k) for k in key_cols}
            cols["cnt_a"] = pa.array(np.full(n, ca, dtype=np.int64))
            cols["cnt_b"] = pa.array(np.full(n, cb, dtype=np.int64))
            return pa.table(cols)

        return f

    import ray

    from hexhamming_ray import tune_data_context

    # Same seed discipline as _set_op: the keyed repartition needs the
    # HASH_SHUFFLE DataContext and a union's context snapshot comes
    # from its LEFT-MOST input, so pin the context NOW and lead with a
    # 0-row seed carrying the post-tag schema — this makes the op
    # independent of how the callers built a/b (the docstring promises
    # arbitrary inputs) and keeps the output schema when both inputs
    # are empty.
    tune_data_context(hash_shuffle=True)
    # ONE-ROW sentinel seed with cnt_a = cnt_b = 0: both finalize
    # modes emit max(0, 0-0) = min(0, 0) = 0 copies of it, so the
    # sentinel is invisible to the result even if its key collides
    # with a real key (0 + real counts = real counts) — while giving
    # the union a metadata-known, NON-EMPTY leading input. (A 0-row
    # seed is not enough: the hash-shuffle aggregator infers the
    # exchange schema from the first non-empty metadata-known input,
    # and with none, EMPTY partitions finalize against an empty
    # schema and sort_by raises.) Sentinel key values must be real
    # values, not nulls: _combine_runs lexsorts the key arrays and
    # None does not compare.
    a_schema = a.schema()

    def _sentinel(t: pa.DataType) -> pa.Array:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""], t)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pa.array([b""], t)
        return pa.array([0]).cast(t)

    seed_cols = {
        k: _sentinel(a_schema.base_schema.field(k).type)
        for k in key_cols
    }
    seed_cols["cnt_a"] = pa.array([0], pa.int64())
    seed_cols["cnt_b"] = pa.array([0], pa.int64())
    seed = ray.data.from_arrow(pa.table(seed_cols))

    combine = _combine_runs(key_cols, ["cnt_a", "cnt_b"])
    tagged = (
        seed.union(
            a.map_batches(tag(1, 0), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None),
            b.map_batches(tag(0, 1), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None),
        )
        .map_batches(combine, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=key_cols, sort=True)
        .map_batches(combine, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ca = batch.column("cnt_a").to_numpy()
        cb = batch.column("cnt_b").to_numpy()
        d = (
            np.maximum(ca - cb, 0) if op == "except"
            else np.minimum(ca, cb)
        )
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), d)
        return batch.select(key_cols).take(pa.array(idx, pa.int64()))

    return tagged.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def _docs_bag_sides(sf_dir: str, min_chars: int, lang: str):
    a = _docs(sf_dir, ["lang", "source", "n_chars"],
              hash_shuffle=True).filter(
        expr=f"n_chars > {min_chars}"
    ).select_columns(["lang", "source"])
    b = _docs(sf_dir, ["lang", "source"], hash_shuffle=True).filter(
        expr=f"lang == '{lang}'"
    ).select_columns(["lang", "source"])
    return a, b


def docs_except_all(sf_dir: str, *, min_chars: int = 300,
                    lang: str = "en",
                    num_partitions: int | None = None):
    """EXCEPT ALL over documents (bag semantics, completing the set-op
    family next to docs_intersect / docs_except): the (lang, source)
    multiset of long documents minus the (lang, source) multiset of
    one language's documents — duplicates preserved per the count
    difference. (lang, source) — exploded rows."""
    num_partitions = num_partitions or _default_partitions()
    a, b = _docs_bag_sides(sf_dir, min_chars, lang)
    return _bag_set_op(a, b, ["lang", "source"], num_partitions, "except")


def docs_intersect_all(sf_dir: str, *, min_chars: int = 300,
                       lang: str = "en",
                       num_partitions: int | None = None):
    """INTERSECT ALL over documents (bag semantics): each (lang,
    source) key survives min(count_in_a, count_in_b) times.
    (lang, source) — exploded rows."""
    num_partitions = num_partitions or _default_partitions()
    a, b = _docs_bag_sides(sf_dir, min_chars, lang)
    return _bag_set_op(a, b, ["lang", "source"], num_partitions,
                       "intersect")


def docs_orc_roundtrip(sf_dir: str):
    """Source/sink format conformance, ORC flavor — through the
    engine's CUSTOM datasource/datasink pair (sources/orc.py; Ray
    ships no ORC connector, so this exercises the public
    FileBasedDatasource / BlockBasedFileDatasink extension surface).
    Documents written as one ORC file per block, read back one block
    per ORC STRIPE, projected to (doc_id, lang, n_chars) — oracled
    against the parquet originals, so any ORC encode/decode corruption
    breaks the value hash."""
    from hexhamming_ray.sources.orc import read_orc, write_orc

    d = _roundtrip_dir(sf_dir, "orc")
    write_orc(_docs(sf_dir, ["doc_id", "lang", "n_chars"]), d)
    back = read_orc(d, columns=["doc_id", "lang", "n_chars"])

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang").cast(pa.string()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    return back.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def gopher_filter_docs(sf_dir: str, *, min_tokens: int = 30,
                       max_tokens: int = 100_000,
                       min_wl_x1000: int = 3_000,
                       max_wl_x1000: int = 4_700,
                       max_dup_x1000: int = 120):
    """Composite Gopher-style quality FILTER (the canonical
    pretraining-data cleaning step, applied as one fused pass): keep
    documents whose token count, punctuation ratio, mean word length
    and duplicated-bigram fraction all fall inside their bounds.
    (doc_id, n_tokens, dup_x1000) — surviving documents with the two
    discriminating signals.

    Every rule is an exact integer surrogate shared with the oracle:
    mean word length rides ``(1000 * n_nonspace) // n_tokens`` (floor
    division on both sides — no float ratio is hashed), the
    punctuation rule is quality_scores' ``n_punct * 5 <= n_chars + 1``,
    and the repetition signal is ngram_repetition_docs' permille with
    <2-token documents contributing 0 (the oracle's COALESCE).

    Scale shape: ALL four signals are per-document, so the filter is
    one fused map_batches over the corpus — ZERO shuffle at any size;
    the bigram hasher and the regex counts are the same vectorized
    kernels the individual signal queries use."""

    def f(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        q = T.quality_features(txt)
        n_tok = q["n_tokens"].to_numpy()
        n_chars = q["n_chars"].to_numpy()
        n_punct = q["n_punct"].to_numpy()
        n_nonspace = n_chars - pc.count_substring_regex(
            txt, r"\s"
        ).to_numpy()
        nb, nd = bigram_repetition_batch(txt.to_pylist())
        dup = np.where(nb > 0, 1000 * nd // np.maximum(nb, 1), 0)
        wl = 1000 * n_nonspace // np.maximum(n_tok, 1)
        keep = (
            (n_tok >= min_tokens) & (n_tok <= max_tokens)
            & (n_punct * 5 <= n_chars + 1)
            & (wl >= min_wl_x1000) & (wl <= max_wl_x1000)
            & (dup < max_dup_x1000)
        )
        mask = pa.array(keep)
        return pa.table(
            {
                "doc_id": pc.array_filter(batch.column("doc_id"), mask),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "dup_x1000": pa.array(dup[keep], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def docs_feather_roundtrip(sf_dir: str):
    """Source/sink format conformance, Arrow IPC / Feather-V2 flavor —
    the second custom connector (sources/orc.py IpcDatasource /
    IpcDatasink): documents written as one IPC file per block, read
    back one block per RECORD BATCH, projected to (doc_id, lang,
    n_chars) — oracled against the parquet originals."""
    from hexhamming_ray.sources.orc import read_ipc, write_ipc

    d = _roundtrip_dir(sf_dir, "feather")
    write_ipc(_docs(sf_dir, ["doc_id", "lang", "n_chars"]), d)
    back = read_ipc(d, columns=["doc_id", "lang", "n_chars"])

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang").cast(pa.string()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    return back.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def sample_k_docs(sf_dir: str, *, k: int = 40):
    """Deterministic k-RESERVOIR sample: exactly the k documents with
    the smallest md5(doc_id) digests — a reproducible, corpus-size-
    independent "give me exactly K rows" sampler (doc_sample and
    weighted_sample_docs are RATE samplers; this one is a COUNT
    sampler). (doc_id, n_chars), the k winners.

    Scale shape: per-block partial top-k by digest (each block's k
    smallest are a superset of the global k) -> one <= k x n_blocks
    merge block -> final top-k. No sort of the corpus, no shuffle —
    the same superset-filter argument as the argmax family."""
    import hashlib as _hl

    def digests(ids: np.ndarray) -> np.ndarray:
        return np.asarray(
            [
                _hl.md5(str(int(i)).encode()).hexdigest()
                for i in ids
            ]
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = digests(ids)
        order = np.argsort(h, kind="stable")[:k]
        return batch.take(pa.array(order))

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(local_topk, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=1)
        .map_batches(local_topk, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def lang_balance_docs(sf_dir: str, *, cap: int | None = None,
                      num_partitions: int | None = None):
    """Language rebalancing for training-corpus curation: keep at most
    ``cap`` documents per language (default: the size of the SMALLEST
    language, so every language ends up equal-sized), selected
    deterministically as the ``cap`` docs with the lowest
    (md5(doc_id), doc_id) within their language — a reproducible
    uniform subsample that is a pure function of corpus content, so
    reruns, resumes and any cluster size pick the identical subset.
    (doc_id, lang).

    Shape: per-language EXACT rank without a global or per-group sort
    — the shuffle_docs distributed prefix sum keyed by (lang, digest
    byte). Pass A: per-block histograms over ``lang_id * 256 +
    first_md5_byte`` composite buckets -> one tiny coalesce (langs x
    256 rows/block bound) -> the driver holds the per-lang exclusive
    prefix bases AND the per-lang totals (cap = min total). Pass B:
    bucket-keyed exchange of 32-byte rows (text never moves), one
    lexsort per block + run-reset cumcount + base[bucket], keep rank
    < cap. The lang string rides as a small int id; only the kept
    (doc_id, lang) rows materialize."""
    import hashlib as _hl

    num_partitions = num_partitions or _default_partitions()

    # lang domain (tiny by assumption — same contract as
    # top_tokens_per_lang): per-block unique -> one coalesced unique
    lang_parts = (
        _docs(sf_dir, ["lang"])
        .map_batches(
            lambda b: pa.table(
                {"lang": pc.unique(b.column("lang").combine_chunks())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .repartition(num_blocks=1)
        .map_batches(
            lambda b: pa.table(
                {"lang": pc.unique(b.column("lang").combine_chunks())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .take_all()
    )
    langs = np.array(sorted(r["lang"] for r in lang_parts))
    n_langs = len(langs)
    if n_langs == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
            }
        )
    lang_vs = pa.array(langs, pa.string())
    n_buckets = n_langs * 256

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy()
        lid = pc.index_in(
            batch.column("lang"), value_set=lang_vs
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        dig = b"".join(
            _hl.md5(str(int(i)).encode()).digest() for i in ids
        )
        k = np.frombuffer(dig, dtype=">u8").reshape(-1, 2)
        k1 = k[:, 0].astype(np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k1": pa.array(k1, pa.uint64()),
                "k2": pa.array(k[:, 1].astype(np.uint64), pa.uint64()),
                "bucket": pa.array(
                    lid * 256 + (k1 >> np.uint64(56)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    keyed = (
        _docs(sf_dir, ["doc_id", "lang"], hash_shuffle=True)
        .map_batches(key_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .materialize()  # consumed twice: histogram pass + rank pass
    )

    per_lang = _bucket_counts(keyed, n_buckets).reshape(n_langs, 256)
    if cap is None:
        cap = int(per_lang.sum(axis=1).min())
    # exclusive prefix WITHIN each lang: rank resets at lang boundary
    bases = np.concatenate(
        [
            np.concatenate(([0], np.cumsum(row)[:-1]))
            for row in per_lang
        ]
    )
    kcap = int(cap)

    def rank_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                }
            )
        ids = batch.column("doc_id").to_numpy()
        k1 = batch.column("k1").to_numpy()
        k2 = batch.column("k2").to_numpy()
        bk = batch.column("bucket").to_numpy()
        order = np.lexsort((ids, k2, k1, bk))
        bk_s = bk[order]
        # 0-based within-lang rank
        rank = bases[bk_s] + _run_reset_within(bk_s)
        keep = rank < kcap
        return pa.table(
            {
                "doc_id": pa.array(ids[order][keep], pa.int64()),
                "lang": pa.array(
                    langs[(bk_s[keep] // 256)], pa.string()
                ),
            }
        )

    return (
        keyed.repartition(
            num_blocks=min(num_partitions, n_buckets),
            keys=["bucket"], sort=True,
        )
        .map_batches(rank_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


#: bucket count for the curriculum range partitioner — the driver
#: holds O(CURRICULUM_BUCKETS) ints; more buckets = finer skew
#: spreading at the exchange, same exactness
CURRICULUM_BUCKETS = 1024


def _bucket_counts(keyed, n_buckets: int) -> np.ndarray:
    """Pass A of the distributed prefix-sum rank (shared by
    shuffle_docs / lang_balance_docs / curriculum_order_docs):
    per-block histograms over an int64 ``bucket`` column -> one tiny
    coalesce (``n_buckets`` rows/block bound) -> the dense per-bucket
    totals, driver-side (O(n_buckets) ints). Exclusive-prefix these
    for the per-bucket rank bases."""

    def bucket_hist(batch: pa.Table) -> pa.Table:
        cnt = np.bincount(
            batch.column("bucket").to_numpy(), minlength=n_buckets
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(n_buckets, dtype=np.int64)
                ),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    from hexhamming_ray.pipelines.relational import _combine_runs

    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in (
        keyed.map_batches(bucket_hist, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=1)
        .map_batches(_combine_runs(["bucket"], ["cnt"]),
                     batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .take_all()
    ):
        counts[r["bucket"]] = r["cnt"]
    return counts


def _run_reset_within(sorted_keys: np.ndarray) -> np.ndarray:
    """0-based position within each run of equal adjacent keys — the
    pass-B cumcount of the prefix-sum rank, applied to an array
    already sorted so runs are contiguous."""
    m = sorted_keys.shape[0]
    new = np.zeros(m, dtype=bool)
    new[0] = True
    new[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.flatnonzero(new)
    return np.arange(m, dtype=np.int64) - np.repeat(
        starts, np.diff(np.r_[starts, m])
    )


def _parquet_col_max(path: str, col: str) -> int | None:
    """Column max from parquet row-group STATISTICS — metadata only,
    no data scan. Returns -1 for a 0-row file (the caller's empty
    path) and None when any row group lacks usable stats (caller
    falls back to a scan)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    md = f.metadata
    if md.num_rows == 0:
        return -1
    idx = f.schema_arrow.get_field_index(col)
    if idx < 0:
        return None
    mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        v = st.max
        mx = v if mx is None else max(mx, v)
    return int(mx)


def curriculum_order_docs(sf_dir: str, *, num_partitions: int | None = None):
    """Curriculum ordering for training: each document's 1-based
    position in (n_chars DESC, doc_id ASC) order — longest-first, the
    classic length-curriculum schedule. (doc_id, n_chars,
    curriculum_pos).

    Shape: a distributed ROW_NUMBER over an ARBITRARY integer key —
    the third application of the prefix-sum rank (after shuffle_docs'
    md5 buckets and pack_sequences' doc_id buckets), this time with
    RANGE buckets derived from the data: pass 0 finds the key max
    from parquet row-group STATISTICS (metadata only, no scan; a
    per-block max pass is the fallback when any group lacks stats),
    ``bucket = (NB-1) - min(n_chars // Q, NB-1)`` maps keys onto
    ``CURRICULUM_BUCKETS``
    ordered ranges (bucket ascends as the key descends), pass A
    histograms the buckets -> driver exclusive prefix (O(NB) ints),
    pass B is one bucket-keyed exchange of 16-byte rows + a per-block
    lexsort + run-reset cumcount. No Dataset.sort, text never moves;
    a value-skewed corpus degrades to fewer effective buckets (range
    partitioning's usual caveat), never to wrong ranks."""
    num_partitions = num_partitions or _default_partitions()
    nb = CURRICULUM_BUCKETS

    keyed = _docs(sf_dir, ["doc_id", "n_chars"], hash_shuffle=True) \
        .materialize()  # narrow rows, consumed twice

    mx = _parquet_col_max(f"{sf_dir}/documents.parquet", "n_chars")
    if mx is None:
        # stats absent: per-block max pass over the narrow rows
        def block_max(batch: pa.Table) -> pa.Table:
            v = batch.column("n_chars").to_numpy()
            return pa.table(
                {
                    "mx": pa.array(
                        [int(v.max()) if len(v) else -1], pa.int64()
                    )
                }
            )

        mx = -1
        for r in keyed.map_batches(
            block_max, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).take_all():
            mx = max(mx, int(r["mx"]))
    if mx < 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "curriculum_pos": pa.array([], pa.int64()),
            }
        )
    q = max(1, -(-(mx + 1) // nb))

    def to_bucket(nc: np.ndarray) -> np.ndarray:
        return (nb - 1) - np.minimum(nc // q, nb - 1)

    def with_bucket(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": pa.array(nc, pa.int64()),
                "bucket": pa.array(to_bucket(nc), pa.int64()),
            }
        )

    bucketed = keyed.map_batches(
        with_bucket, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    counts = _bucket_counts(bucketed, nb)
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def rank_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "curriculum_pos": pa.array([], pa.int64()),
                }
            )
        ids = batch.column("doc_id").to_numpy()
        nc = batch.column("n_chars").to_numpy()
        bk = batch.column("bucket").to_numpy()
        order = np.lexsort((ids, -nc, bk))
        bk_s = bk[order]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(nc[order], pa.int64()),
                "curriculum_pos": pa.array(
                    bases[bk_s] + _run_reset_within(bk_s) + 1,
                    pa.int64(),
                ),
            }
        )

    return (
        bucketed.repartition(num_blocks=min(num_partitions, nb),
                             keys=["bucket"], sort=True)
        .map_batches(rank_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


#: fixed ASCII stopword list for the Gopher-style stopword signal
#: (mirrored literally in the SQL oracle's IN list)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
    "this",
)


def stopword_ratio_docs(sf_dir: str):
    """(doc_id, n_tokens, n_stop, stop_permille) — per-document
    stopword statistics (the Gopher rule's 'must contain >= 2 of a
    fixed stopword list' signal, plus the density in exact integer
    permille). Tokens are lowercased before membership, so ALL-CAPS
    boilerplate still counts. Pure per-batch map, ZERO shuffle at any
    corpus size; empty docs emit (0, 0, 0)."""
    import hexhamming_ray.functions.text as T

    sw = pa.array(list(STOPWORDS), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        text = batch.column("text")
        toks = pc.utf8_split_whitespace(text)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat = toks.flatten()
        # utf8_split_whitespace emits empty boundary tokens for
        # leading/trailing whitespace; drop them so the flat token
        # stream (and any count derived from it) agrees with the \S+
        # token_count used for n_tokens
        nonempty = pc.not_equal(
            pc.binary_length(flat), 0
        ).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        doc_rep = doc_rep[nonempty]
        m = pc.is_in(
            pc.utf8_lower(flat), value_set=sw
        ).to_numpy(zero_copy_only=False)
        ns = np.bincount(doc_rep[m], minlength=n).astype(np.int64)
        nt = T.token_count(text).to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
                "stop_permille": pa.array(
                    np.where(nt > 0, 1000 * ns // np.maximum(nt, 1), 0),
                    pa.int64(),
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
