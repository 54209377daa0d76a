"""Hamming-key entity resolution: EXACT all-pairs Hamming search over
fixed-width normalized record keys via pigeonhole band blocking.

This is the reference's core predicate — ``check_hexstrings_within_dist``
(``python_hexhamming.h:149-151``) / the batch scorer behind the method
table at ``python_hexhamming.cc:421-428`` — lifted from a single
pairwise call to a corpus-scale blocked search: two documents whose
fixed-width keys differ in at most ``max_dist`` byte positions MUST
agree exactly on at least one of ``max_dist + 1`` contiguous key bands
(pigeonhole), so grouping by (band index, band value) finds every
qualifying pair with recall 1.0 — no similarity estimate, no missed
edge. The multi-index idea is public knowledge (Norouzi, Punjani &
Fleet, "Fast Search in Hamming Space with Multi-Index Hashing",
CVPR 2012); the implementation below is original Ray Data engineering.

Scale shape:

1. ONE pruned read of (doc_id, text); keys are cut and space-padded
   per block (byte matrix via ``pad_matrix`` — zero per-row Python).
   Each doc emits ``n_bands`` narrow rows: (ckey, doc_id, key) where
   ckey packs (band, band bytes) into one int64 and key is the
   ``key_len``-byte normalized key (it rides along so verification
   happens in the candidate's own block — no re-join with the corpus).
2. ONE keyed exchange on ckey (hash partition; in-block lexsort, no
   pre-sort — ENGINEERING_NOTES #69). Equal-ckey runs are candidate
   buckets; within a run, pair emission is vectorized (len-2 fast
   path + triu per longer run, the ``_pairs_from_runs`` shape).
3. In-block verify: full-key byte Hamming distance for every candidate
   pair at once (ONE ``!=`` broadcast + row sum — the same
   loop-over-width-not-rows structure as stages/scoring.py), kept when
   ``<= max_dist``. CANONICAL-BAND emission dedups across bands with
   zero extra movement: a surviving pair is emitted only from the
   FIRST band on which the two keys agree, so the global output is
   exactly-once by construction (no distinct exchange).

Flood note (honest): a group of m documents sharing a near-identical
key is m(m-1)/2 TRUE pairs — quadratic output is inherent to the
operator's exact semantics, not a blocking artifact (contrast the
approximate LSH family in pipelines/text.py, which caps floods and
reports ``pairs_capped``). Peak per-run memory is proportional to that
run's own output. The exchange itself stays narrow: n_bands x
(8 + 8 + key_len) bytes per document, independent of text length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray.functions.strsim import pad_matrix

# label-remap broadcast cap for hamming_key_clusters (same size-switch
# as graph_components; above it the sort-based remap runs driver-free)
HAMKEY_LABEL_BROADCAST_CAP = 2_000_000


def _band_offsets(key_len: int, n_bands: int) -> np.ndarray:
    """Band boundary offsets [0 .. key_len], widths as even as
    possible (the wide bands first — ceil then floor)."""
    base, extra = divmod(key_len, n_bands)
    widths = np.full(n_bands, base, dtype=np.int64)
    widths[:extra] += 1
    return np.concatenate(([0], np.cumsum(widths)))


def _key_matrix(text_col, key_len: int):
    """Arrow string column -> (n, key_len) uint8 matrix: the SPACE-
    padded first ``key_len`` bytes of the document's PRINTABLE-ASCII
    projection (bytes 0x20-0x7E kept, everything else dropped).
    Multi-byte UTF-8 sequences consist entirely of bytes >= 0x80 and
    ASCII bytes map 1:1 to codepoints, so this byte-level strip equals
    DuckDB's codepoint-level ``regexp_replace(text, '[^ -~]', '',
    'g')`` — the ``mismatches`` oracle (which REQUIRES equal byte
    length) stays exact on ANY unicode corpus, pinned by the
    adversarial CJK/accent corpus test. One pass over the flattened
    utf-8 buffer, no per-row Python."""
    from hexhamming_ray.functions.hashing import utf8_view

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    buf, lens, starts = utf8_view(text_col)
    n = lens.shape[0]
    mat = np.full((n, max(key_len, 1)), 0x20, dtype=np.uint8)
    total = int(lens.sum())
    if n == 0 or total == 0:
        return mat
    # utf8_view guarantees docs back-to-back in buf from starts[0]
    vals = buf[starts[0]: starts[0] + total]
    keep = (vals >= 0x20) & (vals <= 0x7E)
    offs = np.concatenate(([0], np.cumsum(lens)))
    cs = np.concatenate(([0], np.cumsum(keep)))
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
    # 1-based rank of each KEPT byte within its own document
    rank = cs[1:] - cs[offs[:-1]][doc_rep]
    sel = keep & (rank <= key_len)
    mat[doc_rep[sel], rank[sel] - 1] = vals[sel]
    return mat


def _pack_bands(mat: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """(n, key_len) byte matrix -> (n_bands, n) int64 band values:
    band bytes big-endian-packed into one integer (width <= 7 bytes so
    (band << shift) | value stays inside int64)."""
    n_bands = offs.shape[0] - 1
    out = np.empty((n_bands, mat.shape[0]), dtype=np.int64)
    for b in range(n_bands):
        seg = mat[:, offs[b]:offs[b + 1]].astype(np.int64)
        v = np.zeros(mat.shape[0], dtype=np.int64)
        for j in range(seg.shape[1]):
            v = (v << 8) | seg[:, j]
        out[b] = v
    return out


def hamming_key_pairs(sf_dir: str, *, key_len: int = 32,
                      max_dist: int = 6,
                      num_partitions: int | None = None,
                      pair_filter=None):
    """All document pairs whose normalized keys (space-padded first
    ``key_len`` bytes of the printable-ASCII projection, see
    :func:`_key_matrix`) are within Hamming distance ``max_dist``
    (positional byte mismatches — DuckDB ``mismatches`` semantics),
    found exactly via pigeonhole band blocking.
    (a_id, b_id, ham_dist), a_id < b_id.
    ``pair_filter(a_ids, b_ids) -> bool mask`` drops pairs INSIDE the
    pair block before emission (the _sn_scored_pairs hook — cross-set
    variants pay no extra stage)."""
    from hexhamming_ray.pipelines.text import _default_partitions, _docs

    n_bands = max_dist + 1
    offs = _band_offsets(key_len, n_bands)
    width = int((offs[1:] - offs[:-1]).max())
    if width > 7 or n_bands << (8 * width) >= 1 << 63:
        raise ValueError(
            f"band value must fit int64: key_len={key_len} over "
            f"{n_bands} bands needs {width}-byte bands (max 7)"
        )
    shift = 8 * width
    num_partitions = num_partitions or _default_partitions()

    def key_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        mat = _key_matrix(batch.column("text"), key_len)
        bvals = _pack_bands(mat, offs)
        ids = batch.column("doc_id").to_numpy()
        band_idx = np.repeat(
            np.arange(n_bands, dtype=np.int64), n
        )
        ckey = (band_idx << shift) | bvals.reshape(-1)
        keys = np.ascontiguousarray(mat).view(f"S{key_len}").ravel()
        return pa.table(
            {
                "ckey": pa.array(ckey, pa.int64()),
                "doc_id": pa.array(np.tile(ids, n_bands), pa.int64()),
                "key": pa.array(np.tile(keys, n_bands)),
            }
        )

    def pair_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a_id": pa.array([], pa.int64()),
                "b_id": pa.array([], pa.int64()),
                "ham_dist": pa.array([], pa.int64()),
            }
        )
        n = len(batch)
        if n < 2:
            return empty
        ckey = batch.column("ckey").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        kmat, _ = pad_matrix(batch.column("key"), width=key_len)
        order = np.lexsort((ids, ckey))
        ckey, ids, kmat = ckey[order], ids[order], kmat[order]
        change = np.flatnonzero(ckey[1:] != ckey[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        lens = ends - starts
        ii_l, jj_l = [], []
        m2 = lens == 2
        if m2.any():
            s = starts[m2]
            ii_l.append(s)
            jj_l.append(s + 1)
        for s, e in zip(starts[lens >= 3], ends[lens >= 3]):
            ii, jj = np.triu_indices(int(e - s), k=1)
            ii_l.append(ii + s)
            jj_l.append(jj + s)
        if not ii_l:
            return empty
        ii = np.concatenate(ii_l)
        jj = np.concatenate(jj_l)
        diff = kmat[ii] != kmat[jj]  # (P, key_len)
        ham = diff.sum(axis=1).astype(np.int64)
        keep = ham <= max_dist
        # canonical-band emission: only the FIRST band on which the
        # two keys agree owns the pair (exactly-once, no distinct)
        pair_band = ckey[ii] >> shift
        band_eq = np.empty((n_bands, ii.shape[0]), dtype=bool)
        for b in range(n_bands):
            band_eq[b] = ~diff[:, offs[b]:offs[b + 1]].any(axis=1)
        first_eq = band_eq.argmax(axis=0)
        keep &= first_eq == pair_band
        if pair_filter is not None:
            keep &= pair_filter(ids[ii], ids[jj])
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        return pa.table(
            {
                "a_id": pa.array(np.minimum(a, b), pa.int64()),
                "b_id": pa.array(np.maximum(a, b), pa.int64()),
                "ham_dist": pa.array(ham[keep], pa.int64()),
            }
        )

    banded = _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True
                   ).map_batches(
        key_rows, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return banded.repartition(
        num_blocks=num_partitions, keys=["ckey"], sort=False
    ).map_batches(
        pair_block, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def hamming_decontaminate(sf_dir: str, *, key_len: int = 32,
                          max_dist: int = 6,
                          num_partitions: int | None = None):
    """POSITIONAL decontamination: training documents whose fixed-width
    key is within Hamming ``max_dist`` of a BENCHMARK document's
    (the ``doc_id % 50 == 0`` eval subset — the same convention as
    ``decontaminate_docs`` / ``fuzzy_decontaminate_jw``). The fourth
    decontamination modality: exact n-gram overlap, cross-set Jaccard,
    JW edit tolerance, and now positional byte agreement — catches
    templated contamination where a fixed-layout header matches
    byte-for-byte up to a few substituted fields.
    (doc_id, bench_id, ham_dist).

    Shape: the pigeonhole pair machinery with the cross-side mask
    applied INSIDE the pair block (pure doc_id arithmetic, no second
    table, no join); recall 1.0 by construction as always."""

    def cross_side(a_ids, b_ids):
        return (a_ids % 50 == 0) != (b_ids % 50 == 0)

    pairs = hamming_key_pairs(
        sf_dir, key_len=key_len, max_dist=max_dist,
        num_partitions=num_partitions, pair_filter=cross_side,
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        a_is_bench = a % 50 == 0
        return pa.table(
            {
                "doc_id": pa.array(np.where(a_is_bench, b, a), pa.int64()),
                "bench_id": pa.array(np.where(a_is_bench, a, b),
                                     pa.int64()),
                "ham_dist": batch.column("ham_dist"),
            }
        )

    return pairs.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def er_hamming_eval(sf_dir: str, *, key_len: int = 32,
                    max_dist: int = 6):
    """Pair-level precision/recall of the Hamming-key blocker against
    the exact token-3-gram Jaccard >= 0.5 truth set — the
    ``er_fuzzy_eval`` report for the pigeonhole family, so a
    practitioner can read positional-key matching against the
    edit-window blockers on the same scale. ONE row: (pairs_pred,
    pairs_truth, pairs_both, precision_ppm, recall_ppm).

    Scale shape: both pair sets meet in the shared
    ``_pair_eval_counts`` single-exchange counter (tagged 17-byte
    rows, adjacent-duplicate overlap, single-row partials)."""
    from hexhamming_ray.pipelines.strmatch import _pair_eval_counts
    from hexhamming_ray.pipelines.text import ngram_jaccard_exact

    n_pred, n_truth, n_both = _pair_eval_counts(
        hamming_key_pairs(sf_dir, key_len=key_len, max_dist=max_dist),
        ngram_jaccard_exact(sf_dir),
    )
    return pa.table(
        {
            "pairs_pred": pa.array([n_pred], pa.int64()),
            "pairs_truth": pa.array([n_truth], pa.int64()),
            "pairs_both": pa.array([n_both], pa.int64()),
            "precision_ppm": pa.array(
                [1_000_000 * n_both // n_pred if n_pred else 0],
                pa.int64(),
            ),
            "recall_ppm": pa.array(
                [1_000_000 * n_both // n_truth if n_truth else 0],
                pa.int64(),
            ),
        }
    )


def hamming_key_clusters(sf_dir: str, *, key_len: int = 32,
                         max_dist: int = 6,
                         num_partitions: int | None = None):
    """Connected components over the ``hamming_key_pairs`` edge list:
    every document labeled with the MIN doc_id reachable through
    Hamming-``max_dist`` key matches — the exact-Hamming sibling of
    ``er_exact_clusters``. (doc_id, component).

    Scale shape: edges-only distributed union-find (state/unionfind.py,
    the flagship ER machinery); the label remap is size-switched under
    ``HAMKEY_LABEL_BROADCAST_CAP`` with the sort-based driver-free
    remap above it, like every broadcast plan in the repo."""
    from hexhamming_ray.pipelines.text import _docs
    from hexhamming_ray.state.unionfind import (
        connected_components,
        label_nodes,
    )

    edges = hamming_key_pairs(
        sf_dir, key_len=key_len, max_dist=max_dist,
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: pa.table(
            {"id_lo": b.column("a_id"), "id_hi": b.column("b_id")}
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    labels = connected_components(edges)
    nodes = _docs(sf_dir, ["doc_id"], hash_shuffle=True)
    return label_nodes(labels, nodes, "doc_id", "component",
                       broadcast_cap=HAMKEY_LABEL_BROADCAST_CAP)


def hamming_threshold_sweep(sf_dir: str, *, key_len: int = 32,
                            max_dist: int = 6,
                            num_partitions: int | None = None):
    """DISTANCE-THRESHOLD SWEEP for the pigeonhole Hamming-key
    blocker: pair-level precision/recall/F1 vs the exact-Jaccard
    truth set at every distance 0..``max_dist``, from ONE scored
    pass — the positional-key twin of ``er_threshold_sweep`` (the
    reference's ``check_hexstrings_within_dist`` predicate swept over
    its ``max_dist`` argument, evaluated as an ER operating-point
    table). One row per distance: (max_dist, pairs_pred, pairs_truth,
    pairs_both, precision_ppm, recall_ppm, f1_ppm).

    Shape: scored pairs at the LOOSEST distance + truth pairs in one
    tagged union -> ONE keyed exchange on the unordered pair -> each
    block counts all distances from one lexsort (pred rows carry
    ham_dist); single-row-per-distance partials + a truth-count
    sentinel coalesce driver-side."""
    import numpy as np
    import pyarrow as pa

    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        ngram_jaccard_exact,
    )

    num_partitions = num_partitions or _default_partitions()
    dists = np.arange(max_dist + 1, dtype=np.int64)
    pred = hamming_key_pairs(sf_dir, key_len=key_len,
                             max_dist=max_dist)
    truth = ngram_jaccard_exact(sf_dir)

    def tag_pred(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
                "side": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "d": batch.column("ham_dist").cast(pa.int64()),
            }
        )

    def tag_truth(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").cast(pa.int64()),
                "id_hi": batch.column("id_hi").cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "d": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    empty = pa.table(
        {
            "thr": pa.array([], pa.int64()),
            "n_pred": pa.array([], pa.int64()),
            "n_both": pa.array([], pa.int64()),
        }
    )

    def count_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        sd = batch.column("side").to_numpy()
        dv = batch.column("d").to_numpy()
        order = np.lexsort((sd, hi, lo))
        lo_s, hi_s, sd_s = lo[order], hi[order], sd[order]
        succ_same = np.concatenate(
            ((lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])
             & (sd_s[1:] == 1), [False])
        )
        pred_rows = sd_s == 0
        d_p = dv[order][pred_rows]
        matched = succ_same[pred_rows]
        ok = d_p[:, None] <= dists[None, :]
        out = pa.table(
            {
                "thr": pa.array(dists, pa.int64()),
                "n_pred": pa.array(
                    ok.sum(axis=0).astype(np.int64), pa.int64()
                ),
                "n_both": pa.array(
                    (ok & matched[:, None]).sum(axis=0).astype(np.int64),
                    pa.int64(),
                ),
            }
        )
        return pa.concat_tables(
            [
                out,
                pa.table(
                    {
                        "thr": pa.array([-1], pa.int64()),
                        "n_pred": pa.array(
                            [int((sd_s == 1).sum())], pa.int64()
                        ),
                        "n_both": pa.array([0], pa.int64()),
                    }
                ),
            ]
        )

    rows = (
        pred.map_batches(tag_pred, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(truth.map_batches(tag_truth, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=num_partitions,
                     keys=["id_lo", "id_hi"])
        .map_batches(count_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    n_truth = sum(int(r["n_pred"]) for r in rows if r["thr"] == -1)
    agg = {int(t): [0, 0] for t in dists}
    for r in rows:
        if r["thr"] >= 0:
            agg[int(r["thr"])][0] += int(r["n_pred"])
            agg[int(r["thr"])][1] += int(r["n_both"])
    out = {
        "max_dist": [], "pairs_pred": [], "pairs_truth": [],
        "pairs_both": [], "precision_ppm": [], "recall_ppm": [],
        "f1_ppm": [],
    }
    for t in dists:
        np_, nb = agg[int(t)]
        prec = 1_000_000 * nb // np_ if np_ else 0
        rec = 1_000_000 * nb // n_truth if n_truth else 0
        out["max_dist"].append(int(t))
        out["pairs_pred"].append(np_)
        out["pairs_truth"].append(n_truth)
        out["pairs_both"].append(nb)
        out["precision_ppm"].append(prec)
        out["recall_ppm"].append(rec)
        out["f1_ppm"].append(
            2 * prec * rec // (prec + rec) if prec + rec else 0
        )
    return pa.table(
        {k: pa.array(v, pa.int64()) for k, v in out.items()}
    )


def hamming_incremental_assign(sf_dir: str, *, key_len: int = 32,
                               max_dist: int = 6, mod: int = 10,
                               num_partitions: int | None = None):
    """INCREMENTAL ER ON THE REFERENCE'S PREDICATE — assign, don't
    re-resolve, with EXACT-recall blocking: documents with
    ``doc_id % mod == 0`` are the newly-arrived batch; base clusters
    are the Hamming-``max_dist`` components over base docs only, and
    each new doc joins the cluster of its NEAREST base key (smallest
    positional Hamming distance ``<= max_dist``, ties toward the
    smaller base id) or founds a singleton. Unlike the JW variant
    (:func:`~hexhamming_ray.pipelines.strmatch.er_incremental_assign`,
    whose sorted-neighborhood blocking is rank-dependent), pigeonhole
    band blocking is rank-free, so restricting to base-base /
    delta-base pairs is a pure ``pair_filter`` predicate INSIDE the
    existing pair blocks — recall stays 1.0 by construction on both
    sides and no new blocking machinery exists to drift. Output:
    (doc_id, cluster_id) for the DELTA docs only.

    Scale shape: the two candidate passes ride the standard banded
    exchange; the three assignment exchanges carry 16-24-byte rows
    (nearest-base run argmin, label attach by run merge, tagged
    anti-union closing unmatched deltas)."""
    from hexhamming_ray.pipelines.text import _default_partitions, _docs
    from hexhamming_ray.state.unionfind import (
        connected_components,
        label_nodes,
    )

    num_partitions = num_partitions or _default_partitions()

    def base_base(a_ids, b_ids):
        return (a_ids % mod != 0) & (b_ids % mod != 0)

    def cross_set(a_ids, b_ids):
        return (a_ids % mod == 0) != (b_ids % mod == 0)

    base_edges = hamming_key_pairs(
        sf_dir, key_len=key_len, max_dist=max_dist,
        num_partitions=num_partitions, pair_filter=base_base,
    ).map_batches(
        lambda b: pa.table(
            {"id_lo": b.column("a_id"), "id_hi": b.column("b_id")}
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )

    def base_only(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(ids % mod != 0))

    base_labels = label_nodes(
        connected_components(base_edges),
        _docs(sf_dir, ["doc_id"], hash_shuffle=True).map_batches(
            base_only, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        "doc_id", "cluster_id",
        broadcast_cap=HAMKEY_LABEL_BROADCAST_CAP,
    )

    cross = hamming_key_pairs(
        sf_dir, key_len=key_len, max_dist=max_dist,
        num_partitions=num_partitions, pair_filter=cross_set,
    )

    def cross_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        d = batch.column("ham_dist").to_numpy()
        a_d = a % mod == 0
        return pa.table(
            {
                "delta_id": pa.array(np.where(a_d, a, b), pa.int64()),
                "base_id": pa.array(np.where(a_d, b, a), pa.int64()),
                "d": pa.array(d, pa.int64()),
            }
        )

    empty_best = pa.table(
        {
            "base_id": pa.array([], pa.int64()),
            "delta_id": pa.array([], pa.int64()),
        }
    )

    def best_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_best
        dl = batch.column("delta_id").to_numpy()
        b = batch.column("base_id").to_numpy()
        d = batch.column("d").to_numpy()
        order = np.lexsort((b, d, dl))
        dl_s, b_s = dl[order], b[order]
        heads = np.concatenate(([True], dl_s[1:] != dl_s[:-1]))
        return pa.table(
            {
                "base_id": pa.array(b_s[heads], pa.int64()),
                "delta_id": pa.array(dl_s[heads], pa.int64()),
            }
        )

    best = (
        cross.map_batches(cross_rows, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["delta_id"])
        .map_batches(best_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )

    def tag_label(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("doc_id").cast(pa.int64()),
                "v": batch.column("cluster_id").cast(pa.int64()),
                "side": pa.array(np.zeros(len(batch), np.int64),
                                 pa.int64()),
            }
        )

    def tag_best(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("base_id").cast(pa.int64()),
                "v": batch.column("delta_id").cast(pa.int64()),
                "side": pa.array(np.ones(len(batch), np.int64),
                                 pa.int64()),
            }
        )

    empty_asg = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
        }
    )

    def attach_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_asg
        k = batch.column("k").to_numpy()
        v = batch.column("v").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, k))
        k_s, v_s, s_s = k[order], v[order], s[order]
        heads = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(heads)
        if s_s[starts].any():
            raise ValueError(
                "hamming incremental attach: base id missing its "
                "label row"
            )
        run_idx = np.cumsum(heads) - 1
        labels_per_row = v_s[starts][run_idx]
        pick = s_s == 1
        return pa.table(
            {
                "doc_id": pa.array(v_s[pick], pa.int64()),
                "cluster_id": pa.array(labels_per_row[pick],
                                       pa.int64()),
            }
        )

    assigned = (
        base_labels.map_batches(tag_label, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
        .union(best.map_batches(tag_best, batch_format="pyarrow",
                                zero_copy_batch=True,
                                batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["k"])
        .map_batches(attach_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )

    def delta_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        flt = batch.filter(pa.array(ids % mod == 0))
        n = len(flt)
        return pa.table(
            {
                "k": flt.column("doc_id").cast(pa.int64()),
                "v": flt.column("doc_id").cast(pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def tag_assigned(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("doc_id").cast(pa.int64()),
                "v": batch.column("cluster_id").cast(pa.int64()),
                "side": pa.array(np.ones(len(batch), np.int64),
                                 pa.int64()),
            }
        )

    def close_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_asg
        k = batch.column("k").to_numpy()
        v = batch.column("v").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, k))
        k_s, v_s = k[order], v[order]
        ends = np.concatenate((k_s[1:] != k_s[:-1], [True]))
        return pa.table(
            {
                "doc_id": pa.array(k_s[ends], pa.int64()),
                "cluster_id": pa.array(v_s[ends], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"], hash_shuffle=True)
        .map_batches(delta_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .union(assigned.map_batches(tag_assigned,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["k"])
        .map_batches(close_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
