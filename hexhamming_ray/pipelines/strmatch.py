"""Fuzzy entity resolution over documents: SORTED-NEIGHBORHOOD
blocking + vectorized edit-distance / Jaro-Winkler scoring +
transitive fuzzy clusters.

The classic record-linkage repertoire the LSH family doesn't cover
(reference scope: hexhamming's pairwise scorer — the method table at
``python_hexhamming.cc:421-428`` and the threshold predicate
``check_hexstrings_within_dist``, ``python_hexhamming.h:149-151`` —
feeds a blocking + scoring + clustering system; this module adds the
string-similarity scorers with DuckDB-exact semantics — the kernels in
functions/strsim.py are pinned bit-exact against DuckDB's
``levenshtein`` / ``jaro_winkler_similarity``).

Scale shape (all stages):

1. Blocking key = the first ``key_len`` bytes of each document
   (ASCII corpus; DuckDB ``substring`` and byte slicing agree, see
   TESTDATA probe). Text never moves — only (doc_id, key) rows.
2. Global rank in (key, doc_id) order via the distributed prefix-sum
   rank machinery (ENGINEERING_NOTES #68: ``_bucket_counts`` +
   exclusive prefix + ONE keyed exchange + per-block run-reset).
   Buckets are the key's top 12 bits — 4096 ordered byte ranges by
   construction, no boundary sampling pass — and any bucket fatter
   than ``_REFINE_FACTOR`` rank-spans splits by the NEXT 12 key bits
   (one extra histogram pass over the hot buckets' narrow rows), so
   real-text prefix skew ("The ...") degrades to 4096x more ordered
   ranges, not to one serialized block. The driver holds
   O(4096 + n_hot x 4096) ints, never O(docs).
3. Neighbor pairs: each ranked row routes to group ``rn // span``
   and ADDITIONALLY to the previous group when it sits in the first
   ``window`` ranks of its own (the overlap replication that makes
   every (rn, rn+k<=window) pair co-resident); ONE keyed exchange of
   narrow (doc_id, key, rn, grp) rows, then per-block vectorized
   emission + scoring — candidates never leave the block they were
   formed in, and the scorer runs inside the same map (no extra
   stage, no key re-join).

Candidate volume is window-bounded (n * window pairs corpus-wide) —
the sorted-neighborhood guarantee that makes O(L^2) edit distance
affordable at scale: it runs on key prefixes of ``key_len <= 64``
bytes over a linear number of pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hexhamming_ray.functions.strsim import (
    charset_jaccard_batch,
    damerau_levenshtein_batch,
    jaro_batch,
    jaro_winkler_batch,
    levenshtein_batch,
    pad_matrix,
)

# key's top-12-bits bucket space for the rank histogram (4096 ordered
# ranges; histogram coalesce ships n_buckets rows per block)
_N_BUCKETS = 4096

# a bucket fatter than this many rank-spans splits by the next 12 key
# bits (tests force both extremes to pin path equality)
_REFINE_FACTOR = 2


def _token_sort_keys(text, key_len: int) -> pa.Array:
    """First ``key_len`` codepoints of the doc's TOKEN-SORTED text
    ('fuzzywuzzy token_sort' normalization: word order no longer
    hides a near-dup). Vectorized: split on \\s+ (RE2, same class
    as DuckDB's \\S+ extract), ONE lexsort of the block's tokens
    by (doc, token-bytes), rebuild with binary_join. Tokens sort
    on a 4*key_len-byte padded prefix — a tie beyond that shares
    >= key_len codepoints, so the sliced key is unaffected. Handles
    SLICED list results (non-zero array offset / leading child rows)
    by rebasing the child to the slice's value window."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lst = pc.split_pattern_regex(text, r"\s+")
    n = len(lst)
    if n == 0:
        return pa.array([], pa.string())
    offs = np.frombuffer(
        lst.buffers()[1], dtype=np.int32, count=n + 1,
        offset=lst.offset * 4,
    ).astype(np.int64)
    # rebase a sliced array: values is the FULL child, offsets are
    # absolute into it — align flat with the slice's value window
    flat = lst.values.slice(int(offs[0]), int(offs[-1] - offs[0]))
    lens = np.diff(offs)
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
    tokmat, toklens = pad_matrix(flat, width=4 * key_len)
    keep = np.flatnonzero(toklens > 0)  # split leaves '' tokens
    tok_s = np.ascontiguousarray(tokmat).view(
        f"S{tokmat.shape[1]}"
    ).ravel()[keep]
    dr = doc_rep[keep]
    order = np.lexsort((tok_s, dr))
    sorted_vals = flat.take(pa.array(keep[order], pa.int64()))
    new_lens = np.bincount(dr, minlength=n)
    new_offs = np.concatenate(([0], np.cumsum(new_lens)))
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()), sorted_vals
        ),
        " ",
    )
    return pc.utf8_slice_codeunits(joined, 0, key_len)


def _sn_scored_pairs(sf_dir: str, key_len: int, window: int, scorer,
                     num_partitions: int | None = None,
                     key_mode: str = "prefix",
                     checkpoint_dir: str | None = None,
                     pair_filter=None,
                     docs_filter=None, filter_tag: str = ""):
    """Shared sorted-neighborhood machinery: rank docs by (key,
    doc_id), emit all (a, b) pairs with rank gap <= ``window``, and
    apply ``scorer(amat, alen, bmat, blen, gaps) -> (keep_mask,
    extra_cols)`` inside the pair block. ``scorer=None`` emits the
    raw blocking pairs with their rank gap. ``key_mode="suffix_rev"``
    keys on the REVERSED text's first ``key_len`` codepoints (the
    classic multi-pass trick: a second pass that survives edits at
    the front of the record)."""
    from hexhamming_ray.pipelines.text import (
        _bucket_counts,
        _default_partitions,
        _docs,
        _run_reset_within,
    )

    num_partitions = num_partitions or _default_partitions()

    def key_rows(batch: pa.Table) -> pa.Table:
        if docs_filter is not None:
            # sub-corpus restriction (e.g. incremental ER's resolved
            # base) applied at the read — ranks are exact over the
            # restricted doc set; filter_tag keys the checkpoint
            batch = docs_filter(batch)
        text = batch.column("text")
        if key_mode == "suffix_rev":
            text = pc.utf8_reverse(text)  # == DuckDB reverse()
        if key_mode == "token_sort":
            keys = _token_sort_keys(text, key_len)
        else:
            keys = pc.utf8_slice_codeunits(text, 0, key_len)
        mat, _ = pad_matrix(keys, width=4)
        bucket = mat[:, 0].astype(np.int64) * 16 + (
            mat[:, 1].astype(np.int64) >> 4
        )
        # the NEXT 12 key bits, contiguous with the bucket's 12 (low
        # nibble of byte 1 + byte 2), so bucket*4096+sub is the key's
        # top 24 bits — monotone in key byte order
        sub = (mat[:, 1].astype(np.int64) & 15) * 256 + mat[
            :, 2
        ].astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "key": keys,
                "bucket": pa.array(bucket, pa.int64()),
                "sub": pa.array(sub, pa.int64()),
            }
        )

    def build_keyed():
        return _docs(
            sf_dir, ["doc_id", "text"], hash_shuffle=True
        ).map_batches(key_rows, batch_format="pyarrow",
                      zero_copy_batch=True, batch_size=None)

    # consumed 2-3x (histogram pass(es) + rank pass); with a
    # checkpoint_dir the narrow key table resumes from Parquet (same
    # knob as the minhash signature table, text.py)
    from hexhamming_ray.state.checkpoint import Checkpointer

    keyed = Checkpointer(checkpoint_dir).stage(
        f"sn_keys_{key_mode}_{key_len}{filter_tag}", build_keyed
    )

    counts = _bucket_counts(keyed, _N_BUCKETS)
    total = int(counts.sum())
    span = max(-(-total // num_partitions), window + 1)

    # SKEW REFINEMENT (one level): real-text key prefixes concentrate
    # (at web scale, millions of docs start "The "), and the rank pass
    # serializes each bucket into one block. Any bucket fatter than
    # two blocks' worth splits by the NEXT 12 key bits — a second
    # histogram pass over the (materialized, narrow) keyed rows, hot
    # buckets only. Units stay ordered key ranges, so ranks are exact;
    # effective range count grows 4096x where it matters. The driver
    # holds O(4096 + n_hot * 4096) ints; n_hot < num_partitions / 2 by
    # construction (hot => count > 2 * span).
    refine_cap = max(_REFINE_FACTOR * span, window + 1)
    hot = counts > refine_cap
    unit_routes = [np.arange(_N_BUCKETS, dtype=np.int64)[~hot] * _N_BUCKETS]
    unit_counts = [counts[~hot]]
    if hot.any():
        hot_idx = np.flatnonzero(hot)
        hot_rank = np.full(_N_BUCKETS, -1, dtype=np.int64)
        hot_rank[hot_idx] = np.arange(hot_idx.shape[0])
        n_hot = int(hot_idx.shape[0])
        hot_lut = hot.copy()

        def sub_hist_rows(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy()
            s = batch.column("sub").to_numpy()
            keep = hot_lut[b]
            return pa.table(
                {
                    "bucket": pa.array(
                        hot_rank[b[keep]] * _N_BUCKETS + s[keep],
                        pa.int64(),
                    )
                }
            )

        sub_counts = _bucket_counts(
            keyed.map_batches(sub_hist_rows, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None),
            n_hot * _N_BUCKETS,
        )
        unit_routes.append(
            (hot_idx[:, None] * _N_BUCKETS
             + np.arange(_N_BUCKETS, dtype=np.int64)[None, :]).ravel()
        )
        unit_counts.append(sub_counts)
    routes_all = np.concatenate(unit_routes)
    counts_all = np.concatenate(unit_counts)
    order_u = np.argsort(routes_all)  # route order == key order
    routes_sorted = routes_all[order_u]
    csort = counts_all[order_u]
    bases_sorted = np.concatenate(([0], np.cumsum(csort)[:-1]))

    def add_route(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy()
        s = batch.column("sub").to_numpy()
        route = b * _N_BUCKETS + np.where(hot[b], s, 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "key": batch.column("key"),
                "route": pa.array(route, pa.int64()),
            }
        )

    empty_ranked = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "key": pa.array([], pa.string()),
            "rn": pa.array([], pa.int64()),
            "grp": pa.array([], pa.int64()),
        }
    )

    def rank_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return empty_ranked
        ids = batch.column("doc_id").to_numpy()
        key_col = batch.column("key")
        # natural (per-block max) width: keys are key_len CODEPOINTS,
        # so multibyte text can exceed key_len bytes — never clip
        mat, _ = pad_matrix(key_col)
        skey = np.ascontiguousarray(mat).view(f"S{mat.shape[1]}").ravel()
        rt = batch.column("route").to_numpy()
        # memcmp order == padded fixed-width order (no NUL bytes in
        # text); route is monotone in key so runs stay contiguous
        order = np.lexsort((ids, skey))
        rt_s = rt[order]
        # every route has a unit row by construction (exact hits)
        rn = (bases_sorted[np.searchsorted(routes_sorted, rt_s)]
              + _run_reset_within(rt_s))
        grp = rn // span
        key_s = key_col.take(pa.array(order, pa.int64()))
        ids_s = pa.array(ids[order], pa.int64())
        out = pa.table(
            {
                "doc_id": ids_s,
                "key": key_s,
                "rn": pa.array(rn, pa.int64()),
                "grp": pa.array(grp, pa.int64()),
            }
        )
        # overlap replication: first `window` ranks of a group also
        # serve as right-neighbors of the previous group
        dup = (rn % span < window) & (grp > 0)
        if dup.any():
            di = np.flatnonzero(dup)
            out = pa.concat_tables(
                [
                    out,
                    pa.table(
                        {
                            "doc_id": ids_s.take(pa.array(di, pa.int64())),
                            "key": key_s.take(pa.array(di, pa.int64())),
                            "rn": pa.array(rn[di], pa.int64()),
                            "grp": pa.array(grp[di] - 1, pa.int64()),
                        }
                    ),
                ]
            )
        return out

    # sort=False on both exchanges: the per-block maps lexsort
    # themselves, and a sorted finalize raises on the EMPTY partitions
    # a small input leaves behind (ENGINEERING_NOTES #62: schema-less
    # empty hash partitions cannot be sort_by'd)
    ranked = (
        keyed.map_batches(add_route, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["route"])
        .map_batches(rank_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["grp"])
    )

    base_cols = [("a_id", pa.int64()), ("b_id", pa.int64()),
                 ("gap", pa.int64())]
    extra_schema = scorer.schema if scorer is not None else []
    empty_pairs = pa.table(
        {
            n: pa.array([], t)
            for n, t in (base_cols if scorer is None
                         else base_cols[:2] + extra_schema)
        }
    )

    def pair_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return empty_pairs
        rn = batch.column("rn").to_numpy()
        grp = batch.column("grp").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        # a block may hold several whole groups (and each rank can
        # appear twice: native + prev-group copy) — sort by (grp, rn)
        # so pairing never crosses a routing group and never dups
        order = np.lexsort((rn, grp))
        rn_s, grp_s, ids_s = rn[order], grp[order], ids[order]
        native = (rn_s // span) == grp_s
        a_idx, b_idx, gaps = [], [], []
        for k in range(1, window + 1):
            if k >= m:
                break
            mask = (
                native[:-k]
                & (grp_s[k:] == grp_s[:-k])
                & (rn_s[k:] - rn_s[:-k] == k)
            )
            sel = np.flatnonzero(mask)
            a_idx.append(sel)
            b_idx.append(sel + k)
            gaps.append(np.full(sel.shape[0], k, dtype=np.int64))
        if not a_idx:
            return empty_pairs
        a_i = np.concatenate(a_idx)
        b_i = np.concatenate(b_idx)
        gap = np.concatenate(gaps)
        if pair_filter is not None:
            m = pair_filter(ids_s[a_i], ids_s[b_i])
            a_i, b_i, gap = a_i[m], b_i[m], gap[m]
        cols = {
            "a_id": pa.array(ids_s[a_i], pa.int64()),
            "b_id": pa.array(ids_s[b_i], pa.int64()),
        }
        if scorer is None:
            cols["gap"] = pa.array(gap, pa.int64())
            return pa.table(cols)
        key_sorted = batch.column("key").take(pa.array(order, pa.int64()))
        mat, lens = pad_matrix(key_sorted)  # natural width: see above
        keep, extra = scorer(
            mat[a_i], lens[a_i], mat[b_i], lens[b_i], gap
        )
        sel = np.flatnonzero(keep)
        out = {
            "a_id": pa.array(ids_s[a_i][sel], pa.int64()),
            "b_id": pa.array(ids_s[b_i][sel], pa.int64()),
        }
        for (name, typ), arr in zip(scorer.schema, extra):
            out[name] = pa.array(arr[sel], typ)
        return pa.table(out)

    return ranked.map_batches(
        pair_block, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def sorted_neighborhood_pairs(sf_dir: str, *, key_len: int = 24,
                              window: int = 4,
                              checkpoint_dir: str | None = None):
    """The blocking operator itself: all document pairs within
    ``window`` positions of each other in (key, doc_id) rank order,
    key = first ``key_len`` chars. (a_id, b_id, gap) — oracle is the
    ROW_NUMBER self-join on rank difference."""
    return _sn_scored_pairs(sf_dir, key_len, window, None,
                            checkpoint_dir=checkpoint_dir)


class _LevScorer:
    schema = [("lev_dist", pa.int64())]

    def __init__(self, max_dist: int):
        self.max_dist = max_dist

    def __call__(self, amat, alen, bmat, blen, gaps):
        lev = levenshtein_batch(amat, alen, bmat, blen)
        return lev <= self.max_dist, [lev]


class _JwScorer:
    schema = [("jw_sim", pa.float64())]

    def __init__(self, min_sim: float):
        self.min_sim = min_sim

    def __call__(self, amat, alen, bmat, blen, gaps):
        jw = jaro_winkler_batch(amat, alen, bmat, blen)
        return jw >= self.min_sim, [jw]


def fuzzy_match_levenshtein(sf_dir: str, *, key_len: int = 24,
                            window: int = 4, max_dist: int = 6,
                            checkpoint_dir: str | None = None):
    """Sorted-neighborhood candidates scored with exact byte
    Levenshtein over the blocking key, kept when <= ``max_dist``.
    (a_id, b_id, lev_dist) — value-oracled against DuckDB's
    ``levenshtein`` on the identical candidate set."""
    return _sn_scored_pairs(sf_dir, key_len, window,
                            _LevScorer(max_dist),
                            checkpoint_dir=checkpoint_dir)


class _DamerauScorer:
    schema = [("dl_dist", pa.int64())]

    def __init__(self, max_dist: int):
        self.max_dist = max_dist

    def __call__(self, amat, alen, bmat, blen, gaps):
        dl = damerau_levenshtein_batch(amat, alen, bmat, blen)
        return dl <= self.max_dist, [dl]


class _CharJacScorer:
    schema = [("cj_sim", pa.float64())]

    def __init__(self, min_sim: float):
        self.min_sim = min_sim

    def __call__(self, amat, alen, bmat, blen, gaps):
        cj = charset_jaccard_batch(amat, alen, bmat, blen)
        # DuckDB's jaccard raises on an empty argument; the oracle
        # filters those pairs out, so the engine must too
        return (alen > 0) & (blen > 0) & (cj >= self.min_sim), [cj]


def fuzzy_match_damerau(sf_dir: str, *, key_len: int = 24,
                        window: int = 4, max_dist: int = 6,
                        checkpoint_dir: str | None = None):
    """Sorted-neighborhood candidates scored with TRUE (unrestricted)
    Damerau-Levenshtein over the blocking key — the edit distance that
    charges a transposition one operation, the classic choice for
    typo-heavy record linkage ('hte' -> 'the' is 1, not 2). Kernel
    pinned bit-exact against DuckDB's ``damerau_levenshtein``
    (byte-based, unrestricted: 'CA'->'ABC' = 2). (a_id, b_id,
    dl_dist)."""
    return _sn_scored_pairs(sf_dir, key_len, window,
                            _DamerauScorer(max_dist),
                            checkpoint_dir=checkpoint_dir)


def fuzzy_match_charjac(sf_dir: str, *, key_len: int = 24,
                        window: int = 4, min_sim: float = 0.9,
                        checkpoint_dir: str | None = None):
    """Sorted-neighborhood candidates scored with the CHARACTER-SET
    Jaccard similarity (DuckDB ``jaccard`` semantics: distinct-byte
    sets, order-free — a cheap order-insensitive scorer that survives
    arbitrary within-key scrambling). Pairs with an empty key on
    either side are dropped (the oracle's ``jaccard`` raises on empty
    input). (a_id, b_id, cj_sim)."""
    return _sn_scored_pairs(sf_dir, key_len, window,
                            _CharJacScorer(min_sim),
                            checkpoint_dir=checkpoint_dir)


def fuzzy_match_jw(sf_dir: str, *, key_len: int = 24, window: int = 4,
                   min_sim: float = 0.88,
                   checkpoint_dir: str | None = None):
    """Sorted-neighborhood candidates scored with Jaro-Winkler
    similarity (DuckDB-bit-exact kernel: byte-level, boost only above
    jaro 0.7), kept when >= ``min_sim``. (a_id, b_id, jw_sim)."""
    return _sn_scored_pairs(sf_dir, key_len, window,
                            _JwScorer(min_sim),
                            checkpoint_dir=checkpoint_dir)


class _ConsensusScorer:
    """Ensemble vote over three independent scorers on the same padded
    matrices (one pass, no extra stage): byte Levenshtein <= max_dist,
    Jaro-Winkler >= min_jw, charset Jaccard >= min_cj (empty keys
    vote 0 — DuckDB's jaccard raises on empty input, so the oracle's
    CASE treats them as a non-vote, not a dropped pair). Keep when
    >= min_votes of 3 agree — the cheap Fellegi-Sunter-flavored
    redundancy that survives any single scorer's blind spot."""

    schema = [("votes", pa.int64())]

    def __init__(self, max_dist: int, min_jw: float, min_cj: float,
                 min_votes: int):
        self.max_dist = max_dist
        self.min_jw = min_jw
        self.min_cj = min_cj
        self.min_votes = min_votes

    def __call__(self, amat, alen, bmat, blen, gaps):
        v_lev = levenshtein_batch(amat, alen, bmat, blen) <= self.max_dist
        v_jw = jaro_winkler_batch(amat, alen, bmat, blen) >= self.min_jw
        cj = charset_jaccard_batch(amat, alen, bmat, blen)
        v_cj = (alen > 0) & (blen > 0) & (cj >= self.min_cj)
        votes = (
            v_lev.astype(np.int64) + v_jw.astype(np.int64)
            + v_cj.astype(np.int64)
        )
        return votes >= self.min_votes, [votes]


def fuzzy_match_consensus(sf_dir: str, *, key_len: int = 24,
                          window: int = 4, max_dist: int = 6,
                          min_jw: float = 0.88, min_cj: float = 0.9,
                          min_votes: int = 2,
                          checkpoint_dir: str | None = None):
    """Sorted-neighborhood candidates kept when >= ``min_votes`` of
    three scorers agree (Levenshtein / Jaro-Winkler / charset
    Jaccard at the registry defaults) — ensemble matching: each
    scorer's false negatives are outvoted by the other two.
    (a_id, b_id, votes)."""
    return _sn_scored_pairs(
        sf_dir, key_len, window,
        _ConsensusScorer(max_dist, min_jw, min_cj, min_votes),
        checkpoint_dir=checkpoint_dir,
    )


class _JaroScorer:
    schema = [("jaro_sim", pa.float64())]

    def __init__(self, min_sim: float):
        self.min_sim = min_sim

    def __call__(self, amat, alen, bmat, blen, gaps):
        j = jaro_batch(amat, alen, bmat, blen)
        return j >= self.min_sim, [j]


def fuzzy_match_jaro(sf_dir: str, *, key_len: int = 24, window: int = 4,
                     min_sim: float = 0.84,
                     checkpoint_dir: str | None = None):
    """Sorted-neighborhood candidates scored with PLAIN Jaro
    similarity (no Winkler prefix boost — the scorer of choice when
    record keys share long boilerplate prefixes that would otherwise
    inflate every score by the full 0.1 boost). Kernel bit-exact vs
    DuckDB's ``jaro_similarity``; kept when >= ``min_sim``.
    (a_id, b_id, jaro_sim)."""
    return _sn_scored_pairs(sf_dir, key_len, window,
                            _JaroScorer(min_sim),
                            checkpoint_dir=checkpoint_dir)


def fuzzy_match_token_sort(sf_dir: str, *, key_len: int = 24,
                           window: int = 4, min_sim: float = 0.88,
                           checkpoint_dir: str | None = None):
    """Sorted-neighborhood matching on the TOKEN-SORTED key (the
    'token_sort_ratio' trick): word reordering no longer hides a
    near-duplicate, because both orderings normalize to the same
    sorted-token string before the prefix key is cut. Candidates
    scored with Jaro-Winkler on the normalized key.
    (a_id, b_id, jw_sim)."""
    return _sn_scored_pairs(sf_dir, key_len, window,
                            _JwScorer(min_sim), key_mode="token_sort",
                            checkpoint_dir=checkpoint_dir)


def fuzzy_decontaminate_jw(sf_dir: str, *, key_len: int = 24,
                           window: int = 4, min_sim: float = 0.88):
    """FUZZY decontamination: training documents whose blocking key is
    Jaro-Winkler-close to a BENCHMARK document's (the ``doc_id % 50 ==
    0`` eval subset, same convention as ``decontaminate_docs``). The
    edit-tolerant sibling of the exact n-gram and Jaccard scans — it
    catches contamination that survives both because a few characters
    changed. (doc_id, bench_id, jw_sim).

    Shape: ONE ranked pass over the UNION of both sets (cross-set
    sorted-neighborhood — no extra table, no join); the cross-side
    mask is pure doc_id arithmetic applied inside the pair block."""

    def cross_side(a_ids, b_ids):
        return (a_ids % 50 == 0) != (b_ids % 50 == 0)

    pairs = _sn_scored_pairs(sf_dir, key_len, window,
                             _JwScorer(min_sim),
                             pair_filter=cross_side)

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        a_is_bench = a % 50 == 0
        return pa.table(
            {
                "doc_id": pa.array(np.where(a_is_bench, b, a), pa.int64()),
                "bench_id": pa.array(np.where(a_is_bench, a, b),
                                     pa.int64()),
                "jw_sim": batch.column("jw_sim"),
            }
        )

    return pairs.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def fuzzy_match_multikey(sf_dir: str, *, key_len: int = 24,
                         window: int = 4, min_sim: float = 0.88,
                         checkpoint_dir: str | None = None):
    """Multi-pass sorted-neighborhood matching (the classic fix for
    single-key blocking's blind spot: an edit INSIDE the blocking key
    moves a record out of its neighborhood). Two passes — prefix key
    and reversed-suffix key — each scored with Jaro-Winkler on its own
    key, pairs normalized to (id_lo, id_hi) and union-deduped with ONE
    keyed exchange of 16-byte rows + per-block run dedup. Pair volume
    stays linear (2 * n * window candidates corpus-wide)."""
    passes = [
        fuzzy_match_jw(
            sf_dir, key_len=key_len, window=window, min_sim=min_sim,
            checkpoint_dir=checkpoint_dir,
        ),
        _sn_scored_pairs(sf_dir, key_len, window, _JwScorer(min_sim),
                         key_mode="suffix_rev",
                         checkpoint_dir=checkpoint_dir),
    ]

    def norm(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    empty = pa.table(
        {"id_lo": pa.array([], pa.int64()),
         "id_hi": pa.array([], pa.int64())}
    )

    def dedup_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        order = np.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        head = np.ones(lo_s.shape[0], dtype=bool)
        head[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
        return pa.table(
            {
                "id_lo": pa.array(lo_s[head], pa.int64()),
                "id_hi": pa.array(hi_s[head], pa.int64()),
            }
        )

    u = passes[0].map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).union(
        passes[1].map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )
    from hexhamming_ray.pipelines.text import _default_partitions

    return u.repartition(
        num_blocks=_default_partitions(), keys=["id_lo", "id_hi"]
    ).map_batches(
        dedup_block, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def fuzzy_dedup_survivors(sf_dir: str, *, key_len: int = 24,
                          window: int = 4, min_sim: float = 0.88,
                          checkpoint_dir: str | None = None):
    """The curation ACTION over fuzzy clusters: keep ONE survivor per
    cluster — the LONGEST document (ties -> min doc_id), the usual
    keep-best-copy rule when near-duplicates differ by truncation.
    (doc_id, cluster_id, n_chars).

    Shape: cluster labels join their documents' n_chars by a tagged
    union + ONE doc_id-keyed exchange (both sides contribute exactly
    one narrow row per doc; no join operator, no broadcast), then one
    cluster_id-keyed exchange and a per-block lexsort run-head pick.
    Rows are 24 bytes throughout; text never moves."""
    from hexhamming_ray.pipelines.text import _default_partitions, _docs

    labels = er_fuzzy_clusters(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        checkpoint_dir=checkpoint_dir,
    )

    def tag_lab(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
                "n_chars": pa.nulls(len(batch), pa.int64()),
            }
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": pa.nulls(len(batch), pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    merged_schema = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
        }
    )

    def merge_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return merged_schema
        is_lab = pc.is_valid(batch.column("cluster_id")).to_numpy(
            zero_copy_only=False
        )
        ids = batch.column("doc_id").to_numpy()
        clu = batch.column("cluster_id").fill_null(0).to_numpy(
            zero_copy_only=False
        )
        nch = batch.column("n_chars").fill_null(0).to_numpy(
            zero_copy_only=False
        )
        lo = np.argsort(ids[is_lab])
        do = np.argsort(ids[~is_lab])
        # both sides carry exactly one row per doc_id of this block
        return pa.table(
            {
                "doc_id": pa.array(ids[is_lab][lo], pa.int64()),
                "cluster_id": pa.array(clu[is_lab][lo], pa.int64()),
                "n_chars": pa.array(nch[~is_lab][do], pa.int64()),
            }
        )

    def pick_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return merged_schema
        clu = batch.column("cluster_id").to_numpy()
        nch = batch.column("n_chars").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        order = np.lexsort((ids, -nch, clu))
        clu_s = clu[order]
        head = np.ones(clu_s.shape[0], dtype=bool)
        head[1:] = clu_s[1:] != clu_s[:-1]
        sel = order[head]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "cluster_id": pa.array(clu[sel], pa.int64()),
                "n_chars": pa.array(nch[sel], pa.int64()),
            }
        )

    nparts = _default_partitions()
    u = labels.map_batches(
        tag_lab, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).union(
        _docs(sf_dir, ["doc_id", "n_chars"], hash_shuffle=True)
        .map_batches(
            tag_doc, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )
    return (
        u.repartition(num_blocks=nparts, keys=["doc_id"])
        .map_batches(merge_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=nparts, keys=["cluster_id"])
        .map_batches(pick_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def _pair_eval_counts(pred, truth, *, pred_cols=("a_id", "b_id")):
    """(n_pred, n_truth, n_both) for two pair Datasets: both normalize
    to (id_lo, id_hi), meet in ONE keyed exchange of tagged 17-byte
    rows, and the overlap is an adjacent-duplicate count after a
    per-block lexsort (each side emits an unordered pair at most
    once). Single-row partials coalesce driver-side to three ints."""
    from hexhamming_ray.pipelines.text import _default_partitions

    ca, cb = pred_cols

    def tag_pred(batch: pa.Table) -> pa.Table:
        a = batch.column(ca).to_numpy()
        b = batch.column(cb).to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
                "side": pa.array(np.zeros(len(a), np.int64()), pa.int64()),
            }
        )

    def tag_truth(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_lo": batch.column("id_lo").cast(pa.int64()),
                "id_hi": batch.column("id_hi").cast(pa.int64()),
                "side": pa.array(np.ones(len(batch), np.int64()),
                                 pa.int64()),
            }
        )

    def count_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_pred": pa.array([], pa.int64()),
                "n_truth": pa.array([], pa.int64()),
                "n_both": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        side = batch.column("side").to_numpy()
        order = np.lexsort((side, hi, lo))
        lo_s, hi_s, sd_s = lo[order], hi[order], side[order]
        # a pair present on both sides sits adjacently as (side 0, 1)
        both = int(
            ((lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])
             & (sd_s[1:] != sd_s[:-1])).sum()
        )
        return pa.table(
            {
                "n_pred": pa.array([int((side == 0).sum())], pa.int64()),
                "n_truth": pa.array([int((side == 1).sum())], pa.int64()),
                "n_both": pa.array([both], pa.int64()),
            }
        )

    rows = (
        pred.map_batches(tag_pred, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(truth.map_batches(tag_truth, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=_default_partitions(),
                     keys=["id_lo", "id_hi"])
        .map_batches(count_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    return (
        sum(int(r["n_pred"]) for r in rows),
        sum(int(r["n_truth"]) for r in rows),
        sum(int(r["n_both"]) for r in rows),
    )


def er_fuzzy_eval(sf_dir: str, *, key_len: int = 24, window: int = 4,
                  min_sim: float = 0.88):
    """PAIR-LEVEL quality report of the fuzzy matcher against the
    exact n-gram-Jaccard near-duplicate pair set (the ER evaluation
    behind the north rule's F1 criterion, as a first-class query):
    how many pairs the sorted-neighborhood + Jaro-Winkler matcher
    predicts, how many the exact Jaccard >= 0.5 truth set contains,
    their overlap, and integer-ppm precision/recall. ONE row:
    (pairs_pred, pairs_truth, pairs_both, precision_ppm, recall_ppm).
    Counting machinery: :func:`_pair_eval_counts`."""
    from hexhamming_ray.pipelines.text import ngram_jaccard_exact

    n_pred, n_truth, n_both = _pair_eval_counts(
        fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                       min_sim=min_sim),
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


def blocking_strategy_report(sf_dir: str, *, key_len: int = 24,
                             window: int = 4, min_sim: float = 0.88):
    """The blocking-strategy BENCHMARK: every blocker in the toolkit
    (prefix key, reversed-suffix key, their multikey union, the
    token-sort key, and the pigeonhole Hamming-key blocker) evaluated
    pair-level against the same exact Jaccard >= 0.5 truth set. One
    row per strategy: (strategy, pairs_pred, pairs_truth, pairs_both,
    precision_ppm, recall_ppm) — the table an ER practitioner reads to
    pick a blocker. Five bounded evaluations; each is the
    :func:`_pair_eval_counts` single-exchange shape."""
    from hexhamming_ray.pipelines.hamkey import hamming_key_pairs
    from hexhamming_ray.pipelines.text import ngram_jaccard_exact

    strategies = [
        ("multikey",
         fuzzy_match_multikey(sf_dir, key_len=key_len, window=window,
                              min_sim=min_sim),
         ("id_lo", "id_hi")),
        ("prefix",
         fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                        min_sim=min_sim),
         ("a_id", "b_id")),
        ("suffix_rev",
         _sn_scored_pairs(sf_dir, key_len, window, _JwScorer(min_sim),
                          key_mode="suffix_rev"),
         ("a_id", "b_id")),
        ("token_sort",
         fuzzy_match_token_sort(sf_dir, key_len=key_len, window=window,
                                min_sim=min_sim),
         ("a_id", "b_id")),
        ("hamming",
         hamming_key_pairs(sf_dir),
         ("a_id", "b_id")),
    ]
    names, np_, nt, nb, prec, rec = [], [], [], [], [], []
    for name, pred, cols in strategies:
        a, t, b = _pair_eval_counts(
            pred, ngram_jaccard_exact(sf_dir), pred_cols=cols
        )
        names.append(name)
        np_.append(a)
        nt.append(t)
        nb.append(b)
        prec.append(1_000_000 * b // a if a else 0)
        rec.append(1_000_000 * b // t if t else 0)
    return pa.table(
        {
            "strategy": pa.array(names, pa.string()),
            "pairs_pred": pa.array(np_, pa.int64()),
            "pairs_truth": pa.array(nt, pa.int64()),
            "pairs_both": pa.array(nb, pa.int64()),
            "precision_ppm": pa.array(prec, pa.int64()),
            "recall_ppm": pa.array(rec, pa.int64()),
        }
    )


def er_fuzzy_clusters(sf_dir: str, *, key_len: int = 24,
                      window: int = 4, min_sim: float = 0.88,
                      checkpoint_dir: str | None = None):
    """Transitive fuzzy-duplicate clusters: Jaro-Winkler match pairs
    as edges -> the distributed union-find -> every document labeled
    with its component's min doc_id (isolated docs label themselves).
    (doc_id, cluster_id) — the recursive-CTE closure over the same
    SQL pair set is the value oracle. Label assignment is the shared
    size-switched :func:`~hexhamming_ray.state.unionfind.label_nodes`
    (broadcast under the cap, sorted-run remap above it)."""
    from hexhamming_ray.pipelines.text import _docs
    from hexhamming_ray.stages.annsearch import GRAPH_LABEL_BROADCAST_CAP
    from hexhamming_ray.state.unionfind import (
        connected_components,
        label_nodes,
    )

    pairs = fuzzy_match_jw(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        checkpoint_dir=checkpoint_dir,
    )

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_lo": batch.column("a_id").cast(pa.int64()),
                "id_hi": batch.column("b_id").cast(pa.int64()),
            }
        )

    edges = pairs.map_batches(
        as_edges, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    labels = connected_components(edges)
    # hash_shuffle: downstream consumers (fuzzy_dedup_survivors) build
    # keyed repartitions on this lineage, and the DataContext snapshot
    # is taken at ROOT creation
    nodes = _docs(sf_dir, ["doc_id"], hash_shuffle=True)
    return label_nodes(labels, nodes, "doc_id", "cluster_id",
                       broadcast_cap=GRAPH_LABEL_BROADCAST_CAP)


def er_incremental_assign(sf_dir: str, *, key_len: int = 24,
                          window: int = 4, min_sim: float = 0.88,
                          mod: int = 10,
                          num_partitions: int | None = None,
                          checkpoint_dir: str | None = None):
    """INCREMENTAL ER — assign, don't re-resolve: documents with
    ``doc_id % mod == 0`` are the NEWLY ARRIVED batch (delta); the
    rest are the already-RESOLVED base. Base clusters are computed
    over base docs ONLY (new arrivals must not move existing entity
    ids — the production contract of an incremental pipeline); each
    delta doc then joins the cluster of its best base match
    (JW >= ``min_sim`` among the full-ranking sorted-neighborhood
    candidates, ties toward the smaller base id) or founds a singleton
    cluster under its own id. Output: (doc_id, cluster_id) for the
    DELTA docs only. Delta-delta matches are deliberately NOT merged —
    that is the re-resolution step this mode defers.

    Scale: the base clustering is the standard rank-bucketed SN path
    restricted at the read (``docs_filter`` — ranks are exact over the
    base set); candidate volume stays n×window; the three assignment
    exchanges carry 16-24-byte rows (best-match argmax by run heads,
    label attach by run merge, and a tagged anti-union that closes
    unmatched deltas) — nothing scales with text size."""
    import ray

    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _docs,
    )
    from hexhamming_ray.stages.annsearch import GRAPH_LABEL_BROADCAST_CAP
    from hexhamming_ray.state.unionfind import (
        connected_components,
        label_nodes,
    )

    num_partitions = num_partitions or _default_partitions()

    def base_only(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(ids % mod != 0))

    base_pairs = _sn_scored_pairs(
        sf_dir, key_len, window, _JwScorer(min_sim),
        checkpoint_dir=checkpoint_dir, docs_filter=base_only,
        filter_tag=f"_base{mod}",
    )

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_lo": batch.column("a_id").cast(pa.int64()),
                "id_hi": batch.column("b_id").cast(pa.int64()),
            }
        )

    base_labels = label_nodes(
        connected_components(
            base_pairs.map_batches(as_edges, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   batch_size=None)
        ),
        _docs(sf_dir, ["doc_id"], hash_shuffle=True).map_batches(
            base_only, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        "doc_id", "cluster_id",
        broadcast_cap=GRAPH_LABEL_BROADCAST_CAP,
    )

    # cross base x delta candidates from the FULL-corpus ranking (the
    # existing checkpointable pass — blocking may see everything; only
    # base clusters are read-only)
    full_pairs = fuzzy_match_jw(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        checkpoint_dir=checkpoint_dir,
    )

    def cross_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        jw = batch.column("jw_sim").to_numpy()
        a_d = a % mod == 0
        b_d = b % mod == 0
        keep = a_d != b_d
        a, b, jw, a_d = a[keep], b[keep], jw[keep], a_d[keep]
        return pa.table(
            {
                "delta_id": pa.array(np.where(a_d, a, b), pa.int64()),
                "base_id": pa.array(np.where(a_d, b, a), pa.int64()),
                "jw": pa.array(jw, pa.float64()),
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
        d = batch.column("delta_id").to_numpy()
        b = batch.column("base_id").to_numpy()
        jw = batch.column("jw").to_numpy()
        order = np.lexsort((b, -jw, d))
        d_s, b_s = d[order], b[order]
        heads = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        return pa.table(
            {
                "base_id": pa.array(b_s[heads], pa.int64()),
                "delta_id": pa.array(d_s[heads], pa.int64()),
            }
        )

    best = (
        full_pairs.map_batches(cross_rows, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["delta_id"])
        .map_batches(best_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )

    # label attach: ONE exchange on the base id; each run starts with
    # its single label row (side 0), side-1 rows gather it
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
                "incremental attach: best-match base id missing its "
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
                                zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["k"])
        .map_batches(attach_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )

    # close unmatched deltas: tagged anti-union on the delta id (runs
    # without a side-1 assignment label themselves)
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
        # take each run's LAST row: the side-1 assignment when present,
        # else the delta's own id
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


def er_incremental_report(sf_dir: str, *, key_len: int = 24,
                          window: int = 4, min_sim: float = 0.88,
                          mod: int = 10,
                          num_partitions: int | None = None,
                          checkpoint_dir: str | None = None):
    """THE DEBT LEDGER OF ASSIGN-MODE INCREMENTAL ER: how many new
    docs joined an existing entity, how many founded singletons, and
    how many delta-delta match pairs were DEFERRED (the merges a
    future re-resolution will apply — exactly the edges assign mode
    ignores). ONE row: (n_delta, n_assigned, n_singletons,
    n_deferred_pairs). An operator a practitioner polls to decide WHEN
    to re-resolve.

    Shape: the assignment stream folds to single-row partials (a base
    cluster id is always a base doc id and delta ids never collide
    with base ids, so 'assigned' is the pure row predicate
    ``cluster_id != doc_id``); deferred pairs are a predicate count
    over the already-computed full candidate stream. Nothing beyond
    :func:`er_incremental_assign`'s exchanges plus one filter-count."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    asg = er_incremental_assign(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        mod=mod, num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
    )

    empty = pa.table(
        {
            "n_delta": pa.array([], pa.int64()),
            "n_assigned": pa.array([], pa.int64()),
        }
    )

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        d = batch.column("doc_id").to_numpy()
        c = batch.column("cluster_id").to_numpy()
        return pa.table(
            {
                "n_delta": pa.array([len(d)], pa.int64()),
                "n_assigned": pa.array([int((c != d).sum())],
                                       pa.int64()),
            }
        )

    rows = asg.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).take_all()
    n_delta = sum(int(r["n_delta"]) for r in rows)
    n_assigned = sum(int(r["n_assigned"]) for r in rows)

    full_pairs = fuzzy_match_jw(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        checkpoint_dir=checkpoint_dir,
    )

    def deferred(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "n": pa.array(
                    [int(((a % mod == 0) & (b % mod == 0)).sum())],
                    pa.int64(),
                )
            }
        )

    n_def = sum(
        int(r["n"])
        for r in full_pairs.map_batches(
            deferred, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).take_all()
    )
    return pa.table(
        {
            "n_delta": pa.array([n_delta], pa.int64()),
            "n_assigned": pa.array([n_assigned], pa.int64()),
            "n_singletons": pa.array([n_delta - n_assigned],
                                     pa.int64()),
            "n_deferred_pairs": pa.array([n_def], pa.int64()),
        }
    )


def progressive_match_schedule(sf_dir: str, *, k: int = 100,
                               key_len: int = 24, window: int = 4,
                               min_sim: float = 0.85,
                               num_partitions: int | None = None,
                               checkpoint_dir: str | None = None):
    """PAY-AS-YOU-GO ER (Whang et al., ICDE'13): the globally
    best-first resolution schedule — the top-``k`` candidate pairs in
    decreasing match quality with their global rank, so a budget-bound
    pipeline (or a clerical-review queue) resolves the most confident
    merges first and can stop anywhere. Deterministic total order:
    (jw DESC, id_lo ASC, id_hi ASC). (rank, id_lo, id_hi, jw_sim).
    The per-DOC review queue is :func:`match_candidates_topk`; this is
    the per-CORPUS schedule.

    Shape: candidates are window-bounded; each block keeps only its
    local top-k (one lexsort head-slice — no global sort), and the
    driver merges num_partitions × k rows with one final lexsort —
    the partial-top-k-merge plan the relational top-k queries use,
    volume independent of corpus size."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    pairs = fuzzy_match_jw(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        checkpoint_dir=checkpoint_dir,
    )

    empty = pa.table(
        {
            "id_lo": pa.array([], pa.int64()),
            "id_hi": pa.array([], pa.int64()),
            "jw_sim": pa.array([], pa.float64()),
        }
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        jw = batch.column("jw_sim").to_numpy()
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        order = np.lexsort((hi, lo, -jw))[:k]
        return pa.table(
            {
                "id_lo": pa.array(lo[order], pa.int64()),
                "id_hi": pa.array(hi[order], pa.int64()),
                "jw_sim": pa.array(jw[order], pa.float64()),
            }
        )

    part = pairs.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).take_all()
    if not part:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "id_lo": pa.array([], pa.int64()),
                "id_hi": pa.array([], pa.int64()),
                "jw_sim": pa.array([], pa.float64()),
            }
        )
    lo = np.array([int(r["id_lo"]) for r in part], dtype=np.int64)
    hi = np.array([int(r["id_hi"]) for r in part], dtype=np.int64)
    jw = np.array([float(r["jw_sim"]) for r in part], dtype=np.float64)
    order = np.lexsort((hi, lo, -jw))[:k]
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, order.shape[0] + 1, dtype=np.int64),
                pa.int64(),
            ),
            "id_lo": pa.array(lo[order], pa.int64()),
            "id_hi": pa.array(hi[order], pa.int64()),
            "jw_sim": pa.array(jw[order], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# q-gram blocking (Gravano et al. count filtering) + meta-blocking WEP
# ---------------------------------------------------------------------------


def _qgram_pair_counts(sf_dir: str, q: int, key_len: int, df_cap: int,
                       num_partitions: int | None = None):
    """Shared q-gram blocking core -> Dataset (a_id, b_id, n_common):
    the number of DISTINCT key q-grams two documents share, grams with
    document frequency > ``df_cap`` dropped (a stop-gram filter — the
    frequent-gram pairs are the quadratic blowup AND the least
    discriminative, the same df-capping the shingle truth set uses).

    Scale shape (the second blocking family next to sorted-
    neighborhood; complements it because it needs NO global rank):

    1. gram emission is ``key_len - q + 1`` vectorized codepoint
       slices per batch (DuckDB ``substring`` semantics, so the CJK /
       accent corpus oracles exactly); per-doc DISTINCT via one
       in-block lexsort. Text never moves — only (gram, doc_id) rows.
    2. ONE keyed exchange on ``gram`` co-locates each posting list;
       the df filter is a run-length test inside the block (every
       occurrence of a gram is co-resident), and pair emission is the
       window-loop over runs — at most ``df_cap - 1`` vector passes,
       pairs per gram bounded by ``df_cap**2 / 2``.
    3. ONE keyed exchange on (a_id, b_id) sums the per-gram hits into
       ``n_common`` (run-length again). Exchange rows are 24 bytes.

    Driver holds nothing; no corpus-sized state at any stage."""
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _docs,
        _run_reset_within,
    )

    num_partitions = num_partitions or _default_partitions()
    n_pos = key_len - q + 1
    assert n_pos >= 1, "q must not exceed key_len"

    empty_grams = pa.table(
        {"gram": pa.array([], pa.string()),
         "doc_id": pa.array([], pa.int64())}
    )

    def gram_rows(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_grams
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        keys = pc.utf8_slice_codeunits(text, 0, key_len)
        klen = pc.utf8_length(keys).to_numpy()
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy()
        parts, part_ids = [], []
        for i in range(n_pos):
            sel = np.flatnonzero(klen >= i + q)
            if sel.shape[0] == 0:
                continue
            sub = keys.take(pa.array(sel, pa.int64()))
            parts.append(pc.utf8_slice_codeunits(sub, i, i + q))
            part_ids.append(ids[sel])
        if not parts:
            return empty_grams
        grams = pa.concat_arrays([p.combine_chunks() if
                                  isinstance(p, pa.ChunkedArray) else p
                                  for p in parts])
        gids = np.concatenate(part_ids)
        # per-doc DISTINCT grams (the count filter counts a shared
        # gram once however often it repeats inside one key)
        mat, _ = pad_matrix(grams)
        gs = np.ascontiguousarray(mat).view(f"S{mat.shape[1]}").ravel()
        order = np.lexsort((gs, gids))
        gs_s, gid_s = gs[order], gids[order]
        first = np.ones(gs_s.shape[0], dtype=bool)
        first[1:] = (gid_s[1:] != gid_s[:-1]) | (gs_s[1:] != gs_s[:-1])
        sel = np.flatnonzero(first)
        return pa.table(
            {"gram": grams.take(pa.array(order[sel], pa.int64())),
             "doc_id": pa.array(gid_s[sel], pa.int64())}
        )

    empty_pairs = pa.table(
        {"a_id": pa.array([], pa.int64()),
         "b_id": pa.array([], pa.int64())}
    )

    def pairs_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return empty_pairs
        grams = batch.column("gram")
        ids = batch.column("doc_id").to_numpy()
        mat, _ = pad_matrix(grams)
        gs = np.ascontiguousarray(mat).view(f"S{mat.shape[1]}").ravel()
        order = np.lexsort((ids, gs))
        gs_s, ids_s = gs[order], ids[order]
        new = np.ones(m, dtype=bool)
        new[1:] = gs_s[1:] != gs_s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, m])
        replen = np.repeat(lens, lens)
        run = np.cumsum(new) - 1
        keep = replen <= df_cap  # stop-gram df filter
        a_idx, b_idx = [], []
        for k in range(1, df_cap):
            if k >= m:
                break
            mask = keep[:-k] & (run[k:] == run[:-k])
            sel = np.flatnonzero(mask)
            if sel.shape[0]:
                a_idx.append(sel)
                b_idx.append(sel + k)
        if not a_idx:
            return empty_pairs
        a_i = np.concatenate(a_idx)
        b_i = np.concatenate(b_idx)
        # ids ascend within a run (lexsort tiebreak), so lo < hi
        return pa.table(
            {"a_id": pa.array(ids_s[a_i], pa.int64()),
             "b_id": pa.array(ids_s[b_i], pa.int64())}
        )

    empty_counts = pa.table(
        {"a_id": pa.array([], pa.int64()),
         "b_id": pa.array([], pa.int64()),
         "n_common": pa.array([], pa.int64())}
    )

    def count_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return empty_counts
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        new = np.ones(m, dtype=bool)
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, m])
        return pa.table(
            {"a_id": pa.array(a_s[starts], pa.int64()),
             "b_id": pa.array(b_s[starts], pa.int64()),
             "n_common": pa.array(lens.astype(np.int64), pa.int64())}
        )

    # sort=False exchanges throughout (ENGINEERING_NOTES #69): the
    # per-block maps lexsort themselves
    return (
        _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
        .map_batches(gram_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["gram"])
        .map_batches(pairs_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["a_id", "b_id"])
        .map_batches(count_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def qgram_blocking_pairs(sf_dir: str, *, q: int = 20, key_len: int = 24,
                         df_cap: int = 8, min_common: int = 3):
    """q-gram blocking with COUNT FILTERING (the Gravano et al.
    edit-similarity-join candidate generator): document pairs sharing
    >= ``min_common`` distinct key q-grams, frequent grams (document
    frequency > ``df_cap``) excluded. The second blocking family next
    to sorted-neighborhood — order-free, so it survives edits that
    push a record far away in sort order. (a_id, b_id, n_common)."""
    pc_ds = _qgram_pair_counts(sf_dir, q, key_len, df_cap)

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("n_common"), min_common)
        )

    return pc_ds.map_batches(flt, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)


def meta_blocking_wep(sf_dir: str, *, q: int = 20, key_len: int = 24,
                      df_cap: int = 8, min_common: int = 1,
                      checkpoint_dir: str | None = None):
    """Weighted Edge Pruning over the q-gram blocking graph (the
    meta-blocking step of Papadakis et al.: treat candidate pairs as
    edges weighted by shared-gram count and keep only edges ABOVE THE
    MEAN weight — a data-derived, parameter-free second prune).
    Applied to the RAW blocking graph (``min_common=1``), the classic
    meta-blocking setting: WEP itself is the count filter, with a
    data-derived threshold instead of a constant. The edge table is
    consumed twice (scalar mean, then filter); it is candidate-bounded,
    and a ``checkpoint_dir`` resumes it from Parquet instead of
    pinning it in the object store. (a_id, b_id, n_common) with
    n_common > mean(n_common)."""
    from hexhamming_ray.state.checkpoint import Checkpointer

    def build():
        return qgram_blocking_pairs(
            sf_dir, q=q, key_len=key_len, df_cap=df_cap,
            min_common=min_common,
        )

    edges = Checkpointer(checkpoint_dir).stage(
        f"qgram_edges_{q}_{key_len}_{df_cap}_{min_common}", build
    )

    def partials(batch: pa.Table) -> pa.Table:
        c = batch.column("n_common").to_numpy()
        return pa.table(
            {"s": pa.array([int(c.sum())], pa.int64()),
             "n": pa.array([c.shape[0]], pa.int64())}
        )

    tot_s = tot_n = 0
    for r in edges.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True,
                               batch_size=None).take_all():
        tot_s += r["s"]
        tot_n += r["n"]

    def flt(batch: pa.Table) -> pa.Table:
        c = batch.column("n_common").to_numpy()
        # c > mean == c * n > sum in exact integers (no float mean:
        # when c*n == sum the IEEE quotient is exact, so the oracle's
        # AVG comparison agrees on the boundary too)
        return batch.filter(pa.array(c * tot_n > tot_s))

    return edges.map_batches(flt, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)


def cnp_blocking_pairs(sf_dir: str, *, q: int = 20, key_len: int = 24,
                       df_cap: int = 8, top_k: int = 2):
    """Cardinality Node Pruning over the q-gram blocking graph (the
    redundancy-positive CNP of the meta-blocking family): each node
    keeps its ``top_k`` strongest edges (shared-gram count desc, then
    neighbor id asc), and an edge survives if EITHER endpoint retained
    it — per-entity candidate budgets instead of a global threshold,
    the skew-robust prune (a hub node cannot flood the candidate set
    past ``top_k * degree_bound``). (a_id, b_id, n_common).

    Shape: the raw pair-count graph mirrors into directed rows, ONE
    keyed exchange on ``node`` makes each adjacency list co-resident
    (rank = run position after an in-block lexsort), and ONE keyed
    exchange on the undirected pair dedups the two directions. Rows
    are 24 bytes; degree lists never sit on the driver."""
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _run_reset_within,
    )

    nparts = _default_partitions()
    raw = _qgram_pair_counts(sf_dir, q, key_len, df_cap)

    empty_dir = pa.table(
        {"node": pa.array([], pa.int64()),
         "other": pa.array([], pa.int64()),
         "n_common": pa.array([], pa.int64())}
    )

    def mirror(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_dir
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        c = batch.column("n_common").to_numpy()
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64()),
             "other": pa.array(np.concatenate([b, a]), pa.int64()),
             "n_common": pa.array(np.concatenate([c, c]), pa.int64())}
        )

    empty_pairs = pa.table(
        {"a_id": pa.array([], pa.int64()),
         "b_id": pa.array([], pa.int64()),
         "n_common": pa.array([], pa.int64())}
    )

    def topk_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_pairs
        node = batch.column("node").to_numpy()
        other = batch.column("other").to_numpy()
        c = batch.column("n_common").to_numpy()
        order = np.lexsort((other, -c, node))
        node_s = node[order]
        rank = _run_reset_within(node_s)
        sel = np.flatnonzero(rank < top_k)
        n_k, o_k, c_k = node_s[sel], other[order][sel], c[order][sel]
        return pa.table(
            {"a_id": pa.array(np.minimum(n_k, o_k), pa.int64()),
             "b_id": pa.array(np.maximum(n_k, o_k), pa.int64()),
             "n_common": pa.array(c_k, pa.int64())}
        )

    def dedup_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_pairs
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        c = batch.column("n_common").to_numpy()
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        first = np.ones(a_s.shape[0], dtype=bool)
        first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        sel = order[first]
        return pa.table(
            {"a_id": pa.array(a[sel], pa.int64()),
             "b_id": pa.array(b[sel], pa.int64()),
             "n_common": pa.array(c[sel], pa.int64())}
        )

    return (
        raw.map_batches(mirror, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=nparts, keys=["node"])
        .map_batches(topk_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=nparts, keys=["a_id", "b_id"])
        .map_batches(dedup_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def golden_record_docs(sf_dir: str, *, key_len: int = 24,
                       window: int = 4, min_sim: float = 0.88,
                       checkpoint_dir: str | None = None):
    """SURVIVORSHIP: merge each fuzzy cluster into one golden record
    with field-level rules — representative = the LONGEST member
    (ties -> min doc_id), language = the cluster's MAJORITY lang
    (ties -> lexicographically smallest), plus member count and total
    chars. The merge step of an ER pipeline (match -> cluster ->
    survive), distinct from :func:`fuzzy_dedup_survivors`, which PICKS
    a row; this one SYNTHESIZES per-field values across members.
    (cluster_id, n_members, rep_doc_id, lang, total_chars).

    Shape: labels join (lang, n_chars) by the tagged-union doc_id
    exchange (no join operator), then ONE cluster_id-keyed exchange;
    every per-cluster rule is a run pass after one in-block lexsort
    (member count = run length, total = reduceat, argmax = run head,
    majority = nested run count). Text never moves."""
    from hexhamming_ray.pipelines.text import _default_partitions, _docs

    labels = er_fuzzy_clusters(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        checkpoint_dir=checkpoint_dir,
    )

    def tag_lab(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "cluster_id": batch.column("cluster_id").cast(pa.int64()),
             "lang": pa.nulls(len(batch), pa.string()),
             "n_chars": pa.nulls(len(batch), pa.int64())}
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "cluster_id": pa.nulls(len(batch), pa.int64()),
             "lang": batch.column("lang"),
             "n_chars": batch.column("n_chars").cast(pa.int64())}
        )

    merged_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "cluster_id": pa.array([], pa.int64()),
         "lang": pa.array([], pa.string()),
         "n_chars": pa.array([], pa.int64())}
    )

    def merge_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return merged_schema
        is_lab = pc.is_valid(batch.column("cluster_id")).to_numpy(
            zero_copy_only=False
        )
        ids = batch.column("doc_id").to_numpy()
        clu = batch.column("cluster_id").fill_null(0).to_numpy(
            zero_copy_only=False
        )
        nch = batch.column("n_chars").fill_null(0).to_numpy(
            zero_copy_only=False
        )
        lo = np.argsort(ids[is_lab])
        do = np.argsort(ids[~is_lab])
        doc_rows = np.flatnonzero(~is_lab)[do]
        return pa.table(
            {"doc_id": pa.array(ids[is_lab][lo], pa.int64()),
             "cluster_id": pa.array(clu[is_lab][lo], pa.int64()),
             "lang": batch.column("lang").take(
                 pa.array(doc_rows, pa.int64())),
             "n_chars": pa.array(nch[~is_lab][do], pa.int64())}
        )

    golden_schema = pa.table(
        {"cluster_id": pa.array([], pa.int64()),
         "n_members": pa.array([], pa.int64()),
         "rep_doc_id": pa.array([], pa.int64()),
         "lang": pa.array([], pa.string()),
         "total_chars": pa.array([], pa.int64())}
    )

    def golden_block(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return golden_schema
        clu = batch.column("cluster_id").to_numpy()
        nch = batch.column("n_chars").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        lmat, _ = pad_matrix(lang)
        lang_s = np.ascontiguousarray(lmat).view(
            f"S{lmat.shape[1]}"
        ).ravel()
        # rep pick + count + total in ONE (cluster, -len, id) order
        order = np.lexsort((ids, -nch, clu))
        clu_s = clu[order]
        head = np.ones(m, dtype=bool)
        head[1:] = clu_s[1:] != clu_s[:-1]
        starts = np.flatnonzero(head)
        n_members = np.diff(np.r_[starts, m])
        totals = np.add.reduceat(nch[order], starts)
        rep_ids = ids[order][starts]
        # majority lang: (cluster, lang) run counts, then per-cluster
        # max count (ties -> smallest lang bytes) as another run head
        o2 = np.lexsort((lang_s, clu))
        cl2, ls2 = clu[o2], lang_s[o2]
        new2 = np.ones(m, dtype=bool)
        new2[1:] = (cl2[1:] != cl2[:-1]) | (ls2[1:] != ls2[:-1])
        s2 = np.flatnonzero(new2)
        cnt2 = np.diff(np.r_[s2, m])
        cl3, ls3 = cl2[s2], ls2[s2]
        # ls3 ascends within a cluster already; stable argsort on
        # (-cnt) within cluster keeps the smallest-lang tie winner
        o3 = np.lexsort((ls3, -cnt2, cl3))
        cl3_s = cl3[o3]
        head3 = np.ones(cl3_s.shape[0], dtype=bool)
        head3[1:] = cl3_s[1:] != cl3_s[:-1]
        maj_rows = o2[s2][o3[head3]]  # row of each winning run's head
        return pa.table(
            {"cluster_id": pa.array(clu_s[starts], pa.int64()),
             "n_members": pa.array(n_members.astype(np.int64),
                                   pa.int64()),
             "rep_doc_id": pa.array(rep_ids, pa.int64()),
             "lang": lang.take(pa.array(maj_rows, pa.int64())),
             "total_chars": pa.array(totals.astype(np.int64),
                                     pa.int64())}
        )

    nparts = _default_partitions()
    u = labels.map_batches(
        tag_lab, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).union(
        _docs(sf_dir, ["doc_id", "lang", "n_chars"], hash_shuffle=True)
        .map_batches(tag_doc, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    return (
        u.repartition(num_blocks=nparts, keys=["doc_id"])
        .map_batches(merge_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=nparts, keys=["cluster_id"])
        .map_batches(golden_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


# ---------------------------------------------------------------------------
# cross-source record linkage (A x B matching, not dedup)
# ---------------------------------------------------------------------------

# doc->source lut broadcast ceiling: 20M docs x 16 bytes = 320 MB in
# one ray.put; above it the post-filter joins carry any corpus
CROSS_SOURCE_BROADCAST_CAP = 20_000_000


def _source_lut(sf_dir: str):
    """(sorted doc ids, 64-bit source hashes) — equality of hashes ==
    equality of source strings (the line_dedup convention)."""
    from hexhamming_ray.functions.hashing import (
        _window_hashes,
        utf8_view,
    )
    from hexhamming_ray.pipelines.text import _docs, _gather_table

    def f(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        buf, lens, starts = utf8_view(src)
        h = np.zeros(lens.shape[0], dtype=np.uint64)
        ne = np.flatnonzero(lens > 0)
        if ne.shape[0]:
            h[ne] = _window_hashes(buf, starts[ne], starts[ne] + lens[ne])
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "src_h": pa.array(h.view(np.int64), pa.int64()),
            }
        )

    t = _gather_table(
        _docs(sf_dir, ["doc_id", "source"]).map_batches(
            f, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        pa.schema([("doc_id", pa.int64()), ("src_h", pa.int64())]),
    )
    ids = t.column("doc_id").to_numpy()
    order = np.argsort(ids)
    return (
        np.ascontiguousarray(ids[order]),
        np.ascontiguousarray(t.column("src_h").to_numpy()[order]),
    )


def cross_source_links(sf_dir: str, *, key_len: int = 24,
                       window: int = 4, min_sim: float = 0.85,
                       force_join: bool = False):
    """CROSS-SOURCE RECORD LINKAGE: Jaro-Winkler matches restricted to
    pairs whose documents come from DIFFERENT sources — the A x B
    matching problem proper (find the same entity across feeds), as
    opposed to within-corpus dedup. (a_id, b_id, jw_sim).

    Under ``CROSS_SOURCE_BROADCAST_CAP`` docs the (doc -> source-hash)
    lut broadcasts once and the cross-source cut runs INSIDE the pair
    block BEFORE scoring (``pair_filter``), so same-source pairs never
    cost an edit-distance call; above the cap (or ``force_join``) the
    scored pairs post-filter through two native hash joins on a narrow
    (doc_id, src_h) table — paths pinned equal by a forced-fallback
    test."""
    import pyarrow.parquet as _pq

    import ray

    n_docs = _pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows
    if not force_join and n_docs <= CROSS_SOURCE_BROADCAST_CAP:
        ref = ray.put(_source_lut(sf_dir))
        holder = {}

        def pair_filter(a_ids, b_ids):
            if "lut" not in holder:
                holder["lut"] = ray.get(ref)
            from hexhamming_ray.pipelines.relational import _lut_probe

            ids, src = holder["lut"]
            pa_, ha = _lut_probe(ids, a_ids)
            pb, hb = _lut_probe(ids, b_ids)
            assert ha.all() and hb.all()
            return src[pa_] != src[pb]

        return _sn_scored_pairs(sf_dir, key_len, window,
                                _JwScorer(min_sim),
                                pair_filter=pair_filter)

    from hexhamming_ray.pipelines.text import _default_partitions, _docs

    num_partitions = _default_partitions()
    pairs = _sn_scored_pairs(sf_dir, key_len, window,
                             _JwScorer(min_sim))

    def srcs(batch: pa.Table) -> pa.Table:
        from hexhamming_ray.functions.hashing import (
            _window_hashes,
            utf8_view,
        )

        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        buf, lens, starts = utf8_view(src)
        h = np.zeros(lens.shape[0], dtype=np.uint64)
        ne = np.flatnonzero(lens > 0)
        if ne.shape[0]:
            h[ne] = _window_hashes(buf, starts[ne], starts[ne] + lens[ne])
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "src_h": pa.array(h.view(np.int64), pa.int64()),
            }
        )

    st = _docs(sf_dir, ["doc_id", "source"], hash_shuffle=True).map_batches(
        srcs, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    a_side = st.rename_columns(["a_doc", "a_src"])
    b_side = st.rename_columns(["b_doc", "b_src"])
    j = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions,
        on=("a_id",), right_on=("a_doc",),
    ).join(
        b_side, join_type="inner", num_partitions=num_partitions,
        on=("b_id",), right_on=("b_doc",),
    )

    empty = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "jw_sim": pa.array([], pa.float64()),
        }
    )

    def keep_cross(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        m = pc.invert(
            pc.equal(batch.column("a_src"), batch.column("b_src"))
        )
        kept = batch.filter(m)
        return pa.table(
            {
                "a_id": kept.column("a_id").cast(pa.int64()),
                "b_id": kept.column("b_id").cast(pa.int64()),
                "jw_sim": kept.column("jw_sim"),
            }
        )

    return j.map_batches(keep_cross, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)


def source_overlap_matrix(sf_dir: str, *, key_len: int = 24,
                          window: int = 4, min_sim: float = 0.85,
                          num_partitions: int | None = None):
    """SOURCE-OVERLAP MATRIX: how many cross-source matches each
    unordered source pair contributes — the heatmap a practitioner
    reads to find which feeds duplicate each other. One row per
    linked source pair: (src_a, src_b, n_links), src_a < src_b
    lexicographically.

    Shape: the cross-source pair stream re-attaches source STRINGS by
    joining the narrow (doc_id, source) table twice (native hash
    joins — the matrix is the above-cap shape by construction), then
    partial-combines per block and coalesces: the exchange carries at
    most |sources|^2 / 2 rows."""
    from hexhamming_ray.pipelines.text import _default_partitions, _docs

    import ray

    num_partitions = num_partitions or _default_partitions()
    pairs = cross_source_links(sf_dir, key_len=key_len, window=window,
                               min_sim=min_sim)
    # note-63 sentinel: a single-source corpus yields ZERO cross
    # pairs, and a schema-less empty join input raises in the hash
    # join; the impossible-key row (-1 never matches a doc_id) keeps
    # the input metadata-known and drops out of the inner join
    seed = ray.data.from_arrow(
        pa.table(
            {
                "a_id": pa.array([-1], pa.int64()),
                "b_id": pa.array([-1], pa.int64()),
                "jw_sim": pa.array([0.0], pa.float64()),
            }
        )
    )
    pairs = seed.union(pairs)
    src = _docs(sf_dir, ["doc_id", "source"], hash_shuffle=True)
    a_side = src.rename_columns(["a_doc", "a_source"])
    b_side = src.rename_columns(["b_doc", "b_source"])
    j1 = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions,
        on=("a_id",), right_on=("a_doc",),
    )
    # the FIRST join's output partitions can be schema-less empties
    # too (the zero-pair corpus again) — re-seed before join 2
    seed2 = ray.data.from_arrow(
        pa.table(
            {
                "a_id": pa.array([-1], pa.int64()),
                "b_id": pa.array([-1], pa.int64()),
                "jw_sim": pa.array([0.0], pa.float64()),
                "a_source": pa.array([""], pa.string()),
            }
        )
    )
    j = seed2.union(j1).join(
        b_side, join_type="inner", num_partitions=num_partitions,
        on=("b_id",), right_on=("b_doc",),
    )

    empty = pa.table(
        {
            "src_a": pa.array([], pa.string()),
            "src_b": pa.array([], pa.string()),
            "n_links": pa.array([], pa.int64()),
        }
    )

    def combine(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        a = batch.column("a_source")
        b = batch.column("b_source")
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        m = pc.less(a, b)  # memcmp order, == DuckDB varchar ORDER BY
        g = pa.table(
            {
                "src_a": pc.if_else(m, a, b),
                "src_b": pc.if_else(m, b, a),
            }
        ).group_by(["src_a", "src_b"]).aggregate([("src_a", "count")])
        return pa.table(
            {
                "src_a": g.column("src_a"),
                "src_b": g.column("src_b"),
                "n_links": g.column("src_a_count").cast(pa.int64()),
            }
        )

    part = j.map_batches(combine, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
    # |sources|^2-bounded: gather the tiny partials and group-sum
    # driver-side, returning a pa.Table (a 0-row Dataset loses its
    # schema through to_pandas — the q11 driver-contract fix)
    from hexhamming_ray.pipelines.text import _gather_table

    t = _gather_table(part, empty.schema)
    if len(t) == 0:
        return empty
    g = t.group_by(["src_a", "src_b"]).aggregate([("n_links", "sum")])
    return pa.table(
        {
            "src_a": g.column("src_a"),
            "src_b": g.column("src_b"),
            "n_links": g.column("n_links_sum").cast(pa.int64()),
        }
    )
