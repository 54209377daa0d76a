"""Candidate-pair scoring: the engine's analog of the reference's
pairwise Hamming kernels, run block-at-a-time over the banded corpus.

Two execution surfaces share one core:

* ``ScoreBlock`` — callable class for ``groupby('bkey').map_groups``:
  one candidate block per call. Used for the (tiny) boundary pass and
  directly in tests.
* ``ScoreRuns`` — callable class for ``map_batches`` over a dataset
  SORTED by ``bkey``: iterates key runs inside each block with numpy
  (singleton runs are skipped vectorized, length-2 runs — the vast
  majority — are scored in one batched XOR+popcount, longer runs reuse
  the block core). This replaces the groupby+map_groups scoring path,
  whose per-group Python overhead dominated at bench scale, and it
  makes the hot-key pre-count pass unnecessary (singletons cost two
  numpy comparisons instead of a shuffle + broadcast filter). Runs
  touching a block edge may continue in the neighbor block, so each
  block's first and last run are NOT scored here — ``boundary_rows``
  extracts them for a small groupby pass (per sorted block there are
  at most 2 such runs).

Actor-pool discipline: the popcount tables and the preallocated XOR
tile live in ``__init__`` (once per actor; cf. the reference's
once-per-process ``set_algo`` pointer selection, python_hexhamming.cc:
443-496 — made per-actor because the reference's global mutation is not
thread-safe, SURVEY.md §4.1).

Semantics: pairs with ``dist <= threshold`` (inclusive, matching
check_hexstrings_within_dist, python_hexhamming.cc:62-64). CANONICAL-
BAND emission: a near-dup pair shares many of its 16 bands; each pair
is emitted only by the FIRST band whose keys match, so the edge stream
is unique by construction and needs no dedup shuffle (measured 9x
output reduction). Identical fingerprints match every band, so their
0-distance star edges are owned by band 0; within a block identical
fingerprints collapse to identity classes connected by STAR edges
(union-find needs connectivity, not cliques — skew hubs cost O(k)).

Oversized blocks (> ``cap`` distinct fingerprints — boilerplate
floods) are SALTED into contiguous sub-blocks of ``cap`` rows of the
lexicographically-sorted fingerprint list (near-identical rows sort
adjacently, so each sub-block holds a coherent slice of the flood):
all-pairs within each sub-block plus an all-pairs REPRESENTATIVE
cross-pass (first fingerprint of every sub-block) — in a flood the
representatives are near-identical too, so the cross-pass CONNECTS the
sub-blocks and union-find recovers the whole flood as one cluster.
Skipped cross-sub-block comparisons are counted in ``pairs_capped`` —
a documented, bounded degradation (O(k * cap + (k/cap)^2) instead of
O(k^2)) that preserves cluster-level recall (SURVEY.md §4.2 skew row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray.functions.kernel import AllPairsScorer, fsb_to_matrix

_SCORER_CACHE: dict = {}  # per-process (width, tile, kernel) -> AllPairsScorer

EDGE_SCHEMA = pa.schema(
    [("id_lo", pa.int64()), ("id_hi", pa.int64()), ("dist", pa.int32())]
)

# candidate recall at threshold T with 16 x 16-bit bands: deterministic
# (pigeonhole) for dist < 16; probabilistic above — P(shared band) =
# 1-(1-(1-d/256)^16)^16 = 0.9994 at d=20. Corpus negatives sit at
# dist >= ~100, so the wide threshold costs no precision.
DEFAULT_THRESHOLD = 20
DEFAULT_CAP = 4096
BAND_BITS = 16


def _edges_table(lo, hi, dd) -> pa.Table:
    return pa.table(
        {
            "id_lo": pa.array(lo, type=pa.int64()),
            "id_hi": pa.array(hi, type=pa.int64()),
            "dist": pa.array(np.asarray(dd, dtype=np.int32), type=pa.int32()),
        },
        schema=EDGE_SCHEMA,
    )


def _first_match_band(fa: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """Index of the first 2-byte band segment where each row pair of
    (N, 32) fingerprint matrices is equal. Guaranteed to exist for
    pairs surfaced by a shared-band group."""
    n_bands = fa.shape[1] // 2
    eq = (fa.reshape(-1, n_bands, 2) == fb.reshape(-1, n_bands, 2)).all(axis=2)
    return np.argmax(eq, axis=1)


class _ScoreCore:
    def __init__(
        self,
        threshold: int = DEFAULT_THRESHOLD,
        width: int = 32,
        tile: int = 256,
        cap: int = DEFAULT_CAP,
        window: int = 128,
        kernel: str | None = None,
        counter=None,
    ):
        self.threshold = threshold
        self.cap = cap
        self.window = window  # retained for API compat; salted sub-blocks
        # replaced the sorted-neighbor window fallback (round-2 VERDICT #5)
        self._scorer_args = (width, tile, kernel)
        self._scorer: AllPairsScorer | None = None
        self.pairs_scored = 0
        self.pairs_capped = 0
        # optional PairCounter actor handle (state/metrics.py); deltas
        # are flushed per batch so task-based instances still report
        self.counter = counter
        self._flushed = (0, 0)

    def flush_counts(self) -> None:
        """Report the tally delta since the last flush to the counter
        actor (awaited: the count is durable before the batch output
        is), then remember the high-water mark."""
        if self.counter is None:
            return
        ds = self.pairs_scored - self._flushed[0]
        dc = self.pairs_capped - self._flushed[1]
        if ds or dc:
            import ray

            ray.get(self.counter.add.remote(ds, dc))
            self._flushed = (self.pairs_scored, self.pairs_capped)

    @property
    def scorer(self) -> AllPairsScorer:
        """Lazily built AND process-cached by (width, tile, kernel):
        instances pickle without the preallocated XOR tile, and every
        task/actor in the same worker process shares one tile — so
        task-based scoring (no actor-pool spin-up) still pays the
        scratch page-fault cost once per WORKER, not once per task."""
        if self._scorer is None:
            key = self._scorer_args
            cached = _SCORER_CACHE.get(key)
            if cached is None:
                width, tile, kernel = key
                cached = AllPairsScorer(width=width, tile=tile, kernel=kernel)
                _SCORER_CACHE[key] = cached
            self._scorer = cached
        return self._scorer

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_scorer"] = None
        return state

    def score_run(self, band_idx: int, ids: np.ndarray, mat: np.ndarray):
        """One candidate block (>= 2 rows sharing a band key) ->
        (lo, hi, dist) arrays under canonical-band emission."""
        uniq, inv = np.unique(mat, axis=0, return_inverse=True)
        u = uniq.shape[0]
        order = np.lexsort((ids, inv))  # group identity classes, min id first
        sid = ids[order]
        sinv = inv[order]
        class_start = np.searchsorted(sinv, np.arange(u), side="left")
        class_end = np.searchsorted(sinv, np.arange(u), side="right")
        rep = sid[class_start]  # min id of each class
        lo_list, hi_list, d_list = [], [], []
        dup_mask = (class_end - class_start) > 1
        if band_idx == 0 and dup_mask.any():
            members = np.concatenate(
                [
                    sid[class_start[c] + 1 : class_end[c]]
                    for c in np.nonzero(dup_mask)[0]
                ]
            )
            reps_rep = np.repeat(
                rep[dup_mask], (class_end - class_start)[dup_mask] - 1
            )
            lo_list.append(reps_rep)
            hi_list.append(members)
            d_list.append(np.zeros(members.shape[0], dtype=np.int64))
        if u > 1:
            if u <= self.cap:
                ii, jj, dd = self.scorer.pairs_within(uniq, self.threshold)
                self.pairs_scored += u * (u - 1) // 2
            else:
                ii, jj, dd = self._salted_subblocks(uniq)
            if ii.size:
                own = _first_match_band(uniq[ii], uniq[jj]) == band_idx
                ii, jj, dd = ii[own], jj[own], dd[own]
            if ii.size:
                a = rep[ii]
                b = rep[jj]
                lo_list.append(np.minimum(a, b))
                hi_list.append(np.maximum(a, b))
                d_list.append(dd)
        if not lo_list:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return (
            np.concatenate(lo_list),
            np.concatenate(hi_list),
            np.concatenate(d_list),
        )

    def score_pairs_vectorized(
        self,
        band_idx: np.ndarray,
        ids_a: np.ndarray,
        ids_b: np.ndarray,
        fa: np.ndarray,
        fb: np.ndarray,
    ):
        """All length-2 runs of a block at once: rowwise distance +
        vectorized canonical-band ownership."""
        from hexhamming_ray.functions.kernel import hamming_rowwise

        d = hamming_rowwise(fa, fb)
        self.pairs_scored += d.shape[0]
        keep = (d <= self.threshold) & (_first_match_band(fa, fb) == band_idx)
        if not keep.any():
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        a = ids_a[keep]
        b = ids_b[keep]
        return np.minimum(a, b), np.maximum(a, b), d[keep]

    def _salted_subblocks(self, uniq: np.ndarray):
        """Bounded fallback for flooded blocks (SURVEY §4.2/§7 M2
        salting): np.unique already returns fingerprints in
        lexicographic order, so near-identical rows sort adjacently;
        split into contiguous sub-blocks of ``cap`` rows, score
        all-pairs WITHIN each sub-block, then all-pairs among the
        sub-block representatives (row 0 of each) so flooded clusters
        stay CONNECTED across sub-blocks for union-find. Unscored
        cross-sub-block pairs are tallied in ``pairs_capped``."""
        u = uniq.shape[0]
        starts = np.arange(0, u, self.cap)
        outs = ([], [], [])
        scored = 0
        for s in starts:
            e = min(s + self.cap, u)
            k = e - s
            if k < 2:
                continue
            ii, jj, dd = self.scorer.pairs_within(uniq[s:e], self.threshold)
            scored += k * (k - 1) // 2
            if ii.size:
                outs[0].append(ii + s)
                outs[1].append(jj + s)
                outs[2].append(dd)
        if starts.shape[0] > 1:
            reps = starts  # first (lexicographically smallest) row each
            ii, jj, dd = self.scorer.pairs_within(uniq[reps], self.threshold)
            scored += reps.shape[0] * (reps.shape[0] - 1) // 2
            if ii.size:
                outs[0].append(reps[ii])
                outs[1].append(reps[jj])
                outs[2].append(dd)
        self.pairs_scored += scored
        self.pairs_capped += u * (u - 1) // 2 - scored
        if not outs[0]:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return (
            np.concatenate(outs[0]),
            np.concatenate(outs[1]),
            np.concatenate(outs[2]),
        )


class ScoreBlock(_ScoreCore):
    """One candidate block per call (groupby().map_groups surface)."""

    def __call__(self, group: pa.Table) -> pa.Table:
        n = len(group)
        if n < 2:
            return EDGE_SCHEMA.empty_table()
        band_idx = int(group.column("bkey")[0].as_py()) >> BAND_BITS
        ids = group.column("file_id").to_numpy()
        mat = fsb_to_matrix(group.column("simhash"))
        lo, hi, dd = self.score_run(band_idx, ids, mat)
        self.flush_counts()
        return _edges_table(lo, hi, dd)


def _run_bounds(keys: np.ndarray):
    """Starts/ends of equal-key runs in a sorted key array."""
    n = keys.shape[0]
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    return starts, ends


class ScoreRuns(_ScoreCore):
    """Scores the key runs of a bkey-sorted block.

    Two partitioning modes:
    * ``edge_runs=False`` (range-sorted input): the first and last runs
      may continue in neighbor blocks, so they are left to a boundary
      pass.
    * ``edge_runs=True`` (HASH-partitioned input,
      ``repartition(keys=['bkey'], sort=True)``): every key lives in
      exactly one block, so ALL runs are scored here and no boundary
      pass exists — one operator fewer in the plan."""

    def __init__(self, *args, edge_runs: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.edge_runs = edge_runs

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return EDGE_SCHEMA.empty_table()
        keys = batch.column("bkey").to_numpy()
        starts, ends = _run_bounds(keys)
        if not self.edge_runs:
            if starts.shape[0] <= 2:
                return EDGE_SCHEMA.empty_table()  # all runs are boundary
            starts, ends = starts[1:-1], ends[1:-1]
        lens = ends - starts
        multi = lens >= 2
        if not multi.any():
            return EDGE_SCHEMA.empty_table()
        ids = batch.column("file_id").to_numpy()
        mat = fsb_to_matrix(batch.column("simhash"))
        lo_l, hi_l, d_l = [], [], []
        # length-2 runs: one vectorized pass
        m2 = lens == 2
        if m2.any():
            s = starts[m2]
            lo, hi, dd = self.score_pairs_vectorized(
                (keys[s] >> BAND_BITS).astype(np.int64),
                ids[s],
                ids[s + 1],
                mat[s],
                mat[s + 1],
            )
            if lo.size:
                lo_l.append(lo)
                hi_l.append(hi)
                d_l.append(dd)
        # longer runs: per-run core (clusters with >2 members per band)
        for s, e in zip(starts[lens >= 3], ends[lens >= 3]):
            band_idx = int(keys[s]) >> BAND_BITS
            lo, hi, dd = self.score_run(band_idx, ids[s:e], mat[s:e])
            if lo.size:
                lo_l.append(lo)
                hi_l.append(hi)
                d_l.append(dd)
        self.flush_counts()
        if not lo_l:
            return EDGE_SCHEMA.empty_table()
        return _edges_table(
            np.concatenate(lo_l), np.concatenate(hi_l), np.concatenate(d_l)
        )


def boundary_rows(batch: pa.Table) -> pa.Table:
    """First and last key run of a bkey-sorted block — the rows whose
    runs may straddle block boundaries (scored by a small groupby)."""
    n = len(batch)
    if n == 0:
        return batch
    keys = batch.column("bkey").to_numpy()
    starts, ends = _run_bounds(keys)
    if starts.shape[0] == 1:
        return batch  # single run spans the whole block
    idx = np.concatenate(
        [np.arange(0, ends[0]), np.arange(starts[-1], n)]
    )
    return batch.take(pa.array(idx))
