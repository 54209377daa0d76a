"""Candidate-pair scoring: the engine's analog of the reference's
pairwise Hamming kernels, run block-at-a-time inside the band groupby.

``ScoreBlock`` is a callable CLASS used with
``groupby('bkey').map_groups(ScoreBlock, concurrency=N)`` — an actor
pool: the popcount kernel tables and the preallocated XOR tile live in
``__init__`` (once per actor; cf. the reference's once-per-process
``set_algo`` pointer selection, python_hexhamming.cc:443-496 — made
per-actor instead of global because the reference's global mutation is
not thread-safe, SURVEY.md §4.1).

Within a block the scorer first collapses identical fingerprints
(clones frequently share an exact simhash) and emits STAR edges inside
each identity class — union-find needs connectivity, not cliques, so a
k-member class costs k-1 edges, which is what keeps skew hubs linear.
Distinct fingerprints are scored all-pairs with the vectorized
XOR+popcount tile kernel; pairs with ``dist <= threshold`` (inclusive,
matching check_hexstrings_within_dist semantics, python_hexhamming.cc:
62-64) become edges between class representatives.

Oversized blocks (> ``cap`` distinct fingerprints — boilerplate floods)
fall back to sorted-neighbor scoring within a window and count the
skipped comparisons in the ``pairs_capped`` column of the metrics
output — a documented, bounded degradation instead of an O(k^2) blowup
(SURVEY.md §4.2 skew row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexhamming_ray.functions.kernel import AllPairsScorer, fsb_to_matrix

EDGE_SCHEMA = pa.schema(
    [("id_lo", pa.int64()), ("id_hi", pa.int64()), ("dist", pa.int32())]
)

# candidate recall at threshold T with 16 x 16-bit bands: deterministic
# (pigeonhole) for dist < 16; probabilistic above — P(shared band) =
# 1-(1-(1-d/256)^16)^16 = 0.9994 at d=20. Corpus negatives sit at
# dist >= ~100, so the wide threshold costs no precision.
DEFAULT_THRESHOLD = 20
DEFAULT_CAP = 4096


class ScoreBlock:
    def __init__(
        self,
        threshold: int = DEFAULT_THRESHOLD,
        width: int = 32,
        tile: int = 1024,
        cap: int = DEFAULT_CAP,
        window: int = 128,
        kernel: str | None = None,
    ):
        self.threshold = threshold
        self.cap = cap
        self.window = window
        self.scorer = AllPairsScorer(width=width, tile=tile, kernel=kernel)
        self.pairs_scored = 0
        self.pairs_capped = 0

    def __call__(self, group: pa.Table) -> pa.Table:
        n = len(group)
        if n < 2:
            return EDGE_SCHEMA.empty_table()
        # this group's band index: combined key = band_idx << band_width
        band_idx = int(group.column("bkey")[0].as_py()) >> 16
        ids = group.column("file_id").to_numpy()
        mat = fsb_to_matrix(group.column("simhash"))
        uniq, inv = np.unique(mat, axis=0, return_inverse=True)
        u = uniq.shape[0]
        # representative (min id) per identity class + star edges inside it
        order = np.lexsort((ids, inv))  # group classes, min id first
        sid = ids[order]
        sinv = inv[order]
        class_start = np.searchsorted(sinv, np.arange(u), side="left")
        class_end = np.searchsorted(sinv, np.arange(u), side="right")
        rep = sid[class_start]  # min id of each class
        lo_list = []
        hi_list = []
        d_list = []
        # CANONICAL-BAND emission: a near-dup pair shares many of its 16
        # bands, so emitting from every shared band multiplies shuffle
        # volume ~9x (measured). Each pair is emitted only by the FIRST
        # band whose keys match — unique by construction, which also
        # removes the downstream pair-dedup shuffle entirely.
        # Identical fingerprints match every band -> their star edges
        # are owned by band 0.
        dup_mask = (class_end - class_start) > 1
        if band_idx == 0 and dup_mask.any():
            members = np.concatenate(
                [sid[class_start[c] + 1 : class_end[c]] for c in np.nonzero(dup_mask)[0]]
            )
            reps_rep = np.repeat(rep[dup_mask], (class_end - class_start)[dup_mask] - 1)
            lo_list.append(reps_rep)
            hi_list.append(members)
            d_list.append(np.zeros(members.shape[0], dtype=np.int64))
        if u > 1:
            if u <= self.cap:
                ii, jj, dd = self.scorer.pairs_within(uniq, self.threshold)
                self.pairs_scored += u * (u - 1) // 2
            else:
                ii, jj, dd = self._sorted_neighbor(uniq)
                self.pairs_scored += (u - 1) * self.window
                self.pairs_capped += u * (u - 1) // 2 - (u - 1) * self.window
            if ii.size:
                own = self._first_match_band(uniq, ii, jj) == band_idx
                ii, jj, dd = ii[own], jj[own], dd[own]
            if ii.size:
                a = rep[ii]
                b = rep[jj]
                lo_list.append(np.minimum(a, b))
                hi_list.append(np.maximum(a, b))
                d_list.append(dd)
        if not lo_list:
            return EDGE_SCHEMA.empty_table()
        return pa.table(
            {
                "id_lo": pa.array(np.concatenate(lo_list), type=pa.int64()),
                "id_hi": pa.array(np.concatenate(hi_list), type=pa.int64()),
                "dist": pa.array(
                    np.concatenate(d_list).astype(np.int32), type=pa.int32()
                ),
            },
            schema=EDGE_SCHEMA,
        )

    @staticmethod
    def _first_match_band(uniq: np.ndarray, ii: np.ndarray, jj: np.ndarray):
        """Index of the first band (16 x 2-byte segments of the 256-bit
        fingerprint) where each pair's keys are equal. Guaranteed to
        exist for pairs surfaced by a shared-band group."""
        n_bands = uniq.shape[1] // 2
        a = uniq[ii].reshape(ii.shape[0], n_bands, 2)
        b = uniq[jj].reshape(jj.shape[0], n_bands, 2)
        eq = (a == b).all(axis=2)  # (npairs, n_bands)
        return np.argmax(eq, axis=1)

    def _sorted_neighbor(self, uniq: np.ndarray):
        """Bounded fallback for flooded blocks: np.unique already returns
        fingerprints in lexicographic order, so near-identical rows sort
        adjacently; score each row against the next `window` rows."""
        u = uniq.shape[0]
        w = self.window
        outs = ([], [], [])
        for off in range(1, w + 1):
            a = uniq[: u - off]
            b = uniq[off:]
            if a.shape[0] == 0:
                break
            d = self.scorer._fn(a ^ b)
            hit = np.nonzero(d <= self.threshold)[0]
            if hit.size:
                outs[0].append(hit)
                outs[1].append(hit + off)
                outs[2].append(d[hit])
        if not outs[0]:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return (
            np.concatenate(outs[0]),
            np.concatenate(outs[1]),
            np.concatenate(outs[2]),
        )
