"""Cluster-level ER evaluation + match-decision operators.

The reference is the pairwise scorer of a record-linkage system
(method table ``python_hexhamming.cc:421-428``); this module supplies
the EVALUATION and DECISION layers an ER practitioner runs on top of
the blocking/scoring/clustering machinery already in strmatch.py:

- :func:`er_bcubed_eval` — B-cubed precision/recall/F1 of the fuzzy
  clustering against the exact-Jaccard truth clustering (the standard
  cluster-level ER metric; Bagga & Baldwin 1998).
- :func:`er_rand_index` — pair-counting Rand index of the same two
  clusterings (all-integer, ppm).
- :func:`mutual_best_match` — reciprocal-best-match linkage decision
  (a pair survives iff each side is the other's best-scoring
  candidate), the order-free one-to-one matcher.
- :func:`fs_match_scores` — Fellegi-Sunter style multi-field
  agreement weighting over blocked candidate pairs with
  match/possible/nonmatch thresholds (Fellegi & Sunter 1969).
- :func:`match_graph_triangles` — triangle census / global clustering
  coefficient of the match graph (the transitivity diagnostic that
  says whether threshold-pairs behave like equivalence classes).
- :func:`match_graph_modularity` — Newman modularity of the chosen
  clustering over the looser match graph.
- :func:`er_confusion_report` — cluster-level split/merge census.
- :func:`er_threshold_sweep` / :func:`er_fs_eval` — operating-point
  tables (precision/recall/F1 per threshold; the FS decision layer
  scored against truth).
- :func:`mutual_best_match` / :func:`match_candidates_topk` — the
  one-to-one decision and the per-entity review queue.
- :func:`dedup_rate_report` — what the clustering saves.

All deterministic and SQL-value-oracled. Scale shapes are the house
patterns: narrow tagged unions meeting in ONE keyed exchange,
per-block lexsort + run reduction, single-row partials coalesced
driver-side, and every broadcast plan size-switched with the
shuffle/join plan as the unconditional above-cap fallback."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Attr-lut broadcast ceiling for fs_match_scores: 5M docs x 4 int64
# arrays = 160 MB in ONE ray.put. Above it the two native hash joins
# carry any corpus size.
FS_ATTR_BROADCAST_CAP = 5_000_000

# Fellegi-Sunter integer agreement/disagreement weights (fixed
# log-likelihood-ratio surrogates, scaled so thresholds are ints) and
# the decision cutoffs. Mirrored literally in the SQL oracle.
FS_W = {
    "jw": (30, -12),      # Jaro-Winkler(key) >= FS_JW_MIN
    "lang": (24, -8),     # same lang (first 8 bytes)
    "len": (18, -6),      # same n_chars // 64 band
    "tok": (14, -5),      # same token-count // 16 band
}
FS_JW_MIN = 0.92
FS_T_MATCH = 50
FS_T_POSSIBLE = 10

_DECISIONS = pa.array(["nonmatch", "possible", "match"], pa.string())


def _truth_clusters(sf_dir: str):
    """Truth labeling: connected components over the exact token-
    3-gram Jaccard >= 0.5 pair set (the same truth set every blocker
    evaluation in strmatch.py scores against), every document labeled
    with its component's min doc_id via the size-switched
    :func:`~hexhamming_ray.state.unionfind.label_nodes`."""
    from hexhamming_ray.pipelines.text import _docs, ngram_jaccard_exact
    from hexhamming_ray.stages.annsearch import GRAPH_LABEL_BROADCAST_CAP
    from hexhamming_ray.state.unionfind import (
        connected_components,
        label_nodes,
    )

    pairs = ngram_jaccard_exact(sf_dir)

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_lo": batch.column("id_lo").cast(pa.int64()),
                "id_hi": batch.column("id_hi").cast(pa.int64()),
            }
        )

    edges = pairs.map_batches(
        as_edges, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    labels = connected_components(edges)
    nodes = _docs(sf_dir, ["doc_id"], hash_shuffle=True)
    return label_nodes(labels, nodes, "doc_id", "cluster_id",
                       broadcast_cap=GRAPH_LABEL_BROADCAST_CAP)


def _joint_labels(sf_dir: str, *, key_len: int, window: int,
                  min_sim: float, num_partitions: int,
                  checkpoint_dir: str | None = None):
    """(pcid, tcid) — one row per document carrying its PREDICTED
    (fuzzy) and TRUTH (exact-Jaccard) cluster labels. The two label
    Datasets (n rows x 16 bytes each) meet in ONE keyed exchange on
    doc_id as a tagged union; each doc holds exactly one row per side,
    so the merge is a lexsort + stride-2 gather per block."""
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_clusters

    pred = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                             min_sim=min_sim,
                             checkpoint_dir=checkpoint_dir)
    truth = _truth_clusters(sf_dir)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "cid": batch.column("cluster_id").cast(pa.int64()),
                    "side": pa.array(
                        np.full(len(batch), side, np.int64), pa.int64()
                    ),
                }
            )

        return f

    empty = pa.table(
        {
            "pcid": pa.array([], pa.int64()),
            "tcid": pa.array([], pa.int64()),
        }
    )

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        d = batch.column("doc_id").to_numpy()
        c = batch.column("cid").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, d))
        d_s, c_s, s_s = d[order], c[order], s[order]
        a = np.arange(0, d_s.shape[0], 2)
        # every doc has exactly one pred + one truth row; raise (not
        # assert) so the invariant survives `python -O` — a duplicated
        # doc_id would silently misalign every downstream gather
        if not ((d_s[a] == d_s[a + 1]).all() and not s_s[a].any()):
            raise ValueError(
                "joint-label merge: duplicated or unmatched doc_id "
                "(each doc must have exactly one pred + one truth row)"
            )
        return pa.table(
            {
                "pcid": pa.array(c_s[a], pa.int64()),
                "tcid": pa.array(c_s[a + 1], pa.int64()),
            }
        )

    return (
        pred.map_batches(tag(0), batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(truth.map_batches(tag(1), batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(merge, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def _cell_stats(j, key_col: str, other_col: str, num_partitions: int):
    """Single-row-per-block partials after ONE keyed exchange of the
    16-byte (pcid, tcid) rows on ``key_col``: all rows of one key
    cluster (and hence all its joint cells) are co-resident, so one
    lexsort yields cluster sizes p (runs of ``key_col``) and cell
    sizes c (runs of the pair), and the block emits

    - ``sum_ppm``   = sum over cells of ``c * ((1_000_000 * c) // p)``
      (the exact-integer B-cubed numerator: each record in a cell
      contributes ``ppm(c / p)`` floored),
    - ``pairs_key`` = sum of C(p, 2)  (intra-cluster pairs of the key
      side), ``pairs_cell`` = sum of C(c, 2) (pairs clustered together
      on BOTH sides), ``n_rows`` = records seen."""
    empty = pa.table(
        {
            "sum_ppm": pa.array([], pa.int64()),
            "pairs_key": pa.array([], pa.int64()),
            "pairs_cell": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
        }
    )

    def block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        k = batch.column(key_col).to_numpy()
        o = batch.column(other_col).to_numpy()
        order = np.lexsort((o, k))
        k_s, o_s = k[order], o[order]
        new_k = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        new_c = new_k | np.concatenate(([False], o_s[1:] != o_s[:-1]))
        k_starts = np.flatnonzero(new_k)
        c_starts = np.flatnonzero(new_c)
        n = k_s.shape[0]
        k_sizes = np.diff(np.append(k_starts, n))
        c_sizes = np.diff(np.append(c_starts, n))
        cells_per_key = np.add.reduceat(new_c.astype(np.int64), k_starts)
        p_per_cell = np.repeat(k_sizes, cells_per_key)
        contrib = c_sizes * ((1_000_000 * c_sizes) // p_per_cell)
        return pa.table(
            {
                "sum_ppm": pa.array([int(contrib.sum())], pa.int64()),
                "pairs_key": pa.array(
                    [int((k_sizes * (k_sizes - 1) // 2).sum())],
                    pa.int64(),
                ),
                "pairs_cell": pa.array(
                    [int((c_sizes * (c_sizes - 1) // 2).sum())],
                    pa.int64(),
                ),
                "n_rows": pa.array([n], pa.int64()),
            }
        )

    return j.repartition(
        num_blocks=num_partitions, keys=[key_col]
    ).map_batches(block, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)


def _stat_sums(part) -> tuple[int, int, int, int]:
    rows = part.take_all()
    return (
        sum(int(r["sum_ppm"]) for r in rows),
        sum(int(r["pairs_key"]) for r in rows),
        sum(int(r["pairs_cell"]) for r in rows),
        sum(int(r["n_rows"]) for r in rows),
    )


def er_bcubed_eval(sf_dir: str, *, key_len: int = 24, window: int = 4,
                   min_sim: float = 0.88,
                   num_partitions: int | None = None,
                   checkpoint_dir: str | None = None):
    """B-CUBED precision/recall/F1 of the fuzzy clustering
    (:func:`~hexhamming_ray.pipelines.strmatch.er_fuzzy_clusters`)
    against the exact-Jaccard truth clustering — the standard
    cluster-level ER quality metric (per-record overlap ratios,
    averaged), complementing the PAIR-level er_fuzzy_eval. Exact
    integers end-to-end: per-record precision is floored at ppm
    resolution, ``sum(c * ((1_000_000 * c) // p))`` over joint cells,
    then averaged by floor division — the DuckDB oracle states the
    identical expression. ONE row: (n_docs, bcubed_precision_ppm,
    bcubed_recall_ppm, bcubed_f1_ppm).

    Scale: both labelings are n-row x 16-byte Datasets; the joint
    table is materialized ONCE (narrow rows, spillable — the
    pack_sequences trade) and consumed by two keyed exchanges (pcid,
    tcid); partials are one row per block."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    j = _joint_labels(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
    ).materialize()
    sp, _, _, n = _stat_sums(
        _cell_stats(j, "pcid", "tcid", num_partitions)
    )
    sr, _, _, _ = _stat_sums(
        _cell_stats(j, "tcid", "pcid", num_partitions)
    )
    prec = sp // n if n else 0
    rec = sr // n if n else 0
    f1 = 2 * prec * rec // (prec + rec) if prec + rec else 0
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "bcubed_precision_ppm": pa.array([prec], pa.int64()),
            "bcubed_recall_ppm": pa.array([rec], pa.int64()),
            "bcubed_f1_ppm": pa.array([f1], pa.int64()),
        }
    )


def er_rand_index(sf_dir: str, *, key_len: int = 24, window: int = 4,
                  min_sim: float = 0.88,
                  num_partitions: int | None = None,
                  checkpoint_dir: str | None = None):
    """RAND INDEX of the fuzzy clustering vs the exact-Jaccard truth
    clustering: the fraction of document pairs on which the two
    labelings AGREE (both together or both apart), in exact integer
    ppm — the pair-counting companion to :func:`er_bcubed_eval`.
    ONE row: (n_docs, pairs_total, pairs_same_both, pairs_same_pred,
    pairs_same_truth, rand_index_ppm), where ``pairs_same_both`` is
    the number of pairs co-clustered by BOTH labelings (sum of
    C(cell, 2) over joint cells).

    Same machinery as B-cubed: the joint label table meets two keyed
    exchanges; C(p,2)/C(c,2) sums are per-block run arithmetic."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    j = _joint_labels(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
    ).materialize()
    _, sum_p, n11, n = _stat_sums(
        _cell_stats(j, "pcid", "tcid", num_partitions)
    )
    _, sum_t, _, _ = _stat_sums(
        _cell_stats(j, "tcid", "pcid", num_partitions)
    )
    total = n * (n - 1) // 2
    n00 = total - sum_p - sum_t + n11
    ri = 1_000_000 * (n11 + n00) // total if total else 1_000_000
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "pairs_total": pa.array([total], pa.int64()),
            "pairs_same_both": pa.array([n11], pa.int64()),
            "pairs_same_pred": pa.array([sum_p], pa.int64()),
            "pairs_same_truth": pa.array([sum_t], pa.int64()),
            "rand_index_ppm": pa.array([ri], pa.int64()),
        }
    )


def er_adjusted_rand(sf_dir: str, *, key_len: int = 24, window: int = 4,
                     min_sim: float = 0.88,
                     num_partitions: int | None = None,
                     checkpoint_dir: str | None = None):
    """ADJUSTED RAND INDEX (chance-corrected pair agreement; Hubert &
    Arabie 1985) plus the squared Fowlkes–Mallows index of the fuzzy
    clustering vs the exact-Jaccard truth — the chance-corrected
    companions to :func:`er_rand_index` (raw Rand reads high whenever
    clusters are small; ARI subtracts the expected agreement).
    Exact integers end-to-end: with b = pairs clustered together on
    both sides, p/t = the two marginal pair sums and T = C(n,2),
    ``ari_ppm = 1e6 * 2(Tb - pt) / (T(p+t) - 2pt)`` evaluated in
    arbitrary-precision Python ints with TRUNC-toward-zero division
    (mirroring DuckDB's ``//`` on signed values; ARI is negative when
    agreement is below chance), and ``fm2_ppm = 1e6 * b^2 // (p*t)``
    (FM squared stays rational, so no sqrt leaves integer land).
    ONE row: (n_docs, pairs_total, pairs_same_both, pairs_same_pred,
    pairs_same_truth, ari_ppm, fm2_ppm).

    Same physical plan as er_rand_index: the joint label table meets
    two keyed exchanges; all pair sums are per-block run arithmetic;
    the driver holds four integers (the n^4-magnitude products live in
    Python ints / SQL HUGEINT — no int64 cliff)."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    j = _joint_labels(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
    ).materialize()
    _, sum_p, n11, n = _stat_sums(
        _cell_stats(j, "pcid", "tcid", num_partitions)
    )
    _, sum_t, _, _ = _stat_sums(
        _cell_stats(j, "tcid", "pcid", num_partitions)
    )
    total = n * (n - 1) // 2
    num2 = 2 * (total * n11 - sum_p * sum_t)
    den2 = total * (sum_p + sum_t) - 2 * sum_p * sum_t
    if den2 == 0:
        ari = 1_000_000
    elif num2 < 0:
        ari = -((1_000_000 * -num2) // den2)
    else:
        ari = (1_000_000 * num2) // den2
    fm2 = (
        1_000_000 * n11 * n11 // (sum_p * sum_t)
        if sum_p * sum_t
        else 1_000_000
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "pairs_total": pa.array([total], pa.int64()),
            "pairs_same_both": pa.array([n11], pa.int64()),
            "pairs_same_pred": pa.array([sum_p], pa.int64()),
            "pairs_same_truth": pa.array([sum_t], pa.int64()),
            "ari_ppm": pa.array([ari], pa.int64()),
            "fm2_ppm": pa.array([fm2], pa.int64()),
        }
    )


def er_threshold_stability(sf_dir: str, *, key_len: int = 24,
                           window: int = 4, sim_loose: float = 0.88,
                           sim_tight: float = 0.92,
                           num_partitions: int | None = None,
                           checkpoint_dir: str | None = None):
    """THRESHOLD-SENSITIVITY of the clustering itself: the Adjusted
    Rand Index between the fuzzy clusterings at two match thresholds
    (default 0.88 vs 0.92) — how much the PARTITION actually moves
    when the operating point shifts. Pair-level sweeps
    (:func:`er_threshold_sweep`) read precision/recall per threshold
    against truth; this reads the cluster-level agreement between two
    operating points directly, truth-free (ARI near 1e6: the decision
    is insensitive in this band; low: every threshold nudge
    reshuffles entities and the band needs clerical review). ONE row:
    (n_docs, pairs_same_loose, pairs_same_tight, pairs_same_both,
    ari_ppm) — ARI in the same exact trunc-division integer ppm as
    :func:`er_adjusted_rand`.

    Shape: both labelings ride the shared tagged-union doc_id merge
    (16-byte rows), then the er_rand machinery: two keyed exchanges
    over the joint table, run-arithmetic pair sums, four driver-side
    integers; products in Python ints / SQL HUGEINT."""
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_clusters
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    loose = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                              min_sim=sim_loose,
                              checkpoint_dir=checkpoint_dir)
    tight = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                              min_sim=sim_tight,
                              checkpoint_dir=checkpoint_dir)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "cid": batch.column("cluster_id").cast(pa.int64()),
                    "side": pa.array(
                        np.full(len(batch), side, np.int64), pa.int64()
                    ),
                }
            )

        return f

    empty = pa.table(
        {
            "pcid": pa.array([], pa.int64()),
            "tcid": pa.array([], pa.int64()),
        }
    )

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        d = batch.column("doc_id").to_numpy()
        c = batch.column("cid").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, d))
        d_s, c_s, s_s = d[order], c[order], s[order]
        a = np.arange(0, d_s.shape[0], 2)
        if not ((d_s[a] == d_s[a + 1]).all() and not s_s[a].any()):
            raise ValueError(
                "stability merge: duplicated or unmatched doc_id "
                "(each doc needs one row per threshold)"
            )
        return pa.table(
            {
                "pcid": pa.array(c_s[a], pa.int64()),
                "tcid": pa.array(c_s[a + 1], pa.int64()),
            }
        )

    j = (
        loose.map_batches(tag(0), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .union(tight.map_batches(tag(1), batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(merge, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .materialize()
    )
    _, sum_l, n11, n = _stat_sums(
        _cell_stats(j, "pcid", "tcid", num_partitions)
    )
    _, sum_t, _, _ = _stat_sums(
        _cell_stats(j, "tcid", "pcid", num_partitions)
    )
    total = n * (n - 1) // 2
    num2 = 2 * (total * n11 - sum_l * sum_t)
    den2 = total * (sum_l + sum_t) - 2 * sum_l * sum_t
    if den2 == 0:
        ari = 1_000_000
    elif num2 < 0:
        ari = -((1_000_000 * -num2) // den2)
    else:
        ari = (1_000_000 * num2) // den2
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "pairs_same_loose": pa.array([sum_l], pa.int64()),
            "pairs_same_tight": pa.array([sum_t], pa.int64()),
            "pairs_same_both": pa.array([n11], pa.int64()),
            "ari_ppm": pa.array([ari], pa.int64()),
        }
    )


def mutual_best_match(sf_dir: str, *, key_len: int = 24,
                      window: int = 4, min_sim: float = 0.88,
                      num_partitions: int | None = None,
                      checkpoint_dir: str | None = None):
    """RECIPROCAL-BEST-MATCH linkage: from the Jaro-Winkler-scored
    sorted-neighborhood candidates, keep a pair iff each document is
    the other's single best-scoring candidate (ties broken toward the
    smaller partner id) — the order-free one-to-one match decision
    (every doc appears in at most one output pair... of which it is a
    mutual optimum). (a_id, b_id, jw_sim) with a_id < b_id.

    Shape: pairs symmetrize into 24-byte (id, partner, sim) rows ->
    ONE keyed exchange on id -> per-run argmax (lexsort by (id, -sim,
    partner), run heads) -> best rows re-keyed on the unordered pair
    -> ONE keyed exchange -> runs of exactly 2 are mutual. Every
    exchange is candidate-bounded (n * window rows)."""
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    pairs = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                           min_sim=min_sim,
                           checkpoint_dir=checkpoint_dir)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        s = batch.column("jw_sim").to_numpy()
        return pa.table(
            {
                "id": pa.array(np.concatenate([a, b]), pa.int64()),
                "partner": pa.array(np.concatenate([b, a]), pa.int64()),
                "jw_sim": pa.array(np.concatenate([s, s]), pa.float64()),
            }
        )

    empty_best = pa.table(
        {
            "id": pa.array([], pa.int64()),
            "partner": pa.array([], pa.int64()),
            "jw_sim": pa.array([], pa.float64()),
        }
    )

    def best_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_best
        i = batch.column("id").to_numpy()
        p = batch.column("partner").to_numpy()
        s = batch.column("jw_sim").to_numpy()
        order = np.lexsort((p, -s, i))
        i_s = i[order]
        head = np.concatenate(([True], i_s[1:] != i_s[:-1]))
        sel = order[head]
        return pa.table(
            {
                "id": pa.array(i[sel], pa.int64()),
                "partner": pa.array(p[sel], pa.int64()),
                "jw_sim": pa.array(s[sel], pa.float64()),
            }
        )

    def pair_key(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        p = batch.column("partner").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(i, p), pa.int64()),
                "id_hi": pa.array(np.maximum(i, p), pa.int64()),
                "jw_sim": batch.column("jw_sim"),
            }
        )

    empty_out = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "jw_sim": pa.array([], pa.float64()),
        }
    )

    def mutual_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        s = batch.column("jw_sim").to_numpy()
        order = np.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        # each id emits exactly ONE best row, so a pair run has size
        # <= 2; size 2 == both directions chose each other
        dup = (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])
        sel = order[np.concatenate((dup, [False]))]
        return pa.table(
            {
                "a_id": pa.array(lo[sel], pa.int64()),
                "b_id": pa.array(hi[sel], pa.int64()),
                "jw_sim": pa.array(s[sel], pa.float64()),
            }
        )

    best = (
        pairs.map_batches(sym, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["id"])
        .map_batches(best_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    return (
        best.map_batches(pair_key, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions,
                     keys=["id_lo", "id_hi"])
        .map_batches(mutual_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def er_confusion_report(sf_dir: str, *, key_len: int = 24,
                        window: int = 4, min_sim: float = 0.88,
                        num_partitions: int | None = None,
                        checkpoint_dir: str | None = None):
    """CLUSTER-LEVEL CONFUSION REPORT of the fuzzy clustering vs the
    exact-Jaccard truth: how many predicted clusters reproduce a truth
    cluster EXACTLY, how many MERGE several truth clusters
    (over-linking), and how many are fragments of a SPLIT truth
    cluster (under-linking) — the split/merge census a linkage
    practitioner reads next to B-cubed to see WHICH failure mode the
    threshold is in. ONE row: (n_pred_clusters, n_truth_clusters,
    n_exact, n_merging_pred, n_split_parts).

    A predicted cluster is 'exact' iff it covers exactly one truth
    cluster (one joint cell) and that truth cluster has no other
    predicted cluster (its cell count is 1 too); 'merging' iff it
    spans > 1 truth clusters; a 'split part' is a single-cell pred
    cluster whose truth cluster is covered by > 1 pred clusters.

    Shape: the joint label table -> ONE pcid exchange (cells + per-
    pred cell counts are run arithmetic; emits one 24-byte row per
    joint CELL, tagged with the pred purity bit) -> ONE tcid exchange
    (per-truth cell counts close the classification); single-row
    partials both times."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    j = _joint_labels(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
    )

    empty_cells = pa.table(
        {
            "tcid": pa.array([], pa.int64()),
            "pure_pred": pa.array([], pa.int64()),
            "n_pred": pa.array([], pa.int64()),
            "n_merging": pa.array([], pa.int64()),
        }
    )

    def cells_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_cells
        p = batch.column("pcid").to_numpy()
        t = batch.column("tcid").to_numpy()
        order = np.lexsort((t, p))
        p_s, t_s = p[order], t[order]
        new_p = np.concatenate(([True], p_s[1:] != p_s[:-1]))
        new_c = new_p | np.concatenate(([False], t_s[1:] != t_s[:-1]))
        p_starts = np.flatnonzero(new_p)
        c_starts = np.flatnonzero(new_c)
        cells_per_pred = np.add.reduceat(
            new_c.astype(np.int64), p_starts
        )
        # one output row per joint cell, tagged with its pred's purity
        pure = np.repeat(cells_per_pred == 1, cells_per_pred)
        return pa.table(
            {
                "tcid": pa.array(t_s[c_starts], pa.int64()),
                "pure_pred": pa.array(
                    pure.astype(np.int64), pa.int64()
                ),
                "n_pred": pa.array(
                    np.concatenate(
                        ([p_starts.shape[0]],
                         np.zeros(c_starts.shape[0] - 1, np.int64))
                    ) if c_starts.shape[0] else
                    np.zeros(0, np.int64),
                    pa.int64(),
                ),
                "n_merging": pa.array(
                    np.concatenate(
                        ([int((cells_per_pred > 1).sum())],
                         np.zeros(c_starts.shape[0] - 1, np.int64))
                    ) if c_starts.shape[0] else
                    np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    empty_out = pa.table(
        {
            "n_truth": pa.array([], pa.int64()),
            "n_exact": pa.array([], pa.int64()),
            "n_split_parts": pa.array([], pa.int64()),
            "n_pred": pa.array([], pa.int64()),
            "n_merging": pa.array([], pa.int64()),
        }
    )

    def truth_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        t = batch.column("tcid").to_numpy()
        pure = batch.column("pure_pred").to_numpy()
        order = np.argsort(t, kind="stable")
        t_s, pure_s = t[order], pure[order]
        new_t = np.concatenate(([True], t_s[1:] != t_s[:-1]))
        t_starts = np.flatnonzero(new_t)
        k_t = np.diff(np.append(t_starts, t_s.shape[0]))
        # exact: sole cell of its truth cluster AND pure pred
        exact = int(pure_s[t_starts[k_t == 1]].sum())
        # split parts: pure-pred cells inside multi-cell truth runs
        split = int(
            (pure_s * np.repeat(k_t > 1, k_t)).sum()
        )
        return pa.table(
            {
                "n_truth": pa.array([int(t_starts.shape[0])],
                                    pa.int64()),
                "n_exact": pa.array([exact], pa.int64()),
                "n_split_parts": pa.array([split], pa.int64()),
                "n_pred": pa.array(
                    [int(batch.column("n_pred").to_numpy().sum())],
                    pa.int64(),
                ),
                "n_merging": pa.array(
                    [int(batch.column("n_merging").to_numpy().sum())],
                    pa.int64(),
                ),
            }
        )

    rows = (
        j.repartition(num_blocks=num_partitions, keys=["pcid"])
        .map_batches(cells_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["tcid"])
        .map_batches(truth_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    return pa.table(
        {
            "n_pred_clusters": pa.array(
                [sum(int(r["n_pred"]) for r in rows)], pa.int64()
            ),
            "n_truth_clusters": pa.array(
                [sum(int(r["n_truth"]) for r in rows)], pa.int64()
            ),
            "n_exact": pa.array(
                [sum(int(r["n_exact"]) for r in rows)], pa.int64()
            ),
            "n_merging_pred": pa.array(
                [sum(int(r["n_merging"]) for r in rows)], pa.int64()
            ),
            "n_split_parts": pa.array(
                [sum(int(r["n_split_parts"]) for r in rows)],
                pa.int64(),
            ),
        }
    )


def er_evaluation_report(sf_dir: str, *, key_len: int = 24,
                         window: int = 4, min_sim: float = 0.88,
                         num_partitions: int | None = None,
                         checkpoint_dir: str | None = None):
    """THE WHOLE EVALUATION PANEL FROM ONE CLUSTERING PASS — B-cubed
    precision/recall/F1, Rand index with its four pair counts, and the
    split/merge confusion census in a single wide row. The sibling
    queries (:func:`er_bcubed_eval`, :func:`er_rand_index`,
    :func:`er_confusion_report`) are each self-contained by the driver
    contract and therefore each rebuild both clusterings; a
    practitioner running the panel should run THIS query instead: the
    fuzzy clustering, the exact-Jaccard truth clustering, and their
    joint label table are computed ONCE, and every metric derives from
    TWO keyed exchanges over it (VERDICT r04 #1).

    Shape: joint (pcid, tcid) label table materialized once (n rows x
    16 bytes, spillable) -> ONE pcid-keyed exchange in which each
    block holds its pred clusters whole, emitting one 24-byte row per
    joint CELL (tcid, cell size, pred-purity bit) plus single-row
    pred-side aggregates (B-cubed precision numerator, C(p,2) and
    C(c,2) pair sums, pred-cluster/merge counts) -> ONE tcid-keyed
    exchange of the cell rows in which truth-cluster sizes are cell-
    size run sums, closing the recall numerator, C(t,2), and the
    exact/split census; single-row partials both times. Every integer
    expression is identical to the sibling it replaces, so all
    sixteen columns hash-match the siblings' oracles by
    construction (incl. the chance-corrected ARI + FM^2 from
    :func:`er_adjusted_rand`'s exact integer arithmetic). ONE row:
    (n_docs, bcubed_precision_ppm, bcubed_recall_ppm, bcubed_f1_ppm,
    pairs_total, pairs_same_both, pairs_same_pred, pairs_same_truth,
    rand_index_ppm, ari_ppm, fm2_ppm, n_pred_clusters,
    n_truth_clusters, n_exact, n_merging_pred, n_split_parts)."""
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    j = _joint_labels(
        sf_dir, key_len=key_len, window=window, min_sim=min_sim,
        num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
    ).materialize()

    empty_cells = pa.table(
        {
            "tcid": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "pure_pred": pa.array([], pa.int64()),
            "sum_ppm_p": pa.array([], pa.int64()),
            "pairs_pred": pa.array([], pa.int64()),
            "pairs_both": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "n_pred": pa.array([], pa.int64()),
            "n_merging": pa.array([], pa.int64()),
        }
    )

    def pred_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_cells
        p = batch.column("pcid").to_numpy()
        t = batch.column("tcid").to_numpy()
        order = np.lexsort((t, p))
        p_s, t_s = p[order], t[order]
        n = p_s.shape[0]
        new_p = np.concatenate(([True], p_s[1:] != p_s[:-1]))
        new_c = new_p | np.concatenate(([False], t_s[1:] != t_s[:-1]))
        p_starts = np.flatnonzero(new_p)
        c_starts = np.flatnonzero(new_c)
        p_sizes = np.diff(np.append(p_starts, n))
        c_sizes = np.diff(np.append(c_starts, n))
        cells_per_pred = np.add.reduceat(new_c.astype(np.int64), p_starts)
        p_per_cell = np.repeat(p_sizes, cells_per_pred)
        pure = np.repeat(cells_per_pred == 1, cells_per_pred)
        k = c_starts.shape[0]
        first = np.zeros(k, np.int64)

        def on_first(v: int) -> np.ndarray:
            out = first.copy()
            out[0] = v
            return out

        return pa.table(
            {
                "tcid": pa.array(t_s[c_starts], pa.int64()),
                "c": pa.array(c_sizes, pa.int64()),
                "pure_pred": pa.array(pure.astype(np.int64), pa.int64()),
                "sum_ppm_p": pa.array(
                    on_first(int(
                        (c_sizes * ((1_000_000 * c_sizes) // p_per_cell))
                        .sum()
                    )),
                    pa.int64(),
                ),
                "pairs_pred": pa.array(
                    on_first(int((p_sizes * (p_sizes - 1) // 2).sum())),
                    pa.int64(),
                ),
                "pairs_both": pa.array(
                    on_first(int((c_sizes * (c_sizes - 1) // 2).sum())),
                    pa.int64(),
                ),
                "n_rows": pa.array(on_first(n), pa.int64()),
                "n_pred": pa.array(
                    on_first(int(p_starts.shape[0])), pa.int64()
                ),
                "n_merging": pa.array(
                    on_first(int((cells_per_pred > 1).sum())), pa.int64()
                ),
            }
        )

    part_cols = [
        "sum_ppm_p", "pairs_pred", "pairs_both", "n_rows", "n_pred",
        "n_merging", "sum_ppm_t", "pairs_truth", "n_truth", "n_exact",
        "n_split",
    ]
    empty_part = pa.table(
        {name: pa.array([], pa.int64()) for name in part_cols}
    )

    def truth_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_part
        t = batch.column("tcid").to_numpy()
        c = batch.column("c").to_numpy()
        pure = batch.column("pure_pred").to_numpy()
        order = np.argsort(t, kind="stable")
        t_s, c_s, pure_s = t[order], c[order], pure[order]
        new_t = np.concatenate(([True], t_s[1:] != t_s[:-1]))
        t_starts = np.flatnonzero(new_t)
        k_t = np.diff(np.append(t_starts, t_s.shape[0]))
        t_sizes = np.add.reduceat(c_s, t_starts)
        t_per_cell = np.repeat(t_sizes, k_t)
        vals = {
            "sum_ppm_t": int(
                (c_s * ((1_000_000 * c_s) // t_per_cell)).sum()
            ),
            "pairs_truth": int((t_sizes * (t_sizes - 1) // 2).sum()),
            "n_truth": int(t_starts.shape[0]),
            "n_exact": int(pure_s[t_starts[k_t == 1]].sum()),
            "n_split": int((pure_s * np.repeat(k_t > 1, k_t)).sum()),
        }
        for name in ("sum_ppm_p", "pairs_pred", "pairs_both", "n_rows",
                     "n_pred", "n_merging"):
            vals[name] = int(batch.column(name).to_numpy().sum())
        return pa.table(
            {name: pa.array([vals[name]], pa.int64())
             for name in part_cols}
        )

    rows = (
        j.repartition(num_blocks=num_partitions, keys=["pcid"])
        .map_batches(pred_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["tcid"])
        .map_batches(truth_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    tot = {name: sum(int(r[name]) for r in rows) for name in part_cols}
    n = tot["n_rows"]
    prec = tot["sum_ppm_p"] // n if n else 0
    rec = tot["sum_ppm_t"] // n if n else 0
    f1 = 2 * prec * rec // (prec + rec) if prec + rec else 0
    total = n * (n - 1) // 2
    n11 = tot["pairs_both"]
    sum_p, sum_t = tot["pairs_pred"], tot["pairs_truth"]
    n00 = total - sum_p - sum_t + n11
    ri = 1_000_000 * (n11 + n00) // total if total else 1_000_000
    # chance-corrected companions (er_adjusted_rand's exact integer
    # arithmetic: trunc-toward-zero signed division, Python-int
    # products — no int64 cliff)
    num2 = 2 * (total * n11 - sum_p * sum_t)
    den2 = total * (sum_p + sum_t) - 2 * sum_p * sum_t
    if den2 == 0:
        ari = 1_000_000
    elif num2 < 0:
        ari = -((1_000_000 * -num2) // den2)
    else:
        ari = (1_000_000 * num2) // den2
    fm2 = (
        1_000_000 * n11 * n11 // (sum_p * sum_t)
        if sum_p * sum_t
        else 1_000_000
    )
    out = {
        "n_docs": n,
        "bcubed_precision_ppm": prec,
        "bcubed_recall_ppm": rec,
        "bcubed_f1_ppm": f1,
        "pairs_total": total,
        "pairs_same_both": n11,
        "pairs_same_pred": sum_p,
        "pairs_same_truth": sum_t,
        "rand_index_ppm": ri,
        "ari_ppm": ari,
        "fm2_ppm": fm2,
        "n_pred_clusters": tot["n_pred"],
        "n_truth_clusters": tot["n_truth"],
        "n_exact": tot["n_exact"],
        "n_merging_pred": tot["n_merging"],
        "n_split_parts": tot["n_split"],
    }
    return pa.table(
        {name: pa.array([v], pa.int64()) for name, v in out.items()}
    )


def match_candidates_topk(sf_dir: str, *, k: int = 3,
                          key_len: int = 24, window: int = 4,
                          min_sim: float = 0.85,
                          num_partitions: int | None = None,
                          checkpoint_dir: str | None = None):
    """PER-DOCUMENT CANDIDATE REVIEW QUEUE: each document's top-``k``
    scored match candidates with an explicit rank (by jw desc, then
    partner id asc) — the table a clerical-review UI pages through,
    and the per-entity view of the pair stream every other operator
    emits. (doc_id, cand_id, jw_sim, rnk), rnk 1-based.

    Shape: the scored pairs symmetrize into 24-byte rows -> ONE keyed
    exchange on doc_id -> per-run rank from one lexsort (run-reset
    cumcount) -> keep rnk <= k. Volume is window-bounded before the
    exchange, k-bounded after."""
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    pairs = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                           min_sim=min_sim,
                           checkpoint_dir=checkpoint_dir)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        s = batch.column("jw_sim").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "cand_id": pa.array(np.concatenate([b, a]), pa.int64()),
                "jw_sim": pa.array(np.concatenate([s, s]), pa.float64()),
            }
        )

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "cand_id": pa.array([], pa.int64()),
            "jw_sim": pa.array([], pa.float64()),
            "rnk": pa.array([], pa.int64()),
        }
    )

    def topk_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        d = batch.column("doc_id").to_numpy()
        p = batch.column("cand_id").to_numpy()
        s = batch.column("jw_sim").to_numpy()
        order = np.lexsort((p, -s, d))
        d_s = d[order]
        new = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        # rank = position since run start, 1-based
        idx = np.arange(d_s.shape[0], dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        rnk = idx - run_start + 1
        sel = rnk <= k
        take = order[sel]
        return pa.table(
            {
                "doc_id": pa.array(d[take], pa.int64()),
                "cand_id": pa.array(p[take], pa.int64()),
                "jw_sim": pa.array(s[take], pa.float64()),
                "rnk": pa.array(rnk[sel], pa.int64()),
            }
        )

    return (
        pairs.map_batches(sym, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(topk_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


SWEEP_THRESHOLDS = (850, 880, 900, 920, 950)


def er_threshold_sweep(sf_dir: str, *, key_len: int = 24,
                       window: int = 4,
                       thresholds: tuple = SWEEP_THRESHOLDS,
                       num_partitions: int | None = None,
                       checkpoint_dir: str | None = None):
    """DECISION-THRESHOLD SWEEP: pair-level precision/recall/F1 of the
    Jaro-Winkler matcher vs the exact-Jaccard truth set at several
    match thresholds, from ONE scoring pass — the table a linkage
    practitioner reads to pick the operating point (score once,
    threshold many; the whole point of emitting scores instead of
    verdicts). One row per threshold: (threshold_x1000, pairs_pred,
    pairs_truth, pairs_both, precision_ppm, recall_ppm, f1_ppm).

    Shape: candidates scored at the LOOSEST threshold ride one tagged
    union with the truth pairs into ONE keyed exchange on the
    unordered pair; each block counts all thresholds from the same
    lexsort (pred rows carry jw, truth presence is run adjacency);
    single-row-per-threshold partials coalesce driver-side."""
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        ngram_jaccard_exact,
    )

    num_partitions = num_partitions or _default_partitions()
    thr = np.asarray(sorted(thresholds), dtype=np.int64)
    pred = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                          min_sim=float(thr[0]) / 1000.0,
                          checkpoint_dir=checkpoint_dir)
    truth = ngram_jaccard_exact(sf_dir)

    def tag_pred(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
                "side": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "jw": batch.column("jw_sim"),
            }
        )

    def tag_truth(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").cast(pa.int64()),
                "id_hi": batch.column("id_hi").cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "jw": pa.array(np.zeros(n, np.float64), pa.float64()),
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
        jw = batch.column("jw").to_numpy()
        order = np.lexsort((sd, hi, lo))
        lo_s, hi_s, sd_s = lo[order], hi[order], sd[order]
        # each side emits a pair at most once: a pred row is truth-
        # matched iff its successor is the same pair on side 1
        succ_same = np.concatenate(
            ((lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])
             & (sd_s[1:] == 1), [False])
        )
        pred_rows = sd_s == 0
        jw_p = jw[order][pred_rows]
        matched = succ_same[pred_rows]
        # all thresholds from the one sorted pass
        ok = jw_p[:, None] >= thr[None, :].astype(np.float64) / 1000.0
        n_pred = ok.sum(axis=0).astype(np.int64)
        n_both = (ok & matched[:, None]).sum(axis=0).astype(np.int64)
        out = pa.table(
            {
                "thr": pa.array(thr, pa.int64()),
                "n_pred": pa.array(n_pred, pa.int64()),
                "n_both": pa.array(n_both, pa.int64()),
            }
        )
        # sentinel row carries the block's truth-pair count
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
    agg = {int(t): [0, 0] for t in thr}
    for r in rows:
        if r["thr"] >= 0:
            agg[int(r["thr"])][0] += int(r["n_pred"])
            agg[int(r["thr"])][1] += int(r["n_both"])
    out = {
        "threshold_x1000": [], "pairs_pred": [], "pairs_truth": [],
        "pairs_both": [], "precision_ppm": [], "recall_ppm": [],
        "f1_ppm": [],
    }
    for t in thr:
        np_, nb = agg[int(t)]
        prec = 1_000_000 * nb // np_ if np_ else 0
        rec = 1_000_000 * nb // n_truth if n_truth else 0
        out["threshold_x1000"].append(int(t))
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


def dedup_rate_report(sf_dir: str, *, key_len: int = 24,
                      window: int = 4, min_sim: float = 0.88,
                      num_partitions: int | None = None,
                      checkpoint_dir: str | None = None):
    """DEDUP-RATE REPORT: what the fuzzy clustering would save —
    document counts, cluster count, and character volume removed by
    keeping one representative (the min-id doc == the cluster label)
    per cluster. ONE row: (n_docs, n_clusters, n_dup_docs,
    total_chars, survivor_chars, saved_chars, dedup_ppm).

    Shape: labels (n x 16-byte) and (doc_id, n_chars) rows meet in ONE
    keyed exchange on doc_id; because cluster_id IS the component's
    min doc_id, 'is survivor' is the pure row predicate
    ``doc_id == cluster_id`` — no second exchange, single-row
    partials."""
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_clusters
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _docs,
    )

    num_partitions = num_partitions or _default_partitions()
    labels = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                               min_sim=min_sim,
                               checkpoint_dir=checkpoint_dir)

    def tag_label(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "v": batch.column("cluster_id").cast(pa.int64()),
                "side": pa.array(
                    np.zeros(len(batch), np.int64), pa.int64()
                ),
            }
        )

    def tag_chars(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "v": batch.column("n_chars").cast(pa.int64()),
                "side": pa.array(
                    np.ones(len(batch), np.int64), pa.int64()
                ),
            }
        )

    empty = pa.table(
        {
            "n_docs": pa.array([], pa.int64()),
            "n_clusters": pa.array([], pa.int64()),
            "total_chars": pa.array([], pa.int64()),
            "survivor_chars": pa.array([], pa.int64()),
        }
    )

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        d = batch.column("doc_id").to_numpy()
        v = batch.column("v").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, d))
        d_s, v_s, s_s = d[order], v[order], s[order]
        a = np.arange(0, d_s.shape[0], 2)
        if not ((d_s[a] == d_s[a + 1]).all() and not s_s[a].any()):
            raise ValueError(
                "dedup-rate merge: duplicated or unmatched doc_id "
                "(each doc must have exactly one row per side)"
            )
        cid = v_s[a]
        chars = v_s[a + 1]
        surv = d_s[a] == cid
        return pa.table(
            {
                "n_docs": pa.array([int(a.shape[0])], pa.int64()),
                "n_clusters": pa.array([int(surv.sum())], pa.int64()),
                "total_chars": pa.array([int(chars.sum())], pa.int64()),
                "survivor_chars": pa.array(
                    [int(chars[surv].sum())], pa.int64()
                ),
            }
        )

    rows = (
        labels.map_batches(tag_label, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(
            _docs(sf_dir, ["doc_id", "n_chars"], hash_shuffle=True)
            .map_batches(tag_chars, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        )
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(fold, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    n = sum(int(r["n_docs"]) for r in rows)
    ncl = sum(int(r["n_clusters"]) for r in rows)
    tc = sum(int(r["total_chars"]) for r in rows)
    sc = sum(int(r["survivor_chars"]) for r in rows)
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_clusters": pa.array([ncl], pa.int64()),
            "n_dup_docs": pa.array([n - ncl], pa.int64()),
            "total_chars": pa.array([tc], pa.int64()),
            "survivor_chars": pa.array([sc], pa.int64()),
            "saved_chars": pa.array([tc - sc], pa.int64()),
            "dedup_ppm": pa.array(
                [1_000_000 * (n - ncl) // n if n else 0], pa.int64()
            ),
        }
    )


def _doc_attrs(sf_dir: str):
    """Narrow per-doc comparison attributes for Fellegi-Sunter:
    (doc_id, lang8, len_band, tok_band). ``lang8`` is a 64-bit
    polynomial hash of the lang string's bytes (equal hash == equal
    string, the line_dedup_docs convention; the oracle compares
    ``lang`` directly); bands are floor-divided ints."""
    from hexhamming_ray.functions.hashing import (
        _window_hashes,
        utf8_view,
    )
    from hexhamming_ray.functions.text import token_count
    from hexhamming_ray.pipelines.text import _docs

    def f(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        buf, lens, starts = utf8_view(lang)
        l8 = np.zeros(lens.shape[0], dtype=np.uint64)
        ne = np.flatnonzero(lens > 0)
        if ne.shape[0]:
            l8[ne] = _window_hashes(buf, starts[ne], starts[ne] + lens[ne])
        l8 = l8.view(np.int64)
        n_chars = batch.column("n_chars").to_numpy()
        n_tok = token_count(batch.column("text")).to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang8": pa.array(l8, pa.int64()),
                "len_band": pa.array(n_chars // 64, pa.int64()),
                "tok_band": pa.array(n_tok // 16, pa.int64()),
            }
        )

    return _docs(
        sf_dir, ["doc_id", "lang", "text", "n_chars"],
        hash_shuffle=True,
    ).map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)


def _fs_decide(jw, al8, bl8, alb, blb, atb, btb):
    score = (
        np.where(jw >= FS_JW_MIN, FS_W["jw"][0], FS_W["jw"][1])
        + np.where(al8 == bl8, FS_W["lang"][0], FS_W["lang"][1])
        + np.where(alb == blb, FS_W["len"][0], FS_W["len"][1])
        + np.where(atb == btb, FS_W["tok"][0], FS_W["tok"][1])
    ).astype(np.int64)
    code = (
        (score >= FS_T_POSSIBLE).astype(np.int64)
        + (score >= FS_T_MATCH).astype(np.int64)
    )
    return score, _DECISIONS.take(pa.array(code, pa.int64()))


class _FsScoreBroadcast:
    """Task-pool UDF: attach both sides' attrs from the broadcast
    sorted lut and emit the weighted decision (lazy one-time ray.get,
    the _BruteScore pattern)."""

    def __init__(self, ref):
        self.ref = ref
        self._lut = None

    def _l(self):
        if self._lut is None:
            import ray

            self._lut = ray.get(self.ref)
        return self._lut

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hexhamming_ray.pipelines.relational import _lut_probe

        ids, l8, lb, tb = self._l()
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        jw = batch.column("jw_sim").to_numpy()
        pa_, ha = _lut_probe(ids, a)
        pb, hb = _lut_probe(ids, b)
        # every pair id came from the same documents read; raise so
        # the check survives `python -O`
        if not (ha.all() and hb.all()):
            raise ValueError("FS scoring: pair id missing from the feature LUT")
        score, decision = _fs_decide(
            jw, l8[pa_], l8[pb], lb[pa_], lb[pb], tb[pa_], tb[pb]
        )
        return pa.table(
            {
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "fs_score": pa.array(score, pa.int64()),
                "decision": decision,
            }
        )


def fs_match_scores(sf_dir: str, *, key_len: int = 24, window: int = 4,
                    num_partitions: int | None = None,
                    force_join: bool = False):
    """FELLEGI-SUNTER style match scoring over the sorted-neighborhood
    candidate pairs: four field comparisons — Jaro-Winkler(blocking
    key) >= 0.92, language agreement, length band (n_chars // 64),
    token-count band (// 16) — each contributing a fixed integer
    agreement/disagreement weight; the summed score classifies each
    pair ``match`` (>= 50) / ``possible`` (>= 10) / ``nonmatch``.
    (a_id, b_id, fs_score, decision) for EVERY candidate pair (the
    decision column is the filter — emitting all pairs keeps the
    clerical-review band visible, the point of the FS model).

    Scale: candidates are window-bounded (n x window); attrs ride a
    broadcast sorted lut under ``FS_ATTR_BROADCAST_CAP`` docs (one
    ray.put of four int64 arrays), or two native hash joins above it
    (``force_join`` pins the paths equal in tests)."""
    import pyarrow.parquet as _pq

    import ray

    from hexhamming_ray.pipelines.strmatch import (
        _JwScorer,
        _sn_scored_pairs,
    )
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    # min_sim=0.0 keeps every candidate: FS scores the whole block
    pairs = _sn_scored_pairs(sf_dir, key_len, window, _JwScorer(0.0))
    attrs = _doc_attrs(sf_dir)

    n_docs = _pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows
    if not force_join and n_docs <= FS_ATTR_BROADCAST_CAP:
        from hexhamming_ray.pipelines.text import _gather_table

        at = _gather_table(
            attrs,
            pa.schema(
                [("doc_id", pa.int64()), ("lang8", pa.int64()),
                 ("len_band", pa.int64()), ("tok_band", pa.int64())]
            ),
        )
        ids = at.column("doc_id").to_numpy()
        order = np.argsort(ids)
        ref = ray.put(
            (
                np.ascontiguousarray(ids[order]),
                np.ascontiguousarray(at.column("lang8").to_numpy()[order]),
                np.ascontiguousarray(
                    at.column("len_band").to_numpy()[order]
                ),
                np.ascontiguousarray(
                    at.column("tok_band").to_numpy()[order]
                ),
            )
        )
        return pairs.map_batches(
            _FsScoreBroadcast(ref), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )

    # above-cap scale path: two native hash joins on the pair ids
    a_attrs = attrs.rename_columns(
        ["a_doc", "a_lang8", "a_len_band", "a_tok_band"]
    )
    b_attrs = attrs.rename_columns(
        ["b_doc", "b_lang8", "b_len_band", "b_tok_band"]
    )
    j = pairs.join(
        a_attrs, join_type="inner", num_partitions=num_partitions,
        on=("a_id",), right_on=("a_doc",),
    ).join(
        b_attrs, join_type="inner", num_partitions=num_partitions,
        on=("b_id",), right_on=("b_doc",),
    )

    empty = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "fs_score": pa.array([], pa.int64()),
            "decision": pa.array([], pa.string()),
        }
    )

    def score_joined(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        jw = batch.column("jw_sim").to_numpy()
        score, decision = _fs_decide(
            jw,
            batch.column("a_lang8").to_numpy(),
            batch.column("b_lang8").to_numpy(),
            batch.column("a_len_band").to_numpy(),
            batch.column("b_len_band").to_numpy(),
            batch.column("a_tok_band").to_numpy(),
            batch.column("b_tok_band").to_numpy(),
        )
        return pa.table(
            {
                "a_id": batch.column("a_id").cast(pa.int64()),
                "b_id": batch.column("b_id").cast(pa.int64()),
                "fs_score": pa.array(score, pa.int64()),
                "decision": decision,
            }
        )

    return j.map_batches(score_joined, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)


def match_graph_triangles(sf_dir: str, *, key_len: int = 24,
                          window: int = 4, min_sim: float = 0.80,
                          num_partitions: int | None = None,
                          checkpoint_dir: str | None = None):
    """TRIANGLE CENSUS of the fuzzy match graph: edge count, wedge
    (length-2 path) count, triangle count, and the global clustering
    coefficient ``3 * triangles / wedges`` in exact integer ppm — the
    transitivity diagnostic that tells an ER practitioner how close
    threshold-matching is to an equivalence relation (ppm near 1e6:
    clusters are cliques and transitive closure is safe; low: the
    threshold is chaining). ONE row: (n_edges, n_wedges, n_triangles,
    clustering_ppm).

    Shape: SN-blocked match edges (degree <= 2 * window by
    construction, so wedge emission is LINEAR in docs) symmetrize into
    (ctr, nb) rows -> ONE keyed exchange on ctr -> per-run wedge
    emission (sorted neighbor runs; each wedge (b, c), b < c, emitted
    from its center) -> tagged union with the edge set -> ONE keyed
    exchange on the unordered pair -> per-run: a wedge row closed by
    an edge row counts matched; every triangle is counted by exactly
    its 3 centers, so ``n_triangles = matched // 3``."""
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw
    from hexhamming_ray.pipelines.text import _default_partitions

    num_partitions = num_partitions or _default_partitions()
    pairs = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                           min_sim=min_sim,
                           checkpoint_dir=checkpoint_dir)

    def norm(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    # consumed twice (wedge pass + membership union): narrow 16-byte
    # rows, bounded by n * window — materialize once, spillable
    edges = pairs.map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()

    def sym(batch: pa.Table) -> pa.Table:
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        return pa.table(
            {
                "ctr": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "nb": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    empty_w = pa.table(
        {
            "w_lo": pa.array([], pa.int64()),
            "w_hi": pa.array([], pa.int64()),
            "side": pa.array([], pa.int64()),
        }
    )

    def wedge_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_w
        c = batch.column("ctr").to_numpy()
        nb = batch.column("nb").to_numpy()
        order = np.lexsort((nb, c))
        c_s, nb_s = c[order], nb[order]
        los, his = [], []
        k = 1
        while k < c_s.shape[0]:
            mask = c_s[k:] == c_s[:-k]
            if not mask.any():
                break
            sel = np.flatnonzero(mask)
            los.append(nb_s[sel])        # nb sorted asc within run
            his.append(nb_s[sel + k])
            k += 1
        if not los:
            return empty_w
        lo = np.concatenate(los)
        hi = np.concatenate(his)
        return pa.table(
            {
                "w_lo": pa.array(lo, pa.int64()),
                "w_hi": pa.array(hi, pa.int64()),
                "side": pa.array(
                    np.ones(lo.shape[0], np.int64), pa.int64()
                ),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "w_lo": batch.column("id_lo"),
                "w_hi": batch.column("id_hi"),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    empty_p = pa.table(
        {
            "n_edges": pa.array([], pa.int64()),
            "n_wedges": pa.array([], pa.int64()),
            "n_matched": pa.array([], pa.int64()),
        }
    )

    def count_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_p
        lo = batch.column("w_lo").to_numpy()
        hi = batch.column("w_hi").to_numpy()
        sd = batch.column("side").to_numpy()
        order = np.lexsort((sd, hi, lo))
        lo_s, hi_s, sd_s = lo[order], hi[order], sd[order]
        new = np.concatenate(
            ([True], (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1]))
        )
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, lo_s.shape[0]))
        # edges are distinct pairs: side-0 present iff the run's first
        # row (side sorts first) is an edge; wedges in run = size - edge
        has_edge = sd_s[starts] == 0
        wedges = sizes - has_edge.astype(np.int64)
        matched = int(wedges[has_edge].sum())
        return pa.table(
            {
                "n_edges": pa.array([int(has_edge.sum())], pa.int64()),
                "n_wedges": pa.array([int(wedges.sum())], pa.int64()),
                "n_matched": pa.array([matched], pa.int64()),
            }
        )

    part = (
        edges.map_batches(sym, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["ctr"])
        .map_batches(wedge_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .union(edges.map_batches(edge_rows, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["w_lo", "w_hi"])
        .map_batches(count_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    rows = part.take_all()
    n_edges = sum(int(r["n_edges"]) for r in rows)
    n_wedges = sum(int(r["n_wedges"]) for r in rows)
    matched = sum(int(r["n_matched"]) for r in rows)
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([matched // 3], pa.int64()),
            "clustering_ppm": pa.array(
                [1_000_000 * matched // n_wedges if n_wedges else 0],
                pa.int64(),
            ),
        }
    )


def er_fs_eval(sf_dir: str, *, key_len: int = 24, window: int = 4):
    """PAIR-LEVEL quality of the Fellegi-Sunter DECISION layer: the
    pairs fs_match_scores classifies ``match`` scored against the
    exact-Jaccard truth set — er_fuzzy_eval for the multi-field
    weighted matcher, so a practitioner can read whether the extra
    fields (lang, length band, token band) buy precision over the
    single-field JW threshold. ONE row: (pairs_pred, pairs_truth,
    pairs_both, precision_ppm, recall_ppm)."""
    from hexhamming_ray.pipelines.strmatch import _pair_eval_counts
    from hexhamming_ray.pipelines.text import ngram_jaccard_exact

    pred = fs_match_scores(sf_dir, key_len=key_len, window=window)

    def only_match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(
            _pc.equal(batch.column("decision"), "match")
        )

    n_pred, n_truth, n_both = _pair_eval_counts(
        pred.map_batches(only_match, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
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


def fs_weight_estimates(sf_dir: str, *, key_len: int = 24,
                        window: int = 4,
                        num_partitions: int | None = None,
                        force_join: bool = False):
    """FELLEGI-SUNTER PARAMETER ESTIMATION from the labeled truth set:
    for each of the four comparison fields (JW(key) >= 0.92, language,
    length band, token band), the agreement probability among
    truth-MATCHED candidate pairs (m) and among truth-UNMATCHED ones
    (u) — the quantities the FS log-weights derive from, estimated by
    direct counting against the exact-Jaccard truth labels (the
    supervised route; EM is what you run when no truth exists). One
    row per field: (field, n_match, n_nonmatch, agree_match,
    agree_nonmatch, m_ppm, u_ppm), floor-div integer ppm.

    Shape: :func:`fs_match_scores` already carries everything needed —
    the four fixed weight pairs (+30/-12, +24/-8, +18/-6, +14/-5) make
    all 16 agreement subsets sum to DISTINCT scores, so the per-pair
    field mask decodes from ``fs_score`` alone and this operator
    reuses the scored stream (both cap-switched attr plans, pinned by
    fs_match_scores' own tests) verbatim. Scored pairs + truth pairs
    ride one tagged union into ONE exchange on the unordered pair key;
    each block labels pred rows by run adjacency (the threshold-sweep
    trick) and folds to a single 10-counter row; the driver holds 4
    rows."""
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        ngram_jaccard_exact,
    )

    num_partitions = num_partitions or _default_partitions()
    scored = fs_match_scores(sf_dir, key_len=key_len, window=window,
                             force_join=force_join)
    truth = ngram_jaccard_exact(sf_dir)

    # the 16 distinct subset sums -> field masks (bit order: jw, lang,
    # len_band, tok_band); base = all-disagree = -12-8-6-5 = -31
    spans = np.array([42, 32, 24, 19], dtype=np.int64)
    masks = np.arange(16, dtype=np.int64)
    sums = np.full(16, -31, dtype=np.int64)
    for bit in range(4):
        sums += np.where(masks & (1 << bit), spans[bit], 0)
    s_order = np.argsort(sums)
    s_sorted, m_sorted = sums[s_order], masks[s_order]

    def tag_pred(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        sc = batch.column("fs_score").to_numpy()
        pos = np.searchsorted(s_sorted, sc)
        if not (s_sorted[pos] == sc).all():
            raise ValueError("fs_score outside the 16 subset sums")
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
                "side": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "fmask": pa.array(m_sorted[pos], pa.int64()),
            }
        )

    def tag_truth(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").cast(pa.int64()),
                "id_hi": batch.column("id_hi").cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "fmask": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    cols = ["nm", "nn", "am0", "am1", "am2", "am3", "an0", "an1",
            "an2", "an3"]
    empty = pa.table({c: pa.array([], pa.int64()) for c in cols})

    def count_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        sd = batch.column("side").to_numpy()
        fm = batch.column("fmask").to_numpy()
        order = np.lexsort((sd, hi, lo))
        lo_s, hi_s, sd_s = lo[order], hi[order], sd[order]
        succ_same = np.concatenate(
            ((lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])
             & (sd_s[1:] == 1), [False])
        )
        pred_rows = sd_s == 0
        fm_p = fm[order][pred_rows]
        matched = succ_same[pred_rows]
        vals = {
            "nm": int(matched.sum()),
            "nn": int((~matched).sum()),
        }
        for bit in range(4):
            agree = (fm_p & (1 << bit)) != 0
            vals[f"am{bit}"] = int((agree & matched).sum())
            vals[f"an{bit}"] = int((agree & ~matched).sum())
        return pa.table(
            {c: pa.array([vals[c]], pa.int64()) for c in cols}
        )

    rows = (
        scored.map_batches(tag_pred, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(truth.map_batches(tag_truth, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=num_partitions,
                     keys=["id_lo", "id_hi"])
        .map_batches(count_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    tot = {c: sum(int(r[c]) for r in rows) for c in cols}
    fields = ["jw", "lang", "len_band", "tok_band"]
    out = {
        "field": [], "n_match": [], "n_nonmatch": [],
        "agree_match": [], "agree_nonmatch": [], "m_ppm": [],
        "u_ppm": [],
    }
    for bit, name in enumerate(fields):
        am, an = tot[f"am{bit}"], tot[f"an{bit}"]
        out["field"].append(name)
        out["n_match"].append(tot["nm"])
        out["n_nonmatch"].append(tot["nn"])
        out["agree_match"].append(am)
        out["agree_nonmatch"].append(an)
        out["m_ppm"].append(
            1_000_000 * am // tot["nm"] if tot["nm"] else 0
        )
        out["u_ppm"].append(
            1_000_000 * an // tot["nn"] if tot["nn"] else 0
        )
    return pa.table(
        {
            "field": pa.array(out["field"], pa.string()),
            **{
                k: pa.array(out[k], pa.int64())
                for k in ("n_match", "n_nonmatch", "agree_match",
                          "agree_nonmatch", "m_ppm", "u_ppm")
            },
        }
    )


def match_graph_modularity(sf_dir: str, *, key_len: int = 24,
                           window: int = 4, cluster_sim: float = 0.88,
                           edge_sim: float = 0.80,
                           num_partitions: int | None = None,
                           force_remap: bool = False):
    """NEWMAN MODULARITY of the fuzzy clustering measured on the
    LOOSER match graph: how well the ``cluster_sim``-threshold
    clusters explain the ``edge_sim``-threshold similarity structure
    (edges in the [edge_sim, cluster_sim) band may CROSS clusters —
    the unexplained structure modularity penalizes, alongside the
    giant-component penalty of the degree term). Exact integer ppm:
    ``Q_ppm = sum_c [ (1e6 * e_c) // m  -  (1e6 * d_c^2) // (4 m^2) ]``
    with every floor division mirrored in the SQL oracle. ONE row:
    (n_edges, n_intra_edges, modularity_ppm). The degree term runs a
    vectorized int64 fast path while every d_c < 3e6 endpoint slots
    (1e6*d_c^2 < 2^63) and switches to exact Python-int arithmetic
    above it, so there is no overflow cliff at any cluster size
    (matching the oracle's HUGEINT).

    Shape: edges label-attach via ONE broadcast label lut under
    ``GRAPH_LABEL_BROADCAST_CAP`` (both endpoints in one map) or two
    sort-based tagged-union remaps above it (``force_remap`` pins the
    paths equal); then e_c and d_c are run counts after ONE cluster-
    keyed exchange each (d_c needs no per-node degree table — it is
    the cluster's ENDPOINT-SLOT count, directly countable from the
    labeled edge stream); a tagged union joins them per cluster for
    the term sum; single-row partials close it."""
    import ray

    from hexhamming_ray.pipelines.strmatch import (
        er_fuzzy_clusters,
        fuzzy_match_jw,
    )
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _gather_table,
    )
    from hexhamming_ray.stages.annsearch import GRAPH_LABEL_BROADCAST_CAP

    num_partitions = num_partitions or _default_partitions()
    labels = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                               min_sim=cluster_sim).materialize()
    pairs = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                           min_sim=edge_sim)

    def norm(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "lo": pa.array(np.minimum(a, b), pa.int64()),
                "hi": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    edges = pairs.map_batches(norm, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    if not force_remap and labels.count() <= GRAPH_LABEL_BROADCAST_CAP:
        lt = _gather_table(
            labels,
            pa.schema([("doc_id", pa.int64()),
                       ("cluster_id", pa.int64())]),
        )
        ids = lt.column("doc_id").to_numpy()
        order = np.argsort(ids)
        ref = ray.put(
            (
                np.ascontiguousarray(ids[order]),
                np.ascontiguousarray(
                    lt.column("cluster_id").to_numpy()[order]
                ),
            )
        )

        class _Lab:
            def __init__(self):
                self._l = None

            def __call__(self, batch: pa.Table) -> pa.Table:
                from hexhamming_ray.pipelines.relational import _lut_probe

                if self._l is None:
                    self._l = ray.get(ref)
                ids_, cid = self._l
                lo = batch.column("lo").to_numpy()
                hi = batch.column("hi").to_numpy()
                plo, hlo = _lut_probe(ids_, lo)
                phi, hhi = _lut_probe(ids_, hi)
                if not (hlo.all() and hhi.all()):
                    raise ValueError(
                        "label attach: edge endpoint missing from the "
                        "label LUT"
                    )
                return pa.table(
                    {
                        "clo": pa.array(cid[plo], pa.int64()),
                        "chi": pa.array(cid[phi], pa.int64()),
                    }
                )

        cedges = edges.map_batches(
            _Lab(), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).materialize()
    else:
        from hexhamming_ray.state.unionfind import _remap_column

        mapping = labels.map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("doc_id").cast(pa.int64()),
                    "dst": b.column("cluster_id").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        r1 = _remap_column(edges, "lo", "hi", mapping)
        r2 = _remap_column(
            r1.map_batches(
                lambda b: pa.table(
                    {"hi": b.column("hi"), "lo": b.column("lo")}
                ),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ),
            "hi", "lo", mapping,
        )
        cedges = r2.map_batches(
            lambda b: pa.table(
                {"clo": b.column("lo"), "chi": b.column("hi")}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).materialize()

    m = cedges.count()
    if m == 0:
        return pa.table(
            {
                "n_edges": pa.array([0], pa.int64()),
                "n_intra_edges": pa.array([0], pa.int64()),
                "modularity_ppm": pa.array([0], pa.int64()),
            }
        )

    empty_ec = pa.table(
        {
            "c": pa.array([], pa.int64()),
            "side": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
        }
    )

    def intra_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_ec
        clo = batch.column("clo").to_numpy()
        chi = batch.column("chi").to_numpy()
        c = clo[clo == chi]
        if c.shape[0] == 0:
            return empty_ec
        u, n = np.unique(c, return_counts=True)
        return pa.table(
            {
                "c": pa.array(u, pa.int64()),
                "side": pa.array(np.zeros(u.shape[0], np.int64),
                                 pa.int64()),
                "v": pa.array(n, pa.int64()),
            }
        )

    def degree_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_ec
        both = np.concatenate(
            [batch.column("clo").to_numpy(),
             batch.column("chi").to_numpy()]
        )
        u, n = np.unique(both, return_counts=True)
        return pa.table(
            {
                "c": pa.array(u, pa.int64()),
                "side": pa.array(np.ones(u.shape[0], np.int64),
                                 pa.int64()),
                "v": pa.array(n, pa.int64()),
            }
        )

    empty_part = pa.table(
        {
            "intra": pa.array([], pa.int64()),
            "q_num": pa.array([], pa.int64()),
        }
    )

    def term_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_part
        c = batch.column("c").to_numpy()
        sd = batch.column("side").to_numpy()
        v = batch.column("v").to_numpy()
        order = np.lexsort((sd, c))
        c_s, sd_s, v_s = c[order], sd[order], v[order]
        new = np.concatenate(([True], c_s[1:] != c_s[:-1]))
        starts = np.flatnonzero(new)
        # per cluster, vectorized: e_c = side-0 partial sum, d_c =
        # side-1 partial sum (masked reduceats over the same runs)
        e_arr = np.add.reduceat(np.where(sd_s == 0, v_s, 0), starts)
        d_arr = np.add.reduceat(np.where(sd_s == 1, v_s, 0), starts)
        intra_total = int(e_arr.sum())
        # 1e6 * d_c^2 wraps int64 once d_c exceeds ~3.04e6 endpoint
        # slots (a giant component at the looser edge_sim crosses that
        # easily at corpus scale): vectorized int64 fast path below the
        # cliff, exact Python-int fallback above it — no overflow at
        # any d_c, matching the oracle's HUGEINT arithmetic.
        dmax = int(d_arr.max()) if len(d_arr) else 0
        if dmax < 3_000_000:
            deg_term = int(((1_000_000 * d_arr * d_arr) // (4 * m * m)).sum())
        else:
            mm4 = 4 * m * m
            deg_term = sum(
                (1_000_000 * d * d) // mm4 for d in map(int, d_arr)
            )
        q = int(((1_000_000 * e_arr) // m).sum()) - deg_term
        return pa.table(
            {
                "intra": pa.array([intra_total], pa.int64()),
                "q_num": pa.array([q], pa.int64()),
            }
        )

    rows = (
        cedges.map_batches(intra_counts, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(cedges.map_batches(degree_counts,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=None))
        .repartition(num_blocks=num_partitions, keys=["c"])
        .map_batches(term_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    return pa.table(
        {
            "n_edges": pa.array([m], pa.int64()),
            "n_intra_edges": pa.array(
                [sum(int(r["intra"]) for r in rows)], pa.int64()
            ),
            "modularity_ppm": pa.array(
                [sum(int(r["q_num"]) for r in rows)], pa.int64()
            ),
        }
    )


def er_error_samples(sf_dir: str, *, key_len: int = 24,
                     window: int = 4, min_sim: float = 0.88,
                     k: int = 10, num_partitions: int | None = None,
                     checkpoint_dir: str | None = None):
    """ERROR-ANALYSIS SAMPLES: the ``k`` smallest false-positive pairs
    (matched but not in the truth set) and ``k`` smallest false-
    negative pairs (true near-dups the matcher missed), by (id_lo,
    id_hi) — the deterministic debug set a practitioner opens after
    reading the precision/recall row. (kind, id_lo, id_hi), kind in
    {'fp', 'fn'}.

    Shape: both pair sets meet in the shared tagged-union pair
    exchange; each block classifies from one lexsort (a pair present
    on both sides is a TP and drops) and emits only its k smallest
    per kind — the driver merges <= 2 k x blocks rows."""
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        ngram_jaccard_exact,
    )

    num_partitions = num_partitions or _default_partitions()
    pred = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                          min_sim=min_sim,
                          checkpoint_dir=checkpoint_dir)
    truth = ngram_jaccard_exact(sf_dir)

    def tag_pred(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
                "side": pa.array(np.zeros(len(a), np.int64), pa.int64()),
            }
        )

    def tag_truth(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "id_lo": batch.column("id_lo").cast(pa.int64()),
                "id_hi": batch.column("id_hi").cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    empty = pa.table(
        {
            "kind": pa.array([], pa.string()),
            "id_lo": pa.array([], pa.int64()),
            "id_hi": pa.array([], pa.int64()),
        }
    )

    def classify_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        lo = batch.column("id_lo").to_numpy()
        hi = batch.column("id_hi").to_numpy()
        sd = batch.column("side").to_numpy()
        order = np.lexsort((sd, hi, lo))
        lo_s, hi_s, sd_s = lo[order], hi[order], sd[order]
        same_next = np.concatenate(
            ((lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1]),
             [False])
        )
        same_prev = np.concatenate(([False], same_next[:-1]))
        solo = ~(same_next | same_prev)
        out_k, out_lo, out_hi = [], [], []
        for kind, side in (("fp", 0), ("fn", 1)):
            sel = np.flatnonzero(solo & (sd_s == side))[:k]
            out_k.extend([kind] * sel.shape[0])
            out_lo.append(lo_s[sel])
            out_hi.append(hi_s[sel])
        if not out_k:
            return empty
        return pa.table(
            {
                "kind": pa.array(out_k, pa.string()),
                "id_lo": pa.array(np.concatenate(out_lo), pa.int64()),
                "id_hi": pa.array(np.concatenate(out_hi), pa.int64()),
            }
        )

    rows = (
        pred.map_batches(tag_pred, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(truth.map_batches(tag_truth, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .repartition(num_blocks=num_partitions,
                     keys=["id_lo", "id_hi"])
        .map_batches(classify_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    out = {"kind": [], "id_lo": [], "id_hi": []}
    for kind in ("fp", "fn"):
        cand = sorted(
            (int(r["id_lo"]), int(r["id_hi"]))
            for r in rows
            if r["kind"] == kind
        )[:k]
        out["kind"].extend([kind] * len(cand))
        out["id_lo"].extend(c[0] for c in cand)
        out["id_hi"].extend(c[1] for c in cand)
    return pa.table(
        {
            "kind": pa.array(out["kind"], pa.string()),
            "id_lo": pa.array(out["id_lo"], pa.int64()),
            "id_hi": pa.array(out["id_hi"], pa.int64()),
        }
    )


def er_cluster_profiles(sf_dir: str, *, key_len: int = 24,
                        window: int = 4, min_sim: float = 0.88,
                        num_partitions: int | None = None,
                        checkpoint_dir: str | None = None):
    """PER-ENTITY PROFILE TABLE: one row per multi-document fuzzy
    cluster with the aggregates a reviewer (or the golden-record
    stage) reads first — member count, total character volume, and how
    many distinct source feeds the entity spans. (cluster_id, n_docs,
    total_chars, n_sources), clusters with >= 2 docs only (singletons
    are the corpus).

    Shape: labels + (n_chars, source-hash) doc attrs meet in ONE
    doc_id exchange (24-byte two-value rows, stride-2 merge); ONE
    cluster-keyed exchange computes every profile column by run
    arithmetic from a single lexsort (distinct sources = new-value
    count within the run, sorted by (cid, src_h)); output is bounded
    by the multi-doc cluster count. Source strings never leave the
    first map (64-bit hash convention: equal hash == equal string)."""
    from hexhamming_ray.functions.hashing import (
        _window_hashes,
        utf8_view,
    )
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_clusters
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _docs,
    )

    num_partitions = num_partitions or _default_partitions()
    labels = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                               min_sim=min_sim,
                               checkpoint_dir=checkpoint_dir)

    def tag_label(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "v1": batch.column("cluster_id").cast(pa.int64()),
                "v2": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def tag_attrs(batch: pa.Table) -> pa.Table:
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
                "v1": batch.column("n_chars").cast(pa.int64()),
                "v2": pa.array(h.view(np.int64), pa.int64()),
                "side": pa.array(
                    np.ones(len(batch), np.int64), pa.int64()
                ),
            }
        )

    empty_m = pa.table(
        {
            "cid": pa.array([], pa.int64()),
            "chars": pa.array([], pa.int64()),
            "src_h": pa.array([], pa.int64()),
        }
    )

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_m
        d = batch.column("doc_id").to_numpy()
        v1 = batch.column("v1").to_numpy()
        v2 = batch.column("v2").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, d))
        d_s, v1_s, v2_s, s_s = d[order], v1[order], v2[order], s[order]
        a = np.arange(0, d_s.shape[0], 2)
        if not ((d_s[a] == d_s[a + 1]).all() and not s_s[a].any()):
            raise ValueError(
                "profile merge: duplicated or unmatched doc_id "
                "(each doc must have exactly one row per side)"
            )
        return pa.table(
            {
                "cid": pa.array(v1_s[a], pa.int64()),
                "chars": pa.array(v1_s[a + 1], pa.int64()),
                "src_h": pa.array(v2_s[a + 1], pa.int64()),
            }
        )

    empty_out = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "total_chars": pa.array([], pa.int64()),
            "n_sources": pa.array([], pa.int64()),
        }
    )

    def profile_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        c = batch.column("cid").to_numpy()
        ch = batch.column("chars").to_numpy()
        sh = batch.column("src_h").to_numpy()
        order = np.lexsort((sh, c))
        c_s, ch_s, sh_s = c[order], ch[order], sh[order]
        new_c = np.concatenate(([True], c_s[1:] != c_s[:-1]))
        starts = np.flatnonzero(new_c)
        sizes = np.diff(np.append(starts, c_s.shape[0]))
        new_src = new_c | np.concatenate(
            ([False], sh_s[1:] != sh_s[:-1])
        )
        n_src = np.add.reduceat(new_src.astype(np.int64), starts)
        tot = np.add.reduceat(ch_s, starts)
        keep = sizes >= 2
        return pa.table(
            {
                "cluster_id": pa.array(c_s[starts][keep], pa.int64()),
                "n_docs": pa.array(sizes[keep], pa.int64()),
                "total_chars": pa.array(tot[keep], pa.int64()),
                "n_sources": pa.array(n_src[keep], pa.int64()),
            }
        )

    return (
        labels.map_batches(tag_label, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(
            _docs(sf_dir, ["doc_id", "n_chars", "source"],
                  hash_shuffle=True)
            .map_batches(tag_attrs, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        )
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(merge, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["cid"])
        .map_batches(profile_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def dup_rate_by_source(sf_dir: str, *, key_len: int = 24,
                       window: int = 4, min_sim: float = 0.88,
                       num_partitions: int | None = None,
                       checkpoint_dir: str | None = None):
    """PER-SOURCE DUPLICATION RATES: for each source feed, how many of
    its documents sit in a multi-document fuzzy cluster, and how many
    of those clusters span ANOTHER source — the per-feed follow-up to
    :func:`dedup_rate_report` and the row-level view behind
    ``source_overlap_matrix`` (which feeds bring duplicates, and are
    they internal re-posts or cross-feed copies). One row per source:
    (source, n_docs, n_dup_docs, n_cross_dup_docs, dup_permille).

    Shape: labels + (doc_id, source-hash, source) rows meet in ONE
    doc_id exchange; ONE cluster exchange computes per-cluster size
    and distinct-source count by run arithmetic and emits per-doc
    verdict rows; per-source counts partial-combine per block and
    coalesce (|sources|-bounded). Source strings ride as 64-bit
    hashes between exchanges; the string re-attaches from a
    |sources|-bounded driver lut (equal hash == equal string, the
    line_dedup convention)."""
    from hexhamming_ray.functions.hashing import (
        _window_hashes,
        utf8_view,
    )
    from hexhamming_ray.pipelines.strmatch import er_fuzzy_clusters
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _docs,
        _gather_table,
    )

    num_partitions = num_partitions or _default_partitions()
    labels = er_fuzzy_clusters(sf_dir, key_len=key_len, window=window,
                               min_sim=min_sim,
                               checkpoint_dir=checkpoint_dir)

    def tag_label(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "v": batch.column("cluster_id").cast(pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def tag_source(batch: pa.Table) -> pa.Table:
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
                "v": pa.array(h.view(np.int64), pa.int64()),
                "side": pa.array(
                    np.ones(len(batch), np.int64), pa.int64()
                ),
            }
        )

    empty_m = pa.table(
        {
            "cid": pa.array([], pa.int64()),
            "src_h": pa.array([], pa.int64()),
        }
    )

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_m
        d = batch.column("doc_id").to_numpy()
        v = batch.column("v").to_numpy()
        s = batch.column("side").to_numpy()
        order = np.lexsort((s, d))
        d_s, v_s, s_s = d[order], v[order], s[order]
        a = np.arange(0, d_s.shape[0], 2)
        if not ((d_s[a] == d_s[a + 1]).all() and not s_s[a].any()):
            raise ValueError(
                "per-source merge: duplicated or unmatched doc_id "
                "(each doc must have exactly one row per side)"
            )
        return pa.table(
            {
                "cid": pa.array(v_s[a], pa.int64()),
                "src_h": pa.array(v_s[a + 1], pa.int64()),
            }
        )

    empty_v = pa.table(
        {
            "src_h": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_dup": pa.array([], pa.int64()),
            "n_cross": pa.array([], pa.int64()),
        }
    )

    def verdicts(batch: pa.Table) -> pa.Table:
        """One cluster-partitioned block: per cluster, size and
        distinct-source count from runs; emit per-source partial
        counts directly (no per-doc rows leave the block)."""
        if len(batch) == 0:
            return empty_v
        c = batch.column("cid").to_numpy()
        sh = batch.column("src_h").to_numpy()
        order = np.lexsort((sh, c))
        c_s, sh_s = c[order], sh[order]
        new_c = np.concatenate(([True], c_s[1:] != c_s[:-1]))
        c_starts = np.flatnonzero(new_c)
        sizes = np.diff(np.append(c_starts, c_s.shape[0]))
        new_src = new_c | np.concatenate(
            ([False], sh_s[1:] != sh_s[:-1])
        )
        nsrc = np.add.reduceat(new_src.astype(np.int64), c_starts)
        dup_doc = np.repeat(sizes > 1, sizes)
        cross_doc = np.repeat(nsrc > 1, sizes)
        # per-source partials via unique + bincounts
        u, inv = np.unique(sh_s, return_inverse=True)
        n_docs = np.bincount(inv)
        n_dup = np.bincount(inv, weights=dup_doc).astype(np.int64)
        n_cross = np.bincount(inv, weights=cross_doc).astype(np.int64)
        return pa.table(
            {
                "src_h": pa.array(u, pa.int64()),
                "n_docs": pa.array(
                    n_docs.astype(np.int64), pa.int64()
                ),
                "n_dup": pa.array(n_dup, pa.int64()),
                "n_cross": pa.array(n_cross, pa.int64()),
            }
        )

    rows = (
        labels.map_batches(tag_label, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(
            _docs(sf_dir, ["doc_id", "source"], hash_shuffle=True)
            .map_batches(tag_source, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        )
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(merge, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["cid"])
        .map_batches(verdicts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    # |sources|-bounded finalize: sum partials per source hash, then
    # re-attach the string from a distinct-source driver lut
    agg: dict[int, list[int]] = {}
    for r in rows:
        a = agg.setdefault(int(r["src_h"]), [0, 0, 0])
        a[0] += int(r["n_docs"])
        a[1] += int(r["n_dup"])
        a[2] += int(r["n_cross"])
    st = _gather_table(
        _docs(sf_dir, ["source"]).map_batches(
            lambda b: b.group_by(["source"]).aggregate([]),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        pa.schema([("source", pa.string())]),
    )
    names = sorted(set(st.column("source").to_pylist()))

    def h64(x: str) -> int:
        b = np.frombuffer(x.encode(), dtype=np.uint8)
        if b.shape[0] == 0:
            return 0
        return int(
            _window_hashes(
                b, np.array([0], np.int64),
                np.array([b.shape[0]], np.int64),
            )[0].view(np.int64)
        )

    out = {"source": [], "n_docs": [], "n_dup_docs": [],
           "n_cross_dup_docs": [], "dup_permille": []}
    for name in names:
        nd, dup, cross = agg.get(h64(name), [0, 0, 0])
        out["source"].append(name)
        out["n_docs"].append(nd)
        out["n_dup_docs"].append(dup)
        out["n_cross_dup_docs"].append(cross)
        out["dup_permille"].append(
            1000 * dup // nd if nd else 0
        )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "n_dup_docs": pa.array(out["n_dup_docs"], pa.int64()),
            "n_cross_dup_docs": pa.array(
                out["n_cross_dup_docs"], pa.int64()
            ),
            "dup_permille": pa.array(out["dup_permille"], pa.int64()),
        }
    )


def _ids_minus(base, losers, num_partitions: int,
               broadcast_cap: int, force_join: bool = False):
    """Survivor-set subtraction: ``base`` (doc_id) minus ``losers``
    (doc_id). Size-switched: under ``broadcast_cap`` loser rows the
    set broadcasts once and a per-batch mask filters; above it (or
    ``force_join``) a native left_anti join with the note-63 sentinel
    carries any scale."""
    import ray

    from hexhamming_ray.pipelines.text import _gather_table

    losers = losers.materialize()
    if not force_join and losers.count() <= broadcast_cap:
        lt = _gather_table(
            losers, pa.schema([("doc_id", pa.int64())])
        )
        ref = ray.put(np.sort(lt.column("doc_id").to_numpy()))

        class _Drop:
            def __init__(self):
                self._ids = None

            def __call__(self, batch: pa.Table) -> pa.Table:
                from hexhamming_ray.pipelines.relational import (
                    _lut_probe,
                )

                if self._ids is None:
                    self._ids = ray.get(ref)
                d = batch.column("doc_id").to_numpy()
                _, hit = _lut_probe(self._ids, d)
                return batch.filter(pa.array(~hit))

        return base.map_batches(_Drop(), batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
    seed = ray.data.from_arrow(
        pa.table({"loser": pa.array([-1], pa.int64())})
    )
    rl = seed.union(losers.map_batches(
        lambda b: pa.table({"loser": b.column("doc_id")}),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    ))
    return base.join(
        rl, join_type="left_anti", num_partitions=num_partitions,
        on=("doc_id",), right_on=("loser",),
    )


def _pairs_within(pairs, surv, cols, num_partitions: int,
                  broadcast_cap: int, force_join: bool = False):
    """Restrict a pair Dataset to pairs whose BOTH endpoint columns
    are in the survivor id set — broadcast membership mask under the
    cap, two seeded left_semi joins above it."""
    import ray

    from hexhamming_ray.pipelines.text import _gather_table

    surv = surv.materialize()
    ca, cb = cols
    if not force_join and surv.count() <= broadcast_cap:
        st = _gather_table(surv, pa.schema([("doc_id", pa.int64())]))
        ref = ray.put(np.sort(st.column("doc_id").to_numpy()))

        class _Keep:
            def __init__(self):
                self._ids = None

            def __call__(self, batch: pa.Table) -> pa.Table:
                from hexhamming_ray.pipelines.relational import (
                    _lut_probe,
                )

                if self._ids is None:
                    self._ids = ray.get(ref)
                a = batch.column(ca).to_numpy()
                b = batch.column(cb).to_numpy()
                _, ha = _lut_probe(self._ids, a)
                _, hb = _lut_probe(self._ids, b)
                return batch.filter(pa.array(ha & hb))

        return pairs.map_batches(_Keep(), batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
    seed = ray.data.from_arrow(
        pa.table({"sid": pa.array([-1], pa.int64())})
    )
    rs = seed.union(surv.map_batches(
        lambda b: pa.table({"sid": b.column("doc_id")}),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )).materialize()
    j = pairs.join(
        rs, join_type="left_semi", num_partitions=num_partitions,
        on=(ca,), right_on=("sid",),
    )
    return j.join(
        rs, join_type="left_semi", num_partitions=num_partitions,
        on=(cb,), right_on=("sid",),
    )


def dedup_cascade_report(sf_dir: str, *, key_len: int = 24,
                         window: int = 4, min_sim: float = 0.88,
                         num_partitions: int | None = None,
                         force_join: bool = False):
    """STAGED-DEDUP CASCADE: the canonical curation pass run as one
    report — (1) EXACT dedup (one survivor per identical text), then
    (2) NEAR dedup (exact Jaccard >= 0.5 components among the exact
    survivors), then (3) FUZZY dedup (Jaro-Winkler >= ``min_sim``
    components among the near survivors) — with per-stage document
    counts, the table that answers 'what does each stage actually
    buy?'. One row per stage: (stage, docs_in, docs_out, removed).

    Pair semantics: stage-2/3 pair sets are the FULL-corpus operators
    restricted to the surviving endpoints (the SQL oracle states the
    same restriction), so each stage reuses the already-oracled pair
    machinery unchanged. Each stage keeps the component's min doc_id.

    Shape: stage 1 is one text-hash exchange (equal hash == equal
    text, the line_dedup convention) emitting run-min survivors;
    stages 2/3 filter their pair streams through the size-switched
    survivor membership (broadcast mask under
    ``GRAPH_LABEL_BROADCAST_CAP`` / seeded left_semi joins above —
    ``force_join`` pins the paths), run the shared distributed
    union-find on the surviving edges only, and subtract the
    non-min-label nodes (again size-switched). Counts come from
    Dataset.count() on materialized NARROW id sets."""
    from hexhamming_ray.functions.hashing import (
        _window_hashes,
        utf8_view,
    )
    from hexhamming_ray.pipelines.strmatch import fuzzy_match_jw
    from hexhamming_ray.pipelines.text import (
        _default_partitions,
        _docs,
        ngram_jaccard_exact,
    )
    from hexhamming_ray.stages.annsearch import GRAPH_LABEL_BROADCAST_CAP
    from hexhamming_ray.state.unionfind import connected_components

    num_partitions = num_partitions or _default_partitions()

    def th_rows(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        buf, lens, starts = utf8_view(text)
        h = np.zeros(lens.shape[0], dtype=np.uint64)
        ne = np.flatnonzero(lens > 0)
        if ne.shape[0]:
            h[ne] = _window_hashes(buf, starts[ne], starts[ne] + lens[ne])
        return pa.table(
            {
                "th": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
            }
        )

    empty_s = pa.table({"doc_id": pa.array([], pa.int64())})

    def run_min(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_s
        th = batch.column("th").to_numpy()
        d = batch.column("doc_id").to_numpy()
        order = np.lexsort((d, th))
        th_s, d_s = th[order], d[order]
        head = np.concatenate(([True], th_s[1:] != th_s[:-1]))
        return pa.table(
            {"doc_id": pa.array(d_s[head], pa.int64())}
        )

    docs = _docs(sf_dir, ["doc_id", "text"], hash_shuffle=True)
    n_in = docs.count()
    s1 = (
        docs.map_batches(th_rows, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .repartition(num_blocks=num_partitions, keys=["th"])
        .map_batches(run_min, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .materialize()
    )
    o1 = s1.count()

    def losers_of(edges):
        labels = connected_components(edges)
        return labels.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("node").cast(pa.int64())}
            ).filter(
                pa.compute.not_equal(
                    b.column("node").cast(pa.int64()),
                    b.column("cluster_id").cast(pa.int64()),
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )

    # stage 2: exact-Jaccard components among exact survivors
    e2 = _pairs_within(
        ngram_jaccard_exact(sf_dir).select_columns(["id_lo", "id_hi"]),
        s1, ("id_lo", "id_hi"), num_partitions,
        GRAPH_LABEL_BROADCAST_CAP, force_join,
    )
    s2 = _ids_minus(s1, losers_of(e2), num_partitions,
                    GRAPH_LABEL_BROADCAST_CAP, force_join).materialize()
    o2 = s2.count()

    # stage 3: JW components among near survivors
    p3 = fuzzy_match_jw(sf_dir, key_len=key_len, window=window,
                        min_sim=min_sim)

    def norm3(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {
                "id_lo": pa.array(np.minimum(a, b), pa.int64()),
                "id_hi": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    e3 = _pairs_within(
        p3.map_batches(norm3, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        s2, ("id_lo", "id_hi"), num_partitions,
        GRAPH_LABEL_BROADCAST_CAP, force_join,
    )
    s3 = _ids_minus(s2, losers_of(e3), num_partitions,
                    GRAPH_LABEL_BROADCAST_CAP, force_join).materialize()
    o3 = s3.count()

    stages = [("exact", n_in, o1), ("near", o1, o2),
              ("fuzzy", o2, o3)]
    return pa.table(
        {
            "stage": pa.array([s for s, _, _ in stages], pa.string()),
            "docs_in": pa.array(
                [i for _, i, _ in stages], pa.int64()
            ),
            "docs_out": pa.array(
                [o for _, _, o in stages], pa.int64()
            ),
            "removed": pa.array(
                [i - o for _, i, o in stages], pa.int64()
            ),
        }
    )
