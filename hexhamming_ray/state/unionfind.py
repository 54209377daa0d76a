"""Distributed connected components (union-find) on Ray Data.

Algorithm: iterative **local-union-find + alternating-key sort**
(the combiner-first discipline of SURVEY.md §4.2 applied to graph
contraction; cf. Rastogi et al., ICDE 2013 and BTS, ICDE 2024 in
PAPERS.md for the round-complexity framing):

1. Symmetrize the edge list, ``sort`` on the key column, and run a
   plain array-based union-find inside every block, emitting each local
   component as a STAR — ``(component_min, member)`` rows. After
   symmetrization every incidence of a node carries the node in the
   sort key, so a node's whole neighborhood is contiguous and merges in
   one local pass; a path or clique that fits in one block collapses
   immediately, so per-round progress is governed by how many blocks a
   component spans, not its diameter.
2. A ``groupby(a, b)`` dedup canonicalizes the round's output (each
   edge is folded into both endpoints' sorted neighborhoods, which
   emits every star row twice). Sort shuffles are stateless tasks —
   Ray 2.49's hash-join operator pins a persistent aggregator-actor
   pool per join and an iterative algorithm issuing joins every round
   accumulates pools until the node thrashes (observed here), so no
   joins appear anywhere in the loop.
3. Stop when the edge multiset hash (sum of per-edge mix64 — an
   order-independent multiset fingerprint) is stable AND the explicit
   star-forest invariant holds (every member has exactly one root and
   no root is a member) — hash stability alone cannot distinguish
   "converged" from "stuck at a persistent block-boundary split".
   Raises if ``max_rounds`` is hit — loud, never silently wrong.
   (Round design validated by simulation: 3-5 rounds on 200-node
   paths / random graphs / cliques at 7 blocks.)

Everything is ``map_batches`` over whole blocks (no per-group Python)
+ ``sort`` + one final ``groupby().min()``; per-round datasets are
materialized (they shrink monotonically, and materialization bounds
recomputation under retries). Only scalar hashes reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_AB = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_K1 = np.uint64(0xBF58476D1CE4E5B9)
_K2 = np.uint64(0x94D049BB133111EB)


def _id_boundaries(num_parts: int) -> list[int]:
    """Evenly spaced ``Dataset.sort`` boundaries over the 63-bit
    node-id domain. Node ids are sha256-derived (functions/hashing.py
    stable_id: first 8 bytes masked positive), i.e. uniform over
    [0, 2^63), so fixed boundaries balance partitions without a sample
    pass — and, critically, they BOUND the sort's output-partition
    count. Ray's default range sort uses one output partition per
    input block (exchange objects = blocks^2), which measured as a
    driver-bound stall at a few thousand blocks; with P fixed the
    exchange stays linear in data. P ~ 2 x CPUs."""
    top = 1 << 63
    step = top // max(1, num_parts)
    return [i * step for i in range(1, num_parts)]


def _sort_parts() -> int:
    from hexhamming_ray import pool_size

    return pool_size(2.0, lo=8, hi=256)


def _cc_labels_vectorized(ia: np.ndarray, ib: np.ndarray, n: int) -> np.ndarray:
    """Connected-component minimum label per node for an edge list over
    node indices 0..n-1, fully vectorized: min-label propagation with
    pointer jumping (``np.minimum.at`` scatter + p = p[p] doubling).
    O((E+V) * log V) array ops — no Python per-edge loop (a dict/loop
    union-find measured ~40 s on a 2.8 M-edge block here; this runs in
    ~2 s)."""
    p = np.arange(n, dtype=np.int64)
    while True:
        t = np.minimum(p[ia], p[ib])
        before = p.copy()
        np.minimum.at(p, ia, t)
        np.minimum.at(p, ib, t)
        # pointer jumping (two doublings per round)
        p = p[p]
        p = p[p]
        if np.array_equal(p, before):
            break
    return p


def _local_star(batch: pa.Table) -> pa.Table:
    """Union-find over one block's edges -> star edges
    (component_min, member), member != min. Dedups everything local."""
    a = batch.column("a").to_numpy()
    b = batch.column("b").to_numpy()
    if a.shape[0] == 0:
        return _AB.empty_table()
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = nodes.shape[0]
    ia = inv[: a.shape[0]]
    ib = inv[a.shape[0] :]
    p = _cc_labels_vectorized(ia, ib, n)
    # p[i] is the minimum node INDEX of i's component; nodes[] is sorted
    # so index order == id order
    comp_min = nodes[p]
    member_mask = comp_min != nodes
    return pa.table(
        {
            "a": pa.array(comp_min[member_mask]),
            "b": pa.array(nodes[member_mask]),
        },
        schema=_AB,
    )


_LABELS = pa.schema([("node", pa.int64()), ("cluster_id", pa.int64())])


def _local_labels(batch: pa.Table) -> pa.Table:
    """One-block union-find -> final labels (node, cluster_id) for every
    node in the block, roots included. Used by the single-block tail."""
    star = _local_star(batch)
    a = star.column("a").combine_chunks()
    b = star.column("b").combine_chunks()
    roots = pc.unique(a)
    return pa.table(
        {
            "node": pa.concat_arrays([b, roots]),
            "cluster_id": pa.concat_arrays([a, roots]),
        },
        schema=_LABELS,
    )


def _multiset_hash(edges_ds) -> tuple[int, int]:
    """(count, order-independent multiset hash) of the edge set."""

    def h(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.uint64)
        b = batch.column("b").to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            z = a * _K1 ^ b * _K2
            z ^= z >> np.uint64(29)
            z *= _K1
            z ^= z >> np.uint64(32)
            s = int(z.sum(dtype=np.uint64))
        return pa.table(
            {"h": pa.array([s], pa.uint64()), "n": pa.array([len(batch)], pa.int64())}
        )

    tot_h = 0
    tot_n = 0
    for t in edges_ds.map_batches(
        h, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).iter_batches(batch_format="pyarrow"):
        for row in t.to_pylist():
            tot_h = (tot_h + row["h"]) % (1 << 64)
            tot_n += row["n"]
    return tot_n, tot_h


def _is_star_forest(edges_ds) -> bool:
    """True iff the edge set is a disjoint union of stars rooted at
    their minima: every member (b-side) appears exactly once and never
    as a root (a-side). Sufficient for correctness of the final labels
    (local passes always root components at the minimum id)."""
    from ray.data.aggregate import Count, Sum

    def tag(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        n = len(batch)
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "is_member": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int64), np.ones(n, dtype=np.int64)]
                    )
                ),
            }
        )

    per_node = (
        edges_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("node")
        .aggregate(Sum("is_member"), Count())
    )

    def violations(batch: pa.Table) -> pa.Table:
        m = batch.column("sum(is_member)").to_numpy()
        c = batch.column("count()").to_numpy()
        bad = (m >= 1) & ((m > 1) | (c > m))
        return pa.table({"bad": pa.array([int(bad.sum())], pa.int64())})

    total = 0
    for t in per_node.map_batches(
        violations, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).iter_batches(batch_format="pyarrow"):
        total += sum(r["bad"] for r in t.to_pylist())
    return total == 0


def connected_components(edges_ds, *, max_rounds: int = 60,
                         single_block_edges: int = 24_000_000, **_ignored):
    """edges (id_lo, id_hi) -> labels Dataset (node, cluster_id) where
    cluster_id is the minimum node id of the component. Only nodes that
    appear in at least one edge are emitted (the caller adds
    singletons — it knows the full node universe)."""

    def to_ab(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("id_lo").cast(pa.int64()),
                "b": batch.column("id_hi").cast(pa.int64()),
            },
            schema=_AB,
        )

    edges = edges_ds.map_batches(
        to_ab, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).materialize()

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.table(
            {"a": pa.concat_arrays([a, b]), "b": pa.concat_arrays([b, a])},
            schema=_AB,
        )

    prev = None
    converged = False
    # Small-tail shortcut: once the (monotonically shrinking) edge set
    # fits comfortably in one block, a single repartition(1) + local UF
    # task produces the exact star forest in one pass — the tree-reduce
    # tail of the distributed loop. At 10^12-file scale the loop below
    # does the work; the tail fires while remaining edges fit one
    # worker task (24M edges ~= 384 MB, seconds of numpy UF — far
    # cheaper than the 3-5 extra sort+dedup rounds the loop would run).
    SINGLE_BLOCK_EDGES = single_block_edges
    # Each round: symmetrize -> sort on the key column -> local UF per
    # block. Symmetrizing first is what makes the sort effective: every
    # incidence of a node carries that node in the SORT KEY column, so
    # all edges touching it become contiguous and merge in one local
    # pass (sorting a one-sided edge list can never co-locate a chain
    # whose shared node is 'a' in one edge and 'b' in the other — a
    # configuration that is otherwise stable forever). The invariant
    # probe below still guards convergence: hash-stability alone cannot
    # distinguish "star forest" from "not yet merged".
    for r in range(max_rounds):
        if edges.count() <= SINGLE_BLOCK_EDGES:
            # the one-block local pass yields the star forest exactly;
            # labels are emitted directly (unique by construction), so
            # the final groupby is skipped too
            return edges.repartition(1).map_batches(
                _local_labels,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        edges = (
            edges.map_batches(
                symmetrize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
            .sort("a", boundaries=_id_boundaries(_sort_parts()))
            .map_batches(
                _local_star,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,  # whole blocks: fewest boundaries
            )
            # canonical dedup: every edge is folded into BOTH endpoints'
            # sorted neighborhoods, so identical star rows are emitted by
            # two blocks; without this the multiset never stabilizes
            # (validated by simulation: dedup -> 3-5 rounds on paths/
            # random graphs, no-dedup -> oscillates forever)
            .groupby(["a", "b"])
            .count()
            .select_columns(["a", "b"])
            .materialize()
        )
        cur = _multiset_hash(edges)
        if cur[0] == 0 or (cur == prev and _is_star_forest(edges)):
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # star forest -> labels; roots appear only on the 'a' side
    def emit(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([b, a]),
                "cluster_id": pa.concat_arrays([a, a]),
            }
        )

    return (
        edges.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("node")
        .min("cluster_id")
        .rename_columns(["node", "cluster_id"])
    )


def _remap_column(ds, col: str, payload: str, mapping_ds):
    """ds[col] = mapping[ds[col]] where present, else unchanged.

    Tagged union on the lookup key, then one sort-based groupby whose
    per-group rewrite assigns the (unique) dst to every data row.
    Output schema: (col, payload). Used for the final cluster-id
    assignment; the union-find rounds themselves avoid per-group work.
    """

    def tag_map(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "pl": pa.nulls(len(batch), pa.int64()),
            }
        )

    def tag_data(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column(col).cast(pa.int64()),
                "dst": pa.nulls(len(batch), pa.int64()),
                "pl": batch.column(payload).cast(pa.int64()),
            }
        )

    tagged = mapping_ds.map_batches(
        tag_map, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).union(ds.map_batches(tag_data, batch_format="pyarrow", zero_copy_batch=True, batch_size=None))

    # sorted-run rewrite (same pattern as the run scorer): ONE sort
    # co-locates each key's mapping row with its data rows; interior
    # runs are rewritten vectorized per block, the (at most 2 per
    # block) boundary runs go through a tiny groupby. Replaces a
    # per-group map_groups whose Python overhead scaled with key count.
    sorted_t = tagged.sort(
        "k", boundaries=_id_boundaries(_sort_parts())
    ).materialize()

    def rewrite_runs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        empty = pa.table(
            {col: pa.array([], pa.int64()), payload: pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        k = batch.column("k").to_numpy()
        change = np.flatnonzero(k[1:] != k[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        if starts.shape[0] <= 2:
            return empty  # all runs touch a block edge
        lo, hi = ends[0], starts[-1]  # interior slice
        if lo >= hi:
            return empty
        dst_valid = pc.is_valid(batch.column("dst")).to_numpy(zero_copy_only=False)
        dst = batch.column("dst").fill_null(0).to_numpy(zero_copy_only=False)
        is_data = pc.is_valid(batch.column("pl")).to_numpy(zero_copy_only=False)
        pl = batch.column("pl").fill_null(0).to_numpy(zero_copy_only=False)
        # run id per row; per-run mapped destination via scatter
        run_id = np.zeros(n, dtype=np.int64)
        run_id[change] = 1
        np.cumsum(run_id, out=run_id)
        run_dst = np.full(starts.shape[0], -1, dtype=np.int64)
        mrows = np.flatnonzero(dst_valid)
        run_dst[run_id[mrows]] = dst[mrows]
        out_k = np.where(run_dst[run_id] >= 0, run_dst[run_id], k)
        keep = is_data.copy()
        keep[:lo] = False
        keep[hi:] = False
        return pa.table(
            {
                col: pa.array(out_k[keep].astype(np.int64)),
                payload: pa.array(pl[keep].astype(np.int64)),
            }
        )

    def boundary(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch
        k = batch.column("k").to_numpy()
        change = np.flatnonzero(k[1:] != k[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        if starts.shape[0] == 1:
            return batch
        idx = np.concatenate([np.arange(0, ends[0]), np.arange(starts[-1], n)])
        return batch.take(pa.array(idx))

    interior = sorted_t.map_batches(
        rewrite_runs, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    edge_runs = (
        sorted_t.map_batches(
            boundary, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("k")
        .map_groups(_rewrite_group_factory(col, payload), batch_format="pyarrow")
    )
    return interior.union(edge_runs)


def _rewrite_group_factory(col: str, payload: str):
    def rewrite(group: pa.Table) -> pa.Table:
        dst = group.column("dst").drop_null()
        data = group.filter(pc.is_valid(group.column("pl")))
        if len(data) == 0:
            return pa.table(
                {col: pa.array([], pa.int64()), payload: pa.array([], pa.int64())}
            )
        key = dst[0] if len(dst) else group.column("k")[0]
        n = len(data)
        return pa.table(
            {
                col: pa.array(np.full(n, key.as_py(), dtype=np.int64)),
                payload: data.column("pl"),
            }
        )

    return rewrite


def label_nodes(labels, nodes, id_col: str, out_col: str, *,
                broadcast_cap: int):
    """Assign each node its component label, self-labelling isolated
    nodes: ``(id_col, out_col)`` from a ``(node, cluster_id)`` labels
    Dataset over a node Dataset carrying ``id_col``. SIZE-SWITCHED
    like every broadcast plan in the repo: under ``broadcast_cap``
    label rows the table is gathered once and broadcast (one clamped
    ``_lut_probe`` gather per batch); above it the ER pipeline's
    sort-based tagged-union remap (:func:`_remap_column`) runs with
    the driver holding NOTHING — the correct default for an arbitrary
    100 TB edge list. Shared by ``annsearch.graph_components`` and
    ``strmatch.er_fuzzy_clusters``; the forced-fallback tests pin both
    paths value-equal."""
    import ray

    labels = labels.materialize()

    if labels.count() <= broadcast_cap:
        from hexhamming_ray.pipelines.text import _gather_table

        tbl = _gather_table(
            labels,
            pa.schema([("node", pa.int64()), ("cluster_id", pa.int64())]),
        )
        nid = tbl.column("node").to_numpy()
        order = np.argsort(nid)
        lut_ref = ray.put(
            (nid[order], tbl.column("cluster_id").to_numpy()[order])
        )

        class _LabelLookup:
            def __init__(self, ref):
                self.ref = ref
                self._lut = None

            def __call__(self, batch: pa.Table) -> pa.Table:
                if self._lut is None:
                    self._lut = ray.get(self.ref)
                from hexhamming_ray.pipelines.relational import _lut_probe

                ks, lab = self._lut
                ids = batch.column(id_col).cast(pa.int64()).to_numpy()
                if lab.shape[0] == 0:  # no edges at all: all isolated
                    comp = ids
                else:
                    pos, hit = _lut_probe(ks, ids)
                    comp = np.where(hit, lab[pos], ids)
                return pa.table(
                    {
                        id_col: pa.array(ids, pa.int64()),
                        out_col: pa.array(comp, pa.int64()),
                    }
                )

        return nodes.map_batches(
            _LabelLookup(lut_ref), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )

    # scale path: labels become a (src, dst) mapping dataset, nodes
    # carry themselves as payload, one tagged union + sorted-run
    # rewrite assigns components; unmapped (isolated) nodes keep their
    # own id. Nothing label- or corpus-sized ever reaches the driver.
    def as_mapping(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("node").cast(pa.int64()),
                "dst": batch.column("cluster_id").cast(pa.int64()),
            }
        )

    mapping = labels.map_batches(
        as_mapping, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    def dup_id(batch: pa.Table) -> pa.Table:
        nid_ = batch.column(id_col).cast(pa.int64())
        return pa.table({"comp": nid_, id_col: nid_})

    ids_ds = nodes.map_batches(
        dup_id, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    remapped = _remap_column(ids_ds, "comp", id_col, mapping)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                out_col: batch.column("comp").cast(pa.int64()),
            }
        )

    return remapped.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def unionfind_local(pairs) -> dict[int, int]:
    """Plain-Python oracle union-find for tests (path compression)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}
