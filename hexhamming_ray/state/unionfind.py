"""Distributed connected components (union-find) on Ray Data.

Iterative star-contraction in the min-label style (Rastogi et al.,
"Finding connected components in map-reduce in logarithmic rounds",
ICDE 2013; cf. PAPERS.md): each round every endpoint maps to the
minimum of its closed neighborhood, edges are rewritten through the
mapping and self-loops dropped, and the per-round mappings are composed
into the node->component labels. The edge set shrinks geometrically, so
the loop converges in O(log n) rounds on typical graphs.

Every wide step is a Dataset primitive. The pointer-jump "apply mapping
to a column" step is a TAGGED UNION + sort-based ``groupby().
map_groups`` rather than a hash join: Ray 2.49's hash-join operator
spawns a persistent aggregator-actor pool per join, and an iterative
algorithm issuing several joins per round accumulates pools until the
cluster thrashes (observed in this sandbox). The tagged-union pattern
uses the same sort shuffle as every other groupby — no extra actors,
same network volume, and it scales with partition count on a real
cluster.

Per-round datasets are materialized: they shrink every round and
materialization bounds recomputation under retries. Nothing aggregates
to the driver except scalar counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_AB = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _sym(edges_ds):
    """(a, b) -> both directions."""

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.table(
            {"a": pa.concat_arrays([a, b]), "b": pa.concat_arrays([b, a])},
            schema=_AB,
        )

    return edges_ds.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)


def _remap_column(ds, col: str, payload: str, mapping_ds):
    """ds[col] = mapping[ds[col]] where present, else unchanged.

    Tagged union on the lookup key: mapping rows carry ``dst`` non-null,
    data rows carry ``payload``; one sort-based groupby rewrites every
    data row in a key group with the group's (unique) dst.
    Output schema: (col, payload).
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
        tag_map, batch_format="pyarrow", zero_copy_batch=True
    ).union(ds.map_batches(tag_data, batch_format="pyarrow", zero_copy_batch=True))

    def rewrite(group: pa.Table) -> pa.Table:
        dst = group.column("dst").drop_null()
        data = group.filter(pc.is_valid(group.column("pl")))
        if len(data) == 0:
            return pa.table({col: pa.array([], pa.int64()), payload: pa.array([], pa.int64())})
        key = dst[0] if len(dst) else group.column("k")[0]
        n = len(data)
        return pa.table(
            {
                col: pa.array(np.full(n, key.as_py(), dtype=np.int64)),
                payload: data.column("pl"),
            }
        )

    return tagged.groupby("k").map_groups(rewrite, batch_format="pyarrow")


def connected_components(edges_ds, *, max_rounds: int = 50, **_ignored):
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
        to_ab, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
        )
        return pa.table({"node": nodes, "cluster_id": nodes})

    labels = (
        edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .min("cluster_id")
        .rename_columns(["node", "cluster_id"])
        .materialize()
    )

    for _round in range(max_rounds):
        if edges.count() == 0:
            break
        # m(a) = min(a, min neighbor): closed-neighborhood minimum
        nbr_min = _sym(edges).groupby("a").min("b")

        def finish_min(batch: pa.Table) -> pa.Table:
            m = pc.min_element_wise(batch.column("a"), batch.column("min(b)"))
            t = pa.table({"src": batch.column("a"), "dst": m})
            return t.filter(pc.not_equal(t.column("src"), t.column("dst")))

        mapping = nbr_min.map_batches(
            finish_min, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        # compose into labels: cluster_id = m(cluster_id) where defined
        labels = _remap_column(labels, "cluster_id", "node", mapping)
        labels = labels.materialize()

        # contract edges through m, drop self-loops, dedup
        e1 = _remap_column(edges, "a", "b", mapping)
        e2 = _remap_column(e1, "b", "a", mapping)

        def canon(batch: pa.Table) -> pa.Table:
            a = batch.column("a")
            b = batch.column("b")
            lo = pc.min_element_wise(a, b)
            hi = pc.max_element_wise(a, b)
            t = pa.table({"a": lo, "b": hi}, schema=_AB)
            return t.filter(pc.not_equal(t.column("a"), t.column("b")))

        edges = (
            e2.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["a", "b"])
            .count()
            .select_columns(["a", "b"])
            .materialize()
        )

    # labels currently keyed (cluster_id, node) after remaps; normalize order
    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
            }
        )

    return labels.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)


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
