"""Flagship pipeline: blocking + pairwise scoring + transitive
clustering over a Parquet source-code corpus (BASELINE.json north_star).

Stage graph (SURVEY.md §3.5) — every wide step is a Dataset primitive,
streaming end-to-end, with optional stage-boundary Parquet checkpoints:

  read_parquet(files)                         columns pruned to 5
    -> map_batches(fingerprint_batch)         sha256 + 256-bit simhash
    -> [checkpoint fingerprints/]
    -> map_batches(make_bands)                16 x 16-bit LSH bands
       (no separate sha256 exact-collapse shuffle: identical contents
        share a fingerprint and collapse in-band as identity classes)
    -> repartition(keys=[bkey], sort=True)    shuffle 1 (the only
       candidate shuffle: hash partitioning co-locates every band key
       in one block, sorted in-block, so the run scorer handles ALL
       runs — no boundary pass, no materialize barrier)
    -> map_batches(ScoreRuns edge_runs=True)  scorer actor pool
       (canonical-band emission: pairs unique by construction,
        so there is NO pair-dedup shuffle; exact dups surface as
        0-distance identity-class star edges owned by band 0)
    -> [checkpoint edges/]
    -> connected_components (sym+sort+local-UF rounds; single-block
       tail emits labels directly for small edge sets)
    -> tagged-union remap fingerprints -> clusters  (singletons keep own id)
    -> [checkpoint clusters/]
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hexhamming_ray.stages.fingerprint import fingerprint_dataset
from hexhamming_ray.stages.blocking import make_bands
from hexhamming_ray.stages.scoring import (
    DEFAULT_THRESHOLD,
    EDGE_SCHEMA,
)
from hexhamming_ray.state.unionfind import connected_components
from hexhamming_ray.state.checkpoint import Checkpointer


def build_edges(
    files_ds,
    *,
    threshold: int = DEFAULT_THRESHOLD,
    checkpointer: Checkpointer | None = None,
    scorer_concurrency=None,
):
    """files Dataset -> (fingerprints_ds, edges_ds)."""
    ck = checkpointer or Checkpointer(None)
    fps = ck.stage("fingerprints", lambda: fingerprint_dataset(files_ds))
    return build_edges_from_fps(
        fps,
        threshold=threshold,
        checkpointer=ck,
        scorer_concurrency=scorer_concurrency,
    )


def _runs_scorer_fn(threshold: int, *, edge_runs: bool, tile: int = 256,
                    counter=None):
    """Task-based run scorer: a pickled ScoreRuns instance whose XOR
    tile lives in a per-process cache — no actor-pool spin-up, no pool
    sizing, scratch faulted once per worker."""
    from hexhamming_ray.stages.scoring import ScoreRuns

    scorer = ScoreRuns(threshold=threshold, tile=tile, edge_runs=edge_runs,
                       counter=counter)

    def score_runs(batch: pa.Table) -> pa.Table:
        return scorer(batch)

    return score_runs


def build_edges_from_fps(
    fps,
    *,
    threshold: int = DEFAULT_THRESHOLD,
    checkpointer: Checkpointer | None = None,
    scorer_concurrency=None,
    plan: str = "sort",
    counter=None,
):
    """fingerprints -> (fingerprints_ds, edges_ds). Edges are deduped
    canonical pairs (id_lo < id_hi, dist <= threshold inclusive).

    Two physical plans for the one candidate shuffle (both produce
    identical edges — verified 167,044 = 167,044 on the 60k bench
    corpus):

    * ``plan="sort"`` (default): range sort(bkey) + interior-run scorer
      + tiny boundary pass for block-straddling runs. The task-based
      range sort has ~10x lower constant cost than the actor-based hash
      shuffle at sandbox scale (measured 10.5 s vs 16-17 s for the full
      edge stage at 60k files x 8).
    * ``plan="hash"``: one ``repartition(keys=['bkey'], sort=True)``
      co-locates every key, so the scorer handles ALL runs and the
      boundary machinery plus the mid-pipeline materialize disappear —
      3 fewer operators. Wins when per-operator fixed latency dominates
      (small clusters / huge op graphs); requires the fps ROOT created
      under ``tune_data_context(hash_shuffle=True)``.
    """
    ck = checkpointer or Checkpointer(None)

    def _edges():
        from hexhamming_ray import pool_size
        from hexhamming_ray.stages.scoring import (
            ScoreBlock,
            ScoreRuns,
            boundary_rows,
        )

        # No separate exact-dup (sha256) collapse shuffle: identical
        # contents have identical fingerprints, so they fall into the
        # scorer's in-band identity classes and come out as 0-distance
        # star edges owned by band 0 — the same connectivity the
        # dedicated collapse produced, minus one full shuffle. (Tiny
        # files carry sha-derived fingerprints, so exact-dup semantics
        # hold below the shingle width too.) At extreme dup rates a
        # pre-collapse would shrink banding volume; reintroduce it as a
        # partial combiner if a corpus measures >2x duplication.
        banded = fps.select_columns(["file_id", "simhash"]).map_batches(
            make_bands, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        # no pair-dedup shuffle in either plan: canonical-band emission
        # makes every pair (including 0-distance identity-class star
        # edges) unique by construction
        if plan == "hash":
            parts = banded.repartition(
                num_blocks=pool_size(2.0, lo=8, hi=256),
                keys=["bkey"],
                sort=True,
            )
            return parts.map_batches(
                _runs_scorer_fn(threshold, edge_runs=True, counter=counter),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        # ONE sort replaces the count-groupby + broadcast-filter +
        # groupby-map_groups cascade: the run scorer skips singleton
        # band keys with two numpy comparisons and scores interior runs
        # without per-group Python overhead. Materialized because two
        # passes read it (interior runs + boundary runs). Explicit
        # boundaries keep the exchange linear in data (mappers x P
        # objects, not blocks^2 — see band_boundaries for the measured
        # failure mode); SAMPLED quantile boundaries balance partition
        # row mass against band-key skew, and 4 partitions/CPU smooths
        # the remaining wave quantization (a 4.6x straggler partition
        # dominated the 2-wave schedule under even spacing).
        from hexhamming_ray.stages.blocking import sampled_band_boundaries

        bounds = sampled_band_boundaries(fps, pool_size(4.0, lo=16, hi=512))
        sorted_b = banded.sort("bkey", boundaries=bounds).materialize()
        # TASK-based scorer (pickled instance, per-process tile cache):
        # an actor pool here costs ~3-5 s of staggered spin-up per run
        # and needs manual sizing against other pools (ENGINEERING_NOTES
        # 5/6); tasks reuse the workers the fingerprint stage already
        # warmed and schedule freely.
        #
        # With EXPLICIT sort boundaries every partition holds a disjoint
        # key range (rows with key == boundary all land on one side), so
        # key runs can never straddle partitions. When the sort emitted
        # exactly one block per partition (num_blocks == len(bounds)+1 —
        # the normal case; verified key-disjoint empirically), ONE
        # edge_runs pass scores every run and the whole boundary
        # machinery (boundary_rows map + repartition(1) + boundary
        # scorer + union: 3 extra operators and a serial scoring task
        # whose row volume GREW with partition count — 33k boundary rows
        # at 64 partitions vs 300 at 16, because quantile boundaries sit
        # at heavy keys whose whole runs then landed in the conservative
        # first/last-run extraction) disappears.
        if sorted_b.num_blocks() == len(bounds) + 1:
            return sorted_b.map_batches(
                _runs_scorer_fn(threshold, edge_runs=True, counter=counter),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        # Fallback (a partition split into multiple blocks, e.g. far
        # beyond target_max_block_size): first/last runs of each block
        # may straddle blocks, so they are left out of the interior pass
        # and scored by a COALESCED boundary pass — the stream is tiny,
        # so instead of a groupby (a 3-stage all-to-all whose
        # per-partition scheduling cost 14 s of wall on ~1 s of compute
        # at 200 blocks) it is collapsed to one block: range-sorted
        # blocks concatenate in order, so the coalesced block is still
        # bkey-sorted and a single edge_runs ScoreRuns task scores every
        # boundary run.
        near_interior = sorted_b.map_batches(
            _runs_scorer_fn(threshold, edge_runs=False, counter=counter),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        near_boundary = (
            sorted_b.map_batches(
                boundary_rows,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
            .repartition(1)
            .map_batches(
                _runs_scorer_fn(threshold, edge_runs=True,
                                counter=counter),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        )
        return near_interior.union(near_boundary)

    edges = ck.stage("edges", _edges)
    return fps, edges


def build_clusters(fps, edges, *, checkpointer: Checkpointer | None = None,
                   num_partitions: int = 32,
                   broadcast_limit: int = 20_000_000):
    """-> clusters Dataset (file_id, cluster_id); singleton files keep
    cluster_id == file_id.

    The node->cluster label table only contains nodes that appear in an
    edge — usually a small fraction of the corpus. When it fits under
    ``broadcast_limit`` rows it is broadcast once via ``ray.put`` (two
    int64 arrays) and the remap is ONE searchsorted gather per batch;
    the sort-based tagged-union remap (several operators of fixed
    latency) remains the fallback for label tables too big to
    broadcast."""
    ck = checkpointer or Checkpointer(None)

    def _clusters():
        import ray

        from hexhamming_ray.state.unionfind import _remap_column

        labels = connected_components(edges).materialize()

        if labels.count() <= broadcast_limit:
            src_l, dst_l = [], []
            for b in labels.to_arrow_refs():
                t = ray.get(b)
                if t.num_rows == 0:  # empty blocks carry a bare schema
                    continue
                src_l.append(t.column("node").to_numpy())
                dst_l.append(t.column("cluster_id").to_numpy())
            src = (
                np.concatenate(src_l).astype(np.int64)
                if src_l
                else np.empty(0, dtype=np.int64)
            )
            dst = (
                np.concatenate(dst_l).astype(np.int64)
                if dst_l
                else np.empty(0, dtype=np.int64)
            )
            order = np.argsort(src)
            mapping_ref = ray.put((src[order], dst[order]))

            def remap(batch: pa.Table) -> pa.Table:
                msrc, mdst = ray.get(mapping_ref)
                fid = batch.column("file_id").cast(pa.int64()).to_numpy()
                cid = fid.copy()  # singletons keep their own id
                if msrc.shape[0]:
                    pos = np.searchsorted(msrc, fid)
                    pos = np.minimum(pos, msrc.shape[0] - 1)
                    hit = msrc[pos] == fid
                    cid[hit] = mdst[pos[hit]]
                return pa.table(
                    {
                        "file_id": pa.array(fid, pa.int64()),
                        "cluster_id": pa.array(cid, pa.int64()),
                    }
                )

            return fps.select_columns(["file_id"]).map_batches(
                remap, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            )

        def as_mapping(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("node").cast(pa.int64()),
                    "dst": batch.column("cluster_id").cast(pa.int64()),
                }
            )

        mapping = labels.map_batches(
            as_mapping, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

        def dup_id(batch: pa.Table) -> pa.Table:
            fid = batch.column("file_id").cast(pa.int64())
            return pa.table({"cid": fid, "file_id": fid})

        ids = fps.select_columns(["file_id"]).map_batches(
            dup_id, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        # cid = labels[file_id] where clustered, else file_id (singleton)
        remapped = _remap_column(ids, "cid", "file_id", mapping)

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "file_id": batch.column("file_id").cast(pa.int64()),
                    "cluster_id": batch.column("cid").cast(pa.int64()),
                }
            )

        return remapped.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    return ck.stage("clusters", _clusters)


def run_pipeline(
    files_dir: str,
    *,
    out_dir: str | None = None,
    threshold: int = DEFAULT_THRESHOLD,
    resume: bool = True,
    plan: str = "sort",
):
    """End-to-end ER over a files Parquet directory. Returns dict of
    Datasets. With ``out_dir`` set, stage outputs are checkpointed as
    partitioned Parquet and completed stages are skipped on re-run.

    The read and the fingerprint stage are FUSED into one task per
    parquet row group (see fingerprint_from_parquet): the wide content
    column never enters the object store."""
    from hexhamming_ray.stages.fingerprint import fingerprint_from_parquet

    ck = Checkpointer(out_dir if resume else None)
    counter = None
    if out_dir:
        from hexhamming_ray.state.metrics import make_pair_counter

        counter = make_pair_counter()
    fps, edges = build_edges_from_fps(
        ck.stage(
            "fingerprints",
            lambda: fingerprint_from_parquet(
                files_dir, hash_shuffle=(plan == "hash")
            ),
        ),
        threshold=threshold,
        checkpointer=ck,
        plan=plan,
        counter=counter,
    )
    clusters = build_clusters(fps, edges, checkpointer=ck)
    if out_dir:
        write_pipeline_metrics(out_dir, fps, edges, clusters, counter=counter)
    return {"fingerprints": fps, "edges": edges, "clusters": clusters}


def update_clusters(ckpt_dir: str, new_files_ds, *,
                    threshold: int = DEFAULT_THRESHOLD,
                    num_partitions: int | None = None):
    """INCREMENTAL ER: merge NEW files into a completed checkpointed
    run (``run_pipeline(..., out_dir=ckpt_dir)``) without
    re-fingerprinting or re-scoring the existing corpus.

    Cost shape: fingerprint(new) + banding over new ∪ the bkey-filtered
    old FINGERPRINTS (a pruned ``(file_id, simhash)`` columnar re-read
    of the checkpoint — old content is never touched) + pair scoring of
    the colliding bands + connected components over (checkpointed edges
    ∪ new edges). Old rows survive only when their bkey is in the NEW
    band-key set, so every scored run contains a new member by
    construction; the old×old pairs inside those runs are rescored
    (bounded by band locality) and yield duplicate edges, which
    connected_components tolerates.

    Edge-coverage argument: a qualifying pair shares ≥1 band (the same
    pigeonhole/probabilistic guarantee as the full run). Old–old pairs
    are already in the checkpointed edges; any pair involving a new
    file shares a band whose key is in the new-key set, so both members
    survive the filter and the pair is scored. Labels are min-node-id,
    so the merged clusters are IDENTICAL to a from-scratch run over
    old ∪ new (pinned in tests).

    Returns the merged clusters Dataset (file_id, cluster_id)."""
    import ray

    from hexhamming_ray import pool_size, tune_data_context
    from hexhamming_ray.stages.blocking import HotKeyFilter, make_bands
    from hexhamming_ray.stages.fingerprint import fingerprint_dataset

    # the keyed repartition below needs HASH_SHUFFLE, and a union's
    # context snapshot comes from its LEFT-MOST input — pin it before
    # creating old_fps (ENGINEERING_NOTES item 33)
    tune_data_context(hash_shuffle=True)
    old_fps = ray.data.read_parquet(
        f"{ckpt_dir}/fingerprints", columns=["file_id", "simhash"]
    )
    new_fps = fingerprint_dataset(new_files_ds).materialize()

    new_banded = new_fps.select_columns(["file_id", "simhash"]).map_batches(
        make_bands, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()

    # Band-key semi-filter BEFORE the exchange: only old rows whose
    # bkey collides with a NEW file's bkey can contribute a new edge,
    # so broadcast the new band-key set (≤ 16·|new| int64s) and drop
    # everything else map-side — the exchange then carries collision
    # volume, not the corpus's full banded table. (0-row blocks can
    # carry a bare schema — skip them, ENGINEERING_NOTES item 34.)
    new_keys_l = [
        t.column("bkey").to_numpy()
        for t in ray.get(new_banded.to_arrow_refs())
        if t.num_rows
    ]
    new_keys = np.unique(
        np.concatenate(new_keys_l)
        if new_keys_l else np.empty(0, dtype=np.int64)
    )
    keys_ref = ray.put(new_keys)

    banded = old_fps.map_batches(
        make_bands, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).map_batches(
        HotKeyFilter(keys_ref), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    ).union(new_banded)
    parts = banded.repartition(
        num_blocks=num_partitions or pool_size(2.0, lo=8, hi=256),
        keys=["bkey"],
        sort=True,
    )

    new_edges = parts.map_batches(
        _runs_scorer_fn(threshold, edge_runs=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )

    old_edges = ray.data.read_parquet(f"{ckpt_dir}/edges")
    edges = old_edges.union(new_edges)
    all_fps = old_fps.union(new_fps.select_columns(["file_id", "simhash"]))
    return build_clusters(all_fps, edges)


def write_pipeline_metrics(out_dir: str, fps, edges, clusters,
                           counter=None) -> None:
    """Pair-scoring / clustering metrics to Parquet (north rule:
    per-partition lineage lives in the checkpoint manifest; these are
    the pipeline-level counters). Everything derives from small
    distributed aggregates — no full materialization on the driver."""
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Max, Mean

    path = os.path.join(out_dir, "metrics.parquet")
    if os.path.exists(path):
        return
    n_files = fps.count()
    n_edges = edges.count()
    # edge distance profile (scored pairs kept)
    dist_stats = edges.aggregate(Mean("dist"), Max("dist")) if n_edges else {}
    # cluster size profile
    sizes = clusters.groupby("cluster_id").count()
    size_stats = sizes.aggregate(Max("count()"), Count())
    rows = [
        {"metric": "n_files", "value": float(n_files)},
        {"metric": "n_edges", "value": float(n_edges)},
        {"metric": "mean_edge_dist", "value": float(dist_stats.get("mean(dist)", 0.0) or 0.0)},
        {"metric": "max_edge_dist", "value": float(dist_stats.get("max(dist)", 0) or 0)},
        {"metric": "n_clusters", "value": float(size_stats["count()"])},
        {"metric": "max_cluster_size", "value": float(size_stats["max(count())"])},
    ]
    if counter is not None:
        import ray

        # exact by the time stages materialized: scorer tasks await
        # their per-batch flush before emitting output (scoring.py
        # flush_counts). pairs_capped > 0 marks recall loss inside
        # flooded blocks beyond the salted cross-pass.
        totals = ray.get(counter.totals.remote())
        rows.extend(
            {"metric": k, "value": float(v)} for k, v in sorted(totals.items())
        )
    pq.write_table(pa.Table.from_pylist(rows), path)
