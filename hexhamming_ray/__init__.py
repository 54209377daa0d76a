"""hexhamming_ray: a Ray-Data-native blocking + pairwise-Hamming-scoring
+ transitive-clustering entity-resolution engine (see SURVEY.md).

On import, glibc's malloc is tuned to keep large blocks on the heap
(``M_MMAP_MAX=0``, ``M_TRIM_THRESHOLD=-1``). Without this, every fresh
numpy buffer above the mmap threshold is returned to the OS on free and
first-touch page-faulted again on the next batch — measured 6x slower
hot loops in this environment (BASELINE.md §B). The call is per-process
and runs in every Ray worker that imports this package.
"""

from __future__ import annotations

import ctypes
import sys


def _tune_malloc() -> None:
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-4, 0)  # M_MMAP_MAX = 0
        libc.mallopt(-1, -1)  # M_TRIM_THRESHOLD = -1 (never trim)
        # PR_SET_THP_DISABLE: transparent huge pages are the dominant
        # multi-worker scaling killer on this host (THP=madvise with
        # defrag=madvise -> jemalloc/allocator madvise triggers
        # SYNCHRONOUS compaction inside the fault path, serializing on
        # kernel locks). Measured on the 32-proc fingerprint kernel:
        # 38 MB/s aggregate, 47% system time with THP vs 159 MB/s,
        # 2% system time without — a 4.2x aggregate speedup.
        libc.prctl(41, 1, 0, 0, 0)
    except OSError:
        pass


def _tune_arrow_pool() -> None:
    """Optionally route Arrow allocations through the system allocator
    (HEXRAY_ARROW_POOL=system). MEASURED WORSE here: at 17 GB of
    content the fingerprint stage ran 167-193 s under the system pool
    vs 137-139 s under Arrow's default jemalloc (16 CPUs, warm) — the
    default stays jemalloc; the knob remains for future environments
    where malloc heap retention beats jemalloc's decay."""
    import os

    if os.environ.get("HEXRAY_ARROW_POOL", "jemalloc") != "system":
        try:
            import pyarrow as pa

            # Never return dirty pages to the OS: first-touch faulting
            # is the dominant cost in this VM (ENGINEERING_NOTES 1),
            # and jemalloc's default 10 s decay makes every worker
            # re-fault its parquet-read buffers continuously.
            pa.jemalloc_set_decay_ms(-1)
        except Exception:
            pass
        return
    try:
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass


_tune_malloc()
_tune_arrow_pool()


def tune_data_context(hash_shuffle: bool = False) -> None:
    """Tune Ray Data's shuffle backend for this cluster. Called by
    every pipeline before its root Dataset is created (the DataContext
    snapshot is captured at root creation; the setting is process-
    global and sticky, so every root site calls this to pin the
    strategy it wants).

    ``hash_shuffle=True`` selects the hash-shuffle backend — required
    for ``Dataset.repartition(keys=[...], sort=True)``, the
    hash-partition + in-block-sort primitive the candidate-pairing
    stages use to co-locate band keys WITHOUT a global range sort (no
    block-straddling runs, so no boundary pass). The default stays on
    the sort-based backend: measured at sf0.1/32 CPUs, hash aggregation
    doubled plain groupby/aggregate queries (exact_dedup 3.3->6.8 s,
    q1 6.3->11.7 s, top_customers 7.8->17.5 s — per-query aggregator
    actor spin-up dominates), so only pipelines that need keys=
    repartition opt in.

    The stock hash-shuffle defaults (parallelism 200, up to 64
    aggregator actors) assume a large cluster; on a small one the
    aggregator fleet starves every other stage (observed: a 4-CPU
    groupby waited out the full 300 s aggregator-start timeout). Scale
    both to the CPU count instead."""
    try:
        import ray
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = (
            ShuffleStrategy.HASH_SHUFFLE
            if hash_shuffle
            else ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
        )
        cpus = (
            int(ray.cluster_resources().get("CPU", 4))
            if ray.is_initialized()
            else 4
        )
        ctx.default_hash_shuffle_parallelism = max(2, min(64, cpus))
        ctx.max_hash_shuffle_aggregators = max(1, min(16, cpus // 2))
        # Aggregator actors are concat/finalize workers that mostly
        # wait on inbound partitions; their default CPU reservation
        # (min(1, CPU/2/partitions) EACH) deadlocks a small cluster
        # the moment a plan holds several concurrent shuffle/join ops
        # plus a fixed actor pool (observed: minhash pipeline, 4 CPUs,
        # 4 shuffle ops x 2 aggregators reserving 8 of 4 CPUs). Make
        # them near-free so placement never starves the compute pools;
        # single-node oversubscription during finalize is benign.
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.01
    except Exception:
        pass


def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 64) -> int:
    """Fixed actor-pool size for stateful map_batches/map_groups stages,
    derived from the cluster CPU count at call time. Ray Data's
    autoscaling (min,max) pools routinely stay at min and serialize the
    stage (observed here: a (1,8) scorer pool ran one actor for the
    whole job), so stages size their pools explicitly. Keep the SUM of
    concurrently-active pools below the CPU count: two fixed pools that
    together hold every CPU starve the sort/shuffle tasks between them
    (observed deadlock at 4 CPUs with 2+2 actors)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(lo, min(hi, int(cpus * frac)))

def read_num_blocks(*paths: str, target_block_bytes: int = 64 << 20) -> int:
    """Data-size-aware block count for ``read_parquet``: one block per
    ~64 MB of file, floor CPUs/2. Ray's default targets ~2x-CPUs blocks
    regardless of size, so a 20 MB table is split into 64 sub-MB blocks
    — and every downstream sort-based groupby/sort makes one shuffle
    partition PER INPUT BLOCK (ENGINEERING_NOTES 26), turning a tiny
    aggregate into a 64x64 exchange (measured 2-4x slower at sf0.1).
    Growing the count with file bytes keeps the same call scale-safe:
    at 100 TB this yields ~1.6 M map tasks, and wide stages at that
    scale pin their partitioning explicitly (boundaries= / hash
    repartition) rather than inheriting it from the read."""
    import os

    total = 0
    for p in paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return max(pool_size(0.5, lo=2, hi=1 << 30), total // target_block_bytes + 1)
