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
    except OSError:
        pass


_tune_malloc()


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
