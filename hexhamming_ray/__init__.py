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
