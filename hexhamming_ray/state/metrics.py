"""Distributed pipeline counters.

Task-based scorer instances live in per-worker process caches
(scoring.py ``_SCORER_CACHE``), so their ``pairs_scored`` /
``pairs_capped`` tallies die with the workers. A zero-CPU counter
actor collects the per-batch deltas instead: scorer tasks flush after
each batch (one tiny awaited RPC — awaiting guarantees the count is
recorded before the batch's output is reported downstream, so the
totals read after the edge stage materializes are exact), and
``write_pipeline_metrics`` reads the totals once at the end.
"""

from __future__ import annotations


class _PairCounter:
    def __init__(self):
        self.scored = 0
        self.capped = 0

    def add(self, scored: int, capped: int) -> None:
        self.scored += scored
        self.capped += capped

    def totals(self) -> dict:
        return {"pairs_scored": self.scored, "pairs_capped": self.capped}


_REMOTE_CLS = None


def make_pair_counter():
    """A fresh zero-CPU PairCounter actor handle (pickles into tasks)."""
    global _REMOTE_CLS
    import ray

    if _REMOTE_CLS is None:
        _REMOTE_CLS = ray.remote(num_cpus=0)(_PairCounter)
    return _REMOTE_CLS.remote()
