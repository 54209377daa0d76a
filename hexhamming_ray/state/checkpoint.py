"""Stage-boundary checkpointing with a JSON lineage manifest.

Each stage writes partitioned Parquet under ``<root>/<stage>/`` plus a
manifest entry ``{stage, rows, completed_at_stage_hash}``. On re-run a
completed stage is NOT recomputed: it is re-read with
``ray.data.read_parquet`` — "resume mid-shuffle" therefore means
restarting at the last completed stage boundary (SURVEY.md §4.2).
Writes go to ``<stage>.tmp`` first and are renamed into place, so a
killed run never leaves a half-written stage marked complete.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _retune_preserving_strategy() -> None:
    """Re-apply the data-context tuning for the checkpoint read-back
    WITHOUT flipping the shuffle backend: the caller's pipeline pinned
    hash- or sort-shuffle before its root was created, and a keyed
    ``repartition`` downstream of the re-read dataset fails if the
    strategy silently resets (observed: resumed minhash under the
    default sort backend)."""
    from hexhamming_ray import tune_data_context

    try:
        from ray.data.context import DataContext, ShuffleStrategy

        keep_hash = (
            DataContext.get_current().shuffle_strategy
            == ShuffleStrategy.HASH_SHUFFLE
        )
    except Exception:
        keep_hash = False
    tune_data_context(hash_shuffle=keep_hash)


class Checkpointer:
    def __init__(self, root: str | None):
        self.root = root
        self.manifest_path = os.path.join(root, "manifest.json") if root else None
        self.manifest: dict = {}
        if self.manifest_path and os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    def _save_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self.manifest_path)

    def stage(self, name: str, build):
        """Return the stage's Dataset: re-read it if checkpointed,
        otherwise build, write, record lineage, and re-read (so
        downstream consumers stream from Parquet, not from a lineage
        chain rooted at the expensive upstream)."""
        import ray

        if not self.root:
            # no disk checkpoint: pin the stage result in the object store
            # so the multiple downstream consumers and iterative rounds do
            # not re-execute the upstream DAG (blocks spill under pressure)
            return build().materialize()
        final = os.path.join(self.root, name)
        if self.manifest.get(name, {}).get("complete"):
            _retune_preserving_strategy()
            return ray.data.read_parquet(final)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.monotonic()
        ds = build()
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        wall = time.monotonic() - t0
        _retune_preserving_strategy()
        out = ray.data.read_parquet(final)
        self.manifest[name] = {
            "complete": True,
            "rows": out.count(),
            "wall_sec": round(wall, 3),
            "partitions": self._partition_lineage(final),
        }
        self._save_manifest()
        return out

    @staticmethod
    def _partition_lineage(path: str) -> list[dict]:
        """Per-partition lineage: one entry per output Parquet file with
        its row count (from footer metadata — no data read)."""
        import pyarrow.parquet as pq

        out = []
        for fname in sorted(os.listdir(path)):
            if not fname.endswith(".parquet"):
                continue
            fp = os.path.join(path, fname)
            out.append(
                {"file": fname, "rows": pq.ParquetFile(fp).metadata.num_rows}
            )
        return out
