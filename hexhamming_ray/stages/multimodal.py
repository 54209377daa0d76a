"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with small typed
metadata columns alongside (SURVEY.md task brief). The Ray-side
plumbing — schemas, actor-pool stages with per-actor "model" state,
small batch sizes for large payloads, output layouts — is real and
tested; the actual codec calls are STUBBED because no image/audio
library exists in this container:

* ``decode="fake"`` (default): a deterministic, seedless fake decoder
  (payload bytes -> pseudo pixel stats) so pipelines are runnable and
  testable end to end.
* ``decode="real"``: raises ``NotImplementedError`` with the exact
  library call to drop in (PIL.Image.open / soundfile.read).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

FEATURE_DIM = 64


def synth_media_batch(batch: dict) -> pa.Table:
    """Deterministic fake media rows from an id range (Ray Data
    ``range`` -> media table); payload bytes derive from the id."""
    ids = batch["id"].astype(np.int64)
    rows = []
    for i in ids.tolist():
        seed = hashlib.sha256(f"media|{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        payload = (seed * ((i % 7) + 1))[: 64 + (i % 129)]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "width": 16 + (i % 64) if kind != "audio" else 0,
                "height": 16 + (i % 48) if kind != "audio" else 0,
                "sample_rate": 16000 if kind == "audio" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool stage: decode payload -> fixed-width feature vector.

    ``__init__`` loads the (stubbed) model ONCE per actor; ``__call__``
    is vectorized over the batch where possible. Use small
    ``batch_size`` (payloads are large) and ``concurrency=(min,max)``
    sized to the node — e.g.
    ``ds.map_batches(MediaFeatureExtractor, batch_size=64,
    concurrency=(2, 8), num_cpus=1)``.
    """

    def __init__(self, decode: str = "fake", feature_dim: int = FEATURE_DIM):
        self.decode = decode
        self.feature_dim = feature_dim
        # stub of the once-per-actor model/codec initialization
        self._proj = np.random.default_rng(42).standard_normal(
            (256, feature_dim)
        )

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.decode == "real":
            raise NotImplementedError(
                "real decode requires PIL (images) / soundfile (audio); "
                "not available in this container — plug the codec call "
                "in here, the surrounding Ray plumbing is complete"
            )
        # fake decoder: byte histogram as 'pixels' (deterministic)
        return np.bincount(
            np.frombuffer(payload, dtype=np.uint8), minlength=256
        ).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = np.stack(
            [
                self._decode(p, k) @ self._proj
                for p, k in zip(payloads, kinds)
            ]
        ).astype(np.float32)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
                "n_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )


def media_features(n_media: int = 1000):
    """Demo pipeline: synthetic media table -> actor-pool feature
    extraction. Returns (media_id, kind, feature, n_bytes)."""
    import ray

    from hexhamming_ray import tune_data_context

    tune_data_context()
    media = ray.data.range(n_media).map_batches(
        synth_media_batch, batch_format="numpy", batch_size=256
    )
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=(1, 4),
    )
