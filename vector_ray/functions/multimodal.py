"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (the image/audio libraries are
not available in this environment): ``decode_fn`` raises
``NotImplementedError`` unless a deterministic fake is requested. What
IS real and tested is the Ray-side plumbing — schema, actor-pool stage
signature, per-batch layout, byte-budgeted batch sizing — so swapping a
real decoder in (PIL/torchaudio/ffmpeg) changes only the kernel body.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),       # opaque encoded bytes
        pa.field("media_type", pa.string()),    # image/jpeg, audio/wav, ...
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def fake_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(64, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(
                [("image/jpeg", "audio/wav")[i % 2] for i in range(n)]
            ),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60_000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``mode="stub"`` raises NotImplementedError (the honest default when no
    codec library exists); ``mode="fake"`` produces a deterministic
    16-dim feature from the payload bytes so pipelines are testable
    end-to-end. A real deployment implements ``_decode``.
    """

    FEATURE_DIM = 16

    def __init__(self, mode: str = "fake"):
        # per-actor setup: a real impl loads the codec / model here, once
        self.mode = mode

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.mode == "stub":
            raise NotImplementedError(
                "media decode requires an image/audio library not present "
                "in this environment; use mode='fake' for plumbing tests"
            )
        # deterministic fake: histogram of byte values folded to 16 bins
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=self.FEATURE_DIM, range=(0, 256))
        return (hist / max(len(arr), 1)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = np.stack(
            [self._decode(p, t) for p, t in zip(payloads, types)]
        ) if payloads else np.zeros((0, self.FEATURE_DIM), np.float32)
        features = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": features,
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )


def extract_features(ds, mode: str = "fake", concurrency: int = 4,
                     batch_size: int = 64):
    """Feature-extraction stage. ``batch_size`` is deliberately small:
    media payloads are large, so batch bytes — not rows — bound memory
    (SURVEY.md §7.4 'very wide rows')."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def frame_sample(ds, every_ms: int = 1000):
    """Video frame-sampling plumbing: expands each row into frame-time
    offsets (the decode itself is the stubbed kernel above)."""

    def expand(t: pa.Table) -> pa.Table:
        ids, types, offs = [], [], []
        for mid, mtype, dur in zip(
            t["media_id"].to_pylist(),
            t["media_type"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            n = max(1, (dur or 0) // every_ms)
            ids.extend([mid] * n)
            types.extend([mtype] * n)
            offs.extend(range(0, n * every_ms, every_ms))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "media_type": pa.array(types, pa.string()),
                "frame_offset_ms": pa.array(offs, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=64)
