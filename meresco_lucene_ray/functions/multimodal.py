"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``large_binary`` columns with typed metadata
columns alongside.  The Ray-side plumbing (schema, actor-pool stage shape,
batch sizing for wide rows) is real; the codec calls are STUBBED because the
decode libraries (PIL/ffmpeg/torchaudio) are not in this container — each
stub either raises ``NotImplementedError`` or, with ``fake=True``, produces a
deterministic fake so pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.large_binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),           # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class ImageDecodeStage:
    """Actor-pool stage: decode → resize → feature vector.

    Wide binary rows need small batches: pass ``batch_size=32``-ish and let
    `concurrency` provide the parallelism.  STUB: real decode requires PIL,
    absent here; ``fake=True`` derives a deterministic 8-dim feature from the
    payload hash so downstream stages (ANN, dedup) are exercised for real.
    """

    def __init__(self, size: tuple[int, int] = (224, 224), fake: bool = False):
        self.size = size
        self.fake = fake
        if not fake:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "image decode requires Pillow, which is not installed; "
                    "use ImageDecodeStage(fake=True) for the deterministic stub"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:  # pragma: no cover
            raise NotImplementedError("real decode path requires Pillow")
        feats = []
        for buf in batch["payload"].to_pylist():
            h = hashlib.sha256(buf or b"").digest()
            feats.append(np.frombuffer(h[:32], dtype=np.uint32).astype(np.float64)[:8] / 2**32)
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        )


class AudioFrameSampleStage:
    """Actor-pool stage: sample N frames/windows from an audio payload.

    STUB (no ffmpeg/torchaudio): with ``fake=True`` emits deterministic
    pseudo-frames derived from the payload hash; schema/batching real."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake
        if not fake:  # pragma: no cover
            raise NotImplementedError("audio decode libraries are not installed; use fake=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = []
        for buf in batch["payload"].to_pylist():
            h = hashlib.sha256(buf or b"").digest()
            vals = np.frombuffer((h * ((self.n * 4) // len(h) + 1))[: self.n * 4], dtype=np.uint32)
            frames.append((vals.astype(np.float64) / 2**32).tolist())
        return batch.append_column("frames", pa.array(frames, type=pa.list_(pa.float64())))


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 if kind != "audio" else -1,
                "height": 64 if kind != "audio" else -1,
                "duration_ms": -1 if kind == "image" else 1000 + i,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
