"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``large_binary`` columns with typed metadata
columns alongside.  The Ray-side plumbing (schema, actor-pool stage shape,
batch sizing for wide rows) is real; decoding is real where a pure
numpy/stdlib codec exists in this container:

- images: P6 PPM / P5 PGM decoded with numpy (header parse + frombuffer),
  nearest-neighbour resize, 8-dim feature (per-channel mean/std + shape);
  other formats fall back to Pillow when installed, else raise
  ``NotImplementedError`` per batch;
- audio: PCM WAV decoded with the stdlib ``wave`` module; frame sampling =
  RMS over N equal windows;
- video: STUBBED (ffmpeg is not in this container) — ``fake=True`` emits
  deterministic pseudo-frames from the payload hash.

``fake=True`` on any stage replaces decode with a deterministic
payload-hash derivation so pipelines stay testable with arbitrary bytes.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

from .hashing import strip_meta

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


def _hash_features(buf: bytes, n: int = 8) -> np.ndarray:
    h = hashlib.sha256(buf or b"").digest()
    return np.frombuffer(h[: n * 4], dtype=np.uint32).astype(np.float64) / 2**32


def decode_pnm(buf: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5) to (h, w, channels) uint8 — pure
    numpy, no image library needed."""
    if not buf or buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if buf[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * channels, offset=pos)
    return data.reshape(h, w, channels)


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize to (width, height) via index maps."""
    tw, th = size
    h, w = img.shape[:2]
    yi = (np.arange(th) * h // th).astype(np.int64)
    xi = (np.arange(tw) * w // tw).astype(np.int64)
    return img[yi][:, xi]


def image_features(img: np.ndarray) -> np.ndarray:
    """8-dim feature: per-channel mean (3) + per-channel std (3) + aspect +
    overall brightness, all in [0, 1]-ish ranges (grayscale broadcasts)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    f = img.astype(np.float64) / 255.0
    mean = f.mean(axis=(0, 1))
    std = f.std(axis=(0, 1))
    aspect = img.shape[1] / max(img.shape[0], 1)
    return np.concatenate((mean, std, [aspect, float(f.mean())]))


class ImageDecodeStage:
    """Actor-pool stage: decode → resize → feature vector.

    Wide binary rows need small batches: pass ``batch_size=32``-ish and let
    `concurrency` provide the parallelism.  PPM/PGM payloads decode with the
    built-in numpy codec; other formats use Pillow when available, else the
    batch raises ``NotImplementedError`` (the container has no image libs).
    ``fake=True`` derives a deterministic 8-dim feature from the payload
    hash so pipelines run on arbitrary bytes."""

    def __init__(self, size: tuple[int, int] = (224, 224), fake: bool = False):
        self.size = size
        self.fake = fake
        try:
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode_one(self, buf: bytes) -> np.ndarray:
        if buf[:2] in (b"P6", b"P5"):
            return decode_pnm(buf)
        if self._pil:  # pragma: no cover - Pillow absent in this container
            import PIL.Image

            return np.asarray(PIL.Image.open(io.BytesIO(buf)).convert("RGB"))
        raise NotImplementedError(
            "payload is not PPM/PGM and Pillow is not installed; "
            "use ImageDecodeStage(fake=True) for the deterministic stub"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        feats = []
        for buf in batch["payload"].to_pylist():
            if self.fake:
                feats.append(_hash_features(buf))
            else:
                img = resize_nearest(self._decode_one(buf or b""), self.size)
                feats.append(image_features(img))
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        )


class AudioFrameSampleStage:
    """Actor-pool stage: sample N frames/windows from an audio payload.

    PCM WAV payloads decode with the stdlib ``wave`` module (real path);
    frames = RMS per equal window in [0, 1].  ``fake=True`` emits
    deterministic pseudo-frames from the payload hash."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake

    def _frames_one(self, buf: bytes) -> list[float]:
        if self.fake:
            h = hashlib.sha256(buf or b"").digest()
            vals = np.frombuffer((h * ((self.n * 4) // len(h) + 1))[: self.n * 4], dtype=np.uint32)
            return (vals.astype(np.float64) / 2**32).tolist()
        import wave

        try:
            with wave.open(io.BytesIO(buf), "rb") as w:
                sw = w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError) as e:
            raise NotImplementedError(
                "payload is not PCM WAV (and no other audio codec is "
                "installed); use AudioFrameSampleStage(fake=True)"
            ) from e
        if sw == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 1:
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise NotImplementedError(f"unsupported WAV sample width {sw}")
        if samples.size == 0:
            return [0.0] * self.n
        bounds = np.linspace(0, samples.size, self.n + 1).astype(np.int64)
        out = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg = samples[a:b]
            out.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        frames = [self._frames_one(buf or b"") for buf in batch["payload"].to_pylist()]
        return batch.append_column("frames", pa.array(frames, type=pa.list_(pa.float64())))


class VideoFrameSampleStage:
    """Actor-pool stage: sample N frames from a video payload — STUB (no
    ffmpeg in this container).  ``fake=True`` emits deterministic
    pseudo-frame features; the real path raises ``NotImplementedError``."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake
        if not fake:  # pragma: no cover
            raise NotImplementedError(
                "video decode requires ffmpeg, which is not installed; "
                "use VideoFrameSampleStage(fake=True)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)
        frames = []
        for buf in batch["payload"].to_pylist():
            h = hashlib.sha256(buf or b"").digest()
            vals = np.frombuffer((h * ((self.n * 4) // len(h) + 1))[: self.n * 4], dtype=np.uint32)
            frames.append((vals.astype(np.float64) / 2**32).tolist())
        return batch.append_column("frames", pa.array(frames, type=pa.list_(pa.float64())))


def _make_ppm(i: int, w: int = 8, h: int = 8) -> bytes:
    """Tiny deterministic P6 gradient image."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        (
            (x * 255 // max(w - 1, 1)).astype(np.uint8),
            (y * 255 // max(h - 1, 1)).astype(np.uint8),
            np.full((h, w), i % 256, dtype=np.uint8),
        ),
        axis=2,
    )
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _make_wav(i: int, n_samples: int = 800, rate: int = 8000) -> bytes:
    """Tiny deterministic PCM16 mono WAV (sine, frequency varies with i)."""
    import wave

    t = np.arange(n_samples) / rate
    freq = 220.0 + 55.0 * (i % 8)
    samples = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return bio.getvalue()


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table matching MEDIA_SCHEMA — REAL decodable
    payloads: P6 PPM images and PCM WAV audio; video stays opaque bytes."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            payload = _make_ppm(seed + i)
        elif kind == "audio":
            payload = _make_wav(seed + i)
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/x-portable-pixmap", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 8 if kind == "image" else -1,
                "height": 8 if kind == "image" else -1,
                "duration_ms": -1 if kind == "image" else 100 + i,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
