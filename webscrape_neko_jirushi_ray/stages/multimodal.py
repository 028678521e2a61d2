"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages. The image/audio
decode libraries are NOT in this container (per the build brief), so the
decode kernels are STUBS — either the deterministic fake decoder
(``functions/imagekit.py`` for images) or a clearly-marked
NotImplementedError — while the Ray-side plumbing (schemas, batch sizing by
bytes, actor signatures, output layout) is real and tested.

Batch sizing: payload rows are wide, so stages here size batches by row
count chosen for ~64 MB of payload per batch at the expected media size —
at 100 TB the knob to tune is (batch_size x concurrency x payload) vs
worker heap (see ray_guide 'Memory-aware').
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import imagekit

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta_json", pa.string()),
    ]
)


class ImageDecodeStage:
    """Decode/feature-extract stage for image payloads. Uses the
    deterministic fake decoder; a real build passes a PIL/turbojpeg-backed
    ``decode_fn`` with the same dict contract."""

    def __init__(self, decode_fn=None):
        self.decode = decode_fn or imagekit.decode_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode(b) for b in batch["payload"].to_pylist()]
        out = batch
        for name, typ, key in (
            ("valid", pa.bool_(), "valid"),
            ("width", pa.int32(), "width"),
            ("height", pa.int32(), "height"),
            ("mode", pa.string(), "mode"),
        ):
            out = out.append_column(name, pa.array([f[key] for f in feats], type=typ))
        return out


class ImageResizeStage:
    """Resize plumbing: emits target dims + a deterministic pseudo-thumbnail
    (hash of payload + dims) so downstream schemas/tests are real.

    STUB: a real implementation decodes and resamples here."""

    def __init__(self, target_w: int = 224, target_h: int = 224):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = [
            hashlib.sha256(
                (b or b"") + self.tw.to_bytes(4, "little") + self.th.to_bytes(4, "little")
            ).digest()
            for b in batch["payload"].to_pylist()
        ]
        out = batch.append_column(
            "thumb", pa.array(thumbs, type=pa.binary())
        )
        out = out.append_column(
            "thumb_w", pa.array([self.tw] * batch.num_rows, type=pa.int32())
        )
        return out.append_column(
            "thumb_h", pa.array([self.th] * batch.num_rows, type=pa.int32())
        )


class AudioFeatureStage:
    """Audio feature-extraction plumbing. STUB decode: raises
    NotImplementedError unless a ``decode_fn(payload)->np.ndarray`` is
    injected; with the default ``deterministic=True`` it emits a seeded
    fake waveform so the downstream schema is exercised."""

    def __init__(self, decode_fn=None, deterministic: bool = True, sr: int = 16000):
        self.decode_fn = decode_fn
        self.deterministic = deterministic
        self.sr = sr

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decode_fn is not None:
            return self.decode_fn(payload)
        if not self.deterministic:
            raise NotImplementedError(
                "no audio codec in this container — inject decode_fn"
            )
        seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:4], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.sr // 10)  # 100ms fake waveform

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for b in batch["payload"].to_pylist():
            wav = self._decode(b)
            feats.append(
                [float(np.mean(wav)), float(np.std(wav)), float(np.abs(wav).max())]
            )
        return batch.append_column(
            "audio_feats", pa.array(feats, type=pa.list_(pa.float64()))
        )


class VideoFrameSampleStage:
    """Frame-sampling plumbing: emits deterministic frame indices for a
    target fps given meta_json duration. STUB decode (no codecs)."""

    def __init__(self, every_n_seconds: float = 1.0):
        self.step = every_n_seconds

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        idx_lists = []
        for meta in batch["meta_json"].to_pylist():
            m = json.loads(meta or "{}")
            dur = float(m.get("duration_s", 0.0))
            fps = float(m.get("fps", 30.0))
            ts = np.arange(0.0, dur, self.step)
            idx_lists.append([int(round(t * fps)) for t in ts])
        return batch.append_column(
            "frame_indices", pa.array(idx_lists, type=pa.list_(pa.int64()))
        )


def decode_images(media: "ray.data.Dataset", concurrency: int = 2,
                  batch_size: int = 64) -> "ray.data.Dataset":
    return media.map_batches(
        ImageDecodeStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
