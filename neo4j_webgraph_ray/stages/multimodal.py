"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns next
to typed metadata (mime, width/height, sample rate...).  Decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages: codec state initialized once per actor, small batches (large
binary rows ⇒ keep ``batch_size`` low so batch × concurrency fits the
worker heap — SURVEY.md §4 memory-aware note).

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the actual byte→pixels/samples step is stubbed: ``DecodeStage`` raises
``NotImplementedError`` unless constructed with the deterministic fake
codec used by the tests.  Everything around the stub — schema handling,
actor signature, batch plumbing, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa
import ray.data

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synthesize_binary_items(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake binary payloads for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(64, 4096, size=n)]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(8, 64, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(8, 64, size=n).astype(np.int32)),
        }
    )


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: expands bytes to
    a (height, width, 3) uint8 array via a seeded hash stream."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class DecodeStage:
    """Actor-pool decode: bytes → pixel tensors (+ mean-color feature).

    Real deployments pass ``codec="pil"`` etc. and initialize the codec
    in ``__init__`` (once per actor); this container has no image libs,
    so only the deterministic ``codec="fake"`` path is available and
    anything else raises ``NotImplementedError`` at construction."""

    def __init__(self, codec: str = "fake", resize_to: tuple[int, int] | None = None):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} needs an image library not present in this "
                "environment; the 'fake' codec exercises the full pipeline"
            )
        self.codec = codec
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        means = np.zeros((len(payloads), 3), dtype=np.float64)
        out_w = np.zeros(len(payloads), dtype=np.int32)
        out_h = np.zeros(len(payloads), dtype=np.int32)
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            img = fake_decode(p, int(w), int(h))
            if self.resize_to is not None:
                th, tw = self.resize_to
                ys = np.linspace(0, img.shape[0] - 1, th).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, tw).astype(int)
                img = img[np.ix_(ys, xs)]
            means[i] = img.reshape(-1, 3).mean(axis=0)
            out_h[i], out_w[i] = img.shape[0], img.shape[1]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "out_width": pa.array(out_w),
                "out_height": pa.array(out_h),
                "mean_color": pa.FixedSizeListArray.from_arrays(
                    pa.array(means.ravel()), 3
                ),
            }
        )


def decode_features(
    items: ray.data.Dataset,
    codec: str = "fake",
    resize_to: tuple[int, int] | None = None,
    concurrency: int = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Decode + feature-extract as an actor pool.  ``batch_size`` is
    deliberately small: binary rows are large, and batch × concurrency
    must fit the worker heap."""
    return items.map_batches(
        DecodeStage,
        fn_constructor_kwargs=dict(codec=codec, resize_to=resize_to),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampleStage:
    """Video-style frame sampling over a binary payload: deterministic
    every-Nth-chunk selection (the real ffmpeg-backed version shares
    this exact signature and output layout)."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        ids = batch["item_id"].to_numpy(zero_copy_only=False)
        out_id, out_frame, out_chunk = [], [], []
        for i, p in enumerate(payloads):
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.stride):
                out_id.append(ids[i])
                out_frame.append(f)
                out_chunk.append(p[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "item_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "frame": pa.array(out_chunk, type=pa.binary()),
            }
        )


def sample_frames(
    items: ray.data.Dataset, frame_bytes: int = 256, stride: int = 4,
    concurrency: int = 2, batch_size: int = 16,
) -> ray.data.Dataset:
    return items.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(frame_bytes=frame_bytes, stride=stride),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
