"""Deterministic synthetic media payloads (opaque binary columns).

The container has no image/audio codecs (no PIL/ffmpeg), so media
payloads use a tiny self-describing fake format that the media stages
REALLY parse byte-for-byte — the Ray-side plumbing (binary columns,
actor-pool decode, batch sizing) is identical to what a real codec
stage needs; only the codec itself is swapped (stages/media.py gates
real codecs behind import-try).

Fake formats (all little-endian):
  image: b"FIMG" u32(width) u32(height)  + width*height pixel bytes,
         pixel[i] = (seed_id + i) % 256
  audio: b"FAUD" u32(sample_rate) u32(n_samples) + n_samples bytes
  video: b"FVID" u32(n_frames) u32(frame_w) u32(frame_h)
         + n_frames * frame_w * frame_h bytes

Dimensions are pure functions of the integer id, so an end-to-end SQL
oracle can recompute them WITHOUT parsing binary — decoding the bytes
must reproduce the formula:
  width  = 16 + (id % 32) * 8
  height = 16 + ((id * 7) % 32) * 8
  sample_rate = 8000 + (id % 4) * 4000 ; n_samples = 1000 + (id % 100) * 37
  n_frames = 4 + id % 28 ; frame = 32 x 24
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
    ]
)


def image_dims(media_id: int) -> tuple[int, int]:
    return 16 + (media_id % 32) * 8, 16 + ((media_id * 7) % 32) * 8


def audio_params(media_id: int) -> tuple[int, int]:
    return 8000 + (media_id % 4) * 4000, 1000 + (media_id % 100) * 37


def video_params(media_id: int) -> tuple[int, int, int]:
    return 4 + media_id % 28, 32, 24


def fake_image(media_id: int) -> bytes:
    w, h = image_dims(media_id)
    pixels = ((np.arange(w * h, dtype=np.int64) + media_id) % 256).astype(
        np.uint8
    )
    return b"FIMG" + struct.pack("<II", w, h) + pixels.tobytes()


def fake_audio(media_id: int) -> bytes:
    rate, n = audio_params(media_id)
    samples = ((np.arange(n, dtype=np.int64) * 31 + media_id) % 256).astype(
        np.uint8
    )
    return b"FAUD" + struct.pack("<II", rate, n) + samples.tobytes()


def fake_video(media_id: int) -> bytes:
    n_frames, fw, fh = video_params(media_id)
    frames = (
        (np.arange(n_frames * fw * fh, dtype=np.int64) + media_id) % 256
    ).astype(np.uint8)
    return b"FVID" + struct.pack("<III", n_frames, fw, fh) + frames.tobytes()


def media_batch(ids: list[int]) -> pa.Table:
    """One media row per id; kind cycles image/audio/video by id % 3."""
    kinds, mimes, payloads = [], [], []
    for i in ids:
        m = i % 3
        if m == 0:
            kinds.append("image")
            mimes.append("image/x-fake")
            payloads.append(fake_image(i))
        elif m == 1:
            kinds.append("audio")
            mimes.append("audio/x-fake")
            payloads.append(fake_audio(i))
        else:
            kinds.append("video")
            mimes.append("video/x-fake")
            payloads.append(fake_video(i))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_dataset(n: int):
    """Distributed deterministic media Dataset. Batches are kept SMALL
    (binary payloads: batch bytes, not batch rows, is the limit that
    matters — SURVEY.md §7.4 'giant rows')."""
    import ray.data

    return ray.data.range(n).map_batches(
        lambda b: media_batch([int(x) for x in b["id"]]),
        batch_size=64,
        batch_format="numpy",
    )
