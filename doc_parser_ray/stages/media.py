"""Multimodal stages: decode / feature-extract / resize / frame-sample
over opaque binary media columns, as actor-pool ``map_batches`` stages.

Shape mirrors the reference's model stages (docling BasePageModel:
state in ``__init__`` once per worker, per-batch work in ``__call__`` —
docling/models/base_model.py:21-27, the same shape its OCR/layout/table
models use), which drops directly into
``map_batches(Cls, concurrency=N, batch_size=B)``.

Codec reality: this container has no PIL/ffmpeg/librosa. Each stage
tries the real library in ``__init__`` (import-try); absent that it
uses the deterministic fake codec from sources/media_gen.py — the
payload bytes are genuinely parsed, so schemas, batch sizing, actor
signatures and output layout are exactly what the real stage needs.
A stage asked for a real-codec-only operation raises
``NotImplementedError`` (clearly marked) rather than faking silently.

Batch sizing: media batches are bounded by BYTES in practice — callers
should pass small ``batch_size`` (default 32) so batch x concurrency
fits the worker heap (SURVEY.md §7.4).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_HDR_IMG = b"FIMG"
_HDR_AUD = b"FAUD"
_HDR_VID = b"FVID"


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class MediaDecode:
    """payload bytes → typed metadata columns (width/height/sample_rate/
    n_frames/n_bytes, decode status). Actor-pool stage: the codec
    registry is built once per actor."""

    def __init__(self):
        self._pil = _try_import_pil()  # real codec when available

    def _decode_one(self, kind: str, payload: bytes) -> dict:
        meta = {"width": 0, "height": 0, "sample_rate": 0, "n_samples": 0,
                "n_frames": 0, "decode_status": "ok"}
        try:
            if payload[:4] == _HDR_IMG:
                w, h = struct.unpack("<II", payload[4:12])
                if len(payload) != 12 + w * h:
                    raise ValueError("truncated image payload")
                meta.update(width=w, height=h)
            elif payload[:4] == _HDR_AUD:
                rate, n = struct.unpack("<II", payload[4:12])
                if len(payload) != 12 + n:
                    raise ValueError("truncated audio payload")
                meta.update(sample_rate=rate, n_samples=n)
            elif payload[:4] == _HDR_VID:
                nf, fw, fh = struct.unpack("<III", payload[4:16])
                if len(payload) != 16 + nf * fw * fh:
                    raise ValueError("truncated video payload")
                meta.update(n_frames=nf, width=fw, height=fh)
            elif self._pil is not None and kind == "image":
                import io

                with self._pil.open(io.BytesIO(payload)) as im:
                    meta.update(width=im.width, height=im.height)
            else:
                # real codec path unavailable in this environment
                raise NotImplementedError(
                    f"no codec for kind={kind!r} (container has no "
                    "PIL/ffmpeg); payload is not in the fake format"
                )
        except NotImplementedError:
            raise
        except Exception as e:  # noqa: BLE001 — errors are data
            meta["decode_status"] = f"decode_error: {e}"
        return meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = [self._decode_one(k, p or b"") for k, p in zip(kinds, payloads)]
        out = batch.drop_columns(["payload"])  # metadata-only output
        out = out.append_column(
            "n_bytes", pa.array([len(p or b"") for p in payloads], pa.int64())
        )
        for name, typ in (
            ("width", pa.int32()), ("height", pa.int32()),
            ("sample_rate", pa.int32()), ("n_samples", pa.int32()),
            ("n_frames", pa.int32()),
        ):
            out = out.append_column(
                name, pa.array([m[name] for m in metas], typ)
            )
        return out.append_column(
            "decode_status",
            pa.array([m["decode_status"] for m in metas], pa.string()),
        )


class ImageResize:
    """Fake-format image resize (nearest-neighbor, vectorized numpy).
    Output payload stays in the fake format so stages compose."""

    def __init__(self, target_w: int, target_h: int):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out_payloads = []
        for p in payloads:
            if not p or p[:4] != _HDR_IMG:
                out_payloads.append(p or b"")
                continue
            w, h = struct.unpack("<II", p[4:12])
            px = np.frombuffer(p, dtype=np.uint8, offset=12).reshape(h, w)
            yi = (np.arange(self.th) * h // self.th)
            xi = (np.arange(self.tw) * w // self.tw)
            resized = px[np.ix_(yi, xi)]
            out_payloads.append(
                _HDR_IMG + struct.pack("<II", self.tw, self.th)
                + resized.tobytes()
            )
        return batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(out_payloads, pa.large_binary()),
        )


class MediaFeatures:
    """payload → fixed-width feature vector (byte histogram, L1-normed).
    The deterministic stand-in for model feature extraction; a real
    embedding model slots into the same actor signature (weights loaded
    here in __init__)."""

    def __init__(self, n_bins: int = 16):
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            body = np.frombuffer(p or b"\x00", dtype=np.uint8)
            hist, _ = np.histogram(body, bins=self.edges)
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float32))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        )


class FrameSample:
    """Every k-th frame of a fake-format video → one row per sampled
    frame, re-encoded as a fake image payload (flat-map shape: 1 video
    row → N image rows)."""

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_frame, o_payload = [], [], []
        for mid, p in zip(ids, payloads):
            if not p or p[:4] != _HDR_VID:
                continue
            nf, fw, fh = struct.unpack("<III", p[4:16])
            frames = np.frombuffer(p, dtype=np.uint8, offset=16).reshape(
                nf, fh * fw
            )
            for fi in range(0, nf, self.k):
                o_id.append(mid)
                o_frame.append(fi)
                o_payload.append(
                    _HDR_IMG + struct.pack("<II", fw, fh)
                    + frames[fi].tobytes()
                )
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_frame, pa.int32()),
                "payload": pa.array(o_payload, pa.large_binary()),
            }
        )


def decode_media(ds, *, batch_size: int = 32, concurrency=(1, 8),
                 num_cpus: float | None = None):
    return ds.map_batches(MediaDecode, batch_size=batch_size,
                          batch_format="pyarrow", concurrency=concurrency,
                          zero_copy_batch=True,
                          **({"num_cpus": num_cpus} if num_cpus else {}))


def media_features(ds, *, n_bins: int = 16, batch_size: int = 32,
                   concurrency=(1, 8), num_cpus: float | None = None):
    return ds.map_batches(MediaFeatures, fn_constructor_args=(n_bins,),
                          batch_size=batch_size, batch_format="pyarrow",
                          concurrency=concurrency, zero_copy_batch=True,
                          **({"num_cpus": num_cpus} if num_cpus else {}))


def resize_images(ds, target_w: int, target_h: int, *, batch_size: int = 32,
                  concurrency=(1, 8), num_cpus: float | None = None):
    return ds.map_batches(ImageResize,
                          fn_constructor_args=(target_w, target_h),
                          batch_size=batch_size, batch_format="pyarrow",
                          concurrency=concurrency, zero_copy_batch=True,
                          **({"num_cpus": num_cpus} if num_cpus else {}))


def sample_frames(ds, every_k: int = 4, *, batch_size: int = 16,
                  concurrency=(1, 8), num_cpus: float | None = None):
    return ds.map_batches(FrameSample, fn_constructor_args=(every_k,),
                          batch_size=batch_size, batch_format="pyarrow",
                          concurrency=concurrency, zero_copy_batch=True,
                          **({"num_cpus": num_cpus} if num_cpus else {}))
