"""Multimodal stage tests: fake-codec decode, resize, frame-sampling,
feature extraction — the Ray-side plumbing (binary columns, actor
pools, flat-map shapes) is real; only the codec is the deterministic
fake (stages/media.py docstring)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from doc_parser_ray.sources.media_gen import (
    audio_params,
    fake_audio,
    fake_image,
    fake_video,
    image_dims,
    media_batch,
    video_params,
)
from doc_parser_ray.stages.media import (
    FrameSample,
    ImageResize,
    MediaDecode,
    MediaFeatures,
)


class TestDecode:
    def test_image_roundtrip(self):
        batch = media_batch([0, 3, 6])  # all images
        out = MediaDecode()(batch)
        for mid, w, h, nb in zip(
            out.column("media_id").to_pylist(),
            out.column("width").to_pylist(),
            out.column("height").to_pylist(),
            out.column("n_bytes").to_pylist(),
        ):
            ew, eh = image_dims(mid)
            assert (w, h) == (ew, eh)
            assert nb == 12 + ew * eh

    def test_audio_video_roundtrip(self):
        batch = media_batch([1, 2, 4, 5])
        out = MediaDecode()(batch)
        rows = out.to_pylist()
        for r in rows:
            if r["kind"] == "audio":
                rate, n = audio_params(r["media_id"])
                assert (r["sample_rate"], r["n_samples"]) == (rate, n)
            else:
                nf, fw, fh = video_params(r["media_id"])
                assert (r["n_frames"], r["width"], r["height"]) == (nf, fw, fh)
        assert all(r["decode_status"] == "ok" for r in rows)

    def test_truncated_payload_is_error_row(self):
        batch = pa.table(
            {
                "media_id": pa.array([9], pa.int64()),
                "kind": pa.array(["image"]),
                "mime": pa.array(["image/x-fake"]),
                "payload": pa.array([fake_image(9)[:-5]], pa.large_binary()),
            }
        )
        out = MediaDecode()(batch)
        assert out.column("decode_status").to_pylist()[0].startswith(
            "decode_error"
        )

    def test_unknown_format_raises_not_implemented(self):
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "kind": pa.array(["image"]),
                "mime": pa.array(["image/png"]),
                "payload": pa.array([b"\x89PNG\r\n"], pa.large_binary()),
            }
        )
        dec = MediaDecode()
        if dec._pil is None:
            with pytest.raises(NotImplementedError):
                dec(batch)


class TestResizeSampleFeatures:
    def test_resize_dims_and_content(self):
        batch = media_batch([0])
        out = ImageResize(8, 8)(batch)
        p = out.column("payload").to_pylist()[0]
        assert p[:4] == b"FIMG"
        assert struct.unpack("<II", p[4:12]) == (8, 8)
        assert len(p) == 12 + 64
        # nearest-neighbor: every output pixel exists in the source
        src = np.frombuffer(fake_image(0), dtype=np.uint8, offset=12)
        dst = np.frombuffer(p, dtype=np.uint8, offset=12)
        assert set(dst.tolist()) <= set(src.tolist())

    def test_frame_sample_flat_map(self):
        mid = 2  # video
        batch = media_batch([mid])
        out = FrameSample(every_k=3)(batch)
        nf, fw, fh = video_params(mid)
        expect = len(range(0, nf, 3))
        assert out.num_rows == expect
        assert out.column("frame_idx").to_pylist() == list(range(0, nf, 3))
        p0 = out.column("payload").to_pylist()[0]
        assert p0[:4] == b"FIMG"
        assert struct.unpack("<II", p0[4:12]) == (fw, fh)
        # frame 0 bytes == first fw*fh bytes of the video body
        vid = fake_video(mid)
        assert p0[12:] == vid[16:16 + fw * fh]

    def test_features_histogram(self):
        batch = media_batch([1])  # audio
        out = MediaFeatures(n_bins=8)(batch)
        f = out.column("features").to_pylist()[0]
        assert len(f) == 8
        assert abs(sum(f) - 1.0) < 1e-5

    def test_audio_passthrough_resize(self):
        batch = media_batch([1])
        out = ImageResize(8, 8)(batch)
        assert out.column("payload").to_pylist()[0] == fake_audio(1)


@pytest.mark.usefixtures("ray_session")
class TestMediaPipeline:
    def test_distributed_decode_matches_formulas(self):
        from doc_parser_ray.sources.media_gen import media_dataset
        from doc_parser_ray.stages.media import decode_media
        from doc_parser_ray.util import collect_table

        out = collect_table(
            decode_media(media_dataset(90), batch_size=32, concurrency=(1, 2))
        )
        assert out.num_rows == 90
        df = out.to_pandas().set_index("media_id").sort_index()
        for mid in (0, 30, 60):
            w, h = image_dims(mid)
            assert df.loc[mid, "width"] == w and df.loc[mid, "height"] == h
        assert (df["decode_status"] == "ok").all()
