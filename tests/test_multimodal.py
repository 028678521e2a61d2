"""Multimodal plumbing tests: schemas, actor stages, stub decode paths."""

import json

import pyarrow as pa
import pytest

import ray
import ray.data

from webscrape_neko_jirushi_ray.functions import imagekit
from webscrape_neko_jirushi_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    decode_images,
)


def media_table() -> pa.Table:
    payloads = [
        imagekit.encode_fake_image(640, 480, target_size=5000, payload_seed=b"a"),
        imagekit.encode_fake_image(100, 100, target_size=2000, payload_seed=b"b"),
        b"NOTANIMAGE",
    ]
    return pa.table(
        {
            "media_id": pa.array(["m1", "m2", "m3"], type=pa.string()),
            "kind": pa.array(["image"] * 3, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/x-neko"] * 3, type=pa.string()),
            "meta_json": pa.array(
                [json.dumps({"duration_s": 2.5, "fps": 30.0})] * 3, type=pa.string()
            ),
        }
    )


def test_image_decode_stage(ray_session):
    out = decode_images(ray.data.from_arrow(media_table()), concurrency=2).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m1"]["valid"] and by_id["m1"]["width"] == 640
    assert not by_id["m3"]["valid"]


def test_resize_stage_deterministic():
    s = ImageResizeStage(64, 64)
    t = media_table()
    a, b = s(t), s(t)
    assert a["thumb"].to_pylist() == b["thumb"].to_pylist()
    assert a["thumb_w"].to_pylist() == [64, 64, 64]


def test_audio_stage_stub_and_injection():
    s = AudioFeatureStage(deterministic=True)
    out = s(media_table())
    assert all(len(f) == 3 for f in out["audio_feats"].to_pylist())
    strict = AudioFeatureStage(deterministic=False)
    with pytest.raises(NotImplementedError):
        strict._decode(b"xx")


def test_video_frame_sampling():
    out = VideoFrameSampleStage(every_n_seconds=1.0)(media_table())
    assert out["frame_indices"].to_pylist()[0] == [0, 30, 60]
