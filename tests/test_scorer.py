"""Scorer-stage tests: deterministic pseudo-model, actor-pool plumbing,
weighted-mean summary semantics (ST2/A3)."""

import pyarrow as pa
import pytest

import ray
import ray.data

from webscrape_neko_jirushi_ray.config import ScorerConfig
from webscrape_neko_jirushi_ray.stages.scorer import (
    PseudoCatScorer,
    detection_summary,
    score_images,
    split_by_detection,
)
from webscrape_neko_jirushi_ray.synth import synth_images


@pytest.fixture(scope="module")
def images():
    return synth_images(num_cats=12, images_per_cat=6, seed=23)


def test_scorer_class_smoke_and_determinism(images):
    # actor __init__ failures surface late — smoke the class directly
    s = PseudoCatScorer(ScorerConfig())
    out1 = s(images.slice(0, 20))
    out2 = s(images.slice(0, 20))
    assert out1.equals(out2)
    assert set(
        ["detections", "has_cat", "detection_count", "avg_confidence", "total_confidence"]
    ) <= set(out1.column_names)
    for row in out1.to_pylist():
        if row["detection_count"]:
            assert abs(
                row["avg_confidence"] - row["total_confidence"] / row["detection_count"]
            ) < 1e-12
            for d in row["detections"]:
                assert d["confidence"] >= 0.3
                assert len(d["bbox"]) == 4


def test_actor_pool_stage_matches_inline(ray_session, images):
    scored = score_images(
        ray.data.from_arrow(images), concurrency=2, batch_size=16
    )
    got = {
        r["img_url"]: (r["has_cat"], r["detection_count"], r["total_confidence"])
        for r in scored.take_all()
    }
    inline = PseudoCatScorer(ScorerConfig())(images)
    for r in inline.to_pylist():
        assert got[r["img_url"]] == (
            r["has_cat"], r["detection_count"], r["total_confidence"]
        )


def test_split_and_weighted_summary(ray_session, images):
    scored = score_images(ray.data.from_arrow(images), concurrency=2)
    valid, removed = split_by_detection(scored)
    n_valid, n_removed = valid.count(), removed.count()
    assert n_valid + n_removed == images.num_rows

    s = detection_summary(scored)
    assert s["total_images"] == images.num_rows
    assert s["images_with_cats"] == n_valid
    # weighted mean, NOT mean-of-averages (yolo_cat_detector.py:219-220)
    inline = PseudoCatScorer(ScorerConfig())(images).to_pylist()
    tot = sum(r["total_confidence"] for r in inline)
    cnt = sum(r["detection_count"] for r in inline)
    assert abs(s["avg_confidence"] - (tot / cnt if cnt else 0.0)) < 1e-9
