"""Reorganize-stage tests: sanitize/coalesce kernels and the pinned
enumeration contract (M7/M8/O3/J2)."""

import pyarrow as pa
import pytest

import ray
import ray.data

from webscrape_neko_jirushi_ray.stages.reorganize import (
    coalesce_display_name,
    enumerate_cats,
    reorganize,
    sanitize_name,
)
from webscrape_neko_jirushi_ray.synth import synth_images


def test_sanitize_matches_reference_semantics():
    # reorganize_dataset.py:59-70
    assert sanitize_name("Tama-chan the 3rd!") == "Tama_chan_the_3rd"
    assert sanitize_name("  --  ") == "unknown_cat"
    assert sanitize_name("") == "unknown_cat"
    assert sanitize_name("ミケ（仮）") == "ミケ仮"  # \w keeps unicode letters
    long = "a" * 80
    assert sanitize_name(long) == "a" * 50


def test_coalesce_order():
    # reorganize_dataset.py:37-57
    assert coalesce_display_name({"name": "", "cat_name": "B", "title": "C"}) == "B"
    assert coalesce_display_name({"title": " C "}) == "C"
    assert coalesce_display_name({"catch_copy": "D"}) == "D"
    assert coalesce_display_name({"cat_id": "9"}) == "cat_9"
    assert coalesce_display_name({}) == "unknown_cat"


def test_reorganize_enumeration(ray_session):
    images = synth_images(num_cats=8, images_per_cat=4, seed=31)
    cat_ids = sorted(set(images["cat_id"].to_pylist()))
    docs = pa.table(
        {
            "cat_id": pa.array(cat_ids, type=pa.string()),
            "name": pa.array([f"Neko {c}" for c in cat_ids], type=pa.string()),
        }
    )
    out = reorganize(ray.data.from_arrow(docs), ray.data.from_arrow(images))
    rows = out.take_all()
    # global enumeration: cat_0001.. in lexicographic cat_id order
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["cat_id"], []).append(r)
    for i, cid in enumerate(cat_ids):
        grp = by_cat[cid]
        assert all(r["group_dir"] == f"cat_{i + 1:04d}_Neko_{cid}" for r in grp)
        fnames = sorted(r["new_filename"] for r in grp)
        assert fnames[0].startswith("image_001.")
        assert len(fnames) == len(set(fnames))
        # dense within-group enumeration 1..n
        nums = sorted(int(f.split("_")[1].split(".")[0]) for f in fnames)
        assert nums == list(range(1, len(grp) + 1))
