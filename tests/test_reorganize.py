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


def test_reorganize_bounded_driver_and_route_parity(ray_session, monkeypatch):
    """Scale invariant for J2+O3 (VERDICT r3 #1): reorganize must never
    build an O(cats) python dict on the driver or broadcast a full name
    map. 120k cats run through the forced hash-join route with every
    driver-side ``pa.concat_tables`` / ``Dataset.to_pandas`` instrumented;
    the largest must stay control-plane sized. The hash route's labels
    must equal the broadcast route's on a small fixture (route parity)."""
    import numpy as np
    import ray.data as _rd

    # --- route parity on a small fixture ---------------------------------
    images_small = synth_images(num_cats=6, images_per_cat=3, seed=7)
    cat_ids = sorted(set(images_small["cat_id"].to_pylist()))
    docs_small = pa.table(
        {
            "cat_id": pa.array(cat_ids, type=pa.string()),
            "name": pa.array([f"Neko {c}" for c in cat_ids], type=pa.string()),
        }
    )
    want = sorted(
        (r["img_url"], r["group_dir"], r["new_filename"])
        for r in reorganize(
            ray.data.from_arrow(docs_small), ray.data.from_arrow(images_small)
        ).take_all()
    )
    got = sorted(
        (r["img_url"], r["group_dir"], r["new_filename"])
        for r in reorganize(
            ray.data.from_arrow(docs_small),
            ray.data.from_arrow(images_small),
            broadcast_threshold=0,  # force the hash-join scale route
        ).take_all()
    )
    assert got == want

    # --- bounded driver at 120k cats --------------------------------------
    n_cats = 120_000
    chunk = 30_000
    doc_parts, img_parts = [], []
    for c in range(0, n_cats, chunk):
        cids = [f"c{int(i):07d}" for i in range(c, c + chunk)]
        doc_parts.append(
            pa.table(
                {
                    "cat_id": pa.array(cids, pa.string()),
                    "name": pa.array([f"Neko {c}" for c in cids], pa.string()),
                }
            )
        )
        img_parts.append(
            pa.table(
                {
                    "cat_id": pa.array(cids, pa.string()),
                    "seq": pa.array(np.zeros(chunk, dtype=np.int64)),
                    "img_url": pa.array(
                        [f"https://x.test/{c}/a.jpg" for c in cids], pa.string()
                    ),
                }
            )
        )
    docs = _rd.from_arrow(doc_parts)
    images = _rd.from_arrow(img_parts)

    seen = {"concat_rows": 0, "to_pandas_rows": 0}
    real_concat = pa.concat_tables

    def spy_concat(tables, *a, **kw):
        out = real_concat(tables, *a, **kw)
        seen["concat_rows"] = max(seen["concat_rows"], out.num_rows)
        return out

    real_to_pandas = _rd.Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        out = real_to_pandas(self, *a, **kw)
        seen["to_pandas_rows"] = max(seen["to_pandas_rows"], len(out))
        return out

    monkeypatch.setattr(pa, "concat_tables", spy_concat)
    monkeypatch.setattr(_rd.Dataset, "to_pandas", spy_to_pandas)

    out = reorganize(docs, images, broadcast_threshold=0).materialize()
    assert out.count() == n_cats
    # spot-check the dense global enumeration without a driver pull:
    # c0000000 is rank 1, the last cat is rank n_cats
    first = out.filter(expr='cat_id == "c0000000"').take_all()[0]
    assert first["group_dir"] == "cat_0001_Neko_c0000000"
    assert first["new_filename"] == "image_001.jpg"
    last = out.filter(expr=f'cat_id == "c{n_cats - 1:07d}"').take_all()[0]
    assert last["group_dir"] == f"cat_{n_cats:04d}_Neko_c{n_cats - 1:07d}"
    # the scale invariant: nothing cats-sized crossed the driver
    assert seen["concat_rows"] < n_cats // 10, seen
    assert seen["to_pandas_rows"] < n_cats // 10, seen
