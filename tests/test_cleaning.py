"""Cleaning-stage tests: Ray pipelines vs the row-wise cleaning oracle,
keep-first dedup semantics, per-reason/per-cat stats (F1-F7, D2, A1/A2)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray
import ray.data

from webscrape_neko_jirushi_ray.config import (
    DEFAULT_ADVANCED,
    DEFAULT_AGGRESSIVE,
    DEFAULT_HEURISTIC,
)
from webscrape_neko_jirushi_ray.stages.cleaning import (
    advanced_cleaning_pipeline,
    aggressive_cleaning_pipeline,
    dedup_exact_md5,
    heuristic_keep,
    per_cat_stats,
    removal_stats,
    with_features,
)
from webscrape_neko_jirushi_ray.synth import synth_images

from . import oracle_cleaning


@pytest.fixture(scope="module")
def images():
    return synth_images(num_cats=30, images_per_cat=10, seed=17)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()], promote_options="default"
    )


def test_advanced_matches_oracle(ray_session, images):
    kept, quarantined = advanced_cleaning_pipeline(ray.data.from_arrow(images))
    got = _collect(kept.select_columns(["img_url"]))
    got_kept = set(got["img_url"].to_pylist())
    want_kept = {
        r["img_url"]
        for r in images.to_pylist()
        if oracle_cleaning.advanced_reason(r, DEFAULT_ADVANCED) == ""
    }
    assert got_kept == want_kept
    # reasons agree too
    q = _collect(quarantined.select_columns(["img_url", "removal_reason"]))
    for r in images.to_pylist():
        want = oracle_cleaning.advanced_reason(r, DEFAULT_ADVANCED)
        if want:
            idx = q["img_url"].to_pylist().index(r["img_url"])
            assert q["removal_reason"][idx].as_py() == want, r["img_url"]


def test_aggressive_matches_oracle_after_dedup(ray_session, images):
    kept, quarantined = aggressive_cleaning_pipeline(ray.data.from_arrow(images))
    got_kept = set(_collect(kept.select_columns(["img_url"]))["img_url"].to_pylist())

    # oracle: dedup keep-first by (cat_id, seq) then row-wise reasons
    best: dict[bytes, dict] = {}
    for r in images.to_pylist():
        k = r["md5"]
        if k not in best or (r["cat_id"], r["seq"]) < (best[k]["cat_id"], best[k]["seq"]):
            best[k] = r
    want_kept = {
        r["img_url"]
        for r in best.values()
        if oracle_cleaning.aggressive_reason(r, DEFAULT_AGGRESSIVE) == ""
    }
    assert got_kept == want_kept


def test_heuristic_matches_oracle(ray_session, images):
    feats = with_features(ray.data.from_arrow(images))
    out = _collect(
        feats.map_batches(
            lambda b: heuristic_keep(b, DEFAULT_HEURISTIC), batch_format="pyarrow"
        ).select_columns(["img_url", "keep", "cat_score"])
    )
    got = dict(zip(out["img_url"].to_pylist(), out["keep"].to_pylist()))
    for r in images.to_pylist():
        assert got[r["img_url"]] == oracle_cleaning.heuristic_keep(
            r, DEFAULT_HEURISTIC
        ), r["img_url"]


def test_dedup_keeps_exactly_one_per_hash(ray_session, images):
    deduped = _collect(dedup_exact_md5(ray.data.from_arrow(images)))
    md5s = deduped["md5"].to_pylist()
    assert len(md5s) == len(set(md5s))
    assert len(set(md5s)) == len(set(images["md5"].to_pylist()))
    # keep-first: the survivor of each dup group is the (cat_id, seq)-min
    by_hash: dict[bytes, list[dict]] = {}
    for r in images.to_pylist():
        by_hash.setdefault(r["md5"], []).append(r)
    surv = {r["md5"]: r["img_url"] for r in deduped.to_pylist()}
    for k, rows in by_hash.items():
        want = min(rows, key=lambda r: (r["cat_id"], r["seq"]))["img_url"]
        assert surv[k] == want


def test_dedup_bounded_driver(ray_session, monkeypatch):
    """Scale invariant for D2 (VERDICT r2 #1): dedup_exact_md5 must never
    pull or broadcast an O(corpus) winner table through the driver. A
    120k-row corpus with 3x planted duplication runs through the dedup
    with every driver-side ``pa.concat_tables`` / ``Dataset.to_pandas``
    instrumented; the largest must stay control-plane sized (the round-2
    implementation pulled the full 40k-row winner table to the driver)."""
    import hashlib

    import numpy as np
    import ray.data as _rd
    from ray.data.aggregate import Max, Sum

    n = 120_000
    groups = 40_000  # 3 rows per md5 group; winner is the seq==0 row
    chunk = 20_000
    parts = []
    for c in range(0, n, chunk):
        idx = np.arange(c, c + chunk)
        gid = idx % groups
        md5 = [hashlib.md5(b"g%d" % g).digest() for g in gid]
        parts.append(
            pa.table(
                {
                    "md5": pa.array(md5, type=pa.binary()),
                    "cat_id": pa.array([f"cat{int(g) % 97:05d}" for g in gid]),
                    "seq": pa.array((idx // groups).astype(np.int64)),
                    "img_url": pa.array(
                        [f"https://x.test/i/{int(i)}.jpg" for i in idx]
                    ),
                }
            )
        )
    ds = _rd.from_arrow(parts)

    seen_sizes = {"concat_rows": 0, "to_pandas_rows": 0}
    real_concat = pa.concat_tables

    def spy_concat(tables, *a, **kw):
        out = real_concat(tables, *a, **kw)
        seen_sizes["concat_rows"] = max(seen_sizes["concat_rows"], out.num_rows)
        return out

    real_to_pandas = _rd.Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        out = real_to_pandas(self, *a, **kw)
        seen_sizes["to_pandas_rows"] = max(seen_sizes["to_pandas_rows"], len(out))
        return out

    monkeypatch.setattr(pa, "concat_tables", spy_concat)
    monkeypatch.setattr(_rd.Dataset, "to_pandas", spy_to_pandas)

    out = dedup_exact_md5(ds).materialize()
    assert out.count() == groups
    # keep-first correctness without a driver pull: every survivor is its
    # group's min-(cat_id, seq) row, i.e. seq == 0 across the board
    agg = out.aggregate(Sum("seq", alias_name="s"), Max("seq", alias_name="m"))
    assert agg["s"] == 0 and agg["m"] == 0, agg
    # the scale invariant: nothing corpus-sized crossed the driver
    assert seen_sizes["concat_rows"] < n // 10, seen_sizes
    assert seen_sizes["to_pandas_rows"] < n // 10, seen_sizes


def test_stats_reconcile(ray_session, images):
    ds = ray.data.from_arrow(images)
    kept, quarantined = advanced_cleaning_pipeline(ds)
    reasons = removal_stats(quarantined).to_pydict()
    n_removed = sum(reasons["count()"])
    assert n_removed + kept.count() == images.num_rows
    pc_stats = per_cat_stats(ds, kept)
    df = pc_stats.to_pandas()
    assert df["images_before"].sum() == images.num_rows
    assert (df["images_before"] - df["images_after"] == df["images_removed"]).all()
