"""Reorganize stage: grouped renumbering into the uniform ML layout.

Rebuild of /root/reference/reorganize_dataset.py: name coalesce (M8,
:37-57), filename sanitize (M7, :59-70), the docs↔images join (J2,
:117-161) and the global ``cat_0001…`` / per-cat ``image_001…`` dense
enumeration (O3/ST6, :85-108).

The reference's enumeration order is filesystem-iteration order — pinned
here to lexicographic ``cat_id`` (global) and ``(seq)`` (within cat), per
SURVEY.md O3 ("ordering contract must be pinned").

Scale notes: the global enumeration is over DISTINCT cat ids (one row per
group — orders of magnitude smaller than the images table), sorted and
broadcast back as a lookup; at 10^10-image scale with >10^8 groups this
becomes a range-partitioned offset enumeration, same contract.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

from ..config import NAME_COALESCE_FIELDS

_SANITIZE_DROP = re.compile(r"[^\w\s-]")
_SANITIZE_COLLAPSE = re.compile(r"[-\s]+")


def sanitize_name(name: str) -> str:
    """reorganize_dataset.py:59-70: drop non-word chars, collapse dashes/
    whitespace to '_', trim '_', cap at 50 chars, fallback 'unknown_cat'."""
    cleaned = _SANITIZE_DROP.sub("", name or "")
    cleaned = _SANITIZE_COLLAPSE.sub("_", cleaned)
    cleaned = cleaned.strip("_")
    if len(cleaned) > 50:
        cleaned = cleaned[:50]
    return cleaned or "unknown_cat"


def coalesce_display_name(row: dict) -> str:
    """reorganize_dataset.py:37-57: first non-empty of name, cat_name,
    title, catch_copy → else cat_<id> → else unknown_cat."""
    for f in NAME_COALESCE_FIELDS:
        v = row.get(f)
        if v:
            return str(v).strip()
    if row.get("cat_id"):
        return f"cat_{row['cat_id']}"
    return "unknown_cat"


def add_clean_names(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """docs → + display_name, clean_name columns (M7+M8 vectorized)."""

    def _names(batch: pa.Table) -> pa.Table:
        rows = batch.select(
            [c for c in ("name", "cat_id") if c in batch.column_names]
        ).to_pylist()
        disp = [coalesce_display_name(r) for r in rows]
        clean = [sanitize_name(d) for d in disp]
        out = batch.append_column("display_name", pa.array(disp, type=pa.string()))
        return out.append_column("clean_name", pa.array(clean, type=pa.string()))

    return docs.map_batches(_names, batch_format="pyarrow")


def enumerate_cats(docs: "ray.data.Dataset") -> dict[str, int]:
    """Global dense index per cat_id in lexicographic order (O3).

    The distinct-id table is tiny (one row per group); pulled sorted to the
    driver and enumerated. Returns {cat_id: 1-based index}."""
    distinct = docs.select_columns(["cat_id"]).groupby("cat_id").count().to_pandas()
    cat_ids = sorted(i for i in distinct["cat_id"].tolist() if i)
    return {cid: i + 1 for i, cid in enumerate(cat_ids)}


def reorganize(
    docs: "ray.data.Dataset", images: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """J2+O3: join images to docs' clean names by cat_id (broadcast — the
    docs side is one row per cat after projection) and emit the final
    layout columns: group_dir = 'cat_{idx:04d}_{clean_name}', new_filename
    = 'image_{rank:03d}.{ext}' with rank = per-cat order by (seq)."""
    named = add_clean_names(docs)
    name_map_tbl = named.select_columns(["cat_id", "clean_name"]).to_pandas()
    name_map = dict(
        name_map_tbl.drop_duplicates("cat_id")[["cat_id", "clean_name"]].values
    )
    index_map = enumerate_cats(named)
    maps_ref = ray.put((name_map, index_map))

    def _label(group: pa.Table) -> pa.Table:
        name_map_l, index_map_l = ray.get(maps_ref)
        g = group.sort_by([("seq", "ascending"), ("img_url", "ascending")])
        cid = g["cat_id"][0].as_py()
        idx = index_map_l.get(cid)
        clean = name_map_l.get(cid, "unknown_cat")
        if idx is None:  # images with no matching doc keep a sentinel group
            gdir = f"cat_unmatched_{cid}"
        else:
            gdir = f"cat_{idx:04d}_{clean}"
        exts = [
            (u.rsplit(".", 1)[-1].lower() if "." in u.rsplit("/", 1)[-1] else "jpg")
            for u in g["img_url"].to_pylist()
        ]
        fnames = [
            f"image_{i + 1:03d}.{e if e in ('jpg', 'jpeg', 'png', 'gif', 'bmp', 'webp') else 'jpg'}"
            for i, e in enumerate(exts)
        ]
        out = g.append_column("group_dir", pa.array([gdir] * g.num_rows, type=pa.string()))
        return out.append_column("new_filename", pa.array(fnames, type=pa.string()))

    return images.groupby("cat_id").map_groups(_label, batch_format="pyarrow")
