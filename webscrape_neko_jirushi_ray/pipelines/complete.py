"""The end-to-end pipeline: crawl → harvest → clean → score → reorganize.

Rebuild of /root/reference/complete_pipeline.py (§3.1): the reference
chains three subprocesses whose only IR is the filesystem; here each step
is a ``Dataset -> Dataset`` function and the cross-step IR is an
Arrow-schema'd parquet directory per stage (stage outputs double as
checkpoints). The final report mirrors the reference's
``pipeline_completion_report.json`` counters (complete_pipeline.py:134-202).

The image *bytes* stage is synthetic (no network in this sandbox): the
harvested image URLs are joined against a deterministic byte corpus
generated from the URL (the S2-style "fetch is a join" realization for
images). Swapping in real bytes = replacing ``synth_image_bytes_for``.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

import ray
import ray.data

from ..config import CrawlConfig, DEFAULT_SCORER
from ..stages.cleaning import (
    advanced_cleaning_pipeline,
    aggressive_cleaning_pipeline,
    removal_stats,
)
from ..stages.extract import explode_images
from ..stages.reorganize import reorganize
from ..stages.scorer import detection_summary, score_images, split_by_detection
from ..functions import imagekit
from .crawl import crawl


def synth_image_bytes_for(img_url: str) -> bytes:
    """Deterministic stand-in for the image GET (comprehensive_scraper.py:
    226-247): bytes are a pure function of the URL, so the whole pipeline
    is reproducible."""
    h = hashlib.sha256(img_url.encode()).digest()
    case = h[6] % 12
    if case == 0:    # suspicious exact byte size (F3 blacklist)
        return imagekit.encode_fake_image(
            300, 300, target_size=6490, payload_seed=img_url.encode()
        )
    if case == 1:    # tiny dimensions (F4)
        return imagekit.encode_fake_image(
            60, 60, target_size=12_000, payload_seed=img_url.encode()
        )
    if case == 2:    # mostly-transparent RGBA (F5)
        return imagekit.encode_fake_image(
            600, 600, mode="RGBA", alpha_max=8, target_size=15_000,
            payload_seed=img_url.encode(),
        )
    if case == 3:    # uniform color (F6)
        return imagekit.encode_fake_image(
            500, 500, top_color_frac=0.95, target_size=15_000,
            payload_seed=img_url.encode(),
        )
    if case == 4:    # corrupt blob (F1)
        return b"CORRUPT" + h
    width = 200 + h[0] * 8          # 200..2240
    height = 200 + h[1] * 8
    size = 8_000 + int.from_bytes(h[2:4], "little") % 120_000
    return imagekit.encode_fake_image(
        width, height,
        top_color_frac=h[4] / 255.0 * 0.6,
        warm_ratio=h[5] / 255.0,
        target_size=size,
        payload_seed=img_url.encode(),
    )


def attach_image_bytes(img_rows: "ray.data.Dataset") -> "ray.data.Dataset":
    """img rows (url, cat_id, img_url, seq) → + bytes, size, md5."""

    def _fetch(batch: pa.Table) -> pa.Table:
        blobs = [synth_image_bytes_for(u) for u in batch["img_url"].to_pylist()]
        out = batch.append_column("bytes", pa.array(blobs, type=pa.binary()))
        out = out.append_column(
            "size", pa.array([len(b) for b in blobs], type=pa.int64())
        )
        return out.append_column(
            "md5", pa.array([hashlib.md5(b).digest() for b in blobs], type=pa.binary())
        )

    return img_rows.map_batches(_fetch, batch_format="pyarrow", batch_size=512)


def run_complete_pipeline(
    page_store,
    seeds: list[str],
    out_dir: str,
    crawl_cfg: CrawlConfig = CrawlConfig(),
) -> dict:
    """Returns the completion report; writes per-stage parquet under
    ``out_dir`` (crawl rounds, images, kept/quarantined, final layout)."""
    # step 1: crawl (scrape analog)
    res = crawl(page_store, seeds, os.path.join(out_dir, "crawl"), crawl_cfg)
    docs = ray.data.read_parquet(res.nonempty_docs_paths())

    # step 2: harvest image rows + attach (synthetic) bytes
    img_rows = explode_images(docs)
    images = attach_image_bytes(img_rows)

    # step 3: cleaning chain (advanced → aggressive, quarantine preserved)
    kept_adv, quar_adv = advanced_cleaning_pipeline(images)
    kept_aggr, quar_aggr = aggressive_cleaning_pipeline(kept_adv)

    # step 4: model scoring (pseudo-YOLO actor stage)
    scored = score_images(kept_aggr, DEFAULT_SCORER, concurrency=2)
    valid, removed = split_by_detection(scored)
    summary = detection_summary(scored)

    # step 5: reorganize into the uniform ML layout
    final = reorganize(docs, valid)
    final_dir = os.path.join(out_dir, "final")
    # hive-partition by group dir: the parquet analog of the reference's
    # cat_0001_<name>/ directory layout (reorganize_dataset.py:85-108),
    # and the resumable-output unit (skip finished partitions on rerun)
    final.write_parquet(final_dir, partition_cols=["group_dir"])

    # report (complete_pipeline.py:134-202 shape)
    n_docs = docs.count()
    report = {
        "pages_visited": int(res.visits.num_rows),
        "docs_extracted": int(n_docs),
        "images_harvested": int(images.count()),
        "after_advanced": int(kept_adv.count()),
        "after_aggressive": int(kept_aggr.count()),
        "after_scoring": int(valid.count()),
        "removal_reasons_advanced": removal_stats(quar_adv).to_pydict(),
        "removal_reasons_aggressive": removal_stats(quar_aggr).to_pydict(),
        "detection_summary": summary,
        "final_dir": final_dir,
    }
    with open(os.path.join(out_dir, "pipeline_completion_report.json"), "w",
              encoding="utf-8") as f:
        json.dump(report, f, ensure_ascii=False, indent=1)
    return report
