"""Row-wise reference-semantics oracle for the cleaning decisions.

Sequential reimplementation of the decision functions in
/root/reference/advanced_cleaning.py:131-147, aggressive_cleaning.py:146-171
and cleanup_dataset.py:159-190, operating on decoded feature dicts. The Ray
pipelines must agree row-for-row.
"""

from __future__ import annotations

from webscrape_neko_jirushi_ray.config import (
    AdvancedCleaningConfig,
    AggressiveCleaningConfig,
    HeuristicCleanupConfig,
)
from webscrape_neko_jirushi_ray.functions.imagekit import decode_features


def advanced_reason(row: dict, cfg: AdvancedCleaningConfig) -> str:
    size = row["size"]
    fname = row["img_url"].rsplit("/", 1)[-1].lower()
    if size in cfg.suspicious_sizes or size < cfg.min_file_size or size > cfg.max_file_size:
        return "file_size"
    if any(p in fname for p in cfg.non_cat_patterns):
        return "pattern"
    f = decode_features(row["bytes"])
    if not f["valid"]:
        return "corrupted"
    w, h = f["width"], f["height"]
    if w < cfg.min_width or h < cfg.min_height:
        return "dimension"
    if w > cfg.max_width or h > cfg.max_height:
        return "dimension"
    aspect = w / h if h else 0.0
    if aspect < cfg.min_aspect_ratio or aspect > cfg.max_aspect_ratio:
        return "dimension"
    if f["mode"] == "RGBA" and f["alpha_max"] < 50:
        return "dimension"
    return ""


def aggressive_reason(row: dict, cfg: AggressiveCleaningConfig) -> str:
    size = row["size"]
    if size < cfg.min_file_size or size > cfg.max_file_size:
        return "file_size"
    if size in cfg.problematic_sizes:
        return "file_size"
    f = decode_features(row["bytes"])
    if not f["valid"]:
        return "content"
    w, h = f["width"], f["height"]
    if w < cfg.min_width or h < cfg.min_height:
        return "content"
    if w > cfg.max_width or h > cfg.max_height:
        return "content"
    aspect = w / h if h else 0.0
    if aspect < cfg.min_aspect_ratio or aspect > cfg.max_aspect_ratio:
        return "content"
    if f["mode"] == "RGBA" and f["alpha_max"] < cfg.alpha_max_transparent:
        return "content"
    if f["top_color_frac"] > cfg.uniform_color_frac:
        return "content"
    return ""


def heuristic_keep(row: dict, cfg: HeuristicCleanupConfig) -> bool:
    fname = row["img_url"].rsplit("/", 1)[-1].lower()
    f = decode_features(row["bytes"])
    if not f["valid"]:
        return False
    if any(p in fname for p in cfg.non_cat_patterns):
        return False
    if any(p in fname for p in cfg.cat_patterns):
        return True
    w, h = f["width"], f["height"]
    score = 0
    aspect = w / h if h else 0.0
    if 0.5 <= aspect <= 2.0:
        score += 1
    if w >= 100 and h >= 100:
        score += 1
    if w <= 5000 and h <= 5000:
        score += 1
    if f["warm_ratio"] > cfg.warm_ratio_threshold:
        score += 1
    return score > cfg.drop_score
