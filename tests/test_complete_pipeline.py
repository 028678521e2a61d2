"""End-to-end pipeline test (§3.1: the complete_pipeline.py analog):
crawl → harvest → clean → score → reorganize, with reconciling counters
and deterministic reruns."""

import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.pipelines.complete import run_complete_pipeline
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages


def test_complete_pipeline_counts_reconcile(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=2, seed=5)
    cfg = CrawlConfig(host_budget_per_round=100, max_rounds=10, seen_shards=2)
    report = run_complete_pipeline(
        BroadcastPageStore(pages), seeds, str(tmp_path / "run"), cfg
    )
    assert report["pages_visited"] > 0
    assert report["docs_extracted"] > 0
    assert (
        report["images_harvested"]
        >= report["after_advanced"]
        >= report["after_aggressive"]
        >= report["after_scoring"]
    )
    removed_adv = sum(report["removal_reasons_advanced"].get("count()", []))
    assert report["images_harvested"] - removed_adv == report["after_advanced"]
    assert report["detection_summary"]["total_images"] == report["after_aggressive"]

    # deterministic rerun
    report2 = run_complete_pipeline(
        BroadcastPageStore(pages), seeds, str(tmp_path / "run2"), cfg
    )
    for k in ("pages_visited", "docs_extracted", "images_harvested",
              "after_advanced", "after_aggressive", "after_scoring"):
        assert report[k] == report2[k], k
