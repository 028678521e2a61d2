"""Checkpoint/resume test (SURVEY.md §5.5): kill after round r, restart
with resume=True, outputs + seen set must equal the uninterrupted run."""

import pyarrow.compute as pc
import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.state import checkpoint as ckpt
from webscrape_neko_jirushi_ray.synth import synth_pages


def test_resume_equals_uninterrupted(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=3, seed=13)
    cfg = CrawlConfig(host_budget_per_round=10, max_rounds=30, seen_shards=2)
    store = BroadcastPageStore(pages)

    # uninterrupted reference run
    full = crawl(store, seeds, str(tmp_path / "full"), cfg)

    # interrupted run: stop after 3 rounds (simulated kill via max_rounds)
    cfg_short = CrawlConfig(
        host_budget_per_round=10, max_rounds=3, seen_shards=2
    )
    part = crawl(store, seeds, str(tmp_path / "resumed"), cfg_short)
    assert part.rounds == 3
    assert ckpt.last_complete_round(str(tmp_path / "resumed")) == 2

    # resume to completion
    res = crawl(store, seeds, str(tmp_path / "resumed"), cfg, resume=True)

    assert res.visits.num_rows == full.visits.num_rows
    got = res.visits.to_pylist()
    want = full.visits.to_pylist()
    for g, w in zip(got, want):
        assert (g["visit_idx"], g["url"], g["round"], g["fetch_status"]) == (
            w["visit_idx"], w["url"], w["round"], w["fetch_status"]
        )
    assert res.visited_sha1s() == full.visited_sha1s()


def test_resume_is_noop_when_complete(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=2, seed=19)
    cfg = CrawlConfig(host_budget_per_round=50, max_rounds=30, seen_shards=2)
    store = BroadcastPageStore(pages)
    full = crawl(store, seeds, str(tmp_path / "c"), cfg)
    again = crawl(store, seeds, str(tmp_path / "c"), cfg, resume=True)
    assert again.visits.num_rows == full.visits.num_rows
