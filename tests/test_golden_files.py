"""Committed golden-file conformance (SURVEY.md §5.2/§5.3).

The other golden tests compare engine vs the in-repo sequential oracle —
which catches divergence but not a change that shifts BOTH the same way.
These fixtures were generated once and committed (tests/golden/); any
future change to crawl ordering or extraction bytes fails here and must be
a deliberate, reviewed contract change.
"""

import hashlib
import json
import os

import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.functions.htmlkit import extract_all
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name), encoding="utf-8") as f:
        return json.load(f)


def test_crawl_order_matches_committed_golden(ray_session, tmp_path):
    g = _load("crawl_order_seed11_budget5.json")
    pages, seeds = synth_pages(**g["site"])
    cfg = CrawlConfig(
        host_budget_per_round=g["budget"], max_rounds=g["max_rounds"], seen_shards=2
    )
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "g"), cfg)
    got = res.visits.to_pylist()
    assert len(got) == len(g["visits"])
    for a, b in zip(got, g["visits"]):
        assert a["visit_idx"] == b["i"]
        assert a["url"] == b["url"]
        assert a["round"] == b["round"]
        assert a["fetch_status"] == b["status"]
        assert a["discovery_seq"] == b["seq"]


def test_extraction_matches_committed_digests():
    g = _load("extraction_seed11.json")
    pages, _ = synth_pages(num_listing_pages=4, seed=11)
    by_url = {r["url"]: r["html"].decode("utf-8") for r in pages.to_pylist()}
    assert len(g) == len(by_url)
    for row in g:
        text, name, _desc, _kv, images, links = extract_all(
            row["url"], by_url[row["url"]]
        )
        assert hashlib.sha256(text.encode()).hexdigest() == row["text_sha256"], row["url"]
        assert len(images) == row["n_images"], row["url"]
        assert len(links) == row["n_links"], row["url"]
        assert name == row["name"], row["url"]
