"""Crawl-loop edge cases: degenerate inputs must not crash or violate the
contract."""

import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl, seeds_to_frontier
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages


@pytest.fixture(scope="module")
def small_site():
    pages, seeds = synth_pages(num_listing_pages=1, seed=61)
    return pages, seeds


def test_empty_seed_list(ray_session, small_site, tmp_path):
    pages, _ = small_site
    res = crawl(BroadcastPageStore(pages), [], str(tmp_path / "a"),
                CrawlConfig(seen_shards=2))
    assert res.visits.num_rows == 0
    assert res.rounds == 0


def test_duplicate_seeds_enqueue_once(ray_session, small_site, tmp_path):
    pages, seeds = small_site
    doubled = seeds + seeds + [seeds[0]]
    res = crawl(BroadcastPageStore(pages), doubled, str(tmp_path / "b"),
                CrawlConfig(host_budget_per_round=50, max_rounds=10, seen_shards=2))
    sha = res.visits["url_sha1"].to_pylist()
    assert len(sha) == len(set(sha))


def test_unknown_seed_is_notfound(ray_session, small_site, tmp_path):
    pages, _ = small_site
    res = crawl(
        BroadcastPageStore(pages),
        ["https://nowhere.example.org/missing/"],
        str(tmp_path / "c"),
        CrawlConfig(host_budget_per_round=5, max_rounds=3, seen_shards=2),
    )
    assert res.visits.num_rows == 1
    assert res.visits["fetch_status"][0].as_py() == "notfound"


def test_zero_rounds_and_zero_target(ray_session, small_site, tmp_path):
    pages, seeds = small_site
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "d"),
                CrawlConfig(max_rounds=0, seen_shards=2))
    assert res.visits.num_rows == 0
    res2 = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "e"),
                 CrawlConfig(target_urls=0, seen_shards=2))
    assert res2.visits.num_rows == 0


def test_seed_normalization_dedup(ray_session, small_site, tmp_path):
    """Seeds differing only in canonical form collapse to one visit."""
    pages, seeds = small_site
    variants = [
        seeds[0],
        seeds[0].replace("https://", "HTTPS://"),
        seeds[0] + "#frag",
    ]
    res = crawl(BroadcastPageStore(pages), variants, str(tmp_path / "f"),
                CrawlConfig(host_budget_per_round=5, max_rounds=1, seen_shards=2))
    assert res.visits.num_rows == 1


def test_seeds_to_frontier_assigns_positional_seq():
    t = seeds_to_frontier(["https://a.com/1/", "https://b.com/2/"])
    assert t["discovery_seq"].to_pylist() == [0, 1]
    assert t["depth"].to_pylist() == [0, 0]
    assert t["host"].to_pylist() == ["a.com", "b.com"]
