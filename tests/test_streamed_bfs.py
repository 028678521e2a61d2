"""Streamed BFS (link expansion inside crawl_fetch_list): the fully
driver-unbounded crawl must reproduce the sequential oracle's visit
sequence exactly — same contract the classic BFS loop pins, now with the
frontier, discovery dedup, seen anti-join, and dense seq assignment all
running as Ray Data stages."""

import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url
from webscrape_neko_jirushi_ray.pipelines.crawl import (
    crawl_fetch_list,
    seeds_to_frontier,
)
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages

from .oracle_crawler import crawl_oracle


def _run_streamed(pages, seeds, out_dir, budget, max_rounds=30, **cfg_kw):
    cfg = CrawlConfig(
        host_budget_per_round=budget, max_rounds=max_rounds, seen_shards=2,
        expand_links=True, fetch_batch_size=32, **cfg_kw,
    )
    res = crawl_fetch_list(
        BroadcastPageStore(pages), seeds_to_frontier(seeds), out_dir, cfg
    )
    v = res.visits_table().to_pandas().sort_values("visit_idx")
    return res, v


@pytest.mark.parametrize("budget", [5, 12, 1000])
def test_streamed_bfs_equals_oracle(ray_session, tmp_path, budget):
    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    res, v = _run_streamed(pages, seeds, str(tmp_path / f"b{budget}"), budget)
    oracle = crawl_oracle(
        page_map, seeds, host_budget_per_round=budget, max_rounds=30
    )
    got = list(zip(v["url"], v["fetch_status"], v["round"], v["discovery_seq"]))
    want = [
        (w.url, w.fetch_status, w.round, w.discovery_seq) for w in oracle.visits
    ]
    assert got == want
    assert res.visits_count == len(oracle.visits)


def test_streamed_bfs_with_robots(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=3, seed=21, robots_denied_every=7)
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    res, v = _run_streamed(pages, seeds, str(tmp_path / "r"), 12, max_rounds=25)
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=12, max_rounds=25)
    got = list(zip(v["url"], v["fetch_status"]))
    want = [(w.url, w.fetch_status) for w in oracle.visits]
    assert got == want
    assert "robots_denied" in set(v["fetch_status"])


def test_streamed_bfs_target_early_stop(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    res, v = _run_streamed(
        pages, seeds, str(tmp_path / "t"), 10, target_urls=23
    )
    oracle = crawl_oracle(
        page_map, seeds, host_budget_per_round=10, max_rounds=30, target_urls=23
    )
    assert list(v["url"]) == [w.url for w in oracle.visits]
    assert res.visits_count == 23


def test_streamed_bfs_random_sites(ray_session, tmp_path):
    """Seeded random sites x budgets (the BFS analog of
    test_fetch_list_random_conformance)."""
    import numpy as np

    rng = np.random.default_rng(77)
    for trial in range(2):
        seed = int(rng.integers(1, 10_000))
        budget = int(rng.integers(3, 40))
        pages, seeds = synth_pages(num_listing_pages=2, seed=seed)
        page_map = {
            canonicalize_url(r["url"]): r["html"].decode("utf-8")
            for r in pages.to_pylist()
        }
        _, v = _run_streamed(
            pages, seeds, str(tmp_path / f"x{trial}"), budget, max_rounds=40
        )
        oracle = crawl_oracle(
            page_map, seeds, host_budget_per_round=budget, max_rounds=40
        )
        got = list(zip(v["url"], v["fetch_status"]))
        want = [(w.url, w.fetch_status) for w in oracle.visits]
        assert got == want, f"trial {trial} seed={seed} budget={budget}"


def test_streamed_bfs_partitioned_store(ray_session, tmp_path):
    """Streamed BFS over the sha1-bucketed partitioned store (the
    distributed fetch path) must equal the oracle too."""
    from webscrape_neko_jirushi_ray.functions.urlkit import add_url_key_columns
    from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore

    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    store = PartitionedPageStore.build(
        add_url_key_columns(pages), str(tmp_path / "ps"), num_buckets=8
    )
    cfg = CrawlConfig(
        host_budget_per_round=12, max_rounds=30, seen_shards=2,
        expand_links=True, fetch_batch_size=32,
    )
    res = crawl_fetch_list(
        store, seeds_to_frontier(seeds), str(tmp_path / "c"), cfg
    )
    v = res.visits_table().to_pandas().sort_values("visit_idx")
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=12, max_rounds=30)
    assert list(zip(v["url"], v["fetch_status"])) == [
        (w.url, w.fetch_status) for w in oracle.visits
    ]


def test_streamed_bfs_resume(ray_session, tmp_path):
    """Crash after 2 rounds of streamed BFS, resume with more rounds: the
    combined visit sequence (and discovery seqs, via next_seq persisted in
    the manifest) must equal an uninterrupted run."""
    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    full_res, full_v = _run_streamed(
        pages, seeds, str(tmp_path / "full"), 10, max_rounds=30
    )
    part_cfg = CrawlConfig(
        host_budget_per_round=10, max_rounds=2, seen_shards=2,
        expand_links=True, fetch_batch_size=32,
    )
    crawl_fetch_list(
        BroadcastPageStore(pages), seeds_to_frontier(seeds),
        str(tmp_path / "part"), part_cfg,
    )
    full_cfg = CrawlConfig(
        host_budget_per_round=10, max_rounds=30, seen_shards=2,
        expand_links=True, fetch_batch_size=32,
    )
    resumed = crawl_fetch_list(
        BroadcastPageStore(pages), seeds_to_frontier(seeds),
        str(tmp_path / "part"), full_cfg, resume=True,
    )
    rv = resumed.visits_table().to_pandas().sort_values("visit_idx")
    assert list(zip(rv["url"], rv["discovery_seq"])) == list(
        zip(full_v["url"], full_v["discovery_seq"])
    )
    assert resumed.visits_count == full_res.visits_count


def test_crawl_auto_routes_by_frontier_size(ray_session, tmp_path):
    """crawl(expand_links=True) routing: streamed_bfs=None auto-selects the
    streamed engine at/above streamed_bfs_threshold seed rows and the
    classic loop below it; True forces streamed. Manifest 'mode' tags the
    engine; visit sequences are identical either way."""
    from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
    from webscrape_neko_jirushi_ray.state import checkpoint as ckpt

    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    store = BroadcastPageStore(pages)

    def _mode(out_dir):
        return (ckpt.read_manifest(out_dir, 0) or {}).get("mode")

    # forced streamed
    d1 = str(tmp_path / "forced")
    cfg = CrawlConfig(
        host_budget_per_round=1000, max_rounds=10, seen_shards=2,
        expand_links=True, fetch_batch_size=32, streamed_bfs=True,
    )
    r1 = crawl(store, seeds, d1, cfg)
    assert _mode(d1) == "fetch_list_streamed"

    # auto + tiny seed list -> classic
    d2 = str(tmp_path / "classic")
    cfg2 = CrawlConfig(
        host_budget_per_round=1000, max_rounds=10, seen_shards=2,
        expand_links=True, fetch_batch_size=32,
    )
    r2 = crawl(store, seeds, d2, cfg2)
    assert _mode(d2) != "fetch_list_streamed"

    # auto + threshold 1 -> streamed, same visits as classic
    d3 = str(tmp_path / "auto_streamed")
    cfg3 = CrawlConfig(
        host_budget_per_round=1000, max_rounds=10, seen_shards=2,
        expand_links=True, fetch_batch_size=32, streamed_bfs_threshold=1,
    )
    r3 = crawl(store, seeds, d3, cfg3)
    assert _mode(d3) == "fetch_list_streamed"

    v2 = r2.visits_table().to_pandas().sort_values("visit_idx")
    for r in (r1, r3):
        v = r.visits_table().to_pandas().sort_values("visit_idx")
        assert list(v["url"]) == list(v2["url"])
        assert list(v["fetch_status"]) == list(v2["fetch_status"])
