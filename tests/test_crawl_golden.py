"""Golden crawl-order fixture (SURVEY.md §5.2, north_star requirement):
the Ray engine's visit sequence and final URL-seen set must equal the
sequential reference-semantics oracle's, under the same seed list +
politeness budget. Also covers target-limit early stop (O4) and the
politeness property (per-host per-round fetch count <= budget)."""

import pyarrow.compute as pc
import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.pages import (
    BroadcastPageStore,
    PartitionedPageStore,
)
from webscrape_neko_jirushi_ray.synth import synth_pages

from .oracle_crawler import crawl_oracle


@pytest.fixture(scope="module")
def site():
    pages, seeds = synth_pages(num_listing_pages=4, seed=11)
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    return pages, seeds, page_map


def _with_keys(pages):
    from webscrape_neko_jirushi_ray.functions.urlkit import add_url_key_columns

    return add_url_key_columns(pages)


@pytest.mark.parametrize("budget", [5, 64])
def test_engine_matches_oracle_order_and_seen_set(ray_session, site, tmp_path, budget):
    pages, seeds, page_map = site
    cfg = CrawlConfig(
        host_budget_per_round=budget, max_rounds=30, seen_shards=2, seen_mode="exact"
    )
    store = BroadcastPageStore(pages)
    res = crawl(store, seeds, str(tmp_path / f"crawl{budget}"), cfg)
    oracle = crawl_oracle(
        page_map, seeds, host_budget_per_round=budget, max_rounds=30
    )

    got = res.visits.to_pylist()
    want = oracle.visits
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g["url"] == w.url, (g["visit_idx"], g["url"], w.url)
        assert g["visit_idx"] == w.visit_idx
        assert g["discovery_seq"] == w.discovery_seq
        assert g["round"] == w.round
        assert g["fetch_status"] == w.fetch_status
    assert res.visited_sha1s() == oracle.seen_sha1s()


def test_partitioned_store_same_result(ray_session, site, tmp_path):
    pages, seeds, page_map = site
    # small_round_threshold=0 forces the distributed (Dataset) path so the
    # groupby/map_groups + actor-pool plan is what's under test here
    cfg = CrawlConfig(
        host_budget_per_round=40, max_rounds=30, seen_shards=2,
        small_round_threshold=0, control_inline_threshold=0,
    )
    store = PartitionedPageStore.build(
        _with_keys(pages), str(tmp_path / "pstore"), num_buckets=8
    )
    res = crawl(store, seeds, str(tmp_path / "crawlp"), cfg)
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=40, max_rounds=30)
    assert [v["url"] for v in res.visits.to_pylist()] == oracle.order()
    assert res.visited_sha1s() == oracle.seen_sha1s()


def test_politeness_budget_property(ray_session, site, tmp_path):
    pages, seeds, _ = site
    cfg = CrawlConfig(host_budget_per_round=3, max_rounds=10)
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "crawlb"), cfg)
    import pandas as pd

    df = res.visits.to_pandas()
    per_round_host = df.groupby(["round", "host"]).size()
    assert (per_round_host <= 3).all(), per_round_host[per_round_host > 3]


def test_target_limit_early_stop(ray_session, site, tmp_path):
    pages, seeds, page_map = site
    cfg = CrawlConfig(host_budget_per_round=10, max_rounds=30, target_urls=17)
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "crawlt"), cfg)
    oracle = crawl_oracle(
        page_map, seeds, host_budget_per_round=10, max_rounds=30, target_urls=17
    )
    assert res.visits.num_rows == len(oracle.visits) == 17
    assert [v["url"] for v in res.visits.to_pylist()] == oracle.order()


def test_dedup_property_no_repeat_visits(ray_session, site, tmp_path):
    pages, seeds, _ = site
    cfg = CrawlConfig(host_budget_per_round=16, max_rounds=30)
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "crawld"), cfg)
    sha = res.visits["url_sha1"].to_pylist()
    assert len(sha) == len(set(sha)), "a URL was visited twice"


def test_politeness_on_distributed_path(ray_session, site, tmp_path):
    """Budget must hold per TRUE host even when the salted groupby shuffle
    (distributed control plane) computes the winners."""
    pages, seeds, page_map = site
    cfg = CrawlConfig(
        host_budget_per_round=3, max_rounds=8, seen_shards=2,
        control_inline_threshold=0, host_salt_buckets=8,
    )
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "crawlsp"), cfg)
    import pandas as pd

    df = res.visits.to_pandas()
    per_round_host = df.groupby(["round", "host"]).size()
    assert (per_round_host <= 3).all(), per_round_host[per_round_host > 3]
    # and the order still matches the oracle exactly
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=3, max_rounds=8)
    assert [v["url"] for v in res.visits.to_pylist()] == oracle.order()
