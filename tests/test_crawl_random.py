"""Randomized crawl-vs-oracle property test: for ANY synthesized site and
politeness budget, the distributed engine must reproduce the sequential
oracle's visit sequence and URL-seen set exactly. Stronger than the fixed
golden fixtures — hypothesis explores site shapes x budgets."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages

from .oracle_crawler import crawl_oracle


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    site_seed=st.integers(min_value=0, max_value=10_000),
    listing_pages=st.integers(min_value=1, max_value=3),
    budget=st.integers(min_value=2, max_value=40),
    robots_every=st.sampled_from([0, 4, 9]),
)
def test_any_site_any_budget_matches_oracle(
    ray_session, tmp_path_factory, site_seed, listing_pages, budget, robots_every
):
    pages, seeds = synth_pages(
        num_listing_pages=listing_pages,
        seed=site_seed,
        robots_denied_every=robots_every,
    )
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    out = tmp_path_factory.mktemp(f"rc{site_seed}_{budget}_{robots_every}")
    cfg = CrawlConfig(host_budget_per_round=budget, max_rounds=40, seen_shards=2)
    res = crawl(BroadcastPageStore(pages), seeds, str(out), cfg)
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=budget, max_rounds=40)

    got = [(v["url"], v["fetch_status"], v["round"]) for v in res.visits.to_pylist()]
    want = [(w.url, w.fetch_status, w.round) for w in oracle.visits]
    assert got == want
    assert res.visited_sha1s() == oracle.seen_sha1s()
