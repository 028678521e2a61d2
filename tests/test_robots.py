"""robots.txt semantics (north_star: robots caches in stateful fetch
workers): parser unit tests + golden crawl equality with robots active."""

import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.functions.robotskit import (
    is_allowed,
    parse_robots,
    path_of,
    robots_url_for,
)
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.pages import (
    BroadcastPageStore,
    PartitionedPageStore,
)
from webscrape_neko_jirushi_ray.synth import synth_pages

from .oracle_crawler import crawl_oracle

ROBOTS = """
# comment
User-agent: Googlebot
Disallow: /only-for-google/

User-agent: *
Disallow: /private/
Disallow: /foster/226003/
Allow: /private/ok/
Disallow:
"""


def test_parse_and_decide():
    rules = parse_robots(ROBOTS)
    # googlebot group ignored; empty disallow ignored
    assert (False, "/private/") in rules
    assert (False, "/foster/226003/") in rules
    assert (True, "/private/ok/") in rules
    assert (False, "/only-for-google/") not in rules
    assert not is_allowed(rules, "/private/x")
    assert is_allowed(rules, "/private/ok/x")      # longest match wins
    assert not is_allowed(rules, "/foster/226003/")
    assert is_allowed(rules, "/foster/226004/")
    assert is_allowed(rules, "/anything/else")
    assert is_allowed([], "/private/x")            # no robots -> allow


def test_multi_agent_group_rules_bind_to_star():
    rules = parse_robots("User-agent: A\nUser-agent: *\nDisallow: /x/")
    assert not is_allowed(rules, "/x/y")


def test_url_helpers():
    assert (
        robots_url_for("https://www.neko-jirushi.com/foster/1/?a=1")
        == "https://www.neko-jirushi.com/robots.txt"
    )
    assert path_of("https://h.com/a/b?c=1") == "/a/b?c=1"
    assert path_of("https://h.com") == "/"


@pytest.fixture(scope="module")
def robots_site():
    pages, seeds = synth_pages(
        num_listing_pages=3, seed=21, robots_denied_every=7
    )
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    return pages, seeds, page_map


def test_golden_order_with_robots(ray_session, robots_site, tmp_path):
    pages, seeds, page_map = robots_site
    cfg = CrawlConfig(host_budget_per_round=12, max_rounds=25, seen_shards=2)
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "c"), cfg)
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=12, max_rounds=25)
    got = res.visits.to_pylist()
    assert len(got) == len(oracle.visits)
    denied = 0
    for g, w in zip(got, oracle.visits):
        assert (g["url"], g["fetch_status"], g["round"]) == (
            w.url, w.fetch_status, w.round
        )
        denied += g["fetch_status"] == "robots_denied"
    assert denied > 0, "fixture should exercise robots denial"
    assert res.visited_sha1s() == oracle.seen_sha1s()


def test_robots_denied_links_never_expanded(ray_session, robots_site, tmp_path):
    """A denied page's links must not enter the frontier: every visited URL
    must be reachable without traversing denied pages (oracle equality
    covers exactness; this asserts the invariant directly)."""
    pages, seeds, page_map = robots_site
    cfg = CrawlConfig(host_budget_per_round=50, max_rounds=25, seen_shards=2)
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "c2"), cfg)
    df = res.visits.to_pandas()
    denied_urls = set(df[df.fetch_status == "robots_denied"]["url"])
    assert denied_urls
    # denied urls themselves were never fetched ok
    assert not (set(df[df.fetch_status == "ok"]["url"]) & denied_urls)


def test_robots_off_fetches_everything(ray_session, robots_site, tmp_path):
    pages, seeds, page_map = robots_site
    cfg = CrawlConfig(
        host_budget_per_round=50, max_rounds=25, seen_shards=2,
        respect_robots=False,
    )
    res = crawl(BroadcastPageStore(pages), seeds, str(tmp_path / "c3"), cfg)
    statuses = set(res.visits.to_pandas()["fetch_status"])
    assert "robots_denied" not in statuses
    oracle = crawl_oracle(
        page_map, seeds, host_budget_per_round=50, max_rounds=25,
        respect_robots=False,
    )
    assert [v["url"] for v in res.visits.to_pylist()] == oracle.order()


def test_robots_on_partitioned_store(ray_session, robots_site, tmp_path):
    from webscrape_neko_jirushi_ray.functions.urlkit import add_url_key_columns

    pages, seeds, page_map = robots_site
    store = PartitionedPageStore.build(
        add_url_key_columns(pages), str(tmp_path / "ps"), num_buckets=8
    )
    cfg = CrawlConfig(
        host_budget_per_round=20, max_rounds=25, seen_shards=2,
        small_round_threshold=0,
    )
    res = crawl(store, seeds, str(tmp_path / "c4"), cfg)
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=20, max_rounds=25)
    assert [
        (v["url"], v["fetch_status"]) for v in res.visits.to_pylist()
    ] == [(w.url, w.fetch_status) for w in oracle.visits]


def test_crawl_delay_parsing_and_rate_override():
    from webscrape_neko_jirushi_ray.functions.robotskit import parse_robots_full
    from webscrape_neko_jirushi_ray.state.ratelimit import HostRateLimiter

    rules, delay = parse_robots_full(
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x/\n"
    )
    assert delay == 2.5 and (False, "/x/") in rules
    # other-agent delay ignored
    _, d2 = parse_robots_full("User-agent: bot\nCrawl-delay: 9\n")
    assert d2 is None
    # bad value ignored
    _, d3 = parse_robots_full("User-agent: *\nCrawl-delay: soon\n")
    assert d3 is None

    rl = HostRateLimiter(rate=10.0, burst=1.0)
    rl.wait_time("h.com", now=0.0)
    rl.set_rate("h.com", 1.0 / 2.5)
    assert rl.buckets["h.com"].rate == 1.0 / 2.5
    # next request must wait ~2.5s at the new rate
    assert abs(rl.wait_time("h.com", now=0.0) - 2.5) < 1e-9


def test_wildcard_and_anchor_patterns():
    """RFC 9309 wildcards: * matches any sequence, trailing $ anchors."""
    rules = parse_robots(
        "User-agent: *\n"
        "Disallow: /*.php\n"
        "Disallow: /search/*/results\n"
        "Disallow: /tmp$\n"
        "Allow: /private/*.html\n"
        "Disallow: /private/\n"
    )
    assert not is_allowed(rules, "/index.php")
    assert not is_allowed(rules, "/a/b/c.php?x=1")
    assert not is_allowed(rules, "/search/cats/results")
    assert is_allowed(rules, "/search/results")       # * needs the /.../ hop
    assert not is_allowed(rules, "/tmp")              # $ anchored: exact end
    assert is_allowed(rules, "/tmp/file")             # past the anchor -> no match
    # longest-pattern specificity: the /private/*.html Allow (15 chars)
    # beats the /private/ Disallow (9 chars)
    assert is_allowed(rules, "/private/page.html")
    assert not is_allowed(rules, "/private/page.txt")


def test_unreachable_robots_fails_closed(ray_session):
    """5xx / network-error robots.txt -> disallow all in the fetch stage
    (RFC 9309 §2.3.1.4); 404 keeps allowing all."""
    import pyarrow as pa

    from webscrape_neko_jirushi_ray.pipelines.crawl import FetchExtractActor

    class _ErrFetcher:
        def __init__(self, robots_status):
            self.robots_status = robots_status

        def fetch(self, urls):
            status = [
                self.robots_status if u.endswith("/robots.txt") else "ok"
                for u in urls
            ]
            return pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "warc_ts": pa.array([None] * len(urls), type=pa.timestamp("us")),
                    "html": pa.array(
                        [b"" if s != "ok" else b"<html></html>" for s in status],
                        type=pa.binary(),
                    ),
                    "lang": pa.array([""] * len(urls), type=pa.string()),
                    "fetch_status": pa.array(status, type=pa.string()),
                }
            )

    class _ErrStore:
        def __init__(self, robots_status):
            self.robots_status = robots_status

        def cache_key(self):
            return f"err:{self.robots_status}"

        def make_fetcher(self):
            return _ErrFetcher(self.robots_status)

    def _mask(status):
        actor = FetchExtractActor(_ErrStore(status))
        batch = pa.table(
            {
                "host": pa.array(["h.com"], type=pa.string()),
                "url": pa.array(["https://h.com/page"], type=pa.string()),
            }
        )
        return actor._robots_mask(batch)

    assert _mask("error:503") == [False]   # 5xx -> fail closed
    assert _mask("timeout") == [False]     # unreachable -> fail closed
    assert _mask("notfound") == [True]     # no robots.txt -> allow all
