"""Sitemap ingestion: parser conformance (functions/sitemapkit.py) and the
tree→frontier expansion (sources/sitemaps.py) — BFS document order,
keep-first dedup, canonicalization, gzip leaves, junk survival, and the
hand-off into crawl_fetch_list."""

import datetime as dt
import gzip

import pyarrow as pa
import pytest

from webscrape_neko_jirushi_ray.functions.sitemapkit import parse_sitemap
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url, url_sha1


def _urlset(urls):
    body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{body}</urlset>"
    ).encode()


def _index(sitemaps):
    body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in sitemaps)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<sitemapindex>{body}</sitemapindex>"
    ).encode()


def test_parse_urlset_and_index():
    is_idx, locs = parse_sitemap(_urlset(["http://a.example/x", "http://a.example/y"]))
    assert (is_idx, locs) == (False, ["http://a.example/x", "http://a.example/y"])
    is_idx, locs = parse_sitemap(_index(["http://a.example/s1.xml"]))
    assert (is_idx, locs) == (True, ["http://a.example/s1.xml"])


def test_parse_cdata_entities_namespace_gzip_junk():
    body = (
        b"<sm:urlset xmlns:sm='x'>"
        b"<sm:url><sm:loc><![CDATA[http://a.example/p?a=1&b=2]]></sm:loc></sm:url>"
        b"<sm:url><sm:loc> http://a.example/q?x=1&amp;y=2 </sm:loc></sm:url>"
        b"</sm:urlset>"
    )
    is_idx, locs = parse_sitemap(body)
    assert not is_idx
    assert locs == [
        "http://a.example/p?a=1&b=2",
        "http://a.example/q?x=1&y=2",
    ]
    assert parse_sitemap(gzip.compress(_urlset(["http://a.example/z"])))[1] == [
        "http://a.example/z"
    ]
    assert parse_sitemap(b"\x1f\x8bnot-gzip") == (False, [])
    assert parse_sitemap(b"<html>not a sitemap</html>") == (False, [])
    assert parse_sitemap(None) == (False, [])
    assert parse_sitemap(b"") == (False, [])


def _store(bodies: dict[str, bytes]):
    from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore

    urls = sorted(bodies)
    ts = dt.datetime(2020, 1, 1)
    return BroadcastPageStore(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us")),
                "html": pa.array([bodies[u] for u in urls], pa.binary()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        )
    )


def test_sitemap_tree_to_frontier(ray_session):
    from webscrape_neko_jirushi_ray.sources.sitemaps import sitemaps_to_frontier

    root = "http://a.example/sitemap.xml"
    bodies = {
        canonicalize_url(root): _index(
            [
                "http://a.example/s1.xml",
                "http://a.example/s2.xml.gz",
                "http://a.example/missing.xml",  # notfound child
            ]
        ),
        canonicalize_url("http://a.example/s1.xml"): _urlset(
            [
                "http://a.example/p1",
                "HTTP://A.EXAMPLE/p2#frag",  # canonicalizes
                "http://b.example/q1",       # cross-host kept
            ]
        ),
        canonicalize_url("http://a.example/s2.xml.gz"): gzip.compress(
            _urlset(
                [
                    "http://a.example/p2",  # dup of s1's p2 → keep-first
                    "http://a.example/p3",
                ]
            )
        ),
    }
    fr = sitemaps_to_frontier(_store(bodies), [root]).to_pandas()
    fr = fr.sort_values("discovery_seq").reset_index(drop=True)
    want = [
        canonicalize_url(u)
        for u in [
            "http://a.example/p1",
            "http://a.example/p2",
            "http://b.example/q1",
            "http://a.example/p3",
        ]
    ]
    assert list(fr["url"]) == want
    assert list(fr["discovery_seq"]) == [0, 1, 2, 3]
    assert list(fr["depth"]) == [0] * 4
    assert [bytes(s) for s in fr["url_sha1"]] == [url_sha1(u) for u in want]
    assert list(fr["host"]) == ["a.example", "a.example", "b.example", "a.example"]


def test_sitemap_duplicate_root_and_empty(ray_session):
    from webscrape_neko_jirushi_ray.pipelines.crawl import FRONTIER_SCHEMA
    from webscrape_neko_jirushi_ray.sources.sitemaps import sitemaps_to_frontier

    store = _store({canonicalize_url("http://a.example/sm.xml"): b"junk"})
    fr = sitemaps_to_frontier(
        store, ["http://a.example/sm.xml", "http://a.example/sm.xml"]
    )
    assert fr.count() == 0
    assert [f.name for f in fr.schema().base_schema] == [
        f.name for f in FRONTIER_SCHEMA
    ]


def test_sitemap_frontier_feeds_fetch_list(ray_session, tmp_path):
    """The expanded frontier drives crawl_fetch_list identically to the
    same URL list passed through seeds_to_frontier."""
    from webscrape_neko_jirushi_ray.config import CrawlConfig
    from webscrape_neko_jirushi_ray.pipelines.crawl import (
        crawl_fetch_list,
        seeds_to_frontier,
    )
    from webscrape_neko_jirushi_ray.sources.sitemaps import sitemaps_to_frontier

    pages = [f"http://a.example/p{i}" for i in range(6)] + [
        f"http://b.example/p{i}" for i in range(3)
    ]
    bodies = {
        canonicalize_url(u): f"<html><body>doc {u}</body></html>".encode()
        for u in pages
    }
    root = canonicalize_url("http://a.example/sitemap.xml")
    bodies[root] = _urlset(pages)
    store = _store(bodies)
    cfg = CrawlConfig(host_budget_per_round=2, max_rounds=10, seen_shards=2,
                      seen_mode="exact")
    fr = sitemaps_to_frontier(store, [root])
    res_sm = crawl_fetch_list(store, fr, str(tmp_path / "sm"), cfg)
    res_seed = crawl_fetch_list(
        store, seeds_to_frontier(pages), str(tmp_path / "seed"), cfg
    )
    got = res_sm.visits_table().to_pylist()
    want = res_seed.visits_table().to_pylist()
    assert [g["url"] for g in got] == [w["url"] for w in want]
    assert [g["round"] for g in got] == [w["round"] for w in want]
    assert [g["fetch_status"] for g in got] == [w["fetch_status"] for w in want]


def test_parse_sitemap_roundtrip_property():
    """Any escaped URL list round-trips through a generated urlset /
    sitemapindex document, plain and gzipped."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    url_st = st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_characters="<>&\x00\r\n\t ",
            exclude_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
        ),
        min_size=1,
        max_size=40,
    ).map(lambda s: "http://h.example/" + s)

    import html as _h

    @settings(max_examples=60, deadline=None)
    @given(st.lists(url_st, min_size=0, max_size=8), st.booleans(),
           st.booleans())
    def _case(urls, as_index, gz):
        tag = "sitemap" if as_index else "url"
        root = "sitemapindex" if as_index else "urlset"
        body = "".join(
            f"<{tag}><loc>{_h.escape(u)}</loc></{tag}>" for u in urls
        )
        doc = f"<?xml version='1.0'?><{root}>{body}</{root}>".encode()
        if gz:
            doc = gzip.compress(doc)
        is_idx, locs = parse_sitemap(doc)
        assert is_idx == as_index
        assert locs == urls

    _case()


def test_sitemap_tree_partitioned_store(ray_session, tmp_path):
    """The expansion fetches through a PartitionedPageStore (the sha1
    lookup path) identically to the broadcast store."""
    from webscrape_neko_jirushi_ray.functions.urlkit import add_url_key_columns
    from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore
    from webscrape_neko_jirushi_ray.sources.sitemaps import sitemaps_to_frontier

    root = canonicalize_url("http://a.example/sitemap.xml")
    bodies = {
        root: _index(["http://a.example/s1.xml"]),
        canonicalize_url("http://a.example/s1.xml"): _urlset(
            ["http://a.example/p1", "http://a.example/p2"]
        ),
    }
    urls = sorted(bodies)
    ts = dt.datetime(2020, 1, 1)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us")),
            "html": pa.array([bodies[u] for u in urls], pa.binary()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    store = PartitionedPageStore.build(
        add_url_key_columns(pages), str(tmp_path / "ps"), num_buckets=4
    )
    fr = sitemaps_to_frontier(store, [root]).to_pandas()
    fr = fr.sort_values("discovery_seq")
    assert list(fr["url"]) == [
        canonicalize_url("http://a.example/p1"),
        canonicalize_url("http://a.example/p2"),
    ]


def test_parse_robots_sitemaps():
    from webscrape_neko_jirushi_ray.functions.robotskit import (
        parse_robots_sitemaps,
    )

    text = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://a.example/sm1.xml\n"
        "User-agent: other\n"
        "sitemap:   http://a.example/sm2.xml  # trailing comment\n"
        "Sitemap:\n"  # empty value ignored
    )
    assert parse_robots_sitemaps(text) == [
        "http://a.example/sm1.xml",
        "http://a.example/sm2.xml",
    ]


def test_discover_frontier_from_robots(ray_session):
    """robots.txt → Sitemap: directives → expanded frontier, multi-host;
    hosts without robots or sitemap lines contribute nothing."""
    from webscrape_neko_jirushi_ray.sources.sitemaps import (
        discover_frontier_from_robots,
    )

    bodies = {
        canonicalize_url("http://a.example/robots.txt"): (
            b"User-agent: *\nDisallow: /x\n"
            b"Sitemap: http://a.example/sm.xml\n"
        ),
        canonicalize_url("http://a.example/sm.xml"): _urlset(
            ["http://a.example/p1", "http://a.example/p2"]
        ),
        canonicalize_url("http://b.example/robots.txt"): (
            b"Sitemap: http://b.example/sm.xml\n"
        ),
        canonicalize_url("http://b.example/sm.xml"): _urlset(
            ["http://b.example/q1"]
        ),
        # c.example robots has no Sitemap line
        canonicalize_url("http://c.example/robots.txt"): b"User-agent: *\n",
    }
    fr = discover_frontier_from_robots(
        _store(bodies), ["a.example", "b.example", "c.example", "d.example"]
    ).to_pandas().sort_values("discovery_seq")
    assert list(fr["url"]) == [
        canonicalize_url(u)
        for u in ["http://a.example/p1", "http://a.example/p2",
                  "http://b.example/q1"]
    ]
    assert list(fr["discovery_seq"]) == [0, 1, 2]


def test_discover_frontier_zero_sitemaps(ray_session):
    """ADVICE r4: when NO host yields a Sitemap directive the BFS never
    runs and sitemaps_to_frontier must return an empty FRONTIER_SCHEMA
    dataset, not IndexError (the docstring promises such hosts
    'contribute nothing')."""
    from webscrape_neko_jirushi_ray.pipelines.crawl import FRONTIER_SCHEMA
    from webscrape_neko_jirushi_ray.sources.sitemaps import (
        discover_frontier_from_robots,
        sitemaps_to_frontier,
    )

    bodies = {
        # robots exists but has no Sitemap line; second host has none
        canonicalize_url("http://c.example/robots.txt"): b"User-agent: *\n",
    }
    fr = discover_frontier_from_robots(
        _store(bodies), ["c.example", "d.example"]
    )
    assert fr.count() == 0
    assert fr.schema().names == FRONTIER_SCHEMA.names
    # the direct empty-list path too
    fr2 = sitemaps_to_frontier(_store({}), [])
    assert fr2.count() == 0
    assert fr2.schema().names == FRONTIER_SCHEMA.names
