"""Sitemap-tree ingestion: sitemap URLs → a deduplicated, deterministic
seed FRONTIER (crawl.FRONTIER_SCHEMA) ready for ``crawl_fetch_list``.

Reference analog: the reference enumerates its frontier from a paginated
listing endpoint (comprehensive_scraper.py:299-331); the general engine
ingests the site-published equivalent — ``sitemap.xml`` trees, including
``<sitemapindex>`` nesting and gzipped leaves (functions/sitemapkit.py).

Scale design: the driver walks the sitemap TREE level by level (BFS) —
driver state is O(#sitemap files), documented and tiny (the sitemaps.org
spec caps a tree at 50k children per index and 50k URLs per leaf; a
10^10-URL frontier is ~200k leaf files). Each level's fetch+parse runs
distributed (``map_batches`` over the level's sitemap URLs, page store
fetcher memoized per worker exactly like the crawl fetch stage); the
PAGE-URL output of every level STAYS A DATASET — nothing URL-shaped ever
crosses the driver. The final frontier is produced with ONE key-bucket
shuffle (global keep-first dedup on the canonical URL sha1, preserving
the earliest (sitemap, position) discovery order) plus the dense-index
enumeration pass for contiguous ``discovery_seq``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.sitemapkit import parse_sitemap
from ..functions.urlkit import add_url_key_columns, canonicalize_url, url_sha1

# per-worker fetcher memo — same rationale as crawl._FETCHER_CACHE: the
# fetch stage runs as stateless tasks; workers stay warm across levels.
_SM_FETCHER_CACHE: dict[str, object] = {}

# (sitemap_seq, position) composite order key. The sitemaps.org spec caps
# one file at 50k locs; 2^32 leaves headroom for spec-violating files
# while keeping sitemap_seq good to 2^31 files.
_POS_BITS = 32


def _fetch_bodies(fetcher, urls: list[str]) -> list[bytes | None]:
    if hasattr(fetcher, "fetch_by_sha1"):
        t = fetcher.fetch_by_sha1(urls, [url_sha1(u) for u in urls])
    else:
        t = fetcher.fetch(urls)
    return t["html"].to_pylist()


def sitemaps_to_frontier(
    store,
    sitemap_urls: list[str],
    *,
    max_depth: int = 3,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Expand a sitemap tree into a seed frontier Dataset with
    ``crawl.FRONTIER_SCHEMA`` columns: canonical ``url``/``url_sha1``/
    ``host``, ``depth=0``, contiguous ``discovery_seq`` in global
    sitemap-document order (BFS over the tree, document order within a
    file, keep-FIRST across duplicate URLs), ``parent_url=''``.

    ``max_depth`` bounds index nesting (the spec allows one level;
    real-world trees occasionally chain two). Sitemap URLs that fetch
    as notfound or parse to junk contribute nothing."""
    from ..functions.enumerate import attach_dense_index
    from ..pipelines.crawl import FRONTIER_SCHEMA

    seen_sm: set[str] = set()
    level: list[tuple[int, str]] = []
    next_seq = 0
    for u in sitemap_urls:
        cu = canonicalize_url(u)
        if cu not in seen_sm:
            seen_sm.add(cu)
            level.append((next_seq, cu))
            next_seq += 1

    ckey = store.cache_key()

    def _fetch_parse(t: pa.Table) -> pa.Table:
        f = _SM_FETCHER_CACHE.get(ckey)
        if f is None:
            f = store.make_fetcher()
            _SM_FETCHER_CACHE[ckey] = f
        urls = t["sm_url"].to_pylist()
        seqs = t["sm_seq"].to_pylist()
        bodies = _fetch_bodies(f, urls)
        seq_o, pos_o, kind_o, loc_o = [], [], [], []
        for seq, body in zip(seqs, bodies):
            is_index, locs = parse_sitemap(body)
            for pos, loc in enumerate(locs):
                seq_o.append(seq)
                pos_o.append(pos)
                kind_o.append("sitemap" if is_index else "url")
                loc_o.append(loc)
        return pa.table(
            {
                "sm_seq": pa.array(seq_o, pa.int64()),
                "pos": pa.array(pos_o, pa.int64()),
                "kind": pa.array(kind_o, pa.string()),
                "loc": pa.array(loc_o, pa.string()),
            }
        )

    url_levels: list["ray.data.Dataset"] = []
    depth = 0
    while level and depth <= max_depth:
        tbl = pa.table(
            {
                "sm_seq": pa.array([s for s, _ in level], pa.int64()),
                "sm_url": pa.array([u for _, u in level], pa.string()),
            }
        )
        parsed = (
            ray.data.from_arrow(tbl)
            .map_batches(_fetch_parse, batch_format="pyarrow")
            .materialize()  # O(locs this level), consumed twice below
        )
        url_levels.append(
            parsed.filter(expr="kind == 'url'").select_columns(
                ["sm_seq", "pos", "loc"]
            )
        )
        # child sitemaps drive the next level: O(#sitemap files) driver
        # state by design (spec-bounded), never page URLs
        kids = parsed.filter(expr="kind == 'sitemap'").select_columns(
            ["sm_seq", "pos", "loc"]
        ).to_pandas()
        level = []
        if len(kids) == 0:
            # Ray's to_pandas drops the schema of an all-empty dataset;
            # an empty frame has no columns to sort on
            depth += 1
            continue
        kids = kids.sort_values(["sm_seq", "pos"])
        for loc in kids["loc"]:
            cu = canonicalize_url(loc)
            if cu not in seen_sm:
                seen_sm.add(cu)
                level.append((next_seq, cu))
                next_seq += 1
        depth += 1

    if not url_levels:
        # no sitemap URLs at all (e.g. discover_frontier_from_robots
        # found zero Sitemap: directives) — an empty frontier, not a
        # crash; such hosts "contribute nothing" per the docstring
        return ray.data.from_arrow(FRONTIER_SCHEMA.empty_table())
    urls = url_levels[0]
    for extra in url_levels[1:]:
        urls = urls.union(extra)

    def _keyed(t: pa.Table) -> pa.Table:
        t = add_url_key_columns(t, url_col="loc")
        seq = np.asarray(t["sm_seq"].to_numpy(zero_copy_only=False))
        pos = np.asarray(t["pos"].to_numpy(zero_copy_only=False))
        order = (seq << np.int64(_POS_BITS)) | np.minimum(
            pos, (1 << _POS_BITS) - 1
        )
        k = np.frombuffer(
            b"".join(s[:8] for s in t["url_sha1"].to_pylist()), dtype=">u8"
        ) if t.num_rows else np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "url": t["canon_url"],
                "url_sha1": t["url_sha1"],
                "host": t["host"],
                "ord": pa.array(order, pa.int64()),
                "_kb": pa.array(
                    (k % np.uint64(num_buckets)).astype(np.int64)
                ),
            }
        )

    def _keep_first(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_kb"])
        if g.num_rows == 0:
            return g
        sha = np.frombuffer(
            b"".join(s for s in g["url_sha1"].to_pylist()), dtype="S20"
        )
        o = np.asarray(g["ord"].to_numpy(zero_copy_only=False))
        order = np.lexsort((o, sha))
        first = np.concatenate([[True], sha[order][1:] != sha[order][:-1]])
        return g.take(pa.array(order[np.nonzero(first)[0]], pa.int64()))

    deduped = (
        urls.map_batches(_keyed, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(_keep_first, batch_format="pyarrow")
        .materialize()  # O(distinct urls); consumed by count + rank
    )
    if deduped.count() == 0:
        return ray.data.from_arrow(FRONTIER_SCHEMA.empty_table())
    ranked = attach_dense_index(
        deduped, ["ord"], index_col="_rank"
    )

    def _finish(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"],
                "url_sha1": t["url_sha1"],
                "host": t["host"],
                "depth": pa.array(np.zeros(n, dtype=np.int32)),
                "discovery_seq": pc.subtract(
                    pc.cast(t["_rank"], pa.int64()), pa.scalar(1, pa.int64())
                ),
                "parent_url": pa.array([""] * n, pa.string()),
            },
            schema=FRONTIER_SCHEMA,
        )

    return ranked.map_batches(_finish, batch_format="pyarrow")


def discover_frontier_from_robots(
    store,
    hosts: list[str],
    *,
    scheme: str = "http",
    max_depth: int = 3,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """The full self-seeding discovery loop: each host's ``robots.txt``
    is fetched through the store, its global ``Sitemap:`` directives
    (RFC 9309 §2.3) collected in host order, and the combined sitemap
    tree expanded via :func:`sitemaps_to_frontier`. Hosts without a
    robots.txt or without Sitemap lines contribute nothing. Driver
    state is O(hosts + sitemap files) — the spec-bounded tree, never
    page URLs."""
    from ..functions.robotskit import parse_robots_sitemaps
    from ..functions.urlkit import canonicalize_url

    robots_urls = [
        canonicalize_url(f"{scheme}://{h}/robots.txt") for h in hosts
    ]
    fetcher = store.make_fetcher()
    bodies = _fetch_bodies(fetcher, robots_urls)
    sitemap_urls: list[str] = []
    for body in bodies:
        if body:
            try:
                text = body.decode("utf-8")
            except UnicodeDecodeError:
                continue
            sitemap_urls.extend(parse_robots_sitemaps(text))
    return sitemaps_to_frontier(
        store, sitemap_urls, max_depth=max_depth, num_buckets=num_buckets
    )
