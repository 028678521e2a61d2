"""Live-HTTP fetch path against a localhost http.server: the real-crawl
realization of the fetcher interface (S2/ST1/ST4 with actual sockets),
including retry-on-transient-failure and robots over HTTP."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.http import HttpPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages

from .oracle_crawler import crawl_oracle


@pytest.fixture(scope="module")
def http_site():
    pages, seeds = synth_pages(
        num_listing_pages=2, seed=33, robots_denied_every=6
    )
    by_path = {}
    for r in pages.to_pylist():
        path = "/" + r["url"].split("/", 3)[3]
        by_path[path] = r["html"]
    flaky_state = {"/flaky": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/r/1":
                self.send_response(301)
                self.send_header("Location", "/r/2")
                self.end_headers()
                return
            elif self.path == "/r/2":
                self.send_response(301)
                self.send_header("Location", "/r/final")
                self.end_headers()
                return
            elif self.path == "/r/final":
                body = b"<html><body>redirect target</body></html>"
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.end_headers()
                self.wfile.write(body)
                return
            elif self.path == "/flaky":
                flaky_state["/flaky"] += 1
                if flaky_state["/flaky"] < 3:
                    self.send_response(503)
                    self.end_headers()
                    return
                body = b"<html><body>finally ok</body></html>"
            elif self.path in by_path:
                body = by_path[self.path]
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    yield pages, seeds, base, flaky_state
    srv.shutdown()


def _rebase(url: str, base: str) -> str:
    return base + "/" + url.split("/", 3)[3]


def test_http_fetcher_direct(http_site):
    pages, _, base, flaky = http_site
    store = HttpPageStore(rate_per_host=1000.0, backoff_s=0.0, timeout_s=5.0)
    f = store.make_fetcher()
    some = [_rebase(r["url"], base) for r in pages.slice(0, 5).to_pylist()]
    out = f.fetch(some + [base + "/nope"])
    st = out["fetch_status"].to_pylist()
    assert st[:5] == ["ok"] * 5
    assert st[5] == "notfound"
    assert out["html"][0].as_py() == pages["html"][0].as_py()  # byte-identical


def test_http_retry_on_transient_failure(http_site):
    _, _, base, flaky = http_site
    flaky["/flaky"] = 0
    store = HttpPageStore(rate_per_host=1000.0, backoff_s=0.0, max_retries=3)
    out = store.make_fetcher().fetch([base + "/flaky"])
    assert out["fetch_status"][0].as_py() == "ok"  # 2x503 then 200
    assert flaky["/flaky"] == 3


def test_live_crawl_matches_oracle(ray_session, http_site, tmp_path):
    """Full crawl over real sockets equals the sequential oracle on the
    same logical site (URLs rebased to the local server; robots active)."""
    pages, seeds, base, _ = http_site
    live_seeds = [_rebase(u, base) for u in seeds if "neko-jirushi" in u]
    cfg = CrawlConfig(host_budget_per_round=30, max_rounds=15, seen_shards=2)
    store = HttpPageStore(rate_per_host=10_000.0, backoff_s=0.0, timeout_s=5.0)
    res = crawl(store, live_seeds, str(tmp_path / "live"), cfg)

    # oracle over the same logical site, rebased page map
    page_map = {}
    for r in pages.to_pylist():
        page_map[canonicalize_url(_rebase(r["url"], base))] = (
            r["html"].decode("utf-8").replace("https://www.neko-jirushi.com", base)
        )
    # links inside pages are root-relative (/foster/...), so no rebasing of
    # bodies is actually needed for same-host traversal; minor-host links
    # are absolute and point off-site (fetched as notfound or skipped)
    oracle = crawl_oracle(page_map, live_seeds, host_budget_per_round=30, max_rounds=15)
    got = [(v["url"], v["fetch_status"]) for v in res.visits.to_pylist()
           if v["url"].startswith(base)]
    want = [(w.url, w.fetch_status) for w in oracle.visits if w.url.startswith(base)]
    assert got == want
    statuses = {s for _, s in got}
    assert "robots_denied" in statuses and "ok" in statuses


def test_live_mode_host_aligned_partitioning():
    """In live-HTTP mode each host's round rows must land in one task so
    the per-worker token bucket enforces the TRUE per-host rate."""
    from webscrape_neko_jirushi_ray.pipelines.crawl import (
        _slice_parts,
        seeds_to_frontier,
    )

    urls = [f"http://h{i % 5}.example.org/p/{i}/" for i in range(2000)]
    work = seeds_to_frontier(urls).sort_by("host")
    parts = _slice_parts(work, 16, host_aligned=True)
    assert sum(p.num_rows for p in parts) == 2000
    seen_hosts = {}
    for pid, p in enumerate(parts):
        for h in set(p["host"].to_pylist()):
            assert h not in seen_hosts, f"host {h} split across parts"
            seen_hosts[h] = pid
    assert len(seen_hosts) == 5
    # non-aligned slicing keeps row count too
    plain = _slice_parts(work, 16, host_aligned=False)
    assert sum(p.num_rows for p in plain) == 2000


def test_redirect_chain_fetch_and_seen(ray_session, http_site, tmp_path):
    """301 chain /r/1 -> /r/2 -> /r/final: ONE fetch follows the chain,
    the visit records the canonical final URL in redirect_to, and BOTH the
    alias and the final URL end up in the seen-set — so a later discovery
    of the final URL is never fetched again."""
    from webscrape_neko_jirushi_ray.functions.urlkit import url_sha1
    from webscrape_neko_jirushi_ray.state.seen import ShardedSeenSet

    _, _, base, _ = http_site
    # fetcher-level: final body + final_url surfaced
    store = HttpPageStore(rate_per_host=1000.0, backoff_s=0.0, timeout_s=5.0)
    out = store.make_fetcher().fetch([base + "/r/1"])
    assert out["fetch_status"][0].as_py() == "ok"
    assert out["final_url"][0].as_py().endswith("/r/final")
    assert b"redirect target" in out["html"][0].as_py()

    # crawl-level: redirect_to in visits + both identities seen
    seen = ShardedSeenSet(2, "exact")
    try:
        cfg = CrawlConfig(
            host_budget_per_round=10, max_rounds=3, seen_shards=2,
            respect_robots=False,
        )
        res = crawl(
            store, [base + "/r/1"], str(tmp_path / "rc"), cfg, seen_set=seen
        )
        v = res.visits_table().to_pandas()
        assert len(v) == 1
        alias = canonicalize_url(base + "/r/1")
        final = canonicalize_url(base + "/r/final")
        assert v.iloc[0]["url"] == alias
        assert v.iloc[0]["fetch_status"] == "ok"
        assert v.iloc[0]["redirect_to"] == final
        marks = seen.contains([url_sha1(alias), url_sha1(final)])
        assert list(marks) == [True, True]
    finally:
        seen.shutdown()


@pytest.fixture(scope="module")
def slow_multi_site():
    """Four localhost servers (four distinct host:port identities), each
    adding a small latency and tracking in-flight concurrency."""
    import time as _time

    state = {"inflight": 0, "max_inflight": 0, "hits": []}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                state["inflight"] += 1
                state["max_inflight"] = max(
                    state["max_inflight"], state["inflight"]
                )
                state["hits"].append((self.server.server_port, _time.monotonic()))
            _time.sleep(0.08)
            body = f"<html><body>page {self.path}</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)
            with lock:
                state["inflight"] -= 1

        def log_message(self, *a):
            pass

    servers = [ThreadingHTTPServer(("127.0.0.1", 0), Handler) for _ in range(4)]
    for s in servers:
        threading.Thread(target=s.serve_forever, daemon=True).start()
    bases = [f"http://127.0.0.1:{s.server_port}" for s in servers]
    yield bases, state
    for s in servers:
        s.shutdown()


def test_concurrent_fetch_matches_sequential(slow_multi_site):
    """concurrency>1 must return the identical result table (same rows,
    same order) while actually overlapping requests across hosts
    (VERDICT r3 #6)."""
    bases, state = slow_multi_site
    urls = [f"{b}/p/{i}" for i in range(3) for b in bases]  # 12 across 4 hosts
    seq = HttpPageStore(
        rate_per_host=10_000.0, backoff_s=0.0, timeout_s=5.0
    ).make_fetcher().fetch(urls)
    state["max_inflight"] = 0
    conc = HttpPageStore(
        rate_per_host=10_000.0, backoff_s=0.0, timeout_s=5.0, concurrency=8
    ).make_fetcher().fetch(urls)
    assert conc["url"].to_pylist() == seq["url"].to_pylist() == urls
    assert conc["fetch_status"].to_pylist() == seq["fetch_status"].to_pylist()
    assert conc["html"].to_pylist() == seq["html"].to_pylist()
    assert state["max_inflight"] > 1, "requests never overlapped"


def test_concurrent_fetch_keeps_per_host_politeness(slow_multi_site):
    """With a tight per-host rate and concurrency>1, one host's requests
    must stay spaced at ~1/rate even though threads issue them — the
    token-bucket claim is shared and lock-protected."""
    bases, state = slow_multi_site
    base = bases[0]
    port = int(base.rsplit(":", 1)[1])
    urls = [f"{base}/q/{i}" for i in range(4)]
    state["hits"].clear()
    store = HttpPageStore(
        rate_per_host=10.0, burst=1.0, backoff_s=0.0, timeout_s=5.0,
        concurrency=4,
    )
    out = store.make_fetcher().fetch(urls)
    assert out["fetch_status"].to_pylist() == ["ok"] * 4
    ts = sorted(t for p, t in state["hits"] if p == port)
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    # nominal spacing is 0.1 s; allow generous scheduling slack but catch
    # the failure mode (all four issued at once -> gaps ~0)
    assert all(g >= 0.05 for g in gaps), gaps


def test_live_crawl_concurrent_matches_oracle(ray_session, http_site, tmp_path):
    """The VERDICT r3 #6 'done' bar: a live crawl with in-actor fetch
    concurrency > 1 produces the same visit sequence as the sequential
    oracle (output rows land by input index, so ordering is preserved)."""
    pages, seeds, base, _ = http_site
    live_seeds = [_rebase(u, base) for u in seeds if "neko-jirushi" in u]
    cfg = CrawlConfig(host_budget_per_round=30, max_rounds=15, seen_shards=2)
    store = HttpPageStore(
        rate_per_host=10_000.0, backoff_s=0.0, timeout_s=5.0, concurrency=8
    )
    res = crawl(store, live_seeds, str(tmp_path / "live_c"), cfg)
    page_map = {}
    for r in pages.to_pylist():
        page_map[canonicalize_url(_rebase(r["url"], base))] = (
            r["html"].decode("utf-8").replace("https://www.neko-jirushi.com", base)
        )
    oracle = crawl_oracle(
        page_map, live_seeds, host_budget_per_round=30, max_rounds=15
    )
    got = [(v["url"], v["fetch_status"]) for v in res.visits.to_pylist()
           if v["url"].startswith(base)]
    want = [(w.url, w.fetch_status) for w in oracle.visits if w.url.startswith(base)]
    assert got == want


def test_fetch_fn_serializable_with_http_fetcher_cached(ray_session):
    """Regression: a driver-side inline round that memoizes an HttpFetcher
    (thread lock + pool since r4) must not poison serialization of later
    fetch stages — the memo global must never be captured by value into a
    fetch closure (cloudpickle captures a NESTED function's referenced
    globals by value; the lookup therefore lives in a module-level fn)."""
    from ray import cloudpickle

    from webscrape_neko_jirushi_ray.pipelines import crawl as crawl_mod
    from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
    from webscrape_neko_jirushi_ray.synth import synth_pages

    store = HttpPageStore(rate_per_host=1000.0, concurrency=4)
    key = (store.cache_key(), True)
    crawl_mod._FETCHER_CACHE[key] = crawl_mod.FetchExtractActor(
        store, respect_robots=True
    )
    try:
        pages, _ = synth_pages(num_listing_pages=1, seed=1)
        fn = crawl_mod.make_fetch_extract_fn(BroadcastPageStore(pages))
        cloudpickle.dumps(fn)  # raises if the cache contents ride along
    finally:
        crawl_mod._FETCHER_CACHE.pop(key, None)


def test_retry_after_defers_host_bucket():
    """A 429 with Retry-After: n makes the fetcher (a) wait >= n before
    the retry and (b) push the HOST bucket into an n-second debt so every
    later request to that host backs off too."""
    import threading as _t
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from webscrape_neko_jirushi_ray.sources.http import HttpPageStore

    state = {"fails": 1}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/throttled" and state["fails"] > 0:
                state["fails"] -= 1
                self.send_response(429)
                self.send_header("Retry-After", "7")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html><body>ok</body></html>")

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        clock = {"t": 0.0}
        sleeps = []

        def fake_sleep(s):
            sleeps.append(s)
            clock["t"] += s

        store = HttpPageStore(
            rate_per_host=1000.0, backoff_s=0.5, timeout_s=5.0,
            sleep=fake_sleep, clock=lambda: clock["t"],
        )
        f = store.make_fetcher()
        out = f.fetch([base + "/throttled"])
        assert out["fetch_status"][0].as_py() == "ok"
        assert any(s >= 7.0 for s in sleeps), sleeps  # server-directed pause
        # the defer landed on the HOST bucket: freeze the clock mid-debt
        # and a fresh claim must queue behind the remaining window
        host = f"127.0.0.1:{srv.server_port}"
        f.limiter.defer(host, 7.0, clock["t"])
        assert f.limiter.wait_time(host, clock["t"]) >= 7.0
    finally:
        srv.shutdown()


def test_circuit_breaker_short_circuits_failing_host():
    """After `circuit_threshold` consecutive hard failures on a host, its
    remaining URLs return 'skipped_circuit' WITHOUT hitting the server;
    a success resets the streak; 404s never count."""
    import threading as _t
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from webscrape_neko_jirushi_ray.sources.http import HttpPageStore

    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if self.path.startswith("/bad"):
                self.send_response(500)
                self.end_headers()
                return
            if self.path.startswith("/gone"):
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html><body>ok</body></html>")

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        store = HttpPageStore(
            rate_per_host=1000.0, backoff_s=0.0, timeout_s=5.0,
            max_retries=1, circuit_threshold=2, sleep=lambda s: None,
            clock=lambda: 0.0,
        )
        f = store.make_fetcher()
        # a 404 then a success: neither counts toward the circuit
        out = f.fetch([base + "/gone1", base + "/ok1"])
        assert out["fetch_status"].to_pylist() == ["notfound", "ok"]
        out = f.fetch(
            [base + "/bad1", base + "/bad2", base + "/bad3", base + "/bad4"]
        )
        assert out["fetch_status"].to_pylist() == [
            "error:500", "error:500", "skipped_circuit", "skipped_circuit"
        ]
        n_hits = len(hits)
        # circuit stays open: no further server traffic for this host
        out = f.fetch([base + "/bad5", base + "/ok2"])
        assert out["fetch_status"].to_pylist() == [
            "skipped_circuit", "skipped_circuit"
        ]
        assert len(hits) == n_hits
        # a fresh fetcher (new worker / recrawl) starts closed again
        f2 = store.make_fetcher()
        out = f2.fetch([base + "/ok2"])
        assert out["fetch_status"].to_pylist() == ["ok"]
    finally:
        srv.shutdown()


def test_retry_after_defer_on_final_attempt():
    """ADVICE r4: a 429 + Retry-After on the LAST retry attempt must
    still push the host bucket into debt (ST4: every thread of the
    worker backs off the backpressuring host), even though no local
    retry follows."""
    import threading as _t
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from webscrape_neko_jirushi_ray.sources.http import HttpPageStore

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            # ALWAYS throttled — the fetch exhausts its retries
            self.send_response(429)
            self.send_header("Retry-After", "9")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        clock = {"t": 0.0}

        def fake_sleep(s):
            clock["t"] += s

        store = HttpPageStore(
            rate_per_host=1000.0, backoff_s=0.1, timeout_s=5.0,
            max_retries=1,  # the one attempt IS the final attempt
            sleep=fake_sleep, clock=lambda: clock["t"],
        )
        f = store.make_fetcher()
        out = f.fetch([base + "/x"])
        assert out["fetch_status"][0].as_py() == "error:429"
        host = f"127.0.0.1:{srv.server_port}"
        # the host bucket carries the server-directed debt: a fresh
        # claim at the post-fetch clock must wait out the window
        assert f.limiter.wait_time(host, clock["t"]) >= 8.0
    finally:
        srv.shutdown()
