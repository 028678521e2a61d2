"""Real HTTP fetch path (stdlib urllib — no external deps).

The reference fetches with requests.Session + retry/backoff
(comprehensive_scraper.py:32-42,126-137: 3 attempts, backoff between
tries, sticky headers from config.py:38-45). This module is the live-HTTP
realization of the same fetcher interface the page stores expose, so the
crawl pipeline can run against a real site by swapping the store:

    crawl(HttpPageStore(rate=0.5), seeds, out_dir, cfg)

Politeness: a per-host token bucket (state/ratelimit.py) gates every
request inside the fetch worker; the deterministic budget in the crawl
loop still bounds per-round fan-out. Failures return fetch_status
('timeout' | 'error' | 'notfound') instead of raising — the reference's
failed-set semantics.

No network exists in the build sandbox; tests exercise this against a
localhost http.server (tests/test_http_fetch.py).
"""

from __future__ import annotations

import threading
import time
import urllib.error
import urllib.request

import pyarrow as pa

from ..state.ratelimit import HostRateLimiter

DEFAULT_HEADERS = {
    # a plain, honest UA (the reference spoofs a browser UA; we don't)
    "User-Agent": "webscrape-neko-jirushi-ray/0.1 (+research crawler)",
    "Accept": "text/html,application/xhtml+xml,*/*;q=0.8",
    "Accept-Language": "ja,en;q=0.7",
}


class HttpPageStore:
    """Store-compatible facade over live HTTP."""

    def __init__(
        self,
        rate_per_host: float = 0.5,
        burst: float = 2.0,
        timeout_s: float = 30.0,
        max_retries: int = 3,
        backoff_s: float = 2.0,
        headers: dict | None = None,
        concurrency: int = 1,
        circuit_threshold: int = 0,
        sleep=time.sleep,
        clock=time.monotonic,
    ):
        self.rate_per_host = rate_per_host
        self.burst = burst
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.headers = dict(headers or DEFAULT_HEADERS)
        self.concurrency = max(1, int(concurrency))
        # > 0 enables the per-host error CIRCUIT BREAKER: after this many
        # CONSECUTIVE hard failures (transport errors / 5xx — not 404s)
        # on one host, its remaining URLs short-circuit to
        # fetch_status='skipped_circuit' instead of burning retry budget
        # against a down host (host→worker affinity makes the per-worker
        # streak the host's global streak). 0 = off (golden-fixture mode).
        self.circuit_threshold = int(circuit_threshold)
        self._sleep = sleep
        self._clock = clock

    def cache_key(self) -> str:
        return (
            f"http:{self.rate_per_host}:{self.timeout_s}:"
            f"{self.concurrency}:{self.circuit_threshold}"
        )

    def make_fetcher(self) -> "HttpFetcher":
        return HttpFetcher(self)


class HttpFetcher:
    """One per fetch worker: opener + rate limiter state (ST1+ST4).

    ``store.concurrency`` > 1 issues requests from an in-actor thread
    pool (VERDICT r3 #6: a blocking sequential loop caps per-actor
    throughput at ~1/latency and politeness then serializes the fleet).
    The per-host token buckets stay authoritative: every thread CLAIMS
    its token under one lock (the bucket's debt semantics make
    concurrent claims queue politely — the Nth claim on a host is told
    to wait N/rate), then sleeps outside the lock, so distinct hosts
    proceed in parallel while a single host's requests stay spaced at
    the configured rate. Output row order always matches the input URL
    list (results land by index)."""

    def __init__(self, store: HttpPageStore):
        self.store = store
        self.limiter = HostRateLimiter(rate=store.rate_per_host, burst=store.burst)
        self.opener = urllib.request.build_opener()
        self.opener.addheaders = list(store.headers.items())
        self._sleep = store._sleep
        self._clock = store._clock
        self._claim_lock = threading.Lock()
        self._host_fail_streak: dict[str, int] = {}
        self._pool = None
        if store.concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=store.concurrency)

    # server-directed backoff is honored but bounded: a hostile or broken
    # Retry-After must not park a worker for hours
    RETRY_AFTER_CAP_S = 900.0

    def _get_once(
        self, url: str
    ) -> tuple[str, bytes | None, str, float | None]:
        """(status, body, final_url, retry_after). urllib follows
        redirects implicitly (the reference's requests does too,
        comprehensive_scraper.py:153); ``resp.geturl()`` surfaces the
        POST-redirect URL so the crawl can learn the page's canonical
        identity. ``retry_after`` is the parsed integer-seconds
        Retry-After of a 429/503 (the HTTP-date form is ignored —
        parsing wall-clock dates against an injected test clock would
        be meaningless)."""
        try:
            with self.opener.open(url, timeout=self.store.timeout_s) as resp:
                return "ok", resp.read(), resp.geturl(), None
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return "notfound", None, url, None
            ra = None
            if e.code in (429, 503):
                raw = (e.headers or {}).get("Retry-After")
                try:
                    ra = float(int(raw)) if raw is not None else None
                except (TypeError, ValueError):
                    ra = None
            return f"error:{e.code}", None, url, ra
        except urllib.error.URLError as e:
            if isinstance(getattr(e, "reason", None), TimeoutError):
                return "timeout", None, url, None
            return "error", None, url, None
        except TimeoutError:
            return "timeout", None, url, None

    def _get(self, url: str, host: str) -> tuple[str, bytes | None, str]:
        """Rate-limited GET with the reference's retry-with-backoff shape
        (comprehensive_scraper.py:126-137: retry transient failures up to
        max_retries with a pause; 404 is terminal). A 429/503 carrying
        Retry-After: n is SERVER-DIRECTED backpressure — the host's
        token bucket is pushed into an n-second debt (ST4: every thread
        of this worker backs off that host, not just the failing
        request) and the retry itself waits max(backoff, n), capped."""
        status, body, final = "error", None, url
        for attempt in range(self.store.max_retries):
            with self._claim_lock:
                wait = self.limiter.wait_time(host, self._clock())
            if wait > 0:
                self._sleep(wait)
            status, body, final, retry_after = self._get_once(url)
            if status == "ok" or status == "notfound":
                break
            if retry_after is not None:
                # server-directed backpressure debits the host bucket
                # UNCONDITIONALLY — even on the final attempt, the
                # worker's other threads must back off this host (ST4);
                # only the local sleep+retry needs attempts remaining
                ra = min(retry_after, self.RETRY_AFTER_CAP_S)
                with self._claim_lock:
                    self.limiter.defer(host, ra, self._clock())
            if attempt + 1 < self.store.max_retries:
                pause = self.store.backoff_s
                if retry_after is not None:
                    pause = max(pause, min(retry_after, self.RETRY_AFTER_CAP_S))
                self._sleep(pause)
        return status, body, final

    def _fetch_one(self, u: str):
        import datetime as _dt

        host = u.split("/", 3)[2] if "//" in u else ""
        thr = self.store.circuit_threshold
        if thr > 0:
            with self._claim_lock:
                tripped = self._host_fail_streak.get(host, 0) >= thr
            if tripped:
                # circuit OPEN: the host returned `thr` consecutive hard
                # failures — stop hammering it this worker/job; the rows
                # come back 'skipped_circuit' and a recrawl retries them
                return "skipped_circuit", None, u, _dt.datetime.utcnow()
        s, body, final = self._get(u, host)
        if thr > 0:
            with self._claim_lock:
                if s == "ok" or s == "notfound":
                    # 404 is a healthy server answering; only transport /
                    # 5xx-class failures count toward the circuit
                    self._host_fail_streak[host] = 0
                else:
                    self._host_fail_streak[host] = (
                        self._host_fail_streak.get(host, 0) + 1
                    )
        # live fetches do get a wall-clock capture time (this path is
        # inherently nondeterministic; golden fixtures use the stores)
        return s, body, final, _dt.datetime.utcnow()

    def fetch(self, urls: list[str]) -> pa.Table:
        if self._pool is not None and len(urls) > 1:
            results = list(self._pool.map(self._fetch_one, urls))
        else:
            results = [self._fetch_one(u) for u in urls]
        status = [r[0] for r in results]
        out_html = [r[1] for r in results]
        finals = [r[2] for r in results]
        out_ts = [r[3] for r in results]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(out_ts, type=pa.timestamp("us")),
                "html": pa.array(out_html, type=pa.binary()),
                "lang": pa.array([""] * len(urls), type=pa.string()),
                "fetch_status": pa.array(status, type=pa.string()),
                "final_url": pa.array(finals, type=pa.string()),
            }
        )
