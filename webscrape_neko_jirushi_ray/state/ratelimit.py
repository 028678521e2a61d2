"""Politeness: per-host token buckets + the deterministic budget mode.

The reference paces itself with unconditional random sleeps
(comprehensive_scraper.py:252,329-331 — 3-7s between listing pages, 0.5-1.5s
between images; config.py:8-9). Two rebuild forms:

- ``TokenBucket`` — the real-crawl form, held inside fetch actors (ST1/ST4):
  refill-rate tokens/sec per host, take() blocks logically (returns wait
  time; the actor sleeps). Unit-tested on token math with an injected clock
  (no wall-clock in tests).
- deterministic budget — the golden-fixture form used by the crawl loop:
  at most ``host_budget_per_round`` fetches per true host per BFS round
  (CrawlConfig). This makes crawl order a pure function of seeds+budget,
  which is what the reference's golden fixtures pin.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TokenBucket:
    """Classic token bucket; ``now`` is injected for determinism."""

    rate: float          # tokens per second
    burst: float         # bucket capacity
    tokens: float = field(default=0.0)
    last_ts: float = field(default=0.0)

    def __post_init__(self) -> None:
        self.tokens = self.burst

    def take(self, now: float, n: float = 1.0) -> float:
        """Consume n tokens at time ``now``; returns seconds the caller must
        wait before the request may be issued (0.0 = immediately).

        The balance may go negative (a debt): a caller that is told to wait
        has already claimed its token, so back-to-back calls can't
        double-spend the same future refill — the long-run rate is exactly
        ``rate`` regardless of call pattern."""
        elapsed = max(0.0, now - self.last_ts)
        self.tokens = min(self.burst, self.tokens + elapsed * self.rate)
        self.last_ts = now
        self.tokens -= n
        if self.tokens >= 0:
            return 0.0
        return -self.tokens / self.rate


class HostRateLimiter:
    """Per-host token buckets, lazily created. Lives inside a fetch actor;
    one limiter per actor means global politeness holds only if all URLs of
    a host route to the same actor — the crawl loop guarantees that by
    hashing the TRUE host to an actor slot (see pipelines/crawl.py)."""

    def __init__(self, rate: float = 0.5, burst: float = 2.0):
        self.rate = rate
        self.burst = burst
        self.buckets: dict[str, TokenBucket] = {}

    def wait_time(self, host: str, now: float) -> float:
        b = self.buckets.get(host)
        if b is None:
            b = self.buckets[host] = TokenBucket(self.rate, self.burst)
        return b.take(now)

    def set_rate(self, host: str, rate: float) -> None:
        """Override one host's refill rate (e.g. robots Crawl-delay)."""
        b = self.buckets.get(host)
        if b is None:
            self.buckets[host] = TokenBucket(rate, self.burst)
        else:
            b.rate = rate

    def defer(self, host: str, seconds: float, now: float) -> None:
        """Push one host's bucket into debt so its NEXT claim waits at
        least ``seconds`` from ``now`` (server-directed backpressure:
        HTTP 429/503 Retry-After). Monotone — an already-deeper debt is
        kept; other hosts are unaffected."""
        b = self.buckets.get(host)
        if b is None:
            b = self.buckets[host] = TokenBucket(self.rate, self.burst)
        elapsed = max(0.0, now - b.last_ts)
        b.tokens = min(b.burst, b.tokens + elapsed * b.rate)
        b.last_ts = now
        b.tokens = min(b.tokens, -seconds * b.rate)
