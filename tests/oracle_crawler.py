"""Sequential reference-semantics crawler: the golden-order oracle.

A tiny single-threaded BFS-with-host-priority crawler implementing exactly
the pinned ordering contract of ``pipelines/crawl.py`` (which itself
re-expresses the reference's sequential loop,
/root/reference/comprehensive_scraper.py:284-347, under a deterministic
politeness budget). The engine's distributed execution must reproduce this
visit sequence and final URL-seen set bit-for-bit.

Pure Python, no Ray — every structure is a plain dict/list so the oracle is
obviously correct by inspection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from webscrape_neko_jirushi_ray.functions.htmlkit import extract_links
from webscrape_neko_jirushi_ray.functions.robotskit import (
    is_allowed,
    parse_robots,
    path_of,
    robots_url_for,
)
from webscrape_neko_jirushi_ray.functions.urlkit import canonicalize_url, url_sha1


@dataclass
class OracleVisit:
    visit_idx: int
    url: str
    sha1: bytes
    host: str
    depth: int
    discovery_seq: int
    round: int
    fetch_status: str


@dataclass
class OracleResult:
    visits: list[OracleVisit] = field(default_factory=list)

    def order(self) -> list[str]:
        return [v.url for v in self.visits]

    def seen_sha1s(self) -> set[bytes]:
        return {v.sha1 for v in self.visits if v.fetch_status == "ok"}


def crawl_oracle(
    pages: dict[str, str],
    seed_urls: list[str],
    host_budget_per_round: int,
    max_rounds: int = 50,
    target_urls: int | None = None,
    respect_robots: bool = True,
) -> OracleResult:
    """``pages``: canonical url -> html string (the page table)."""
    res = OracleResult()
    enqueued: set[bytes] = set()
    robots_cache: dict[str, list] = {}

    def allowed(url: str, host: str) -> bool:
        if not respect_robots:
            return True
        rules = robots_cache.get(host)
        if rules is None:
            body = pages.get(canonicalize_url(robots_url_for(url)))
            rules = parse_robots(body) if body else []
            robots_cache[host] = rules
        return True if not rules else is_allowed(rules, path_of(url))
    # pending rows: (url, sha1, host, depth, seq)
    pending: list[tuple[str, bytes, str, int, int]] = []
    next_seq = 0
    for u in seed_urls:
        cu = canonicalize_url(u)
        s = url_sha1(cu)
        if s in enqueued:
            continue
        enqueued.add(s)
        pending.append((cu, s, cu.split("/")[2], 0, next_seq))
        next_seq += 1

    visited_total = 0
    for rnd in range(max_rounds):
        if not pending or (target_urls is not None and visited_total >= target_urls):
            break
        # per-host budget: the B smallest seqs per host
        by_host: dict[str, list[tuple]] = {}
        for row in pending:
            by_host.setdefault(row[2], []).append(row)
        taken: list[tuple] = []
        deferred: list[tuple] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: r[4])
            taken.extend(rows[:host_budget_per_round])
            deferred.extend(rows[host_budget_per_round:])
        # visit order: (host_priority = min taken seq of host, seq)
        prio = {}
        for row in taken:
            prio[row[2]] = min(prio.get(row[2], 1 << 62), row[4])
        taken.sort(key=lambda r: (prio[r[2]], r[4]))
        if target_urls is not None:
            room = target_urls - visited_total
            deferred.extend(taken[room:])
            taken = taken[:room]
        if not taken:
            break
        for url, s, host, depth, seq in taken:
            if not allowed(url, host):
                res.visits.append(
                    OracleVisit(
                        visited_total, url, s, host, depth, seq, rnd, "robots_denied"
                    )
                )
                visited_total += 1
                continue
            html = pages.get(url)
            status = "ok" if html is not None else "notfound"
            res.visits.append(
                OracleVisit(visited_total, url, s, host, depth, seq, rnd, status)
            )
            visited_total += 1
            if html is None:
                continue
            for link in extract_links(url, html):
                cu = canonicalize_url(link)
                sl = url_sha1(cu)
                if sl in enqueued:
                    continue
                enqueued.add(sl)
                deferred.append((cu, sl, cu.split("/")[2], depth + 1, next_seq))
                next_seq += 1
        pending = deferred
    return res
