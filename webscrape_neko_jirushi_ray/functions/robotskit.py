"""robots.txt parsing + allow/deny decisions.

The reference crawls a single site with no robots handling; the north-star
engine (BASELINE.json) carries "robots.txt caches in stateful fetch
actors", so the rebuild implements the standard semantics (public
robots-exclusion protocol, RFC 9309 shape):

- only ``User-agent: *`` groups are honored (we present no specific agent);
- ``Disallow:`` / ``Allow:`` rules are path patterns with RFC 9309
  wildcards: ``*`` matches any char sequence, a trailing ``$`` anchors the
  end of the path; anything else is a literal prefix;
- decision = most-specific (longest PATTERN) matching rule wins; tie →
  Allow; no match → Allow;
- empty ``Disallow:`` means allow-all; a missing robots.txt (404) allows
  all; an UNREACHABLE robots.txt (5xx / timeout) disallows all in the
  live-HTTP path (fail-closed — see pipelines/crawl.py:_robots_rules).

Pure functions — the per-host cache lives in the fetch stage
(pipelines/crawl.py), built once per worker like the session state (ST1).
"""

from __future__ import annotations

import re

ROBOTS_PATH = "/robots.txt"

# rules that unconditionally disallow everything (the fail-closed sentinel
# the fetch stage installs when robots.txt is unreachable)
DISALLOW_ALL: list[tuple[bool, str]] = [(False, "/")]


def robots_url_for(canon_url: str) -> str:
    """https://host[:port]/robots.txt for the URL's origin."""
    scheme_host = canon_url.split("/", 3)
    return f"{scheme_host[0]}//{scheme_host[2]}{ROBOTS_PATH}"


def parse_robots(text: str) -> list[tuple[bool, str]]:
    """robots.txt body → [(allow, path_prefix)] for the ``*`` agent.

    Deterministic: rules in file order; group state machine per RFC 9309
    (a group's user-agent lines precede its rules; rules bind to every
    agent named above them since the last rule)."""
    return parse_robots_full(text)[0]


def parse_robots_full(text: str) -> tuple[list[tuple[bool, str]], float | None]:
    """(rules, crawl_delay_seconds) for the ``*`` agent. ``Crawl-delay`` is
    a de-facto extension honored by major crawlers; it feeds the per-host
    token bucket (rate = 1/delay) in the live-HTTP path."""
    rules: list[tuple[bool, str]] = []
    crawl_delay: float | None = None
    applies = False
    in_agent_block = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_block:
                applies = False
            in_agent_block = True
            if value == "*":
                applies = True
        else:
            in_agent_block = False
            if not applies:
                continue
            if field == "disallow":
                if value:  # empty disallow = allow all (no rule)
                    rules.append((False, value))
            elif field == "allow" and value:
                rules.append((True, value))
            elif field == "crawl-delay":
                try:
                    crawl_delay = float(value)
                except ValueError:
                    pass
    return rules, crawl_delay


# compiled-pattern cache: robots rule strings repeat across hosts and
# rounds; compiling once per distinct pattern keeps the per-URL check a
# C-level regex match
_PATTERN_CACHE: dict[str, "re.Pattern[str]"] = {}


def _compile_rule(pattern: str) -> "re.Pattern[str]":
    rx = _PATTERN_CACHE.get(pattern)
    if rx is None:
        anchored_end = pattern.endswith("$")
        body = pattern[:-1] if anchored_end else pattern
        # escape everything, then turn escaped \* back into .*
        esc = re.escape(body).replace(r"\*", ".*")
        rx = re.compile("^" + esc + ("$" if anchored_end else ""))
        _PATTERN_CACHE[pattern] = rx
    return rx


def _rule_matches(pattern: str, path: str) -> bool:
    """RFC 9309 match: ``*`` = any sequence, trailing ``$`` = end anchor,
    else prefix. The common wildcard-free case stays a plain startswith."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    return _compile_rule(pattern).match(path) is not None


def is_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Most-specific-match decision (longest pattern, per RFC 9309 §2.2.2);
    tie → allow; no match → allow."""
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if len(pattern) >= best_len and _rule_matches(pattern, path):
            if len(pattern) > best_len or allow:
                best_len = len(pattern)
                best_allow = allow
    return best_allow


def path_of(canon_url: str) -> str:
    parts = canon_url.split("/", 3)
    return "/" + parts[3] if len(parts) > 3 else "/"


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives of a robots.txt body, in file order.
    Per RFC 9309 §2.3 / sitemaps.org these are GLOBAL records — they
    apply regardless of any user-agent group — so no group state is
    involved; the value is an absolute URL."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out
