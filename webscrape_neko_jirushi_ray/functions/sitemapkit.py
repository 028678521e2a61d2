"""Sitemap (sitemaps.org XML) parsing — pure, byte-deterministic.

The reference crawler seeds from a hand-listed AJAX listing endpoint
(reference: comprehensive_scraper.py:299 — 22 cats/page pagination); a
general URL-frontier crawl seeds from the site's published sitemaps.
Same design rationale as ``htmlkit``: dependency-free regex parsing (no
lxml in the container, and at 100 TB the parser must be a pure function
of the bytes — no library version drift). Row-wise and pure; the Ray
engine calls these from ``sources/sitemaps.py`` inside ``map_batches``
and the tests call them row-wise as the oracle.

Handles the constructs real sitemaps use: ``<urlset>`` leaf files,
``<sitemapindex>`` nesting, CDATA-wrapped and entity-escaped ``<loc>``
values, namespace-prefixed tags (``<sm:loc>``), and gzip-compressed
bodies (``sitemap.xml.gz`` — RFC 1952 magic sniff, not extension)."""

from __future__ import annotations

import gzip
import html as _htmllib
import re

# namespace-prefixed tags (<sm:loc>) are legal; match an optional prefix
_LOC_RE = re.compile(
    rb"<(?:[A-Za-z_][\w.-]*:)?loc(?:\s[^>]*)?>(.*?)"
    rb"</(?:[A-Za-z_][\w.-]*:)?loc\s*>",
    re.S | re.I,
)
_INDEX_RE = re.compile(rb"<(?:[A-Za-z_][\w.-]*:)?sitemapindex[\s>]", re.I)
_URLSET_RE = re.compile(rb"<(?:[A-Za-z_][\w.-]*:)?urlset[\s>]", re.I)
_CDATA_RE = re.compile(rb"^<!\[CDATA\[(.*)\]\]>$", re.S)


def parse_sitemap(body: bytes | None) -> tuple[bool, list[str]]:
    """``(is_index, locs)`` of one sitemap document. ``is_index`` is True
    for a ``<sitemapindex>`` (locs are CHILD SITEMAP urls), False for a
    ``<urlset>`` or anything else (locs are PAGE urls; a body with no
    recognizable root yields no locs rather than raising — crawl loops
    must survive junk bytes). Gzip bodies are decompressed first; a
    corrupt gzip stream also yields ``(False, [])``."""
    if not body:
        return False, []
    if body[:2] == b"\x1f\x8b":
        try:
            body = gzip.decompress(body)
        except OSError:
            return False, []
    is_index = bool(_INDEX_RE.search(body))
    if not is_index and not _URLSET_RE.search(body):
        return False, []
    locs: list[str] = []
    for m in _LOC_RE.finditer(body):
        raw = m.group(1).strip()
        cd = _CDATA_RE.match(raw)
        if cd:
            raw = cd.group(1).strip()
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        text = _htmllib.unescape(text).strip()
        if text:
            locs.append(text)
    return is_index, locs
