"""Deterministic HTML parsing + extraction kernel.

Re-expresses the reference's BeautifulSoup-based extraction semantics
(/root/reference/comprehensive_scraper.py:157-203, smart_cat_discovery.py:
128-156,218-249) as a small, dependency-free, byte-deterministic parser.
The container has no bs4/lxml, and at 100 TB the parser must be a pure
function of the bytes anyway — no library version drift. The parser handles
the well-formed HTML our Common-Crawl-style page synthesizer emits plus
ordinary real-world constructs (attributes in any order/quoting, void tags,
comments, script/style blocks).

Every function here is row-wise and pure; the Ray engine calls them from
``stages/extract.py`` inside ``map_batches`` and the tests call them
row-wise as the oracle — the per-row invariant (BASELINE.json input_hint) is
"engine output byte-identical to the row-wise oracle per url".
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field

from ..config import (
    DESC_CLASS_RE,
    DESC_TAGS,
    DETAIL_CLASS_RE,
    DETAIL_TAGS,
    FOSTER_LINK_RE,
    IMAGE_KEEP_EXTENSIONS,
    IMAGE_KEEP_SUBSTRINGS,
    IMAGE_SELECTORS,
    LISTING_LINK_RE,
    NAME_CLASS_RE,
    NAME_TAGS,
    RELATED_CLASS_RE,
)
from .urlkit import absolutize, make_absolutizer

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_ATTR_RE = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*)")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DECL_RE = re.compile(r"<![^>]*>")
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
_WS_RE = re.compile(r"\s+")
_VOID_TAGS = frozenset(
    {"img", "br", "hr", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

_FOSTER_RE = re.compile(FOSTER_LINK_RE)
_LISTING_RE = re.compile(LISTING_LINK_RE)
_NAME_CLASS = re.compile(NAME_CLASS_RE)
_DESC_CLASS = re.compile(DESC_CLASS_RE)
_DETAIL_CLASS = re.compile(DETAIL_CLASS_RE)
_RELATED_CLASS = re.compile(RELATED_CLASS_RE)


@dataclass(slots=True)
class Node:
    """One element occurrence in document order."""

    tag: str
    attrs: dict[str, str]
    classes: tuple[str, ...]
    ancestor_classes: frozenset[str]
    related_depth: int          # >0 if inside a related|similar|recommend section
    order: int                  # document-order index
    text_parts: list[str] = field(default_factory=list)  # direct+descendant text

    @property
    def text(self) -> str:
        # get_text(strip=True) analog: concatenate, collapse, strip.
        return _WS_RE.sub(" ", "".join(self.text_parts)).strip()


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val[:1] in "\"'":
            val = val[1:-1]
        if name not in attrs:
            attrs[name] = _htmllib.unescape(val)
    return attrs


def parse_html(html: str) -> list[Node]:
    """Single-pass tag tokenizer producing document-order element nodes with
    ancestor-class context and aggregated inner text. O(n) in input size."""
    html = _SCRIPT_RE.sub(" ", html)
    html = _STYLE_RE.sub(" ", html)
    html = _COMMENT_RE.sub(" ", html)
    html = _DECL_RE.sub(" ", html)

    nodes: list[Node] = []
    stack: list[Node] = []
    anc_classes: list[str] = []       # flat multiset of open-element classes
    related_depth = 0
    pos = 0
    order = 0
    for m in _TAG_RE.finditer(html):
        text = html[pos : m.start()]
        if text and stack:
            piece = _htmllib.unescape(text)
            for open_node in stack:
                open_node.text_parts.append(piece)
        pos = m.end()
        closing, tag, raw_attrs = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            # pop to the matching open tag (tolerate stray closes)
            for i in range(len(stack) - 1, -1, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    # rebuild context from the remaining stack (stacks are shallow)
                    anc_classes = [c for n in stack for c in n.classes]
                    related_depth = sum(
                        1 for n in stack
                        if n.tag in ("div", "section") and any(_RELATED_CLASS.search(c) for c in n.classes)
                    )
                    break
            continue
        # ~25% of open tags carry no attributes — skip the finditer pass
        attrs = _parse_attrs(raw_attrs) if raw_attrs and not raw_attrs.isspace() else {}
        classes = tuple(attrs.get("class", "").split()) if attrs.get("class") else ()
        node = Node(
            tag=tag,
            attrs=attrs,
            classes=classes,
            ancestor_classes=frozenset(anc_classes),
            related_depth=related_depth,
            order=order,
        )
        order += 1
        nodes.append(node)
        if tag not in _VOID_TAGS:
            stack.append(node)
            anc_classes.extend(classes)
            if tag in ("div", "section") and any(_RELATED_CLASS.search(c) for c in classes):
                related_depth += 1
    return nodes


# --- text extraction (the byte-identical per-url invariant) ---------------


def extract_text(html: str) -> str:
    """Boilerplate-stripping text extraction (trafilatura-style slot; the
    reference has no boilerplate stripper, so this pins OUR contract):
    drop script/style/comments, strip all tags, decode entities, collapse
    all whitespace runs to single spaces, strip ends. Byte-stable: a pure
    function of the HTML bytes."""
    s = _SCRIPT_RE.sub(" ", html)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _DECL_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    return _WS_RE.sub(" ", s).strip()


# --- image-link harvest (M3/M4/M10) ---------------------------------------


def harvest_images(
    page_url: str, html: str, api_image: str = "", api_caption: str = ""
) -> list[dict[str, str]]:
    """The reference's selector-cascade image harvest
    (comprehensive_scraper.py:157-203), byte-deterministically:

    for each selector in the fixed priority order, scan <img> nodes in
    document order; src = src or data-src; absolutize; keep-first dedup by
    URL (M10); keep only if 'cat'/'foster' in URL or an image extension
    (predicate at :184-187). Finally prepend the API row's image_1 if not
    already present (M4, :196-203).
    """
    return _harvest_from_nodes(parse_html(html), page_url, api_image, api_caption)


def _harvest_from_nodes(
    all_nodes: list[Node], page_url: str, api_image: str = "", api_caption: str = ""
) -> list[dict[str, str]]:
    nodes = [n for n in all_nodes if n.tag == "img"]
    images: list[dict[str, str]] = []
    seen: set[str] = set()
    _abs = make_absolutizer(page_url)

    def matches(node: Node, kind: str, arg: str) -> bool:
        if kind == "src_contains":
            src = node.attrs.get("src", "")
            return arg in src
        # ancestor_class
        return arg in node.ancestor_classes

    for kind, arg in IMAGE_SELECTORS:
        for node in nodes:
            if not matches(node, kind, arg):
                continue
            src = node.attrs.get("src") or node.attrs.get("data-src") or ""
            if not src:
                continue
            if not src.startswith("http"):
                src = _abs(src)
                if not src:
                    continue
            low = src.lower()
            if src in seen:
                continue
            if any(s in low for s in IMAGE_KEEP_SUBSTRINGS) or any(
                e in low for e in IMAGE_KEEP_EXTENSIONS
            ):
                seen.add(src)
                images.append(
                    {
                        "url": src,
                        "alt": node.attrs.get("alt", ""),
                        "title": node.attrs.get("title", ""),
                    }
                )
    if api_image:
        main = api_image if api_image.startswith("http") else _abs(api_image)
        if main and main not in seen:
            images.insert(0, {"url": main, "alt": api_caption, "title": api_caption})
    return images


# --- frontier link extraction (M5) ----------------------------------------


def extract_links(page_url: str, html: str) -> list[str]:
    """Anchors whose href matches ``/foster/\\d+/`` (all of them — the
    reference's second 'related-sections' pass at
    smart_cat_discovery.py:145-151 adds to the same set, so one pass with
    keep-first dedup is semantically identical), plus listing pagination
    links (?p=N — the Parquet-world analog of API pagination at
    comprehensive_scraper.py:264-282). Absolutized, document order,
    keep-first dedup."""
    return _links_from_nodes(parse_html(html), page_url)


def _links_from_nodes(all_nodes: list[Node], page_url: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    _abs = make_absolutizer(page_url)
    for n in all_nodes:
        if n.tag != "a":
            continue
        href = n.attrs.get("href", "")
        if not href:
            continue
        if _FOSTER_RE.search(href) or _LISTING_RE.search(href):
            absu = href if href.startswith("http") else _abs(href)
            if absu and absu not in seen:
                seen.add(absu)
                out.append(absu)
    return out


# --- metadata extraction (M6) ---------------------------------------------


def extract_metadata(html: str) -> tuple[str, str, list[tuple[str, str]]]:
    """(name, description, details-kv) per smart_cat_discovery.py:228-243:

    name = text of the first h1/h2/h3 with class ~ 'title|name';
    description = text of the first div/p with class ~ 'description|desc|content';
    details = for each div/span with class ~ 'detail|info|attribute' whose
    text contains ':', split once → (key.strip().lower(), value.strip()).
    Later duplicate keys overwrite earlier ones (dict semantics in the
    reference); we return the post-overwrite items in first-seen key order.
    """
    return _meta_from_nodes(parse_html(html))


def _meta_from_nodes(
    all_nodes: list[Node],
) -> tuple[str, str, list[tuple[str, str]]]:
    name = ""
    description = ""
    details: dict[str, str] = {}
    for n in all_nodes:
        cls = " ".join(n.classes)
        if not name and n.tag in NAME_TAGS and _NAME_CLASS.search(cls):
            name = n.text
        if not description and n.tag in DESC_TAGS and _DESC_CLASS.search(cls):
            description = n.text
        if n.tag in DETAIL_TAGS and _DETAIL_CLASS.search(cls):
            text = n.text
            if ":" in text:
                k, v = text.split(":", 1)
                details[k.strip().lower()] = v.strip()
    return name, description, list(details.items())


# --- fused single-parse extraction ----------------------------------------


def extract_all(
    page_url: str, html: str, api_image: str = "", api_caption: str = ""
) -> tuple[str, str, str, list[tuple[str, str]], list[dict[str, str]], list[str]]:
    """(text, name, description, details, images, links) with ONE tag-parse
    pass shared by metadata/images/links (text extraction is its own regex
    pass over the raw bytes). Byte-identical to calling the individual
    functions — they are thin wrappers over the same node-list internals —
    but ~3x cheaper per page, which matters: extraction dominates the
    fetch+extract hot path."""
    nodes = parse_html(html)
    name, description, details = _meta_from_nodes(nodes)
    images = _harvest_from_nodes(nodes, page_url, api_image, api_caption)
    links = _links_from_nodes(nodes, page_url)
    return extract_text(html), name, description, details, images, links
