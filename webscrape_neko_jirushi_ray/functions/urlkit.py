"""URL kernel: canonicalization, SHA1 keying, host/id extraction.

Rebuilds the reference's URL handling (absolutize + scheme check at
comprehensive_scraper.py:151,181-182 and smart_cat_discovery.py:265-266; id
regex at smart_cat_discovery.py:186-191) and adds the full canonicalization
the north-star requires: the frontier key is ``sha1(canonicalize(url))``.

All functions are pure; batch variants are vectorized enough for the hot
path (hashlib over a Python loop is unavoidable for SHA1 but cheap relative
to fetch/extract; the loop runs once per batch inside map_batches, never per
row on the driver).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit, parse_qsl, urlencode

import numpy as np
import pyarrow as pa

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_CAT_ID_RE = re.compile(r"/foster/(\d+)/")


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, strip default port and
    fragment, sort query parameters, ensure non-empty path.

    Idempotent (property-tested): canonicalize(canonicalize(u)) ==
    canonicalize(u).
    """
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def url_sha1(canonical_url: str) -> bytes:
    """20-byte SHA1 of the canonical URL — the frontier/seen-set key."""
    return hashlib.sha1(canonical_url.encode("utf-8")).digest()


def host_of(canonical_url: str) -> str:
    return urlsplit(canonical_url).hostname or ""


def absolutize(base_url: str, href: str) -> str:
    """urljoin + scheme check, as the reference does
    (comprehensive_scraper.py:181-182): relative hrefs are joined against
    the page URL; absolute non-http(s) schemes are rejected (empty)."""
    if not href:
        return ""
    absu = urljoin(base_url, href)
    return absu if absu.startswith("http") else ""


# Root-relative href whose urljoin result is PROVABLY scheme://netloc +
# href: single leading '/' (double = protocol-relative -> netloc), no
# '#' (fragment), no ';' (params), no whitespace, no '?'-with-empty-
# query (urlunparse drops a bare '?'), and NO dot segments anywhere
# ("/." guarded separately — urljoin's remove_dot_segments would fire).
_ROOTREL_FAST_RE = re.compile(
    r"^/(?!/)[A-Za-z0-9_\-./%+=&]*(?:\?[A-Za-z0-9_\-./%?=&+]+)?$"
)


def make_absolutizer(base_url: str):
    """Per-page absolutize closure (the extract hot path calls urljoin
    once per RELATIVE href — ~15/page): the base splits ONCE, and
    root-relative hrefs in the provable class resolve by concatenation;
    everything else falls back to :func:`absolutize` (urljoin).
    Element-wise parity with ``absolutize(base_url, href)`` is
    hypothesis-pinned (test_urlkit)."""
    parts = urlsplit(base_url)
    prefix = (
        f"{parts.scheme}://{parts.netloc}"
        if parts.scheme in ("http", "https") and parts.netloc
        else None
    )

    def _abs(href: str) -> str:
        if (
            prefix is not None
            and href.startswith("/")
            and "/." not in href
            and _ROOTREL_FAST_RE.match(href)
        ):
            return prefix + href
        return absolutize(base_url, href)

    return _abs


def extract_cat_id(url: str) -> str:
    """Regex ``/foster/(\\d+)/`` → id string, '' if absent
    (smart_cat_discovery.py:186-191)."""
    m = _CAT_ID_RE.search(url)
    return m.group(1) if m else ""


# --- batch (Arrow) variants ----------------------------------------------

# Vectorized canonicalization: ONE RE2 pass classifies each URL as
# already-canonical (the overwhelmingly common frontier shape — links
# harvested from pages this engine canonicalized once already), and only
# the exotic remainder takes the row-wise urlsplit path. Parity is by
# construction on fallback rows and PROVEN on fast-path rows: a URL
# matches the fast class only if ``canonicalize_url`` is the identity on
# it (or identity + trailing '/'), which the hypothesis sweep in
# tests/test_urlkit.py pins row-by-row (the textkit exotic-input-fence
# pattern). The char classes are deliberately strict:
#   scheme   lowercase http/https only (case change => fallback)
#   host     [a-z0-9.-] — no port, no userinfo, no brackets, no case
#   path     visible ASCII minus '?'/'#' (so no fragment, no stripping,
#            no second query separator; unicode paths => fallback)
#   query    absent, or EXACTLY ONE k=v pair over quote_plus-safe chars
#            [A-Za-z0-9_.~-] — such a pair round-trips parse_qsl →
#            sorted → urlencode unchanged; multi-pair sorting => fallback
_FAST_IDENT_RE = (
    r'^https?://[a-z0-9.\-]+/[!"$->@-~]*'
    r"(?:\?[A-Za-z0-9_.~\-]+=[A-Za-z0-9_.~\-]*)?$"
)
_FAST_HOSTONLY_RE = r"^https?://[a-z0-9.\-]+$"  # canon appends the '/'
_FAST_HOST_CAPTURE_RE = r"^https?://(?P<h>[a-z0-9.\-]+)"


def canonicalize_column(
    col: pa.Array | pa.ChunkedArray | list[str],
) -> pa.Array:
    """Vectorized :func:`canonicalize_url` over a string column —
    element-wise identical to the row-wise function (hypothesis-pinned).
    Fast-path rows never touch Python; fallback rows run the exact
    row-wise kernel and are stitched back with ``replace_with_mask``."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    elif not isinstance(col, pa.Array):
        col = pa.array(col, pa.string())
    if len(col) == 0:
        return pa.array([], pa.string())
    ident = pc.fill_null(pc.match_substring_regex(col, _FAST_IDENT_RE), False)
    hostonly = pc.fill_null(
        pc.match_substring_regex(col, _FAST_HOSTONLY_RE), False
    )
    out = pc.if_else(
        hostonly,
        pc.binary_join_element_wise(col, pa.scalar("/"), pa.scalar("")),
        col,
    )
    slow = pc.invert(pc.or_(ident, hostonly))
    n_slow = pc.sum(slow).as_py() or 0
    if n_slow:
        fb = [
            canonicalize_url(u)
            for u in col.filter(slow).to_pylist()
        ]
        out = pc.replace_with_mask(out, slow, pa.array(fb, pa.string()))
    return out if isinstance(out, pa.Array) else out.combine_chunks()


def canonicalize_batch(urls: pa.Array | list[str]) -> list[str]:
    return canonicalize_column(urls).to_pylist()


def sha1_batch(canon_urls: list[str]) -> pa.Array:
    return pa.array([hashlib.sha1(u.encode("utf-8")).digest() for u in canon_urls], type=pa.binary())


def add_url_key_columns(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``canon_url``, ``url_sha1``, ``host`` columns derived from
    ``url_col``. The standard first stage of every frontier pipeline.

    Canonicalization and host extraction are vectorized (one RE2 pass
    each; see :func:`canonicalize_column`); SHA1 is the one per-row loop
    left (hashlib has no batch API) at ~1µs/row — an order of magnitude
    under the old urlsplit-per-row floor."""
    import pyarrow.compute as pc

    col = batch[url_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    canon = canonicalize_column(col)
    sha = pa.array(
        [hashlib.sha1(u.encode("utf-8")).digest() for u in canon.to_pylist()],
        type=pa.binary(),
    )
    # host of a CANONICAL url: the [a-z0-9.-] run after '://' (ports and
    # exotic netlocs fall back to the row-wise host_of — a canonical
    # netloc is host[:port], so the capture stops exactly at the port)
    cap = pc.struct_field(
        pc.extract_regex(canon, _FAST_HOST_CAPTURE_RE), "h"
    )
    missed = pc.is_null(cap)
    if pc.sum(missed).as_py() or 0:
        fb = [host_of(u) for u in canon.filter(missed).to_pylist()]
        cap = pc.replace_with_mask(cap, missed, pa.array(fb, pa.string()))
    out = batch
    for name, arr in (
        ("canon_url", canon),
        ("url_sha1", sha),
        ("host", cap if isinstance(cap, pa.Array) else cap.combine_chunks()),
    ):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def shard_of_keys(keys: list[bytes], num_shards: int) -> np.ndarray:
    """Route a SHA1 key to a seen-set shard: first 8 bytes as uint64 mod K.
    Deterministic across processes (no Python hash randomization)."""
    if not keys:
        return np.empty(0, dtype=np.int64)
    arr = np.frombuffer(b"".join(k[:8] for k in keys), dtype=">u8")
    return (arr % np.uint64(num_shards)).astype(np.int64)


def sha1_first_byte(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """First byte of each 20-byte sha1 in a binary column, vectorized via
    the raw Arrow data buffer (no per-row Python). Requires a null-free
    fixed-width(20) column — which url_sha1 always is."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32, count=n + 1)
    return data[offsets[:-1]]


def sha1_col_to_u64(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """First 8 bytes of each 20-byte sha1 as big-endian uint64, vectorized
    over the raw Arrow data buffer (no per-row Python). This is the seen
    set's key space: ``shard_of_keys`` and the cuckoo filter both consume
    exactly ``uint64(sha1[:8])``, so a u64 computed here routes and probes
    identically to the bytes path — it just skips the per-row ``bytes``
    materialization and ships 8 bytes/key instead of a Python object."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32, count=n + 1)
    idx = offsets[:-1, None] + np.arange(8, dtype=np.int64)[None, :]
    return (
        np.ascontiguousarray(data[idx]).view(">u8").reshape(-1).astype(np.uint64)
    )


def salt_host(hosts: list[str], sha1s: list[bytes], buckets: int) -> list[str]:
    """Skew defusal: append a per-URL sub-bucket to the host key so one
    dominant host spreads over ``buckets`` reducers in the groupby(host)
    shuffle. Budgets must be re-aggregated per TRUE host afterwards."""
    return [f"{h}#{s[0] % buckets}" for h, s in zip(hosts, sha1s)]
