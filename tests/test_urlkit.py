"""Unit + property tests for the URL kernel (SURVEY.md §5.1, §5.6)."""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webscrape_neko_jirushi_ray.functions.urlkit import (
    absolutize,
    canonicalize_url,
    extract_cat_id,
    host_of,
    salt_host,
    shard_of_keys,
    url_sha1,
)


def test_canonicalize_basics():
    assert (
        canonicalize_url("HTTPS://WWW.Neko-Jirushi.com:443/foster/1/?b=2&a=1#frag")
        == "https://www.neko-jirushi.com/foster/1/?a=1&b=2"
    )
    assert canonicalize_url("http://example.com") == "http://example.com/"
    assert canonicalize_url("http://example.com:8080/x") == "http://example.com:8080/x"


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    st.builds(
        lambda h, p, q: f"http://{h}/{p}?{q}",
        st.from_regex(r"[a-z]{1,10}\.(com|org|jp)", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9/._-]{0,20}", fullmatch=True),
        st.from_regex(r"([a-z]=[0-9](&[a-z]=[0-9]){0,3})?", fullmatch=True),
    )
)
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c


def test_sha1_matches_hashlib():
    u = canonicalize_url("https://www.neko-jirushi.com/foster/226123/")
    assert url_sha1(u) == hashlib.sha1(u.encode()).digest()
    assert len(url_sha1(u)) == 20


def test_absolutize_and_scheme_check():
    base = "https://www.neko-jirushi.com/foster/1/"
    assert absolutize(base, "/img/a.jpg") == "https://www.neko-jirushi.com/img/a.jpg"
    assert absolutize(base, "https://other.com/x.png") == "https://other.com/x.png"
    assert absolutize(base, "javascript:void(0)") == ""
    assert absolutize(base, "") == ""


def test_extract_cat_id():
    assert extract_cat_id("https://www.neko-jirushi.com/foster/226123/") == "226123"
    assert extract_cat_id("https://x.com/nope/") == ""


def test_host_of():
    assert host_of("https://www.neko-jirushi.com/foster/1/") == "www.neko-jirushi.com"


def test_shard_routing_stable_and_balanced():
    keys = [hashlib.sha1(str(i).encode()).digest() for i in range(4000)]
    shards = shard_of_keys(keys, 8)
    assert shards.min() >= 0 and shards.max() < 8
    # stability
    assert (shards == shard_of_keys(keys, 8)).all()
    # rough balance (binomial bounds)
    counts = np.bincount(shards, minlength=8)
    assert counts.min() > 300 and counts.max() < 700


def test_salt_host_spreads_dominant_host():
    keys = [hashlib.sha1(str(i).encode()).digest() for i in range(1000)]
    hosts = ["www.neko-jirushi.com"] * 1000
    salted = salt_host(hosts, keys, 8)
    assert len(set(salted)) == 8
    assert all(s.startswith("www.neko-jirushi.com#") for s in salted)


# --- vectorized canonicalization parity (VERDICT r4 top item) -----------

_URLISH = st.builds(
    lambda sch, h, port, p, q, f, pad: (
        f"{sch}://{h}{port}{p}{q}{f}{pad}"
    ),
    st.sampled_from(["http", "https", "HTTP", "Http", "ftp"]),
    st.from_regex(r"[a-zA-Z0-9.\-]{1,12}(\.(com|jp|org))?", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(
        r"(/[a-zA-Z0-9/._~%!$&'()*+,;=:@\- é]{0,24})?", fullmatch=True
    ),
    st.from_regex(
        r"(\?[a-zA-Z0-9_.~\-]{1,5}=[a-zA-Z0-9_.~\-]{0,5}"
        r"(&[a-zA-Z0-9_.~\-]{1,5}=[a-zA-Z0-9_.~%+\-]{0,5}){0,3})?",
        fullmatch=True,
    ),
    st.sampled_from(["", "#frag", "#"]),
    st.sampled_from(["", " ", "\t", " "]),
)


@settings(max_examples=400, deadline=None, derandomize=True)
@given(st.lists(st.one_of(_URLISH, st.text(max_size=30)), max_size=20))
def test_canonicalize_column_rowwise_parity(urls):
    """canonicalize_column must agree with the row-wise kernel element
    by element on EVERY input — canonical, exotic, junk — or raise
    exactly when it raises (the fast/fallback fence is invisible)."""
    from webscrape_neko_jirushi_ray.functions.urlkit import (
        canonicalize_column,
    )

    want, raises = [], False
    try:
        want = [canonicalize_url(u) for u in urls]
    except Exception:
        raises = True
    if raises:
        with pytest.raises(Exception):
            canonicalize_column(urls).to_pylist()
    else:
        assert canonicalize_column(urls).to_pylist() == want


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(_URLISH, min_size=1, max_size=12))
def test_add_url_key_columns_rowwise_parity(urls):
    """The full keying stage (canon + sha1 + host) matches the row-wise
    oracles on arbitrary url-ish input."""
    import pyarrow as pa

    from webscrape_neko_jirushi_ray.functions.urlkit import (
        add_url_key_columns,
        host_of,
    )

    try:
        want = [canonicalize_url(u) for u in urls]
    except Exception:
        return  # raising inputs covered by the column parity test
    out = add_url_key_columns(pa.table({"url": urls}))
    assert out["canon_url"].to_pylist() == want
    assert out["url_sha1"].to_pylist() == [
        hashlib.sha1(w.encode()).digest() for w in want
    ]
    assert out["host"].to_pylist() == [host_of(w) for w in want]


_HREFISH = st.one_of(
    st.from_regex(r"/[A-Za-z0-9_\-./%+=&?]{0,24}", fullmatch=True),
    st.from_regex(r"//[a-z0-9.]{1,10}/[a-z]{0,8}", fullmatch=True),
    st.from_regex(r"(\.\./){0,2}[a-z]{1,8}(/[a-z.]{0,8})?", fullmatch=True),
    st.from_regex(r"/[a-z]{0,6}(/\.\./[a-z]{0,6})?(\?|#frag|;p)?", fullmatch=True),
    st.sampled_from(["", "/", "/?", "/a?", "/a#", "/./x", "/..", "?q=1", "#f",
                     "mailto:x@y", "https://abs.example/x", "/a b", "/%2e/x"]),
    st.text(max_size=20),
)


@settings(max_examples=400, deadline=None, derandomize=True)
@given(
    st.from_regex(
        r"https?://[a-z0-9.\-]{1,12}(:[0-9]{1,4})?(/[a-z0-9./_-]{0,16})?(\?[a-z]=[0-9])?",
        fullmatch=True,
    ),
    st.lists(_HREFISH, max_size=8),
)
def test_make_absolutizer_parity(base, hrefs):
    """make_absolutizer's fast path must agree with absolutize (urljoin)
    on every href — root-relative, protocol-relative, dotted, junk."""
    from webscrape_neko_jirushi_ray.functions.urlkit import (
        absolutize,
        make_absolutizer,
    )

    f = make_absolutizer(base)
    for h in hrefs:
        assert f(h) == absolutize(base, h), (base, h)
