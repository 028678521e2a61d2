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
