"""Vectorized textkit helpers: flat whitespace tokenization and the
128-bit two-siphash string identity used by the token/bigram shuffle
families (hapax, vocabulary growth, bigram novelty)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from webscrape_neko_jirushi_ray.functions.textkit import (
    flat_tokens_ws_arrow,
    hash2_strings,
    tokens_ws,
)

# Realistic corpus alphabet + every whitespace class Python's \s matches
# (incl. the \x1c-\x1f separators, NEL, NBSP, em space, ideographic
# space — the multi-byte whitespace routes batches to the exact
# row-wise fallback; see textkit._EXOTIC_WS_RE2 for the pyarrow 16.1
# splitter bug it dodges) plus a zero-width space (NOT whitespace —
# must stay inside tokens).
_ALPHA = "abXY09'緑 \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0 　​"


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet=_ALPHA, max_size=30)),
        max_size=12,
    )
)
def test_flat_tokens_matches_rowwise_oracle(texts):
    col = pa.array(texts, pa.string())
    flat, ptr = flat_tokens_ws_arrow(col)
    assert ptr[0] == 0 and ptr[-1] == len(flat) and len(ptr) == len(texts) + 1
    got = flat.to_pylist()
    for i, txt in enumerate(texts):
        assert got[ptr[i] : ptr[i + 1]] == tokens_ws(txt or "")


def test_flat_tokens_chunked_and_empty():
    ch = pa.chunked_array([pa.array(["a b"]), pa.array([None, " c  d "])])
    flat, ptr = flat_tokens_ws_arrow(ch)
    assert flat.to_pylist() == ["a", "b", "c", "d"]
    assert list(ptr) == [0, 2, 2, 4]
    flat0, ptr0 = flat_tokens_ws_arrow(pa.array([], pa.string()))
    assert len(flat0) == 0 and list(ptr0) == [0]
    flatb, ptrb = flat_tokens_ws_arrow(pa.array(["", "  ", None]))
    assert len(flatb) == 0 and list(ptrb) == [0, 0, 0, 0]


def test_hash2_strings_identity_model():
    v = np.array(["a", "b", "a b", "ab", ""], dtype=object)
    h1, h2 = hash2_strings(v)
    r1, r2 = hash2_strings(v)
    # deterministic across calls / processes (keyed hash, no PYTHONHASHSEED)
    assert (h1 == r1).all() and (h2 == r2).all()
    assert h1.dtype == np.int64 and h2.dtype == np.int64
    # the two keys are independent: equal h1 never implies equal h2 here
    assert not np.array_equal(h1, h2)
    # distinct strings -> distinct 128-bit identities on this vocabulary
    pairs = set(zip(h1.tolist(), h2.tolist()))
    assert len(pairs) == len(v)
    # salt moves the whole hash space
    s1, s2 = hash2_strings(v, salt="zz")
    assert not np.array_equal(h1, s1) and not np.array_equal(h2, s2)
    # empty vocabulary
    e1, e2 = hash2_strings(np.array([], dtype=object))
    assert len(e1) == 0 and len(e2) == 0
