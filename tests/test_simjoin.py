"""Exact n-gram similarity self-join: prefix-filter completeness and
threshold exactness against an all-pairs brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscrape_neko_jirushi_ray.stages.simjoin import (
    _char_grams_raw_batch,
    ngram_similarity_selfjoin,
)


def _brute(texts, n, tn, td):
    grams = [set() for _ in texts]
    for i, t in enumerate(texts):
        t = t or ""
        grams[i] = {t[j : j + n] for j in range(len(t) - n + 1)} if len(t) >= n else set()
    out = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if not grams[i] or not grams[j]:
                continue
            k = len(grams[i] & grams[j])
            u = len(grams[i] | grams[j])
            if k * td >= tn * u:
                out.append((i, j, k, u))
    return sorted(out)


def _run(ray_session, texts, threshold, tn, td, n=3):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(len(texts), dtype=np.int64)),
                "txt": pa.array(texts, pa.string()),
            }
        )
    )
    got = (
        ngram_similarity_selfjoin(
            ds, id_col="rid", text_col="txt", n=n, threshold=threshold
        )
        .to_pandas()
        .sort_values(["a", "b"])
    )
    return sorted(
        zip(
            got["a"].astype(int),
            got["b"].astype(int),
            got["n_inter"].astype(int),
            got["n_union"].astype(int),
        )
    )


def test_simjoin_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "omega", "zeta"]
    texts = []
    for _ in range(120):
        k = rng.integers(1, 4)
        texts.append(" ".join(rng.choice(words, k)))
    texts += ["ab", "", "xyz", "xyz", "xyzw"]  # short / empty / exact-dup
    assert _run(None, texts, 0.5, 1, 2) == _brute(texts, 3, 1, 2)


def test_simjoin_exact_threshold_tie(ray_session):
    # J exactly 0.6: |inter|=3, |union|=5 — the float-0.6 trap
    # (0.6*5 = 3.0000000000000004 would drop it). grams("abcde")=
    # {abc,bcd,cde}; "abcdefg" adds def,efg -> inter 3, union 5.
    texts = ["abcde", "abcdefg"]
    got = _run(None, texts, 0.6, 3, 5)
    assert got == [(0, 1, 3, 5)]


def test_simjoin_zero_pad_structure(ray_session):
    # the supplier-name shape: shared long prefix, varying tail
    texts = [f"Supplier#{i:09d}" for i in range(60)]
    assert _run(None, texts, 0.8, 4, 5) == _brute(texts, 3, 4, 5)


def test_simjoin_threshold_one_is_exact_dup_only(ray_session):
    texts = ["hello world", "hello world", "hello worle"]
    assert _run(None, texts, 1.0, 1, 1) == _brute(texts, 3, 1, 1)


def test_simjoin_all_texts_too_short(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array([1, 2, 3], pa.int64()),
                "txt": pa.array(["a", "xy", ""], pa.string()),
            }
        )
    )
    res = ngram_similarity_selfjoin(
        ds, id_col="rid", text_col="txt", n=3, threshold=0.5
    )
    assert res.count() == 0
    # Ray's to_pandas drops the schema of an all-empty dataset, so pin
    # the Arrow schema instead
    assert [f.name for f in res.schema().base_schema] == [
        "a", "b", "n_inter", "n_union",
    ]


def test_char_grams_raw_batch_edges():
    out = _char_grams_raw_batch(["", None, "ab", "abc", "aaaa"], 3)
    assert [len(x) for x in out] == [0, 0, 0, 1, 1]  # "aaaa" -> {"aaa"}
    for arr in out:
        assert arr.dtype == np.uint64
        assert (np.sort(arr) == arr).all()

# ---------------------------------------------------------------------------
# edit-distance self-join (symmetric-delete candidates + banded-DP verify)
# ---------------------------------------------------------------------------

from webscrape_neko_jirushi_ray.stages.simjoin import (  # noqa: E402
    _deletion_variants,
    _levenshtein_banded,
    edit_distance_selfjoin,
)


def _lev_full(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 1),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[lb]


def test_levenshtein_banded_vs_full_random():
    rng = np.random.default_rng(7)
    alpha = list("abc")
    for _ in range(400):
        la, lb = rng.integers(0, 9, size=2)
        a = "".join(rng.choice(alpha, la))
        b = "".join(rng.choice(alpha, lb))
        true = _lev_full(a, b)
        for k in (0, 1, 2, 3):
            got = _levenshtein_banded(a, b, k)
            if true <= k:
                assert got == true, (a, b, k)
            else:
                assert got > k, (a, b, k)


def test_deletion_variants_counts():
    assert _deletion_variants("abc", 0) == {"abc"}
    assert _deletion_variants("abc", 1) == {"abc", "ab", "ac", "bc"}
    assert "" in _deletion_variants("ab", 2)
    # repeated chars collapse duplicates
    assert _deletion_variants("aaa", 1) == {"aaa", "aa"}


def _brute_edit(texts, k):
    out = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            d = _lev_full(texts[i] or "", texts[j] or "")
            if d <= k:
                out.append((i, j, d))
    return sorted(out)


def _run_edit(texts, k):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(len(texts), dtype=np.int64)),
                "txt": pa.array(texts, pa.string()),
            }
        )
    )
    got = edit_distance_selfjoin(ds, id_col="rid", text_col="txt", k=k).to_pandas()
    return sorted(
        zip(got["a"].astype(int), got["b"].astype(int), got["edit_dist"].astype(int))
    )


def test_edit_join_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(23)
    alpha = list("ab")  # tiny alphabet -> dense near-matches
    texts = [
        "".join(rng.choice(alpha, rng.integers(0, 7))) for _ in range(90)
    ]
    texts += ["", "", "a", "b", "ab", "ba"]
    for k in (0, 1, 2):
        assert _run_edit(texts, k) == _brute_edit(texts, k), k


def test_edit_join_zero_pad_names(ray_session):
    texts = [f"Supplier#{i:09d}" for i in range(40)]
    assert _run_edit(texts, 1) == _brute_edit(texts, 1)


def test_edit_join_unicode(ray_session):
    texts = ["ねこ", "ねこじるし", "ねこじるしA", "ねここ", "いぬ"]
    for k in (1, 2):
        assert _run_edit(texts, k) == _brute_edit(texts, k), k


def test_edit_join_empty_input(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"rid": pa.array([], pa.int64()), "txt": pa.array([], pa.string())})
    )
    res = edit_distance_selfjoin(ds, id_col="rid", text_col="txt", k=1)
    assert res.count() == 0
    assert [f.name for f in res.schema().base_schema] == ["a", "b", "edit_dist"]
