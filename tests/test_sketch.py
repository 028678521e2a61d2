"""HyperLogLog distinct-token sketch (stages/sketch): error bound vs the
exact distinct count, merge associativity across block splits, and
determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from webscrape_neko_jirushi_ray.stages.sketch import (
    _register_partial,
    hll_distinct_tokens,
    hll_estimate,
)


def _corpus(n_docs: int, vocab: list[str], seed: int) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    return {
        i: " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for i in range(n_docs)
    }


def _ds(texts: dict[int, str], n_blocks: int) -> ray.data.Dataset:
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def test_hll_within_error_bound(ray_session):
    vocab = [f"tok{i}" for i in range(5000)]
    texts = _corpus(2000, vocab, seed=3)
    exact = len({w for t in texts.values() for w in t.split(" ")})
    est = hll_distinct_tokens(_ds(texts, n_blocks=8), p=12)
    assert abs(est - exact) / exact <= 0.05, (est, exact)


def test_hll_block_split_invariant_and_deterministic(ray_session):
    vocab = [f"w{i}" for i in range(800)]
    texts = _corpus(500, vocab, seed=9)
    a = hll_distinct_tokens(_ds(texts, n_blocks=2), p=12)
    b = hll_distinct_tokens(_ds(texts, n_blocks=16), p=12)
    c = hll_distinct_tokens(_ds(texts, n_blocks=16), p=12)
    # register maxima are associative: any split merges to the same sketch
    assert a == b == c


def test_hll_small_range_linear_counting():
    # 3 distinct hashes -> linear counting regime, near-exact
    h = np.array([123456789, 987654321, 555555555], dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    reg, rho = _register_partial(h, 12)
    regs = np.zeros(1 << 12, dtype=np.int64)
    regs[reg] = rho
    assert round(hll_estimate(regs, 12)) == 3


def test_register_partial_empty():
    reg, rho = _register_partial(np.empty(0, dtype=np.uint64), 12)
    assert len(reg) == 0 and len(rho) == 0


def test_hll_per_group_null_tolerance(ray_session):
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import hll_distinct_tokens_by

    t = pa.table(
        {
            "lang": pa.array(["en", "en", None, "de"]),
            "text": pa.array(["a b c", None, "x y", "z"]),
        }
    )
    out = hll_distinct_tokens_by(
        ray.data.from_arrow(t), group_col="lang", p=12
    ).to_pandas().set_index("lang")
    # null-text row contributes zero tokens; null-group row is dropped
    assert out.loc["en", "est_distinct_tokens"] == 3
    assert out.loc["de", "est_distinct_tokens"] == 1
    assert len(out) == 2


def test_cms_never_undercounts_and_bounds_error(ray_session):
    """CMS one-sided guarantee: estimate >= true for EVERY key; overshoot
    within the 2N/width Markov bound with wide margin at depth 4."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        cms_build, cms_estimate,
    )

    rng = np.random.default_rng(5)
    # zipf-ish: few hot keys, long tail
    keys = np.concatenate(
        [
            np.repeat(np.arange(10, dtype=np.int64), 2000),  # hot
            rng.integers(100, 50_000, 30_000),  # tail
        ]
    ).astype(np.int64)
    rng.shuffle(keys)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64())})
    ).repartition(8)
    W = 10  # 1024 buckets -> bound is non-trivial at N=50k
    sk = cms_build(ds, "k", width_log2=W, depth=4)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(sk, uniq, width_log2=W)
    assert (est >= true).all()  # the one-sided contract
    n = len(keys)
    slack = 3 * n // (1 << W)
    assert (est - true <= slack).mean() > 0.99  # e/w bound w.h.p.
    # the hot keys' estimates are tight relative to their magnitude
    hot = cms_estimate(sk, np.arange(10, dtype=np.int64), width_log2=W)
    assert (hot - 2000 <= slack).all()


def test_cms_block_split_invariant_and_strings(ray_session):
    """Addition commutes: 1-block and 8-block builds give the SAME
    matrix; string keys hash through the same path as the join router."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        cms_build, cms_estimate,
    )

    toks = [f"tok{i % 97}" for i in range(5_000)]
    t = pa.table({"tok": pa.array(toks, pa.string())})
    one = cms_build(ray.data.from_arrow(t), "tok", width_log2=12, depth=3)
    many = cms_build(
        ray.data.from_arrow(t).repartition(8), "tok", width_log2=12, depth=3
    )
    assert (one == many).all()
    est = cms_estimate(one, ["tok0", "tok96"], width_log2=12)
    true0 = sum(1 for x in toks if x == "tok0")
    assert est[0] >= true0


def test_quantile_sketch_rank_error_bound(ray_session):
    """Rank error <= 3n/k on uniform, zipf-ish, and pre-sorted
    (adversarial for strided samplers) inputs; total weight exact."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        quantile_sketch, quantile_sketch_query,
    )

    rng = np.random.default_rng(7)
    n, k = 200_000, 512
    cases = {
        "uniform": rng.integers(0, 10**9, n),
        "zipf": (10_000 / (1 + rng.pareto(1.2, n))).astype(np.int64),
        "sorted": np.arange(n, dtype=np.int64),
    }
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    for name, data in cases.items():
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(data, pa.int64())})
        ).repartition(20)
        v, w = quantile_sketch(ds, "x", k=k)
        assert int(w.sum()) == n, name
        assert (np.diff(v) >= 0).all()
        est = quantile_sketch_query(v, w, qs)
        s = np.sort(data)
        for q, e in zip(qs, est):
            lo = np.searchsorted(s, e, side="left")
            hi = np.searchsorted(s, e, side="right")
            target = q * n
            err = 0.0 if lo <= target <= hi else min(
                abs(lo - target), abs(hi - target)
            )
            assert err <= 3 * n / k, (name, q, err, 3 * n / k)


def test_quantile_sketch_small_input_exact(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        quantile_sketch, quantile_sketch_query,
    )

    data = np.array([5, 1, 9, 3, 7], dtype=np.int64)
    v, w = quantile_sketch(
        ray.data.from_arrow(pa.table({"x": pa.array(data)})), "x", k=64
    )
    assert list(v) == [1, 3, 5, 7, 9]
    assert list(w) == [1] * 5
    assert list(quantile_sketch_query(v, w, [0.5, 1.0])) == [5, 9]


def test_quantile_sketch_rejects_nulls(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import quantile_sketch

    t = pa.table({"x": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(Exception, match="null"):
        quantile_sketch(ray.data.from_arrow(t), "x", k=8)


def test_quantile_sketch_merge_matches_whole(ray_session):
    """Sketching two halves and merging stays within the documented rank
    bound of the full-data quantiles, and total weight is exact."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        quantile_sketch, quantile_sketch_merge, quantile_sketch_query,
    )

    rng = np.random.default_rng(41)
    n, k = 100_000, 512
    data = rng.integers(0, 10**12, 2 * n)
    s1 = quantile_sketch(
        ray.data.from_arrow(pa.table({"x": pa.array(data[:n], pa.int64())})),
        "x", k=k,
    )
    s2 = quantile_sketch(
        ray.data.from_arrow(pa.table({"x": pa.array(data[n:], pa.int64())})),
        "x", k=k,
    )
    v, w = quantile_sketch_merge(s1, s2, k=k)
    assert int(w.sum()) == 2 * n
    s = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        e = quantile_sketch_query(v, w, [q])[0]
        lo = np.searchsorted(s, e, "left")
        hi = np.searchsorted(s, e, "right")
        target = q * 2 * n
        err = 0.0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        assert err <= 4 * 2 * n / k, (q, err)


def test_grouped_quantile_sketch_bounds(ray_session):
    """Per-group summaries: exact group weights, per-group rank error
    within 4n_g/k (three compaction levels) on a skewed-group frame."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        grouped_quantile_sketch, quantile_sketch_query,
    )

    rng = np.random.default_rng(53)
    sizes = {"big": 80_000, "mid": 9_000, "tiny": 40}
    g = np.concatenate([np.full(n, name, dtype=object)
                        for name, n in sizes.items()])
    v = rng.integers(0, 10**12, len(g))
    perm = rng.permutation(len(g))
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g[perm]), "x": pa.array(v[perm], pa.int64())})
    ).repartition(12)
    sk = grouped_quantile_sketch(ds, "g", "x", k=256)
    assert set(sk) == set(sizes)
    for name, n in sizes.items():
        vals, w = sk[name]
        assert int(w.sum()) == n, name
        data = np.sort(v[g == name])
        for q in (0.1, 0.5, 0.9):
            e = quantile_sketch_query(vals, w, [q])[0]
            lo = data.searchsorted(e, "left")
            hi = data.searchsorted(e, "right")
            target = q * n
            err = 0.0 if lo <= target <= hi else min(
                abs(lo - target), abs(hi - target)
            )
            assert err <= max(2.0, 4 * n / 256), (name, q, err)


def test_grouped_quantile_sketch_empty_blocks(ray_session):
    """ADVICE r4: an upstream filter can hand _partial a 0-row block;
    the partial must emit a typed empty table instead of raising from
    np.concatenate([])."""
    import numpy as np
    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        grouped_quantile_sketch,
    )

    rng = np.random.default_rng(7)
    n = 4000
    ds = (
        ray.data.from_items(
            [
                {"g": ("a" if i % 2 else "b"), "x": float(rng.integers(0, 100))}
                for i in range(n)
            ]
        )
        .repartition(8)
        .filter(lambda r: r["x"] < 50.0)
    )
    # force at least one fully-empty block: union with a filtered-to-zero
    # dataset
    empty = ray.data.from_items(
        [{"g": "a", "x": 1.0}]
    ).filter(lambda r: False)
    sk = grouped_quantile_sketch(ds.union(empty), "g", "x", k=64)
    total = sum(int(w.sum()) for _, (_, w) in sorted(sk.items()))
    assert total == ds.count()
