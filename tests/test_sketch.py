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
