"""ExactSubstr-style duplicate-span removal (stages/spandedup) vs a
row-at-a-time Python oracle: every word covered by a corpus-duplicated
N-word window is removed (all occurrences), docs reassembled, empty docs
drop."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from webscrape_neko_jirushi_ray.stages.spandedup import dup_span_removal


def _ds(texts: dict[int, str], n_blocks: int = 1) -> ray.data.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _py_oracle(texts: dict[int, str], n: int) -> dict[int, str]:
    win_counts: Counter = Counter()
    words = {d: t.split(" ") for d, t in texts.items()}
    for d, ws in words.items():
        for i in range(len(ws) - n + 1):
            win_counts[tuple(ws[i : i + n])] += 1
    out = {}
    for d, ws in words.items():
        covered = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if win_counts[tuple(ws[i : i + n])] >= 2:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        if kept:
            out[d] = " ".join(kept)
    return out


def test_cross_doc_span_removed_both_sides():
    texts = {
        1: "a b c d e unique1 tail1",
        2: "head2 a b c d e tail2",
        3: "no dups here at all ok",
    }
    got = dict(
        dup_span_removal(_ds(texts), n=5).to_pandas().itertuples(index=False)
    )
    assert got == {
        1: "unique1 tail1",
        2: "head2 tail2",
        3: "no dups here at all ok",
    }
    assert got == _py_oracle(texts, 5)


def test_within_doc_repeat_and_full_dropout():
    texts = {
        1: "x y z w v x y z w v",      # 5-gram repeats inside one doc
        2: "p q r s t",                # appears twice across docs
        3: "p q r s t",
    }
    got = dict(
        dup_span_removal(_ds(texts), n=5).to_pandas().itertuples(index=False)
    )
    # doc1: both occurrences covered -> empty -> drops; 2,3 drop too
    assert got == {}
    assert got == _py_oracle(texts, 5)


def test_short_docs_pass_through():
    texts = {1: "a b c", 2: "a b c", 3: "one two"}
    # 3-word docs have no 5-word windows -> untouched even though equal
    got = dict(
        dup_span_removal(_ds(texts), n=5).to_pandas().itertuples(index=False)
    )
    assert got == texts


def test_overlapping_coverage_and_multiblock_random():
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(30)]
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(5, 60))))
        for d in range(80)
    }
    # plant shared boilerplate mid-doc in a quarter of the docs
    boiler = "b0 b1 b2 b3 b4 b5 b6"
    for d in range(0, 80, 4):
        ws = texts[d].split(" ")
        ws[2:2] = boiler.split(" ")
        texts[d] = " ".join(ws)
    for n in (3, 5):
        got = dict(
            dup_span_removal(_ds(texts, n_blocks=7), n=n)
            .to_pandas()
            .itertuples(index=False)
        )
        assert got == _py_oracle(texts, n), f"n={n}"


# --- benchmark decontamination ---------------------------------------------


def test_decontaminate_drops_overlapping_docs():
    from webscrape_neko_jirushi_ray.stages.spandedup import decontaminate

    bench = _ds({100: "secret eval question one two", 101: "another probe q r s"})
    train = _ds(
        {
            1: "clean doc with no overlap at all",
            2: "prefix secret eval question one two suffix",  # contains bench 5-gram
            3: "another probe q r s",                         # exact bench text
            4: "secret eval question one",                    # only 4 shared words
        }
    )
    got = dict(
        decontaminate(train, bench, n=5).to_pandas().itertuples(index=False)
    )
    assert sorted(got) == [1, 4]


def test_decontaminate_empty_benchmark_is_identity():
    from webscrape_neko_jirushi_ray.stages.spandedup import decontaminate

    bench = _ds({9: "tiny"})  # no 5-word window
    train = _ds({1: "a b c d e f", 2: "g h i j k l"}, n_blocks=2)
    got = dict(
        decontaminate(train, bench, n=5).to_pandas().itertuples(index=False)
    )
    assert sorted(got) == [1, 2]


# --- hypothesis: any corpus matches the Python oracle -----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    vocab_size=st.integers(min_value=3, max_value=40),
    n=st.sampled_from([2, 4, 7]),
)
def test_any_corpus_matches_python_oracle(ray_session, seed, vocab_size, n):
    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(vocab_size)]
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(1, 25))))
        for d in range(int(rng.integers(2, 40)))
    }
    got = dict(
        dup_span_removal(_ds(texts, n_blocks=3), n=n)
        .to_pandas()
        .itertuples(index=False)
    )
    assert got == _py_oracle(texts, n)
