"""Line-level dedup + repetition stats (stages/linededup).

Semantics pinned here, independent of the DuckDB oracle the driver runs:
C4-style keep-first at the chunk ("line") level — a WIDTH-word chunk
survives only at its minimum (doc_id, cid) occurrence corpus-wide; docs
are reassembled from surviving chunks in order; docs losing every chunk
drop out. Repetition stats are row-local Gopher-style signals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from webscrape_neko_jirushi_ray.stages.linededup import (
    add_repetition_stats,
    explode_lines,
    line_dedup,
)


def _docs_ds(texts: dict[int, str], *, n_blocks: int = 1) -> ray.data.Dataset:
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _py_line_dedup(texts: dict[int, str], width: int) -> dict[int, str]:
    """Row-at-a-time oracle: global keep-first by (doc_id, cid)."""
    seen: set[str] = set()
    out: dict[int, str] = {}
    for doc_id in sorted(texts):
        words = texts[doc_id].split(" ")
        kept = []
        for i in range(0, len(words), width):
            line = " ".join(words[i : i + width])
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            out[doc_id] = " ".join(kept)
    return out


def test_explode_lines_positions():
    ds = _docs_ds({7: "a b c d e", 9: "a b"})
    got = explode_lines(ds, width=2).to_pandas()
    got = got.sort_values(["doc_id", "cid"]).reset_index(drop=True)
    assert got.to_dict("records") == [
        {"doc_id": 7, "cid": 0, "line": "a b"},
        {"doc_id": 7, "cid": 1, "line": "c d"},
        {"doc_id": 7, "cid": 2, "line": "e"},
        {"doc_id": 9, "cid": 0, "line": "a b"},
    ]


def test_line_dedup_keep_first_and_doc_dropout():
    texts = {
        1: "x y z w q r",          # all survives (first occurrence)
        2: "x y z w a b",          # chunk "x y z w" dies, "a b" survives
        3: "x y z w q r",          # identical to doc 1 → drops out entirely
    }
    got = line_dedup(_docs_ds(texts), width=4).to_pandas()
    got = dict(zip(got["doc_id"], got["text"]))
    assert got == {1: "x y z w q r", 2: "a b"}
    assert got == _py_line_dedup(texts, 4)


def test_line_dedup_matches_python_oracle_random_multiblock():
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → many chunk collisions
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(1, 40))))
        for d in range(60)
    }
    for width in (3, 8):
        got = line_dedup(_docs_ds(texts, n_blocks=7), width=width).to_pandas()
        got = dict(zip(got["doc_id"], got["text"]))
        assert got == _py_line_dedup(texts, width), f"width={width}"


def test_repetition_stats_values():
    ds = _docs_ds({1: "a a a b", 2: "a b a b a b a b"})
    got = (
        add_repetition_stats(ds, width=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "n_words": [4, 8],
            "n_distinct_words": [2, 2],
            "top_word_count": [3, 4],
            "n_chunks": [2, 4],
            # doc1 chunks: "a a","a b" → 0 dup; doc2: "a b"×4 → 3 dups
            "n_dup_chunks": [0, 3],
        }
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_repetition_stats_random_vs_python():
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(9)]
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
        for d in range(40)
    }
    got = (
        add_repetition_stats(_docs_ds(texts, n_blocks=5), width=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for d, text in texts.items():
        words = text.split(" ")
        chunks = [" ".join(words[i : i + 4]) for i in range(0, len(words), 4)]
        row = got.loc[d]
        assert row["n_words"] == len(words)
        assert row["n_distinct_words"] == len(set(words))
        assert row["top_word_count"] == max(words.count(w) for w in set(words))
        assert row["n_chunks"] == len(chunks)
        assert row["n_dup_chunks"] == len(chunks) - len(set(chunks))


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
    vocab_size=st.integers(min_value=2, max_value=30),
    width=st.sampled_from([1, 3, 8]),
)
def test_any_corpus_line_dedup_matches_oracle(ray_session, seed, vocab_size, width):
    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(vocab_size)]
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
        for d in range(int(rng.integers(2, 35)))
    }
    got = line_dedup(_docs_ds(texts, n_blocks=4), width=width).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == _py_line_dedup(texts, width)


# --- within-doc variant ------------------------------------------------------


def _py_within_doc_dedup(texts: dict[int, str], width: int) -> dict[int, str]:
    out: dict[int, str] = {}
    for doc_id, text in texts.items():
        words = text.split(" ")
        seen: set[str] = set()
        kept = []
        for i in range(0, len(words), width):
            line = " ".join(words[i : i + width])
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = " ".join(kept)
    return out


def test_within_doc_dedup_keeps_cross_doc_repeats():
    from webscrape_neko_jirushi_ray.stages.linededup import within_doc_line_dedup

    texts = {
        1: "x y x y q r",   # chunk "x y" repeated within doc → second dies
        2: "x y a b",       # "x y" appears in doc 1 too but survives here
    }
    got = within_doc_line_dedup(_docs_ds(texts), width=2).to_pandas()
    got = dict(zip(got["doc_id"], got["text"]))
    assert got == {1: "x y q r", 2: "x y a b"}
    assert got == _py_within_doc_dedup(texts, 2)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    vocab_size=st.integers(min_value=1, max_value=20),
    width=st.sampled_from([1, 2, 8]),
)
def test_any_corpus_within_doc_dedup_matches_oracle(
    ray_session, seed, vocab_size, width
):
    from webscrape_neko_jirushi_ray.stages.linededup import within_doc_line_dedup

    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(vocab_size)]
    texts = {
        d: " ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
        for d in range(int(rng.integers(2, 30)))
    }
    got = within_doc_line_dedup(_docs_ds(texts, n_blocks=4), width=width).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == _py_within_doc_dedup(texts, width)
