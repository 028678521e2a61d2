"""Round-3 text operators: C4 line-quality filter, exact distributed
length quantiles, inverted-index build, stratified sampling.

Semantics pinned here independent of the DuckDB oracle the driver runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from webscrape_neko_jirushi_ray.stages.linededup import c4_line_filter
from webscrape_neko_jirushi_ray.stages.textstats import (
    inverted_index,
    length_quantiles,
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


def _py_c4(
    texts: dict[int, str],
    width: int,
    line_blacklist: tuple[str, ...],
    doc_blacklist: tuple[str, ...],
    min_lines: int,
    min_line_words: int | None = None,
) -> dict[int, str]:
    min_w = width if min_line_words is None else min_line_words
    out: dict[int, str] = {}
    for doc_id in sorted(texts):
        text = texts[doc_id]
        if any(s in text for s in doc_blacklist):
            continue
        words = text.split(" ")
        kept = []
        for i in range(0, len(words), width):
            chunk = words[i : i + width]
            line = " ".join(chunk)
            if len(chunk) < min_w:
                continue
            if any(s in line for s in line_blacklist):
                continue
            kept.append(line)
        if len(kept) >= min_lines:
            out[doc_id] = " ".join(kept)
    return out


def test_c4_drops_partial_and_blacklisted_chunks(ray_session):
    texts = {
        1: "a b bad d e f g h i",  # chunk0 blacklisted, chunk1 partial -> doc drops
        2: "a b c d e f g h " * 3 + "x",  # 3 full chunks + partial tail
        3: "p q r s t u v w",  # 1 full chunk < min_lines
    }
    texts = {k: v.strip() for k, v in texts.items()}
    got = (
        c4_line_filter(
            _docs_ds(texts), width=8, line_blacklist=("bad",), min_lines=2
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    want = _py_c4(texts, 8, ("bad",), (), 2)
    assert dict(zip(got["doc_id"], got["text"])) == want
    assert set(got["doc_id"]) == {2}


def test_c4_doc_blacklist_drops_whole_doc(ray_session):
    texts = {
        1: "a b c d e f g h i j k l m n o p q r s t u v w x",
        2: "a b c d e f g h i j k l m n o p q r s t u v w lorem",
    }
    got = (
        c4_line_filter(
            _docs_ds(texts, n_blocks=2),
            width=8,
            doc_blacklist=("lorem",),
            min_lines=3,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(got["doc_id"]) == [1]
    assert got["text"].iloc[0] == texts[1]


def test_c4_all_docs_drop_yields_empty_with_schema(ray_session):
    texts = {1: "a b", 2: "c d"}
    got = c4_line_filter(_docs_ds(texts), width=8, min_lines=1)
    # Ray's to_pandas() drops columns at zero rows; the Dataset schema is
    # the contract downstream stages consume
    assert got.schema().names == ["doc_id", "text"]
    assert got.count() == 0


def test_c4_matches_python_oracle_random(ray_session):
    rng = np.random.default_rng(42)
    vocab = ["a", "b", "c", "bad", "x", "y"]
    texts = {
        i: " ".join(rng.choice(vocab, size=rng.integers(1, 40)))
        for i in range(60)
    }
    got = (
        c4_line_filter(
            _docs_ds(texts, n_blocks=4),
            width=4,
            line_blacklist=("bad",),
            doc_blacklist=("x y x",),
            min_lines=2,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    want = _py_c4(texts, 4, ("bad",), ("x y x",), 2)
    assert dict(zip(got["doc_id"], got["text"])) == want


def test_length_quantiles_nearest_rank(ray_session):
    # 10 docs with word counts 1..10; floor((n-1)*q/100) indices
    texts = {i: " ".join(["w"] * i) for i in range(1, 11)}
    got = length_quantiles(_docs_ds(texts, n_blocks=3))
    lens = np.arange(1, 11)
    want = {qp: int(lens[((len(lens) - 1) * qp) // 100] ) for qp in (25, 50, 75, 95, 99)}
    assert dict(zip(got["q_pct"], got["n_words"])) == want
    assert got["n_words"].dtype == np.int64


def test_length_quantiles_single_doc(ray_session):
    got = length_quantiles(_docs_ds({5: "a b c"}))
    assert set(got["n_words"]) == {3}


def test_inverted_index_basic(ray_session):
    texts = {1: "a b a", 2: "b c", 3: "c c c"}
    got = (
        inverted_index(_docs_ds(texts, n_blocks=3))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    rows = {r["term"]: (r["df"], r["postings"]) for _, r in got.iterrows()}
    assert rows == {"a": (1, "1"), "b": (2, "1,2"), "c": (2, "2,3")}


def test_inverted_index_min_df(ray_session):
    texts = {1: "a b", 2: "b c"}
    got = inverted_index(_docs_ds(texts), min_df=2).to_pandas()
    assert list(got["term"]) == ["b"]
    assert list(got["postings"]) == ["1,2"]


def test_inverted_index_cross_batch_doc_dedup(ray_session):
    # the same (term, doc) arriving from different batches collapses
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7], type=pa.int64()),
            "text": pa.array(["a b", "a c"]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = inverted_index(ds).to_pandas().sort_values("term")
    rows = {r["term"]: (r["df"], r["postings"]) for _, r in got.iterrows()}
    assert rows == {"a": (1, "7"), "b": (1, "7"), "c": (1, "7")}


def test_grouped_topk_matches_sorted_head(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_topk

    rng = np.random.default_rng(7)
    n = 500
    tbl = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], size=n)),
            "v": pa.array(rng.integers(0, 50, size=n), type=pa.int64()),
            "id": pa.array(np.arange(n), type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = (
        grouped_topk(ds, group_col="g", order_cols=["v", "id"], k=5)
        .to_pandas()
        .sort_values(["g", "v", "id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    df = tbl.to_pandas()
    want = (
        df.sort_values(["g", "v", "id"])
        .groupby("g", sort=True)
        .head(5)
        .sort_values(["g", "v", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want[["g", "v", "id"]])


def test_grouped_topk_k_exceeds_group_size(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_topk

    tbl = pa.table(
        {
            "g": pa.array(["x", "x", "y"]),
            "v": pa.array([2, 1, 9], type=pa.int64()),
        }
    )
    got = (
        grouped_topk(
            ray.data.from_arrow(tbl), group_col="g", order_cols=["v"], k=10
        )
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {"g": "x", "v": 1},
        {"g": "x", "v": 2},
        {"g": "y", "v": 9},
    ]


def test_grouped_length_quantiles_per_group_nearest_rank(ray_session):
    from webscrape_neko_jirushi_ray.stages.textstats import (
        grouped_length_quantiles,
    )

    texts, langs = {}, {}
    # lang a: lengths 1..5 ; lang b: lengths 10,20,30
    for i, ln in enumerate([1, 2, 3, 4, 5]):
        texts[i] = " ".join(["w"] * ln)
        langs[i] = "a"
    for i, ln in zip([10, 11, 12], [10, 20, 30]):
        texts[i] = " ".join(["w"] * ln)
        langs[i] = "b"
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
            "lang": pa.array([langs[k] for k in sorted(texts)]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = grouped_length_quantiles(ds, group_col="lang", q_pcts=(50, 90))
    rows = {(r["lang"], r["q_pct"]): r["n_words"] for _, r in got.iterrows()}
    # a: n=5 -> p50 idx (4*50)//100=2 -> 3 ; p90 idx (4*90)//100=3 -> 4
    # b: n=3 -> p50 idx (2*50)//100=1 -> 20 ; p90 idx (2*90)//100=1 -> 20
    assert rows == {("a", 50): 3, ("a", 90): 4, ("b", 50): 20, ("b", 90): 20}


def test_tfidf_top_terms_small(ray_session):
    from webscrape_neko_jirushi_ray.stages.textstats import tfidf_top_terms

    # doc 1: 'a' tf=2 df=2 -> 1e9 ; 'b' tf=1 df=1 -> 1e9 (tie -> 'a','b')
    # doc 2: 'a' tf=1 df=2 -> 5e8 ; 'c' tf=1 df=1 -> 1e9
    texts = {1: "a a b", 2: "a c"}
    got = (
        tfidf_top_terms(_docs_ds(texts, n_blocks=2), k=2)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    rows = [(r["doc_id"], r["term"], r["score"]) for _, r in got.iterrows()]
    assert rows == [
        (1, "a", 1_000_000_000),
        (1, "b", 1_000_000_000),
        (2, "a", 500_000_000),
        (2, "c", 1_000_000_000),
    ]


def test_grouped_topk_string_order_key(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_topk

    tbl = pa.table(
        {
            "g": pa.array(["x"] * 4),
            "s": pa.array(["delta", "alpha", "charlie", "bravo"]),
        }
    )
    got = (
        grouped_topk(
            ray.data.from_arrow(tbl).repartition(2),
            group_col="g",
            order_cols=["s"],
            k=2,
        )
        .to_pandas()
        .sort_values("s")
    )
    assert list(got["s"]) == ["alpha", "bravo"]


def test_doc_commonness_small(ray_session):
    from webscrape_neko_jirushi_ray.stages.textstats import doc_commonness

    # df: a->2, b->1, c->2 ; doc1 = a a b -> 2+2+1 = 5 ; doc2 = a c c -> 2+2+2=6
    texts = {1: "a a b", 2: "a c c", 3: "c"}
    got = (
        doc_commonness(_docs_ds(texts, n_blocks=3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert dict(zip(got["doc_id"], got["commonness"])) == {1: 5, 2: 6, 3: 2}


def test_shuffle_ops_partition_count_invariant(ray_session):
    """The term-hash shuffles must produce identical results whatever the
    partition count or block split — the correctness claim behind scaling
    num_partitions to corpus size."""
    from webscrape_neko_jirushi_ray.stages.textstats import (
        doc_commonness,
        inverted_index,
        tfidf_top_terms,
    )

    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(50)]
    texts = {
        i: " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for i in range(120)
    }

    def run(fn, **kw):
        frames = []
        for blocks, parts in ((1, 2), (6, 16), (12, 64)):
            df = fn(_docs_ds(texts, n_blocks=blocks), num_partitions=parts)
            df = df.to_pandas()
            frames.append(
                df.sort_values(list(df.columns)).reset_index(drop=True)
            )
        assert frames[0].equals(frames[1]) and frames[1].equals(frames[2])

    run(inverted_index)
    run(lambda ds, **kw: tfidf_top_terms(ds, k=2, **kw))
    run(doc_commonness)


def test_doc_term_explode_empty_batch(ray_session):
    import pyarrow as pa

    from webscrape_neko_jirushi_ray.stages.textstats import _doc_term_explode

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = _doc_term_explode(
        empty, id_col="doc_id", text_col="text", num_partitions=8, with_tf=True
    )
    assert out.num_rows == 0 and "tf" in out.column_names


def test_tfidf_route_parity(ray_session):
    """The zero-shuffle broadcast-vocab route and the exact two-shuffle
    plan must produce identical (doc, term, score) rows (VERDICT r3 #3)."""
    from webscrape_neko_jirushi_ray.stages.textstats import tfidf_top_terms

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(80)]
    texts = {
        i: " ".join(rng.choice(vocab, size=rng.integers(4, 40)))
        for i in range(300)
    }
    a = (
        tfidf_top_terms(_docs_ds(texts, n_blocks=5), k=3)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    b = (
        tfidf_top_terms(
            _docs_ds(texts, n_blocks=5), k=3, broadcast_vocab_threshold=0
        )
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a.groupby("doc_id").size() <= 3).all()


def test_chunk_documents_semantics(ray_session):
    """Window/stride math: K = 1 if n <= W else ceil((n-W)/S)+1; last
    window may be short; chunks reassemble the original token stream."""
    from webscrape_neko_jirushi_ray.stages.textstats import chunk_documents

    texts = {
        1: "a b c",                       # n=3 <= W -> 1 chunk
        2: " ".join(f"t{i}" for i in range(10)),   # n=10, W=4,S=3 -> 3 chunks
        3: " ".join(f"u{i}" for i in range(4)),    # n=4 == W -> 1 chunk
        4: "",                            # '' splits to [''] -> 1 chunk
    }
    got = (
        chunk_documents(_docs_ds(texts, n_blocks=2), window=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    assert len(by_doc[1]) == 1 and by_doc[1]["chunk_text"].iloc[0] == "a b c"
    c2 = by_doc[2]
    assert list(c2["chunk_idx"]) == [0, 1, 2]
    assert c2["chunk_text"].iloc[0] == "t0 t1 t2 t3"
    assert c2["chunk_text"].iloc[1] == "t3 t4 t5 t6"
    assert c2["chunk_text"].iloc[2] == "t6 t7 t8 t9"
    assert list(c2["n_tokens"]) == [4, 4, 4]
    assert len(by_doc[3]) == 1 and by_doc[3]["n_tokens"].iloc[0] == 4
    assert len(by_doc[4]) == 1 and by_doc[4]["chunk_text"].iloc[0] == ""
    # stride overhang: n=11, W=4, S=3 -> K=ceil(7/3)+1=4, last chunk len 2
    got2 = (
        chunk_documents(
            _docs_ds({9: " ".join(f"v{i}" for i in range(11))}, n_blocks=1),
            window=4, stride=3,
        )
        .to_pandas()
        .sort_values("chunk_idx")
    )
    assert list(got2["n_tokens"]) == [4, 4, 4, 2]
    assert got2["chunk_text"].iloc[3] == "v9 v10"


def test_top_bigrams_excludes_doc_boundaries(ray_session):
    from webscrape_neko_jirushi_ray.stages.textstats import top_bigrams

    # 'b a' would only arise across the doc1|doc2 boundary — must NOT count
    texts = {1: "a b", 2: "a b a b", 3: "x"}
    got = top_bigrams(_docs_ds(texts, n_blocks=3), k=10)
    rows = {r["bigram"]: r["n"] for _, r in got.iterrows()}
    assert rows == {"a b": 3, "b a": 1}  # 'b a' only inside doc 2


def test_bucketed_exact_quantiles_matches_numpy(ray_session):
    """Two-level refine == dense nearest-rank on a domain wide enough to
    force a nonzero bucket shift (values up to 2^40, coarse_bits=10)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.textstats import (
        bucketed_exact_quantiles,
    )

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(-(2**35), 2**40, 5000),
            rng.integers(0, 50, 2000),  # heavy low-value cluster
            np.array([2**40 - 1, -(2**35)]),  # exact extremes
        ]
    ).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})
    ).repartition(8)
    q_pcts = (1, 25, 50, 75, 99)
    out = bucketed_exact_quantiles(ds, "v", q_pcts, coarse_bits=10)
    s = np.sort(vals)
    want = pd.DataFrame(
        {
            "q_pct": list(q_pcts),
            "value": [int(s[(len(s) - 1) * q // 100]) for q in q_pcts],
        }
    )
    assert out.astype("int64").equals(want.astype("int64"))


def test_bucketed_exact_quantiles_empty_and_constant(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.textstats import (
        bucketed_exact_quantiles,
    )

    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    assert len(bucketed_exact_quantiles(empty, "v", (50,))) == 0
    const = ray.data.from_arrow(
        pa.table({"v": pa.array(np.full(100, 7), pa.int64())})
    )
    out = bucketed_exact_quantiles(const, "v", (1, 99))
    assert list(out["value"]) == [7, 7]


from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st


@_settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(min_value=0, max_value=10_000),
    span_bits=_st.sampled_from([4, 20, 44]),  # below/at/above coarse_bits
    n=_st.sampled_from([1, 37, 3000]),
    coarse_bits=_st.sampled_from([4, 12]),
)
def test_bucketed_exact_quantiles_property(
    ray_session, seed, span_bits, n, coarse_bits
):
    """Random domains x sizes x coarse widths == numpy nearest-rank,
    including shift-0 (domain narrower than the bucket table) and
    deep-shift regimes, duplicate-heavy data, and negative offsets."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.textstats import (
        bucketed_exact_quantiles,
    )

    rng = np.random.default_rng(seed)
    lo = int(rng.integers(-(2**50), 2**50))
    vals = (lo + rng.integers(0, 2**span_bits, n)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})
    ).repartition(4)
    q_pcts = (0, 10, 50, 90, 100)
    out = bucketed_exact_quantiles(ds, "v", q_pcts, coarse_bits=coarse_bits)
    s = np.sort(vals)
    want = pd.DataFrame(
        {
            "q_pct": list(q_pcts),
            "value": [int(s[(len(s) - 1) * q // 100]) for q in q_pcts],
        }
    )
    assert out.astype("int64").equals(want.astype("int64"))


def test_doc_compression_ratio_rowwise_parity(ray_session):
    """The rows-only compression-ratio query equals the direct row-wise
    computation (its correctness pin — no SQL oracle can DEFLATE)."""
    import zlib

    import pandas as pd

    from webscrape_neko_jirushi_ray.pipelines.queries import (
        doc_compression_ratio,
    )

    sf = "/root/testdata/sf0.001"
    got = doc_compression_ratio(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    assert list(got["doc_id"]) == list(docs["doc_id"])
    for _i, (txt, raw, comp) in enumerate(
        zip(docs["text"], got["raw_bytes"], got["compressed_bytes"])
    ):
        b = (txt or "").encode("utf-8")
        assert raw == len(b)
        assert comp == len(zlib.compress(b, 6))
    assert (got["ratio"] > 0).all()
