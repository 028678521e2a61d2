"""Dedup-family + similarity-search + text-analysis behavior tests,
verified against brute-force computations on small corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from webscrape_neko_jirushi_ray.functions import textkit
from webscrape_neko_jirushi_ray.stages import dedup as D
from webscrape_neko_jirushi_ray.stages import simsearch as S


def corpus() -> pa.Table:
    """Small corpus with exact dups, near dups, and distinct docs."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm windowsill in the afternoon sun near the garden"
    )
    near = base.replace("afternoon", "morning")
    nearer = base + " today"
    texts = [
        base,
        base,                      # exact dup of 0
        near,                      # near dup
        nearer,                    # near dup
        "completely different content about ray data pipelines and arrow tables "
        "streaming through the object store with backpressure and spilling",
        "yet another unrelated document mentioning minhash signatures bands and "
        "buckets for locality sensitive hashing at scale",
        "  " + base + "  ",        # whitespace-normalized exact dup of 0
        "",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_exact_dedup_keep_first(ray_session):
    ds = ray.data.from_arrow(corpus())
    kept = sorted(r["doc_id"] for r in D.exact_dedup(ds).take_all())
    # 0==1==6 (normalized); everything else unique
    assert kept == [0, 2, 3, 4, 5, 7]


def test_minhash_lsh_matches_bruteforce_jaccard(ray_session):
    tbl = corpus()
    ds = ray.data.from_arrow(tbl)
    kept = sorted(r["doc_id"] for r in D.minhash_lsh_dedup(ds, threshold=0.7).take_all())
    # brute force: all-pairs shingle jaccard >= 0.7 → components → keep min
    sh = {r["doc_id"]: textkit.shingles(r["text"]) for r in tbl.to_pylist()}
    pairs = [
        (a, b)
        for a in sh
        for b in sh
        if a < b and textkit.jaccard(sh[a], sh[b]) >= 0.7
    ]
    comp = D._union_find_components(pairs)
    losers = {d for d, r in comp.items() if r != d}
    want = sorted(d for d in sh if d not in losers)
    assert kept == want
    assert 0 in kept and 1 not in kept  # exact dup collapsed


def test_simhash_collapses_near_identical(ray_session):
    ds = ray.data.from_arrow(corpus())
    kept = sorted(r["doc_id"] for r in D.simhash_dedup(ds, max_hamming=3).take_all())
    assert 0 in kept
    assert 1 not in kept  # identical text → identical simhash
    assert 4 in kept and 5 in kept  # unrelated docs survive


def test_simhash_md5_space_matches_scalar():
    """The oracle hash space: batched md5-space signatures are bit-exact
    with the scalar ``simhash64`` (which hashes tokens one hashlib call at
    a time) — including empty/blank/short/unicode docs."""
    samples = [
        "hello world the cat sat",
        "",
        "   ",
        "The THE the",
        "a b c d e f g h i j k",
        "héllo wörld ünïcode",
        "one",
        None,
    ]
    got = textkit.simhash64_batch(samples, hash_space="md5")
    want = [textkit.simhash64(s or "") for s in samples]
    assert [int(x) for x in got] == want


def test_simhash_dedup_md5_space(ray_session):
    """Same machinery, oracle hash space: survivors must match the fast
    space on this corpus (the planted dups are exact or heavily
    overlapping, so both hash spaces agree) and the exact-dup collapse
    invariants hold."""
    ds = ray.data.from_arrow(corpus())
    kept = sorted(
        r["doc_id"]
        for r in D.simhash_dedup(ds, max_hamming=3, hash_space="md5").take_all()
    )
    assert 0 in kept and 1 not in kept
    assert 4 in kept and 5 in kept


def test_ngram_dedup(ray_session):
    ds = ray.data.from_arrow(corpus())
    kept = sorted(r["doc_id"] for r in D.ngram_jaccard_dedup(ds, threshold=0.95).take_all())
    assert 1 not in kept and 0 in kept
    assert 4 in kept and 5 in kept


def test_embedding_dedup_and_knn(ray_session):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    vecs = np.vstack([base, base[0] + 1e-4 * rng.standard_normal(16).astype(np.float32)])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(21), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept = sorted(r["vec_id"] for r in D.embedding_dedup(ds, threshold=0.999).take_all())
    assert 20 not in kept and 0 in kept and len(kept) == 20

    # brute-force knn matches numpy reference
    q = vecs[:1].astype(np.float64)
    out = S.knn_brute_force(ds, q, k=5).to_pandas()
    mat = vecs.astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = (qn @ matn.T)[0]
    order = np.lexsort((np.arange(21), -sims))[:5]
    assert list(out["vec_id"]) == [int(i) for i in order]

    # LSH recall: top-1 (the planted near-dup) must be found
    lsh = S.knn_lsh(ds, q, k=5, dim=16, n_bits=4, multiprobe=1).to_pandas()
    assert int(lsh.iloc[0]["vec_id"]) in (0, 20)


def test_textkit_kernels():
    assert textkit.token_count_ws("  a  b\tc ") == 3
    assert textkit.token_count_ws("") == 0
    assert textkit.detect_lang("これは猫の里親募集のページです") == "ja"
    assert textkit.detect_lang("the cat sat on the mat and the dog barked") == "en"
    assert textkit.detect_lang("") == "unknown"
    s = textkit.quality_stats("The cat. The dog!")
    assert s["n_words"] == 4
    assert 0 < s["stopword_ratio"] <= 1
    assert textkit.fingerprint_md5("A  b") == textkit.fingerprint_md5(" a b ")
    assert textkit.hamming64(textkit.simhash64("x y z"), textkit.simhash64("x y z")) == 0
    # rolling fingerprint is stable + normalization-invariant
    assert textkit.rolling_fingerprint("Hello  World") == textkit.rolling_fingerprint(
        "hello world"
    )


def test_textprep_pipeline_monotone_and_deterministic(ray_session):
    import ray.data as rd

    from webscrape_neko_jirushi_ray.pipelines.textprep import prepare_text_corpus

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    kept, report = prepare_text_corpus(ds, min_words=5, min_quality=0.5)
    assert (
        report["input"]
        >= report["after_quality"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
    )
    assert report["total_tokens"] > 0
    kept2, report2 = prepare_text_corpus(ds, min_words=5, min_quality=0.5)
    assert report == report2
    a = sorted(r["doc_id"] for r in kept.select_columns(["doc_id"]).take_all())
    b = sorted(r["doc_id"] for r in kept2.select_columns(["doc_id"]).take_all())
    assert a == b


def test_embedding_dedup_lsh_finds_planted_dups(ray_session):
    rng = np.random.default_rng(13)
    base = rng.standard_normal((40, 24)).astype(np.float32)
    # plant 5 near-identical copies of the first 5 vectors
    dups = base[:5] + 1e-4 * rng.standard_normal((5, 24)).astype(np.float32)
    vecs = np.vstack([base, dups])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept = sorted(
        r["vec_id"]
        for r in D.embedding_dedup_lsh(
            ds, dim=24, threshold=0.999, n_bits=10, multiprobe=1
        ).take_all()
    )
    assert len(kept) == 40
    assert all(v < 40 for v in kept)  # the planted copies (40..44) dropped
    # matches the brute-force path exactly on this corpus
    kept_bf = sorted(
        r["vec_id"] for r in D.embedding_dedup(ds, threshold=0.999).take_all()
    )
    assert kept == kept_bf


def test_label_propagation_components_match_union_find(ray_session):
    import pyarrow as pa

    # chain 1-2-3, pair 10-11, triangle 20-21-22, singleton edge 30-31
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31)]
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )
    out = D.components_label_propagation(tbl).to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    want = D._union_find_components(pairs)
    assert got == want
    # long chain exercises multi-round convergence
    chain = [(i, i + 1) for i in range(100, 140)]
    tbl2 = pa.table(
        {
            "a": pa.array([p[0] for p in chain], type=pa.int64()),
            "b": pa.array([p[1] for p in chain], type=pa.int64()),
        }
    )
    out2 = D.components_label_propagation(tbl2).to_pandas()
    assert set(out2["component"]) == {100}


def test_minhash_batch_equals_per_doc():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "",
        "short one",
        "completely different content about ray data pipelines and arrow",
    ]
    sets = [textkit.shingles(t) for t in texts]
    batch = textkit.minhash_signatures_batch(sets, num_perm=64)
    for i, s in enumerate(sets):
        per_doc = textkit.minhash_signature(s, num_perm=64)
        assert (batch[i] == per_doc).all(), i


def test_minhash_distributed_components_path(ray_session, monkeypatch):
    """The fully-distributed pipeline (join-verified pairs + label-prop
    components + anti-join drop, NO driver union-find/dict) must produce
    the same kept set as the small-path on a corpus with many planted
    dup clusters (10x the base fixture)."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(300)]
    texts = []
    for base_i in range(20):
        words = list(rng.choice(vocab, size=40))
        base = " ".join(words)
        texts.append(base)
        for _ in range(3):  # 3 near-copies per base: 20 clusters of 4
            mutated = list(words)
            mutated[int(rng.integers(0, 40))] = str(rng.choice(vocab))
            texts.append(" ".join(mutated))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept_small = sorted(
        r["doc_id"] for r in D.minhash_lsh_dedup(ds, threshold=0.6).take_all()
    )
    # force every pair through label propagation + anti-join
    monkeypatch.setattr(D, "_PAIRS_DISTRIBUTED_THRESHOLD", 0)
    kept_dist = sorted(
        r["doc_id"] for r in D.minhash_lsh_dedup(ds, threshold=0.6).take_all()
    )
    assert kept_dist == kept_small
    assert len(kept_dist) < len(texts)  # dups actually collapsed


def test_embedding_lsh_equals_brute_at_0995(ray_session):
    """LSH-vs-brute equality at the production threshold 0.995."""
    rng = np.random.default_rng(29)
    base = rng.standard_normal((30, 24)).astype(np.float32)
    dups = base[:6] + 1e-3 * rng.standard_normal((6, 24)).astype(np.float32)
    vecs = np.vstack([base, dups])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept_lsh = sorted(
        r["vec_id"]
        for r in D.embedding_dedup_lsh(
            ds, dim=24, threshold=0.995, n_bits=10, multiprobe=1
        ).take_all()
    )
    kept_bf = sorted(
        r["vec_id"] for r in D.embedding_dedup(ds, threshold=0.995).take_all()
    )
    assert kept_lsh == kept_bf
