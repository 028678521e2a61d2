"""Deduplication family over the documents/embeddings tables.

Large-scale training-data dedup as Ray Data pipelines (first-class
components per the build brief, modeled on the reference's exact-dup removal
D2 at aggressive_cleaning.py:170-200 generalized to text):

- exact: md5-of-normalized-text hash-partition + per-group keep-first;
- MinHash+LSH near-dup: shingle → minhash → band → bucket groupby →
  candidate pairs → exact-Jaccard verify → connected components →
  keep min doc_id per component;
- SimHash near-dup: 64-bit simhash, 4x16-bit band buckets, Hamming verify;
- n-gram Jaccard: LSH-candidates verified with exact char-3gram Jaccard;
- embedding cosine near-dup: normalized-vector matmul per batch against a
  broadcast matrix (brute force) — the IVF/LSH variant lives in
  ``simsearch.py``.

Scale notes: candidate-pair generation is a shuffle (groupby bucket); pair
verification is vectorized per group; connected components run union-find
over CANDIDATE PAIRS ONLY (bounded: pairs surviving LSH, orders of
magnitude smaller than n^2 — logged when truncated). Components via
driver union-find here; at 10^10 docs this becomes iterated min-label
propagation (groupby rounds), same semantics.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions import textkit


# --- exact ---------------------------------------------------------------


def exact_dedup(docs: "ray.data.Dataset", key: str = "text") -> "ray.data.Dataset":
    """Exact dedup keep-first (min doc_id) by normalized-text md5.
    SQL-oracle-able: min(doc_id) group by md5(normalized text)."""

    def _fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "fp_md5",
            pa.array(
                [textkit.fingerprint_md5(t or "") for t in batch[key].to_pylist()],
                type=pa.string(),
            ),
        )

    def _first(group: pa.Table) -> pa.Table:
        return group.sort_by([("doc_id", "ascending")]).slice(0, 1)

    return (
        docs.map_batches(_fp, batch_format="pyarrow", batch_size=2048)
        .groupby("fp_md5")
        .map_groups(_first, batch_format="pyarrow")
    )


# --- candidate-pair machinery --------------------------------------------


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """doc_id -> component representative (min id). Driver-side over the
    LSH-surviving pairs only."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# Above this many verified pairs, component resolution goes through the
# distributed min-label propagation instead of driver union-find.
_PAIRS_DISTRIBUTED_THRESHOLD = 2_000_000


def _dedup_by_pairs(docs: "ray.data.Dataset", dup_pairs: list[tuple[int, int]]):
    """Drop every doc whose component representative isn't itself."""
    if len(dup_pairs) > _PAIRS_DISTRIBUTED_THRESHOLD:
        tbl = pa.table(
            {
                "a": pa.array([p[0] for p in dup_pairs], type=pa.int64()),
                "b": pa.array([p[1] for p in dup_pairs], type=pa.int64()),
            }
        )
        comp_tbl = components_label_propagation(tbl)
        comp = dict(
            zip(comp_tbl["doc_id"].to_pylist(), comp_tbl["component"].to_pylist())
        )
    else:
        comp = _union_find_components(dup_pairs)
    losers = {d for d, rep in comp.items() if rep != d}
    losers_ref = ray.put(losers)

    def _drop(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        mask = pa.array([d not in lose for d in batch["doc_id"].to_pylist()])
        return batch.filter(mask)

    return docs.map_batches(_drop, batch_format="pyarrow", batch_size=4096)


# --- MinHash + LSH --------------------------------------------------------


def minhash_candidates(
    docs: "ray.data.Dataset",
    *,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
) -> list[tuple[int, int]]:
    """LSH candidate pairs: shingle+minhash per batch, explode to
    (band_key, doc_id), groupby band_key, pair up within buckets."""

    def _bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        sets = [
            textkit.shingles(t or "", k=shingle_k)
            for t in batch["text"].to_pylist()
        ]
        sigs = textkit.minhash_signatures_batch(sets, num_perm=num_perm)
        keys, ids = [], []
        for doc_id, sig in zip(doc_ids, sigs):
            for bk in textkit.lsh_band_keys(sig, bands=bands):
                keys.append(bk)
                ids.append(doc_id)
        return pa.table(
            {
                "band_key": pa.array(keys, type=pa.binary()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
        )

    exploded = docs.map_batches(_bands, batch_format="pyarrow", batch_size=1024)
    pair_tbl = (
        exploded.groupby("band_key").map_groups(_pairs, batch_format="pyarrow")
    ).to_pandas()
    if "a" not in pair_tbl.columns:  # no bucket had >1 doc
        return []
    return sorted(set(zip(pair_tbl["a"], pair_tbl["b"])))


def minhash_lsh_dedup(
    docs: "ray.data.Dataset",
    *,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
) -> "ray.data.Dataset":
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify at
    ``threshold`` → connected components → keep min doc_id."""
    cands = minhash_candidates(
        docs, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    if not cands:
        return docs
    need = sorted({d for p in cands for d in p})
    need_set = set(need)

    def _shingle_rows(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id in need_set:
                ids.append(doc_id)
                blobs.append(b"".join(sorted(textkit.shingles(text or "", k=shingle_k))))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "sh": pa.array(blobs, type=pa.binary())}
        )

    sh_tbl = docs.map_batches(_shingle_rows, batch_format="pyarrow").to_pandas()
    sh_map = {
        int(r.doc_id): {r.sh[i : i + 8] for i in range(0, len(r.sh), 8)}
        for r in sh_tbl.itertuples()
    }
    dup_pairs = [
        (a, b)
        for a, b in cands
        if textkit.jaccard(sh_map.get(a, set()), sh_map.get(b, set())) >= threshold
    ]
    return _dedup_by_pairs(docs, dup_pairs)


# --- SimHash --------------------------------------------------------------


def simhash_dedup(
    docs: "ray.data.Dataset", *, max_hamming: int = 3
) -> "ray.data.Dataset":
    """SimHash near-dup: 64-bit signatures, candidates share one of four
    16-bit bands (any pair within Hamming<=3 of each other must agree on
    >=1 band by pigeonhole when differing bits spread over bands)."""

    def _sig(batch: pa.Table) -> pa.Table:
        sigs = [textkit.simhash64(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s & 0xFFFFFFFFFFFFFFFF for s in sigs], type=pa.uint64()),
            }
        )

    sig_tbl = docs.map_batches(_sig, batch_format="pyarrow").to_pandas()
    sig_map = dict(zip(sig_tbl["doc_id"].astype(int), sig_tbl["sig"].astype(np.uint64)))
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for d, s in sig_map.items():
        for band in range(4):
            buckets[(band, int((int(s) >> (band * 16)) & 0xFFFF))].append(d)
    dup_pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if textkit.hamming64(int(sig_map[a]), int(sig_map[b])) <= max_hamming:
                    dup_pairs.add((a, b))
    return _dedup_by_pairs(docs, sorted(dup_pairs))


# --- n-gram Jaccard -------------------------------------------------------


def ngram_jaccard_dedup(
    docs: "ray.data.Dataset", *, threshold: float = 0.9, n: int = 3
) -> "ray.data.Dataset":
    """Char-ngram Jaccard near-dup: MinHash-LSH candidates (word shingles)
    re-verified with exact character n-gram Jaccard."""
    cands = minhash_candidates(docs, num_perm=64, bands=16, shingle_k=3)
    if not cands:
        return docs
    need = {d for p in cands for d in p}

    def _grams(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id in need:
                ids.append(doc_id)
                grams.append(list(textkit.char_ngrams(text or "", n=n)))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "grams": pa.array(grams, type=pa.list_(pa.string()))}
        )

    g_tbl = docs.map_batches(_grams, batch_format="pyarrow").to_pandas()
    g_map = {int(r.doc_id): set(r.grams) for r in g_tbl.itertuples()}
    dup_pairs = [
        (a, b)
        for a, b in cands
        if textkit.jaccard(g_map.get(a, set()), g_map.get(b, set())) >= threshold
    ]
    return _dedup_by_pairs(docs, dup_pairs)


# --- embedding cosine -----------------------------------------------------


def embedding_dedup(
    embeddings: "ray.data.Dataset", *, threshold: float = 0.995
) -> "ray.data.Dataset":
    """Embedding-cosine near-dup: normalize vectors, brute-force cosine per
    batch against the broadcast full matrix (fine to ~10^5; the bucketed
    scale path reuses simsearch.HyperplaneLSH buckets), keep min vec_id of
    each above-threshold component."""
    tbl = embeddings.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = np.asarray(batch["vec_id"].to_pylist())
        bmat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T
        a_out, b_out = [], []
        for r in range(len(bids)):
            hits = np.nonzero(sims[r] >= threshold)[0]
            for c in hits:
                if all_ids[c] > bids[r]:
                    a_out.append(int(bids[r]))
                    b_out.append(int(all_ids[c]))
        return pa.table(
            {"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())}
        )

    pair_tbl = embeddings.map_batches(
        _pairs, batch_format="pyarrow", batch_size=512
    ).to_pandas()
    if "a" not in pair_tbl.columns:  # no above-threshold pair anywhere
        return embeddings
    dup_pairs = sorted(set(zip(pair_tbl["a"], pair_tbl["b"])))
    comp = _union_find_components(dup_pairs)
    losers = {d for d, rep in comp.items() if rep != d}
    losers_ref = ray.put(losers)

    def _drop(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        mask = pa.array([v not in lose for v in batch["vec_id"].to_pylist()])
        return batch.filter(mask)

    return embeddings.map_batches(_drop, batch_format="pyarrow", batch_size=4096)


def embedding_dedup_lsh(
    embeddings: "ray.data.Dataset",
    *,
    dim: int,
    threshold: float = 0.995,
    n_bits: int = 10,
    multiprobe: int = 1,
) -> "ray.data.Dataset":
    """Scale path for embedding near-dup: hyperplane-LSH signatures bucket
    the corpus (a groupby shuffle, never a broadcast matrix); candidate
    pairs form within a bucket and its ``multiprobe`` bit-flip neighbors;
    exact cosine verifies. Near-identical vectors (cos >= ~0.99) disagree
    on a hyperplane with probability ~acos(cos)/pi per bit, so recall at
    dedup-grade thresholds is high and tunable via n_bits/multiprobe."""
    import numpy as np

    from .simsearch import HyperplaneLSH, _normalize

    lsh = HyperplaneLSH(dim, n_bits)

    def _sig(batch: pa.Table) -> pa.Table:
        mat = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
        sigs = lsh.signature(mat)
        rows_id, rows_bucket = [], []
        for vid, s in zip(batch["vec_id"].to_pylist(), sigs):
            buckets = {int(s)}
            for k in range(multiprobe and n_bits):
                buckets.add(int(s) ^ (1 << k))
            for b in buckets:
                rows_id.append(vid)
                rows_bucket.append(b)
        return pa.table(
            {
                "vec_id": pa.array(rows_id, type=pa.int64()),
                "bucket": pa.array(rows_bucket, type=pa.uint32()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["vec_id"].to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
        )

    cand_tbl = (
        embeddings.map_batches(_sig, batch_format="pyarrow", batch_size=2048)
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if "a" not in cand_tbl.columns:
        return embeddings
    cands = sorted(set(zip(cand_tbl["a"], cand_tbl["b"])))

    # verify candidates with exact cosine (only candidate vectors pulled)
    need = sorted({d for p in cands for d in p})
    need_set = set(need)

    def _vecs(batch: pa.Table) -> pa.Table:
        keep = pa.array([v in need_set for v in batch["vec_id"].to_pylist()])
        return batch.filter(keep)

    vec_tbl = embeddings.map_batches(_vecs, batch_format="pyarrow").to_pandas()
    vmap = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in vec_tbl.itertuples()
    }
    for k in vmap:
        n = np.linalg.norm(vmap[k])
        if n > 1e-12:
            vmap[k] = vmap[k] / n
    dup_pairs = [
        (a, b) for a, b in cands if float(vmap[a] @ vmap[b]) >= threshold
    ]
    comp = _union_find_components(dup_pairs)
    losers = {d for d, rep in comp.items() if rep != d}
    losers_ref = ray.put(losers)

    def _drop(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        mask = pa.array([v not in lose for v in batch["vec_id"].to_pylist()])
        return batch.filter(mask)

    return embeddings.map_batches(_drop, batch_format="pyarrow", batch_size=4096)


def components_label_propagation(
    pairs: "ray.data.Dataset | pa.Table", *, max_rounds: int = 50
) -> pa.Table:
    """Distributed connected components over candidate-pair edges by
    iterated min-label propagation — the scale path the driver-side
    union-find documents (at 10^10 docs the pair set no longer fits one
    machine).

    Each round: explode edges to (node, neighbor_label) messages both ways
    → groupby(node).min → new labels; stop at fixpoint. Converges in
    O(diameter) rounds; every round is one groupby shuffle. Returns
    (doc_id, component) with component = min doc_id of the component."""
    import pandas as pd

    tbl = pairs if isinstance(pairs, pa.Table) else pa.concat_tables(
        [ray.get(r) for r in pairs.to_arrow_refs()], promote_options="default"
    )
    if tbl.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "component": pa.array([], type=pa.int64())}
        )
    edges = ray.data.from_arrow(tbl)

    # labels start as the node id itself
    nodes = pd.unique(
        pd.concat([tbl["a"].to_pandas(), tbl["b"].to_pandas()], ignore_index=True)
    )
    labels = ray.data.from_arrow(
        pa.table({"node": pa.array(sorted(nodes), type=pa.int64()),
                  "label": pa.array(sorted(nodes), type=pa.int64())})
    )

    from ray.data.aggregate import Min

    for _ in range(max_rounds):
        lab_tbl = pa.concat_tables(
            [ray.get(r) for r in labels.to_arrow_refs()], promote_options="default"
        )
        lab_map = dict(
            zip(lab_tbl["node"].to_pylist(), lab_tbl["label"].to_pylist())
        )
        lab_ref = ray.put(lab_map)

        def _messages(batch: pa.Table) -> pa.Table:
            lm = ray.get(lab_ref)
            nodes_out, labels_out = [], []
            for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
                la, lb = lm[a], lm[b]
                # each endpoint hears the other's label and its own
                nodes_out += [a, b, a, b]
                labels_out += [lb, la, la, lb]
            return pa.table(
                {"node": pa.array(nodes_out, type=pa.int64()),
                 "label": pa.array(labels_out, type=pa.int64())}
            )

        new_labels = (
            edges.map_batches(_messages, batch_format="pyarrow", batch_size=8192)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        new_tbl = pa.concat_tables(
            [ray.get(r) for r in new_labels.to_arrow_refs()],
            promote_options="default",
        ).sort_by("node")
        old_sorted = lab_tbl.sort_by("node")
        if new_tbl["label"].to_pylist() == old_sorted["label"].to_pylist():
            break
        labels = ray.data.from_arrow(new_tbl)

    final = pa.concat_tables(
        [ray.get(r) for r in labels.to_arrow_refs()], promote_options="default"
    ).sort_by("node")
    return pa.table(
        {"doc_id": final["node"], "component": final["label"]}
    )
