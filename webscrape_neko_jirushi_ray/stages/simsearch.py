"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast
  once (``ray.put``); each batch does one numpy matmul against it and emits
  its local top-k; a final tiny reduce merges per-batch candidates. No
  full-dataset materialization — only (batches x k) candidate rows ever
  leave the map stage.
- ``HyperplaneLSH`` + ``knn_lsh``: the scale path — random-hyperplane
  signatures bucket the corpus; queries probe their own bucket (+
  multiprobe neighbors), so each query touches a fraction of the corpus.
  Recall<1 by construction; exactness is the brute-force path's job.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def knn_brute_force(
    embeddings: "ray.data.Dataset",
    query_vecs: np.ndarray,
    k: int = 10,
    *,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """Exact cosine top-k for each query row. Returns
    (query_idx, rank, vec_id, cosine) sorted by (query_idx, rank); ties
    broken by vec_id ascending (pinned for determinism)."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)
    excl = exclude_ids or set()
    excl_ref = ray.put(excl)

    def _local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ex = ray.get(excl_ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
        sims = qm @ mat.T  # (nq, nb)
        rows = {"query_idx": [], "vec_id": [], "cosine": []}
        for qi in range(sims.shape[0]):
            order = np.lexsort((ids, -sims[qi]))
            taken = 0
            for j in order:
                if int(ids[j]) in ex:
                    continue
                rows["query_idx"].append(qi)
                rows["vec_id"].append(int(ids[j]))
                rows["cosine"].append(float(sims[qi, j]))
                taken += 1
                if taken >= k:
                    break
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], type=pa.int64()),
                "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    cand = embeddings.map_batches(
        _local_topk, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    # final reduce: k best per query over the per-batch candidates
    out = {"query_idx": [], "rank": [], "vec_id": [], "cosine": []}
    for qi, grp in cand.groupby("query_idx"):
        best = heapq.nsmallest(
            k, grp.itertuples(), key=lambda r: (-r.cosine, r.vec_id)
        )
        for rank, r in enumerate(best):
            out["query_idx"].append(int(qi))
            out["rank"].append(rank + 1)
            out["vec_id"].append(int(r.vec_id))
            out["cosine"].append(float(r.cosine))
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "vec_id": pa.array(out["vec_id"], type=pa.int64()),
            "cosine": pa.array(out["cosine"], type=pa.float64()),
        }
    )


class HyperplaneLSH:
    """Random-hyperplane signatures (seeded) for cosine LSH bucketing."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 0xBEE):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))
        self.n_bits = n_bits

    def signature(self, mat: np.ndarray) -> np.ndarray:
        proj = mat @ self.planes.T
        bits = (proj > 0).astype(np.uint32)
        out = np.zeros(len(mat), dtype=np.uint32)
        for b in range(self.n_bits):
            out |= bits[:, b] << b
        return out


def add_lsh_buckets(
    embeddings: "ray.data.Dataset", dim: int, n_bits: int = 12
) -> "ray.data.Dataset":
    """+ ``bucket`` column from hyperplane signatures (stateful stage: the
    plane matrix builds once per actor)."""

    class Bucketer:
        def __init__(self):
            self.lsh = HyperplaneLSH(dim, n_bits)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
            sig = self.lsh.signature(_normalize(mat))
            return batch.append_column("bucket", pa.array(sig, type=pa.uint32()))

    return embeddings.map_batches(
        Bucketer, batch_format="pyarrow", batch_size=4096, concurrency=2
    )


def knn_lsh(
    embeddings: "ray.data.Dataset",
    query_vecs: np.ndarray,
    k: int = 10,
    *,
    dim: int,
    n_bits: int = 8,
    multiprobe: int = 1,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """Approximate top-k: probe the query's bucket and all buckets within
    ``multiprobe`` bit flips, brute-force only those rows."""
    bucketed = add_lsh_buckets(embeddings, dim, n_bits)
    lsh = HyperplaneLSH(dim, n_bits)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    sigs = lsh.signature(q)
    want: set[int] = set()
    for s in sigs:
        want.add(int(s))
        if multiprobe >= 1:
            for b in range(n_bits):
                want.add(int(s) ^ (1 << b))
    want_arr = pa.array(sorted(want), type=pa.uint32())

    def _probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["bucket"], value_set=want_arr))

    probe = bucketed.map_batches(_probe, batch_format="pyarrow")
    return knn_brute_force(probe, query_vecs, k, exclude_ids=exclude_ids)


class IVFIndex:
    """IVF coarse quantizer: seeded k-means (few Lloyd iterations, numpy)
    over a sample; vectors assign to their nearest centroid's list. Queries
    probe the ``nprobe`` nearest centroids — the classic recall/cost dial.
    Deterministic (fixed seed, fixed iteration count)."""

    def __init__(self, n_lists: int = 16, n_iter: int = 8, seed: int = 0xA11CE):
        self.n_lists = n_lists
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def train(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.default_rng(self.seed)
        k = min(self.n_lists, len(x))
        cent = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 1e-12:
                        cent[c] = v / n
        self.centroids = cent
        return self

    def assign(self, mat: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(mat) @ self.centroids.T, axis=1)


def knn_ivf(
    embeddings: "ray.data.Dataset",
    query_vecs: np.ndarray,
    k: int = 10,
    *,
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """IVF-bucketed approximate top-k: train the coarse quantizer on a
    driver-side sample (centroids broadcast via closure capture — tiny),
    add a ``ivf_list`` column in a map stage, then brute-force only rows
    whose list is among each query's ``nprobe`` nearest centroids."""
    sample = np.stack(
        embeddings.limit(train_sample).to_pandas()["embedding"].to_numpy()
    ).astype(np.float64)
    index = IVFIndex(n_lists=n_lists).train(sample)
    cents = index.centroids

    def _assign(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        lists = np.argmax(_normalize(mat) @ cents.T, axis=1)
        return batch.append_column("ivf_list", pa.array(lists, type=pa.int32()))

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_lists = set(
        int(l)
        for qi in range(len(q))
        for l in np.argsort(-(q[qi] @ cents.T))[:nprobe]
    )
    probe_arr = pa.array(sorted(probe_lists), type=pa.int32())

    def _probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["ivf_list"], value_set=probe_arr))

    probed = (
        embeddings.map_batches(_assign, batch_format="pyarrow", batch_size=4096)
        .map_batches(_probe, batch_format="pyarrow")
    )
    return knn_brute_force(probed, query_vecs, k, exclude_ids=exclude_ids)
