"""Distributed Lloyd's k-means over an embedding column — the iterative
map-reduce algorithm class (the IVF coarse quantizer in
stages/simsearch.py trains on a driver-side SAMPLE; this one scans the
full corpus every iteration, the shape a 100-TB embedding table needs).

Scale design, per iteration:
- centroids (k × dim floats) broadcast ONCE via ``ray.put`` and read
  inside every task — never re-shipped per batch;
- each batch collapses to a k-row partial (per-cluster count + vector
  sum) via ``np.add.at`` — the combiner/pre-aggregation pattern, so the
  reduce input is O(k × blocks), never O(corpus);
- the k × blocks partial table is reduced on the driver (k × dim floats
  of state — metadata-sized at any corpus size; the corpus itself never
  leaves the tasks).
Initialization is deterministic (the k lowest-id vectors, found with a
batch-local top-k prune), so reruns converge identically up to
floating-point reduce order. Empty clusters keep their previous
centroid (standard Lloyd fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str, dim: int) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.asarray(flat, dtype=np.float64).reshape(-1, dim)


def _assign_to(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # argmin ||x - c||^2 == argmin (||c||^2 - 2 x.c), vectorized
    d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (mat @ cent.T)
    return np.argmin(d, axis=1)


def _init_centroids(
    ds: "ray.data.Dataset", k: int, id_col: str, vec_col: str, dim: int
) -> np.ndarray:
    """Vectors of the k LOWEST ids: batch-local k-smallest prune, then a
    driver merge over the <= k x blocks pruned rows (never the corpus)."""

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(take), type=pa.int64()))

    pruned = ds.map_batches(
        _local, batch_format="pyarrow", batch_size=4096
    ).to_arrow_refs()
    tables = [t for t in ray.get(pruned) if t.num_rows]
    if not tables:
        raise ValueError("kmeans_fit: dataset is empty")
    merged = pa.concat_tables(tables)
    if merged.num_rows < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds the dataset's {merged.num_rows} rows"
        )
    ids = merged[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")[:k]
    mat = _batch_matrix(merged, vec_col, dim)
    return mat[order].copy()


def kmeans_fit(
    ds: "ray.data.Dataset",
    *,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
) -> np.ndarray:
    """Run ``iters`` Lloyd iterations; returns the (k, dim) centroids."""
    cent = _init_centroids(ds, k, id_col, vec_col, dim)
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def _partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mat = _batch_matrix(batch, vec_col, dim)
            a = _assign_to(mat, c)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, mat)
            cnts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnts),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        parts = ray.get(
            ds.map_batches(
                _partial, batch_format="pyarrow", batch_size=4096
            ).to_arrow_refs()
        )
        merged = pa.concat_tables([t for t in parts if t.num_rows])
        cl = merged["cluster"].to_numpy(zero_copy_only=False)
        cnt = merged["cnt"].to_numpy(zero_copy_only=False)
        vs = np.asarray(
            merged["vsum"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        ).reshape(-1, dim)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, cl, vs)
        counts = np.bincount(cl, weights=cnt, minlength=k).astype(np.int64)
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cent


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """+ ``cluster`` (int64 argmin-euclidean against broadcast centroids)."""
    dim = centroids.shape[1]
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _batch_matrix(batch, vec_col, dim)
        a = _assign_to(mat, c)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow", batch_size=4096)
