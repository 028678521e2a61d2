"""Distributed Lloyd's k-means (stages/kmeans) vs a pure-numpy oracle
running the IDENTICAL algorithm (same deterministic lowest-id init, same
argmin-euclidean assignment, same empty-cluster fallback)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from webscrape_neko_jirushi_ray.stages.kmeans import kmeans_assign, kmeans_fit


def _make_ds(mat: np.ndarray, ids: np.ndarray, n_blocks: int = 4):
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                list(mat.astype(np.float64)), type=pa.list_(pa.float64())
            ),
        }
    )
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def _numpy_lloyd(mat: np.ndarray, ids: np.ndarray, k: int, iters: int):
    order = np.argsort(ids, kind="stable")[:k]
    cent = mat[order].copy()
    for _ in range(iters):
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (mat @ cent.T)
        a = np.argmin(d, axis=1)
        for c in range(k):
            if (a == c).any():
                cent[c] = mat[a == c].mean(axis=0)
    d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (mat @ cent.T)
    return cent, np.argmin(d, axis=1)


def test_kmeans_matches_numpy_oracle(ray_session):
    rng = np.random.default_rng(0xC0FFEE)
    centers = rng.normal(size=(3, 16)) * 10.0  # well-separated
    mat = np.concatenate(
        [c + rng.normal(scale=0.1, size=(40, 16)) for c in centers]
    )
    ids = rng.permutation(len(mat)).astype(np.int64)
    ds = _make_ds(mat, ids, n_blocks=5)
    cent = kmeans_fit(ds, k=3, iters=4, dim=16)
    got = (
        kmeans_assign(ds, cent)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want_cent, want_assign = _numpy_lloyd(mat, ids, k=3, iters=4)
    assert np.allclose(np.sort(cent, axis=0), np.sort(want_cent, axis=0), rtol=1e-8)
    order = np.argsort(ids, kind="stable")
    want = dict(zip(ids[order], want_assign[order]))
    got_map = dict(zip(got["vec_id"], got["cluster"]))
    # cluster LABELS depend only on init order, which both sides share
    assert got_map == {int(i): int(c) for i, c in want.items()}


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # k=3 over 2 distinct points: one cluster never gets members and must
    # keep its init centroid instead of dividing by zero
    mat = np.array([[0.0, 0.0], [10.0, 10.0], [0.1, 0.0], [10.1, 10.0]])
    ids = np.array([0, 1, 2, 3], dtype=np.int64)
    cent = kmeans_fit(_make_ds(mat, ids, n_blocks=2), k=3, iters=3, dim=2)
    assert cent.shape == (3, 2)
    assert np.isfinite(cent).all()


def test_kmeans_assign_schema(ray_session):
    mat = np.ones((6, 4))
    ids = np.arange(6, dtype=np.int64)
    ds = _make_ds(mat, ids, n_blocks=2)
    cent = kmeans_fit(ds, k=2, iters=1, dim=4)
    out = kmeans_assign(ds, cent)
    assert out.schema().names == ["vec_id", "cluster"]
    df = out.to_pandas()
    assert len(df) == 6 and set(df["cluster"]) <= {0, 1}
