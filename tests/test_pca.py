"""Distributed PCA power iteration vs numpy's exact eigendecomposition."""

import numpy as np
import pyarrow as pa
import pytest


def _ds_from(mat):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_power_iteration_matches_numpy(ray_session):
    from webscrape_neko_jirushi_ray.stages.pca import (
        power_iteration_top_component,
    )

    rng = np.random.default_rng(61)
    dim, n = 16, 4000
    # anisotropic cloud: one dominant direction + noise
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    mat = (
        rng.normal(size=(n, 1)) * 5.0 * direction[None, :]
        + rng.normal(size=(n, dim)) * 0.5
        + rng.normal(size=dim)[None, :]  # nonzero mean
    )
    mat32 = mat.astype(np.float32).astype(np.float64)
    out = power_iteration_top_component(
        _ds_from(mat).repartition(8), "embedding", dim
    )
    c = np.cov(mat32.T)
    vals, vecs = np.linalg.eigh(c)
    v_exact = vecs[:, -1]
    cos = abs(float(out["component"] @ v_exact))
    assert cos > 0.9999, cos
    assert out["eigenvalue"] == pytest.approx(vals[-1], rel=1e-4)
    assert out["explained_share"] == pytest.approx(
        vals[-1] / vals.sum(), rel=1e-4
    )
    assert out["n_vectors"] == n
    # sign convention: largest-|loading| coordinate positive
    assert out["component"][np.argmax(np.abs(out["component"]))] > 0


def test_power_iteration_partition_invariant(ray_session):
    from webscrape_neko_jirushi_ray.stages.pca import (
        power_iteration_top_component,
    )

    rng = np.random.default_rng(67)
    mat = rng.normal(size=(500, 8)) * np.array([3, 1, 1, 1, 1, 1, 1, 1.0])
    a = power_iteration_top_component(_ds_from(mat), "embedding", 8)
    b = power_iteration_top_component(
        _ds_from(mat).repartition(11), "embedding", 8
    )
    assert abs(float(a["component"] @ b["component"])) > 1 - 1e-9
    assert a["eigenvalue"] == pytest.approx(b["eigenvalue"], rel=1e-9)


def test_power_iteration_rejects_tiny(ray_session):
    from webscrape_neko_jirushi_ray.stages.pca import (
        power_iteration_top_component,
    )

    with pytest.raises(ValueError, match=">= 2"):
        power_iteration_top_component(
            _ds_from(np.ones((1, 4))), "embedding", 4
        )


def test_covariance_route_matches_power_iteration(ray_session):
    """Both PCA plans agree on an anisotropic cloud; the covariance
    route equals numpy eigh exactly up to float reduce order."""
    from webscrape_neko_jirushi_ray.stages.pca import (
        covariance_top_component,
        power_iteration_top_component,
    )

    rng = np.random.default_rng(71)
    dim = 12
    mat = rng.normal(size=(2000, dim)) * np.linspace(4, 0.5, dim)[None, :]
    a = covariance_top_component(_ds_from(mat).repartition(7), "embedding", dim)
    b = power_iteration_top_component(
        _ds_from(mat).repartition(7), "embedding", dim
    )
    assert abs(float(a["component"] @ b["component"])) > 0.9999
    assert a["eigenvalue"] == pytest.approx(b["eigenvalue"], rel=1e-6)
    assert a["explained_share"] == pytest.approx(b["explained_share"], rel=1e-6)
    assert a["n_vectors"] == b["n_vectors"] == 2000


def test_query_dim_route_forced_both_ways(ray_session, monkeypatch):
    """The embedding_top_component query produces the same component on
    BOTH routes (the size-route parity contract)."""
    import numpy as np

    from webscrape_neko_jirushi_ray.pipelines import queries as qmod

    sf = "/root/testdata/sf0.001"
    cov = qmod.embedding_top_component(sf)
    monkeypatch.setattr(qmod._base, "_PCA_COVARIANCE_ROUTE_DIM", 0)
    pi = qmod.embedding_top_component(sf)
    va = cov["loading"].to_numpy()
    vb = pi["loading"].to_numpy()
    assert abs(float(va @ vb)) > 0.999
    assert cov["n_vectors"][0] == pi["n_vectors"][0]
