"""Distributed dense enumeration: must equal a driver-side global sort +
enumerate for any key shape (the scale path for O3/ST6)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from webscrape_neko_jirushi_ray.functions.enumerate import attach_dense_index


def _check(ds, df_ref, key_cols, asc):
    out = attach_dense_index(
        ds, key_cols, ascending=asc, num_ranges=7
    ).to_pandas()
    want = df_ref.sort_values(
        key_cols, ascending=asc, kind="mergesort"
    ).reset_index(drop=True)
    want["rank"] = range(1, len(want) + 1)
    got = out.sort_values("rank").reset_index(drop=True)
    for c in key_cols + ["rank"]:
        assert (got[c].values == want[c].values).all(), c


def test_single_ascending_key(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_custkey", "c_name"]
    )
    import pandas as pd

    df = pd.read_parquet(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_custkey", "c_name"]
    )
    _check(ds, df, ["c_custkey"], True)


def test_descending_numeric_key(ray_session):
    import pandas as pd

    # unique float values + unique tiebreak id
    rng = np.random.default_rng(5)
    vals = rng.permutation(500).astype(float)
    df = pd.DataFrame({"v": vals, "id": range(500)})
    ds = ray.data.from_pandas(df).repartition(5)
    _check(ds, df, ["v", "id"], [False, True])


def test_matches_driver_rank_query(ray_session):
    """The distributed path reproduces rank_customers (driver-side
    enumeration) exactly."""
    import pandas as pd

    import webscrape_neko_jirushi_ray.pipelines.queries as q

    sf = "/root/testdata/sf0.001"
    want = q.rank_customers(sf)
    ds = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    out = attach_dense_index(
        ds, ["c_acctbal", "c_custkey"], ascending=[False, True],
        index_col="bal_rank", num_ranges=6,
    ).to_pandas()
    got = out[["c_custkey", "bal_rank"]].sort_values("c_custkey").reset_index(drop=True)
    assert got.equals(want)


def test_string_descending_rejected(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_name"]
    )
    with pytest.raises(Exception):
        attach_dense_index(ds, ["c_name"], ascending=False).to_pandas()


def test_dense_index_on_key_clustered_input(ray_session):
    """Regression: input already sorted by the key used to derive range
    boundaries (the case the old limit(N) sample degenerated on) must
    still produce a correct dense rank — and the cross-block sample must
    spread rows over multiple ranges, not collapse into one."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.functions.enumerate import attach_dense_index

    n = 20_000
    vals = np.sort(np.random.default_rng(7).integers(0, 1 << 40, size=n))
    vals = np.unique(vals)  # keys must be unique
    tbl = pa.table({"k": pa.array(vals, type=pa.int64())})
    # many blocks, each a contiguous (clustered) key span
    parts = [tbl.slice(i, 2000) for i in range(0, len(vals), 2000)]
    ds = ray.data.from_arrow(parts)
    out = attach_dense_index(ds, ["k"], index_col="r", num_ranges=8).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert (out["r"].to_numpy() == np.arange(1, len(vals) + 1)).all()


# --- distributed running sum (prefix scan) ---------------------------------


def test_running_sum_matches_pandas_cumsum(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.integers(1, 500, size=n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals})
    ).repartition(9)
    from webscrape_neko_jirushi_ray.functions.enumerate import attach_running_sum

    out = (
        attach_running_sum(ds, ["k"], "v", sum_col="cum", num_ranges=7)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .sort_values("k")
        .reset_index(drop=True)
    )
    want["cum"] = want["v"].cumsum()
    assert (out["cum"].values == want["cum"].values).all()
    assert out["cum"].iloc[-1] == vals.sum()


def test_running_sum_key_clustered_input(ray_session):
    # input already sorted by key: sampled boundaries must still split it
    vals = np.arange(1, 1001, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": np.arange(1000, dtype=np.int64), "v": vals})
    ).repartition(5)
    from webscrape_neko_jirushi_ray.functions.enumerate import attach_running_sum

    out = (
        attach_running_sum(ds, ["k"], "v", sum_col="cum", num_ranges=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (out["cum"].values == np.cumsum(vals)).all()


def test_range_ids_matches_bisect_oracle():
    """The vectorized merge-lexsort range tagger == per-row
    bisect_right over key tuples, across arities, dtypes (int / float /
    string), descending numerics, ties with the bounds, and empty
    bounds."""
    import bisect

    from webscrape_neko_jirushi_ray.functions.enumerate import _range_ids

    rng = np.random.default_rng(23)

    def check(table, bounds, key_cols, asc):
        got = _range_ids(table, bounds, key_cols, asc)
        df = table.select(key_cols).to_pandas()
        cols = []
        for c, a in zip(key_cols, asc):
            v = df[c].to_numpy()
            cols.append(-v if not a else v)
        want = [bisect.bisect_right(bounds, t) for t in zip(*cols)]
        assert got.tolist() == want, (key_cols, asc)

    # int single key, bounds overlapping data values (tie semantics)
    ints = rng.integers(0, 50, 400).astype(np.int64)
    t = pa.table({"a": ints})
    bounds = sorted((int(x),) for x in rng.choice(ints, 7))
    check(t, bounds, ["a"], [True])

    # descending float key (bounds live in negated space)
    f = rng.normal(size=300)
    t = pa.table({"f": f})
    bounds = sorted((-float(x),) for x in rng.choice(f, 5))
    check(t, bounds, ["f"], [False])

    # two-key (desc int, asc int) — the rank_customers shape
    a = rng.integers(-100, 100, 500).astype(np.int64)
    b = rng.permutation(500).astype(np.int64)
    t = pa.table({"a": a, "b": b})
    picks = rng.choice(500, 6)
    bounds = sorted((-int(a[i]), int(b[i])) for i in picks)
    check(t, bounds, ["a", "b"], [False, True])

    # string key
    s = [f"cat-{i:03d}" for i in rng.integers(0, 80, 350)]
    t = pa.table({"s": s})
    bounds = sorted((x,) for x in rng.choice(s, 4))
    check(t, bounds, ["s"], [True])

    # empty bounds and empty batch
    assert _range_ids(pa.table({"a": ints}), [], ["a"], [True]).tolist() == [0] * 400
    assert _range_ids(pa.table({"a": pa.array([], pa.int64())}), bounds, ["a"], [True]).tolist() == []
