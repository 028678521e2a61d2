"""Custom relational operators (as-of join, broadcast range join) verified
against brute-force computations; token top-k against a Counter."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webscrape_neko_jirushi_ray.stages.relops import asof_join, range_join_broadcast


def test_asof_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    n_l, n_r = 300, 200
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l, dtype=np.int64),
            "k": rng.integers(0, 8, n_l).astype(np.int64),
            "t": rng.integers(0, 1000, n_l).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_r).astype(np.int64),
            "t": rng.integers(0, 1000, n_r).astype(np.int64),
            "val": np.arange(n_r, dtype=np.int64) * 10,
        }
    ).drop_duplicates(["k", "t"])  # unambiguous matches
    lds = ray.data.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = (
        asof_join(lds, rds, by="k", on="t", value_cols=["val"])
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # brute force: per left row, the right row of same k with max t <= left t
    want_vals = []
    for _, row in left.iterrows():
        cand = right[(right["k"] == row["k"]) & (right["t"] <= row["t"])]
        want_vals.append(
            float(cand.sort_values("t").iloc[-1]["val"]) if len(cand) else np.nan
        )
    got_vals = out["val"].astype("float64").tolist()
    assert len(got_vals) == n_l
    for g, w in zip(got_vals, want_vals):
        assert (np.isnan(g) and np.isnan(w)) or g == w


def test_asof_join_forward_direction(ray_session):
    left = pd.DataFrame({"k": [1, 1], "t": [10, 50], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "t": [20, 60], "val": [100, 200]})
    lds = ray.data.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = (
        asof_join(lds, rds, by="k", on="t", value_cols=["val"], direction="forward")
        .to_pandas()
        .sort_values("lid")
    )
    assert out["val"].tolist() == [100, 200]  # next value at or after t


def test_range_join_broadcast(ray_session):
    ranges = pa.table(
        {
            "lo": pa.array([0, 10, 20], type=pa.int64()),
            "hi": pa.array([10, 20, 30], type=pa.int64()),
            "label": pa.array(["a", "b", "c"]),
        }
    )
    vals = [-5.0, 0.0, 9.9, 10.0, 19.5, 25.0, 30.0, 99.0]
    ds = ray.data.from_arrow(
        pa.table({"i": pa.array(range(len(vals)), type=pa.int64()),
                  "v": pa.array(vals, type=pa.float64())})
    )
    out = (
        range_join_broadcast(ds, ranges, value_col="v")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # -5, 30 (hi-exclusive) and 99 drop; boundaries lo-inclusive
    assert out["i"].tolist() == [1, 2, 3, 4, 5]
    assert out["label"].tolist() == ["a", "a", "b", "b", "c"]


def test_range_join_rejects_overlap(ray_session):
    ranges = pa.table(
        {"lo": pa.array([0, 5], type=pa.int64()),
         "hi": pa.array([10, 15], type=pa.int64()),
         "label": pa.array(["a", "b"])}
    )
    ds = ray.data.from_arrow(pa.table({"v": pa.array([1.0])}))
    import pytest

    with pytest.raises(ValueError, match="non-overlapping"):
        range_join_broadcast(ds, ranges, value_col="v")


def test_top_tokens_matches_counter(ray_session):
    from collections import Counter

    from webscrape_neko_jirushi_ray.functions import textkit
    from webscrape_neko_jirushi_ray.pipelines.queries import top_tokens

    sf = "/root/testdata/sf0.001"
    got = top_tokens(sf)
    texts = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])["text"]
    c = Counter()
    for t in texts:
        c.update(textkit.tokens_ws(t or ""))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["token"], got["n"])) == want


def test_bag_difference_matches_counter(ray_session):
    from collections import Counter

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import bag_difference

    rng = np.random.default_rng(53)
    a = rng.integers(0, 30, 500).astype(np.int64)
    b = rng.integers(0, 30, 400).astype(np.int64)
    dsa = ray.data.from_arrow(pa.table({"k": pa.array(a)}))
    dsb = ray.data.from_arrow(pa.table({"k": pa.array(b)}))
    ca, cb = Counter(a.tolist()), Counter(b.tolist())
    for how, expect in [
        ("except_all", {k: max(ca[k] - cb.get(k, 0), 0) for k in ca}),
        ("intersect_all", {k: min(ca[k], cb.get(k, 0)) for k in ca}),
    ]:
        out = bag_difference(dsa, dsb, key="k", how=how).to_pandas()
        got = Counter(out["k"].tolist())
        want = {k: v for k, v in expect.items() if v > 0}
        assert got == Counter(want), how


def test_window_kernels_reject_null_inputs(ray_session):
    """Null ts/value in a window kernel must raise, not silently corrupt
    the int64 arithmetic through a NaN float cast (ADVICE r3)."""
    import pyarrow as pa
    import pytest

    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import (
        grouped_interval_count,
        grouped_range_sum,
        grouped_rolling_sum,
    )

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([10, None, 30], pa.int64()),
                "v": pa.array([1, 2, None], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="null"):
        grouped_interval_count(
            ds, group_col="g", ts_col="ts", lo_offset=-5, hi_offset=0,
            out_col="n",
        ).materialize()
    with pytest.raises(Exception, match="null"):
        grouped_range_sum(
            ds, group_col="g", ts_col="ts", value_col="v", preceding=5,
            out_col="s",
        ).materialize()
    with pytest.raises(Exception, match="null"):
        grouped_rolling_sum(
            ds, group_col="g", order_cols=["ts"], value_col="v",
            out_col="s", preceding=1,
        ).materialize()


def test_grouped_running_sum_matches_pandas(ray_session):
    """Unbounded running sum + row number across many groups (spanning
    multiple hash buckets) vs the pandas groupby cumsum/cumcount oracle."""
    from webscrape_neko_jirushi_ray.stages.relops import grouped_running_sum

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 300, n),
            "o": rng.permutation(n),
            "v": rng.integers(-50, 50, n),
        }
    ).astype("int64")
    out = (
        grouped_running_sum(
            ray.data.from_pandas(df).repartition(8),
            group_col="g",
            order_cols=["o"],
            value_col="v",
            out_col="rs",
            rank_col="rk",
            num_partitions=7,
        )
        .to_pandas()
        .sort_values(["g", "o"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["g", "o"]).reset_index(drop=True)
    want["rs"] = want.groupby("g")["v"].cumsum()
    want["rk"] = want.groupby("g").cumcount() + 1
    pd.testing.assert_frame_equal(
        out[["g", "o", "v", "rs", "rk"]], want, check_dtype=False
    )


def test_grouped_session_count_matches_bruteforce(ray_session):
    """Per-group session counts (gap > threshold starts a session) vs a
    row-wise oracle, including single-event groups and exact-gap ties."""
    from webscrape_neko_jirushi_ray.stages.relops import grouped_session_count

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 250, n),
            "ts": rng.integers(0, 10_000, n),
        }
    ).astype("int64")
    GAP = 100
    out = (
        grouped_session_count(
            ray.data.from_pandas(df).repartition(8),
            group_col="g",
            ts_col="ts",
            gap=GAP,
            num_partitions=7,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "ts"])
        .groupby("g")["ts"]
        .apply(lambda s: 1 + int((np.diff(s.to_numpy()) > GAP).sum()))
        .rename("n_sessions")
        .reset_index()
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_asof_join_string_by_key_many_groups(ray_session):
    """asof_join bucket route with STRING by-keys over many groups vs a
    per-group pandas merge_asof oracle."""
    rng = np.random.default_rng(17)
    keys = [f"host-{i}" for i in range(60)]
    lt = pd.DataFrame(
        {
            "k": rng.choice(keys, 800),
            "t": rng.integers(0, 1000, 800).astype("int64"),
            "lid": np.arange(800, dtype="int64"),
        }
    )
    rt = (
        pd.DataFrame(
            {
                "k": rng.choice(keys, 300),
                "t": rng.integers(0, 1000, 300).astype("int64"),
            }
        )
        .drop_duplicates(["k", "t"])
        .reset_index(drop=True)
    )
    rt["val"] = np.arange(len(rt), dtype="int64")
    out = (
        asof_join(
            ray.data.from_pandas(lt).repartition(6),
            ray.data.from_pandas(rt).repartition(4),
            by="k",
            on="t",
            value_cols=["val"],
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lt.sort_values("t", kind="mergesort"),
        rt.sort_values("t", kind="mergesort"),
        on="t",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "t", "lid", "val"]], want[["k", "t", "lid", "val"]],
        check_dtype=False,
    )


def test_grouped_sessionize_matches_bruteforce(ray_session):
    """Full session table vs a row-wise oracle: duplicate timestamps,
    single-event groups, and pairs at EXACTLY the gap (no break — the
    rule is strictly greater)."""
    from webscrape_neko_jirushi_ray.stages.relops import grouped_sessionize

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 200, n),
            "ts": rng.integers(0, 5000, n),  # dense -> many exact ties
        }
    ).astype("int64")
    GAP = 50
    # force at least one exact-gap pair
    df.loc[0:1, ["g", "ts"]] = [[999, 100], [999, 100 + GAP]]
    out = (
        grouped_sessionize(
            ray.data.from_pandas(df).repartition(7),
            group_col="g",
            ts_col="ts",
            gap=GAP,
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["g", "session_idx"])
        .reset_index(drop=True)
    )
    rows = []
    for g, s in df.groupby("g")["ts"]:
        ts = np.sort(s.to_numpy())
        breaks = np.nonzero(np.diff(ts) > GAP)[0]
        bounds = np.concatenate([[0], breaks + 1, [len(ts)]])
        for i in range(len(bounds) - 1):
            seg = ts[bounds[i]:bounds[i + 1]]
            rows.append((g, i + 1, len(seg), seg[0], seg[-1]))
    want = pd.DataFrame(
        rows, columns=["g", "session_idx", "n_events", "start_ts", "end_ts"]
    ).sort_values(["g", "session_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (out[out.g == 999].session_idx.tolist()) == [1]  # exact gap: no break


def test_grouped_percent_rank_matches_pandas(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_percent_rank

    rng = np.random.default_rng(31)
    n = 2000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 60, n).astype(np.int64),
            # small value domain forces plenty of RANK ties
            "v": rng.integers(0, 15, n).astype(np.int64),
        }
    )
    # a single-row group must get pr = 0.0 per SQL
    df.loc[0, "g"] = 999
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(7)
    out = (
        grouped_percent_rank(ds, group_col="g", value_col="v", out_col="pr")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("g")["v"].rank(method="min").sub(1)
        / df.groupby("g")["v"].transform("size").sub(1).clip(lower=1)
    )
    assert len(out) == n
    assert np.allclose(out["pr"].to_numpy(), want.to_numpy(), rtol=0, atol=0)
    assert out.loc[out["rid"] == 0, "pr"].iloc[0] == 0.0


def test_grouped_string_agg_matches_pandas(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_string_agg

    rng = np.random.default_rng(33)
    n = 1500
    df = pd.DataFrame(
        {
            "g": [f"grp_{i}" for i in rng.integers(0, 40, n)],
            "v": [f"val_{i:03d}" for i in rng.integers(0, 500, n)],
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(5)
    out = (
        grouped_string_agg(
            ds, group_col="g", value_col="v", sep="|",
            out_col="joined", count_col="n",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values("v", kind="mergesort")
        .groupby("g")["v"]
        .agg(["|".join, "size"])
        .reset_index()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert (out["g"].values == want["g"].values).all()
    assert (out["joined"].values == want["join"].values).all()
    assert (out["n"].astype(int).values == want["size"].values).all()


def test_grouped_string_agg_rejects_nulls(ray_session):
    import pytest

    from webscrape_neko_jirushi_ray.stages.relops import grouped_string_agg

    t = pa.table({"g": ["a", "a", None], "v": ["x", "y", "z"]})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="null"):
        grouped_string_agg(ds, group_col="g", value_col="v").to_pandas()


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
    n_groups=st.sampled_from([1, 3, 37]),
    val_domain=st.sampled_from([1, 2, 9]),  # tiny domains force heavy ties
    n=st.sampled_from([1, 7, 400]),
)
def test_percent_rank_property(ray_session, seed, n_groups, val_domain, n):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_percent_rank

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "v": rng.integers(-val_domain, val_domain + 1, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(3)
    out = (
        grouped_percent_rank(ds, group_col="g", value_col="v", out_col="pr")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("g")["v"].rank(method="min").sub(1)
        / df.groupby("g")["v"].transform("size").sub(1).clip(lower=1)
    )
    assert len(out) == n
    assert (out["pr"].to_numpy() == want.to_numpy()).all()


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_groups=st.sampled_from([1, 5, 61]),
    n=st.sampled_from([1, 13, 500]),
)
def test_string_agg_property(ray_session, seed, n_groups, n):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_string_agg

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "g": [f"g{i}" for i in rng.integers(0, n_groups, n)],
            # duplicate values + zero-padded so lexicographic == numeric
            "v": [f"x{i:02d}" for i in rng.integers(0, 20, n)],
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(4)
    out = (
        grouped_string_agg(ds, group_col="g", value_col="v", out_col="j")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values("v", kind="mergesort")
        .groupby("g")["v"]
        .agg(",".join)
        .reset_index()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert (out["g"].values == want["g"].values).all()
    assert (out["j"].values == want["v"].values).all()


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_groups=st.sampled_from([1, 7, 53]),
    n=st.sampled_from([1, 17, 400]),
)
def test_first_last_property(ray_session, seed, n_groups, n):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_first_last

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),  # unique tiebreaker
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "o": rng.integers(0, 5, n).astype(np.int64),  # ties on purpose
            "v": [f"v{i}" for i in rng.integers(0, 9, n)],
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(4)
    out = (
        grouped_first_last(
            ds,
            group_col="g",
            order_cols=["o", "rid"],
            value_col="v",
            first_col="f",
            last_col="l",
            count_col="n",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    s = df.sort_values(["g", "o", "rid"], kind="mergesort")
    want = s.groupby("g").agg(
        f=("v", "first"), l=("v", "last"), n=("v", "size")
    ).reset_index()
    assert (out["g"].values == want["g"].values).all()
    assert (out["f"].values == want["f"].values).all()
    assert (out["l"].values == want["l"].values).all()
    assert (out["n"].values == want["n"].values).all()


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_groups=st.sampled_from([1, 3, 37]),
    val_domain=st.sampled_from([1, 2, 9]),  # tiny domains force heavy ties
    n=st.sampled_from([1, 7, 400]),
)
def test_cume_dist_and_dense_rank_property(
    ray_session, seed, n_groups, val_domain, n
):
    from webscrape_neko_jirushi_ray.stages.relops import (
        grouped_cume_dist,
        grouped_dense_rank,
    )

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "v": rng.integers(-val_domain, val_domain + 1, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(3)
    cd = (
        grouped_cume_dist(ds, group_col="g", value_col="v", out_col="cd")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want_cd = (
        df.groupby("g")["v"].rank(method="max")
        / df.groupby("g")["v"].transform("size")
    )
    assert len(cd) == n
    assert (cd["cd"].to_numpy() == want_cd.to_numpy()).all()
    dr = (
        grouped_dense_rank(ds, group_col="g", value_col="v", out_col="dr")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want_dr = df.groupby("g")["v"].rank(method="dense").astype("int64")
    assert (dr["dr"].to_numpy() == want_dr.to_numpy()).all()


def test_window_rank_kernels_reject_nulls(ray_session):
    import pytest

    from webscrape_neko_jirushi_ray.stages.relops import (
        grouped_cume_dist,
        grouped_dense_rank,
    )

    t = pa.table({"g": [1, 1, 2], "v": pa.array([3, None, 5], pa.int64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="null"):
        grouped_cume_dist(ds, group_col="g", value_col="v").to_pandas()
    with pytest.raises(Exception, match="null"):
        grouped_dense_rank(ds, group_col="g", value_col="v").to_pandas()


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_groups=st.sampled_from([1, 3, 37]),
    val_domain=st.sampled_from([1, 2, 9]),  # tiny domains force boundary ties
    n=st.sampled_from([1, 7, 400]),
    k=st.sampled_from([1, 3]),
)
def test_grouped_topk_ties_property(ray_session, seed, n_groups, val_domain, n, k):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_topk_ties

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "v": rng.integers(-val_domain, val_domain + 1, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(3)
    out = (
        grouped_topk_ties(ds, group_col="g", value_col="v", k=k, out_col="rnk")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ranks = df.groupby("g")["v"].rank(method="min").astype("int64")
    want = df[ranks <= k].assign(rnk=ranks[ranks <= k]).reset_index(drop=True)
    assert len(out) == len(want)
    assert (out["rid"].to_numpy() == want["rid"].to_numpy()).all()
    assert (out["rnk"].to_numpy() == want["rnk"].to_numpy()).all()


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_groups=st.sampled_from([1, 3, 37]),
    n=st.sampled_from([1, 7, 400]),
    k=st.sampled_from([1, 4, 7]),
)
def test_grouped_ntile_property(ray_session, seed, n_groups, n, k):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_ntile

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "v": rng.integers(-5, 6, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(3)
    out = (
        grouped_ntile(
            ds, group_col="g", order_cols=["v", "rid"], k=k, out_col="b"
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )

    want = np.zeros(n, dtype=np.int64)
    for _, sub in df.groupby("g"):
        sub = sub.sort_values(["v", "rid"], kind="mergesort")
        m = len(sub)
        q, r = divmod(m, k)
        sizes = [q + 1] * r + [q] * (k - r)
        want[sub.index.to_numpy()] = np.repeat(
            np.arange(1, k + 1), sizes
        )[:m]
    assert (out["b"].to_numpy() == want).all()


def test_grouped_forward_fill_matches_pandas_ffill(ray_session):
    """grouped_forward_fill == pandas groupby.ffill on a randomized
    null-heavy frame (fixed seed), including all-null and single-row
    groups."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_forward_fill

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 60, n),
            "o1": rng.integers(0, 40, n),
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    df.loc[rng.random(n) < 0.55, "v"] = np.nan
    # group 61: entirely null; group 62: one row
    df.loc[0, ["g", "v"]] = [61, np.nan]
    df.loc[1, "g"] = 62

    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        grouped_forward_fill(
            ds, group_col="g", order_cols=["o1", "rid"], value_col="v",
            out_col="f",
        )
        .to_pandas()
        .sort_values(["g", "o1", "rid"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["g", "o1", "rid"]).reset_index(drop=True)
    want["f"] = want.groupby("g")["v"].ffill()
    pd.testing.assert_series_equal(got["f"], want["f"], check_names=False)


def test_grouped_rolling_max_matches_pandas(ray_session):
    """grouped_rolling_max == pandas groupby.rolling(min_periods=1).max
    on a randomized frame, including window > group size and ties."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_rolling_max

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 50, n),
            "o1": rng.integers(0, 30, n),
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        grouped_rolling_max(
            ds, group_col="g", order_cols=["o1", "rid"], value_col="v",
            window=5, out_col="rm",
        )
        .to_pandas()
        .sort_values(["g", "o1", "rid"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["g", "o1", "rid"]).reset_index(drop=True)
    want["rm"] = (
        want.groupby("g")["v"].rolling(5, min_periods=1).max()
        .reset_index(level=0, drop=True)
    )
    pd.testing.assert_series_equal(got["rm"], want["rm"], check_names=False)


def test_grouped_rolling_median_matches_pandas(ray_session):
    """grouped_rolling_median == pandas groupby.rolling(min_periods=1)
    .median on a randomized frame, including window > group size, ties,
    and even-length frames (the interpolated case)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_rolling_median

    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 50, n),
            "o1": rng.integers(0, 30, n),
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        grouped_rolling_median(
            ds, group_col="g", order_cols=["o1", "rid"], value_col="v",
            window=5, out_col="rm",
        )
        .to_pandas()
        .sort_values(["g", "o1", "rid"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["g", "o1", "rid"]).reset_index(drop=True)
    want["rm"] = (
        want.groupby("g")["v"].rolling(5, min_periods=1).median()
        .reset_index(level=0, drop=True)
    )
    pd.testing.assert_series_equal(got["rm"], want["rm"], check_names=False)


def test_grouped_rolling_median_rejects_bad_input(ray_session):
    """NaN / null values and over-wide windows are refused loudly —
    a NaN would silently poison every frame it enters."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_rolling_median

    base = pa.table(
        {
            "g": pa.array([1, 1, 2], pa.int64()),
            "o": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([1.0, np.nan, 3.0], pa.float64()),
        }
    )
    with pytest.raises(Exception, match="NaN"):
        grouped_rolling_median(
            ray.data.from_arrow(base), group_col="g", order_cols=["o"],
            value_col="v", window=3,
        ).to_pandas()
    nulled = base.set_column(2, "v", pa.array([1.0, None, 3.0], pa.float64()))
    with pytest.raises(Exception, match="null"):
        grouped_rolling_median(
            ray.data.from_arrow(nulled), group_col="g", order_cols=["o"],
            value_col="v", window=3,
        ).to_pandas()
    with pytest.raises(ValueError, match="order-statistic"):
        grouped_rolling_median(
            ray.data.from_arrow(base), group_col="g", order_cols=["o"],
            value_col="v", window=65,
        )


# ---------------------------------------------------------------------------
# interval_overlap_counts: both routes vs the O(n^2) brute force
# ---------------------------------------------------------------------------


def _overlap_brute(ids, s, e):
    n = len(s)
    out = []
    for i in range(n):
        c = sum(
            1
            for j in range(n)
            if j != i and s[i] <= e[j] and s[j] <= e[i]
        )
        out.append((ids[i], c))
    return sorted(out)


def _overlap_run(ray_session, ids, s, e, **kw):
    import pyarrow as pa

    import ray.data
    from webscrape_neko_jirushi_ray.stages.relops import interval_overlap_counts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.asarray(ids, dtype=np.int64)),
                "s": pa.array(np.asarray(s, dtype=np.int64)),
                "e": pa.array(np.asarray(e, dtype=np.int64)),
            }
        )
    )
    res = interval_overlap_counts(
        ds, id_cols=["rid"], start_col="s", end_col="e", **kw
    )
    # Ray's to_pandas drops the schema of an all-empty dataset; pin the
    # Arrow schema instead and return no rows
    if res.count() == 0:
        assert [f.name for f in res.schema().base_schema] == ["rid", "n_overlap"]
        return []
    got = res.to_pandas()
    return sorted(zip(got["rid"].astype(int), got["n_overlap"].astype(int)))


def test_interval_overlap_both_routes_match_brute(ray_session):
    rng = np.random.default_rng(31)
    n = 300
    s = rng.integers(0, 5000, n)
    e = s + rng.integers(0, 400, n)
    ids = np.arange(n)
    want = _overlap_brute(ids, s, e)
    assert _overlap_run(None, ids, s, e) == want  # driver route
    # distributed route (route-forced), incl. tiny bucket count for
    # multi-interval buckets and the clamped edge buckets
    assert _overlap_run(None, ids, s, e, small_max_rows=0, num_buckets=7) == want
    assert _overlap_run(None, ids, s, e, small_max_rows=0, num_buckets=2048) == want


def test_interval_overlap_edge_semantics(ray_session):
    # closed intervals: touching endpoints DO overlap; identical rows
    # count each other; disjoint rows report 0
    ids = [1, 2, 3, 4, 5]
    s = [0, 10, 10, 50, 0]
    e = [10, 20, 20, 60, 10]
    want = _overlap_brute(ids, s, e)
    assert _overlap_run(None, ids, s, e) == want
    assert _overlap_run(None, ids, s, e, small_max_rows=0, num_buckets=3) == want
    assert dict(want)[4] == 0


def test_interval_overlap_rejects_malformed(ray_session):
    import pytest

    with pytest.raises(Exception, match="s > e|malformed|row"):
        _overlap_run(None, [1], [5], [4])


def test_interval_overlap_empty(ray_session):
    assert _overlap_run(None, [], [], []) == []
