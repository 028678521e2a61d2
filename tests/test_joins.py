"""stages/joins.py hash_join unit coverage: inner/semi/anti vs pandas
reference, empty-block tolerance (the Dataset.join failure mode that
motivated the module), list-payload pass-through on semi/anti."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webscrape_neko_jirushi_ray.stages.joins import hash_join


def _mk(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_inner_join_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, 200).astype(np.int64),
         "lval": np.arange(200, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"rk": rng.integers(0, 40, 60).astype(np.int64),
         "rval": np.arange(60, dtype=np.int64) * 7}
    )
    out = (
        hash_join(_mk(left), _mk(right), key="k", right_key="rk", how="inner",
                  num_partitions=8)
        .to_pandas()
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    assert out[["k", "lval", "rval"]].equals(want[["k", "lval", "rval"]])


def test_inner_join_suffixes_conflicts(ray_session):
    left = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    right = pd.DataFrame({"k": [1, 2], "v": [100, 200]})
    out = (
        hash_join(_mk(left), _mk(right), key="k", how="inner", num_partitions=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert out["v"].tolist() == [10, 20]
    assert out["v_r"].tolist() == [100, 200]


def test_semi_anti_with_list_payload_and_empty_blocks(ray_session):
    """Semi/anti must carry list-typed payloads (acero can't) and tolerate
    the schema-less empty blocks a filter map emits."""
    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], type=pa.int64()),
            "emb": pa.array([[1.0], [2.0], [3.0], [4.0]], type=pa.list_(pa.float64())),
        }
    )
    lds = ray.data.from_arrow([left.slice(0, 2), left.slice(2, 2)])
    # force empty blocks on the right via a filter that kills one block
    right = pa.table({"rk": pa.array([2, 4, 100], type=pa.int64())})
    rds = ray.data.from_arrow([right.slice(0, 2), right.slice(2, 1)]).map_batches(
        lambda t: t.filter(pa.compute.less(t["rk"], 50)), batch_format="pyarrow"
    )
    semi = (
        hash_join(lds, rds, key="k", right_key="rk", how="left_semi",
                  num_partitions=4)
        .to_pandas()
        .sort_values("k")
    )
    assert semi["k"].tolist() == [2, 4]
    assert semi["emb"].tolist()[0] == [2.0]
    anti = (
        hash_join(lds, rds, key="k", right_key="rk", how="left_anti",
                  num_partitions=4)
        .to_pandas()
        .sort_values("k")
    )
    assert anti["k"].tolist() == [1, 3]


def test_inner_join_empty_right(ray_session):
    left = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    right = pd.DataFrame({"rk": pd.Series([], dtype="int64"),
                          "w": pd.Series([], dtype="int64")})
    out = hash_join(
        _mk(left), _mk(right), key="k", right_key="rk", how="inner",
        num_partitions=4,
    ).to_pandas()
    assert len(out) == 0
    # Ray normalizes all-empty map outputs to schema-less blocks, so a
    # fully-empty result may surface with no columns — both are acceptable
    assert sorted(out.columns) in ([], ["k", "v", "w"])


def test_inner_join_schema_less_empty_right(ray_session):
    """A fully-filtered (schema-less) right side must yield an empty
    inner join, not an AttributeError — the gate-kills-everything case."""
    import pyarrow as pa
    import ray.data

    from webscrape_neko_jirushi_ray.stages.joins import hash_join

    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["x", "y"])})
    )
    empty = left.filter(lambda r: False)
    assert empty.schema() is None  # precondition: Ray drops the schema
    out = hash_join(left, empty, key="doc_id", how="inner")
    assert out.count() == 0


def test_outer_joins_match_pandas(ray_session):
    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {"k": rng.integers(0, 30, 80).astype(np.int64),
         "lval": np.arange(80, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(15, 45, 50).astype(np.int64),
         "rval": np.arange(50, dtype=np.int64) * 3}
    )

    def _canon(df):
        df = df.copy()
        df["lval"] = df["lval"].fillna(-1).astype("int64")
        df["rval"] = df["rval"].fillna(-1).astype("int64")
        return df.sort_values(["k", "lval", "rval"]).reset_index(drop=True)

    for how, pd_how in [("left_outer", "left"), ("full_outer", "outer")]:
        out = _canon(
            hash_join(_mk(left), _mk(right), key="k", how=how,
                      num_partitions=8).to_pandas()
        )
        want = _canon(left.merge(right, on="k", how=pd_how))
        pd.testing.assert_frame_equal(out, want)


def test_full_outer_one_side_empty(ray_session):
    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                         "lval": np.array([10, 20], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([], dtype=np.int64),
                          "rval": np.array([], dtype=np.int64)})
    out = (
        hash_join(_mk(left), _mk(right), key="k", how="full_outer",
                  num_partitions=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 2]
    assert out["rval"].isna().all()


def test_broadcast_join_matches_pandas(ray_session):
    from webscrape_neko_jirushi_ray.stages.joins import broadcast_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 500).astype(np.int64),
            "lval": rng.integers(0, 1000, 500).astype(np.int64),
        }
    )
    # dimension table covering only part of the key space
    dim = pd.DataFrame(
        {
            "dk": np.arange(0, 30, dtype=np.int64),
            "name": [f"d{i}" for i in range(30)],
        }
    )
    dim_t = pa.Table.from_pandas(dim, preserve_index=False)
    for how, pd_how in [("inner", "inner"), ("left_outer", "left")]:
        out = (
            broadcast_join(_mk(left), dim_t, key="k", right_key="dk", how=how)
            .to_pandas()
            .sort_values(["k", "lval"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(dim, left_on="k", right_on="dk", how=pd_how)
            .drop(columns=["dk"])
            .sort_values(["k", "lval"])
            .reset_index(drop=True)
        )
        assert list(out.columns.sort_values()) == list(want.columns.sort_values())
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)], want[sorted(want.columns)]
        )


def test_broadcast_join_rejects_dup_keys(ray_session):
    import pytest

    from webscrape_neko_jirushi_ray.stages.joins import broadcast_join

    left = pd.DataFrame({"k": np.array([1], dtype=np.int64)})
    dim = pa.table({"k": pa.array([1, 1], pa.int64()), "v": pa.array([2, 3], pa.int64())})
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_join(_mk(left), dim, key="k")


def test_inner_join_hot_key_skew(ray_session):
    # one key carries half of both sides (the "one dominant domain"
    # shape from the build brief): the hot partition must still join
    # correctly and the output must match pandas exactly
    rng = np.random.default_rng(41)
    n = 20_000
    lk = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 2_000, n)).astype(np.int64)
    rk = np.where(rng.random(2_000) < 0.5, 7, rng.integers(0, 2_000, 2_000)).astype(np.int64)
    # dedup right side so the expected cardinality stays bounded
    rk = np.unique(rk)
    left = pd.DataFrame({"k": lk, "lval": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": rk, "rval": rk * 3})
    out = (
        hash_join(_mk(left), _mk(right), key="k", num_partitions=16)
        .to_pandas().sort_values(["k", "lval"]).reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lval"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[sorted(out.columns)], want[sorted(want.columns)])


def test_broadcast_join_empty_dimension(ray_session):
    # regression: left_outer against a 0-row dim used to raise
    # ArrowIndexError from take() on the empty payload
    from webscrape_neko_jirushi_ray.stages.joins import broadcast_join

    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64)})
    dim = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out = broadcast_join(_mk(left), dim, key="k", how="left_outer").to_pandas()
    assert len(out) == 2 and out["v"].isna().all()
    inner = broadcast_join(_mk(left), dim, key="k", how="inner").to_pandas()
    assert len(inner) == 0


def test_broadcast_join_null_left_keys(ray_session):
    """Null left keys are SQL non-matches: filtered for inner, null-padded
    for left_outer — never a searchsorted TypeError (ADVICE r3)."""
    import pyarrow as pa

    import ray.data

    from webscrape_neko_jirushi_ray.stages.joins import broadcast_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", None, "b", None]),
                "v": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    dim = pa.table({"k": pa.array(["a", "b"]), "name": pa.array(["A", "B"])})
    inner = broadcast_join(left, dim, key="k", how="inner").to_pandas()
    assert sorted(inner["v"].tolist()) == [1, 3]
    outer = (
        broadcast_join(left, dim, key="k", how="left_outer")
        .to_pandas()
        .sort_values("v")
    )
    assert outer["name"].tolist() == ["A", None, "B", None]
    # int keys with nulls: same semantics (NaN probe would only
    # accidentally miss)
    left_i = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([10, None, 20], type=pa.int64()),
                "v": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    dim_i = pa.table(
        {"k": pa.array([10, 20], pa.int64()), "name": pa.array(["X", "Y"])}
    )
    got = broadcast_join(left_i, dim_i, key="k", how="inner").to_pandas()
    assert sorted(got["v"].tolist()) == [1, 3]


def test_hash_join_after_semi_join_projection(ray_session):
    """Regression: a semi-join output piped through select_columns into a
    second hash_join crashed ~50% of runs with KeyError on a column the
    Project had dropped — Ray's schema() transiently over-reports a
    Project's input columns on map_groups -> select_columns chains, and
    hash_join's pad closures trusted the plan-time name list over the
    batch's actual columns. The pad now intersects with the runtime
    schema (over-reported names null-pad and drop downstream)."""
    import numpy as np
    import pandas as pd

    from webscrape_neko_jirushi_ray.stages.joins import hash_join

    rng = np.random.default_rng(41)
    n = 500
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n).astype(np.int64),
            "extra": rng.integers(0, 9, n).astype(np.int64),
            "payload": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    keys = pd.DataFrame({"kk": np.arange(0, 50, 2, dtype=np.int64)})
    probe = pd.DataFrame(
        {"k": np.arange(50, dtype=np.int64), "val": np.arange(50, dtype=np.int64) * 7}
    )
    want = left[left["k"].isin(keys["kk"])].merge(probe, on="k")[
        ["k", "payload", "val"]
    ]
    for _ in range(5):  # the original failure was nondeterministic
        lds = ray.data.from_arrow(
            pa.Table.from_pandas(left, preserve_index=False)
        ).repartition(4)
        kds = ray.data.from_arrow(pa.Table.from_pandas(keys, preserve_index=False))
        pds = ray.data.from_arrow(pa.Table.from_pandas(probe, preserve_index=False))
        semi = hash_join(lds, kds, key="k", right_key="kk", how="left_semi")
        projected = semi.select_columns(["k", "payload"])
        out = hash_join(projected, pds, key="k").to_pandas()
        got = (
            out[["k", "payload", "val"]]
            .sort_values(["k", "payload", "val"])
            .reset_index(drop=True)
        )
        assert got.equals(
            want.sort_values(["k", "payload", "val"]).reset_index(drop=True)
        )


def test_bloom_prefilter_join_bit_identical(ray_session):
    """prefilter(join) == join for inner and left_semi, int and string
    keys, null left keys included — false positives die at the stitch."""
    rng = np.random.default_rng(23)
    n = 500
    kints = rng.integers(0, 1000, n).astype(np.int64)
    left = pd.DataFrame(
        {
            "k": kints,
            "ks": [f"key{v}" for v in kints],
            "lval": np.arange(n, dtype=np.int64),
        }
    )
    left["k"] = left["k"].astype("Int64")  # Arrow int64-with-nulls, not float
    left.loc[::97, "k"] = None  # null keys must survive the prefilter pass
    rk = rng.integers(0, 50, 40).astype(np.int64)
    right = pd.DataFrame(
        {
            "rk": rk,
            "rks": [f"key{v}" for v in rk],
            "rval": np.arange(40, dtype=np.int64) * 3,
        }
    )
    for how in ("inner", "left_semi"):
        for lk, rkey in (("k", "rk"), ("ks", "rks")):
            plain = (
                hash_join(
                    _mk(left), _mk(right[[rkey, "rval"]]), key=lk,
                    right_key=rkey, how=how, num_partitions=8,
                )
                .to_pandas()
                .sort_values(["lval"] + (["rval"] if how == "inner" else []))
                .reset_index(drop=True)
            )
            bloomed = (
                hash_join(
                    _mk(left), _mk(right[[rkey, "rval"]]), key=lk,
                    right_key=rkey, how=how, num_partitions=8,
                    bloom_filter_left=True, bloom_bits_log2=16,
                )
                .to_pandas()
                .sort_values(["lval"] + (["rval"] if how == "inner" else []))
                .reset_index(drop=True)
            )
            assert list(plain.columns) == list(bloomed.columns), (how, lk)
            assert plain.astype(str).equals(bloomed.astype(str)), (how, lk)


def test_bloom_prefilter_rejects_unsound_hows(ray_session):
    import pytest as _pytest

    left = _mk(pd.DataFrame({"k": np.arange(5, dtype=np.int64)}))
    right = _mk(pd.DataFrame({"k": np.arange(2, dtype=np.int64)}))
    for how in ("left_anti", "left_outer", "full_outer"):
        with _pytest.raises(ValueError):
            hash_join(left, right, key="k", how=how, bloom_filter_left=True)


def test_bloom_prefilter_prunes_most_nonmatches(ray_session):
    """Selective right side: the prefiltered left must shrink to near
    the true match count (generous FP slack — 2^16 bits, 200 keys)."""
    from webscrape_neko_jirushi_ray.stages.joins import (
        bloom_prefilter, build_bloom,
    )

    left = _mk(
        pd.DataFrame({"k": np.arange(20_000, dtype=np.int64) % 10_000})
    ).repartition(8)
    right = _mk(pd.DataFrame({"k": np.arange(200, dtype=np.int64)}))
    bm = build_bloom(right, "k", bits_log2=16)
    pruned = bloom_prefilter(
        left, ray.put(bm), "k", bits_log2=16
    ).count()
    assert pruned >= 400  # every true match survives (200 keys x 2 dups)
    assert pruned < 2_000  # and the 19.6k non-matches are mostly gone


def test_pin_before_schema_probe_routes(ray_session):
    """All-to-all upstreams materialize before a schema probe (so the
    probe's execution is reused); map-only chains pass through
    untouched (they keep streaming)."""
    import pyarrow as pa

    import ray.data
    from ray.data.aggregate import Sum

    from webscrape_neko_jirushi_ray.stages.joins import (
        _pin_before_schema_probe,
    )

    base = ray.data.range(1000).map_batches(
        lambda t: pa.table(
            {"k": pa.array([int(x) % 7 for x in t["id"].to_pylist()],
                           pa.int64()),
             "v": pa.array([1] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow",
    )
    from ray.data.dataset import MaterializedDataset

    mapped = _pin_before_schema_probe(base)
    assert not isinstance(mapped, MaterializedDataset)

    agg = base.groupby("k").aggregate(Sum("v", alias_name="s"))
    pinned = _pin_before_schema_probe(agg)
    assert isinstance(pinned, MaterializedDataset)
    assert pinned.count() == 7

    # an already-materialized dataset is not re-materialized
    again = _pin_before_schema_probe(pinned)
    assert again is pinned
