"""stages/profile.py: single-pass column profiling with nulls and
multi-block extrema (the lexicographic '9' > '10' trap)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webscrape_neko_jirushi_ray.stages.profile import profile_columns


def test_profile_columns_nulls_and_extrema(ray_session):
    t = pa.table(
        {
            "a": pa.array([9, 10, None, -3, 100], pa.int64()),
            "s": pa.array(["zebra", None, "apple", "mango", None]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)  # force multi-block combine
    out = profile_columns(ds, int_cols=["a"], str_cols=["s"]).set_index("col")
    assert out.loc["a", "n"] == 5 and out.loc["a", "nulls"] == 1
    # integer extrema must be numeric: min -3, max 100 (NOT '9' > '10')
    assert out.loc["a", "min_v"] == "-3" and out.loc["a", "max_v"] == "100"
    assert out.loc["s", "nulls"] == 2
    assert out.loc["s", "min_v"] == "apple" and out.loc["s", "max_v"] == "zebra"


def test_profile_columns_all_null_column(ray_session):
    t = pa.table(
        {
            "a": pa.array([None, None], pa.int64()),
            "s": pa.array(["x", "y"]),
        }
    )
    out = profile_columns(
        ray.data.from_arrow(t), int_cols=["a"], str_cols=["s"]
    ).set_index("col")
    assert out.loc["a", "nulls"] == 2
    assert out.loc["a", "min_v"] is None or pd.isna(out.loc["a", "min_v"])


def test_profile_columns_int64_exact_past_2_53(ray_session):
    big = 9007199254740993  # 2^53 + 1: float64 cannot represent it
    t = pa.table(
        {
            "a": pa.array([big, big + 2], pa.int64()),
            "s": pa.array(["x", "y"]),
        }
    )
    out = profile_columns(
        ray.data.from_arrow(t), int_cols=["a"], str_cols=["s"]
    ).set_index("col")
    assert out.loc["a", "min_v"] == str(big)
    assert out.loc["a", "max_v"] == str(big + 2)
