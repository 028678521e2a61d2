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


def test_check_rules_multiblock(ray_session):
    """Partial counts combine correctly across blocks; null predicate
    results count as violations."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    import ray.data

    from webscrape_neko_jirushi_ray.stages.profile import check_rules

    df = pd.DataFrame(
        {
            "x": np.arange(100, dtype="int64"),
            "y": [None if i % 10 == 0 else float(i) for i in range(100)],
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    out = check_rules(
        ds,
        {
            "x_under_60": lambda t: pc.less(t["x"], pa.scalar(60, pa.int64())),
            "y_positive": lambda t: pc.greater(t["y"], 0.0),  # nulls violate
        },
    )
    got = dict(zip(out["rule"], out["violations"]))
    assert got == {"x_under_60": 40, "y_positive": 10}  # the 10 nulls
    assert (out["n_rows"] == 100).all()
    assert abs(out.loc[out.rule == "x_under_60", "violation_rate"].iloc[0] - 0.4) < 1e-12
