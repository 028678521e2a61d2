"""Single-pass column profiling (data-quality report): per column, row
count, null count, and min/max — the validation step a production
ingest pipeline runs before the expensive stages (reference analog: the
report sinks of §2/S6, generalized to arbitrary tables).

Scale shape: ONE streaming pass — each batch emits one PARTIAL ROW PER
COLUMN (col, n, nulls, typed min/max), so the combine groupby sees
O(columns x blocks) rows, never the corpus. Integer and string extrema
ride separate typed fields (a stringly-typed min would compare
lexicographically and report '9' > '10'); the final string formatting
happens on the driver over the O(columns) result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Min, Sum


def profile_columns(
    ds: "ray.data.Dataset",
    *,
    int_cols: list[str],
    str_cols: list[str],
) -> pd.DataFrame:
    """Profile ``int_cols`` (any integer type) and ``str_cols`` (utf8)
    of ``ds``. Returns a DataFrame (col, n, nulls, min_v, max_v) with
    extrema rendered as strings (integers via str(int) — matches SQL
    CAST(x AS VARCHAR))."""
    cols = list(int_cols) + list(str_cols)

    def _partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        # integer extrema ride NEUTRAL SENTINELS (INT64_MAX / INT64_MIN)
        # instead of nulls: a nullable int64 column downcasts to float64
        # in to_pandas and str(int(float)) is wrong past 2^53 — the
        # exact trap the module docstring promises to avoid. Presence is
        # decided by nulls == n at format time, so sentinel collisions
        # with real INT64_MAX values still render correctly.
        I_MAX, I_MIN = (1 << 63) - 1, -(1 << 63)
        for c in int_cols:
            arr = t[c]
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(arr.null_count)
            if t.num_rows > arr.null_count:
                mm = pc.min_max(arr).as_py()
                min_i.append(mm["min"]); max_i.append(mm["max"])
            else:
                min_i.append(I_MAX); max_i.append(I_MIN)
            min_s.append(None); max_s.append(None)
        for c in str_cols:
            arr = t[c]
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(arr.null_count)
            min_i.append(I_MAX); max_i.append(I_MIN)
            if t.num_rows > arr.null_count:
                mm = pc.min_max(arr).as_py()
                min_s.append(mm["min"]); max_s.append(mm["max"])
            else:
                min_s.append(None); max_s.append(None)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "_min_i": pa.array(min_i, pa.int64()),
                "_max_i": pa.array(max_i, pa.int64()),
                "_min_s": pa.array(min_s, pa.string()),
                "_max_s": pa.array(max_s, pa.string()),
            }
        )

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("nulls", alias_name="nulls"),
            Min("_min_i", alias_name="_min_i"),
            Max("_max_i", alias_name="_max_i"),
            Min("_min_s", alias_name="_min_s"),
            Max("_max_s", alias_name="_max_s"),
        )
        .to_pandas()  # O(columns) rows
    )
    int_set = set(int_cols)

    def _fmt(row, lo: bool) -> str | None:
        if row["col"] in int_set:
            if row["nulls"] == row["n"]:  # all-null column: no extrema
                return None
            return str(int(row["_min_i" if lo else "_max_i"]))
        return row["_min_s" if lo else "_max_s"]

    merged["min_v"] = merged.apply(lambda r: _fmt(r, True), axis=1)
    merged["max_v"] = merged.apply(lambda r: _fmt(r, False), axis=1)
    merged["n"] = merged["n"].astype("int64")
    merged["nulls"] = merged["nulls"].astype("int64")
    out = merged[["col", "n", "nulls", "min_v", "max_v"]]
    out = out[out["col"].isin(cols)]
    return out.sort_values("col").reset_index(drop=True)


def check_rules(
    ds: "ray.data.Dataset",
    rules: "dict[str, callable]",
) -> pd.DataFrame:
    """Data-quality gate (expectation suite): each rule is a callable
    ``pa.Table -> pa.BooleanArray`` where True = the row PASSES. Returns
    one row per rule: (rule, violations, n_rows, violation_rate).

    Scale shape: ONE streaming pass — every batch evaluates all rules
    vectorized and emits one partial row per rule, so the combine
    groupby sees O(rules x blocks) rows, never the corpus. Nulls in a
    rule's predicate count as violations (SQL CASE WHEN cond THEN 0
    ELSE 1 semantics under the oracle's NOT-null-safe comparison).
    """
    names = sorted(rules)

    def _partials(t: pa.Table) -> pa.Table:
        viol = []
        for name in names:
            ok = rules[name](t)
            if isinstance(ok, pa.ChunkedArray):
                ok = ok.combine_chunks()
            good = pc.sum(pc.fill_null(ok, False)).as_py() or 0
            viol.append(t.num_rows - good)
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "violations": pa.array(viol, pa.int64()),
                "n_rows": pa.array([t.num_rows] * len(names), pa.int64()),
            }
        )

    out = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(
            Sum("violations", alias_name="violations"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["violations"] = out["violations"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    out["violation_rate"] = out["violations"] / out["n_rows"]
    return out.sort_values("rule").reset_index(drop=True)
