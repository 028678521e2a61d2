"""VERDICT r4 #3: supplier_golden_records' rollup must be distributed —
the supplier dim streams as a Dataset and only the O(components) report
crosses the driver (no full-dim pandas pull, no per-component Python
loop). Instrumented in the 120k-entity bounded-driver style of
test_reorganize.py."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _synth(n, chunk=30_000, members_per_comp=1_000):
    import ray.data as _rd

    parts = []
    rng = np.random.default_rng(11)
    for c in range(0, n, chunk):
        keys = np.arange(c, c + chunk, dtype=np.int64)
        parts.append(
            pa.table(
                {
                    "s_suppkey": pa.array(keys),
                    "s_name": pa.array(
                        [f"Supplier#{k:09d}" for k in keys], pa.string()
                    ),
                    "s_nationkey": pa.array(
                        rng.integers(0, 25, size=chunk).astype(np.int64)
                    ),
                    "s_acctbal": pa.array(
                        np.round(
                            rng.uniform(-999.99, 9999.99, size=chunk), 2
                        )
                    ),
                }
            )
        )
    comp = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "component": pa.array(
                (np.arange(n, dtype=np.int64) // members_per_comp)
                * members_per_comp
            ),
        }
    )
    return _rd.from_arrow(parts), comp, pa.concat_tables(parts)


def _oracle(full: pa.Table, comp: pa.Table) -> pd.DataFrame:
    sup = full.to_pandas().merge(comp.to_pandas(), on="s_suppkey")
    sup["bal_c"] = (sup["s_acctbal"] * 100).round().astype("int64")
    rows = []
    for cid, g in sup.groupby("component"):
        rep = g.loc[g["s_suppkey"].idxmin()]
        rows.append(
            {
                "component": int(cid),
                "rep_name": rep["s_name"],
                "n_members": len(g),
                "max_acctbal_cents": int(g["bal_c"].max()),
                "n_nations": int(g["s_nationkey"].nunique()),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("component", "n_members", "max_acctbal_cents", "n_nations"):
        out[c] = out[c].astype("int64")
    return out.sort_values("component").reset_index(drop=True)


def test_golden_rollup_bounded_driver(ray_session, monkeypatch):
    import ray.data as _rd

    from webscrape_neko_jirushi_ray.pipelines.queries import (
        golden_records_rollup,
    )

    n = 120_000
    sup, comp, full = _synth(n)
    want = _oracle(full, comp)

    seen = {"concat_rows": 0, "to_pandas_rows": 0}
    real_concat = pa.concat_tables

    def spy_concat(tables, *a, **kw):
        out = real_concat(tables, *a, **kw)
        seen["concat_rows"] = max(seen["concat_rows"], out.num_rows)
        return out

    real_to_pandas = _rd.Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        out = real_to_pandas(self, *a, **kw)
        seen["to_pandas_rows"] = max(seen["to_pandas_rows"], len(out))
        return out

    monkeypatch.setattr(pa, "concat_tables", spy_concat)
    monkeypatch.setattr(_rd.Dataset, "to_pandas", spy_to_pandas)

    got = golden_records_rollup(sup, comp)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_like=True
    )
    # the scale invariant: nothing dim-sized crossed the driver — only
    # the O(components)=120-row report (and join-side broadcast tables
    # never concat on the driver)
    assert seen["to_pandas_rows"] <= max(n // 100, 2_000), seen


def test_golden_rollup_route_parity(ray_session):
    """broadcast and hash_join routes produce the identical report."""
    from webscrape_neko_jirushi_ray.pipelines.queries import (
        golden_records_rollup,
    )

    sup, comp, full = _synth(6_000, chunk=2_000, members_per_comp=37)
    want = _oracle(full, comp)
    a = golden_records_rollup(sup, comp)
    b = golden_records_rollup(sup, comp, broadcast_threshold=0)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), want, check_like=True)
    pd.testing.assert_frame_equal(b.reset_index(drop=True), want, check_like=True)
