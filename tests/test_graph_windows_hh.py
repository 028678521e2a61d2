"""Round-3 operator units: grouped_lag window vs pandas shift, two-pass
heavy hitters vs exact Counter (incl. the cross-batch pigeonhole
guarantee), integer PageRank vs a numpy power iteration."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webscrape_neko_jirushi_ray.stages.graph import pagerank_int
from webscrape_neko_jirushi_ray.stages.heavyhitters import heavy_hitter_tokens
from webscrape_neko_jirushi_ray.stages.relops import grouped_lag


def test_grouped_lag_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 12, 300).astype(np.int64),
            "o": rng.permutation(300).astype(np.int64),
            "v": rng.integers(0, 1000, 300).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        grouped_lag(ds, group_col="g", order_cols=["o"], value_col="v",
                    out_col="prev")
        .to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    )
    want = df.sort_values(["g", "o"]).reset_index(drop=True)
    want["prev"] = want.groupby("g")["v"].shift(1)
    assert (out["prev"].isna() == want["prev"].isna()).all()
    mask = want["prev"].notna()
    assert (out.loc[mask, "prev"].astype("int64")
            == want.loc[mask, "prev"].astype("int64")).all()


def test_heavy_hitters_exact_across_batches(ray_session):
    # one token globally heavy but locally light in every batch except
    # one would break a naive single-pass top-k; the pigeonhole candidate
    # union + exact recount must still find exactly the > N/k set
    rng = np.random.default_rng(3)
    k = 10
    docs = []
    for i in range(40):
        toks = ["w%d" % t for t in rng.integers(0, 500, 50)]
        if i % 2 == 0:
            toks += ["hot"] * 30  # globally heavy, spread across batches
        docs.append(" ".join(toks))
    ds = ray.data.from_items([{"text": d} for d in docs])
    out = heavy_hitter_tokens(ds, text_col="text", k=k, batch_size=4)
    got = dict(zip(out["token"].to_pylist(), out["cnt"].to_pylist()))

    from collections import Counter

    c = Counter()
    for d in docs:
        c.update(d.split())
    n = sum(c.values())
    want = {t: v for t, v in c.items() if v * k > n}
    assert got == want
    assert "hot" in got


def test_pagerank_matches_numpy_power_iteration(ray_session):
    rng = np.random.default_rng(5)
    n = 40
    edges = {(int(a), int(b)) for a, b in
             zip(rng.integers(0, n, 150), rng.integers(0, n, 150))
             if a != b}
    e = np.array(sorted(edges), dtype=np.int64)
    nodes_ds = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    )
    edges_ds = ray.data.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    )
    iters, scale = 3, 10**9
    out = (
        pagerank_int(nodes_ds, edges_ds, iterations=iters, scale=scale,
                     num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    # integer reference
    outdeg = np.bincount(e[:, 0], minlength=n)
    r = np.full(n, scale, dtype=np.int64)
    base = (scale * 15) // 100
    for _ in range(iters):
        nxt = np.full(n, base, dtype=np.int64)
        contrib = (85 * r[e[:, 0]]) // (100 * outdeg[e[:, 0]])
        np.add.at(nxt, e[:, 1], contrib)
        r = nxt
    assert (out["pr_scaled"].to_numpy() == r).all()


def test_heavy_hitters_empty_when_nothing_heavy(ray_session):
    rng = np.random.default_rng(9)
    docs = [" ".join("w%d" % t for t in rng.integers(0, 500, 50))
            for _ in range(20)]
    ds = ray.data.from_items([{"text": d} for d in docs])
    out = heavy_hitter_tokens(ds, text_col="text", k=10, batch_size=4)
    assert out.num_rows == 0


def test_hll_per_group_error_band(ray_session):
    import ray

    from webscrape_neko_jirushi_ray.stages.sketch import hll_distinct_tokens_by

    rng = np.random.default_rng(13)
    rows = []
    vocab = {"en": 3000, "ja": 800, "de": 50}
    for lang, v in vocab.items():
        for _ in range(200):
            toks = ["t%d" % t for t in rng.integers(0, v, 40)]
            rows.append({"lang": lang, "text": " ".join(toks)})
    ds = ray.data.from_items(rows)
    out = hll_distinct_tokens_by(ds, group_col="lang", p=12).to_pandas()
    est = dict(zip(out["lang"], out["est_distinct_tokens"]))

    exact = {}
    for lang in vocab:
        toks = set()
        for r in rows:
            if r["lang"] == lang:
                toks.update(r["text"].split())
        exact[lang] = len(toks)
    for lang in vocab:
        # p=12 => 1.6% std err; allow 5% (and the small-range linear
        # counting regime is near-exact)
        assert abs(est[lang] - exact[lang]) <= max(3, 0.05 * exact[lang]), (
            lang, est[lang], exact[lang])


def test_grouped_rolling_sum_matches_pandas(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_rolling_sum

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 9, 400).astype(np.int64),
            "o": rng.permutation(400).astype(np.int64),
            "v": rng.integers(-50, 1000, 400).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        grouped_rolling_sum(
            ds, group_col="g", order_cols=["o"], value_col="v",
            out_col="ws", preceding=2,
        )
        .to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    )
    want = df.sort_values(["g", "o"]).reset_index(drop=True)
    want["ws"] = (
        want.groupby("g")["v"]
        .rolling(window=3, min_periods=1).sum()
        .reset_index(level=0, drop=True)
    )
    assert (out["ws"].astype("int64") == want["ws"].astype("int64")).all()


def test_ntile_matches_sql_semantics(ray_session, tmp_path):
    # NTILE(k): first n%k buckets get ceil(n/k) rows — pin the Ray
    # formula against DuckDB's window implementation on an uneven n
    import duckdb
    import pyarrow.parquet as pq

    from webscrape_neko_jirushi_ray.pipelines.queries import ntile_customers

    rng = np.random.default_rng(5)
    n = 1003  # deliberately not divisible by 4
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999, 9999, n), 2)
            ),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    got = ntile_customers(str(tmp_path))
    want = duckdb.sql(
        f"""SELECT c_custkey, CAST(NTILE(4) OVER (
              ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC, c_custkey
            ) AS BIGINT) AS bucket
            FROM '{tmp_path}/customer.parquet' ORDER BY c_custkey"""
    ).df()
    assert (got["bucket"].to_numpy() == want["bucket"].to_numpy()).all()


def test_range_join_bucketed_matches_bruteforce(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import range_join_bucketed

    rng = np.random.default_rng(17)
    vals = pd.DataFrame(
        {
            "vid": np.arange(300, dtype=np.int64),
            "v": rng.integers(0, 5000, 300).astype(np.int64),
        }
    )
    # overlapping ranges, varied spans, some empty (hi <= lo), some
    # spanning many buckets
    lo = rng.integers(-100, 5000, 120).astype(np.int64)
    span = rng.integers(-50, 900, 120).astype(np.int64)
    ranges = pd.DataFrame({"rid": np.arange(120, dtype=np.int64),
                           "lo": lo, "hi": lo + span})
    out = (
        range_join_bucketed(
            ray.data.from_arrow(pa.Table.from_pandas(vals, preserve_index=False)),
            ray.data.from_arrow(pa.Table.from_pandas(ranges, preserve_index=False)),
            value_col="v", lo_col="lo", hi_col="hi", bucket_width=256,
        )
        .to_pandas()[["vid", "rid"]]
        .sort_values(["vid", "rid"]).reset_index(drop=True)
    )
    cross = vals.merge(ranges, how="cross")
    want = (
        cross[(cross["v"] >= cross["lo"]) & (cross["v"] < cross["hi"])][
            ["vid", "rid"]
        ].sort_values(["vid", "rid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want)


def test_grouped_lead_matches_pandas(ray_session):
    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 8, 200).astype(np.int64),
            "o": rng.permutation(200).astype(np.int64),
            "v": rng.integers(0, 1000, 200).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        grouped_lag(ds, group_col="g", order_cols=["o"], value_col="v",
                    out_col="nxt", periods=-1)
        .to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    )
    want = df.sort_values(["g", "o"]).reset_index(drop=True)
    want["nxt"] = want.groupby("g")["v"].shift(-1)
    assert (out["nxt"].isna() == want["nxt"].isna()).all()
    mask = want["nxt"].notna()
    assert (out.loc[mask, "nxt"].astype("int64")
            == want.loc[mask, "nxt"].astype("int64")).all()


def test_grouped_interval_count_matches_bruteforce(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_interval_count

    rng = np.random.default_rng(29)
    n = 500
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 6, n).astype(np.int64),
            # duplicate timestamps included on purpose
            "ts": rng.integers(0, 300, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        grouped_interval_count(
            ds, group_col="g", ts_col="ts", lo_offset=-50, hi_offset=0,
            out_col="cnt",
        )
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    want = []
    for _, row in df.iterrows():
        sub = df[df["g"] == row["g"]]
        want.append(
            ((sub["ts"] >= row["ts"] - 50) & (sub["ts"] < row["ts"])).sum()
        )
    want_df = df.copy(); want_df["cnt"] = np.asarray(want, dtype=np.int64)
    want_df = want_df.sort_values("rid").reset_index(drop=True)
    assert (out["cnt"].astype("int64") == want_df["cnt"]).all()


def test_grouped_range_sum_matches_bruteforce(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_range_sum

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 5, n).astype(np.int64),
            "ts": rng.integers(0, 200, n).astype(np.int64),  # many ties
            "v": rng.integers(-20, 100, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        grouped_range_sum(
            ds, group_col="g", ts_col="ts", value_col="v",
            preceding=30, out_col="s",
        )
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    want = []
    for _, row in df.iterrows():
        sub = df[df["g"] == row["g"]]
        want.append(
            sub.loc[
                (sub["ts"] >= row["ts"] - 30) & (sub["ts"] <= row["ts"]), "v"
            ].sum()
        )
    assert (out["s"].astype("int64").to_numpy()
            == np.asarray(want, dtype=np.int64)).all()


def test_grouped_funnel_stage_matches_bruteforce(ray_session):
    from webscrape_neko_jirushi_ray.stages.relops import grouped_funnel_stage

    stages = ["A", "B", "C"]
    rng = np.random.default_rng(37)
    rows = []
    # adversarial hand cases: chain only out of order; missing middle;
    # ties on ts (strict > required); exact chain; stage-0 only
    hand = [
        (0, [("C", 1), ("B", 2), ("A", 3)]),          # out of order -> 1
        (1, [("A", 1), ("C", 2)]),                     # missing B -> 1
        (2, [("A", 5), ("B", 5), ("C", 6)]),           # tie A/B -> 1 (B not > 5)
        (3, [("A", 1), ("B", 2), ("C", 3)]),           # full chain -> 3
        (4, [("B", 1), ("C", 2)]),                     # no A -> 0
        (5, [("A", 1), ("B", 2), ("B", 9), ("C", 5)]), # greedy B@2 -> C@5 -> 3
        (6, [("A", 9), ("X", 1)]),                     # off-funnel type -> 1
    ]
    for g, evs in hand:
        for t, ts in evs:
            rows.append((g, t, ts))
    for g in range(7, 40):
        for _ in range(rng.integers(1, 12)):
            rows.append(
                (g, rng.choice(["A", "B", "C", "X"]), int(rng.integers(0, 50)))
            )
    df = pd.DataFrame(rows, columns=["g", "ty", "ts"]).astype(
        {"g": np.int64, "ts": np.int64}
    )

    def brute(sub):
        cur, depth = None, 0
        for i, st in enumerate(stages):
            cand = sorted(sub[sub["ty"] == st]["ts"])
            cand = [c for c in cand if cur is None or c > cur]
            if not cand:
                break
            cur, depth = cand[0], i + 1
        return depth

    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        grouped_funnel_stage(
            ds, group_col="g", type_col="ty", ts_col="ts", stages=stages
        )
        .to_pandas().set_index("g")["funnel_stage"]
    )
    for g in df["g"].unique():
        sub = df[df["g"] == g]
        if not sub["ty"].isin(stages).any():
            assert g not in out.index
            continue
        assert out[g] == brute(sub), f"group {g}: {out[g]} vs {brute(sub)}"
    assert out[0] == 1 and out[1] == 1 and out[2] == 1
    assert out[3] == 3 and out[5] == 3 and out[6] == 1 and out[4] == 0


def test_triangle_count_matches_bruteforce(ray_session, tmp_path):
    # synthesize a tiny customer/orders pair whose derived graph has a
    # known random structure; compare against an O(n^3) itertools count
    import itertools

    import pyarrow.parquet as pq_

    from webscrape_neko_jirushi_ray.pipelines.queries import (
        triangle_count_customers,
    )

    rng = np.random.default_rng(43)
    n_nodes, n_orders = 30, 400
    pq_.write_table(
        pa.table({"c_custkey": pa.array(np.arange(1, n_nodes + 1, dtype=np.int64))}),
        str(tmp_path / "customer.parquet"),
    )
    custkeys = rng.integers(1, n_nodes + 1, n_orders).astype(np.int64)
    orderkeys = rng.integers(0, 10_000, n_orders).astype(np.int64)
    pq_.write_table(
        pa.table({"o_orderkey": pa.array(orderkeys), "o_custkey": pa.array(custkeys)}),
        str(tmp_path / "orders.parquet"),
    )
    got = int(triangle_count_customers(str(tmp_path)).iloc[0, 0])
    edges = set()
    for ck, ok in zip(custkeys, orderkeys):
        dst = (ok % n_nodes) + 1
        if ck != dst:
            edges.add((min(ck, dst), max(ck, dst)))
    want = sum(
        1
        for a, b, c in itertools.combinations(range(1, n_nodes + 1), 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    assert got == want and want > 0


def test_grouped_funnel_stage_string_groups(ray_session):
    # regression: np.stack over mixed dtypes used to coerce stage/ts to
    # strings for string group columns -> every depth silently 0
    from webscrape_neko_jirushi_ray.stages.relops import grouped_funnel_stage

    df = pd.DataFrame(
        {
            "host": ["a.example", "a.example", "a.example", "b.example",
                      "b.example", "c.example"],
            "ty": ["A", "B", "C", "A", "C", "B"],
            "ts": np.array([1, 2, 10, 5, 4, 1], dtype=np.int64),
        }
    )
    out = (
        grouped_funnel_stage(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            group_col="host", type_col="ty", ts_col="ts",
            stages=["A", "B", "C"],
        )
        .to_pandas().set_index("host")["funnel_stage"]
    )
    assert out["a.example"] == 3    # full chain 1<2<10
    assert out["b.example"] == 1    # C before A -> depth 1
    assert out["c.example"] == 0    # no A


def test_pagerank_checkpoint_resume_bit_identical(ray_session, tmp_path):
    import os

    from webscrape_neko_jirushi_ray.stages.graph import pagerank_int

    rng = np.random.default_rng(47)
    nodes_t = pa.table({"node": pa.array(np.arange(1, 40, dtype=np.int64))})
    src = rng.integers(1, 40, 300).astype(np.int64)
    dst = rng.integers(1, 40, 300).astype(np.int64)
    edges_t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def mk():
        return (ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t))

    n1, e1 = mk()
    want = (
        pagerank_int(n1, e1, iterations=5, num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    ck = str(tmp_path / "pr_ck")
    n2, e2 = mk()
    partial = (
        pagerank_int(n2, e2, iterations=2, num_partitions=4,
                     checkpoint_dir=ck)
        .to_pandas()
    )
    assert os.path.exists(os.path.join(ck, "round=2", "_DONE"))
    # an unstamped (crashed) later round must be ignored on resume
    os.makedirs(os.path.join(ck, "round=3"), exist_ok=True)

    n3, e3 = mk()
    got = (
        pagerank_int(n3, e3, iterations=5, num_partitions=4,
                     checkpoint_dir=ck)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (got["pr_scaled"].to_numpy() == want["pr_scaled"].to_numpy()).all()
    assert os.path.exists(os.path.join(ck, "round=5", "_DONE"))


def test_pagerank_checkpoint_guards(ray_session, tmp_path):
    import os

    import pytest

    from webscrape_neko_jirushi_ray.stages.graph import pagerank_int

    nodes_t = pa.table({"node": pa.array(np.arange(1, 20, dtype=np.int64))})
    edges_t = pa.table(
        {
            "src": pa.array(np.arange(1, 19, dtype=np.int64)),
            "dst": pa.array(np.arange(2, 20, dtype=np.int64)),
        }
    )
    ck = str(tmp_path / "ck")
    want = (
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
            iterations=3, num_partitions=4, checkpoint_dir=ck,
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    # crashed attempt: unstamped round dir holding a STALE parquet must
    # be wiped, not merged with the recomputed round
    import shutil

    shutil.rmtree(os.path.join(ck, "round=3"))
    os.rename(os.path.join(ck, "round=2"), os.path.join(ck, "round=2.bak"))
    shutil.copytree(os.path.join(ck, "round=1"), os.path.join(ck, "round=2"))
    os.remove(os.path.join(ck, "round=2", "_DONE"))  # simulate no stamp
    got = (
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
            iterations=3, num_partitions=4, checkpoint_dir=ck,
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (got["pr_scaled"].to_numpy() == want["pr_scaled"].to_numpy()).all()
    # different parameters against the same checkpoint: loud failure
    with pytest.raises(ValueError, match="different graph"):
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
            iterations=3, num_partitions=4, checkpoint_dir=ck, damp_num=80,
        )


def test_pagerank_checkpoint_content_fingerprint(ray_session, tmp_path):
    """Same node/edge COUNTS but a different graph must not resume from
    the other graph's checkpoint (ADVICE r3: counts-only identity guard)."""
    import pytest

    from webscrape_neko_jirushi_ray.stages.graph import pagerank_int

    nodes_t = pa.table({"node": pa.array(np.arange(1, 10, dtype=np.int64))})
    chain = pa.table(
        {
            "src": pa.array(np.arange(1, 9, dtype=np.int64)),
            "dst": pa.array(np.arange(2, 10, dtype=np.int64)),
        }
    )
    # same 8 edges, same 9 nodes — but reversed direction
    rev = pa.table({"src": chain["dst"], "dst": chain["src"]})
    ck = str(tmp_path / "ckfp")
    pagerank_int(
        ray.data.from_arrow(nodes_t), ray.data.from_arrow(chain),
        iterations=2, num_partitions=4, checkpoint_dir=ck,
    ).materialize()
    with pytest.raises(ValueError, match="different graph"):
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(rev),
            iterations=2, num_partitions=4, checkpoint_dir=ck,
        )


def test_pagerank_overflow_guard_and_autoscale(ray_session):
    """n_nodes x scale >= 2**62 must raise (silent int64 overflow would be
    a wrong answer at exactly the target graph sizes); scale=None derives
    a safe scale and runs."""
    import pytest

    from webscrape_neko_jirushi_ray.stages.graph import pagerank_int

    n = 10_000
    nodes_t = pa.table({"node": pa.array(np.arange(1, n + 1, dtype=np.int64))})
    edges_t = pa.table(
        {
            "src": pa.array(np.arange(1, n, dtype=np.int64)),
            "dst": pa.array(np.arange(2, n + 1, dtype=np.int64)),
        }
    )
    with pytest.raises(ValueError, match="int64 headroom"):
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
            iterations=1, scale=10**15, num_partitions=4,
        )
    out = pagerank_int(
        ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
        iterations=1, scale=None, num_partitions=4,
    ).to_pandas()
    assert len(out) == n
    # auto-derived scale keeps resolution: ranks are strictly positive
    assert (out["pr_scaled"] > 0).all()


def test_pagerank_route_parity(ray_session):
    """The broadcast-ranks route and the join plan are both all-integer
    and must produce bit-identical ranks (r4 size routing)."""
    from webscrape_neko_jirushi_ray.stages.graph import pagerank_int

    rng = np.random.default_rng(11)
    n, m = 300, 2400
    nodes_t = pa.table({"node": pa.array(np.arange(1, n + 1, dtype=np.int64))})
    edges_t = pa.table(
        {
            "src": pa.array(rng.integers(1, n + 1, m).astype(np.int64)),
            # include dangling targets (> n) and duplicate pairs
            "dst": pa.array(rng.integers(1, n + 60, m).astype(np.int64)),
        }
    )
    a = (
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
            iterations=4, num_partitions=4,
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        pagerank_int(
            ray.data.from_arrow(nodes_t), ray.data.from_arrow(edges_t),
            iterations=4, num_partitions=4, broadcast_ranks_threshold=0,
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (a["node"].to_numpy() == b["node"].to_numpy()).all()
    assert (a["pr_scaled"].to_numpy() == b["pr_scaled"].to_numpy()).all()


def test_triangle_count_route_parity(ray_session):
    """Broadcast-closing-edge route vs the two-hash-join fallback must
    agree exactly (r4 size routing)."""
    from webscrape_neko_jirushi_ray.stages.graph import triangle_count

    rng = np.random.default_rng(77)
    n, m = 120, 1500
    src = rng.integers(1, n + 1, m).astype(np.int64)
    dst = rng.integers(1, n + 1, m).astype(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    edges_t = pa.table(
        {"a": pa.array(pairs[:, 0]), "b": pa.array(pairs[:, 1])}
    )
    e1 = ray.data.from_arrow(edges_t).repartition(4)
    got_bc = triangle_count(e1, max_node_id=n)
    got_join = triangle_count(
        ray.data.from_arrow(edges_t).repartition(4),
        max_node_id=n,
        broadcast_edges_threshold=0,
    )
    assert got_bc == got_join and got_bc > 0


def test_pagerank_three_routes_bit_identical(ray_session):
    """The driver route (default at small scale), the broadcast-ranks
    route, and the per-round hash-join plan must return bit-identical
    integer ranks — size routing may never change results."""
    rng = np.random.default_rng(17)
    n = 60
    edges = {(int(a), int(b)) for a, b in
             zip(rng.integers(0, n, 300), rng.integers(0, n, 300))
             if a != b}
    e = np.array(sorted(edges), dtype=np.int64)
    nodes_ds = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    )
    edges_ds = ray.data.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    ).repartition(3)
    kw = dict(iterations=3, scale=10**9, num_partitions=4)
    driver = (
        pagerank_int(nodes_ds, edges_ds, **kw)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    broadcast = (
        pagerank_int(nodes_ds, edges_ds, driver_route_edges=0, **kw)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    joined = (
        pagerank_int(nodes_ds, edges_ds, driver_route_edges=0,
                     broadcast_ranks_threshold=0, **kw)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (driver["pr_scaled"].to_numpy()
            == broadcast["pr_scaled"].to_numpy()).all()
    assert (driver["pr_scaled"].to_numpy()
            == joined["pr_scaled"].to_numpy()).all()


def test_triangle_three_routes_identical(ray_session):
    """Driver, broadcast-bucket, and join-plan triangle routes must all
    return the same count."""
    from webscrape_neko_jirushi_ray.stages.graph import triangle_count

    rng = np.random.default_rng(23)
    n = 50
    raw = {(int(x), int(y)) for x, y in
           zip(rng.integers(0, n, 400), rng.integers(0, n, 400)) if x != y}
    canon = {(min(x, y), max(x, y)) for x, y in raw}
    e = np.array(sorted(canon), dtype=np.int64)
    edges = ray.data.from_arrow(
        pa.table({"a": pa.array(e[:, 0]), "b": pa.array(e[:, 1])})
    ).repartition(3)
    kw = dict(max_node_id=n, num_partitions=4)
    driver = triangle_count(edges, **kw)
    bucketed = triangle_count(edges, driver_route_edges=0, **kw)
    joined = triangle_count(
        edges, driver_route_edges=0, broadcast_edges_threshold=0, **kw
    )
    # brute-force reference
    adj = np.zeros((n, n), dtype=np.int64)
    adj[e[:, 0], e[:, 1]] = 1
    adj = np.maximum(adj, adj.T)
    want = int(np.einsum("ij,jk,ki->", adj, adj, adj)) // 6
    assert driver == bucketed == joined == want


def test_kcore_routes_match_reference(ray_session):
    """Driver and distributed k-core peels must agree with a brute-force
    iterative reference, including isolated/self-loop/duplicate edges."""
    from webscrape_neko_jirushi_ray.stages.graph import kcore_nodes

    rng = np.random.default_rng(41)
    n = 70
    src = rng.integers(0, n, 500).astype(np.int64)
    dst = rng.integers(0, n, 500).astype(np.int64)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(4)
    k = 4
    driver = kcore_nodes(edges, k=k, num_partitions=4)
    dist = kcore_nodes(edges, k=k, num_partitions=4, driver_route_edges=0)

    # brute-force peel
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    e = list(pairs)
    alive = set(range(n))
    while True:
        deg = {}
        for a, b in e:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        drop = {v for v in alive if deg.get(v, 0) < k}
        if not drop:
            break
        alive -= drop
    want = pd.DataFrame(
        sorted((v, deg[v]) for v in alive if deg.get(v, 0) >= k),
        columns=["node", "core_degree"],
    ).astype("int64")
    got_d = driver.sort_values("node").reset_index(drop=True)
    got_x = dist.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_d, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_x, want, check_dtype=False)


def test_kcore_empty_and_total(ray_session):
    from webscrape_neko_jirushi_ray.stages.graph import kcore_nodes

    # triangle: every node has degree 2 -> 2-core = all, 3-core = empty
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 0], pa.int64()),
            }
        )
    )
    two = kcore_nodes(edges, k=2)
    assert two["node"].tolist() == [0, 1, 2]
    assert two["core_degree"].tolist() == [2, 2, 2]
    three = kcore_nodes(edges, k=3)
    assert len(three) == 0
