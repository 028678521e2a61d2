"""Relational-core queries, part A (TPC-H-shaped scans, joins, aggregates).

Split from the former single-file queries module (VERDICT r4 #8);
names resolve cross-family via the package cross-link in __init__.
"""

from . import _base
from ._base import *  # noqa: F401,F403 — np/pa/pc/pd/ray + stage imports


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate (A1/A2 analog; TPC-H Q1 shape): per-batch
    conversion to integer cents, then Ray's hash aggregate; input pruned to
    6 columns at the read. Averages derived from the exact integer sums."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    cutoff = _dt.datetime(1998, 9, 2)

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _to_scaled_int(t["l_quantity"], 100),
                "price_c": _to_scaled_int(t["l_extendedprice"], 100),
                "disc_price_dmc": _to_scaled_int(disc_price, 10_000),
                "disc_c": _to_scaled_int(t["l_discount"], 100),
            }
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("price_c", alias_name="sum_base_price_c"),
            Sum("disc_price_dmc", alias_name="sum_disc_price_dmc"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty_c", "sum_base_price_c", "sum_disc_price_dmc", "sum_disc_c"):
        out[c] = out[c].astype("int64")
    out["avg_qty"] = out["sum_qty_c"] / 100.0 / out["count_order"]
    out["avg_disc"] = out["sum_disc_c"] / 100.0 / out["count_order"]
    out = out.drop(columns=["sum_disc_c"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def tax_charge_summary(sf_dir: str) -> pd.DataFrame:
    """Tax-inclusive charge rollup — the full TPC-H Q1 charge expression
    ``extendedprice * (1 - discount) * (1 + tax)`` per (returnflag,
    linestatus), in exact 1e-6-scaled integer units (2+2+2 decimal
    factors make the true product a multiple of 1e-6, so the per-row
    scaled value sits epsilon-from-integer and Arrow/DuckDB round modes
    cannot diverge). The only consumer of ``l_tax`` in the corpus.
    Shuffle-free per-batch partials into a 6-group aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount", "l_tax"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        charge = pc.multiply(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pc.add(pa.scalar(1.0), t["l_tax"]),
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "charge_e6": _to_scaled_int(charge, 1_000_000),
            }
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("charge_e6", alias_name="sum_charge_e6"),
            Count(alias_name="n_items"),
        )
        .to_pandas()
    )
    out["sum_charge_e6"] = out["sum_charge_e6"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def filtered_lineitems(sf_dir: str) -> "ray.data.Dataset":
    """Row-level filter + computed projection (F-family/M-family analog):
    per-row arithmetic, no rounding needed."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def _f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.greater_equal(t["l_discount"], 0.05),
                pc.greater(t["l_quantity"], 24.0),
            ),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "l_quantity": t["l_quantity"],
                "revenue": rev,
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Hash join chain (J2/J3 analog), size-routed like
    embedding_dedup: below _NATION_REVENUE_ROUTE_ROWS customers (parquet
    metadata row count — no scan) the per-cust aggregate is merged on the
    driver (~tens of MB, and two fewer all-to-all latencies); above it the
    plan is the fully distributed :func:`nation_revenue_distributed`.
    Both plans are oracle-checked — the distributed one via its own
    queries() entry."""
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust > _base._NATION_REVENUE_ROUTE_ROWS:
        return nation_revenue_distributed(sf_dir)
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _to_scaled_int(t["o_totalprice"], 100)}
        ),
        batch_format="pyarrow",
    )
    per_cust = (
        orders.groupby("o_custkey")
        .aggregate(Sum("price_c", alias_name="cust_total_c"),
                   Count(alias_name="cust_orders"))
        .to_pandas()
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    m = per_cust.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = (
        m.groupby("n_name", as_index=False)
        .agg(revenue_c=("cust_total_c", "sum"), n_orders=("cust_orders", "sum"))
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_c"] = out["revenue_c"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def nation_revenue_distributed(sf_dir: str) -> pd.DataFrame:
    """The 100-TB-safe nation_revenue plan, pinned by its own oracle:
    orders pre-aggregate per custkey (combiner BEFORE the join), the
    per-cust⋈customer step is a partitioned hash_join (both sides
    O(customers) — never driver-materialized), the 25-row nation lookup
    is a zero-shuffle broadcast_join, and the driver sees only the
    25-row result."""
    from ray.data.aggregate import Count, Sum

    from ...stages.joins import broadcast_join, hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _to_scaled_int(t["o_totalprice"], 100)}
        ),
        batch_format="pyarrow",
    )
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("price_c", alias_name="cust_total_c"),
        Count(alias_name="cust_orders"),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_join(
        per_cust, cust, key="o_custkey", right_key="c_custkey",
        num_partitions=32,
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    named = broadcast_join(
        joined.map_batches(
            lambda t: t.append_column(
                "n_nationkey", pc.cast(t["c_nationkey"], pa.int64())
            ),
            batch_format="pyarrow",
        ),
        nation.set_column(
            0, "n_nationkey", pc.cast(nation["n_nationkey"], pa.int64())
        ),
        key="n_nationkey",
    )
    out = (
        named.groupby("n_name")
        .aggregate(
            Sum("cust_total_c", alias_name="revenue_c"),
            Sum("cust_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_c"] = out["revenue_c"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join (J1/J4/D5 analog), distributed: partitioned left_anti
    hash_join — both sides co-partition on custkey and the per-partition
    decision is one vectorized is_in, so the distinct-orderer key set
    never materializes on the driver (at TPC-H scale it is O(customers)).
    The crawl engine's streamed frontier uses the same shape task-side;
    broadcast-key filtering remains the right plan only when the key set
    is provably small (see stages/spandedup.decontaminate)."""
    from ...stages.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    okeys = _read(sf_dir, "orders", ["o_custkey"])
    out = hash_join(
        cust, okeys, key="c_custkey", right_key="o_custkey",
        how="left_anti", num_partitions=32,
    ).to_pandas()
    if "c_custkey" not in out.columns:  # fully-matched: empty result block
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def distinct_mktsegments(sf_dir: str) -> pd.DataFrame:
    """Distinct (D-family): groupby-based unique."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    out = ds.groupby("c_mktsegment").count().to_pandas()[["c_mktsegment"]]
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def part_size_histogram(sf_dir: str) -> pd.DataFrame:
    """Value histogram (A4: the file-size histogram analog)."""
    ds = _read(sf_dir, "part", ["p_size"])
    out = ds.groupby("p_size").count().to_pandas().rename(columns={"count()": "n"})
    return out.sort_values("p_size").reset_index(drop=True)


def weighted_avg_discount(sf_dir: str) -> pd.DataFrame:
    """Weighted mean (A3: the reference's sum-of-sums / count semantics)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_discount"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "disc_amount_dmc": _to_scaled_int(
                    pc.multiply(t["l_extendedprice"], t["l_discount"]), 10_000
                ),
                "price_c": _to_scaled_int(t["l_extendedprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    agg = ds.aggregate(
        Sum("disc_amount_dmc", alias_name="sum_disc_amount_dmc"),
        Sum("price_c", alias_name="sum_price_c"),
    )
    # identical double ops on both sides from the exact integer sums
    w = (agg["sum_disc_amount_dmc"] / 10_000.0) / (agg["sum_price_c"] / 100.0)
    return pd.DataFrame({"weighted_avg_discount": [round(w, 6)]})


def semi_join_customers(sf_dir: str) -> pd.DataFrame:
    """Semi-join (J1 positive form): customers WITH >=1 order, via a
    broadcast key set filtered inside map_batches."""
    import ray as _ray

    okeys = pa.array(
        pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])[
            "o_custkey"
        ].unique()
    )
    okeys_ref = _ray.put(okeys)
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def _semi(t: pa.Table) -> pa.Table:
        keys = _ray.get(okeys_ref)
        return t.filter(pc.is_in(t["c_custkey"], value_set=keys))

    out = cust.map_batches(_semi, batch_format="pyarrow").to_pandas()
    if "c_custkey" not in out.columns:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def union_distinct_nations(sf_dir: str) -> pd.DataFrame:
    """Union + distinct (D3: union of frontier sources then dedup)."""
    c = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["c_nationkey"], pa.int32())}),
        batch_format="pyarrow",
    )
    s = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["s_nationkey"], pa.int32())}),
        batch_format="pyarrow",
    )
    u = c.union(s)
    out = u.groupby("nationkey").count().to_pandas()[["nationkey"]]
    return out.sort_values("nationkey").reset_index(drop=True)


def rank_customers(sf_dir: str) -> pd.DataFrame:
    """Global dense enumeration (O3/ST6: the cat_0001... counter): rank by
    (acctbal desc, custkey). Driver-side enumeration over the sorted key
    column — the documented small-cardinality path; at 10^9 groups this
    becomes range-partitioned offsets."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    df = ds.to_pandas().sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True]
    )
    df["bal_rank"] = range(1, len(df) + 1)
    return df[["c_custkey", "bal_rank"]].sort_values("c_custkey").reset_index(drop=True)


def dataset_totals(sf_dir: str) -> pd.DataFrame:
    """A5 analog: global dataset totals in one row."""
    from ray.data.aggregate import Count, Sum

    docs = _read(sf_dir, "documents", ["n_chars"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )
    n_events = _read(sf_dir, "events", ["event_id"]).count()
    n_vecs = _read(sf_dir, "embeddings", ["vec_id"]).count()
    avg_chars = docs["total_chars"] / docs["n_docs"]
    return pd.DataFrame(
        {
            "n_docs": [int(docs["n_docs"])],
            "total_chars": [int(docs["total_chars"])],
            "avg_chars": [avg_chars],
            "n_events": [int(n_events)],
            "n_vecs": [int(n_vecs)],
        }
    )


def strided_id_probe(sf_dir: str) -> pd.DataFrame:
    """O5: strided ID-range probe seeding (smart_cat_discovery.py:158-173)
    as ray.data.range + arithmetic map."""
    import ray.data as rd

    ranges = [(226400, 226500), (226500, 226600), (226600, 226700),
              (226700, 226800), (226800, 226900)]
    parts = []
    for lo, hi in ranges:
        n = (hi - lo + 4) // 5
        ds = rd.range(n).map_batches(
            lambda t, lo=lo: pa.table(
                {"cat_id": pc.add(pc.multiply(t["id"], 5), lo)}
            ),
            batch_format="pyarrow",
        )
        parts.append(ds)
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    out = u.to_pandas()
    out["cat_id"] = out["cat_id"].astype("int64")
    return out.sort_values("cat_id").reset_index(drop=True)


def running_order_totals(sf_dir: str) -> pd.DataFrame:
    """Window function (running sum per partition): per customer, orders in
    (o_orderdate, o_orderkey) order with a cumulative total + row number.
    One hash-bucket shuffle, every customer's cumsum/rank computed in one
    segment pass (stages/relops.grouped_running_sum) — the engine's
    window idiom; cents ints keep the cumulative sums exact vs the SQL
    oracle."""
    from ...stages.relops import grouped_running_sum
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "price_c": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )

    out = (
        grouped_running_sum(
            ds,
            group_col="o_custkey",
            order_cols=["o_orderdate", "o_orderkey"],
            value_col="price_c",
            out_col="running_total_c",
            rank_col="order_rank",
        )
        .select_columns(
            ["o_orderkey", "o_custkey", "running_total_c", "order_rank"]
        )
        .to_pandas()
    )
    out["running_total_c"] = out["running_total_c"].astype("int64")
    out["order_rank"] = out["order_rank"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def rank_customers_distributed(sf_dir: str) -> pd.DataFrame:
    """Same ranking as rank_customers but through the range-partitioned
    distributed enumeration (functions/enumerate.py) — two plans, one
    answer, same DuckDB oracle."""
    from ...functions.enumerate import attach_dense_index

    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out = attach_dense_index(
        ds, ["c_acctbal", "c_custkey"], ascending=[False, True],
        index_col="bal_rank", num_ranges=8,
    ).to_pandas()
    return out[["c_custkey", "bal_rank"]].sort_values("c_custkey").reset_index(drop=True)


def range_join_quantity_buckets(sf_dir: str) -> pd.DataFrame:
    """Broadcast range join (custom operator): lineitem quantities
    classified into [lo, hi) buckets — the ranges are metadata (ray.put
    once), the fact table streams through one vectorized searchsorted."""
    from ...stages.relops import range_join_broadcast

    ranges = pa.table(
        {
            "lo": pa.array([0, 10, 20, 30, 40], type=pa.int64()),
            "hi": pa.array([10, 20, 30, 40, 60], type=pa.int64()),
            "bucket_label": pa.array(["xs", "s", "m", "l", "xl"]),
        }
    )
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    out = range_join_broadcast(
        ds, ranges, value_col="l_quantity",
        keep_cols=["l_orderkey", "l_linenumber"],
    ).to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def outer_join_balances(sf_dir: str) -> pd.DataFrame:
    """Distributed FULL OUTER hash join (stages/joins.hash_join,
    partition-bucketed acero stitch, key coalesced per-partition):
    BUILDING-segment customers vs positive-balance customers on custkey —
    genuine unmatched rows on both sides; nulls coalesced to sentinels so
    the driver hash is type-stable."""
    from ...stages.joins import hash_join

    ds = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]
    )

    def _left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        return pa.table({"c_custkey": t["c_custkey"], "c_name": t["c_name"]})

    def _right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], 0.0))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": _to_scaled_int(t["c_acctbal"], 100),
            }
        )

    left = ds.map_batches(_left, batch_format="pyarrow")
    right = ds.map_batches(_right, batch_format="pyarrow")
    out = hash_join(
        left, right, key="c_custkey", how="full_outer"
    ).to_pandas()
    out["c_name"] = out["c_name"].fillna("<none>")
    out["bal_cents"] = out["bal_cents"].fillna(-1).astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def rollup_order_stats(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP analog (multi-level aggregate) — see
    :func:`_order_stats_multilevel` for the one-corpus-shuffle shape."""
    return _order_stats_multilevel(sf_dir, include_priority_level=False)


def pivot_priority_status(sf_dir: str) -> pd.DataFrame:
    """PIVOT (long -> wide): order counts and total cents per priority,
    one column group per order status. Scale shape: ONE corpus groupby at
    the (priority, status) grain — the wide reshape runs on the
    metadata-sized result, never on the corpus."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "priority": t["o_orderpriority"],
                "status": t["o_orderstatus"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    fine = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["priority", "status"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()  # |priority| x |status| rows
    )
    statuses = ["F", "O", "P"]
    out = pd.DataFrame({"priority": sorted(fine["priority"].unique())})
    for s in statuses:
        sub = fine[fine["status"] == s].set_index("priority")
        # reindex with an int fill keeps the columns int64 end-to-end
        # (a map + fillna round-trip through float64 would lose exactness
        # for cent sums beyond 2^53)
        out[f"n_{s.lower()}"] = (
            sub["n"].reindex(out["priority"], fill_value=0).to_numpy()
        )
        out[f"cents_{s.lower()}"] = (
            sub["cents"].reindex(out["priority"], fill_value=0).to_numpy()
        )
    return out.sort_values("priority").reset_index(drop=True)


def cube_order_stats(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE analog: ROLLUP plus the priority-only level — see
    :func:`_order_stats_multilevel`."""
    return _order_stats_multilevel(sf_dir, include_priority_level=True)


def ntile_customers(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey): global rank
    via the distributed range-partitioned enumeration
    (functions/enumerate.attach_dense_index — O(ranges) driver state),
    then the SQL NTILE bucket is a pure vectorized formula of (rank, n):
    the first n%k buckets get ceil(n/k) rows, the rest floor(n/k)."""
    from ...functions.enumerate import attach_dense_index

    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": _to_scaled_int(t["c_acctbal"], 100),
            }
        )

    ranked = attach_dense_index(
        ds.map_batches(_prep, batch_format="pyarrow"),
        ["bal_cents", "c_custkey"],
        ascending=[False, True],
        index_col="rank",
    ).materialize()  # consumed twice below (count + bucket map)
    n = ranked.count()
    k = 4
    q, r = divmod(n, k)
    boundary = r * (q + 1)

    def _bucket(t: pa.Table) -> pa.Table:
        rank = np.asarray(t["rank"].to_numpy(zero_copy_only=False))
        big = (rank - 1) // (q + 1) + 1 if q + 1 > 0 else np.ones_like(rank)
        small = r + (rank - 1 - boundary) // q + 1 if q > 0 else np.ones_like(rank)
        bucket = np.where(rank <= boundary, big, small)
        return pa.table(
            {"c_custkey": t["c_custkey"], "bucket": pa.array(bucket, pa.int64())}
        )

    out = ranked.map_batches(_bucket, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def intersect_rich_building(sf_dir: str) -> pd.DataFrame:
    """INTERSECT: custkeys with acctbal > 5000 AND in the BUILDING
    segment — two pruned reads, distributed left-semi hash join (keys
    co-partitioned, is_in mask per partition; both sides stay Datasets)."""
    from ...stages.joins import hash_join

    rich = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 5000.0)),
        batch_format="pyarrow",
    )
    bldg = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    out = hash_join(
        rich.select_columns(["c_custkey"]),
        bldg.select_columns(["c_custkey"]),
        key="c_custkey",
        how="left_semi",
        num_partitions=32,
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def range_join_price_bands(sf_dir: str) -> pd.DataFrame:
    """Distributed interval join with BOTH sides large and OVERLAPPING
    ranges (stages/relops.range_join_bucketed): customers' balance values
    vs part-derived price bands. Values route to one domain bucket each,
    ranges replicate only to buckets they overlap, one groupby(bucket)
    shuffle, vectorized per-bucket cross+mask — then the pair stream is
    aggregated per band WITHOUT materializing it."""
    from ray.data.aggregate import Count, Sum

    from ...stages.relops import range_join_bucketed

    def _vals(t: pa.Table) -> pa.Table:
        cents = np.asarray(
            _to_scaled_int(t["c_acctbal"], 100).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "v": pa.array(np.abs(cents) % 38500, pa.int64()),
            }
        )

    def _rng(t: pa.Table) -> pa.Table:
        pk = np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False))
        lo = (pk % 500) * 77
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(lo + 300, pa.int64()),
            }
        )

    vals = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        _vals, batch_format="pyarrow"
    )
    rng = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        _rng, batch_format="pyarrow"
    )
    pairs = range_join_bucketed(
        vals, rng, value_col="v", lo_col="lo", hi_col="hi", bucket_width=256
    )
    out = (
        pairs.groupby("p_partkey")
        .aggregate(Count(alias_name="n"), Sum("v", alias_name="sum_v"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_v"] = out["sum_v"].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def profile_orders_table(sf_dir: str) -> pd.DataFrame:
    """Single-pass data-quality profile of the orders table
    (stages/profile.profile_columns): per column n / nulls / min / max —
    one streaming pass, O(columns x blocks) combine rows, O(columns)
    driver state."""
    from ...stages.profile import profile_columns

    ds = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
    return profile_columns(
        ds,
        int_cols=["o_orderkey", "o_custkey"],
        str_cols=["o_orderstatus", "o_orderpriority"],
    )


def except_all_parts(sf_dir: str) -> pd.DataFrame:
    """SQL EXCEPT ALL (bag difference) via stages/relops.bag_difference:
    per-key counts collapse BOTH sides before anything shuffles, one
    count-level left-outer hash join, vectorized row re-expansion to the
    result multiplicity."""
    from ...stages.relops import bag_difference

    heavy, discounted = _partkey_bags(sf_dir)
    out = bag_difference(
        heavy, discounted, key="l_partkey", how="except_all"
    ).to_pandas()
    return out.sort_values("l_partkey").reset_index(drop=True)


def intersect_all_parts(sf_dir: str) -> pd.DataFrame:
    """SQL INTERSECT ALL (bag intersection) — min of the per-key counts,
    same count-collapse-first shape as except_all_parts."""
    from ...stages.relops import bag_difference

    heavy, discounted = _partkey_bags(sf_dir)
    out = bag_difference(
        heavy, discounted, key="l_partkey", how="intersect_all"
    ).to_pandas()
    return out.sort_values("l_partkey").reset_index(drop=True)


def lineitems_above_part_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated-aggregate join-back (TPC-H Q17 family): line items whose
    quantity strictly exceeds their part's mean quantity.

    The mean is a combiner-reduced (sum, count) groupby that moves
    O(parts) rows; the comparison ``qty * count > sum`` stays in exact
    int64 so Ray and DuckDB agree bit-for-bit with no float division
    anywhere. The attach back onto lineitem is size-routed on the part
    table's parquet metadata (the nation_revenue pattern): below the
    threshold the O(parts) aggregate broadcasts once and the corpus
    side never moves; above it (or for directory datasets whose
    metadata one read can't see) the distributed hash join keyed on
    the SAME partkey takes over.
    """
    from ray.data.aggregate import Count, Sum

    from ...stages.joins import broadcast_join, hash_join

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "l_partkey": t["l_partkey"],
                "qty": _to_scaled_int(t["l_quantity"], 1),
            }
        )

    items = ds.map_batches(_prep, batch_format="pyarrow")
    stats = items.groupby("l_partkey").aggregate(
        Sum("qty", alias_name="s"), Count(alias_name="c")
    )
    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        stats_tbl = pa.Table.from_pandas(
            stats.to_pandas(), preserve_index=False
        )
        joined = broadcast_join(items, stats_tbl, key="l_partkey")
    else:
        joined = hash_join(items, stats, key="l_partkey")

    def _keep_above(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(t["qty"], pc.cast(t["c"], pa.int64())),
            pc.cast(t["s"], pa.int64()),
        )
        kept = t.filter(keep)
        return kept.select(["l_orderkey", "l_linenumber", "l_partkey", "qty"])

    out = joined.map_batches(_keep_above, batch_format="pyarrow").to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(
        drop=True
    )


def median_price_per_nation(sf_dir: str) -> pd.DataFrame:
    """Grouped EXACT median over a continuous column: per-nation median
    order price in integer cents, plus the order count.

    Even-count groups return the midpoint of the two middle values —
    numpy and DuckDB both compute (lo + hi) / 2 in double, an exact IEEE
    halving of exact int64 cents, so the hash matches bit-for-bit.
    orders→customer is size-routed on customer's parquet metadata
    (nation_revenue pattern): a small customer table broadcasts once
    (zero-shuffle searchsorted attach), a big one takes the distributed
    hash join. The 25-row nation name attach is a plain broadcast dict;
    the median itself is ONE key-routed shuffle and a single lexsort +
    segment-midpoint pass per bucket (no per-key Python calls). Nations
    bound the key space here; for high-cardinality keys over discrete
    values the histogram quantile path
    (textstats.grouped_length_quantiles) is the scale tool — this query
    pins the sort-selection shape.
    """
    from ...stages.joins import broadcast_join, hash_join
    from ...stages.relops import (
        _WB,
        _group_codes,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation_names = {
        int(k): v
        for k, v in zip(
            *pq.read_table(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).to_pydict().values()
        )
    }

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        cust_tbl = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        joined = broadcast_join(
            orders, cust_tbl, key="o_custkey", right_key="c_custkey"
        )
    else:
        joined = hash_join(
            orders, cust, key="o_custkey", right_key="c_custkey"
        )
    lut = np.empty(max(nation_names) + 1, dtype=object)
    for k, v in nation_names.items():
        lut[k] = v

    def _name(t: pa.Table) -> pa.Table:
        keys = np.asarray(
            t["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        return pa.table(
            {"n_name": pa.array(lut[keys], pa.string()), "cents": t["cents"]}
        )

    named = joined.map_batches(_name, batch_format="pyarrow")

    def _median(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "n_name")
        cents = _int64_nonull(g["cents"], "cents")
        order = np.lexsort((cents, codes))
        sc = codes[order]
        svals = cents[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = ends - starts
        lo = svals[starts + (n - 1) // 2].astype(np.float64)
        hi = svals[starts + n // 2].astype(np.float64)
        names = pc.take(
            g["n_name"].combine_chunks()
            if isinstance(g["n_name"], pa.ChunkedArray)
            else g["n_name"],
            pa.array(order[starts]),
        )
        return pa.table(
            {
                "n_name": names,
                "median_price_cents": pa.array((lo + hi) / 2.0),
                "n_orders": pa.array(n.astype(np.int64)),
            }
        )

    out = (
        _route_by_group(named, "n_name", 16)
        .groupby(_WB)
        .map_groups(_median, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("n_name").reset_index(drop=True)


def fk_coverage_audit(sf_dir: str) -> pd.DataFrame:
    """REFERENTIAL-INTEGRITY audit across every foreign-key relation in
    the corpus: per relation the child row count, distinct child keys,
    how many of those keys resolve in the parent, and the orphan row
    count — the cross-table consistency report a pipeline runs before
    trusting any join (the validate_orders_rules companion, one level
    up: across tables instead of within one).

    Scale plan: each child table is READ ONCE (blocks sized ~1M rows —
    tiny default blocks fragmented the shuffle into hundreds of
    near-empty sort tasks) and ONE np.unique pass per batch collapses
    ALL of its foreign keys to composite (rel << 48 | key, n) partials
    (lineitem carries three relations in a single scan and a single
    dedup); the four streams union into ONE groupby shuffle over a
    single int64 producing the O(distinct keys) rollup — row totals,
    distinct counts and orphan sums all come off that table, never the
    raw children. Parent keys
    (unique — primary keys by construction) attach size-routed: when
    every parent fits ≤ _BROADCAST_SIDE_ROUTE_ROWS they broadcast once
    as one dict of sorted arrays and a single searchsorted pass reduces
    each batch to four int64 partials per relation (whole audit = ONE
    union shuffle + one tiny groupby); any oversized parent takes a
    per-relation left_semi hash_join on its rollup slice instead.
    Orphan rows = Σn − Σn(matched), so no outer join and nothing
    row-shaped crosses the driver."""
    from ray.data.aggregate import Count, Sum

    from ...stages.joins import hash_join

    relations = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
    ]
    by_child: dict[str, list[tuple[int, str]]] = {}
    for rid, (rel, child, ckey, _p, _pk) in enumerate(relations):
        by_child.setdefault(child, []).append((rid, ckey))

    from ...stages.relops import _WB

    def _tagged(rid_keys):
        # fused composite partial: ALL of a child's relations collapse in
        # ONE np.unique pass over (rel << 48 | key) — 4x faster per batch
        # than one Arrow group_by per relation, and the bucket routing
        # rides along so no separate _route pass exists (r4 bench audit)
        def _f(t: pa.Table) -> pa.Table:
            comps = []
            for rid, ckey in rid_keys:
                k = np.asarray(
                    pc.cast(t[ckey], pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                )
                if k.size and (k.max() >= 1 << 48 or k.min() < 0):
                    raise ValueError(
                        "fk_coverage_audit composite key needs "
                        "0 <= key < 2^48"
                    )
                comps.append((np.int64(rid) << np.int64(48)) | k)
            comp, cnt = np.unique(np.concatenate(comps), return_counts=True)
            h = (
                comp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ) >> np.uint64(33)
            return pa.table(
                {
                    "comp": pa.array(comp),
                    "n": pa.array(cnt.astype(np.int64)),
                    _WB: pa.array((h % np.uint64(64)).astype(np.int64)),
                }
            )

        return _f

    # partial blocks sized ~1M child rows (≈24 MB of (comp, n, _WB)):
    # the default small-file parallelism fragments the shuffle into
    # hundreds of near-empty sort tasks (6.6 s → 0.5 s at sf0.1); at
    # scale the count grows linearly with the table, never above the
    # per-block memory budget
    streams = [
        _read(
            sf_dir,
            child,
            sorted({ck for _r, ck in rks}),
            override_num_blocks=max(
                1, -(-_fact_rows(sf_dir, child) // 1_000_000)
            ),
        ).map_batches(_tagged(rks), batch_format="pyarrow")
        for child, rks in by_child.items()
    ]
    union = streams[0]
    for s in streams[1:]:
        union = union.union(s)

    parent_sizes = {}
    for _rel, _c, _ck, parent, _pk in relations:
        if parent in parent_sizes:
            continue
        parent_sizes[parent] = _fact_rows(sf_dir, parent)

    stats: dict[int, tuple[int, int, int, int]] = {}
    if all(v <= _base._BROADCAST_SIDE_ROUTE_ROWS for v in parent_sizes.values()):
        pk_arrays = {}
        for rid, (_rel, _c, _ck, parent, pkey) in enumerate(relations):
            pk_arrays[rid] = np.unique(
                pq.read_table(f"{sf_dir}/{parent}.parquet", columns=[pkey])[
                    pkey
                ].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        pk_ref = ray.put(pk_arrays)

        def _audit(g: pa.Table) -> pa.Table:
            pks = ray.get(pk_ref)
            s = (
                pa.table({"comp": g["comp"], "n": g["n"]})
                .group_by("comp")
                .aggregate([("n", "sum")])
            )
            comp = np.asarray(
                s["comp"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            n = np.asarray(
                s["n_sum"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            rel = comp >> np.int64(48)
            k = comp & np.int64((1 << 48) - 1)
            out = {c: [] for c in ("rel", "cr", "dk", "mk", "mr")}
            for rid in np.unique(rel):
                m = rel == rid
                p = pks[int(rid)]
                km, nm = k[m], n[m]
                pos = np.searchsorted(p, km)
                hit = (pos < len(p)) & (
                    p[np.minimum(pos, len(p) - 1)] == km
                )
                out["rel"].append(int(rid))
                out["cr"].append(int(nm.sum()))
                out["dk"].append(int(m.sum()))
                out["mk"].append(int(hit.sum()))
                out["mr"].append(int(nm[hit].sum()))
            return pa.table(
                {c: pa.array(np.asarray(v, dtype=np.int64))
                 for c, v in out.items()}
            )

        agg = (
            union.groupby(_WB)
            .map_groups(_audit, batch_format="pyarrow")
            .groupby("rel")
            .aggregate(
                Sum("cr", alias_name="cr"),
                Sum("dk", alias_name="dk"),
                Sum("mk", alias_name="mk"),
                Sum("mr", alias_name="mr"),
            )
            .to_pandas()
        )
        for _i, r in agg.iterrows():
            stats[int(r["rel"])] = (
                int(r["cr"]), int(r["dk"]), int(r["mk"]), int(r["mr"])
            )
    else:
        def _unpack(t: pa.Table) -> pa.Table:
            comp = np.asarray(
                t["comp"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            return pa.table(
                {
                    "rel": pa.array(comp >> np.int64(48)),
                    "k": pa.array(comp & np.int64((1 << 48) - 1)),
                    "n": t["n"],
                }
            )

        rollup = (
            union.map_batches(_unpack, batch_format="pyarrow")
            .groupby(["rel", "k"]).aggregate(Sum("n", alias_name="n"))
            .materialize()  # sliced per relation below
        )
        for rid, (_rel, _c, _ck, parent, pkey) in enumerate(relations):
            dk = rollup.filter(expr=f"rel == {rid}")
            tot = dk.aggregate(
                Sum("n", alias_name="cr"), Count(alias_name="dk")
            )
            cr, dcount = int(tot["cr"] or 0), int(tot["dk"])
            pks = _read(sf_dir, parent, [pkey]).map_batches(
                lambda t, pkey=pkey: pa.table(
                    {"pk": pc.cast(t[pkey], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            matched = hash_join(
                dk, pks, key="k", right_key="pk", how="left_semi"
            )
            magg = matched.aggregate(
                Sum("n", alias_name="mr"), Count(alias_name="mk")
            )
            mr = int(magg["mr"]) if magg["mr"] is not None else 0
            stats[rid] = (cr, dcount, int(magg["mk"]), mr)

    rows = []
    for rid, (rel, _c, _ck, _p, _pk) in enumerate(relations):
        cr, dcount, mk, mr = stats[rid]
        rows.append(
            {
                "relation": rel,
                "child_rows": cr,
                "distinct_child_keys": dcount,
                "matched_keys": mk,
                "orphan_rows": cr - mr,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("child_rows", "distinct_child_keys", "matched_keys",
              "orphan_rows"):
        out[c] = out[c].astype("int64")
    return out.sort_values("relation").reset_index(drop=True)


def validate_orders_rules(sf_dir: str) -> pd.DataFrame:
    """Data-quality gate (expectation suite over orders): per rule, the
    violation count, row count, and rate — ONE streaming pass emitting
    O(rules x blocks) partial rows (stages/profile.check_rules), the
    ingest-validation step a production pipeline runs before the
    expensive stages. Rules chosen to actually fire on TPC-H-shaped
    data so the oracle is non-trivial."""
    from ...stages.profile import check_rules

    ds = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"],
    )
    rules = {
        "orderdate_before_1998": lambda t: pc.less(
            t["o_orderdate"], pa.scalar(_dt.datetime(1998, 1, 1))
        ),
        "status_is_final": lambda t: pc.equal(t["o_orderstatus"], "F"),
        "totalprice_under_200k": lambda t: pc.less(
            t["o_totalprice"], 200_000.0
        ),
        "orderkey_positive": lambda t: pc.greater(
            t["o_orderkey"], pa.scalar(0, pa.int64())
        ),
    }
    return check_rules(ds, rules)


def supplier_count_by_brand_type(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type) — a
    multi-key COUNT(DISTINCT) AFTER a join. The part dimension attaches
    by the size-routed broadcast (corpus side never shuffles below the
    threshold; hash join above); the distinct count is the
    hourly_active_users machinery generalized to a composite group:
    batch-local (brand, type, supp) Arrow dedup, ONE triple-hash bucket
    shuffle, per-bucket partials, finishing groupby over
    O(buckets x groups) rows."""
    from ray.data.aggregate import Sum

    from ...stages.joins import broadcast_join, hash_join
    from ...stages.relops import _WB

    items = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        part_tbl = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type"]
        )
        joined = broadcast_join(
            items, part_tbl, key="l_partkey", right_key="p_partkey"
        )
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type"])
        joined = hash_join(
            items, part_ds, key="l_partkey", right_key="p_partkey"
        )
    num_buckets = 64

    def _triples(t: pa.Table) -> pa.Table:
        trip = (
            pa.table(
                {
                    "p_brand": t["p_brand"],
                    "p_type": t["p_type"],
                    "supp": t["l_suppkey"],
                }
            )
            .group_by(["p_brand", "p_type", "supp"])
            .aggregate([])
        )
        import pandas.util as pdu

        h = (
            pdu.hash_array(
                np.asarray(trip["p_brand"].to_pylist(), dtype=object)
            )
            ^ pdu.hash_array(
                np.asarray(trip["p_type"].to_pylist(), dtype=object)
            )
            ^ (
                trip["supp"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
            )
        )
        return trip.append_column(
            _WB, pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def _partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table(
                {
                    "p_brand": g["p_brand"],
                    "p_type": g["p_type"],
                    "supp": g["supp"],
                }
            )
            .group_by(["p_brand", "p_type", "supp"])
            .aggregate([])
        )
        agg = distinct.group_by(["p_brand", "p_type"]).aggregate(
            [("supp", "count")]
        )
        return pa.table(
            {
                "p_brand": agg["p_brand"],
                "p_type": agg["p_type"],
                "partial": pc.cast(agg["supp_count"], pa.int64()),
            }
        )

    out = (
        joined.map_batches(_triples, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_partials, batch_format="pyarrow")
        .groupby(["p_brand", "p_type"])
        .aggregate(Sum("partial", alias_name="supplier_cnt"))
        .to_pandas()
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out.sort_values(["p_brand", "p_type"]).reset_index(drop=True)


def top_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Top-k per group with k>1 (the per-key head / QUALIFY ROW_NUMBER()
    <= k shape; reference analog: per-cat newest-first listing order,
    fetch_cat_detail_page.py): each customer's 3 most expensive orders.

    Scale design — relops.grouped_topk: every batch prunes to its LOCAL
    top-3 per customer before the single hash-bucket shuffle, so at most
    k rows per (batch, customer) move; the final merge is one vectorized
    lexsort + rank mask per bucket, never per-key Python. Prices compare
    in exact integer cents; ties break on o_orderkey so the kept set is
    deterministic on both sides.
    """
    from ...stages.relops import grouped_topk

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        cents = _to_scaled_int(t["o_totalprice"], 100)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": cents,
                "neg_cents": pc.multiply(cents, pa.scalar(-1, pa.int64())),
            }
        )

    out = grouped_topk(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="o_custkey",
        order_cols=["neg_cents", "o_orderkey"],
        k=3,
    ).to_pandas()
    return (
        out[["o_custkey", "o_orderkey", "price_cents"]]
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )


def custorder_count_distribution(sf_dir: str) -> pd.DataFrame:
    """Count-of-counts distribution (TPC-H Q13 shape): how many customers
    placed exactly N orders, INCLUDING the zero-order customers the left
    outer join preserves.

    Scale design: the corpus-sized side (orders) collapses to one
    combiner-reduced groupby count per customer BEFORE any join; the
    (custkey, n) table is size-routed — ``broadcast_join`` (left outer,
    one ray.put) while the customer dimension is <= _BROADCAST_SIDE_ROUTE_ROWS,
    the string-free int64 ``hash_join`` above it or when directory
    metadata is unreadable. The second groupby runs at the |distinct
    order counts| grain — metadata-sized.
    """
    from ray.data.aggregate import Count

    from ...stages.joins import broadcast_join, hash_join

    counts = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        counts_tbl = pa.Table.from_pandas(
            counts.to_pandas(), preserve_index=False
        )
        joined = broadcast_join(
            cust, counts_tbl, key="c_custkey", right_key="o_custkey",
            how="left_outer",
        )
    else:
        joined = hash_join(
            cust, counts, key="c_custkey", right_key="o_custkey",
            how="left_outer",
        )

    def _fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": pc.fill_null(
                    pc.cast(t["n"], pa.int64()), pa.scalar(0, pa.int64())
                )
            }
        )

    out = (
        joined.map_batches(_fill, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()
    )
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def rich_segment_summary(sf_dir: str) -> pd.DataFrame:
    """Scalar-aggregate broadcast into a filter (TPC-H Q22 family): per
    market segment, the customers whose balance strictly exceeds the
    mean POSITIVE balance. The mean never materializes as a float —
    the comparison is ``cents * n_pos > sum_pos_cents`` in exact int64,
    so Ray and DuckDB agree bit-for-bit (int64 headroom: cents x
    customer count must stay under 2**63 — ~10^12 customers at 10^6
    cents; assert-free by data contract).

    Scale shape: one combiner-reduced aggregate produces TWO scalars on
    the driver; they broadcast by closure capture into the filter pass
    (no shuffle, no join), then one groupby at the |segments| grain.
    """
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "cents": _to_scaled_int(t["c_acctbal"], 100),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    pos = prepped.map_batches(
        lambda t: t.filter(pc.greater(t["cents"], pa.scalar(0, pa.int64()))),
        batch_format="pyarrow",
    ).aggregate(Sum("cents", alias_name="sp"), Count(alias_name="np"))
    n_pos = int(pos["np"] or 0)
    if n_pos == 0:  # SQL: NULL comparison -> empty result
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype=object),
                "n_rich": pd.Series([], dtype="int64"),
                "total_cents": pd.Series([], dtype="int64"),
            }
        )
    sum_pos = int(pos["sp"])

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(
                pc.multiply(t["cents"], pa.scalar(n_pos, pa.int64())),
                pa.scalar(sum_pos, pa.int64()),
            )
        )

    out = (
        prepped.map_batches(_keep, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_rich"), Sum("cents", alias_name="total_cents")
        )
        .to_pandas()
    )
    out["n_rich"] = out["n_rich"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def pareto_parts(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier): parts no other part dominates,
    maximizing p_size while minimizing retail price (dominance = size >=
    AND price <= with at least one strict). The NOT EXISTS self-join the
    oracle runs is O(n^2); the engine never compares pairs.

    Scale design: ONE combiner-reduced groupby to per-size min price
    (O(|distinct sizes|) rows — p_size is a small-domain attribute; the
    driver suffix-min over it is metadata-sized), then the two frontier
    arrays broadcast by closure into a single vectorized filter pass
    (np.searchsorted per batch). A part survives iff it matches its
    size's min price AND every strictly larger size is strictly more
    expensive. Zero corpus shuffles, zero pair comparisons.
    """
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
                "price_cents": _to_scaled_int(t["p_retailprice"], 100),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    per_size = (
        prepped.groupby("p_size")
        .aggregate(Min("price_cents", alias_name="mn"))
        .to_pandas()
        .sort_values("p_size")
    )
    sizes = per_size["p_size"].to_numpy(dtype=np.int64)
    mn_eq = per_size["mn"].to_numpy(dtype=np.int64)
    # min price over all STRICTLY larger sizes (suffix min, exclusive)
    mn_gt = np.empty(len(sizes), dtype=np.int64)
    running = np.iinfo(np.int64).max
    for i in range(len(sizes) - 1, -1, -1):
        mn_gt[i] = running
        running = min(running, int(mn_eq[i]))

    def _keep(t: pa.Table) -> pa.Table:
        sz = np.asarray(t["p_size"].to_numpy(zero_copy_only=False))
        pr = np.asarray(t["price_cents"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(sizes, sz)
        keep = (pr == mn_eq[idx]) & (pr < mn_gt[idx])
        return t.filter(pa.array(keep))

    out = prepped.map_batches(_keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def nation_supplier_names(sf_dir: str) -> pd.DataFrame:
    """Grouped STRING_AGG / collect-list aggregate
    (relops.grouped_string_agg): per nation, the sorted comma-joined
    supplier roster. The 25-row nation dimension broadcasts once
    (joins.broadcast_join); the aggregate itself is the inverted-index
    assembly pattern — one bucket shuffle, one list-offset binary_join
    per bucket, no per-key Python."""
    from ...stages.joins import broadcast_join
    from ...stages.relops import grouped_string_agg

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    named = broadcast_join(
        supp, nation_tbl, key="s_nationkey", right_key="n_nationkey"
    )
    out = grouped_string_agg(
        named,
        group_col="n_name",
        value_col="s_name",
        sep=",",
        out_col="suppliers",
        count_col="n_supp",
    ).to_pandas()
    return out.sort_values("n_name").reset_index(drop=True)


def urgent_heavy_orders(sf_dir: str) -> pd.DataFrame:
    """EXISTS-subquery aggregate (TPC-H Q4 shape): orders from 1996Q1
    having at least one line item with quantity > 45, counted per
    priority. The qualifying-orderkey set stays distributed — a
    left-semi hash join (is_in mask per partition), never a driver set;
    the priority rollup is one combiner-reduced groupby."""
    from ray.data.aggregate import Count

    from ...stages.joins import hash_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    heavy = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.filter(
            pc.greater(t["l_quantity"], pa.scalar(45.0))
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    kept = hash_join(
        orders, heavy, key="o_orderkey", right_key="l_orderkey",
        how="left_semi",
    )
    out = (
        kept.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def unpivot_part_metrics(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT (wide -> long; the complement of pivot_priority_status):
    each part's (size, price_cents) pair becomes two (metric, value)
    rows. Pure batch-local reshape — every map_batches task emits its
    own long block via one concat of constant-tagged projections; zero
    shuffle, zero per-row Python."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _long(t: pa.Table) -> pa.Table:
        keys = t["p_partkey"]
        size = pc.cast(t["p_size"], pa.int64())
        cents = _to_scaled_int(t["p_retailprice"], 100)
        n = t.num_rows
        return pa.table(
            {
                "p_partkey": pa.concat_arrays(
                    [keys.combine_chunks(), keys.combine_chunks()]
                ),
                "metric": pa.concat_arrays(
                    [
                        pa.array(["size"] * n, pa.string()),
                        pa.array(["price_cents"] * n, pa.string()),
                    ]
                ),
                "value": pa.concat_arrays(
                    [size.combine_chunks(), cents.combine_chunks()]
                ),
            }
        )

    out = ds.map_batches(_long, batch_format="pyarrow").to_pandas()
    return out.sort_values(["p_partkey", "metric"]).reset_index(drop=True)


def top_unshipped_orders(sf_dir: str) -> pd.DataFrame:
    """Three-table join pipeline with aggregate + global top-k (TPC-H Q3
    shape): BUILDING-segment customers' orders placed before the cutoff,
    revenue of their line items shipped after it, top 10 by revenue.

    Scale plan, one streaming pass per table:
    - the segment-filtered customer KEY SET attaches to orders via a
      size-routed semi join — broadcast ``is_in`` while the customer
      dimension is <= _BROADCAST_SIDE_ROUTE_ROWS, distributed left-semi
      hash join above (no driver set at scale);
    - orders x lineitem is the big-big distributed ``hash_join`` on
      l_orderkey, both sides pre-filtered AND pre-projected at the read;
    - revenue is a combiner-reduced groupby in exact dmc units (x10^4,
      the q1 policy);
    - the global top-10 never sorts the corpus: each batch prunes to its
      local 10 by (revenue desc, orderkey), the driver merges O(10 x
      blocks) survivors.
    """
    from ray.data.aggregate import Sum

    from ...stages.joins import hash_join

    cutoff = _dt.datetime(1996, 6, 30)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(
            pc.equal(t["c_mktsegment"], "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        keys = pa.array(
            sorted(cust.to_pandas()["c_custkey"]), pa.int64()
        )
        orders = orders.map_batches(
            lambda t: t.filter(pc.is_in(t["o_custkey"], value_set=keys)),
            batch_format="pyarrow",
        )
    else:
        orders = hash_join(
            orders, cust, key="o_custkey", right_key="c_custkey",
            how="left_semi",
        )

    def _prep_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    # BUILDING-segment + date-filtered orders are ~1/5 of the table: above
    # the route threshold a bloom prefilter drops most items rows before
    # the big-big shuffle (below it the build barrier dominates)
    joined = hash_join(
        items,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        key="l_orderkey",
        right_key="o_orderkey",
        bloom_filter_left=(
            _fact_rows(sf_dir, "lineitem") > _base._BLOOM_PREFILTER_ROUTE_ROWS
        ),
    )
    rev = joined.groupby(["l_orderkey", "o_orderdate"]).aggregate(
        Sum("rev_dmc", alias_name="revenue_dmc")
    )

    def _local_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= 10:
            return t
        r = np.asarray(t["revenue_dmc"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False))
        order = np.lexsort((k, -r))[:10]
        return t.take(pa.array(order, pa.int64()))

    out = rev.map_batches(_local_top, batch_format="pyarrow").to_pandas()
    out["revenue_dmc"] = out["revenue_dmc"].astype("int64")
    out = out.sort_values(
        ["revenue_dmc", "l_orderkey"], ascending=[False, True]
    ).head(10)
    return out[["l_orderkey", "revenue_dmc", "o_orderdate"]].reset_index(
        drop=True
    )


def order_price_mad(sf_dir: str) -> pd.DataFrame:
    """Robust statistics (median absolute deviation) as a TWO-PASS exact
    composition of the histogram-combine quantile machinery: pass 1
    finds the exact price median, pass 2 the exact median of absolute
    deviations from it.

    All internal state is integer: the median is carried as 2x its
    value (lo+hi of the middle pair — no fractional midpoint exists),
    deviations as |2*cents - med2|, and the driver only ever sees the
    O(distinct prices) merged histograms, never the corpus. The two
    emitted doubles are power-of-two divisions of exact int64s, so
    DuckDB's MEDIAN() midpoints match bit-for-bit (the
    median_price_per_nation argument, applied twice).

    Driver-state bound: O(distinct cent values) per pass — bounded by
    the business price range (~10^7 rows worst case), not by corpus
    size. For a genuinely unbounded-domain signal swap each pass for a
    two-level refine (coarse bucket histogram -> exact scan of the one
    bucket holding the target rank); the median stays exact."""

    def _hist_median2(ds_vals, col: str) -> tuple[int, int]:
        """(2 x exact median, n) from a histogram-combine pass."""
        hist = (
            ds_vals.groupby(col)
            .sum("cnt")
            .to_pandas()
            .sort_values(col)
        )
        values = hist[col].to_numpy(dtype=np.int64)
        counts = hist["sum(cnt)"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1]) if len(cum) else 0
        if n == 0:
            return 0, 0
        lo = values[int(np.searchsorted(cum, (n - 1) // 2 + 1))]
        hi = values[int(np.searchsorted(cum, n // 2 + 1))]
        return int(lo) + int(hi), n

    def _partial(col_in: str, col_out: str, transform=None):
        def _f(t: pa.Table) -> pa.Table:
            arr = t[col_in].to_numpy(zero_copy_only=False).astype(np.int64)
            if transform is not None:
                arr = transform(arr)
            vals, cnts = np.unique(arr, return_counts=True)
            return pa.table(
                {
                    col_out: pa.array(vals, pa.int64()),
                    "cnt": pa.array(cnts.astype(np.int64)),
                }
            )

        return _f

    cents = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    )
    med2, n = _hist_median2(
        cents.map_batches(
            _partial("cents", "cents"), batch_format="pyarrow", batch_size=8192
        ),
        "cents",
    )
    if n == 0:
        return pd.DataFrame(
            {
                "median_cents": pd.Series([], dtype="float64"),
                "mad_cents": pd.Series([], dtype="float64"),
                "n_orders": pd.Series([], dtype="int64"),
            }
        )
    mad2x2, _ = _hist_median2(
        cents.map_batches(
            _partial("cents", "dev2", lambda a: np.abs(2 * a - med2)),
            batch_format="pyarrow",
            batch_size=8192,
        ),
        "dev2",
    )
    return pd.DataFrame(
        {
            "median_cents": [med2 / 2.0],
            "mad_cents": [mad2x2 / 4.0],
            "n_orders": [n],
        }
    )


def orders_by_dow(sf_dir: str) -> pd.DataFrame:
    """Date-part extraction aggregate (§2.8 date-function family beyond
    truncation): order count and exact cent volume per day-of-week.
    ``pc.day_of_week(count_from_zero=True, week_start=7)`` reproduces
    DuckDB's Sunday=0 ``dayofweek`` convention exactly; one
    combiner-reduced groupby at the 7-row grain, zero driver state."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dow": pc.cast(
                    pc.day_of_week(
                        t["o_orderdate"], count_from_zero=True, week_start=7
                    ),
                    pa.int64(),
                ),
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values("dow").reset_index(drop=True)


def local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """Five-table join pipeline (TPC-H Q5 shape): revenue per ASIA
    nation from 1995-1996 orders where the customer and the line item's
    supplier share the nation.

    Scale plan — one streaming pass per fact table, dims broadcast:
    - region->nation resolves driver-side (both are O(10^1) catalogs);
    - the customer (custkey -> nationkey) map is pre-filtered to ASIA
      and size-routed: broadcast lookup <= _BROADCAST_SIDE_ROUTE_ROWS,
      distributed hash_join above (no driver set at scale);
    - supplier (suppkey -> nationkey) is the classic broadcast dim;
    - orders x lineitem is the single big-big hash_join on orderkey,
      both sides pre-filtered AND pre-projected at the read;
    - the c_nation == s_nation predicate is a vectorized batch filter
      AFTER the join, and the 25-row-grain rollup is combiner-reduced.
    """
    from ray.data.aggregate import Count, Sum

    from ...stages.joins import broadcast_join, hash_join

    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1997, 1, 1)
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia_keys = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    asia_nation = nation.filter(
        pc.is_in(nation["n_regionkey"], value_set=asia_keys.combine_chunks())
    )
    asia_nationkeys = pc.cast(asia_nation["n_nationkey"], pa.int64()).combine_chunks()

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    # customer dim, pre-filtered to ASIA nations: size-routed attach
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust = cust.filter(
            pc.is_in(pc.cast(cust["c_nationkey"], pa.int64()), value_set=asia_nationkeys)
        )
        cust = pa.table(
            {
                "c_custkey": pc.cast(cust["c_custkey"], pa.int64()),
                "cust_nat": pc.cast(cust["c_nationkey"], pa.int64()),
            }
        )
        orders = broadcast_join(orders, cust, key="o_custkey", right_key="c_custkey")
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                    "cust_nat": pc.cast(t["c_nationkey"], pa.int64()),
                }
            ).filter(
                pc.is_in(
                    pc.cast(t["c_nationkey"], pa.int64()), value_set=asia_nationkeys
                )
            ),
            batch_format="pyarrow",
        )
        orders = hash_join(orders, cust_ds, key="o_custkey", right_key="c_custkey")

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp = pa.table(
        {
            "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
            "supp_nat": pc.cast(supp["s_nationkey"], pa.int64()),
        }
    )
    supp = supp.filter(pc.is_in(supp["supp_nat"], value_set=asia_nationkeys))

    def _prep_items(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(_prep_items, batch_format="pyarrow")
    items = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")
    # the orders side is doubly selective (ASIA customers x date window):
    # above the route threshold, a bloom of its orderkeys prunes
    # non-matching items BEFORE the all-to-all (bit-identical — false
    # positives die at the stitch); below it the build barrier costs
    # more than the small shuffle it would save
    joined = hash_join(
        items, orders, key="l_orderkey", right_key="o_orderkey",
        bloom_filter_left=(
            _fact_rows(sf_dir, "lineitem") > _base._BLOOM_PREFILTER_ROUTE_ROWS
        ),
    )
    joined = joined.map_batches(
        lambda t: t.filter(pc.equal(t["cust_nat"], t["supp_nat"])),
        batch_format="pyarrow",
    )
    out = (
        joined.groupby("supp_nat")
        .aggregate(
            Sum("rev_dmc", alias_name="revenue_dmc"),
            Count(alias_name="n_items"),
        )
        .to_pandas()
    )
    names = {
        int(k): v
        for k, v in zip(
            asia_nation["n_nationkey"].to_pylist(), asia_nation["n_name"].to_pylist()
        )
    }
    out["n_name"] = out["supp_nat"].map(names)
    out["revenue_dmc"] = out["revenue_dmc"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out = out[["n_name", "revenue_dmc", "n_items"]]
    return out.sort_values("n_name").reset_index(drop=True)


def top_returning_customers(sf_dir: str) -> pd.DataFrame:
    """Returned-revenue-per-customer, top 20 (TPC-H Q10 shape):
    R-flagged line-item revenue of 1996H1 orders grouped by customer.

    Scale plan: both fact tables are pre-filtered and pre-projected at
    the read; orders x lineitem is a distributed hash_join; the
    per-customer rollup is combiner-reduced; and the global top-20
    never sorts the corpus — each batch prunes to its local 20 by
    (revenue desc, custkey), the driver merges O(20 x blocks)
    survivors and only then attaches the 20-row name/nation dressing
    via an is_in-filtered dimension read."""
    from ray.data.aggregate import Sum

    from ...stages.joins import hash_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 7, 1)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    def _prep_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_dmc": _to_scaled_int(rev, 10_000)}
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    joined = hash_join(items, orders, key="l_orderkey", right_key="o_orderkey")
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_dmc", alias_name="revenue_dmc")
    )

    def _local_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= 20:
            return t
        r = np.asarray(t["revenue_dmc"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False))
        order = np.lexsort((k, -r))[:20]
        return t.take(pa.array(order, pa.int64()))

    top = per_cust.map_batches(_local_top, batch_format="pyarrow").to_pandas()
    top["revenue_dmc"] = top["revenue_dmc"].astype("int64")
    top = top.sort_values(
        ["revenue_dmc", "o_custkey"], ascending=[False, True]
    ).head(20)
    keys = pa.array(sorted(top["o_custkey"].astype("int64")), pa.int64())
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(pc.cast(cust["c_custkey"], pa.int64()), value_set=keys)
    ).to_pandas()
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"o_custkey": "c_custkey_out"})
    out["c_custkey"] = out["c_custkey_out"].astype("int64")
    out = out[["c_custkey", "c_name", "n_name", "revenue_dmc"]]
    return out.sort_values(
        ["revenue_dmc", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)


def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Conditional-aggregate ratio over a dimension attach (TPC-H Q14
    shape): the share of 1996 line-item revenue earned by PROMO-type
    parts. The part dimension collapses to a PROMO key set, size-routed:
    <= _BROADCAST_SIDE_ROUTE_ROWS parts it broadcasts as one is_in
    value set (zero shuffle); above, a left-semi-tagged hash_join
    splits the stream. Both revenue sums are exact dmc integers; the
    share is one double division of two int64s, bit-identical on both
    sides."""
    from ray.data.aggregate import Sum

    from ...stages.joins import hash_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def _prep_items(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        )
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(_prep_items, batch_format="pyarrow")

    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        promo_keys = pc.cast(
            part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"], pa.int64()
        ).combine_chunks()
        tagged = items.map_batches(
            lambda t: t.append_column(
                "promo_dmc",
                pc.if_else(
                    pc.is_in(t["l_partkey"], value_set=promo_keys),
                    t["rev_dmc"],
                    pa.scalar(0, pa.int64()),
                ),
            ),
            batch_format="pyarrow",
        )
    else:
        promo = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": pc.cast(
                        t.filter(pc.equal(t["p_type"], "PROMO"))["p_partkey"],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        promo_items = hash_join(
            items, promo, key="l_partkey", right_key="p_partkey", how="left_semi"
        ).map_batches(
            lambda t: t.append_column("promo_dmc", t["rev_dmc"]),
            batch_format="pyarrow",
        )
        rest = hash_join(
            items, promo, key="l_partkey", right_key="p_partkey", how="left_anti"
        ).map_batches(
            lambda t: t.append_column(
                "promo_dmc", pa.array([0] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
        tagged = promo_items.union(rest)

    agg = tagged.aggregate(
        Sum("promo_dmc", alias_name="promo_rev_dmc"),
        Sum("rev_dmc", alias_name="total_rev_dmc"),
    )
    promo_rev = int(agg["promo_rev_dmc"])
    total_rev = int(agg["total_rev_dmc"])
    return pd.DataFrame(
        {
            "promo_rev_dmc": [promo_rev],
            "total_rev_dmc": [total_rev],
            "promo_share_pct": [100.0 * promo_rev / total_rev],
        }
    )


def top_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Argmax-by-aggregate (TPC-H Q15 shape): the supplier(s) with the
    maximum 1996Q1 line-item revenue. One combiner-reduced groupby to
    the per-supplier grain, a streaming Ray max() over it (never
    driver-materialized), one vectorized equality filter, and an
    is_in-filtered dimension read for the O(winners) name attach —
    ties all surface, exactly like the oracle's = (SELECT MAX...)."""
    from ray.data.aggregate import Sum

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        )
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    per_supp = (
        _read(
            sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(_prep, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_dmc", alias_name="total_revenue_dmc"))
    )
    best = per_supp.max("total_revenue_dmc")
    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["total_revenue_dmc"], pa.scalar(int(best)))),
        batch_format="pyarrow",
    ).to_pandas()
    winners["total_revenue_dmc"] = winners["total_revenue_dmc"].astype("int64")
    keys = pa.array(sorted(winners["l_suppkey"].astype("int64")), pa.int64())
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    supp = supp.filter(
        pc.is_in(pc.cast(supp["s_suppkey"], pa.int64()), value_set=keys)
    ).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out = out[["s_suppkey", "s_name", "total_revenue_dmc"]]
    return out.sort_values("s_suppkey").reset_index(drop=True)


def large_volume_orders(sf_dir: str) -> pd.DataFrame:
    """HAVING-gated aggregate join-back (TPC-H Q18 shape): orders whose
    total line-item quantity exceeds 300 units, with their customer.
    The per-order quantity rollup is combined per batch (Arrow group_by
    BEFORE the Ray shuffle) then combiner-reduced and gated; the gate
    output is O(qualifying orders) and size-routed — while it is <=
    _BROADCAST_SIDE_ROUTE_ROWS the orders attach is a zero-shuffle
    broadcast_join of the qualifying table, above it a distributed
    inner hash_join on orderkey; the customer name attach is
    size-routed the same way. All quantities are exact centi-units."""
    from ray.data.aggregate import Sum

    from ...stages.joins import broadcast_join, hash_join

    def _precombine(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty_c": _to_scaled_int(t["l_quantity"], 100),
            }
        )
        gb = t.group_by("l_orderkey").aggregate([("qty_c", "sum")])
        # Arrow group_by emits keys LAST — rename by name, not position
        return gb.rename_columns(
            ["qty_c" if n == "qty_c_sum" else n for n in gb.column_names]
        )

    qual = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(_precombine, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty_c", alias_name="sum_qty_c"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["sum_qty_c"], pa.scalar(30_000))),
            batch_format="pyarrow",
        )
        .materialize()
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "totalprice_c": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    n_qual = qual.count()
    if n_qual <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        if n_qual:
            qdf = qual.to_pandas()
            qual_t = pa.table(
                {
                    "l_orderkey": pa.array(
                        qdf["l_orderkey"].astype("int64"), pa.int64()
                    ),
                    "sum_qty_c": pa.array(
                        qdf["sum_qty_c"].astype("int64"), pa.int64()
                    ),
                }
            )
        else:  # 0-row Ray->pandas drops columns; build the typed empty
            qual_t = pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "sum_qty_c": pa.array([], pa.int64()),
                }
            )
        joined = broadcast_join(
            orders, qual_t, key="o_orderkey", right_key="l_orderkey"
        ).map_batches(
            lambda t: t.append_column(
                "l_orderkey", pc.cast(t["o_orderkey"], pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = hash_join(qual, orders, key="l_orderkey", right_key="o_orderkey")
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        cust = cust.set_column(
            0, "c_custkey", pc.cast(cust["c_custkey"], pa.int64())
        )
        named = broadcast_join(joined, cust, key="o_custkey", right_key="c_custkey")
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("c_custkey"),
                "c_custkey",
                pc.cast(t["c_custkey"], pa.int64()),
            ),
            batch_format="pyarrow",
        )
        named = hash_join(joined, cust_ds, key="o_custkey", right_key="c_custkey")
    out = named.to_pandas()
    out["c_custkey"] = out["o_custkey"].astype("int64")
    out["o_orderkey"] = out["l_orderkey"].astype("int64")
    out["sum_qty_c"] = out["sum_qty_c"].astype("int64")
    out["totalprice_c"] = out["totalprice_c"].astype("int64")
    out = out[
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate", "totalprice_c", "sum_qty_c"]
    ]
    return out.sort_values("o_orderkey").reset_index(drop=True)


def order_price_equiwidth_hist(sf_dir: str) -> pd.DataFrame:
    """Equal-WIDTH histogram of order value (32 bins spanning the exact
    observed [min, max] cents range) — the data-profiling complement of
    the group-by-value histogram (part_size_histogram) and the
    quantile (equal-depth) family: two passes, a Min/Max aggregate then
    a per-batch bin partial + one combiner-reduced groupby. All bin
    math is integer (``(cents - lo) * 32 // (hi - lo + 1)``), so the
    SQL oracle reproduces every boundary bit-for-bit."""
    from ray.data.aggregate import Max, Min, Sum

    NB = 32
    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    ).materialize()
    mm = ds.aggregate(Min("cents", alias_name="lo"), Max("cents", alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    span = hi - lo + 1

    def _bins(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cents"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b, n = np.unique((c - lo) * NB // span, return_counts=True)
        return pa.table(
            {"bin": pa.array(b.astype(np.int64)), "n": pa.array(n.astype(np.int64))}
        )

    out = (
        ds.map_batches(_bins, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    out["bin_lo_cents"] = lo + out["bin"].astype("int64") * span // NB
    for c in ("bin", "n_orders", "bin_lo_cents"):
        out[c] = out[c].astype("int64")
    return (
        out[["bin", "bin_lo_cents", "n_orders"]]
        .sort_values("bin")
        .reset_index(drop=True)
    )


def nation_trade_matrix(sf_dir: str) -> pd.DataFrame:
    """International trade volume (TPC-H Q7 generalized): revenue per
    (supplier nation, customer nation, ship year) for every CROSS-nation
    pair.

    Scale plan (r4 rework): the orders -> customer-nation map is the
    SMALL side. Below the size route it is built driver-side in one
    vectorized searchsorted pass (O(orders) int64s, ~16 bytes/row) and
    broadcast, so the lineitem corpus streams ONCE with ZERO shuffles —
    supplier and order attaches are broadcast lookups and every batch
    pre-aggregates to the O(nations^2 x years) grain before one tiny
    groupby. Above the route (orders or customer > threshold) the
    distributed plan runs: size-routed customer attach, big-big
    hash_join on orderkey, then the SAME batch partial aggregation so
    the final all-to-all moves O(grain x blocks) rows, not the joined
    corpus."""
    from ray.data.aggregate import Sum

    from ...stages.joins import broadcast_join, hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    names = {
        int(k): v
        for k, v in zip(
            nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()
        )
    }

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp = pa.table(
        {
            "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
            "supp_nat": pc.cast(supp["s_nationkey"], pa.int64()),
        }
    )

    def _prep_items(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    def _partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["supp_nat"], t["cust_nat"]))
        t = pa.table(
            {
                "supp_nat": pc.cast(t["supp_nat"], pa.int64()),
                "cust_nat": pc.cast(t["cust_nat"], pa.int64()),
                "l_year": pc.cast(t["l_year"], pa.int64()),
                "rev_dmc": pc.cast(t["rev_dmc"], pa.int64()),
            }
        )
        g = t.group_by(["supp_nat", "cust_nat", "l_year"]).aggregate(
            [("rev_dmc", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "supp_nat": g["supp_nat"],
                "cust_nat": g["cust_nat"],
                "l_year": g["l_year"],
                "rev": pc.cast(g["rev_dmc_sum"], pa.int64()),
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    items = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")

    n_cust = _fact_rows(sf_dir, "customer")
    n_ord = _fact_rows(sf_dir, "orders")

    if max(n_cust, n_ord) <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        ckey = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cnat = np.asarray(cust["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ckey, kind="stable")
        ckey, cnat = ckey[order], cnat[order]
        otbl = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        okey = np.asarray(otbl["o_orderkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ocust = np.asarray(otbl["o_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        orders_map = pa.table(
            {
                "o_orderkey": pa.array(okey),
                "cust_nat": pa.array(cnat[np.searchsorted(ckey, ocust)]),
            }
        )
        joined = broadcast_join(
            items, orders_map, key="l_orderkey", right_key="o_orderkey"
        )
    else:
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
            cust = pq.read_table(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
            )
            cust = pa.table(
                {
                    "c_custkey": pc.cast(cust["c_custkey"], pa.int64()),
                    "cust_nat": pc.cast(cust["c_nationkey"], pa.int64()),
                }
            )
            orders = broadcast_join(
                orders, cust, key="o_custkey", right_key="c_custkey"
            )
        else:
            cust_ds = _read(
                sf_dir, "customer", ["c_custkey", "c_nationkey"]
            ).map_batches(
                lambda t: pa.table(
                    {
                        "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                        "cust_nat": pc.cast(t["c_nationkey"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            orders = hash_join(orders, cust_ds, key="o_custkey", right_key="c_custkey")
        orders = orders.select_columns(["o_orderkey", "cust_nat"])
        joined = hash_join(items, orders, key="l_orderkey", right_key="o_orderkey")

    out = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby(["supp_nat", "cust_nat", "l_year"])
        .aggregate(
            Sum("rev", alias_name="revenue_dmc"),
            Sum("n", alias_name="n_items"),
        )
        .to_pandas()
    )
    out["supp_nation"] = out["supp_nat"].map(names)
    out["cust_nation"] = out["cust_nat"].map(names)
    out["revenue_dmc"] = out["revenue_dmc"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out = out[["supp_nation", "cust_nation", "l_year", "revenue_dmc", "n_items"]]
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)
