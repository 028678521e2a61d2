"""Graph queries over the customer/order co-occurrence graphs.

Split from the former single-file queries module (VERDICT r4 #8);
names resolve cross-family via the package cross-link in __init__.
"""

from . import _base
from ._base import *  # noqa: F401,F403 — np/pa/pc/pd/ray + stage imports


def pagerank_customers(sf_dir: str) -> pd.DataFrame:
    """Integer PageRank (stages/graph.pagerank_int), 5 rounds, over a
    deterministic order-derived graph: node set = customers, edges =
    DISTINCT (o_custkey -> 1 + o_orderkey % max(c_custkey)), self-loops
    dropped. All-integer message passing makes the ranks bit-reproducible
    and oracle-checkable by an unrolled SQL power iteration."""
    from ray.data.aggregate import Count, Max

    from ...stages.graph import pagerank_int

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])
    nodes = cust.map_batches(
        lambda t: pa.table({"node": t["c_custkey"]}), batch_format="pyarrow"
    )

    def _edges(t: pa.Table) -> pa.Table:
        src = pc.cast(t["o_custkey"], pa.int64())
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = pa.array((okey % maxc) + 1, type=pa.int64())
        tbl = pa.table({"src": src, "dst": dst})
        return tbl.filter(pc.not_equal(tbl["src"], tbl["dst"]))

    # no pre-dedup shuffle here: pagerank_int's src-keyed degree pass
    # dedups (src, dst) locally inside each co-located group
    edges = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    )
    out = pagerank_int(nodes, edges, iterations=5).to_pandas()
    out["pr_scaled"] = out["pr_scaled"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def triangle_count_customers(sf_dir: str) -> pd.DataFrame:
    """Multi-way distributed self-join: triangle count of the undirected
    order-derived customer graph (same derivation as pagerank_customers).
    Plan: canonicalize edges (a < b) + distinct (one shuffle), wedge join
    E⋈E on the shared LOW endpoint (each triangle a<b<c is generated
    exactly once as the wedge (a,b)-(a,c)), then a LEFT SEMI hash join of
    the wedge's closing pair (b,c) against the edge set on a composite
    int64 key, and a scalar count. Wedge volume is sum-of-squares of
    "higher-neighbor" degrees — the canonical a<b orientation is the
    standard bound that keeps hub fan-out quadratic only in FORWARD
    degree. Composite key b*(M+1)+c needs M < ~3e9 (int64); shard the
    key at larger node-id domains."""
    from ray.data.aggregate import Count, Max

    from ...stages.graph import triangle_count

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        src = np.asarray(pc.cast(t["o_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False))
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = (okey % maxc) + 1
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    edges = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
    )
    n = triangle_count(edges, max_node_id=maxc)
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


def connected_components_customers(sf_dir: str) -> pd.DataFrame:
    """Connected components as a first-class graph query: the dedup
    engine's min-label + pointer-jumping kernel
    (stages/dedup.components_label_propagation — O(log diameter) rounds
    of joins + groupbys, no node→label dict ever leaves the cluster)
    over a SPARSE deterministic order-derived graph (only orders with
    o_orderkey % 37 == 0 contribute an edge, so the component structure
    is non-trivial: many small components + isolated nodes). Isolated
    customers keep their own id via a left-outer attach.

    Size-routed on the EDGE count (the O(entities) payload here, never
    the node set): a small edge list union-finds on the driver and
    broadcasts the node→component map — every distributed round costs
    several fixed-latency stages, pure overhead on a 400-edge graph;
    big graphs take the distributed kernel, pinned by a route-forcing
    test. Oracle: DuckDB recursive transitive closure + MIN over
    reachable ids."""
    from ray.data.aggregate import Max

    from ...stages.dedup import components_label_propagation
    from ...stages.joins import broadcast_join, hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        keep = (okey % 37) == 0
        src = np.asarray(
            t["o_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )[keep]
        dst = (okey[keep] % maxc) + 1
        m = src != dst
        return pa.table(
            {"a": pa.array(src[m]), "b": pa.array(dst[m], type=pa.int64())}
        )

    pairs = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    ).materialize()  # O(edges), consumed by count + one compute path
    nodes = cust.map_batches(
        lambda t: pa.table({"node": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    return _attach_components(nodes, pairs)


def bfs_distances_customers(sf_dir: str) -> pd.DataFrame:
    """BFS shortest-path levels (iterative graph class, the frontier
    shape the crawl engine runs): minimum hop count <= 10 from the
    lowest customer key over a sparse deterministic order-derived
    directed graph (only o_orderkey % 7 == 0 contributes an edge, so
    the level structure spans all ten hops).

    Size-routed on EDGE count exactly like connected components: small
    edge lists BFS on the driver (np.isin per level — distributed
    rounds are pure fixed latency there); big graphs run
    :func:`..stages.graph.bfs_levels` (per hop: edge-corpus semi-join
    against the frontier, dedup groupby, anti-join vs visited — the
    frontier and visited sets never leave the cluster), pinned by a
    kernel parity test (test_bfs_distributed_kernel_parity — forcing
    the full 10-hop query distributed is ~20 shuffles of pure fixed
    latency at test scale). Oracle: bounded recursive CTE + MIN."""
    from ray.data.aggregate import Max, Min

    from ...stages.graph import bfs_levels, bfs_levels_driver

    cust = _read(sf_dir, "customer", ["c_custkey"])
    agg = cust.aggregate(
        Max("c_custkey", alias_name="mx"), Min("c_custkey", alias_name="mn")
    )
    maxc, source = int(agg["mx"]), int(agg["mn"])

    def _edges(t: pa.Table) -> pa.Table:
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        keep = (okey % 7) == 0
        src = np.asarray(
            t["o_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )[keep]
        dst = (okey[keep] % maxc) + 1
        m = src != dst
        return pa.table(
            {"src": pa.array(src[m]), "dst": pa.array(dst[m], type=pa.int64())}
        )

    edges = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    ).materialize()  # O(edges); consumed by count + one BFS path
    if edges.count() <= _base._COMPONENTS_DRIVER_ROUTE_EDGES:
        ep = edges.to_pandas()
        if len(ep) == 0:
            return pd.DataFrame(
                {"node": pd.Series([source], dtype="int64"),
                 "dist": pd.Series([0], dtype="int64")}
            )
        out = bfs_levels_driver(
            ep["src"].to_numpy(dtype="int64"),
            ep["dst"].to_numpy(dtype="int64"),
            source,
            max_hops=10,
        )
    else:
        out = bfs_levels(edges, source, max_hops=10)
    return out


def event_type_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-occurrence matrix: for every unordered pair of
    event types, how many users performed BOTH — the association-rule /
    co-engagement primitive (baskets = users, items = event types).

    Scale plan: batch-local (user, type) dedup, ONE user-hash bucket
    shuffle (a user's whole basket lands in one bucket, so bucket
    partials are disjoint user counts). Per bucket the basket is a
    BITMASK: one lexsort + np.bitwise_or.reduceat folds each user's
    types into a uint64, and each type pair is one vectorized
    mask-test over users — O(users x T^2) bit ops, no pair-row
    explosion ever materializes. T > 63 distinct types raises loudly
    (this operator targets low-cardinality taxonomies; shard the mask
    past that). Final groupby sums O(buckets x T^2) partial rows."""
    from ray.data.aggregate import Sum

    from ...stages.relops import _WB

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    num_buckets = 64

    def _pairs(t: pa.Table) -> pa.Table:
        for c in ("user_id", "event_type"):
            if t[c].null_count:
                raise ValueError(f"event_type_cooccurrence: nulls in {c!r}")
        pairs = (
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]})
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        u = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _cooccur(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"u": g["user_id"], "ty": g["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        ty = distinct["ty"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        enc = ty.dictionary_encode()
        names = enc.dictionary.to_pylist()
        if len(names) > 63:
            raise ValueError(
                f"event_type_cooccurrence: {len(names)} distinct types in "
                "one bucket exceeds the 63-bit basket mask — shard the mask "
                "or switch to pair expansion for high-cardinality taxonomies"
            )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = distinct["u"].to_numpy(zero_copy_only=False)
        order = np.argsort(users, kind="stable")
        u_s, c_s = users[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], u_s[1:] != u_s[:-1]])
        )
        masks = np.bitwise_or.reduceat(
            np.uint64(1) << c_s.astype(np.uint64), starts
        )
        rows_a, rows_b, rows_n = [], [], []
        # T^2/2 vectorized mask tests (T <= 63); never a pair-row blowup
        for i in range(len(names)):
            bit_i = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(names)):
                n = int(
                    (bit_i & ((masks >> np.uint64(j)) & np.uint64(1))).sum()
                )
                if n:
                    a, b = sorted((names[i], names[j]))
                    rows_a.append(a)
                    rows_b.append(b)
                    rows_n.append(n)
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    out = (
        ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_cooccur, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def supplier_copart_pairs(sf_dir: str) -> pd.DataFrame:
    """Bipartite projection: supplier pairs weighted by the number of
    distinct parts both have shipped (lineitem as the part-supplier
    incidence list) — the co-supply / co-purchase graph builder. Pairs
    sharing >= 2 parts survive.

    Scale plan: batch-local (part, supplier) dedup, ONE part-hash
    bucket shuffle; per bucket a second dedup, one lexsort by (part,
    supplier) and the triangle kernel's run-length forward-pair
    expansion (element at within-run position t pairs with the L-1-t
    after it — all np.repeat/arange, no per-part Python). Pairs
    collapse to a composite int64 key (a*2^32+b, suppkey < 2^31
    asserted) and pre-aggregate per bucket, so the final exchange
    carries O(qualifying pairs x buckets) rows, never the raw pair
    stream. Hot parts (huge supplier lists) are the documented skew
    risk: expansion is quadratic in ONE part's supplier count."""
    from ray.data.aggregate import Sum

    from ...stages.relops import _WB

    items = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    num_buckets = 64

    def _dedup(t: pa.Table) -> pa.Table:
        pairs = (
            pa.table(
                {
                    "p": pc.cast(t["l_partkey"], pa.int64()),
                    "s": pc.cast(t["l_suppkey"], pa.int64()),
                }
            )
            .group_by(["p", "s"])
            .aggregate([])
        )
        p = pairs["p"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((p * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _expand(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"p": g["p"], "s": g["s"]}).group_by(["p", "s"]).aggregate([])
        )
        p = distinct["p"].to_numpy(zero_copy_only=False)
        s = distinct["s"].to_numpy(zero_copy_only=False)
        if len(s) and int(s.max()) >= 2**31:
            raise ValueError("supplier_copart_pairs: suppkey >= 2^31 breaks "
                             "the composite pair key — widen to two columns")
        o = np.lexsort((s, p))
        p_s, s_s = p[o], s[o]
        newrun = np.concatenate([[True], p_s[1:] != p_s[:-1]])
        starts = np.flatnonzero(newrun)
        lens = np.diff(np.concatenate([starts, [len(p_s)]]))
        within = np.arange(len(p_s), dtype=np.int64) - np.repeat(starts, lens)
        cnt_per = lens[np.cumsum(newrun) - 1] - 1 - within
        total = int(cnt_per.sum())
        if total == 0:
            return pa.table({"pairkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        i_idx = np.repeat(np.arange(len(p_s), dtype=np.int64), cnt_per)
        joff = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(cnt_per) - cnt_per, cnt_per)
            + 1
        )
        key = s_s[i_idx] * np.int64(2**32) + s_s[i_idx + joff]
        rolled = (
            pa.table({"pairkey": pa.array(key)})
            .group_by("pairkey")
            .aggregate([("pairkey", "count")])
        )
        return pa.table(
            {
                "pairkey": rolled["pairkey"],
                "n": pc.cast(rolled["pairkey_count"], pa.int64()),
            }
        )

    counts = (
        items.map_batches(_dedup, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_expand, batch_format="pyarrow")
        .groupby("pairkey")
        .aggregate(Sum("n", alias_name="n_shared_parts"))
        .to_pandas()
    )
    counts = counts[counts["n_shared_parts"] >= 2]
    key = counts["pairkey"].to_numpy(dtype="int64")
    out = pd.DataFrame(
        {
            "supp_a": key // 2**32,
            "supp_b": key % 2**32,
            "n_shared_parts": counts["n_shared_parts"].astype("int64").values,
        }
    )
    return out.sort_values(["supp_a", "supp_b"]).reset_index(drop=True)


def customer_graph_degrees(sf_dir: str) -> pd.DataFrame:
    """Out-degree distribution of the order-derived customer graph (the
    same deterministic edge set PageRank / BFS / triangles run on):
    how many nodes have each distinct out-degree — the graph-shape
    audit (power-law check, hub detection).

    Scale plan: batch-local (src, dst) dedup, ONE src-hash bucket
    shuffle (a node's whole adjacency lands in one bucket), per-bucket
    global dedup + per-src counts collapsing immediately to (degree,
    n_nodes) partials — the final groupby sees O(buckets x distinct
    degrees) rows, never the edge list."""
    from ray.data.aggregate import Max, Sum

    from ...stages.relops import _WB

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])
    num_buckets = 64

    def _edges(t: pa.Table) -> pa.Table:
        src = pc.cast(t["o_custkey"], pa.int64())
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = pa.array((okey % maxc) + 1, type=pa.int64())
        tbl = pa.table({"src": src, "dst": dst})
        tbl = tbl.filter(pc.not_equal(tbl["src"], tbl["dst"]))
        pairs = tbl.group_by(["src", "dst"]).aggregate([])
        s = pairs["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((s * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _degree_partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"src": g["src"], "dst": g["dst"]})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        deg = distinct.group_by("src").aggregate([("dst", "count")])
        hist = (
            pa.table({"deg": pc.cast(deg["dst_count"], pa.int64())})
            .group_by("deg")
            .aggregate([("deg", "count")])
        )
        return pa.table(
            {
                "out_degree": hist["deg"],
                "n": pc.cast(hist["deg_count"], pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_degree_partials, batch_format="pyarrow")
        .groupby("out_degree")
        .aggregate(Sum("n", alias_name="n_nodes"))
        .to_pandas()
    )
    out["out_degree"] = out["out_degree"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out.sort_values("out_degree").reset_index(drop=True)


def event_type_lift(sf_dir: str) -> pd.DataFrame:
    """Association-rule LIFT per event-type pair: observed co-occurrence
    over the independence expectation, lift = n_both * N / (n_a * n_b)
    on distinct-user counts — the recommendation-mining score layered on
    the co-occurrence matrix.

    Scale plan: the deduped (user, type) pair stream routes by user
    hash ONCE and is materialized (O(distinct pairs)); two grouped
    passes over it produce the bitmask pair partials
    (event_type_cooccurrence's kernel) and the per-type/total distinct
    counts (buckets partition users, so partials are disjoint). The
    lift join runs on the driver at the O(T^2) grain. The ratio is one
    identically-parenthesized double formula over exact int64 counts."""
    from ray.data.aggregate import Sum

    from ...stages.relops import _WB

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    num_buckets = 64

    def _pairs(t: pa.Table) -> pa.Table:
        for c in ("user_id", "event_type"):
            if t[c].null_count:
                raise ValueError(f"event_type_lift: nulls in {c!r}")
        pairs = (
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]})
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        u = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    routed = ds.map_batches(_pairs, batch_format="pyarrow").materialize()

    def _cooccur(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"u": g["user_id"], "ty": g["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        ty = distinct["ty"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        enc = ty.dictionary_encode()
        names = enc.dictionary.to_pylist()
        if len(names) > 63:
            raise ValueError("event_type_lift: > 63 types per bucket")
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = distinct["u"].to_numpy(zero_copy_only=False)
        order = np.argsort(users, kind="stable")
        u_s, c_s = users[order], codes[order]
        starts = np.flatnonzero(np.concatenate([[True], u_s[1:] != u_s[:-1]]))
        masks = np.bitwise_or.reduceat(np.uint64(1) << c_s.astype(np.uint64), starts)
        rows_a, rows_b, rows_n = [], [], []
        for i in range(len(names)):
            bit_i = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(names)):
                n = int((bit_i & ((masks >> np.uint64(j)) & np.uint64(1))).sum())
                if n:
                    a, b = sorted((names[i], names[j]))
                    rows_a.append(a); rows_b.append(b); rows_n.append(n)
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    def _type_partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"u": g["user_id"], "ty": g["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        per_type = distinct.group_by("ty").aggregate([("u", "count")])
        n_users = (
            distinct.group_by("u").aggregate([]).num_rows
        )  # distinct users in this bucket (buckets partition users)
        return pa.table(
            {
                "ty": pa.concat_arrays(
                    [per_type["ty"].combine_chunks(), pa.array(["\x00TOTAL"])]
                ),
                "n": pa.array(
                    list(
                        pc.cast(per_type["u_count"], pa.int64()).to_pylist()
                    )
                    + [n_users],
                    pa.int64(),
                ),
            }
        )

    both = (
        routed.groupby(_WB)
        .map_groups(_cooccur, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_both"))
        .to_pandas()
    )
    tc = (
        routed.groupby(_WB)
        .map_groups(_type_partials, batch_format="pyarrow")
        .groupby("ty")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_total = int(tc.loc[tc["ty"] == "\x00TOTAL", "n"].iloc[0])
    tmap = dict(
        zip(tc.loc[tc["ty"] != "\x00TOTAL", "ty"],
            tc.loc[tc["ty"] != "\x00TOTAL", "n"].astype("int64"))
    )
    nb = both["n_both"].to_numpy(dtype="float64")
    na = both["type_a"].map(tmap).to_numpy(dtype="float64")
    nbb = both["type_b"].map(tmap).to_numpy(dtype="float64")
    # identical parse tree to the SQL oracle — bit-identical doubles
    lift = (nb * float(n_total)) / (na * nbb)
    out = pd.DataFrame(
        {
            "type_a": both["type_a"],
            "type_b": both["type_b"],
            "n_both": both["n_both"].astype("int64"),
            "lift": lift,
        }
    )
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def kcore_customers(sf_dir: str) -> pd.DataFrame:
    """3-core of the undirected order-derived customer graph
    (graph.kcore_nodes): nodes surviving the iterative degree-<3 peel,
    with their core degrees — the third iterative graph kernel after
    PageRank and connected components. Size-routed: driver peel under
    5M distinct edges, per-round distributed degree groupby above
    (route parity pinned by test_kcore_routes_match_reference). No SQL
    oracle exists (recursive CTEs cannot re-aggregate per round); the
    kernel is pinned by an independent brute-force peel in tests."""
    from ray.data.aggregate import Max

    from ...stages.graph import kcore_nodes

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        src = pc.cast(t["o_custkey"], pa.int64())
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = pa.array((okey % maxc) + 1, type=pa.int64())
        return pa.table({"src": src, "dst": dst})

    edges = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    )
    out = kcore_nodes(edges, k=3)
    return out.sort_values("node").reset_index(drop=True)


def mutual_edge_pairs(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-edge detection on the directed order-derived graph:
    node pairs linked in BOTH directions (the mutual-follow primitive).

    Scale plan: batch-local directed-pair dedup, ONE unordered-pair
    hash bucket shuffle (both directions of a pair land together), per
    bucket one (min, max, direction-count) rollup emitting only keys
    seen in both directions — output O(mutual pairs), the raw edge list
    never converges anywhere."""
    from ray.data.aggregate import Max, Sum

    from ...stages.relops import _WB

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])
    if maxc >= 2**31:
        raise ValueError(
            "mutual_edge_pairs: node ids >= 2^31 break the composite "
            "pair key — widen to two-column grouping"
        )
    num_buckets = 64

    def _edges(t: pa.Table) -> pa.Table:
        src = np.asarray(
            pc.cast(t["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = (okey % maxc) + 1
        keep = src != dst
        src, dst = src[keep], dst[keep]
        pairs = (
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        s = pairs["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pairs["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(s, d).astype(np.uint64)
        hi = np.maximum(s, d).astype(np.uint64)
        mix = (lo * np.uint64(0x9E3779B97F4A7C15)) ^ (
            hi * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        b = ((mix >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _mutual(g: pa.Table) -> pa.Table:
        pairs = (
            pa.table({"src": g["src"], "dst": g["dst"]})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        s = pairs["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pairs["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        key = lo * np.int64(2**32) + hi
        rolled = (
            pa.table({"key": pa.array(key)})
            .group_by("key")
            .aggregate([("key", "count")])
        )
        both = rolled.filter(pc.equal(rolled["key_count"], pa.scalar(2)))
        kv = both["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(kv // 2**32),
                "b": pa.array(kv % 2**32),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_mutual, batch_format="pyarrow")
        .to_pandas()
    )
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def local_clustering_customers(sf_dir: str) -> pd.DataFrame:
    """Per-node LOCAL CLUSTERING COEFFICIENT of the order-derived
    customer graph: 2*tri(v) / (deg(v) * (deg(v)-1)) for deg >= 2 — the
    per-node companion to the scalar triangle_count_customers (community
    tightness feature for crawl-host neighborhoods).

    Scale plan: canonical-dedup shuffle (shared helper), degrees via
    batch-local unique partials + one groupby Sum, per-node triangle
    counts via graph.triangle_incidences (size-routed: driver numpy pass
    at test scale, broadcast-keys bucket shuffle to 20M edges, two hash
    joins beyond). The tri table attaches to the degree table size-routed
    (broadcast <= _BROADCAST_SIDE_ROUTE_ROWS else hash_join). Both
    factors are exact int64; the coefficient is ONE identically
    -parenthesized double division on both sides, so Ray and DuckDB
    agree bit-for-bit. Below the _order_edges_driver bound the whole
    query runs as one numpy pass (distributed plan route-forced by the
    hash-path test)."""
    from ...stages.graph import _wedge_triangles, triangle_incidences
    from ...stages.joins import broadcast_join, hash_join

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, maxc = drv
        deg_nodes, deg_cnt = np.unique(
            np.concatenate([a, b]), return_counts=True
        )
        ek = a * (maxc + 1) + b  # already sorted-unique by construction
        ta, tb, tc = _wedge_triangles(a, b, ek, maxc)
        tn, tcnt = np.unique(np.concatenate([ta, tb, tc]), return_counts=True)
        tri_full = np.zeros(len(deg_nodes), dtype=np.int64)
        tri_full[np.searchsorted(deg_nodes, tn)] = tcnt
        keep = deg_cnt >= 2
        node, d, tr = deg_nodes[keep], deg_cnt[keep].astype(np.int64), tri_full[keep]
        coeff = (2 * tr).astype(np.float64) / (d * (d - 1)).astype(np.float64)
        return pd.DataFrame(
            {"node": node, "deg": d, "tri": tr, "coeff": coeff}
        ).sort_values("node").reset_index(drop=True)

    edges, maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges)
    tri = triangle_incidences(edges, max_node_id=maxc, emit="nodes")

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        tp = tri.to_pandas()
        tri_tbl = pa.table(
            {
                "node": pa.array(tp["node"].to_numpy(dtype="int64")),
                "tri": pa.array(tp["tri"].to_numpy(dtype="int64")),
            }
        )
        joined = broadcast_join(deg, tri_tbl, key="node", how="left_outer")
    else:
        joined = hash_join(deg, tri, key="node", how="left_outer")

    def _final(t: pa.Table) -> pa.Table:
        d = np.asarray(
            pc.cast(t["deg"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        tr = np.asarray(
            pc.fill_null(pc.cast(t["tri"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        )
        node = np.asarray(
            pc.cast(t["node"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        keep = d >= 2
        node, d, tr = node[keep], d[keep], tr[keep]
        coeff = (2 * tr).astype(np.float64) / (d * (d - 1)).astype(np.float64)
        return pa.table(
            {
                "node": pa.array(node),
                "deg": pa.array(d),
                "tri": pa.array(tr),
                "coeff": pa.array(coeff, pa.float64()),
            }
        )

    out = joined.map_batches(_final, batch_format="pyarrow").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def edge_jaccard_customers(sf_dir: str) -> pd.DataFrame:
    """Per-edge COMMON-NEIGHBOR / JACCARD similarity over the order
    -derived customer graph: for each existing edge (a, b), the number
    of shared neighbors (= triangles through that edge) and
    common / ((deg(a)-1) + (deg(b)-1) - common) — the classic link
    -prediction feature, here as a distributed graph operator.

    Scale plan: one canonical-dedup shuffle; common-neighbor counts via
    graph.triangle_incidences(emit='edges') (size-routed like
    triangle_count); the O(tri-edges) common table and the O(nodes)
    degree table attach to the edge list via broadcast joins under
    _BROADCAST_SIDE_ROUTE_ROWS (hash_join route above — composite int64
    edge key a*(M+1)+b, node-id domain < ~3e9). All inputs to the final
    formula are exact int64; the division is one identical double op on
    both sides. Below the _order_edges_driver bound the whole query is
    one numpy pass (distributed plan route-forced by the hash-path
    test)."""
    from ...stages.graph import _wedge_triangles, triangle_incidences
    from ...stages.joins import broadcast_join, hash_join

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, maxc = drv
        M = maxc
        deg_nodes, deg_cnt = np.unique(
            np.concatenate([a, b]), return_counts=True
        )
        ek = a * (M + 1) + b  # sorted-unique by construction
        ta, tb, tc = _wedge_triangles(a, b, ek, M)
        ckeys, ccnt = np.unique(
            np.concatenate(
                [ta * (M + 1) + tb, ta * (M + 1) + tc, tb * (M + 1) + tc]
            ),
            return_counts=True,
        )
        common_full = np.zeros(len(ek), dtype=np.int64)
        common_full[np.searchsorted(ek, ckeys)] = ccnt
        da = deg_cnt[np.searchsorted(deg_nodes, a)].astype(np.int64)
        db = deg_cnt[np.searchsorted(deg_nodes, b)].astype(np.int64)
        denom = (da - 1) + (db - 1) - common_full
        keep = denom > 0
        return pd.DataFrame(
            {
                "a": a[keep],
                "b": b[keep],
                "common": common_full[keep],
                "jaccard": common_full[keep].astype(np.float64)
                / denom[keep].astype(np.float64),
            }
        ).sort_values(["a", "b"]).reset_index(drop=True)

    edges, maxc = _canonical_order_edges(sf_dir)
    M = maxc
    deg = _edge_degrees(edges)
    common = triangle_incidences(edges, max_node_id=maxc, emit="edges")

    def _ekey(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "ekey": pa.array(a * (M + 1) + b, pa.int64()),
            }
        )

    keyed = edges.map_batches(_ekey, batch_format="pyarrow")

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        cp = common.to_pandas()
        ck = (
            cp["a"].to_numpy(dtype="int64") * (M + 1)
            + cp["b"].to_numpy(dtype="int64")
        )
        common_tbl = pa.table(
            {
                "ekey": pa.array(ck),
                "common": pa.array(cp["common"].to_numpy(dtype="int64")),
            }
        )
        dp = deg.to_pandas()
        nodes_np = dp["node"].to_numpy(dtype="int64")
        degs_np = dp["deg"].to_numpy(dtype="int64")
        da_tbl = pa.table({"node": pa.array(nodes_np), "da": pa.array(degs_np)})
        db_tbl = pa.table({"node": pa.array(nodes_np), "db": pa.array(degs_np)})
        j = broadcast_join(keyed, common_tbl, key="ekey", how="left_outer")
        j = broadcast_join(j, da_tbl, key="a", right_key="node")
        j = broadcast_join(j, db_tbl, key="b", right_key="node")
    else:
        common_keyed = common.map_batches(
            lambda t: pa.table(
                {
                    "ekey": pa.array(
                        np.asarray(t["a"].to_numpy(zero_copy_only=False))
                        * (M + 1)
                        + np.asarray(t["b"].to_numpy(zero_copy_only=False)),
                        pa.int64(),
                    ),
                    "common": t["common"],
                }
            ),
            batch_format="pyarrow",
        )
        j = hash_join(keyed, common_keyed, key="ekey", how="left_outer")
        da = deg.map_batches(
            lambda t: pa.table({"node": t["node"], "da": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow",
        )
        db = deg.map_batches(
            lambda t: pa.table({"node": t["node"], "db": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow",
        )
        j = hash_join(j, da, key="a", right_key="node")
        j = hash_join(j, db, key="b", right_key="node")

    def _final(t: pa.Table) -> pa.Table:
        a = np.asarray(pc.cast(t["a"], pa.int64()).to_numpy(zero_copy_only=False))
        b = np.asarray(pc.cast(t["b"], pa.int64()).to_numpy(zero_copy_only=False))
        cm = np.asarray(
            pc.fill_null(pc.cast(t["common"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        )
        da_ = np.asarray(pc.cast(t["da"], pa.int64()).to_numpy(zero_copy_only=False))
        db_ = np.asarray(pc.cast(t["db"], pa.int64()).to_numpy(zero_copy_only=False))
        denom = (da_ - 1) + (db_ - 1) - cm
        keep = denom > 0
        a, b, cm, denom = a[keep], b[keep], cm[keep], denom[keep]
        jac = cm.astype(np.float64) / denom.astype(np.float64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "common": pa.array(cm),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    out = j.map_batches(_final, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def avg_neighbor_degree_customers(sf_dir: str) -> pd.DataFrame:
    """Average NEIGHBOR degree per node (the assortativity feature — one
    round of message passing: each node averages its neighbors'
    degrees) over the order-derived customer graph.

    Scale plan: canonical edges once (shared helper), degrees via the
    batch-partial groupby, neighbor-degree attach size-routed
    (broadcast searchsorted on the O(nodes) degree table, hash_join
    above), per-batch (node, sum_deg, cnt) partials into one final
    groupby. Exact int64 sums; one double division. Below the
    _order_edges_driver bound the whole query is one numpy pass
    (distributed plan route-forced by the hash-path test)."""
    from ray.data.aggregate import Sum

    from ...stages.joins import broadcast_join, hash_join

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, _maxc = drv
        deg_nodes, deg_cnt = np.unique(
            np.concatenate([a, b]), return_counts=True
        )
        u = np.concatenate([b, a])  # neighbor of v = concat(a, b)
        v_codes = np.searchsorted(deg_nodes, np.concatenate([a, b]))
        nb_deg = deg_cnt[np.searchsorted(deg_nodes, u)]
        # float64 bincount sums are exact here: sum_deg <= deg^2 << 2^53
        # at the 1M-edge driver bound
        sum_deg = np.bincount(
            v_codes, weights=nb_deg, minlength=len(deg_nodes)
        ).astype(np.int64)
        d = deg_cnt.astype(np.int64)
        return pd.DataFrame(
            {
                "node": deg_nodes,
                "deg": d,
                "sum_deg": sum_deg,
                "avg_neighbor_deg": sum_deg.astype(np.float64)
                / d.astype(np.float64),
            }
        ).sort_values("node").reset_index(drop=True)

    edges, _maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges)

    def _dirs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b])),
                "u": pa.array(np.concatenate([b, a])),
            }
        )

    dirs = edges.map_batches(_dirs, batch_format="pyarrow")

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        dp = deg.to_pandas()
        deg_tbl = pa.table(
            {
                "node": pa.array(dp["node"].to_numpy(dtype="int64")),
                "nb_deg": pa.array(dp["deg"].to_numpy(dtype="int64")),
            }
        )
        j = broadcast_join(dirs, deg_tbl, key="u", right_key="node")
    else:
        nb = deg.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "nb_deg": pc.cast(t["deg"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        j = hash_join(dirs, nb, key="u", right_key="node")

    def _partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "v": t["v"],
                    "s": pc.cast(t["nb_deg"], pa.int64()),
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by("v")
            .aggregate([("s", "sum"), ("one", "sum")])
        )
        return pa.table(
            {
                "node": g["v"],
                "s": pc.cast(g["s_sum"], pa.int64()),
                "d": pc.cast(g["one_sum"], pa.int64()),
            }
        )

    agg = (
        j.map_batches(_partials, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("s", alias_name="sum_deg"), Sum("d", alias_name="deg"))
        .to_pandas()
    )
    agg["sum_deg"] = agg["sum_deg"].astype("int64")
    agg["deg"] = agg["deg"].astype("int64")
    agg["avg_neighbor_deg"] = agg["sum_deg"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["deg"].to_numpy(dtype="int64").astype(np.float64)
    out = agg[["node", "deg", "sum_deg", "avg_neighbor_deg"]]
    return out.sort_values("node").reset_index(drop=True)


def degree_assortativity_customers(sf_dir: str) -> pd.DataFrame:
    """DEGREE ASSORTATIVITY of the order-derived customer graph: the
    Pearson correlation of (deg(v), deg(u)) over all directed neighbor
    pairs of the canonical undirected edge set (Newman 2002) — does the
    graph wire hubs to hubs (r > 0, social-network shape) or hubs to
    leaves (r < 0, web/crawl-host shape)?

    Exactness + scale plan: over directed pairs the marginal moments
    are node-local — n = Σdeg, sx = sy = Σdeg², sxx = syy = Σdeg³ —
    so they come straight off the O(nodes) degree table (batch partials
    + one tiny Sum); only the cross moment sxy = 2·Σ_edges deg(a)·deg(b)
    touches the edge list, with the degree table attached size-routed
    (broadcast searchsorted ≤ _BROADCAST_SIDE_ROUTE_ROWS, hash_join ×2
    above) and reduced per batch. All moments are exact int64 (safe to
    deg ≤ ~2·10⁵ at 10⁸ nodes: Σdeg³ ≤ ~10¹⁸ — beyond that bucket the
    degree tail first); the final r is ONE identically-parenthesized
    double formula on both sides. Below the _order_edges_driver bound
    the whole query is one numpy pass (distributed plan route-forced by
    the graph-route test)."""
    from ray.data.aggregate import Sum

    from ...stages.joins import broadcast_join, hash_join

    def _finish(n_i: int, sx_i: int, sxx_i: int, sxy_i: int) -> pd.DataFrame:
        n = np.float64(n_i)
        sx = np.float64(sx_i)
        sy = np.float64(sx_i)
        sxx = np.float64(sxx_i)
        syy = np.float64(sxx_i)
        sxy = np.float64(sxy_i)
        r = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        return pd.DataFrame(
            {
                "n_pairs": pd.Series([n_i], dtype="int64"),
                "assortativity": pd.Series([r], dtype="float64"),
            }
        )

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, _maxc = drv
        nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        d = cnt.astype(np.int64)
        da = d[np.searchsorted(nodes, a)]
        db = d[np.searchsorted(nodes, b)]
        return _finish(
            int(d.sum()),
            int((d * d).sum()),
            int((d * d * d).sum()),
            2 * int((da * db).sum()),
        )

    edges, _maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges).materialize()  # O(nodes); consumed twice

    def _marginals(t: pa.Table) -> pa.Table:
        d = np.asarray(t["deg"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "n": pa.array([int(d.sum())], pa.int64()),
                "s2": pa.array([int((d * d).sum())], pa.int64()),
                "s3": pa.array([int((d * d * d).sum())], pa.int64()),
            }
        )

    marg = deg.map_batches(_marginals, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("s2", alias_name="s2"),
        Sum("s3", alias_name="s3"),
    )

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _base._BROADCAST_SIDE_ROUTE_ROWS:
        dp = deg.to_pandas()
        nodes = dp["node"].to_numpy(dtype="int64")
        dv = dp["deg"].to_numpy(dtype="int64")
        order = np.argsort(nodes)
        nodes, dv = nodes[order], dv[order]
        node_ref = ray.put(nodes)
        deg_ref = ray.put(dv)

        def _xy(t: pa.Table) -> pa.Table:
            nd, dd = ray.get(node_ref), ray.get(deg_ref)
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
            da = dd[np.searchsorted(nd, a)]
            db = dd[np.searchsorted(nd, b)]
            return pa.table(
                {"xy": pa.array([2 * int((da * db).sum())], pa.int64())}
            )

        sxy = int(
            edges.map_batches(_xy, batch_format="pyarrow").aggregate(
                Sum("xy", alias_name="xy")
            )["xy"]
        )
    else:
        da_t = deg.map_batches(
            lambda t: pa.table(
                {"node_a": t["node"], "dega": pc.cast(t["deg"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        db_t = deg.map_batches(
            lambda t: pa.table(
                {"node_b": t["node"], "degb": pc.cast(t["deg"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        j = hash_join(edges, da_t, key="a", right_key="node_a")
        j = hash_join(j, db_t, key="b", right_key="node_b")

        def _xy2(t: pa.Table) -> pa.Table:
            da = np.asarray(
                t["dega"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            db = np.asarray(
                t["degb"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            return pa.table(
                {"xy": pa.array([2 * int((da * db).sum())], pa.int64())}
            )

        sxy = int(
            j.map_batches(_xy2, batch_format="pyarrow").aggregate(
                Sum("xy", alias_name="xy")
            )["xy"]
        )

    return _finish(int(marg["n"]), int(marg["s2"]), int(marg["s3"]), sxy)


def degree_gini_customers(sf_dir: str) -> pd.DataFrame:
    """GINI COEFFICIENT of the canonical customer-graph degree
    distribution — the hub-concentration scalar (0 = regular graph,
    →1 = one hub owns every edge; the inequality companion to
    degree_assortativity_customers over the same edge set).

    Exactness + scale plan: gini = (2·Σi·d₍ᵢ₎ − (n+1)·Σd) / (n·Σd) over
    ascending ordinals i — tied degrees commute in Σi·d, so the whole
    statistic is a pure function of the DEGREE HISTOGRAM: degrees come
    off the shared canonical-edge machinery (one dedup shuffle + one
    groupby), collapse to (degree, n_nodes) partials batch-locally, and
    the driver finishes from O(distinct degrees) rows — run-sum
    identity Σi·v over a tie run of length c starting after a rows is
    v·(c·a + c(c+1)/2). Numerator and denominator are exact integers
    (int64-safe to Σi·d < 2⁶³ ≈ n²·d̄/2 — beyond ~10⁹ nodes bucket the
    histogram tail first); ONE double division on both sides."""
    from ray.data.aggregate import Sum

    def _finish(vals: np.ndarray, cnts: np.ndarray) -> pd.DataFrame:
        order = np.argsort(vals)
        v = vals[order].astype(object)  # python ints: overflow-loud path
        c = cnts[order].astype(object)
        a = np.concatenate(([0], np.cumsum(c)[:-1]))
        n = int(sum(c))
        sd = int(sum(v * c))
        sixd = int(sum(v * (c * a + c * (c + 1) // 2)))
        num = 2 * sixd - (n + 1) * sd
        den = n * sd
        if abs(num) >= 2**63 or den >= 2**63:
            raise ValueError(
                "degree_gini moment exceeds int64 — bucket the degree "
                "histogram tail before the rollup"
            )
        return pd.DataFrame(
            {
                "n_nodes": pd.Series([n], dtype="int64"),
                "gini": pd.Series(
                    [np.float64(num) / np.float64(den)], dtype="float64"
                ),
            }
        )

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, _maxc = drv
        _nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        vals, cnts = np.unique(cnt.astype(np.int64), return_counts=True)
        return _finish(vals, cnts.astype(np.int64))

    edges, _maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges)

    def _hist(t: pa.Table) -> pa.Table:
        d = np.asarray(t["deg"].to_numpy(zero_copy_only=False), dtype=np.int64)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table(
            {
                "degree": pa.array(vals),
                "n": pa.array(cnts.astype(np.int64)),
            }
        )

    hist = (
        deg.map_batches(_hist, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return _finish(
        hist["degree"].to_numpy(dtype="int64"), hist["n"].to_numpy(dtype="int64")
    )
