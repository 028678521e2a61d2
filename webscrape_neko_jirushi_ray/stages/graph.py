"""Join-based graph analytics over Ray Datasets: integer PageRank.

Companion to the join-based connected components in ``stages/dedup.py``
(min-label propagation + pointer jumping); together they cover the two
message-passing shapes a web-corpus pipeline needs (host authority
scoring for crawl prioritization, dup-cluster collapse).

Design (build-brief "custom operators", option a — composition of
map_batches + groupby + joins):
- one iteration = hash_join(edges, ranks on src) -> vectorized per-edge
  contribution -> groupby(dst).Sum -> semi/anti split against the node
  set -> union. Every step is a keyed shuffle; driver state is scalars.
- ALL-INTEGER arithmetic: r_{i+1}(v) = base + sum over in-edges of
  (damp_num * r_i(u)) // (damp_den * outdeg(u)), with
  base = (scale * (damp_den - damp_num)) // damp_den. Integer sums are
  order-independent, so the result is bit-reproducible across any
  partitioning / block order — and checkable by an unrolled SQL oracle
  (the same reason tfidf_top_terms uses integer scores).
- fixed ``iterations`` (power iteration truncation), the standard
  production choice for rank-feature extraction; convergence-tested
  variants would compare successive integer vectors with a scalar
  aggregate, as connected components does.

Partitioning assumption: ranks and edges hash-partition by node id; one
partition's rows fit in a worker. Overflow bound: total integer mass is
~ n_nodes x scale and every intermediate is <= damp_num x mass, so with
the default scale=10**12 the int64 path is safe to ~10**5 nodes; drop
``scale`` a decade per decade of nodes beyond that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from .joins import hash_join


def pagerank_int(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    *,
    iterations: int = 5,
    scale: int | None = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    num_partitions: int = 32,
    checkpoint_dir: str | None = None,
    broadcast_ranks_threshold: int = 2_000_000,
    driver_route_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """PageRank over ``nodes`` (column ``node``: int64) and directed
    ``edges`` (columns ``src``, ``dst``: int64; duplicate (src, dst)
    pairs are deduplicated internally, self-loops tolerated). Returns
    (node, pr_scaled) where
    pr_scaled is the integer rank after ``iterations`` rounds from a
    uniform start of ``scale`` per node. Contributions to a dst that is
    not in ``nodes`` are dropped (dangling targets), matching the SQL
    semantics of joining contributions back onto the node set.

    SIZE-ROUTED (r4): at or below ``broadcast_ranks_threshold`` nodes the
    rank vector is broadcast each round (``ray.put`` of two int64 arrays,
    ≤ 32 MB at the 2M default) and a round costs ONE combiner-reduced
    ``groupby(dst).sum`` shuffle — the per-round hash-join machinery
    (union + sort-groupby + acero stitch) is gone, which dominates wall
    time on small/medium graphs. Above the threshold the join plan runs
    (rank vector itself is too big to broadcast). Both plans are
    all-integer and order-independent, so results are bit-identical and
    checkpoints are interchangeable between routes.
    """
    nodes = nodes.materialize()  # O(node set), reused every round
    n_nodes = nodes.count()
    # int64 headroom guard (enforces the docstring contract instead of
    # trusting the caller): total integer mass is ~ n_nodes x scale and
    # the per-round contribution sum is bounded by damp_num x mass /
    # damp_den < mass, so requiring n_nodes x scale < 2**62 leaves a 2x
    # margin on every intermediate. scale=None auto-derives the largest
    # power of 10 that fits (floor 10**3 — below that the integer ranks
    # lose all resolution, fail instead).
    if scale is None:
        scale = 10**12
        while scale > 10**3 and n_nodes * scale >= 2**62:
            scale //= 10
    if n_nodes * scale >= 2**62:
        raise ValueError(
            f"pagerank_int: n_nodes={n_nodes} x scale={scale} exceeds the "
            "int64 headroom (>= 2**62); pass a smaller scale or scale=None "
            "to auto-derive one (drop a decade per decade of nodes)"
        )
    base = (scale * (damp_den - damp_num)) // damp_den
    # ONE src-keyed shuffle builds the degree-annotated edge list. The
    # co-location unit is a HASH BUCKET of srcs, not a single src —
    # groupby(src).map_groups is one Python call per src, which at 10^6+
    # srcs costs minutes of per-group overhead (the same trap the r4
    # reorganize fix removed); a bucket dedups and degree-annotates ALL
    # its srcs in one lexsort + boundary pass. This still replaces the
    # naive three-shuffle plan (distinct groupby + outdeg groupby + src
    # hash_join) — two fewer all-to-all passes over the edge list.
    def _src_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        s = np.asarray(t["src"].to_numpy(zero_copy_only=False))
        p = (
            (s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)
        ) % np.uint64(num_partitions)
        return t.append_column("_p", pa.array(p.astype(np.int64)))

    def _dedup_deg(g: pa.Table) -> pa.Table:
        import numpy as np

        if g.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "d": pa.array([], pa.int64()),
                }
            )
        src = np.asarray(g["src"].to_numpy(zero_copy_only=False))
        dst = np.asarray(g["dst"].to_numpy(zero_copy_only=False))
        o = np.lexsort((dst, src))
        s_s, d_s = src[o], dst[o]
        uniq = np.concatenate(
            [[True], (s_s[1:] != s_s[:-1]) | (d_s[1:] != d_s[:-1])]
        )
        s_u, d_u = s_s[uniq], d_s[uniq]
        newrun = np.concatenate([[True], s_u[1:] != s_u[:-1]])
        starts = np.nonzero(newrun)[0]
        lens = np.diff(np.concatenate([starts, [len(s_u)]]))
        deg = lens[np.cumsum(newrun) - 1]
        return pa.table(
            {
                "src": pa.array(s_u),
                "dst": pa.array(d_u),
                "d": pa.array(deg.astype(np.int64)),
            }
        )

    edges_deg = (
        edges.map_batches(_src_bucket, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_dedup_deg, batch_format="pyarrow")
        .materialize()
    )

    def _init(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "node": t["node"],
                "pr_scaled": pa.array(
                    np.full(t.num_rows, scale, dtype=np.int64)
                ),
            }
        )

    ranks = nodes.map_batches(_init, batch_format="pyarrow").materialize()

    # resumable iterative state (the brief's S5 checkpoint/resume story
    # extended to the iterative family): after round i the rank vector is
    # written to checkpoint_dir/round=i/ and stamped _DONE only after the
    # parquet is durable; on start the highest stamped round resumes the
    # loop there. Integer message passing makes the resumed run
    # BIT-IDENTICAL to an uninterrupted one.
    start_round = 0
    if checkpoint_dir is not None:
        import json
        import os
        import shutil

        os.makedirs(checkpoint_dir, exist_ok=True)
        # identity guard (the seen.py FP_SCHEME pattern): resuming a
        # checkpoint written for a different graph or parameterization
        # must fail loudly, not silently continue from stale ranks
        # content-derived fingerprint, not just counts (ADVICE r3): two
        # graphs with identical node/edge counts must not silently share a
        # checkpoint. Order-independent int sums (mod 2**61-1 to keep the
        # JSON value bounded) over node ids and (src, dst) pairs are one
        # cheap distributed aggregate each over data already materialized.
        _M = (1 << 61) - 1

        def _fold(ds_, cols):
            agg = ds_.aggregate(*[Sum(c, alias_name=c) for c in cols])
            return {c: int(agg[c] or 0) % _M for c in cols}

        meta = {
            "n_nodes": n_nodes,
            "n_edges": edges_deg.count(),
            "node_sum": _fold(nodes, ["node"])["node"],
            "edge_sums": _fold(edges_deg, ["src", "dst"]),
            "scale": scale,
            "damp_num": damp_num,
            "damp_den": damp_den,
            "num_partitions": num_partitions,
        }
        meta_path = os.path.join(checkpoint_dir, "_META.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev = json.load(f)
            if prev != meta:
                raise ValueError(
                    f"pagerank checkpoint at {checkpoint_dir!r} was written "
                    f"for a different graph/parameters ({prev} != {meta}); "
                    "use a fresh checkpoint_dir"
                )
        else:
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        # a crashed attempt leaves unstamped round dirs with partial
        # parquet — remove them BEFORE scanning (write_parquet emits
        # uniquely-named files, so rewriting into a dirty dir would merge
        # stale and fresh rows on the next resume)
        for name in os.listdir(checkpoint_dir):
            d = os.path.join(checkpoint_dir, name)
            if (
                name.startswith("round=")
                and os.path.isdir(d)
                and not os.path.exists(os.path.join(d, "_DONE"))
            ):
                shutil.rmtree(d)
        for r in range(iterations, 0, -1):
            d = os.path.join(checkpoint_dir, f"round={r}")
            if os.path.exists(os.path.join(d, "_DONE")):
                ranks = ray.data.read_parquet(d).materialize()
                start_round = r
                break

    if (
        checkpoint_dir is None
        and n_nodes <= driver_route_edges
        and edges_deg.count() <= driver_route_edges
    ):
        import numpy as np

        # --- driver route: the whole power iteration in numpy ------------
        # The deduped degree-annotated edge list fits the routed bound
        # (<= driver_route_edges rows, ~24 B/row -> <= ~120 MB at the 5M
        # default), so after the ONE distributed dedup shuffle above the
        # five rounds are pure vectorized arithmetic — no per-round
        # groupby exchange at all (the same size routing that took
        # connected components from 39.5 s to 3.4 s at bench scale).
        # Identical integer ops in identical combine order class
        # (order-independent int64 sums), so results are bit-identical
        # to both distributed routes; the checkpointed path keeps the
        # distributed plan (resume needs durable round artifacts).
        rdf = ranks.to_pandas()
        order = np.argsort(rdf["node"].to_numpy(), kind="stable")
        ns = rdf["node"].to_numpy()[order].astype(np.int64)
        pr = rdf["pr_scaled"].to_numpy()[order].astype(np.int64)
        edf = edges_deg.to_pandas()
        src = edf["src"].to_numpy().astype(np.int64)
        dst = edf["dst"].to_numpy().astype(np.int64)
        dg = edf["d"].to_numpy().astype(np.int64)

        def _member_pos_d(sorted_arr: np.ndarray, vals: np.ndarray):
            pos = np.searchsorted(sorted_arr, vals)
            posc = np.clip(pos, 0, max(len(sorted_arr) - 1, 0))
            ok = (
                (sorted_arr[posc] == vals)
                if len(sorted_arr)
                else np.zeros(len(vals), dtype=bool)
            )
            return posc, ok

        spos, sok = _member_pos_d(ns, src)
        _, dok = _member_pos_d(ns, dst)
        keep = sok & dok  # drop dangling targets AND unranked srcs
        srcp, dk, dgk = spos[keep], dst[keep], dg[keep]
        o = np.argsort(dk, kind="stable")
        dk_s, srcp_s, dg_s = dk[o], srcp[o], dgk[o]
        if len(dk_s):
            starts = np.concatenate(
                [[0], np.nonzero(dk_s[1:] != dk_s[:-1])[0] + 1]
            ).astype(np.int64)
            dpos, _ = _member_pos_d(ns, dk_s[starts])
        for _ in range(start_round, iterations):
            new_pr = np.full(len(ns), base, dtype=np.int64)
            if len(dk_s):
                c = (damp_num * pr[srcp_s]) // (damp_den * dg_s)
                new_pr[dpos] += np.add.reduceat(c, starts).astype(np.int64)
            pr = new_pr
        final = pa.table({"node": ns, "pr_scaled": pr})
        n_blocks = max(1, min(num_partitions, len(ns)))
        step = -(-len(ns) // n_blocks) if len(ns) else 1
        return ray.data.from_arrow(
            [
                final.slice(i * step, step)
                for i in range(n_blocks)
                if i * step < len(ns)
            ]
            or [final]
        )

    if n_nodes <= broadcast_ranks_threshold:
        import numpy as np

        # --- broadcast-ranks route: one shuffle per round ----------------
        rdf = ranks.to_pandas()  # O(n_nodes), inside the routed bound
        order = np.argsort(rdf["node"].to_numpy(), kind="stable")
        ns = rdf["node"].to_numpy()[order].astype(np.int64)
        pr = rdf["pr_scaled"].to_numpy()[order].astype(np.int64)

        def _member_pos(sorted_arr: np.ndarray, vals: np.ndarray):
            pos = np.searchsorted(sorted_arr, vals)
            posc = np.clip(pos, 0, max(len(sorted_arr) - 1, 0))
            ok = (
                (sorted_arr[posc] == vals)
                if len(sorted_arr)
                else np.zeros(len(vals), dtype=bool)
            )
            return posc, ok

        for rnd in range(start_round, iterations):
            ref = ray.put((ns, pr))

            def _contrib_bc(t: pa.Table, _ref=ref) -> pa.Table:
                nsl, prl = ray.get(_ref)
                src = np.asarray(t["src"].to_numpy(zero_copy_only=False))
                dst = np.asarray(t["dst"].to_numpy(zero_copy_only=False))
                d = np.asarray(t["d"].to_numpy(zero_copy_only=False))
                spos, sok = _member_pos(nsl, src)
                _, dok = _member_pos(nsl, dst)
                keep = sok & dok  # drop dangling targets AND unranked srcs
                c = (damp_num * prl[spos[keep]]) // (damp_den * d[keep])
                dk = dst[keep]
                o = np.argsort(dk, kind="stable")
                dk_s, c_s = dk[o], c[o]
                starts = np.concatenate(
                    [[0], np.nonzero(dk_s[1:] != dk_s[:-1])[0] + 1]
                ).astype(np.int64)
                if len(dk_s) == 0:
                    return pa.table(
                        {
                            "node": pa.array([], pa.int64()),
                            "c": pa.array([], pa.int64()),
                        }
                    )
                return pa.table(
                    {
                        "node": pa.array(dk_s[starts]),
                        "c": pa.array(
                            np.add.reduceat(c_s, starts).astype(np.int64)
                        ),
                    }
                )

            parts = (
                edges_deg.map_batches(_contrib_bc, batch_format="pyarrow")
                .groupby("node")
                .sum("c")
                .to_pandas()  # <= n_nodes rows, inside the routed bound
            )
            new_pr = np.full(len(ns), base, dtype=np.int64)
            if len(parts):
                p, ok = _member_pos(
                    ns, parts["node"].to_numpy().astype(np.int64)
                )
                new_pr[p[ok]] += parts["sum(c)"].to_numpy().astype(np.int64)[ok]
            pr = new_pr
            if checkpoint_dir is not None:
                import os

                import pyarrow.parquet as _pq

                d = os.path.join(checkpoint_dir, f"round={rnd + 1}")
                os.makedirs(d, exist_ok=True)
                _pq.write_table(
                    pa.table({"node": ns, "pr_scaled": pr}),
                    os.path.join(d, "part0.parquet"),
                )
                with open(os.path.join(d, "_DONE"), "w") as f:
                    f.write("ok\n")
        final = pa.table({"node": ns, "pr_scaled": pr})
        n_blocks = max(1, min(num_partitions, len(ns)))
        step = -(-len(ns) // n_blocks) if len(ns) else 1
        return ray.data.from_arrow(
            [
                final.slice(i * step, step)
                for i in range(n_blocks)
                if i * step < len(ns)
            ]
            or [final]
        )

    def _contrib(t: pa.Table) -> pa.Table:
        import numpy as np

        c = pc.divide(
            pc.multiply(t["pr_scaled"], pa.scalar(damp_num, pa.int64())),
            pc.multiply(t["d"], pa.scalar(damp_den, pa.int64())),
        )
        return pa.table(
            {
                "node": t["dst"],
                "c": pc.cast(c, pa.int64()),
                "_isn": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    def _node_zero(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "node": t["node"],
                "c": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "_isn": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    def _apply(t: pa.Table) -> pa.Table:
        # keep only real nodes (drops dangling contribution targets);
        # no-inlink nodes carry c = 0 -> rank = base
        t = t.filter(pc.greater(t["_isn"], 0))
        return pa.table(
            {
                "node": t["node"],
                "pr_scaled": pc.add(t["c"], pa.scalar(base, pa.int64())),
            }
        )

    # two keyed shuffles per round: the src join and the dst sum (the
    # node-set merge rides the same groupby via a tagged union)
    for rnd in range(start_round, iterations):
        joined = hash_join(
            edges_deg,
            ranks,
            key="src",
            right_key="node",
            num_partitions=num_partitions,
        )
        merged = (
            joined.map_batches(_contrib, batch_format="pyarrow")
            .union(nodes.map_batches(_node_zero, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(
                Sum("c", alias_name="c"), Sum("_isn", alias_name="_isn")
            )
        )
        # coalesce before the round boundary: the sort-groupby and the
        # join's map_groups both EMIT blocks proportional to their input
        # block count, so without this the rank vector's block count grows
        # every round (64 -> 256 -> 448 -> ...) and per-block scheduling
        # overhead makes iteration i cost O(i) — measured 6.5/20/41 s for
        # rounds 0/1/2 at sf0.1 before the fix, flat ~6 s after.
        ranks = (
            merged.map_batches(_apply, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )
        if checkpoint_dir is not None:
            import os

            d = os.path.join(checkpoint_dir, f"round={rnd + 1}")
            ranks.write_parquet(d)
            with open(os.path.join(d, "_DONE"), "w") as f:
                f.write("ok\n")

    return ranks


def triangle_count(
    edges: "ray.data.Dataset",
    *,
    max_node_id: int,
    num_partitions: int = 32,
    broadcast_edges_threshold: int = 20_000_000,
    driver_route_edges: int = 5_000_000,
) -> int:
    """Triangle count over canonical DISTINCT undirected edges (columns
    ``a`` < ``b``, int64). Each triangle a<b<c is generated exactly once
    as the wedge (a,b)-(a,c) — the standard forward-degree orientation
    that keeps hub fan-out quadratic only in forward degree.

    SIZE-ROUTED (r4):
    - ≤ ``driver_route_edges``: the whole wedge expansion runs on the
      driver in one numpy pass (the broadcast route pulls every edge key
      to the driver anyway, so its bucket shuffle buys nothing at this
      size) — zero exchanges after the caller's canonical dedup.
    - ≤ ``broadcast_edges_threshold`` edges (~160 MB of int64 keys at the
      20M default): the composite edge-key set ``a*(M+1)+b`` broadcasts
      once via ``ray.put``; edges hash-bucket by ``a`` (ONE shuffle, so a
      node's forward neighbors co-locate), and each bucket generates its
      wedges vectorized (run-length pair expansion, no per-node Python)
      and probes the broadcast keys with a searchsorted — no join
      shuffles at all. The driver sees one partial count per bucket.
    - above the threshold: wedge hash_join on the shared low endpoint +
      LEFT SEMI hash join of the closing pair against the edge set (the
      plan that never holds the edge set in one worker).

    Composite keys need ``max_node_id`` < ~3e9 (int64); shard the key at
    larger id domains.
    """
    import numpy as np

    from .joins import hash_join

    M = max_node_id
    edges = edges.materialize()
    n_edges = edges.count()

    if n_edges <= driver_route_edges:
        # --- driver route: wedge expansion in one numpy pass -------------
        # The broadcast route below already pulls every composite edge key
        # to the driver, so at this size the bucket shuffle it then pays
        # buys nothing — run the identical lexsort + run-length pair
        # expansion + searchsorted probe here instead (zero exchanges
        # after the caller's canonical-dedup shuffle). Wedge volume is
        # sum-of-squares of forward degrees; a hub-heavy graph over the
        # edge bound routes to the bucketed plan which caps per-task fan
        # -out by bucket.
        cols_a, cols_b = [], []
        for t in ray.get(edges.to_arrow_refs()):
            if t.num_rows:
                cols_a.append(np.asarray(t["a"].to_numpy(zero_copy_only=False)))
                cols_b.append(np.asarray(t["b"].to_numpy(zero_copy_only=False)))
        if not cols_a:
            return 0
        a = np.concatenate(cols_a)
        b = np.concatenate(cols_b)
        ek = np.sort(a * (M + 1) + b)
        o = np.lexsort((b, a))
        a_s, b_s = a[o], b[o]
        newrun = np.concatenate([[True], a_s[1:] != a_s[:-1]])
        starts = np.nonzero(newrun)[0]
        lens = np.diff(np.concatenate([starts, [len(a_s)]]))
        within = np.arange(len(a_s), dtype=np.int64) - np.repeat(starts, lens)
        cnt_per = lens[np.cumsum(newrun) - 1] - 1 - within
        total = int(cnt_per.sum())
        if total == 0:
            return 0
        i_idx = np.repeat(np.arange(len(a_s), dtype=np.int64), cnt_per)
        joff = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(cnt_per) - cnt_per, cnt_per)
            + 1
        )
        key = b_s[i_idx] * (M + 1) + b_s[i_idx + joff]
        pos = np.clip(np.searchsorted(ek, key), 0, len(ek) - 1)
        return int((ek[pos] == key).sum())

    if n_edges <= broadcast_edges_threshold:
        parts = []
        for t in ray.get(edges.to_arrow_refs()):
            if t.num_rows:
                a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
                b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
                parts.append(a * (M + 1) + b)
        ekeys = (
            np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )
        keys_ref = ray.put(ekeys)

        def _bucket(t: pa.Table) -> pa.Table:
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            p = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(33)) % np.uint64(num_partitions)
            return t.append_column("_p", pa.array(p.astype(np.int64)))

        def _count(g: pa.Table) -> pa.Table:
            ek = ray.get(keys_ref)
            a = np.asarray(g["a"].to_numpy(zero_copy_only=False))
            b = np.asarray(g["b"].to_numpy(zero_copy_only=False))
            if len(a) == 0 or len(ek) == 0:
                return pa.table({"cnt": pa.array([0], pa.int64())})
            o = np.lexsort((b, a))
            a_s, b_s = a[o], b[o]
            newrun = np.concatenate([[True], a_s[1:] != a_s[:-1]])
            starts = np.nonzero(newrun)[0]
            lens = np.diff(np.concatenate([starts, [len(a_s)]]))
            # vectorized forward-pair expansion: element at within-run
            # position t pairs with the (L-1-t) elements after it
            within = np.arange(len(a_s), dtype=np.int64) - np.repeat(
                starts, lens
            )
            cnt_per = lens[np.cumsum(newrun) - 1] - 1 - within
            total = int(cnt_per.sum())
            if total == 0:
                return pa.table({"cnt": pa.array([0], pa.int64())})
            i_idx = np.repeat(np.arange(len(a_s), dtype=np.int64), cnt_per)
            joff = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(cnt_per) - cnt_per, cnt_per)
                + 1
            )
            key = b_s[i_idx] * (M + 1) + b_s[i_idx + joff]
            pos = np.clip(np.searchsorted(ek, key), 0, len(ek) - 1)
            n_tri = int((ek[pos] == key).sum())
            return pa.table({"cnt": pa.array([n_tri], pa.int64())})

        partials = (
            edges.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_p")
            .map_groups(_count, batch_format="pyarrow")
        )
        agg = partials.aggregate(Sum("cnt", alias_name="n"))
        return int(agg["n"] or 0)

    # --- giant-graph fallback: two hash joins -----------------------------
    wedges = hash_join(edges, edges, key="a", num_partitions=num_partitions)

    def _closing(t: pa.Table) -> pa.Table:
        b1 = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        b2 = np.asarray(t["b_r"].to_numpy(zero_copy_only=False))
        keep = b1 < b2
        key = b1[keep] * (M + 1) + b2[keep]
        return pa.table({"key": pa.array(key, pa.int64())})

    def _ekey(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        return pa.table({"ekey": pa.array(a * (M + 1) + b, pa.int64())})

    closed = hash_join(
        wedges.map_batches(_closing, batch_format="pyarrow"),
        edges.map_batches(_ekey, batch_format="pyarrow"),
        key="key",
        right_key="ekey",
        how="left_semi",
        num_partitions=num_partitions,
    )
    return int(closed.count())


def _wedge_triangles(
    a: np.ndarray, b: np.ndarray, ek: np.ndarray, M: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized forward-wedge expansion + closing-edge probe.

    ``a``/``b`` are canonical distinct edges (a < b, int64) of one
    partition; ``ek`` is the SORTED composite key array ``a*(M+1)+b`` of
    the FULL edge set. Returns the matched triangle corners
    ``(ta, tb, tc)`` with ta < tb < tc — each triangle whose apex (low
    node) lives in this partition is emitted exactly once. Same
    forward-degree wedge bound as ``triangle_count``."""
    if len(a) == 0 or len(ek) == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    o = np.lexsort((b, a))
    a_s, b_s = a[o], b[o]
    newrun = np.concatenate([[True], a_s[1:] != a_s[:-1]])
    starts = np.nonzero(newrun)[0]
    lens = np.diff(np.concatenate([starts, [len(a_s)]]))
    within = np.arange(len(a_s), dtype=np.int64) - np.repeat(starts, lens)
    cnt_per = lens[np.cumsum(newrun) - 1] - 1 - within
    total = int(cnt_per.sum())
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    i_idx = np.repeat(np.arange(len(a_s), dtype=np.int64), cnt_per)
    joff = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(cnt_per) - cnt_per, cnt_per)
        + 1
    )
    tb, tc = b_s[i_idx], b_s[i_idx + joff]
    key = tb * (M + 1) + tc
    pos = np.clip(np.searchsorted(ek, key), 0, len(ek) - 1)
    hit = ek[pos] == key
    return a_s[i_idx][hit], tb[hit], tc[hit]


def _corner_partials(
    ta: np.ndarray, tb: np.ndarray, tc: np.ndarray, M: int, emit: str
) -> pa.Table:
    """Collapse matched triangle corners to per-node ``(node, tri)`` or
    per-edge ``(ekey, common)`` partial counts (np.unique — exact int64,
    order-independent)."""
    if emit == "nodes":
        nodes, cnt = np.unique(np.concatenate([ta, tb, tc]), return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "tri": pa.array(cnt.astype(np.int64)),
            }
        )
    keys = np.concatenate(
        [ta * (M + 1) + tb, ta * (M + 1) + tc, tb * (M + 1) + tc]
    )
    k, cnt = np.unique(keys, return_counts=True)
    return pa.table(
        {
            "ekey": pa.array(k, pa.int64()),
            "common": pa.array(cnt.astype(np.int64)),
        }
    )


def triangle_incidences(
    edges: "ray.data.Dataset",
    *,
    max_node_id: int,
    emit: str = "nodes",
    num_partitions: int = 32,
    broadcast_edges_threshold: int = 20_000_000,
    driver_route_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """Per-node or per-edge triangle participation counts over canonical
    DISTINCT undirected edges (columns ``a`` < ``b``, int64) — the
    building block for local clustering coefficients (emit='nodes':
    rows ``node, tri``) and common-neighbor / Jaccard link features
    (emit='edges': rows ``a, b, common`` — only edges in >=1 triangle
    appear; callers left-join and coalesce 0).

    SIZE-ROUTED exactly like ``triangle_count`` (driver numpy pass /
    broadcast-keys bucket shuffle / two hash joins), but each route ends
    in per-partition ``np.unique`` partial counts + ONE groupby Sum, so
    the exchange moves O(distinct touched nodes|edges per partition)
    rows, never the raw triangle stream. Composite keys need
    ``max_node_id`` < ~3e9 (int64)."""
    if emit not in ("nodes", "edges"):
        raise ValueError(f"emit must be 'nodes' or 'edges', got {emit!r}")

    M = max_node_id
    edges = edges.materialize()
    n_edges = edges.count()

    def _decompose(t: pa.Table) -> pa.Table:
        k = np.asarray(t["ekey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "a": pa.array(k // (M + 1), pa.int64()),
                "b": pa.array(k % (M + 1), pa.int64()),
                "common": pc.cast(t["common"], pa.int64()),
            }
        )

    if n_edges <= driver_route_edges:
        cols_a, cols_b = [], []
        for t in ray.get(edges.to_arrow_refs()):
            if t.num_rows:
                cols_a.append(np.asarray(t["a"].to_numpy(zero_copy_only=False)))
                cols_b.append(np.asarray(t["b"].to_numpy(zero_copy_only=False)))
        if not cols_a:
            a = b = np.empty(0, np.int64)
        else:
            a, b = np.concatenate(cols_a), np.concatenate(cols_b)
        ek = np.sort(a * (M + 1) + b)
        ta, tb, tc = _wedge_triangles(a, b, ek, M)
        out = _corner_partials(ta, tb, tc, M, emit)
        if emit == "edges":
            out = _decompose(out)
        return ray.data.from_arrow(out)

    if n_edges <= broadcast_edges_threshold:
        parts = []
        for t in ray.get(edges.to_arrow_refs()):
            if t.num_rows:
                a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
                b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
                parts.append(a * (M + 1) + b)
        ekeys = (
            np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )
        keys_ref = ray.put(ekeys)

        def _bucket(t: pa.Table) -> pa.Table:
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            p = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(33)) % np.uint64(num_partitions)
            return t.append_column("_p", pa.array(p.astype(np.int64)))

        def _partials(g: pa.Table) -> pa.Table:
            ek = ray.get(keys_ref)
            a = np.asarray(g["a"].to_numpy(zero_copy_only=False))
            b = np.asarray(g["b"].to_numpy(zero_copy_only=False))
            ta, tb, tc = _wedge_triangles(a, b, ek, M)
            return _corner_partials(ta, tb, tc, M, emit)

        partials = (
            edges.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_p")
            .map_groups(_partials, batch_format="pyarrow")
        )
    else:
        wedges = hash_join(
            edges, edges, key="a", num_partitions=num_partitions
        )

        def _closing(t: pa.Table) -> pa.Table:
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            b1 = np.asarray(t["b"].to_numpy(zero_copy_only=False))
            b2 = np.asarray(t["b_r"].to_numpy(zero_copy_only=False))
            keep = b1 < b2
            return pa.table(
                {
                    "key": pa.array(b1[keep] * (M + 1) + b2[keep], pa.int64()),
                    "ta": pa.array(a[keep], pa.int64()),
                    "tb": pa.array(b1[keep], pa.int64()),
                    "tc": pa.array(b2[keep], pa.int64()),
                }
            )

        def _ekey(t: pa.Table) -> pa.Table:
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
            return pa.table({"ekey": pa.array(a * (M + 1) + b, pa.int64())})

        closed = hash_join(
            wedges.map_batches(_closing, batch_format="pyarrow"),
            edges.map_batches(_ekey, batch_format="pyarrow"),
            key="key",
            right_key="ekey",
            how="left_semi",
            num_partitions=num_partitions,
        )

        def _batch_partials(t: pa.Table) -> pa.Table:
            return _corner_partials(
                np.asarray(t["ta"].to_numpy(zero_copy_only=False)),
                np.asarray(t["tb"].to_numpy(zero_copy_only=False)),
                np.asarray(t["tc"].to_numpy(zero_copy_only=False)),
                M,
                emit,
            )

        partials = closed.map_batches(_batch_partials, batch_format="pyarrow")

    if emit == "nodes":
        out = partials.groupby("node").aggregate(Sum("tri", alias_name="t"))
        return out.map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t["node"], pa.int64()),
                    "tri": pc.cast(t["t"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    out = partials.groupby("ekey").aggregate(Sum("common", alias_name="c"))
    return out.map_batches(
        lambda t: _decompose(
            pa.table({"ekey": t["ekey"], "common": t["c"]})
        ),
        batch_format="pyarrow",
    )


def bfs_levels(
    edges: "ray.data.Dataset",
    source: int,
    *,
    max_hops: int = 10,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Distributed BFS shortest-path levels from ``source`` over a
    directed edge Dataset (int64 ``src``/``dst`` columns): one row per
    reachable node with its minimum hop count <= max_hops.

    Frontier-relaxation plan (the crawl engine's round shape), two
    keyed exchanges per hop: the edge corpus semi-joins the frontier on
    src (distributed is_in — the frontier never leaves the cluster),
    the reached dsts are tagged dist=hop and merged into the settled
    table with ONE union + groupby-min (dedup and first-hop-wins in the
    same shuffle; BFS relaxations never improve a settled node, so min
    keeps the first hop). The settled table re-materializes per round
    to keep the lineage flat; the driver sees one scalar count per
    round and stops when a round settles nothing new. Small graphs
    should prefer :func:`bfs_levels_driver` — every round here costs
    fixed-latency distributed stages (the components size-route
    argument)."""
    from .joins import hash_join

    src_t = pa.table(
        {
            "node": pa.array([int(source)], pa.int64()),
            "dist": pa.array([0], pa.int64()),
        }
    )
    settled = ray.data.from_arrow(src_t).materialize()
    n_settled = 1
    frontier = ray.data.from_arrow(src_t.select(["node"]))
    for hop in range(1, max_hops + 1):
        cand = hash_join(
            edges, frontier, key="src", right_key="node",
            how="left_semi", num_partitions=num_partitions,
        ).map_batches(
            lambda t, h=hop: pa.table(
                {
                    "node": pc.cast(t["dst"], pa.int64()),
                    "dist": pa.array(np.full(t.num_rows, h, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        settled = (
            settled.union(cand)
            .groupby("node")
            .min("dist")
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": pc.cast(t["node"], pa.int64()),
                        "dist": pc.cast(t["min(dist)"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        n_now = settled.count()
        if n_now == n_settled:
            break
        n_settled = n_now
        frontier = settled.map_batches(
            lambda t, h=hop: t.filter(
                pc.equal(t["dist"], pa.scalar(h))
            ).select(["node"]),
            batch_format="pyarrow",
        )
    out = settled.to_pandas()
    out["node"] = out["node"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def bfs_levels_driver(
    src: "np.ndarray", dst: "np.ndarray", source: int, *, max_hops: int = 10
) -> pd.DataFrame:
    """Driver BFS over edge arrays — the small-graph route (edge list
    already fits in one worker; distributed rounds would be pure fixed
    latency). Vectorized per level: one np.isin against the frontier."""
    dist = {int(source): 0}
    frontier = np.asarray([source], dtype=np.int64)
    for hop in range(1, max_hops + 1):
        mask = np.isin(src, frontier)
        reached = np.unique(dst[mask])
        new = np.asarray(
            [n for n in reached.tolist() if n not in dist], dtype=np.int64
        )
        if len(new) == 0:
            break
        for n in new.tolist():
            dist[n] = hop
        frontier = new
    out = pd.DataFrame(
        {"node": list(dist.keys()), "dist": list(dist.values())}
    ).astype({"node": "int64", "dist": "int64"})
    return out.sort_values("node").reset_index(drop=True)


def kcore_nodes(
    edges: "ray.data.Dataset",
    *,
    k: int,
    num_partitions: int = 32,
    driver_route_edges: int = 5_000_000,
    max_rounds: int = 100,
) -> pd.DataFrame:
    """Nodes of the k-core: the maximal subgraph in which every node
    keeps UNDIRECTED degree >= k, found by iteratively peeling
    under-degree nodes until fixpoint — the third iterative graph
    kernel next to PageRank and connected components (community-core
    extraction, spam-farm pruning). ``edges``: columns ``src``/``dst``
    int64, direction ignored, duplicates/self-loops dropped internally.
    Returns a (node, core_degree) DataFrame (empty when no k-core
    exists).

    SIZE-ROUTED like the other graph kernels:
    - <= ``driver_route_edges`` distinct undirected edges: the peel
      loop runs on the driver over compressed node codes — each round
      one bincount + two mask gathers, O(E) per round, cascade depth
      rounds total.
    - above: each round is a distributed degree ``groupby`` + alive-set
      rebuild + a broadcast membership filter of the edge list
      (node-set arrays <= driver_route_edges never apply here — the
      alive set rides as a sorted array in the object store via
      ray.put, O(nodes) per round); rounds stop at the first round
      removing nothing. ``max_rounds`` bounds adversarial cascades
      (each peel round removes >= 1 node, so rounds <= nodes; the cap
      raises loudly rather than looping silently).

    Both routes perform identical integer peels, so results are
    bit-identical (pinned by the route-parity test)."""
    import numpy as np

    from ray.data.aggregate import Count

    # ONE distributed canonical dedup (the triangle/pagerank pattern)
    def _canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a, b = np.minimum(s, d), np.maximum(s, d)
        tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
        pairs = tbl.group_by(["a", "b"]).aggregate([])
        av = pairs["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bv = pairs["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (av * np.uint64(0x9E3779B97F4A7C15)) ^ (
            bv * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        p = ((mix >> np.uint64(33)) % np.uint64(num_partitions)).astype(
            np.int64
        )
        return pairs.append_column("_p", pa.array(p))

    def _dedup(g: pa.Table) -> pa.Table:
        pairs = (
            pa.table({"a": g["a"], "b": g["b"]}).group_by(["a", "b"]).aggregate([])
        )
        return pairs

    canon = (
        edges.map_batches(_canon, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_dedup, batch_format="pyarrow")
        .materialize()
    )
    n_edges = canon.count()

    def _peel_driver(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
        # compress ids -> codes so bincount is dense
        ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ua, ub = inv[: len(a)], inv[len(a):]
        alive_e = np.ones(len(ua), dtype=bool)
        alive_n = np.ones(len(ids), dtype=bool)
        while True:
            deg = np.bincount(
                np.concatenate([ua[alive_e], ub[alive_e]]), minlength=len(ids)
            )
            drop = alive_n & (deg < k)
            if not drop.any():
                final_deg = deg
                break
            alive_n &= ~drop
            alive_e &= alive_n[ua] & alive_n[ub]
        keep = alive_n & (final_deg >= k)
        return pd.DataFrame(
            {
                "node": ids[keep].astype("int64"),
                "core_degree": final_deg[keep].astype("int64"),
            }
        )

    if n_edges <= driver_route_edges:
        refs = ray.get(canon.to_arrow_refs())
        if not refs or sum(t.num_rows for t in refs) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "core_degree": pd.Series([], dtype="int64")}
            )
        a = np.concatenate(
            [np.asarray(t["a"].to_numpy(zero_copy_only=False)) for t in refs
             if t.num_rows]
        ).astype(np.int64)
        b = np.concatenate(
            [np.asarray(t["b"].to_numpy(zero_copy_only=False)) for t in refs
             if t.num_rows]
        ).astype(np.int64)
        return _peel_driver(a, b)

    # --- distributed peel: one degree groupby + membership filter/round --
    cur = canon
    for _ in range(max_rounds):
        deg = (
            cur.map_batches(
                lambda t: pa.table(
                    {
                        "node": pa.concat_arrays(
                            [
                                t["a"].combine_chunks()
                                if isinstance(t["a"], pa.ChunkedArray)
                                else t["a"],
                                t["b"].combine_chunks()
                                if isinstance(t["b"], pa.ChunkedArray)
                                else t["b"],
                            ]
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Count(alias_name="d"))
            .materialize()
        )
        under = deg.map_batches(
            lambda t: t.filter(pc.less(t["d"], pa.scalar(k, pa.int64()))),
            batch_format="pyarrow",
        ).count()
        if under == 0:
            ddf = deg.to_pandas()  # O(core nodes); final result grain
            ddf = ddf[ddf["d"] >= k]
            return pd.DataFrame(
                {
                    "node": ddf["node"].astype("int64").values,
                    "core_degree": ddf["d"].astype("int64").values,
                }
            ).sort_values("node").reset_index(drop=True)
        alive_tbl = deg.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["d"], pa.scalar(k, pa.int64()))
            ),
            batch_format="pyarrow",
        ).to_pandas()
        alive = np.sort(alive_tbl["node"].to_numpy().astype(np.int64))
        aref = ray.put(alive)

        def _member_filter(t: pa.Table, _aref=aref) -> pa.Table:
            al = ray.get(_aref)
            a_ = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            b_ = np.asarray(t["b"].to_numpy(zero_copy_only=False))
            if len(al) == 0:
                return t.slice(0, 0)
            pa_i = np.clip(np.searchsorted(al, a_), 0, len(al) - 1)
            pb_i = np.clip(np.searchsorted(al, b_), 0, len(al) - 1)
            keep = (al[pa_i] == a_) & (al[pb_i] == b_)
            return t.filter(pa.array(keep))

        cur = cur.map_batches(
            _member_filter, batch_format="pyarrow"
        ).materialize()
    raise RuntimeError(
        f"kcore_nodes: no fixpoint after max_rounds={max_rounds} peel "
        "rounds — raise the cap for extreme cascade depths"
    )
