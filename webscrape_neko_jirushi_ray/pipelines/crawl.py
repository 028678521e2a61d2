"""The URL-frontier crawl loop: BFS with host priority + politeness budgets.

Ray-Data rebuild of the reference crawl proper
(comprehensive_scraper.py:284-347 — the sequential page loop — and
smart_cat_discovery.py's BFS link discovery). The reference's wall-clock
sleeps become a deterministic per-host-per-round fetch budget, so the crawl
order is a pure function of (seed list, budget) — that is the contract the
golden fixtures pin (SURVEY.md §5.2, tests/oracle_crawler.py).

## Pinned ordering contract (engine == sequential oracle)

- every URL gets a ``discovery_seq`` (seeds: their list position; discovered
  links: assigned in (parent visit order, link position) order, densely,
  after the current max);
- a URL enters the frontier at most once: membership in the sharded
  seen-set (state/seen.py) is checked at *discovery* time — the analog of
  the reference's ``discovered_urls`` set (smart_cat_discovery.py:141-143);
- each round visits, per true host, the ``host_budget_per_round`` pending
  URLs with the smallest discovery_seq (politeness, ST4); the rest stay
  pending with their seq (deferral never reorders);
- visit order within a round sorts by ``(host_priority, discovery_seq)``
  where host_priority = min pending discovery_seq of the true host — the
  BFS-with-host-priority order the north_star names (O7);
- ``target_urls`` truncates the final round's visit list in visit order
  (comprehensive_scraper.py:334-336).

## Physical plan per round — BFS mode (link expansion on)

pending (Arrow) → groupby(salted host).map_groups(top-B by seq)   [skew-safe]
  → true-host re-take + priority sort (bounded by budget x hosts)
  → map_batches(fetch+extract tasks, per-worker fetcher memo)
    [page-table join ST1/J3/S2 fused with stages/extract.py, zero-copy
     Arrow; doc shards written task-side]
  → links explode → seen-set add_if_absent (J1 anti-join) → next pending

BFS mode's per-round control plane is bounded by budget × live hosts ×
links/page (the politeness budget is the point of this mode), never by
frontier size.

## Physical plan per round — fetch-list mode (``crawl_fetch_list``)

The 10^10-scale headline job (no link expansion) is FULLY STREAMED: the
frontier is a Dataset/parquet; the seen anti-join runs per batch inside
tasks; the per-host budget + dense visit enumeration run as a partials
pass (driver state = live hosts) + one groupby over sub-host seq ranges
with exact counted sizes (parallelism = hosts x ranges); fetch order is
re-sorted to the page-store's buckets; visit-log shards and doc shards
are written task-side with idempotent names; deferred rows hand off
round-to-round as parquet. Driver state per round: scalar counters, a
live-hosts table, O(#batches) summary rows.
"""

from __future__ import annotations

import os
import time as _time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import CrawlConfig
from ..functions.urlkit import (
    add_url_key_columns,
    canonicalize_url,
    sha1_col_to_u64,
    url_sha1,
)
from ..sources.pages import BroadcastPageStore, PartitionedPageStore
from ..stages.extract import extract_batch
from ..state import checkpoint as ckpt
from ..state.seen import ShardedSeenSet

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),          # canonical
        ("url_sha1", pa.binary()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
        ("parent_url", pa.string()),
    ]
)

VISITS_SCHEMA = pa.schema(
    [
        ("visit_idx", pa.int64()),
        ("url", pa.string()),
        ("url_sha1", pa.binary()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
        ("round", pa.int32()),
        ("fetch_status", pa.string()),
        # canonical POST-redirect URL when the fetch was redirected (live
        # HTTP follows 3xx implicitly, like the reference's requests);
        # empty string when the final URL is the requested one
        ("redirect_to", pa.string()),
    ]
)


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def seeds_to_frontier(seed_urls: list[str]) -> pa.Table:
    """Seed list → frontier rows with discovery_seq = list position.

    Canonicalization and netloc extraction are vectorized
    (:func:`..functions.urlkit.canonicalize_column`); the frontier's
    ``host`` keeps the historical netloc semantics (``split("/")[2]`` —
    port INCLUDED, unlike ``host_of``), so the budget groups and the
    golden crawl order are byte-identical to the row-wise build."""
    import pyarrow.compute as _pc

    from ..functions.urlkit import canonicalize_column

    canon_arr = canonicalize_column(
        pa.array(seed_urls, type=pa.string())
    )
    canon = canon_arr.to_pylist()
    cap = _pc.struct_field(
        _pc.extract_regex(canon_arr, r"^[^/]*//(?P<h>[^/]*)"), "h"
    )
    if cap.null_count:
        # non-//-urls keep the exact historical failure/behavior
        hosts = pa.array(
            [u.split("/")[2] for u in canon], type=pa.string()
        )
    else:
        hosts = cap if isinstance(cap, pa.Array) else cap.combine_chunks()
    return pa.table(
        {
            "url": canon_arr,
            "url_sha1": pa.array([url_sha1(u) for u in canon], type=pa.binary()),
            "host": hosts,
            "depth": pa.array([0] * len(canon), type=pa.int32()),
            "discovery_seq": pa.array(range(len(canon)), type=pa.int64()),
            "parent_url": pa.array([""] * len(canon), type=pa.string()),
        }
    )


# Per-worker fetcher memo: the fetch stage runs as STATELESS TASKS with the
# fetcher built once per worker process and reused across rounds. An actor
# pool would rebuild its actors on every round's map_batches execution
# (cold-start per round); task workers stay warm for the whole job, which
# is also the multi-node behavior. The fetcher is the ST1 state analog
# (session/robots cache); construction cost is amortized identically.
_FETCHER_CACHE: dict[str, object] = {}


def _cached_fetch_extract(key, store, respect_robots, docs_dir, batch):
    """Module-level memo lookup. MUST stay a module-level function: a
    NESTED closure that names ``_FETCHER_CACHE`` gets the cache contents
    captured BY VALUE by cloudpickle (nested functions serialize their
    referenced globals), so a driver-side inline round that cached a
    fetcher holding unpicklable state (HttpFetcher's thread lock / pool)
    would break serialization of every later fetch stage. A module-level
    function is pickled by reference and each process resolves the global
    locally."""
    actor = _FETCHER_CACHE.get(key)
    if actor is None:
        actor = FetchExtractActor(store, respect_robots=respect_robots)
        _FETCHER_CACHE[key] = actor
    return actor(batch, docs_dir=docs_dir)


def make_fetch_extract_fn(store, docs_dir: str | None = None,
                          respect_robots: bool = True):
    """Returns a map_batches fn that lazily builds (once per worker) and
    reuses the store's fetcher. The cache key must be stable across task
    deserializations (id() is not), so stores expose ``cache_key()``. The
    closure captures only (key, store, docs_dir) — never the cache."""
    key = (store.cache_key(), respect_robots)

    def _fn(batch: pa.Table) -> pa.Table:
        return _cached_fetch_extract(key, store, respect_robots, docs_dir, batch)

    return _fn


class FetchExtractActor:
    """ST1+S2+J3: the stateful fetch stage. Holds the page-store fetcher
    (session/robots-cache analog) built once per actor in __init__, resolves
    each batch of frontier rows against the page table, then runs extraction
    in the same pass (fused fetch→extract: the html bytes never re-enter the
    object store).

    With ``docs_dir`` set, the heavy extracted payload (text, metadata,
    image structs) is written straight to a parquet shard FROM THE TASK —
    partition-replacing (shard name = content-derived, rewrites on retry
    are idempotent) — and only the frontier control columns + links +
    fetch_status return to the driver. That keeps the driver's per-round
    working set proportional to the frontier, never to the page payloads.

    Robots: per-host robots.txt is fetched through the same page store and
    parsed ONCE per worker (the ST1 robots-cache the north_star names);
    denied rows get fetch_status='robots_denied' and never hit the store."""

    def __init__(self, store, respect_robots: bool = True):
        self.fetcher = store.make_fetcher()
        self.respect_robots = respect_robots
        self.robots_cache: dict[str, list] = {}

    def _robots_rules(self, host: str, sample_url: str) -> list:
        rules = self.robots_cache.get(host)
        if rules is None:
            from ..functions.robotskit import parse_robots_full, robots_url_for
            from ..functions.urlkit import canonicalize_url, url_sha1 as _sha

            rurl = canonicalize_url(robots_url_for(sample_url))
            if hasattr(self.fetcher, "fetch_by_sha1"):
                page = self.fetcher.fetch_by_sha1([rurl], [_sha(rurl)])
            else:
                page = self.fetcher.fetch([rurl])
            body = page["html"][0].as_py()
            status = page["fetch_status"][0].as_py()
            if status == "ok" and body:
                rules, crawl_delay = parse_robots_full(
                    body.decode("utf-8", errors="replace")
                )
                # Crawl-delay feeds the live-HTTP token bucket (ST4)
                if crawl_delay and crawl_delay > 0 and hasattr(self.fetcher, "limiter"):
                    self.fetcher.limiter.set_rate(host, 1.0 / crawl_delay)
            elif status == "notfound" or status == "ok":
                rules = []  # no robots.txt (404) / empty body -> allow all
            else:
                # unreachable robots.txt (5xx / timeout / network error):
                # fail CLOSED per RFC 9309 §2.3.1.4 (cached for this
                # worker's lifetime; the HTTP fetcher already retried with
                # backoff before reporting the error)
                from ..functions.robotskit import DISALLOW_ALL

                rules = DISALLOW_ALL
            self.robots_cache[host] = rules
        return rules

    def _robots_mask(self, batch: pa.Table):
        """Boolean list: True = allowed to fetch."""
        from ..functions.robotskit import is_allowed, path_of

        hosts = batch["host"].to_pylist()
        urls = batch["url"].to_pylist()
        allowed = []
        for h, u in zip(hosts, urls):
            rules = self._robots_rules(h, u)
            allowed.append(True if not rules else is_allowed(rules, path_of(u)))
        return allowed

    def __call__(self, batch: pa.Table, docs_dir: str | None = None) -> pa.Table:
        urls = batch["url"].to_pylist()
        if self.respect_robots:
            allowed = self._robots_mask(batch)
        else:
            allowed = [True] * len(urls)
        fetch_rows = batch.filter(pa.array(allowed))
        if fetch_rows.num_rows:
            if hasattr(self.fetcher, "fetch_by_sha1"):
                pages = self.fetcher.fetch_by_sha1(
                    fetch_rows["url"].to_pylist(),
                    fetch_rows["url_sha1"].to_pylist(),
                )
            else:
                pages = self.fetcher.fetch(fetch_rows["url"].to_pylist())
        else:
            pages = None
        # stitch statuses (and redirect finals, when the fetcher reports
        # them — the live-HTTP path follows 3xx implicitly) back in
        # original row order
        fetched_status = pages["fetch_status"].to_pylist() if pages is not None else []
        fetched_finals = (
            pages["final_url"].to_pylist()
            if pages is not None and "final_url" in pages.column_names
            else None
        )
        status_list = []
        redirect_list = []
        it = iter(fetched_status)
        itf = iter(fetched_finals or [])
        for a, u in zip(allowed, urls):
            status_list.append(next(it) if a else "robots_denied")
            f = next(itf) if (a and fetched_finals is not None) else None
            if f:
                canon_f = canonicalize_url(f)
                redirect_list.append(canon_f if canon_f != u else "")
            else:
                redirect_list.append("")
        status = pa.array(status_list, type=pa.string())
        redirect_to = pa.array(redirect_list, type=pa.string())
        ok_mask = pc.equal(status, "ok")  # over the FULL batch
        ok_pages = (
            pages.filter(pc.equal(pages["fetch_status"], "ok"))
            if pages is not None
            else None
        )
        docs = (
            extract_batch(ok_pages)
            if ok_pages is not None and ok_pages.num_rows
            else None
        )

        if docs is not None and docs_dir is not None:
            shard = hashlib_sha1_hex(batch["url_sha1"][0].as_py())[:16]
            os.makedirs(docs_dir, exist_ok=True)
            tmp = os.path.join(docs_dir, f".part-{shard}.tmp")
            pq.write_table(docs, tmp)
            os.replace(tmp, os.path.join(docs_dir, f"part-{shard}.parquet"))

        out = batch.append_column("fetch_status", status)
        out = out.append_column("redirect_to", redirect_to)
        # vectorized left-attach of the control doc columns: extract_batch
        # preserves row order, so ok row i maps to docs row rank_i =
        # cumsum(ok)-1; pc.take with null indices fills misses with null
        okm = ok_mask.to_numpy(zero_copy_only=False)
        import numpy as np

        rank = np.cumsum(okm) - 1
        idx = pa.array(
            np.where(okm, rank, -1), type=pa.int64(), mask=~okm
        )
        for name in ("links", "n_links", "n_images"):
            col = (
                pc.take(docs[name], idx)
                if docs is not None
                else pa.nulls(out.num_rows, CONTROL_DOC_TYPES[name])
            )
            out = out.append_column(name, col)
        return out


CONTROL_DOC_TYPES = {
    "links": pa.list_(pa.string()),
    "n_links": pa.int32(),
    "n_images": pa.int32(),
}


def hashlib_sha1_hex(b: bytes) -> str:
    import hashlib

    return hashlib.sha1(b).hexdigest()


def _slice_parts(
    work: pa.Table, n_parts: int, *, host_aligned: bool = False
) -> list[pa.Table]:
    """Zero-copy slices of a (sorted) work table into ~n_parts blocks.

    With ``host_aligned`` (live-HTTP politeness), ``work`` is host-sorted
    and every cut moves forward to the next host boundary, so one host's
    rows always land in exactly one part — the per-worker token bucket then
    enforces the true per-host rate."""
    step = -(-work.num_rows // max(1, n_parts))
    if not host_aligned:
        return [
            work.slice(i * step, step)
            for i in range(n_parts)
            if i * step < work.num_rows
        ]
    hosts_sorted = work["host"].to_pylist()
    cuts = [0]
    for i in range(1, n_parts):
        c = i * step
        while c < work.num_rows and hosts_sorted[c] == hosts_sorted[c - 1]:
            c += 1
        if c > cuts[-1] and c < work.num_rows:
            cuts.append(c)
    cuts.append(work.num_rows)
    return [
        work.slice(lo, hi - lo) for lo, hi in zip(cuts[:-1], cuts[1:]) if hi > lo
    ]


@dataclass
class CrawlResult:
    out_dir: str
    rounds: int
    # BFS mode materializes the visit log eagerly (bounded by budget x
    # hosts x rounds). The streamed fetch-list mode sets this None — visits
    # live as task-written parquet shards (visits_dirs); use
    # ``visits_table()`` (small runs) or ``visits_dataset()`` (any size).
    visits: pa.Table | None
    docs_paths: list[str] = field(default_factory=list)
    visits_count: int = -1
    visits_dirs: list[str] = field(default_factory=list)

    def __post_init__(self):
        if self.visits_count < 0:
            self.visits_count = self.visits.num_rows if self.visits is not None else 0

    def visits_shard_files(self) -> list[str]:
        out = []
        for d in self.visits_dirs:
            if os.path.isdir(d):
                out.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        return out

    def visits_table(self) -> pa.Table:
        """Visit log in visit order. DRIVER-MATERIALIZING — small runs and
        tests only; at scale read ``visits_dataset()``."""
        if self.visits is not None:
            return self.visits
        files = self.visits_shard_files()
        if not files:
            return _empty(VISITS_SCHEMA)
        return pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="default"
        ).sort_by("visit_idx")

    def visits_dataset(self) -> "ray.data.Dataset":
        files = self.visits_shard_files()
        if not files and self.visits is not None:
            return ray.data.from_arrow(self.visits)
        return ray.data.read_parquet(files)

    def visited_sha1s(self) -> set[bytes]:
        v = self.visits_table()
        ok = v.filter(pc.equal(v["fetch_status"], "ok"))
        return set(ok["url_sha1"].to_pylist())

    def nonempty_docs_paths(self) -> list[str]:
        """All docs shard FILES across rounds (ray.data.read_parquet does
        not expand directories when given a list, and rounds where every
        fetch 404'd have no shards at all)."""
        out = []
        for d in self.docs_paths:
            if os.path.isdir(d):
                out.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        return out


def _take_budget(pending: pa.Table, cfg: CrawlConfig) -> tuple[pa.Table, pa.Table]:
    """Split pending into (taken, deferred) by the per-true-host budget.

    Physical plan: groupby over the SALTED host key takes top-B per
    sub-bucket (so one dominant host fans out over S reducers — skew
    defusal per the north_rule), then a cheap second take over the
    S×B-bounded winners enforces the budget per TRUE host. Correct because
    per-bucket top-B ⊇ per-host top-B.
    """
    if pending.num_rows == 0:
        return _empty(FRONTIER_SCHEMA), _empty(FRONTIER_SCHEMA)

    B = cfg.host_budget_per_round
    if B >= pending.num_rows:
        # budget cannot bind (throughput / fetch-list mode): take all
        return pending, _empty(FRONTIER_SCHEMA)

    import numpy as np
    import pandas as _pd

    def _rank_within_host(tbl: pa.Table) -> np.ndarray:
        """Vectorized per-host rank by discovery_seq (0-based)."""
        df = _pd.DataFrame(
            {
                "host": tbl["host"].to_pandas(),
                "seq": tbl["discovery_seq"].to_numpy(zero_copy_only=False),
            }
        )
        return (
            df.sort_values("seq", kind="mergesort")
            .groupby("host")
            .cumcount()
            .reindex(df.index)
            .to_numpy()
        )

    def _topb(group: pa.Table) -> pa.Table:
        g = group.sort_by("discovery_seq")
        return g.slice(0, B)

    if pending.num_rows <= cfg.control_inline_threshold:
        # metadata-only control plane: one vectorized pass, no Ray job
        rank = _rank_within_host(pending)
        win = pending.filter(pa.array(rank < B))
    else:
        # distributed: top-B per SALTED sub-bucket (skew defusal — one
        # dominant host fans out over S reducers), then re-enforce per
        # TRUE host over the hosts x S x B-bounded winners
        from ..functions.urlkit import sha1_first_byte

        salt = sha1_first_byte(pending["url_sha1"]) % cfg.host_salt_buckets
        salted = pa.array(
            [f"{h}#{s}" for h, s in zip(pending["host"].to_pylist(), salt)],
            type=pa.string(),
        )
        ds = ray.data.from_arrow(pending.append_column("salted_host", salted))
        winners = (
            ds.groupby("salted_host")
            .map_groups(_topb, batch_format="pyarrow")
            .to_arrow_refs()
        )
        win = pa.concat_tables(
            [ray.get(r) for r in winners], promote_options="default"
        )
        if win.num_rows:
            win = win.drop_columns(["salted_host"])
            rank = _rank_within_host(win)
            win = win.filter(pa.array(rank < B))
    if win.num_rows == 0:
        return _empty(FRONTIER_SCHEMA), _empty(FRONTIER_SCHEMA)

    # deferred = pending minus winners (vectorized anti-join on url_sha1)
    taken_set = pa.array(win["url_sha1"].to_pylist(), type=pa.binary())
    defer_mask = pc.invert(pc.is_in(pending["url_sha1"], value_set=taken_set))
    deferred = pending.filter(defer_mask)
    return win, deferred


def _visit_order(taken: pa.Table) -> pa.Table:
    """Sort the round's work set by (host_priority, discovery_seq);
    host_priority = min discovery_seq among the host's TAKEN rows."""
    if taken.num_rows == 0:
        return taken
    if "host_priority" in taken.column_names:
        taken = taken.drop_columns(["host_priority"])
    import numpy as np
    import pandas as _pd

    hosts = taken["host"].to_pandas()
    seq = taken["discovery_seq"].to_numpy(zero_copy_only=False)
    prio = (
        _pd.DataFrame({"host": hosts, "seq": seq})
        .groupby("host")["seq"]
        .transform("min")
        .to_numpy()
    )
    order = np.lexsort((seq, prio))
    t = taken.append_column("host_priority", pa.array(prio, type=pa.int64()))
    return t.take(pa.array(order, type=pa.int64()))


def crawl(
    page_store,
    seed_urls: list[str],
    out_dir: str,
    cfg: CrawlConfig = CrawlConfig(),
    resume: bool = False,
    seen_set: ShardedSeenSet | None = None,
    seed_frontier: pa.Table | None = None,
) -> CrawlResult:
    """Run the frontier loop. ``page_store`` is a BroadcastPageStore or
    PartitionedPageStore. Writes per-round checkpoints under ``out_dir``;
    with ``resume=True`` continues after the last complete round.
    ``seen_set``: inject a pre-spawned (empty or warm) seen-set actor pool —
    the caller then owns its lifecycle; by default one is created and torn
    down here. ``seed_frontier``: a pre-keyed FRONTIER_SCHEMA table (e.g.
    read from frontier parquet, the 10^10-scale input) used instead of
    keying ``seed_urls`` on the driver.

    ``expand_links=False`` always takes the STREAMED implementation
    (``_fetch_list_inner``): the frontier lives as a Dataset/parquet, the
    seen anti-join and visit-log writes happen inside tasks, and the
    driver never holds frontier- or visit-sized tables.
    ``expand_links=True`` routes by ``cfg.streamed_bfs``: None (default)
    auto-selects the streamed BFS when the SEED frontier has at least
    ``cfg.streamed_bfs_threshold`` rows (the 10^10-scale shape) and the
    classic driver-loop BFS below it (whose control plane is bounded by
    budget x hosts x rounds and has ~zero fixed per-round cost — the
    right engine for small crawls); True/False force one engine. Both are
    oracle-equal (pinned by tests/test_streamed_bfs.py)."""
    os.makedirs(out_dir, exist_ok=True)
    own = seen_set is None
    seen = seen_set or ShardedSeenSet(
        cfg.seen_shards, cfg.seen_mode, cfg.seen_capacity_per_shard
    )
    try:
        use_streamed = not cfg.expand_links
        if cfg.expand_links:
            if cfg.streamed_bfs is not None:
                use_streamed = cfg.streamed_bfs
            else:
                n_seed = (
                    seed_frontier.num_rows
                    if seed_frontier is not None
                    else len(seed_urls)
                )
                use_streamed = n_seed >= cfg.streamed_bfs_threshold
        if use_streamed:
            frontier = (
                seed_frontier
                if seed_frontier is not None
                else seeds_to_frontier(seed_urls)
            )
            return _fetch_list_inner(page_store, frontier, out_dir, cfg, resume, seen)
        return _crawl_inner(
            page_store, seed_urls, out_dir, cfg, resume, seen, seed_frontier
        )
    finally:
        if own:
            seen.shutdown()


def crawl_fetch_list(
    page_store,
    frontier: "pa.Table | str | ray.data.Dataset",
    out_dir: str,
    cfg: CrawlConfig = CrawlConfig(),
    resume: bool = False,
    seen_set: ShardedSeenSet | None = None,
    seen_epoch: int = 0,
) -> CrawlResult:
    """Streamed fetch-list crawl: visit every frontier URL (per-host budget
    per round, priority order) WITHOUT link expansion, never materializing
    frontier- or visit-sized data on the driver. ``frontier`` is a
    FRONTIER_SCHEMA Arrow table, a parquet path/dir, or a Dataset."""
    os.makedirs(out_dir, exist_ok=True)
    own = seen_set is None
    seen = seen_set or ShardedSeenSet(
        cfg.seen_shards, cfg.seen_mode, cfg.seen_capacity_per_shard
    )
    try:
        return _fetch_list_inner(
            page_store, frontier, out_dir, cfg, resume, seen, seen_epoch
        )
    finally:
        if own:
            seen.shutdown()


def _crawl_inner(
    page_store, seed_urls, out_dir, cfg, resume, seen, seed_frontier=None
) -> CrawlResult:
    visits_acc: list[pa.Table] = []
    docs_paths: list[str] = []
    start_round = 0
    visited_total = 0
    next_seq = 0

    if resume and (last := ckpt.last_complete_round(out_dir)) >= 0:
        m = ckpt.read_manifest(out_dir, last)
        # The idempotent-replay contract (checkpoint.py) holds only when
        # the boundary-shaping config is IDENTICAL: batch boundaries (and
        # so task-side docs-shard names) derive from fetch_concurrency /
        # batch sizes, so replaying a crashed round under a different value
        # would leave stale shards beside the new ones. Run-control knobs
        # (max_rounds, target_urls) may differ. Fail loudly on mismatch...
        want = ckpt.resume_compat_hash(cfg)
        got = m.get("resume_hash")
        if got is not None and got != want:
            raise ValueError(
                f"resume config mismatch: checkpoint was written with config "
                f"{got}, current config hashes to {want} — resume with the "
                f"original CrawlConfig or start a fresh out_dir"
            )
        # ...and sweep every incomplete round dir (> last manifest) so a
        # crashed attempt's partial docs/visits shards can't survive into
        # this run's outputs.
        import shutil

        for name in sorted(os.listdir(out_dir)):
            if name.startswith("round_"):
                try:
                    r = int(name.split("_")[1])
                except (IndexError, ValueError):
                    continue
                if r > last:
                    shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        seen.restore(os.path.join(ckpt.round_dir(out_dir, last), "seen"))
        pending = pq.read_table(
            os.path.join(ckpt.round_dir(out_dir, last), "frontier_next.parquet")
        )
        start_round = last + 1
        visited_total = m["visited_total"]
        next_seq = m["next_seq"]
        for r in range(last + 1):
            vp = os.path.join(ckpt.round_dir(out_dir, r), "visits.parquet")
            visits_acc.append(pq.read_table(vp))
            docs_paths.append(os.path.join(ckpt.round_dir(out_dir, r), "docs"))
    else:
        frontier = (
            seed_frontier if seed_frontier is not None else seeds_to_frontier(seed_urls)
        )
        fresh = seen.add_if_absent(frontier["url_sha1"].to_pylist())
        pending = frontier.filter(pa.array(fresh))
        next_seq = pending.num_rows

    for rnd in range(start_round, cfg.max_rounds):
        if pending.num_rows == 0:
            break
        if cfg.target_urls is not None and visited_total >= cfg.target_urls:
            break

        taken, deferred = _take_budget(pending, cfg)
        ordered = _visit_order(taken)
        if cfg.target_urls is not None:
            room = cfg.target_urls - visited_total
            if ordered.num_rows > room:
                # over-target rows behave like deferred pending
                overflow = ordered.slice(room)
                keep_cols = [f.name for f in FRONTIER_SCHEMA]
                deferred = pa.concat_tables(
                    [deferred, overflow.select(keep_cols)], promote_options="default"
                )
                ordered = ordered.slice(0, room)
        if ordered.num_rows == 0:
            break

        round_t0 = _time.perf_counter()
        rdir = ckpt.round_dir(out_dir, rnd)
        os.makedirs(rdir, exist_ok=True)
        docs_dir = os.path.join(rdir, "docs")
        os.makedirs(docs_dir, exist_ok=True)

        # --- fetch + extract (task pool over the ordered work set) -------
        # extracted doc payloads are written to parquet shards FROM THE
        # TASKS; only control columns (frontier + links + status) return
        if ordered.num_rows <= cfg.small_round_threshold:
            # same kernel, inline (one task's worth of work); the memo
            # keeps fetcher + robots cache warm across rounds
            fetched = make_fetch_extract_fn(
                page_store, docs_dir=docs_dir, respect_robots=cfg.respect_robots
            )(ordered)
        else:
            # fetch order is irrelevant (visit order is restored below), so
            # co-locate each batch with its page-store bucket: sorting by
            # bucket turns B x batches scattered point-lookups into ~one
            # bucket scan per batch (the partitioned-store fast path)
            import numpy as np

            nb = getattr(page_store, "num_buckets", 0)
            work = ordered
            host_aligned = False
            if nb:
                from ..functions.urlkit import sha1_first_byte

                b = sha1_first_byte(ordered["url_sha1"]) % nb
                order_idx = np.argsort(b, kind="stable")
                work = ordered.take(pa.array(order_idx, type=pa.int64()))
            elif getattr(page_store, "rate_per_host", None) is not None:
                # LIVE-HTTP politeness: token buckets live per worker, so a
                # host's URLs must land in ONE task per round or the global
                # rate multiplies by the worker count. Sort by host and cut
                # part boundaries on host changes.
                work = ordered.sort_by("host")
                host_aligned = True
            # from_arrow(one table) yields ONE block = one task; slice the
            # table driver-side into concurrency*2 blocks so the whole
            # worker pool gets work (a Repartition op would deadlock against
            # an actor pool that reserves every CPU). Slices are zero-copy
            # and preserve the sorted order.
            n_parts = min(work.num_rows, max(cfg.fetch_concurrency * 4, 2))
            step = -(-work.num_rows // n_parts)
            parts = _slice_parts(work, n_parts, host_aligned=host_aligned)
            per_batch = max(cfg.fetch_batch_size, step)
            work_ds = ray.data.from_arrow(parts)
            # stateless tasks + per-worker fetcher memo: warm workers are
            # reused across rounds (an actor pool cold-starts every round)
            fetched_ds = work_ds.map_batches(
                make_fetch_extract_fn(
                    page_store, docs_dir=docs_dir,
                    respect_robots=cfg.respect_robots,
                ),
                batch_format="pyarrow",
                batch_size=per_batch,
            )
            fetched = pa.concat_tables(
                [ray.get(r) for r in fetched_ds.to_arrow_refs()],
                promote_options="default",
            )
        # restore visit order (map_batches may deliver blocks out of
        # order). expand_links=False never reaches this loop — crawl()
        # routes it to the streamed _fetch_list_inner.
        fetched = _visit_order(fetched)

        # --- visit log ----------------------------------------------------
        n = fetched.num_rows
        visit_idx = pa.array(
            range(visited_total, visited_total + n), type=pa.int64()
        )
        visits = pa.table(
            {
                "visit_idx": visit_idx,
                "url": fetched["url"],
                "url_sha1": fetched["url_sha1"],
                "host": fetched["host"],
                "depth": fetched["depth"],
                "discovery_seq": fetched["discovery_seq"],
                "round": pa.array([rnd] * n, type=pa.int32()),
                "fetch_status": fetched["fetch_status"],
                "redirect_to": (
                    fetched["redirect_to"]
                    if "redirect_to" in fetched.column_names
                    else pa.array([""] * n, type=pa.string())
                ),
            }
        )
        visited_total += n
        visits_acc.append(visits)
        ckpt.write_table_atomic(visits, os.path.join(rdir, "visits.parquet"))

        # redirect targets become SEEN under their canonical identity, so
        # a later discovery of the final URL is never fetched again (the
        # source alias was marked seen at its own discovery time)
        rt = [u for u in visits["redirect_to"].to_pylist() if u]
        if rt:
            seen.add_if_absent([url_sha1(u) for u in rt])

        # docs shards were written by the fetch tasks (partition-replacing)
        ok = fetched.filter(pc.equal(fetched["fetch_status"], "ok"))
        docs_paths.append(docs_dir)

        # --- frontier expansion ------------------------------------------
        # vectorized explode: list_flatten preserves (row, element) order —
        # exactly the (parent visit order, link position) discovery contract
        links_col = pa.chunked_array(
            ok["links"].chunks or [pa.array([], pa.list_(pa.string()))]
        )
        flat = pc.list_flatten(links_col)
        if len(flat):
            parent_idx = pc.list_parent_indices(links_col)
            cand = pa.table(
                {
                    "url": flat,
                    "parent_url": pc.take(ok["url"], parent_idx),
                    "depth": pc.cast(
                        pc.add(pc.take(ok["depth"], parent_idx), 1), pa.int32()
                    ),
                }
            )
            if cand.num_rows > cfg.control_inline_threshold:
                # huge discovery round: distribute the canonicalize+SHA1
                # keying (order restored by re-sorting on a position col)
                posd = cand.append_column(
                    "_pos", pa.array(range(cand.num_rows), type=pa.int64())
                )
                n_parts = max(2, cfg.fetch_concurrency * 2)
                step = -(-posd.num_rows // n_parts)
                parts = [
                    posd.slice(i * step, step)
                    for i in range(n_parts)
                    if i * step < posd.num_rows
                ]
                keyed = (
                    ray.data.from_arrow(parts)
                    .map_batches(add_url_key_columns, batch_format="pyarrow")
                    .to_arrow_refs()
                )
                cand = pa.concat_tables(
                    [ray.get(r) for r in keyed], promote_options="default"
                ).sort_by("_pos").drop_columns(["_pos"])
            else:
                cand = add_url_key_columns(cand)
            # within-round keep-first dedup by canon url (discovery order)
            import pandas as _pd

            first_idx = (
                _pd.Series(cand["url_sha1"].to_pylist()).drop_duplicates().index.to_numpy()
            )
            cand = cand.take(pa.array(first_idx, type=pa.int64()))
            fresh = seen.add_if_absent(cand["url_sha1"].to_pylist())
            cand = cand.filter(pa.array(fresh))
            k = cand.num_rows
            new_frontier = pa.table(
                {
                    "url": cand["canon_url"],
                    "url_sha1": cand["url_sha1"],
                    "host": cand["host"],
                    "depth": cand["depth"],
                    "discovery_seq": pa.array(
                        range(next_seq, next_seq + k), type=pa.int64()
                    ),
                    "parent_url": cand["parent_url"],
                }
            )
            next_seq += k
            pending = pa.concat_tables(
                [deferred, new_frontier], promote_options="default"
            )
        else:
            pending = deferred

        # --- checkpoint: snapshot THEN manifest ---------------------------
        ckpt.write_table_atomic(
            pending.select([f.name for f in FRONTIER_SCHEMA])
            if pending.num_rows
            else _empty(FRONTIER_SCHEMA),
            os.path.join(rdir, "frontier_next.parquet"),
        )
        seen.snapshot(os.path.join(rdir, "seen"))
        n_ok = int(pc.sum(pc.cast(pc.equal(fetched["fetch_status"], "ok"), pa.int64())).as_py() or 0)
        ckpt.write_manifest(
            out_dir,
            rnd,
            {
                "round": rnd,
                "visited_round": n,
                "visited_total": visited_total,
                "fetch_ok": n_ok,
                "fetch_failed": n - n_ok,
                "hosts_visited": len(set(fetched["host"].to_pylist())),
                "next_seq": next_seq,
                "pending_rows": pending.num_rows,
                "seen_size": seen.size(),
                "round_wall_sec": round(_time.perf_counter() - round_t0, 3),
                "config_hash": ckpt.config_hash(cfg),
                "resume_hash": ckpt.resume_compat_hash(cfg),
                "lineage": {"docs": os.path.join(rdir, "docs"),
                            "visits": os.path.join(rdir, "visits.parquet")},
            },
        )

    all_visits = (
        pa.concat_tables(visits_acc, promote_options="default")
        if visits_acc
        else _empty(VISITS_SCHEMA)
    )
    return CrawlResult(
        out_dir=out_dir,
        rounds=len(visits_acc),
        visits=all_visits,
        docs_paths=docs_paths,
    )


# --- streamed fetch-list mode (Dataset-native frontier) -------------------


def _frontier_dataset(frontier, n_parts: int) -> "ray.data.Dataset":
    """Normalize the frontier input to a multi-block Dataset. An Arrow
    table is sliced driver-side (zero-copy) — from_arrow(one table) would
    yield ONE block and serialize every downstream stage."""
    if isinstance(frontier, str):
        return ray.data.read_parquet(frontier)
    if isinstance(frontier, pa.Table):
        if frontier.num_rows == 0:
            return ray.data.from_arrow(frontier)
        n = min(frontier.num_rows, max(2, n_parts))
        step = -(-frontier.num_rows // n)
        return ray.data.from_arrow(
            [
                frontier.slice(i * step, step)
                for i in range(n)
                if i * step < frontier.num_rows
            ]
        )
    return frontier


_HOST_PARTIALS_DISTRIBUTED_ROWS = 2_000_000


def _host_partials(
    pending_ds: "ray.data.Dataset",
    samples_per_block: int = 32,
    *,
    distributed_threshold: int = _HOST_PARTIALS_DISTRIBUTED_ROWS,
) -> "pd_DataFrame":
    """Per-host (n rows, min discovery_seq, strided seq samples), SIZE-
    ROUTED (VERDICT r3 #7): per-batch partials are counted first; at or
    below ``distributed_threshold`` partial rows they combine on the
    driver (one cheap map pass — a shuffle costs ~4x for the same tiny
    result), above it they hash-partition by host and the SAME combine
    kernel runs per partition (``groupby(_hp).map_groups``), so an
    adversarial near-unique-host frontier never ships the uncombined
    O(hosts × blocks × samples) partial lists through the driver — only
    the combined O(live hosts) plan table, which the enumeration plan
    needs driver-side either way. The samples seed the sub-host range
    boundaries of _enumerate_visits_by_host."""
    import pandas as _pd

    def _partial(t: pa.Table) -> pa.Table:
        host = np.asarray(t["host"].to_pylist(), dtype=object)
        seq = t["discovery_seq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, host))
        h_s, s_s = host[order], seq[order]
        newgrp = np.concatenate([[True], h_s[1:] != h_s[:-1]])
        starts = np.nonzero(newgrp)[0]
        ends = np.concatenate([starts[1:], [len(h_s)]])
        counts = ends - starts
        # evenly spaced sample positions per host (ragged, vectorized):
        # within-host sample j of k lands at floor(j*(n-1)/(k-1))
        k = np.minimum(samples_per_block, counts)
        gidx = np.repeat(np.arange(len(k)), k)
        within = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
        denom = np.maximum(k[gidx] - 1, 1)
        pos = starts[gidx] + (within * (counts[gidx] - 1)) // denom
        offsets = np.concatenate([[0], np.cumsum(k)])
        samples = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(s_s[pos], type=pa.int64()),
        )
        return pa.table(
            {
                "host": pa.array(h_s[starts], type=pa.string()),
                "n": pa.array(counts, type=pa.int64()),
                "min_seq": pa.array(s_s[starts], type=pa.int64()),
                "max_seq": pa.array(s_s[ends - 1], type=pa.int64()),
                "samples": samples,
            }
        )

    def _combine(parts: "_pd.DataFrame") -> "_pd.DataFrame":
        # fully vectorized partial combine (no per-host Python) — shared
        # verbatim by the driver route (whole table) and the distributed
        # route (one hash partition per call), so results are identical
        host = parts["host"].to_numpy(dtype=object)
        order = np.argsort(host, kind="stable")
        h_s = host[order]
        newgrp = np.concatenate([[True], h_s[1:] != h_s[:-1]])
        starts = np.nonzero(newgrp)[0]
        gid_of_row = np.cumsum(newgrp) - 1  # group id per sorted row
        n = np.add.reduceat(parts["n"].to_numpy()[order], starts)
        min_seq = np.minimum.reduceat(parts["min_seq"].to_numpy()[order], starts)
        max_seq = np.maximum.reduceat(parts["max_seq"].to_numpy()[order], starts)
        # union of per-block samples: flatten, sort by (host-group, value),
        # drop adjacent dups, then CAP per host (bounded payload — a host seen
        # in many blocks would otherwise accumulate blocks x samples values)
        samp_lists = [np.asarray(x, dtype=np.int64) for x in parts["samples"].to_numpy()]
        lens = np.array([len(x) for x in samp_lists], dtype=np.int64)[order]
        flat = (
            np.concatenate([samp_lists[i] for i in order])
            if lens.sum()
            else np.empty(0, dtype=np.int64)
        )
        owner = np.repeat(gid_of_row, lens)
        so = np.lexsort((flat, owner))
        owner_s, flat_s = owner[so], flat[so]
        keep = np.concatenate(
            [[True], (owner_s[1:] != owner_s[:-1]) | (flat_s[1:] != flat_s[:-1])]
        ) if len(flat_s) else np.empty(0, dtype=bool)
        owner_u, flat_u = owner_s[keep], flat_s[keep]
        ulen = np.bincount(owner_u, minlength=len(starts))
        cap = max(samples_per_block * 4, 8)
        kk = np.minimum(ulen, cap)
        g2 = np.repeat(np.arange(len(kk)), kk)
        within = np.arange(int(kk.sum())) - np.repeat(np.cumsum(kk) - kk, kk)
        ustart = np.concatenate([[0], np.cumsum(ulen)])[:-1]
        pos = ustart[g2] + (within * (ulen[g2] - 1)) // np.maximum(kk[g2] - 1, 1)
        capped = flat_u[pos]
        bounds = np.concatenate([[0], np.cumsum(kk)])
        out_samples = [
            capped[bounds[i] : bounds[i + 1]].tolist() for i in range(len(kk))
        ]
        return _pd.DataFrame(
            {
                "host": h_s[starts],
                "n": n,
                "min_seq": min_seq,
                "max_seq": max_seq,
                "samples": out_samples,
            }
        )

    parts_ds = pending_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=65536
    ).materialize()
    n_parts = parts_ds.count()
    if n_parts == 0:
        return _pd.DataFrame(
            {"host": [], "n": [], "min_seq": [], "max_seq": [], "samples": []}
        )
    if n_parts <= distributed_threshold:
        return _combine(parts_ds.to_pandas())

    # distributed route: co-locate each host's partials by hash partition
    # and run the identical combine kernel per partition — the driver only
    # receives the combined one-row-per-host plan
    import pandas.util as _pdu

    n_hp = 64

    def _route(t: pa.Table) -> pa.Table:
        hh = _pdu.hash_array(np.asarray(t["host"].to_pylist(), dtype=object))
        return t.append_column(
            "_hp", pa.array((hh % np.uint64(n_hp)).astype(np.int64))
        )

    def _comb_part(g: "_pd.DataFrame") -> "_pd.DataFrame":
        return _combine(g.drop(columns=["_hp"]))

    return (
        parts_ds.map_batches(_route, batch_format="pyarrow")
        .groupby("_hp")
        .map_groups(_comb_part, batch_format="pandas")
        .to_pandas()
    )


@ray.remote(num_cpus=0)
class _RangeCountShard:
    """One shard of the enumeration count side-channel (see
    ``RangeCountAccumulator``). Retry-safe: each batch ships a fingerprint
    (sha1 of its discovery_seq payload — seqs are globally unique, so the
    fp identifies the batch across task retries) and duplicate fps are
    dropped. Epoch = crawl round; per-epoch state is popped when read."""

    def __init__(self):
        self._seen: dict[int, set] = {}
        self._counts: dict[int, dict[int, int]] = {}

    def add(self, epoch: int, fp: bytes, rids, cnts) -> None:
        seen = self._seen.setdefault(epoch, set())
        if fp in seen:
            return
        seen.add(fp)
        counts = self._counts.setdefault(epoch, {})
        for r, c in zip(rids.tolist(), cnts.tolist()):
            counts[r] = counts.get(r, 0) + c

    def totals(self, epoch: int):
        counts = self._counts.pop(epoch, {})
        self._seen.pop(epoch, None)
        n = len(counts)
        rids = np.fromiter(counts.keys(), np.int64, n)
        cnts = np.fromiter(counts.values(), np.int64, n)
        return rids, cnts


class RangeCountAccumulator:
    """Side-channel for the enumeration tag pass: per-batch (rid, count)
    partials accumulate here DURING the pass, replacing the separate
    counting job over the materialized tagged dataset (one fewer serial
    control-plane stage per round — measured ~0.3-0.4 s of the round's
    fixed cost). Sharded by batch fingerprint so the RPC fan-in never
    serializes on one actor: a 10^10-row round at 65536-row batches is
    ~150k partials — across K shards that's the same per-actor load the
    seen set already carries. Driver state on read is O(rid count), the
    same (host, range) plan table the enumeration already holds."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [_RangeCountShard.remote() for _ in range(num_shards)]

    def add(self, epoch: int, fp: bytes, rids, cnts):
        """Route by fp — returns the ref so the caller can block on it
        (the write barrier that makes the tag pass's materialize imply
        all partials have landed)."""
        return self.shards[fp[0] % self.num_shards].add.remote(
            epoch, fp, rids, cnts
        )

    def totals(self, epoch: int) -> tuple[np.ndarray, np.ndarray]:
        parts = ray.get([s.totals.remote(epoch) for s in self.shards])
        rids = np.concatenate([p[0] for p in parts])
        cnts = np.concatenate([p[1] for p in parts])
        if len(rids) == 0:
            return rids, cnts
        # a rid's batches can land on different shards — combine
        uniq, inv = np.unique(rids, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, cnts)
        return uniq, summed

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def _enumerate_visits_by_host(
    pending_ds: "ray.data.Dataset",
    hosts: "pd_DataFrame",
    budget: int,
    *,
    target_rows_per_range: int = 16384,
    count_acc=None,
    epoch: int = 0,
) -> "ray.data.Dataset":
    """Attach ``_vseq`` (1-based dense visit rank) and apply the per-host
    budget. The host-partitioned instance of the range-partitioned dense
    enumeration (functions/enumerate.py): every host has a UNIQUE priority
    (its min pending seq — seqs are unique), so the global
    (host_priority, discovery_seq) order decomposes into host offsets +
    within-host rank. Each host is further split into seq ranges (sampled
    boundaries, EXACT sizes from a counting pass), so the rank groupby's
    parallelism is hosts x ranges — a low-host-count frontier no longer
    serializes on the host count. Rows past the budget get ``_vseq = -1``
    (deferred). Driver state: the (host, range) table — bounded by live
    hosts + n / target_rows_per_range, never by rows; ALL plan math is
    numpy over host-sorted arrays (no per-host Python — a Common-Crawl
    frontier has 10^7-10^8 live hosts; see test_fetch_list's 100k-host
    stress test). Host lookup inside the tag pass is a hash-searchsorted
    (exact-string fallback on the ~never hash collision)."""
    import pandas as _pd
    import pandas.util as _pdu

    # --- driver: per-host range boundaries from the sampled seqs ---------
    # (vectorized ragged selection: for host i with sample list s_i and
    # n_ranges_i ranges, cut j is s_i[(j*len(s_i))//n_ranges_i])
    h = hosts.sort_values("min_seq").reset_index(drop=True)
    H = len(h)
    hostnames = h["host"].to_numpy(dtype=object)
    n_arr = h["n"].to_numpy(dtype=np.int64)
    n_ranges = np.clip(n_arr // max(1, target_rows_per_range) + 1, 1, 64)
    samp_lists = [np.asarray(s, dtype=np.int64) for s in h["samples"].to_numpy()]
    lens = np.array([len(s) for s in samp_lists], dtype=np.int64)
    flat = np.concatenate(samp_lists) if lens.sum() else np.empty(0, np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    m = np.where((n_ranges > 1) & (lens > n_ranges), n_ranges - 1, 0)
    gidx = np.repeat(np.arange(H), m)
    j = np.arange(int(m.sum())) - np.repeat(np.cumsum(m) - m, m) + 1
    cand = flat[off[gidx] + (j * lens[gidx]) // n_ranges[gidx]]
    keep = (
        np.concatenate(
            [[True], (gidx[1:] != gidx[:-1]) | (cand[1:] != cand[:-1])]
        )
        if len(cand)
        else np.empty(0, dtype=bool)
    )
    cuts_vals = cand[keep]
    ncuts = np.bincount(gidx[keep], minlength=H).astype(np.int64)
    cuts_start = np.concatenate([[0], np.cumsum(ncuts)])[:-1]
    ranges_per_host = ncuts + 1
    rid_base = np.concatenate([[0], np.cumsum(ranges_per_host)])[:-1]
    n_rids = int(ranges_per_host.sum())

    # --- host lookup table for the tag pass: hash-sorted arrays ----------
    hh = _pdu.hash_array(hostnames) if H else np.empty(0, np.uint64)
    use_hash = len(np.unique(hh)) == H
    keys = hh if use_hash else hostnames
    hord = np.argsort(keys, kind="stable")
    plan_ref = ray.put(
        (
            keys[hord],
            rid_base[hord],
            cuts_start[hord],
            ncuts[hord],
            cuts_vals,
            use_hash,
        )
    )

    acc = count_acc if count_acc is not None else RangeCountAccumulator(2)

    def _tag(t: pa.Table) -> pa.Table:
        import hashlib as _hashlib

        ks, base_s, cstart_s, ncuts_s, cvals, hashed = ray.get(plan_ref)
        bh = np.asarray(t["host"].to_pylist(), dtype=object)
        q = _pdu.hash_array(bh) if hashed else bh
        pos = np.searchsorted(ks, q)
        seqs = t["discovery_seq"].to_numpy(zero_copy_only=False)
        rid = base_s[pos].copy()
        nc = ncuts_s[pos]
        # rank within host = #cuts <= seq; loop over CUT SLOTS (<=63, most
        # hosts have few), vectorized over rows — not over hosts. Indices
        # are clipped because numpy gathers masked lanes too (a no-cut
        # host after the last cut-bearing one would index past cvals).
        for jj in range(int(nc.max()) if len(nc) and len(cvals) else 0):
            has = nc > jj
            cj = cvals[np.minimum(cstart_s[pos] + jj, len(cvals) - 1)]
            rid += (has & (cj <= seqs)).astype(np.int64)
        # EXACT range sizes, fused into this pass: per-batch partials to
        # the accumulator (was a separate counting job over the
        # materialized tagged dataset). The fp is the batch's identity
        # under task retries; the blocking get is the write barrier that
        # makes materialize() below imply all partials have landed.
        uniq, cnt = np.unique(rid, return_counts=True)
        fp = _hashlib.sha1(np.ascontiguousarray(seqs).tobytes()).digest()
        ray.get(acc.add(epoch, fp, uniq, cnt))
        return t.append_column("_rid", pa.array(rid, type=pa.int64()))

    # materialize: the tag pass feeds BOTH the accumulator totals and the
    # rank groupby — without pinning it would lazily re-execute for each
    # (measured ~half the control plane's fixed per-round cost)
    tagged = pending_ds.map_batches(
        _tag, batch_format="pyarrow", batch_size=65536
    ).materialize()
    rids_u, cnts_u = acc.totals(epoch)
    if count_acc is None:
        acc.shutdown()
    sizes = np.zeros(n_rids, dtype=np.int64)
    if len(rids_u):
        sizes[rids_u] = cnts_u

    # --- driver: per-range (taken_n, visit offset) in global visit order -
    # rid order IS (host priority, range) order, so the plan is two
    # segmented cumsums — no Python loop
    host_of_rid = np.repeat(np.arange(H), ranges_per_host)
    csum_excl = np.cumsum(sizes) - sizes
    within_excl = csum_excl - csum_excl[rid_base][host_of_rid]
    taken_per_rid = np.clip(budget - within_excl, 0, sizes)
    voff_per_rid = np.cumsum(taken_per_rid) - taken_per_rid
    plan2_ref = ray.put((taken_per_rid, voff_per_rid))

    # --- rank stage: bucket rids, one VECTORIZED multi-rid rank per
    # bucket. A per-rid map_groups pays Python-call overhead per group —
    # measured ~90 s at 100k single-range hosts; bucketing bounds the
    # group count at _RANK_BUCKETS while each group ranks all its rids
    # with one lexsort + segmented arithmetic.
    n_buckets = int(min(_RANK_BUCKETS, max(1, n_rids)))

    def _bucket_rid(t: pa.Table) -> pa.Table:
        rid = t["_rid"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_rb", pa.array((rid % n_buckets).astype(np.int64))
        )

    def _rank_bucket(g: pa.Table) -> pa.Table:
        takes, voffs = ray.get(plan2_ref)
        rid = g["_rid"].to_numpy(zero_copy_only=False)
        seq = g["discovery_seq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, rid))
        rid_s = rid[order]
        newg = np.concatenate([[True], rid_s[1:] != rid_s[:-1]])
        seg_starts = np.nonzero(newg)[0]
        pos_in_rid = np.arange(len(rid_s)) - seg_starts[np.cumsum(newg) - 1]
        vseq_s = np.where(
            pos_in_rid < takes[rid_s], voffs[rid_s] + pos_in_rid + 1, -1
        )
        vseq = np.empty(len(rid_s), dtype=np.int64)
        vseq[order] = vseq_s
        return g.append_column(
            "_vseq", pa.array(vseq, type=pa.int64())
        ).drop_columns(["_rid", "_rb"])

    return (
        tagged.map_batches(_bucket_rid, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(_rank_bucket, batch_format="pyarrow")
    )


_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA]

# Shuffle fan-out of the visit-rank stage (_enumerate_visits_by_host):
# bounds the rank groupby's group count regardless of how many (host,
# range) ids the plan produced. At cluster scale raise toward the
# aggregate core count.
_RANK_BUCKETS = 256



# Max links per page encoded into the discovery sort key (parent visit
# rank * 2^20 + link position). 2^20 links on one page would overflow the
# key — far beyond any real page; asserted at runtime.
_LINK_POS_BITS = 20


def _dedup_antijoin_streamed(
    ds: "ray.data.Dataset",
    seen,
    order_col: str,
    epoch: int,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Fused within-round keep-first dedup + frontier-entry seen anti-join
    (J1/D1), with ZERO shuffle: a claim pass streams (sha1, order) pairs to
    the seen shards (which record min order per not-previously-seen key),
    the materialize() is the commit barrier, and a read-only resolve pass
    filters to the rows whose order equals the recorded min. Survivors are
    identical to a keep-first-by-sha1 shuffle followed by the
    ``add_if_absent`` anti-join — min-order row per fresh canonical
    identity, deterministic — but the round's frontier never moves through
    a sort/groupby exchange (measured ~2.2s -> ~1.3s per 718k-row round at
    32 CPUs). Requires globally unique ``order_col`` values (discovery_seq
    / _dk are); retry-safe because claim is commutative-idempotent (min +
    set-add) and resolve is pure.

    Returns the lazy resolved Dataset; callers materialize. The claim-pass
    materialization is transient (freed with the returned plan's input)."""

    def _claim(t: pa.Table) -> pa.Table:
        seqs = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if getattr(seen, "mode", None) == "cuckoo":
            seen.claim_min_u64(sha1_col_to_u64(t["url_sha1"]), seqs, epoch)
        else:
            seen.claim_min(t["url_sha1"].to_pylist(), seqs, epoch)
        return t

    mat = ds.map_batches(
        _claim, batch_format="pyarrow", batch_size=batch_size
    ).materialize()

    def _resolve(t: pa.Table) -> pa.Table:
        seqs = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if getattr(seen, "mode", None) == "cuckoo":
            mask = seen.resolve_min_u64(sha1_col_to_u64(t["url_sha1"]), seqs, epoch)
        else:
            mask = seen.resolve_min(t["url_sha1"].to_pylist(), seqs, epoch)
        return t.filter(pa.array(mask, type=pa.bool_()))

    return mat.map_batches(_resolve, batch_format="pyarrow", batch_size=batch_size)


def _expand_links_streamed(
    fetched: "ray.data.Dataset", seen, next_seq: int, cfg: CrawlConfig,
    epoch: int = 0,
) -> tuple["ray.data.Dataset | None", int]:
    """Streamed BFS discovery: explode links task-side with the
    (parent visit rank, link position) key, distribute canonicalize+SHA1
    keying, within-round keep-first dedup (partition scan, min key), the
    seen-set anti-join (task-side RPCs), and the DENSE discovery_seq
    assignment via functions/enumerate.attach_dense_index over the key —
    the discovery contract of the BFS loop (parent visit order, link
    position; densely after the current max) with zero driver-side
    candidate state. Returns (new_frontier_dataset | None, count)."""
    from ..functions.enumerate import attach_dense_index

    def _explode(t: pa.Table) -> pa.Table:
        ok = t.filter(pc.equal(t["fetch_status"], "ok"))
        empty = pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "parent_url": pa.array([], type=pa.string()),
                "depth": pa.array([], type=pa.int32()),
                "_dk": pa.array([], type=pa.int64()),
            }
        )
        if ok.num_rows == 0 or "links" not in ok.column_names:
            return empty
        links = pa.chunked_array(
            ok["links"].chunks or [pa.array([], pa.list_(pa.string()))]
        )
        flat = pc.list_flatten(links)
        if len(flat) == 0:
            return empty
        parent_idx = pc.list_parent_indices(links)
        counts = pc.list_value_length(links).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64)).astype(np.int64)
        assert counts.max() < (1 << _LINK_POS_BITS), "page exceeds link-key bits"
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.arange(int(counts.sum()), dtype=np.int64) - starts
        pvseq = pc.take(ok["_vseq"], parent_idx).to_numpy(zero_copy_only=False)
        dk = (pvseq.astype(np.int64) << _LINK_POS_BITS) | pos
        return pa.table(
            {
                "url": flat,
                "parent_url": pc.take(ok["url"], parent_idx),
                "depth": pc.cast(
                    pc.add(pc.take(ok["depth"], parent_idx), 1), pa.int32()
                ),
                "_dk": pa.array(dk, type=pa.int64()),
            }
        )

    cand = fetched.map_batches(_explode, batch_format="pyarrow")
    keyed = cand.map_batches(add_url_key_columns, batch_format="pyarrow")

    # within-round keep-first by canonical identity in discovery order
    # (min _dk) fused with the frontier-entry seen anti-join (J1) —
    # claim/resolve on the seen shards, no shuffle; the epoch tag makes
    # fault-tolerance retries idempotent (ADVICE r2)
    fresh_ds = _dedup_antijoin_streamed(keyed, seen, "_dk", epoch).materialize()
    k = fresh_ds.count()
    if k == 0:
        return None, 0

    ranked = attach_dense_index(
        fresh_ds, ["_dk"], index_col="_rk",
        num_ranges=max(8, cfg.fetch_concurrency * 2),
    )
    base = next_seq

    def _to_frontier(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["canon_url"],
                "url_sha1": t["url_sha1"],
                "host": t["host"],
                "depth": t["depth"],
                "discovery_seq": pc.add(
                    pc.cast(t["_rk"], pa.int64()), base - 1
                ),
                "parent_url": t["parent_url"],
            }
        )

    return ranked.map_batches(_to_frontier, batch_format="pyarrow"), k


def _fetch_list_inner(
    page_store, frontier, out_dir, cfg, resume, seen, seen_epoch: int = 0
) -> CrawlResult:
    """The scale path of the engine. Per round, ALL of:
    frontier-entry seen anti-join (J1), per-host budget split, host
    priority, dense visit enumeration (functions/enumerate.py — the
    range-partitioned O3/ST6 machinery), bucket-colocated fetch+extract,
    and the visit-log write happen INSIDE Ray Data stages. Driver state per
    round: scalar counters, a host→min-seq table bounded by live hosts,
    and O(#batches) summary rows — never O(frontier) or O(visits).

    Visit-order contract (same as the BFS loop): visit_idx enumerates
    (host_priority, discovery_seq) ascending, where host_priority is the
    host's min pending discovery_seq; per-host budget defers all but the
    B smallest-seq rows of each host to the next round."""
    docs_paths: list[str] = []
    visits_dirs: list[str] = []
    start_round = 0
    visited_total = 0
    rounds_run = 0
    # next discovery_seq for streamed link expansion; lazily initialized
    # from the first round's host partials (max existing seq + 1)
    next_seq: int | None = None
    # one range-count accumulator serves every round (epoch-keyed); spawned
    # lazily on the first round that enumerates
    count_acc = None

    if resume and (last := ckpt.last_complete_round(out_dir)) >= 0:
        m = ckpt.read_manifest(out_dir, last)
        want = ckpt.resume_compat_hash(cfg)
        got = m.get("resume_hash")
        if got is not None and got != want:
            raise ValueError(
                f"resume config mismatch: checkpoint was written with config "
                f"{got}, current config hashes to {want} — resume with the "
                f"original CrawlConfig or start a fresh out_dir"
            )
        import shutil

        for name in sorted(os.listdir(out_dir)):
            if name.startswith("round_"):
                try:
                    r = int(name.split("_")[1])
                except (IndexError, ValueError):
                    continue
                if r > last:
                    shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        start_round = last + 1
        visited_total = m["visited_total"]
        rounds_run = last + 1
        next_seq = m.get("next_seq") or None
        n_pending = m["pending_rows"]
        if n_pending:
            # a completed crawl's final round writes no seen snapshot (the
            # loop below exits immediately on pending_rows == 0, so the
            # seen set is never consulted)
            seen.restore(os.path.join(ckpt.round_dir(out_dir, last), "seen"))
        pend_dir = os.path.join(ckpt.round_dir(out_dir, last), "frontier_next")
        pending_ds = (
            ray.data.read_parquet(pend_dir) if n_pending else None
        )
        for r in range(last + 1):
            docs_paths.append(os.path.join(ckpt.round_dir(out_dir, r), "docs"))
            visits_dirs.append(os.path.join(ckpt.round_dir(out_dir, r), "visits"))
    seed_sec = 0.0
    if not (resume and start_round > 0):
        _seed_t0 = _time.perf_counter()
        fds = _frontier_dataset(frontier, cfg.fetch_concurrency * 4)
        # fused keep-first dedup + frontier-entry anti-join via the seen
        # shards' claim/resolve protocol: dup seeds resolve
        # deterministically to min discovery_seq, previously-seen keys
        # drop, and the frontier never crosses a shuffle
        pending_ds = _dedup_antijoin_streamed(
            fds, seen, "discovery_seq", epoch=seen_epoch
        ).materialize()
        n_pending = pending_ds.count()
        seed_sec = round(_time.perf_counter() - _seed_t0, 3)

    for rnd in range(start_round, cfg.max_rounds):
        if n_pending == 0 or pending_ds is None:
            break
        if cfg.target_urls is not None and visited_total >= cfg.target_urls:
            break
        round_t0 = _time.perf_counter()
        phase_sec: dict[str, float] = {}
        _pt = round_t0

        def _phase(name: str) -> None:
            # wall-clock attribution of the round's serial control-plane
            # phases (written to the manifest; the scaling criterion's
            # fixed-cost analysis reads these)
            nonlocal _pt
            now = _time.perf_counter()
            phase_sec[name] = round(now - _pt, 3)
            _pt = now

        rdir = ckpt.round_dir(out_dir, rnd)
        docs_dir = os.path.join(rdir, "docs")
        visits_dir = os.path.join(rdir, "visits")
        os.makedirs(docs_dir, exist_ok=True)
        os.makedirs(visits_dir, exist_ok=True)

        # --- one-pass budget + dense visit enumeration --------------------
        # (host-offset plan: partials pass -> driver cumsum over live
        # hosts -> one groupby(host) attaching _vseq / deferring over-budget
        # rows; see _enumerate_visits_by_host for why this realizes the
        # same contract as functions/enumerate.attach_dense_index)
        import numpy as np

        hosts = _host_partials(pending_ds)
        _phase("partials")
        if next_seq is None:
            next_seq = (
                int(hosts["max_seq"].max()) + 1 if len(hosts) else 0
            )
        if count_acc is None:
            count_acc = RangeCountAccumulator()
        ranked = _enumerate_visits_by_host(
            pending_ds, hosts, cfg.host_budget_per_round,
            count_acc=count_acc, epoch=rnd,
        )
        n_taken_total = int(
            np.minimum(hosts["n"].to_numpy(), cfg.host_budget_per_round).sum()
        )
        room = None
        if cfg.target_urls is not None:
            room = cfg.target_urls - visited_total
        n_round = n_taken_total if room is None else min(n_taken_total, room)
        if n_round < n_pending:
            # two consumers below (in-round + deferred) — pin so the rank
            # shuffle doesn't lazily re-execute per consumer
            ranked = ranked.materialize()
        # else: single consumer — stay lazy so the rank shuffle pipelines
        # straight into the fetch stage (the materialize barrier here
        # measured ~1.1 s/round of pure control-plane wait at 32 CPUs)
        _phase("enumerate")

        def _in_round(t: pa.Table, _room=room) -> pa.Table:
            m = pc.greater(t["_vseq"], 0)
            if _room is not None:
                m = pc.and_(m, pc.less_equal(t["_vseq"], _room))
            return t.filter(m)

        def _deferred_rows(t: pa.Table, _room=room) -> pa.Table:
            m = pc.equal(t["_vseq"], pa.scalar(-1, pa.int64()))
            if _room is not None:
                m = pc.or_(m, pc.greater(t["_vseq"], _room))
            return t.filter(m).select(_FRONTIER_COLS)

        idx_ds = ranked.map_batches(_in_round, batch_format="pyarrow")
        if n_round < n_pending:
            deferred = ranked.map_batches(_deferred_rows, batch_format="pyarrow")
        else:
            deferred = None

        # --- fetch order: co-locate page-store buckets (or hosts for the
        # live-HTTP token buckets) — fetch order is free, visit_idx already
        # pins the logical order
        # NOTE the trailing repartition: the rank groupby emits ONE block
        # per host, so a low-host-count frontier would otherwise cap fetch
        # parallelism at the host count (measured 4 blocks -> 4 of 32 CPUs
        # busy). The split is order-preserving (no shuffle), so bucket
        # locality from the sort survives.
        n_parts = max(2, cfg.fetch_concurrency * 4)
        nb = getattr(page_store, "num_buckets", 0)
        if nb:

            def _bucket(t: pa.Table) -> pa.Table:
                from ..functions.urlkit import sha1_first_byte

                b = sha1_first_byte(t["url_sha1"]) % nb
                return t.append_column("_fb", pa.array(b, type=pa.int64()))

            work = (
                idx_ds.map_batches(_bucket, batch_format="pyarrow")
                .sort("_fb")
                .repartition(n_parts)
            )
        elif getattr(page_store, "rate_per_host", None) is not None:
            # live-HTTP: host-sorted so token buckets see near-aligned
            # batches; no repartition (it could split a host mid-block)
            work = idx_ds.sort("host")
        else:
            work = idx_ds.repartition(n_parts)

        # batch size: fetch_batch_size is a FLOOR; a round is split into
        # ~concurrency*4 batches so each fetch call amortizes its bucket
        # scans over thousands of keys (per-call overhead dominates tiny
        # batches: 64-row batches were measured 2x slower end-to-end)
        per_batch = max(
            cfg.fetch_batch_size, -(-n_round // max(1, cfg.fetch_concurrency * 4))
        )
        fetched = work.map_batches(
            make_fetch_extract_fn(
                page_store, docs_dir=docs_dir, respect_robots=cfg.respect_robots
            ),
            batch_format="pyarrow",
            batch_size=per_batch,
        )

        # --- visit-log write, task-side (idempotent shard names) ----------
        vbase = visited_total

        def _write_visits(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"n": pa.array([], pa.int64()),
                     "n_ok": pa.array([], pa.int64()),
                     "hosts": pa.array([], pa.list_(pa.string()))}
                )
            visit_idx = pc.add(pc.cast(t["_vseq"], pa.int64()), vbase - 1)
            redirect_col = (
                t["redirect_to"]
                if "redirect_to" in t.column_names
                else pa.array([""] * t.num_rows, type=pa.string())
            )
            visits = pa.table(
                {
                    "visit_idx": visit_idx,
                    "url": t["url"],
                    "url_sha1": t["url_sha1"],
                    "host": t["host"],
                    "depth": t["depth"],
                    "discovery_seq": t["discovery_seq"],
                    "round": pa.array([rnd] * t.num_rows, type=pa.int32()),
                    "fetch_status": t["fetch_status"],
                    "redirect_to": redirect_col,
                }
            )
            # redirect targets become seen under their canonical identity
            # (task-side RPC to the seen shards — no driver hop)
            rt = [u for u in redirect_col.to_pylist() if u]
            if rt:
                seen.add_if_absent([url_sha1(u) for u in rt])
            lo = int(pc.min(visit_idx).as_py())
            tmp = os.path.join(visits_dir, f".part-{lo:012d}.tmp")
            pq.write_table(visits, tmp)
            os.replace(tmp, os.path.join(visits_dir, f"part-{lo:012d}.parquet"))
            n_ok = int(
                pc.sum(pc.cast(pc.equal(t["fetch_status"], "ok"), pa.int64())).as_py()
                or 0
            )
            return pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "n_ok": pa.array([n_ok], pa.int64()),
                    "hosts": pa.array(
                        [sorted(set(t["host"].to_pylist()))], pa.list_(pa.string())
                    ),
                }
            )

        if cfg.expand_links:
            # streamed BFS: the fetched control set (incl. links) is needed
            # twice (visit log + expansion) — pin it in the object store so
            # the fetch side effects run exactly once
            fetched = fetched.materialize()
        summaries = fetched.map_batches(
            _write_visits, batch_format="pyarrow"
        ).to_pandas()  # O(#batches) rows
        _phase("fetch_write")
        n = int(summaries["n"].sum()) if len(summaries) else 0
        n_ok = int(summaries["n_ok"].sum()) if len(summaries) else 0
        hosts_visited = len(
            set().union(*summaries["hosts"].tolist()) if len(summaries) else set()
        )
        visited_total += n
        docs_paths.append(docs_dir)
        visits_dirs.append(visits_dir)
        rounds_run = rnd + 1

        # --- streamed link expansion (discovery, J1, distributed seq) -----
        new_frontier = None
        k_new = 0
        if cfg.expand_links:
            new_frontier, k_new = _expand_links_streamed(
                fetched, seen, next_seq, cfg, epoch=rnd + 1
            )
            next_seq += k_new
            _phase("expand")

        # --- next round's frontier (parquet — the resumable handoff) ------
        if deferred is not None:
            deferred = deferred.map_batches(
                lambda t: t.select(_FRONTIER_COLS), batch_format="pyarrow"
            )
        if new_frontier is not None and deferred is not None:
            pending_next = deferred.union(new_frontier).materialize()
        elif new_frontier is not None:
            pending_next = new_frontier.materialize()
        elif deferred is not None:
            pending_next = deferred.materialize()
        else:
            pending_next = None
        n_pending = pending_next.count() if pending_next is not None else 0
        fdir = os.path.join(rdir, "frontier_next")
        if n_pending:
            # parquet write is the RESUME handoff only; the next round runs
            # off the already-materialized Dataset (saves a write->read
            # round trip of the whole frontier from the fixed per-round
            # control-plane cost)
            pending_next.write_parquet(fdir)
            pending_ds = pending_next
        else:
            pending_ds = None
        _phase("frontier_handoff")

        if n_pending:
            # the snapshot exists to make the NEXT round resumable; when
            # the frontier is exhausted the crawl is complete and resume
            # exits before ever touching the seen set (the restore path
            # checks pending_rows first) — skipping saves the shard-fanout
            # parquet write from the final round's critical path
            seen.snapshot(os.path.join(rdir, "seen"))
        _phase("snapshot")
        ckpt.write_manifest(
            out_dir,
            rnd,
            {
                "round": rnd,
                "visited_round": n,
                "visited_total": visited_total,
                "fetch_ok": n_ok,
                "fetch_failed": n - n_ok,
                "hosts_visited": hosts_visited,
                "next_seq": int(next_seq or 0),
                "pending_rows": n_pending,
                "seen_size": seen.size(),
                "round_wall_sec": round(_time.perf_counter() - round_t0, 3),
                "phase_sec": phase_sec,
                "seed_sec": seed_sec if rnd == start_round else 0.0,
                "config_hash": ckpt.config_hash(cfg),
                "resume_hash": ckpt.resume_compat_hash(cfg),
                "mode": "fetch_list_streamed",
                "lineage": {"docs": docs_dir, "visits": visits_dir},
            },
        )

    if count_acc is not None:
        count_acc.shutdown()
    return CrawlResult(
        out_dir=out_dir,
        rounds=rounds_run,
        visits=None,
        docs_paths=docs_paths,
        visits_count=visited_total,
        visits_dirs=visits_dirs,
    )
