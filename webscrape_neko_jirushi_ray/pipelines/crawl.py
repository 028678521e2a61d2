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

## Physical plan per round (all Ray Data)

pending (Arrow) → groupby(salted host).map_groups(top-B by seq)   [skew-safe]
  → true-host re-take + priority sort (bounded by budget x hosts)
  → map_batches(FetchActor pool)   [page-table join, ST1/J3/S2]
  → map_batches(extract)           [stages/extract.py, zero-copy Arrow]
  → links explode → seen-set add_if_absent (J1 anti-join) → next pending

The per-round *control plane* (budget winners, new-link seq assignment) is
bounded by budget × live hosts, not by frontier size; the frontier itself
only ever streams through groupby/sort stages. Seq assignment for new links
is driver-side over that bounded set; at 10^10 scale it becomes a
range-partitioned offset enumeration (documented in util.attach_dense_index).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import CrawlConfig
from ..functions.urlkit import add_url_key_columns, canonicalize_url, url_sha1
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
    ]
)


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def seeds_to_frontier(seed_urls: list[str]) -> pa.Table:
    """Seed list → frontier rows with discovery_seq = list position."""
    canon = [canonicalize_url(u) for u in seed_urls]
    return pa.table(
        {
            "url": pa.array(canon, type=pa.string()),
            "url_sha1": pa.array([url_sha1(u) for u in canon], type=pa.binary()),
            "host": pa.array(
                [u.split("/")[2] for u in canon], type=pa.string()
            ),
            "depth": pa.array([0] * len(canon), type=pa.int32()),
            "discovery_seq": pa.array(range(len(canon)), type=pa.int64()),
            "parent_url": pa.array([""] * len(canon), type=pa.string()),
        }
    )


class FetchExtractActor:
    """ST1+S2+J3: the stateful fetch stage. Holds the page-store fetcher
    (session/robots-cache analog) built once per actor in __init__, resolves
    each batch of frontier rows against the page table, then runs extraction
    in the same pass (fused fetch→extract: the html bytes never re-enter the
    object store)."""

    def __init__(self, store):
        self.fetcher = store.make_fetcher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if hasattr(self.fetcher, "fetch_by_sha1"):
            pages = self.fetcher.fetch_by_sha1(urls, batch["url_sha1"].to_pylist())
        else:
            pages = self.fetcher.fetch(urls)
        status = pages["fetch_status"]
        ok_mask = pc.equal(status, "ok")
        ok_pages = pages.filter(ok_mask)
        docs = extract_batch(ok_pages) if ok_pages.num_rows else None
        # re-attach frontier context + status for every attempted row
        out = batch.append_column("fetch_status", status)
        if docs is None:
            empty = _empty(
                pa.schema(
                    [f for f in docs_schema_fields()]
                )
            )
            return _attach_docs(out, empty)
        return _attach_docs(out, docs)


def docs_schema_fields():
    from ..stages.extract import DOCS_SCHEMA

    return [f for f in DOCS_SCHEMA if f.name not in ("url",)]


def _attach_docs(frontier_rows: pa.Table, docs: pa.Table) -> pa.Table:
    """Left-join docs onto frontier rows by url (both tiny per batch)."""
    if docs.num_rows == 0:
        n = frontier_rows.num_rows
        out = frontier_rows
        for f in docs_schema_fields():
            out = out.append_column(f.name, pa.nulls(n, f.type))
        return out
    idx = {u: i for i, u in enumerate(docs["url"].to_pylist())}
    order = [idx.get(u, -1) for u in frontier_rows["url"].to_pylist()]
    out = frontier_rows
    for f in docs_schema_fields():
        col = docs[f.name]
        vals = [col[i].as_py() if i >= 0 else None for i in order]
        out = out.append_column(f.name, pa.array(vals, type=f.type))
    return out


@dataclass
class CrawlResult:
    out_dir: str
    rounds: int
    visits: pa.Table
    docs_paths: list[str] = field(default_factory=list)

    def visited_sha1s(self) -> set[bytes]:
        ok = self.visits.filter(pc.equal(self.visits["fetch_status"], "ok"))
        return set(ok["url_sha1"].to_pylist())


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
    sha = pending["url_sha1"].to_pylist()
    hosts = pending["host"].to_pylist()
    salted = pa.array(
        [f"{h}#{s[0] % cfg.host_salt_buckets}" for h, s in zip(hosts, sha)],
        type=pa.string(),
    )
    salted_tbl = pending.append_column("salted_host", salted)

    def _topb(group: pa.Table) -> pa.Table:
        g = group.sort_by("discovery_seq")
        return g.slice(0, B)

    if pending.num_rows <= cfg.small_round_threshold:
        # tiny frontier: same kernel, driver-side (no per-round Ray job)
        parts = []
        for sh in pc.unique(salted_tbl["salted_host"]).to_pylist():
            parts.append(
                _topb(salted_tbl.filter(pc.equal(salted_tbl["salted_host"], sh)))
            )
        win = pa.concat_tables(parts, promote_options="default")
    else:
        ds = ray.data.from_arrow(salted_tbl)
        winners = (
            ds.groupby("salted_host")
            .map_groups(_topb, batch_format="pyarrow")
            .to_arrow_refs()
        )
        win = pa.concat_tables(
            [ray.get(r) for r in winners], promote_options="default"
        )
    if win.num_rows == 0:
        return _empty(FRONTIER_SCHEMA), _empty(FRONTIER_SCHEMA)
    win = win.drop_columns(["salted_host"])

    # second (bounded) take per TRUE host, driver-side over <= hosts*S*B rows
    win = win.sort_by([("host", "ascending"), ("discovery_seq", "ascending")])
    hosts2 = win["host"].to_pylist()
    keep_mask = []
    count = 0
    prev = None
    for h in hosts2:
        if h != prev:
            prev, count = h, 0
        keep_mask.append(count < B)
        count += 1
    keep = win.filter(pa.array(keep_mask))
    taken_keys = set(keep["url_sha1"].to_pylist())
    defer_mask = pa.array([s not in taken_keys for s in sha])
    deferred = pending.filter(defer_mask)
    return keep, deferred


def _visit_order(taken: pa.Table) -> pa.Table:
    """Sort the round's work set by (host_priority, discovery_seq);
    host_priority = min discovery_seq among the host's TAKEN rows."""
    if taken.num_rows == 0:
        return taken
    if "host_priority" in taken.column_names:
        taken = taken.drop_columns(["host_priority"])
    mins: dict[str, int] = {}
    for h, s in zip(taken["host"].to_pylist(), taken["discovery_seq"].to_pylist()):
        if h not in mins or s < mins[h]:
            mins[h] = s
    prio = pa.array([mins[h] for h in taken["host"].to_pylist()], type=pa.int64())
    t = taken.append_column("host_priority", prio)
    return t.sort_by(
        [("host_priority", "ascending"), ("discovery_seq", "ascending")]
    )


def crawl(
    page_store,
    seed_urls: list[str],
    out_dir: str,
    cfg: CrawlConfig = CrawlConfig(),
    resume: bool = False,
) -> CrawlResult:
    """Run the frontier loop. ``page_store`` is a BroadcastPageStore or
    PartitionedPageStore. Writes per-round checkpoints under ``out_dir``;
    with ``resume=True`` continues after the last complete round."""
    os.makedirs(out_dir, exist_ok=True)
    seen = ShardedSeenSet(cfg.seen_shards, cfg.seen_mode)
    try:
        return _crawl_inner(page_store, seed_urls, out_dir, cfg, resume, seen)
    finally:
        seen.shutdown()


def _crawl_inner(page_store, seed_urls, out_dir, cfg, resume, seen) -> CrawlResult:
    visits_acc: list[pa.Table] = []
    docs_paths: list[str] = []
    start_round = 0
    visited_total = 0
    next_seq = 0

    if resume and (last := ckpt.last_complete_round(out_dir)) >= 0:
        m = ckpt.read_manifest(out_dir, last)
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
        frontier = seeds_to_frontier(seed_urls)
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

        rdir = ckpt.round_dir(out_dir, rnd)
        os.makedirs(rdir, exist_ok=True)

        # --- fetch + extract (actor pool over the ordered work set) ------
        if ordered.num_rows <= cfg.small_round_threshold:
            # same kernel, inline (one actor's worth of work)
            fetched = FetchExtractActor(page_store)(ordered)
        else:
            work_ds = ray.data.from_arrow(ordered)
            fetched_ds = work_ds.map_batches(
                FetchExtractActor,
                fn_constructor_args=(page_store,),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=cfg.fetch_concurrency,
            )
            fetched = pa.concat_tables(
                [ray.get(r) for r in fetched_ds.to_arrow_refs()],
                promote_options="default",
            )
        # restore visit order (map_batches may deliver blocks out of order)
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
            }
        )
        visited_total += n
        visits_acc.append(visits)
        ckpt.write_table_atomic(visits, os.path.join(rdir, "visits.parquet"))

        # --- docs output (drop frontier bookkeeping, keep doc columns) ----
        ok = fetched.filter(pc.equal(fetched["fetch_status"], "ok"))
        doc_cols = ["url", "warc_ts", "lang", "cat_id", "name", "description",
                    "details_json", "text", "images", "links", "n_images", "n_links"]
        docs_tbl = ok.select([c for c in doc_cols if c in ok.column_names])
        docs_dir = os.path.join(rdir, "docs")
        os.makedirs(docs_dir, exist_ok=True)
        ckpt.write_table_atomic(docs_tbl, os.path.join(docs_dir, "part0.parquet"))
        docs_paths.append(docs_dir)

        # --- frontier expansion ------------------------------------------
        new_rows = {k: [] for k in ("url", "parent_url", "depth", "ord")}
        for row_i, (purl, pdepth, links) in enumerate(
            zip(
                ok["url"].to_pylist(),
                ok["depth"].to_pylist(),
                ok["links"].to_pylist(),
            )
        ):
            for li, link in enumerate(links or []):
                new_rows["url"].append(link)
                new_rows["parent_url"].append(purl)
                new_rows["depth"].append(pdepth + 1)
                new_rows["ord"].append((row_i, li))
        if new_rows["url"]:
            cand = pa.table(
                {
                    "url": pa.array(new_rows["url"], type=pa.string()),
                    "parent_url": pa.array(new_rows["parent_url"], type=pa.string()),
                    "depth": pa.array(new_rows["depth"], type=pa.int32()),
                }
            )
            cand = add_url_key_columns(cand)
            # within-round keep-first dedup by canon url (discovery order)
            seen_local: set[bytes] = set()
            first_mask = []
            for s in cand["url_sha1"].to_pylist():
                if s in seen_local:
                    first_mask.append(False)
                else:
                    seen_local.add(s)
                    first_mask.append(True)
            cand = cand.filter(pa.array(first_mask))
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
        ckpt.write_manifest(
            out_dir,
            rnd,
            {
                "round": rnd,
                "visited_round": n,
                "visited_total": visited_total,
                "next_seq": next_seq,
                "pending_rows": pending.num_rows,
                "config_hash": ckpt.config_hash(cfg),
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
