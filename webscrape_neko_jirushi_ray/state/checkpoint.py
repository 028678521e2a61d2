"""Per-round checkpoint manifests + resume (rebuild of the reference's JSON
progress files, comprehensive_scraper.py:62-96,317-326).

Layout under ``out_dir``::

    round_0000/
        visits.parquet          # visit log of the round (visit_idx, url, ...)
        docs/                   # extracted docs parquet (Ray write_parquet dir)
        frontier_next.parquet   # pending frontier after the round
        seen/seen_shard_*.parquet
        manifest.json           # written LAST -> round is complete iff present

Resume = load the highest round with a manifest, restore the seen-set
shards from its snapshot, and continue with its ``frontier_next``. The
snapshot is written before the manifest, and every artifact goes through
tmp+rename, so a killed run replays at most one (idempotent) round:
fetching is a pure join and outputs are partition-replacing (SURVEY.md
§7.5 "resumability without double-fetch").
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def round_dir(out_dir: str, rnd: int) -> str:
    return os.path.join(out_dir, f"round_{rnd:04d}")


def write_manifest(out_dir: str, rnd: int, payload: dict) -> str:
    path = os.path.join(round_dir(out_dir, rnd), "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def read_manifest(out_dir: str, rnd: int) -> dict | None:
    path = os.path.join(round_dir(out_dir, rnd), "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def last_complete_round(out_dir: str) -> int:
    """Highest round index with a manifest, or -1."""
    best = -1
    if not os.path.isdir(out_dir):
        return best
    for name in os.listdir(out_dir):
        if name.startswith("round_"):
            try:
                rnd = int(name.split("_")[1])
            except (IndexError, ValueError):
                continue
            if read_manifest(out_dir, rnd) is not None:
                best = max(best, rnd)
    return best


def write_table_atomic(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def config_hash(obj) -> str:
    """Stable hash of a (frozen dataclass) config for lineage records."""
    return hashlib.sha1(repr(obj).encode("utf-8")).hexdigest()[:12]


# Run-control knobs that may legitimately differ between a crashed attempt
# and its resume (how LONG to run) — everything else (batch sizes,
# concurrency, budgets, thresholds, seen-set config) shapes batch
# boundaries and task-side shard names, so replaying a round under a
# different value would strand stale shards beside the new ones.
_RESUME_IRRELEVANT = ("max_rounds", "target_urls")


def resume_compat_hash(cfg) -> str:
    """Hash of the config fields that must be IDENTICAL across resume."""
    import dataclasses

    items = sorted(
        (f.name, getattr(cfg, f.name))
        for f in dataclasses.fields(cfg)
        if f.name not in _RESUME_IRRELEVANT
    )
    return hashlib.sha1(repr(items).encode("utf-8")).hexdigest()[:12]


def metrics_summary(out_dir: str) -> "pa.Table":
    """Per-round crawl METRICS as one Arrow table (the monitoring
    artifact the north_star's 'lineage + fetch/extract metrics' clause
    names): round, visited, fetch_ok/failed, hosts, pending, seen size,
    wall seconds and derived URLs/sec, straight from the per-round
    manifests a (possibly crashed) run left behind. Driver state is
    O(rounds) — rounds are dozens, never corpus-sized."""
    rows = []
    rnd = 0
    while True:
        m = read_manifest(out_dir, rnd)
        if m is None:
            break
        wall = float(m.get("round_wall_sec", 0.0)) or 0.0
        visited = int(m.get("visited_round", 0))
        rows.append(
            {
                "round": rnd,
                "visited": visited,
                "fetch_ok": int(m.get("fetch_ok", 0)),
                "fetch_failed": int(m.get("fetch_failed", 0)),
                "hosts_visited": int(m.get("hosts_visited", 0)),
                "pending_rows": int(m.get("pending_rows", 0)),
                "seen_size": int(m.get("seen_size", 0)),
                "wall_sec": wall,
                "urls_per_sec": (visited / wall) if wall > 0 else 0.0,
            }
        )
        rnd += 1
    if not rows:
        return pa.table(
            {
                "round": pa.array([], pa.int64()),
                "visited": pa.array([], pa.int64()),
                "fetch_ok": pa.array([], pa.int64()),
                "fetch_failed": pa.array([], pa.int64()),
                "hosts_visited": pa.array([], pa.int64()),
                "pending_rows": pa.array([], pa.int64()),
                "seen_size": pa.array([], pa.int64()),
                "wall_sec": pa.array([], pa.float64()),
                "urls_per_sec": pa.array([], pa.float64()),
            }
        )
    cols = list(rows[0])
    return pa.table(
        {
            c: pa.array(
                [r[c] for r in rows],
                pa.float64() if c in ("wall_sec", "urls_per_sec")
                else pa.int64(),
            )
            for c in cols
        }
    )
