"""CLI entry points (the reference's per-script argparse surface, §2.10).

    python -m webscrape_neko_jirushi_ray crawl     --store DIR --seeds FILE --out DIR
    python -m webscrape_neko_jirushi_ray crawl     --http --seeds FILE --out DIR
    python -m webscrape_neko_jirushi_ray fetchlist --store DIR --frontier PARQUET --out DIR
    python -m webscrape_neko_jirushi_ray complete --demo --out DIR
    python -m webscrape_neko_jirushi_ray clean   --images DIR --out DIR [--aggressive]
    python -m webscrape_neko_jirushi_ray score   --images DIR --out DIR

``--config FILE`` overrides CrawlConfig fields from JSON, mirroring
complete_pipeline.py:233-258's config-file override. These scripts own a
Ray session (guarded init) — the library itself never does.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _ray_session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _load_cfg(path: str | None):
    from .config import CrawlConfig

    if not path:
        return CrawlConfig()
    with open(path, encoding="utf-8") as f:
        overrides = json.load(f)
    valid = {f.name for f in dataclasses.fields(CrawlConfig)}
    unknown = set(overrides) - valid
    if unknown:
        raise SystemExit(f"unknown CrawlConfig fields in {path}: {sorted(unknown)}")
    return CrawlConfig(**overrides)


def cmd_crawl(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pipelines.crawl import crawl
    from .sources.http import HttpPageStore
    from .sources.pages import PartitionedPageStore

    seeds = [
        line.strip()
        for line in open(args.seeds, encoding="utf-8")
        if line.strip() and not line.startswith("#")
    ]
    if args.http:
        store = HttpPageStore(rate_per_host=args.rate)
    else:
        store = PartitionedPageStore(args.store)
    cfg = _load_cfg(args.config)
    res = crawl(store, seeds, args.out, cfg, resume=args.resume)
    # expand_links=False (config override) returns a streamed result whose
    # visit log lives in parquet shards; summarize from the manifests
    if res.visits is not None:
        ok = sum(1 for s in res.visits["fetch_status"].to_pylist() if s == "ok")
    else:
        from .state import checkpoint as ckpt

        ok = sum(
            (ckpt.read_manifest(args.out, r) or {}).get("fetch_ok", 0)
            for r in range(res.rounds)
        )
    print(
        json.dumps(
            {
                "rounds": res.rounds,
                "visited": res.visits_count,
                "fetched_ok": ok,
                "out": args.out,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_fetchlist(args) -> int:
    """Streamed fetch-list crawl over a frontier parquet (the 10^10-scale
    refetch job): the frontier never touches the driver."""
    ray = _ray_session(args.num_cpus)
    from .pipelines.crawl import crawl_fetch_list
    from .sources.http import HttpPageStore
    from .sources.pages import PartitionedPageStore

    if args.http:
        store = HttpPageStore(rate_per_host=args.rate)
    else:
        store = PartitionedPageStore(args.store)
    sources = [
        s for s in (args.frontier, args.sitemaps, args.discover_hosts) if s
    ]
    if len(sources) != 1:
        print(
            "fetchlist needs exactly one of --frontier / --sitemaps / "
            "--discover-hosts",
            file=sys.stderr,
        )
        return 2
    if args.sitemaps:
        from .sources.sitemaps import sitemaps_to_frontier

        frontier = sitemaps_to_frontier(store, args.sitemaps)
    elif args.discover_hosts:
        from .sources.sitemaps import discover_frontier_from_robots

        frontier = discover_frontier_from_robots(store, args.discover_hosts)
    else:
        frontier = args.frontier
    cfg = _load_cfg(args.config)
    if cfg.expand_links:
        cfg = dataclasses.replace(cfg, expand_links=False)
    res = crawl_fetch_list(
        store, frontier, args.out, cfg, resume=args.resume
    )
    print(
        json.dumps(
            {
                "rounds": res.rounds,
                "visited": res.visits_count,
                "out": args.out,
                "visits_dirs": res.visits_dirs,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_complete(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pipelines.complete import run_complete_pipeline
    from .sources.pages import BroadcastPageStore
    from .synth import synth_pages

    if not args.demo:
        raise SystemExit("only --demo (synthesized site) is supported offline")
    pages, seeds = synth_pages(num_listing_pages=args.listing_pages, seed=args.seed)
    report = run_complete_pipeline(
        BroadcastPageStore(pages), seeds, args.out, _load_cfg(args.config)
    )
    print(json.dumps({k: report[k] for k in (
        "pages_visited", "docs_extracted", "images_harvested",
        "after_advanced", "after_aggressive", "after_scoring", "final_dir",
    )}))
    ray.shutdown()
    return 0


def cmd_clean(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.cleaning import (
        advanced_cleaning_pipeline,
        aggressive_cleaning_pipeline,
        removal_stats,
    )

    from .functions.codecs import select_decode_features

    images = rd.read_parquet(args.images)
    pipeline = (
        aggressive_cleaning_pipeline if args.aggressive else advanced_cleaning_pipeline
    )
    # real-data surface: Pillow decode when installed, NEKO1 stub otherwise
    kept, quarantined = pipeline(
        images, decode_fn=select_decode_features(prefer_real=not args.stub_codec)
    )
    kept.write_parquet(f"{args.out}/kept")
    quarantined.write_parquet(f"{args.out}/quarantined")
    print(json.dumps({
        "kept": kept.count(),
        "reasons": removal_stats(quarantined).to_pydict(),
    }))
    ray.shutdown()
    return 0


def cmd_score(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .functions.codecs import select_scorer_cls
    from .stages.scorer import detection_summary, score_images, split_by_detection

    images = rd.read_parquet(args.images)
    # real-data surface: YOLO actor class when ultralytics+Pillow import
    scored = score_images(
        images,
        scorer_cls=select_scorer_cls(prefer_real=not args.stub_codec),
        concurrency=args.concurrency,
    )
    valid, removed = split_by_detection(scored)
    valid.write_parquet(f"{args.out}/valid")
    removed.write_parquet(f"{args.out}/removed")
    print(json.dumps(detection_summary(scored)))
    ray.shutdown()
    return 0


def cmd_textprep(args) -> int:
    """Training-data text prep over a documents parquet table."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.textprep import prepare_text_corpus

    docs = rd.read_parquet(args.docs)
    kept, report = prepare_text_corpus(
        docs,
        keep_langs=tuple(args.langs.split(",")) if args.langs else None,
        min_words=args.min_words,
        min_quality=args.min_quality,
    )
    kept.write_parquet(args.out)
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    """data_manager.py analog (A5): dataset totals for a final layout dir."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(args.data)
    cols = set(ds.schema().names)
    agg = [Count(alias_name="total_images")]
    if "size" in cols:
        agg.append(Sum("size", alias_name="total_bytes"))
    totals = ds.aggregate(*agg)
    out = {"total_images": int(totals["total_images"])}
    if "total_bytes" in totals and totals["total_bytes"] is not None:
        out["total_mb"] = round(totals["total_bytes"] / (1024 * 1024), 2)
    if "cat_id" in cols:
        per_cat = ds.groupby("cat_id").count().to_pandas()
        out["total_cats"] = int(len(per_cat))
        out["avg_images_per_cat"] = round(
            out["total_images"] / max(1, len(per_cat)), 2
        )
    print(json.dumps(out))
    ray.shutdown()
    return 0


def cmd_corpus(args) -> int:
    """Webtext corpus build: C4 line-quality gate → corpus line dedup →
    Gopher repetition gate, written as RESUMABLE hive-partitioned parquet
    (shard = doc_id % n_shards; finished shards are skipped on re-run)."""
    ray = _ray_session(args.num_cpus)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .stages import linededup
    from .stages.joins import hash_join
    from .state.sinks import write_partitioned_resumable

    ds = rd.read_parquet(args.docs, columns=["doc_id", "text"])
    blacklist = tuple(args.blacklist.split(",")) if args.blacklist else ()
    ds = linededup.c4_line_filter(
        ds, width=args.width, line_blacklist=blacklist,
        min_lines=args.min_lines,
    )
    ds = linededup.line_dedup(ds, width=args.width).materialize()
    gate = linededup.gopher_filter(
        ds, width=args.width, min_words=args.min_words
    ).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_words"]}),
        batch_format="pyarrow",
    )
    kept = hash_join(ds, gate, key="doc_id", how="inner")

    n_shards = args.shards

    def _shard(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array((ids % n_shards).astype(np.int64))
        )

    sharded = kept.map_batches(_shard, batch_format="pyarrow")
    report = write_partitioned_resumable(
        sharded, args.out, partition_col="shard"
    )
    print(
        json.dumps(
            {
                "written_shards": len(report["written"]),
                "skipped_shards": len(report["skipped"]),
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run any registered analytics pipeline (pipelines/queries) over a
    testdata-shaped parquet dir; write the result as parquet or print it.
    ``--list`` enumerates the available names."""
    from .pipelines import queries as q

    names = sorted(
        n
        for n in dir(q)
        if not n.startswith("_") and callable(getattr(q, n))
        # defined anywhere in the queries package (per-family modules)
        and getattr(getattr(q, n), "__module__", "").startswith(q.__name__)
    )
    if args.list:
        print("\n".join(names))
        return 0
    if args.name not in names:
        print(f"unknown query {args.name!r}; --list shows choices", file=sys.stderr)
        return 2
    ray = _ray_session(args.num_cpus)
    res = getattr(q, args.name)(args.sf_dir)
    import pandas as pd

    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if args.out:
        df.to_parquet(args.out, index=False)
        print(json.dumps({"query": args.name, "rows": len(df), "out": args.out}))
    else:
        print(df.to_string(max_rows=50))
    ray.shutdown()
    return 0


def cmd_archive(args) -> int:
    """S8 sinks: backup (copytree), archive (tar.gz/zip), age-GC — no Ray
    session needed (driver-side ops on final layouts)."""
    from .state.archive import archive_dir, backup_dir, gc_backups

    out = {}
    if args.backup_root:
        out["backup"] = backup_dir(args.src, args.backup_root, run_id=args.run_id)
    if args.dest:
        out["archive"] = archive_dir(args.src, args.dest, fmt=args.fmt)
    if args.gc_days is not None and args.backup_root:
        out["gc_removed"] = gc_backups(args.backup_root, args.gc_days)
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="webscrape_neko_jirushi_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the URL-frontier crawl")
    c.add_argument("--seeds", required=True, help="file with one seed URL per line")
    c.add_argument("--out", required=True)
    c.add_argument("--store", help="partitioned page-store root (offline crawl)")
    c.add_argument("--http", action="store_true", help="live HTTP fetch")
    c.add_argument("--rate", type=float, default=0.5, help="req/s per host (http)")
    c.add_argument("--config", help="JSON CrawlConfig overrides")
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    fl = sub.add_parser(
        "fetchlist", help="streamed fetch-list crawl over a frontier parquet"
    )
    fl.add_argument("--frontier", help="frontier parquet path/dir")
    fl.add_argument(
        "--sitemaps", nargs="+",
        help="seed the frontier from these sitemap URLs (tree-expanded)",
    )
    fl.add_argument(
        "--discover-hosts", nargs="+",
        help="seed the frontier from robots.txt Sitemap: directives of "
             "these hosts",
    )
    fl.add_argument("--out", required=True)
    fl.add_argument("--store", help="partitioned page-store root")
    fl.add_argument("--http", action="store_true", help="live HTTP fetch")
    fl.add_argument("--rate", type=float, default=0.5, help="req/s per host (http)")
    fl.add_argument("--config", help="JSON CrawlConfig overrides")
    fl.add_argument("--resume", action="store_true")
    fl.set_defaults(fn=cmd_fetchlist)

    comp = sub.add_parser("complete", help="full pipeline on the demo site")
    comp.add_argument("--demo", action="store_true")
    comp.add_argument("--out", required=True)
    comp.add_argument("--listing-pages", type=int, default=3)
    comp.add_argument("--seed", type=int, default=42)
    comp.add_argument("--config", help="JSON CrawlConfig overrides")
    comp.set_defaults(fn=cmd_complete)

    cl = sub.add_parser("clean", help="image cleaning chain")
    cl.add_argument("--images", required=True, help="images parquet path/dir")
    cl.add_argument("--out", required=True)
    cl.add_argument("--aggressive", action="store_true")
    cl.add_argument(
        "--stub-codec", action="store_true",
        help="force the deterministic NEKO1 decode even if Pillow exists",
    )
    cl.set_defaults(fn=cmd_clean)

    sc = sub.add_parser("score", help="pseudo-YOLO scoring")
    sc.add_argument("--images", required=True)
    sc.add_argument("--out", required=True)
    sc.add_argument("--concurrency", type=int, default=2)
    sc.add_argument(
        "--stub-codec", action="store_true",
        help="force the deterministic pseudo scorer even if ultralytics exists",
    )
    sc.set_defaults(fn=cmd_score)

    tp = sub.add_parser("textprep", help="training-data text preparation")
    tp.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    tp.add_argument("--out", required=True)
    tp.add_argument("--langs", help="comma-separated lang_pred allowlist")
    tp.add_argument("--min-words", type=int, default=10)
    tp.add_argument("--min-quality", type=float, default=0.5)
    tp.set_defaults(fn=cmd_textprep)

    stt = sub.add_parser("stats", help="dataset totals (data_manager analog)")
    stt.add_argument("--data", required=True, help="parquet dir (e.g. final layout)")
    stt.set_defaults(fn=cmd_stats)

    co = sub.add_parser(
        "corpus",
        help="webtext corpus build (C4 gate + line dedup + Gopher gate) "
        "into a resumable partitioned layout",
    )
    co.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    co.add_argument("--out", required=True)
    co.add_argument("--width", type=int, default=8, help="words per chunk/'line'")
    co.add_argument("--blacklist", help="comma-separated line blacklist substrings")
    co.add_argument("--min-lines", type=int, default=3)
    co.add_argument("--min-words", type=int, default=20)
    co.add_argument("--shards", type=int, default=16, help="output partitions")
    co.set_defaults(fn=cmd_corpus)

    qy = sub.add_parser(
        "query", help="run a registered analytics pipeline over a parquet dir"
    )
    qy.add_argument("name", nargs="?", default="")
    qy.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qy.add_argument("--out", default="")
    qy.add_argument("--list", action="store_true")
    qy.add_argument("--num-cpus", type=int, default=8)
    qy.set_defaults(fn=cmd_query)

    ar = sub.add_parser("archive", help="backup/archive/GC sinks (data_manager analog)")
    ar.add_argument("--src", required=True, help="layout dir to preserve")
    ar.add_argument("--backup-root", help="copytree backup destination root")
    ar.add_argument("--run-id", help="deterministic backup name suffix")
    ar.add_argument("--dest", help="archive file (.tar.gz / .zip)")
    ar.add_argument("--fmt", default="tar.gz", choices=["tar.gz", "zip"])
    ar.add_argument("--gc-days", type=float, help="delete backups older than N days")
    ar.set_defaults(fn=cmd_archive)

    args = p.parse_args(argv)
    if args.cmd in ("crawl", "fetchlist") and not (args.http or args.store):
        p.error(f"{args.cmd} needs --store DIR or --http")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
