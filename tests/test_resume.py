"""Checkpoint/resume test (SURVEY.md §5.5): kill after round r, restart
with resume=True, outputs + seen set must equal the uninterrupted run."""

import pyarrow.compute as pc
import pytest

from webscrape_neko_jirushi_ray.config import CrawlConfig
from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
from webscrape_neko_jirushi_ray.state import checkpoint as ckpt
from webscrape_neko_jirushi_ray.synth import synth_pages


def test_resume_equals_uninterrupted(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=3, seed=13)
    cfg = CrawlConfig(host_budget_per_round=10, max_rounds=30, seen_shards=2)
    store = BroadcastPageStore(pages)

    # uninterrupted reference run
    full = crawl(store, seeds, str(tmp_path / "full"), cfg)

    # interrupted run: stop after 3 rounds (simulated kill via max_rounds)
    cfg_short = CrawlConfig(
        host_budget_per_round=10, max_rounds=3, seen_shards=2
    )
    part = crawl(store, seeds, str(tmp_path / "resumed"), cfg_short)
    assert part.rounds == 3
    assert ckpt.last_complete_round(str(tmp_path / "resumed")) == 2

    # resume to completion
    res = crawl(store, seeds, str(tmp_path / "resumed"), cfg, resume=True)

    assert res.visits.num_rows == full.visits.num_rows
    got = res.visits.to_pylist()
    want = full.visits.to_pylist()
    for g, w in zip(got, want):
        assert (g["visit_idx"], g["url"], g["round"], g["fetch_status"]) == (
            w["visit_idx"], w["url"], w["round"], w["fetch_status"]
        )
    assert res.visited_sha1s() == full.visited_sha1s()


def test_resume_is_noop_when_complete(ray_session, tmp_path):
    pages, seeds = synth_pages(num_listing_pages=2, seed=19)
    cfg = CrawlConfig(host_budget_per_round=50, max_rounds=30, seen_shards=2)
    store = BroadcastPageStore(pages)
    full = crawl(store, seeds, str(tmp_path / "c"), cfg)
    again = crawl(store, seeds, str(tmp_path / "c"), cfg, resume=True)
    assert again.visits.num_rows == full.visits.num_rows


def test_resume_replays_round_with_missing_manifest(ray_session, tmp_path):
    """Crash window: snapshot written but manifest not (the round is
    incomplete) → resume replays that round idempotently and the final
    result equals the uninterrupted run."""
    import os

    pages, seeds = synth_pages(num_listing_pages=3, seed=71)
    cfg = CrawlConfig(host_budget_per_round=12, max_rounds=30, seen_shards=2)
    store = BroadcastPageStore(pages)
    full = crawl(store, seeds, str(tmp_path / "full"), cfg)

    # run 4 rounds, then simulate a crash DURING round 3 by deleting its
    # manifest (its partial outputs — docs shards, snapshot — remain)
    part = crawl(
        store, seeds, str(tmp_path / "crashed"),
        CrawlConfig(host_budget_per_round=12, max_rounds=4, seen_shards=2),
    )
    assert part.rounds == 4
    os.remove(str(tmp_path / "crashed" / "round_0003" / "manifest.json"))
    assert ckpt.last_complete_round(str(tmp_path / "crashed")) == 2

    res = crawl(store, seeds, str(tmp_path / "crashed"), cfg, resume=True)
    assert res.visits.num_rows == full.visits.num_rows
    got = [(v["visit_idx"], v["url"], v["fetch_status"]) for v in res.visits.to_pylist()]
    want = [(v["visit_idx"], v["url"], v["fetch_status"]) for v in full.visits.to_pylist()]
    assert got == want
    assert res.visited_sha1s() == full.visited_sha1s()


def test_resume_cuckoo_mode(ray_session, tmp_path):
    """Resume must restore cuckoo-filter shards too (snapshot round-trips
    the fingerprint table, not a key list)."""
    pages, seeds = synth_pages(num_listing_pages=2, seed=73)
    store = BroadcastPageStore(pages)
    cfg_full = CrawlConfig(host_budget_per_round=10, max_rounds=30,
                           seen_shards=2, seen_mode="cuckoo")
    full = crawl(store, seeds, str(tmp_path / "f"), cfg_full)
    part = crawl(store, seeds, str(tmp_path / "r"),
                 CrawlConfig(host_budget_per_round=10, max_rounds=2,
                             seen_shards=2, seen_mode="cuckoo"))
    res = crawl(store, seeds, str(tmp_path / "r"), cfg_full, resume=True)
    assert res.visits.num_rows == full.visits.num_rows
    assert [v["url"] for v in res.visits.to_pylist()] == [
        v["url"] for v in full.visits.to_pylist()
    ]


def test_resume_rejects_incompatible_config(ray_session, tmp_path):
    """Resuming under a config that reshapes batch boundaries must fail
    loudly (stale task-side shards would otherwise survive the replay);
    run-control knobs (max_rounds) may differ freely."""
    import pytest

    from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
    from webscrape_neko_jirushi_ray.synth import synth_pages

    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    out = str(tmp_path / "c")
    crawl(
        BroadcastPageStore(pages), seeds, out,
        CrawlConfig(host_budget_per_round=10, max_rounds=2, seen_shards=2),
    )
    # different fetch_batch_size -> different shard boundaries -> reject
    with pytest.raises(ValueError, match="resume config mismatch"):
        crawl(
            BroadcastPageStore(pages), seeds, out,
            CrawlConfig(
                host_budget_per_round=10, max_rounds=30, seen_shards=2,
                fetch_batch_size=7,
            ),
            resume=True,
        )


def test_resume_sweeps_incomplete_round_dir(ray_session, tmp_path):
    """A crashed round's partial artifacts (no manifest) must be removed on
    resume so stale docs shards can't join the replayed round's output."""
    import os

    from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
    from webscrape_neko_jirushi_ray.synth import synth_pages

    pages, seeds = synth_pages(num_listing_pages=3, seed=11)
    out = str(tmp_path / "c")
    cfg = CrawlConfig(host_budget_per_round=10, max_rounds=2, seen_shards=2)
    crawl(BroadcastPageStore(pages), seeds, out, cfg)
    # fake a crashed round 2 with a stale shard and no manifest
    stale = os.path.join(out, "round_0002", "docs")
    os.makedirs(stale, exist_ok=True)
    stale_file = os.path.join(stale, "part-deadbeef.parquet")
    with open(stale_file, "wb") as f:
        f.write(b"junk")
    res = crawl(
        BroadcastPageStore(pages), seeds, out,
        CrawlConfig(host_budget_per_round=10, max_rounds=30, seen_shards=2),
        resume=True,
    )
    assert not os.path.exists(stale_file)
    assert res.rounds >= 2


def test_metrics_summary_reads_round_manifests(ray_session, tmp_path):
    """metrics_summary assembles the per-round manifests into the
    monitoring table; empty out_dir yields the empty-schema table."""
    from webscrape_neko_jirushi_ray.config import CrawlConfig
    from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
    from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
    from webscrape_neko_jirushi_ray.state.checkpoint import metrics_summary
    from webscrape_neko_jirushi_ray.synth import synth_pages

    pages, seeds = synth_pages(num_listing_pages=2, seed=5)
    cfg = CrawlConfig(host_budget_per_round=8, max_rounds=6, seen_shards=2,
                      seen_mode="exact")
    out = str(tmp_path / "m")
    res = crawl(BroadcastPageStore(pages), seeds, out, cfg)
    t = metrics_summary(out)
    assert t.num_rows == res.rounds
    assert sum(t["visited"].to_pylist()) == res.visits_count
    ok = sum(t["fetch_ok"].to_pylist())
    failed = sum(t["fetch_failed"].to_pylist())
    assert ok + failed == res.visits_count
    assert all(w >= 0 for w in t["wall_sec"].to_pylist())
    empty = metrics_summary(str(tmp_path / "nothing"))
    assert empty.num_rows == 0
    assert "urls_per_sec" in empty.column_names
