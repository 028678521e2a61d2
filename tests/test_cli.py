"""CLI surface (§2.10): crawl + fetchlist + config rejection, end to end.

Runs in ONE subprocess because each CLI command owns (and shuts down) its
own Ray session — doing that in-process would tear down the shared test
fixture session."""

import json
import subprocess
import sys
import textwrap


def test_cli_crawl_fetchlist_and_config_rejection(tmp_path):
    script = textwrap.dedent(
        f"""
        import json, os, sys
        sys.path.insert(0, {repr(str(tmp_path))})  # noop, keeps cwd clean
        os.chdir("/root/repo")
        import pyarrow.parquet as pq

        from webscrape_neko_jirushi_ray.__main__ import main
        from webscrape_neko_jirushi_ray.functions.urlkit import add_url_key_columns
        from webscrape_neko_jirushi_ray.pipelines.crawl import seeds_to_frontier
        from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore
        from webscrape_neko_jirushi_ray.synth import synth_pages

        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False

        out = {repr(str(tmp_path))}
        pages, seeds = synth_pages(num_listing_pages=2, seed=9)
        store_dir = os.path.join(out, "store")
        PartitionedPageStore.build(add_url_key_columns(pages), store_dir,
                                   num_buckets=4)
        seeds_file = os.path.join(out, "seeds.txt")
        with open(seeds_file, "w") as f:
            f.write("\\n".join(seeds))

        # 1. BFS crawl
        rc = main(["crawl", "--store", store_dir, "--seeds", seeds_file,
                   "--out", os.path.join(out, "c1")])
        assert rc == 0

        # 2. streamed fetch-list over a frontier parquet
        fdir = os.path.join(out, "frontier"); os.makedirs(fdir)
        pq.write_table(seeds_to_frontier(pages["url"].to_pylist()),
                       os.path.join(fdir, "f.parquet"))
        rc = main(["fetchlist", "--store", store_dir, "--frontier", fdir,
                   "--out", os.path.join(out, "c2")])
        assert rc == 0

        # 3. bad config is rejected loudly
        bad = os.path.join(out, "bad.json")
        with open(bad, "w") as f:
            json.dump({{"no_such_field": 1}}, f)
        try:
            main(["crawl", "--store", store_dir, "--seeds", seeds_file,
                  "--out", os.path.join(out, "c3"), "--config", bad])
            raise AssertionError("bad config accepted")
        except SystemExit as e:
            assert "no_such_field" in str(e)
        print("CLI_OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines[-1] == "CLI_OK"
    # the two crawl commands printed their JSON summaries
    payloads = [json.loads(ln) for ln in lines if ln.startswith("{")]
    assert payloads[0]["visited"] > 0 and payloads[0]["fetched_ok"] > 0
    assert payloads[1]["visited"] > 0


def test_cli_corpus_resumable(tmp_path):
    script = textwrap.dedent(
        f"""
        import io, json, os, sys
        os.chdir("/root/repo")
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from webscrape_neko_jirushi_ray.__main__ import main

        out = {repr(str(tmp_path))}
        rng = np.random.default_rng(5)
        vocab = [f"w{{i}}" for i in range(60)] + ["bad"]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(100, 300)))
                 for _ in range(200)]
        docs = os.path.join(out, "docs"); os.makedirs(docs)
        pq.write_table(pa.table({{"doc_id": pa.array(range(200), type=pa.int64()),
                                  "text": pa.array(texts)}}),
                       os.path.join(docs, "d.parquet"))

        corpus = os.path.join(out, "corpus")
        argv = ["--num-cpus", "4", "corpus", "--docs", docs, "--out", corpus,
                "--blacklist", "bad", "--min-lines", "2",
                "--min-words", "8", "--shards", "4"]
        buf = io.StringIO(); real = sys.stdout
        sys.stdout = buf
        rc = main(list(argv))
        sys.stdout = real
        assert rc == 0
        rep1 = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert rep1["written_shards"] >= 1 and rep1["skipped_shards"] == 0

        first = pq.read_table(corpus).to_pandas().sort_values("doc_id")

        # second run must skip every stamped shard and change nothing
        buf = io.StringIO(); sys.stdout = buf
        rc = main(list(argv))
        sys.stdout = real
        assert rc == 0
        rep2 = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert rep2["written_shards"] == 0
        assert rep2["skipped_shards"] == rep1["written_shards"]
        second = pq.read_table(corpus).to_pandas().sort_values("doc_id")
        assert first.reset_index(drop=True).equals(second.reset_index(drop=True))
        print("CORPUS_CLI_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CORPUS_CLI_OK" in proc.stdout


def test_cli_query_subcommand(tmp_path):
    # --list needs no Ray; the run writes parquet and prints one JSON line
    r = subprocess.run(
        [sys.executable, "-m", "webscrape_neko_jirushi_ray", "query", "--list"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0
    names = r.stdout.split()
    assert "nation_revenue" in names and "minhash_dedup_docs" in names

    out = str(tmp_path / "res.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "webscrape_neko_jirushi_ray", "query",
         "distinct_mktsegments", "--sf-dir", "/root/testdata/sf0.001",
         "--out", out, "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] == 5

    r = subprocess.run(
        [sys.executable, "-m", "webscrape_neko_jirushi_ray", "query", "nope"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2


def test_cli_fetchlist_sitemap_seeding(tmp_path):
    """fetchlist --sitemaps expands the tree into the frontier; passing
    two frontier sources (or none) is rejected."""
    script = textwrap.dedent(
        f"""
        import datetime as dt, gzip, json, os, sys
        os.chdir("/root/repo")
        import pyarrow as pa

        from webscrape_neko_jirushi_ray.__main__ import main
        from webscrape_neko_jirushi_ray.functions.urlkit import (
            add_url_key_columns, canonicalize_url,
        )
        from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore

        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False

        out = {repr(str(tmp_path))}
        page_urls = [f"http://a.example/p{{i}}" for i in range(5)]
        sm = canonicalize_url("http://a.example/sitemap.xml")
        bodies = {{
            canonicalize_url(u):
                f"<html><body>doc {{u}}</body></html>".encode()
            for u in page_urls
        }}
        bodies[sm] = (
            "<urlset>"
            + "".join(f"<url><loc>{{u}}</loc></url>" for u in page_urls)
            + "</urlset>"
        ).encode()
        urls = sorted(bodies)
        pages = pa.table({{
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([dt.datetime(2020, 1, 1)] * len(urls),
                                pa.timestamp("us")),
            "html": pa.array([bodies[u] for u in urls], pa.binary()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }})
        store_dir = os.path.join(out, "store")
        PartitionedPageStore.build(add_url_key_columns(pages), store_dir,
                                   num_buckets=4)
        rc = main(["fetchlist", "--store", store_dir, "--sitemaps", sm,
                   "--out", os.path.join(out, "sm")])
        assert rc == 0
        rc = main(["fetchlist", "--store", store_dir,
                   "--out", os.path.join(out, "none")])
        assert rc == 2
        print("CLI_SM_OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines[-1] == "CLI_SM_OK"
    payloads = [json.loads(ln) for ln in lines if ln.startswith("{")]
    assert payloads[0]["visited"] == 5
