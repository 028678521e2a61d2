"""WARC source/sink roundtrip + crawl-from-WARC integration."""

import pyarrow as pa
import pytest

from webscrape_neko_jirushi_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)
from webscrape_neko_jirushi_ray.synth import synth_pages


@pytest.mark.parametrize("compress", [True, False])
def test_warc_roundtrip(ray_session, tmp_path, compress):
    pages, _ = synth_pages(num_listing_pages=2, seed=41)
    # two shards, as Common Crawl distributes segments. NB: the .gz suffix
    # matters — ray.data.read_binary_files auto-decompresses by extension
    ext = "warc.gz" if compress else "warc"
    half = pages.num_rows // 2
    p1 = write_warc(pages.slice(0, half), str(tmp_path / f"seg1.{ext}"),
                    compress=compress)
    p2 = write_warc(pages.slice(half), str(tmp_path / f"seg2.{ext}"),
                    compress=compress)

    ds = read_warc([p1, p2])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["url"].values == want["url"].values).all()
    # html bytes byte-identical through the WARC envelope
    assert all(a == b for a, b in zip(got["html"], want["html"]))
    # recomputed text equals the oracle text column
    assert (got["text"].values == want["text"].values).all()
    # timestamps preserved to the second (WARC-Date granularity)
    assert all(
        a.replace(microsecond=0) == b.replace(microsecond=0)
        for a, b in zip(got["warc_ts"], want["warc_ts"])
    )


def test_parse_skips_non_response_records():
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.com/a\r\n"
        b"WARC-Date: 2025-08-01T00:00:00Z\r\n"
        b"Content-Length: 42\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\n<html><p>hi</p></html>\r\n\r\n"
    )
    out = parse_warc_bytes(rec)
    assert len(out) == 1
    assert out[0]["url"] == "https://x.com/a"
    assert out[0]["html"].startswith(b"<html>")


def test_crawl_from_warc_corpus(ray_session, tmp_path):
    """End-to-end: WARC shards → pages → partitioned store → crawl ==
    oracle (the Common-Crawl-ingest realization of the engine)."""
    from webscrape_neko_jirushi_ray.config import CrawlConfig
    from webscrape_neko_jirushi_ray.functions.urlkit import (
        add_url_key_columns,
        canonicalize_url,
    )
    from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
    from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore

    from .oracle_crawler import crawl_oracle

    pages, seeds = synth_pages(num_listing_pages=2, seed=47)
    warc = write_warc(pages, str(tmp_path / "crawl.warc.gz"))
    loaded = pa.concat_tables(
        [b for b in read_warc(warc).iter_batches(batch_size=10_000, batch_format="pyarrow")],
        promote_options="default",
    )
    store = PartitionedPageStore.build(
        add_url_key_columns(loaded), str(tmp_path / "store"), num_buckets=8
    )
    cfg = CrawlConfig(host_budget_per_round=30, max_rounds=15, seen_shards=2)
    res = crawl(store, seeds, str(tmp_path / "out"), cfg)
    page_map = {
        canonicalize_url(r["url"]): r["html"].decode("utf-8")
        for r in pages.to_pylist()
    }
    oracle = crawl_oracle(page_map, seeds, host_budget_per_round=30, max_rounds=15)
    assert [v["url"] for v in res.visits.to_pylist()] == oracle.order()
