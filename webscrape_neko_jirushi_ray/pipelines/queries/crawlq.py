"""Crawl-engine golden-path queries and reference-parity scalar checks.

Split from the former single-file queries module (VERDICT r4 #8);
names resolve cross-family via the package cross-link in __init__.
"""

from . import _base
from ._base import *  # noqa: F401,F403 — np/pa/pc/pd/ray + stage imports


def extract_docs_pages(sf_dir: str) -> pd.DataFrame:
    """Page extraction (M3-M6): synthesized input_hint pages → docs
    (rows-only check; byte-identity is pinned by tests/test_extract.py
    and the in-query golden hash)."""
    pages, _ = synth_pages(num_listing_pages=4, seed=42)
    docs = extract_docs(ray.data.from_arrow(pages))
    out = docs.select_columns(
        ["url", "cat_id", "name", "n_images", "n_links", "text"]
    ).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    return _golden_guard(
        out, "0ddcb45c09060c2490ed84819cfb6363", "extract_docs_pages"
    )


def harvest_images_pages(sf_dir: str) -> pd.DataFrame:
    """Image-link harvest exploded to rows (M3/M4/M10 + S3 analog)."""
    pages, _ = synth_pages(num_listing_pages=4, seed=42)
    docs = extract_docs(ray.data.from_arrow(pages))
    out = explode_images(docs).to_pandas()
    out = out.sort_values(["url", "seq"]).reset_index(drop=True)
    return _golden_guard(
        out, "c49b76927544d0f301673c3ca86e0096", "harvest_images_pages"
    )


def crawl_visits(sf_dir: str) -> pd.DataFrame:
    """Full frontier loop on the synthesized site (golden order pinned vs
    the sequential oracle in tests; rows-only check here)."""
    import tempfile

    from ...config import CrawlConfig
    from ...sources.pages import BroadcastPageStore
    from ..crawl import crawl

    pages, seeds = synth_pages(num_listing_pages=4, seed=42)
    with tempfile.TemporaryDirectory() as td:
        res = crawl(
            BroadcastPageStore(pages),
            seeds,
            td,
            CrawlConfig(host_budget_per_round=32, max_rounds=20, seen_shards=2),
        )
    out = res.visits.to_pandas()
    out["url_sha1"] = out["url_sha1"].map(lambda b: b.hex())
    return _golden_guard(
        out, "11f10653a0260d9945cae4f581354cb7", "crawl_visits"
    )


def kv_parse_props(sf_dir: str) -> pd.DataFrame:
    """Key-value parse (M6 analog): extract the integer under key 'k' from
    the JSON-ish props string with the same regex as the SQL oracle."""
    import re

    rx = re.compile(r'"k": (\d+)')
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def _kv(t: pa.Table) -> pa.Table:
        vals = [
            int(m.group(1)) if (m := rx.search(p or "")) else None
            for p in t["props"].to_pylist()
        ]
        return pa.table(
            {"event_id": t["event_id"], "k_val": pa.array(vals, type=pa.int64())}
        )

    out = ds.map_batches(_kv, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def content_type_extensions(sf_dir: str) -> pd.DataFrame:
    """M9: Content-Type -> extension mapping (config.py:117-123 of the
    reference; '.jpg' default)."""
    import ray.data as rd

    from ...config import CONTENT_TYPE_TO_EXTENSION, DEFAULT_IMAGE_EXTENSION

    cts = ["image/jpeg", "image/jpg", "image/png", "image/gif",
           "image/webp", "text/html", "application/json"]
    ds = rd.from_items([{"content_type": c} for c in cts])

    def _map(t: pa.Table) -> pa.Table:
        exts = [
            CONTENT_TYPE_TO_EXTENSION.get(c, DEFAULT_IMAGE_EXTENSION)
            for c in t["content_type"].to_pylist()
        ]
        return t.append_column("ext", pa.array(exts, type=pa.string()))

    return (
        ds.map_batches(_map, batch_format="pyarrow")
        .to_pandas()
        .sort_values("content_type")
        .reset_index(drop=True)
    )


def zero_pad_part_labels(sf_dir: str) -> pd.DataFrame:
    """M7/O3 formatting: the reference's cat_%04d / image_%03d zero-pad
    naming (reorganize_dataset.py:87,103) as a vectorized projection."""
    ds = _read(sf_dir, "part", ["p_partkey"])

    def _label(t: pa.Table) -> pa.Table:
        labels = [f"cat_{int(k) % 10000:04d}" for k in t["p_partkey"].to_pylist()]
        return t.append_column("label", pa.array(labels, type=pa.string()))

    out = ds.map_batches(_label, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def cleaning_advanced_counts(sf_dir: str) -> pd.DataFrame:
    """F1-F7 per-reason removal accounting over the synthetic image corpus
    (advanced_cleaning.py report shape)."""
    import ray.data as rd

    from ...stages.cleaning import advanced_cleaning_pipeline, removal_stats
    from ...synth import synth_images

    images = synth_images(num_cats=40, images_per_cat=8, seed=42)
    kept, quarantined = advanced_cleaning_pipeline(rd.from_arrow(images))
    stats = removal_stats(quarantined).to_pandas()
    stats = stats.rename(columns={"count()": "n"}).sort_values("removal_reason")
    total = pd.DataFrame(
        {"removal_reason": ["__kept__"], "n": [kept.count()]}
    )
    return pd.concat([stats, total], ignore_index=True)


def scorer_summary_stats(sf_dir: str) -> pd.DataFrame:
    """ST2/A3: pseudo-YOLO scoring summary with the reference's weighted
    mean (yolo_cat_detector.py:219-220)."""
    import ray.data as rd

    from ...stages.scorer import detection_summary, score_images
    from ...synth import synth_images

    images = synth_images(num_cats=30, images_per_cat=6, seed=42)
    s = detection_summary(score_images(rd.from_arrow(images), concurrency=2))
    return pd.DataFrame([s])


def fetch_list_visits(sf_dir: str) -> pd.DataFrame:
    """Streamed fetch-list crawl (the 10^10-scale headline path) over the
    synthesized site: Dataset frontier, task-side seen anti-join + visit
    shards, sub-host-range dense enumeration. Rows-only driver check; the
    visit-order contract is pinned bit-for-bit by tests/test_fetch_list.py
    against a sequential reference."""
    import tempfile

    from ...config import CrawlConfig
    from ...sources.pages import BroadcastPageStore
    from ..crawl import crawl_fetch_list, seeds_to_frontier

    pages, _ = synth_pages(num_listing_pages=4, seed=42)
    frontier = seeds_to_frontier(pages["url"].to_pylist())
    with tempfile.TemporaryDirectory() as td:
        res = crawl_fetch_list(
            BroadcastPageStore(pages),
            frontier,
            td,
            CrawlConfig(
                host_budget_per_round=40, max_rounds=20, seen_shards=2,
                expand_links=False, fetch_batch_size=64,
            ),
        )
        out = res.visits_table().to_pandas()
    out["url_sha1"] = out["url_sha1"].map(lambda b: b.hex())
    out = out.sort_values("visit_idx").reset_index(drop=True)
    return _golden_guard(
        out, "e9b7158242931e8bca91f673817de316", "fetch_list_visits"
    )


def reorganize_layout_suppliers(sf_dir: str) -> pd.DataFrame:
    """The full reorganize stage (name coalesce + sanitize + global dense
    cat enumeration + per-cat filename numbering, reorganize_dataset.py:
    37-161) run over REAL tables so its semantics are SQL-oracled instead
    of only test-pinned: nation = the docs side (cat_id, name), supplier =
    the images side (cat_id, seq=s_suppkey, img_url=s_name). Exercises the
    distributed dimension build (attach_dense_index), the size-routed
    name/index attach, and the bucket-vectorized labeling."""
    import ray.data as rd

    from ...stages.reorganize import reorganize

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    docs = nation.map_batches(
        lambda t: pa.table(
            {
                "cat_id": pc.cast(t["n_nationkey"], pa.string()),
                "name": pc.cast(t["n_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supplier = _read(sf_dir, "supplier", ["s_nationkey", "s_suppkey", "s_name"])
    images = supplier.map_batches(
        lambda t: pa.table(
            {
                "cat_id": pc.cast(t["s_nationkey"], pa.string()),
                "seq": pc.cast(t["s_suppkey"], pa.int64()),
                "img_url": pc.cast(t["s_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    out = reorganize(docs, images).to_pandas()
    return out.sort_values(["cat_id", "seq"]).reset_index(drop=True)
