"""Page-processing stage: HTML → text / metadata / image links / frontier links.

The Ray-Data realization of the reference's per-page processing
(comprehensive_scraper.py:142-222 and smart_cat_discovery.py:218-249) as one
zero-copy Arrow ``map_batches`` transform. The row-wise kernels live in
``functions.htmlkit`` so tests can run them sequentially as the oracle; this
module only does the batch plumbing, which keeps the per-row invariant
("engine == oracle, byte-identical text per url") structural.

Scale notes:
- ``batch_format='pyarrow'`` end-to-end; the html binary column dominates
  block size, so callers should project it away right after this stage
  (SURVEY.md §7.5) — ``extract_docs`` drops it by default.
- The HTML parse is a compiled-regex single pass (no per-row Python object
  soup); heavy lifting is O(bytes).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..functions.htmlkit import extract_all
from ..functions.urlkit import extract_cat_id

DOC_IMAGE_TYPE = pa.list_(
    pa.struct([("url", pa.string()), ("alt", pa.string()), ("title", pa.string())])
)

DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("cat_id", pa.string()),
        ("name", pa.string()),
        ("description", pa.string()),
        ("details_json", pa.string()),  # map<string,string> as JSON for DuckDB parity
        ("text", pa.string()),
        ("images", DOC_IMAGE_TYPE),
        ("links", pa.list_(pa.string())),
        ("n_images", pa.int32()),
        ("n_links", pa.int32()),
    ]
)


def extract_batch(batch: pa.Table, keep_html: bool = False) -> pa.Table:
    """pages(url, warc_ts, html[, text, lang]) → docs rows (DOCS_SCHEMA).

    The stored ``text`` column of the input (the WARC-style pre-extracted
    text) is ignored; text is recomputed from html so the invariant check
    `recomputed == stored` is meaningful.
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    langs = (
        batch["lang"].to_pylist()
        if "lang" in batch.column_names
        else [""] * len(urls)
    )
    ts = (
        batch["warc_ts"]
        if "warc_ts" in batch.column_names
        else pa.nulls(len(urls), pa.timestamp("us"))
    )
    api_images = (
        batch["api_image"].to_pylist()
        if "api_image" in batch.column_names
        else [""] * len(urls)
    )

    texts, names, descs, details, images, links = [], [], [], [], [], []
    for url, raw, api_img in zip(urls, htmls, api_images):
        html = raw.decode("utf-8", errors="replace") if raw is not None else ""
        # fused single-parse extraction (byte-identical to the individual
        # kernels — see htmlkit.extract_all)
        txt, nm, dsc, kv, imgs, lnks = extract_all(url, html, api_image=api_img or "")
        texts.append(txt)
        names.append(nm)
        descs.append(dsc)
        details.append(json.dumps(dict(kv), ensure_ascii=False, sort_keys=True))
        images.append(imgs)
        links.append(lnks)

    cols = {
        "url": batch["url"],
        "warc_ts": ts,
        "lang": pa.array(langs, type=pa.string()),
        "cat_id": pa.array([extract_cat_id(u) for u in urls], type=pa.string()),
        "name": pa.array(names, type=pa.string()),
        "description": pa.array(descs, type=pa.string()),
        "details_json": pa.array(details, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "images": pa.array(images, type=DOC_IMAGE_TYPE),
        "links": pa.array(links, type=pa.list_(pa.string())),
        "n_images": pa.array([len(x) for x in images], type=pa.int32()),
        "n_links": pa.array([len(x) for x in links], type=pa.int32()),
    }
    if keep_html:
        cols["html"] = batch["html"]
    return pa.table(cols)


def extract_docs(
    pages: "ray.data.Dataset", *, batch_size: int = 256, keep_html: bool = False
) -> "ray.data.Dataset":
    """Dataset-level wrapper: pages → docs. Stateless tasks (no model/state),
    so plain-function ``map_batches``; the streaming executor elasticizes
    the task count. batch_size is modest because html rows are wide."""
    return pages.map_batches(
        lambda b: extract_batch(b, keep_html=keep_html),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def explode_images(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """docs → one row per harvested image link (url, cat_id, img_url, seq,
    alt, title). The Dataset analog of the reference's per-image download
    loop index (comprehensive_scraper.py:226-231: image_{i+1})."""

    def _explode(batch: pa.Table) -> pa.Table:
        urls, cats, img_urls, seqs, alts, titles = [], [], [], [], [], []
        for url, cat, imgs in zip(
            batch["url"].to_pylist(),
            batch["cat_id"].to_pylist(),
            batch["images"].to_pylist(),
        ):
            for i, img in enumerate(imgs or []):
                urls.append(url)
                cats.append(cat)
                img_urls.append(img["url"])
                seqs.append(i + 1)
                alts.append(img["alt"])
                titles.append(img["title"])
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "cat_id": pa.array(cats, type=pa.string()),
                "img_url": pa.array(img_urls, type=pa.string()),
                "seq": pa.array(seqs, type=pa.int32()),
                "alt": pa.array(alts, type=pa.string()),
                "title": pa.array(titles, type=pa.string()),
            }
        )

    return docs.map_batches(_explode, batch_format="pyarrow")
