"""webscrape_neko_jirushi_ray — a Ray-Data-native crawl + page-processing engine.

A from-scratch reimplementation of the *semantics* of
Jocelyn-H213/WebScrape_neko-jirushi (reference snapshot at /root/reference,
read-only) as idiomatic Ray Data pipelines:

- URL frontier + fetch scheduler over Parquet tables of Common-Crawl-style
  pages (``url, warc_ts, html, text, lang``) — see ``pipelines.crawl``.
- Sharded URL-seen set (exact + cuckoo-filter modes) held in an actor pool —
  see ``state.seen``.
- Per-host politeness budgets / token buckets — see ``state.ratelimit``.
- Zero-copy Arrow ``map_batches`` page processing: text extraction, link and
  image-link harvesting, metadata extraction — see ``stages.extract``.
- The reference's cat-dataset cleaning pipeline re-expressed as vectorized
  filters + a groupby(md5) dedup shuffle + an actor-pool model scorer — see
  ``stages.cleaning`` / ``stages.scorer`` / ``stages.reorganize``.
- Large-scale training-data operators (dedup family, similarity search,
  text analysis, multimodal plumbing) — see ``stages.dedup`` /
  ``stages.simsearch`` / ``stages.textstats`` / ``stages.multimodal``.

Nothing here calls ``ray.init()``; the caller owns the Ray session.
"""

__version__ = "0.1.0"
