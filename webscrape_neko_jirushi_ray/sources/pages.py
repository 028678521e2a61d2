"""Page stores: how fetch actors resolve frontier URLs to stored pages.

The reference's "fetch" is an HTTP GET (comprehensive_scraper.py:153). In
the Parquet-world rebuild (SURVEY.md S2/J3), fetch is a lookup of the
frontier URL in the Common-Crawl-style page table. Two implementations with
the same interface, chosen by data size:

- ``BroadcastPageStore``: the whole page table is ``ray.put`` once and each
  fetch actor materializes a url_sha1 → row-index dict in ``__init__``
  (zero-copy Arrow via the object store). Right when pages fit in the object
  store (fixtures, small crawls, hot caches).
- ``PartitionedPageStore``: pages are bucketed by ``url_sha1[0] % B`` into a
  Hive-partitioned Parquet layout, each bucket sorted by url_sha1 so Parquet
  row-group statistics prune lookups. A fetch batch touches only the buckets
  its keys hash to — the 10^10-scale path: per-round I/O is proportional to
  the candidate set, never to the page table.

Both return rows with ``fetch_status`` ('ok' | 'notfound') instead of
raising — the app-level analog of the reference's failed_pages/failed_urls
sets (comprehensive_scraper.py:270-272, smart_cat_discovery.py:172,309).
"""

from __future__ import annotations

import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray

PAGE_COLUMNS = ["url", "warc_ts", "html", "lang"]


class BroadcastPageStore:
    """ray.put the page table once; actors index it once in __init__."""

    def __init__(self, pages: pa.Table):
        self.table_ref = ray.put(pages)

    def cache_key(self) -> str:
        return f"broadcast:{self.table_ref.hex()}"

    def make_fetcher(self) -> "BroadcastFetcher":
        return BroadcastFetcher(self.table_ref)


class BroadcastFetcher:
    def __init__(self, table_ref):
        self.table: pa.Table = ray.get(table_ref)
        urls = self.table["url"].to_pylist()
        self.index: dict[str, int] = {u: i for i, u in enumerate(urls)}

    def fetch(self, urls: list[str]) -> pa.Table:
        idx = [self.index.get(u, -1) for u in urls]
        hit_rows = [i for i in idx if i >= 0]
        sub = self.table.take(pa.array(hit_rows, type=pa.int64())) if hit_rows else None
        out_html: list[bytes | None] = []
        out_ts = []
        out_lang = []
        j = 0
        for i in idx:
            if i >= 0:
                out_html.append(sub["html"][j].as_py())
                out_ts.append(sub["warc_ts"][j].as_py())
                out_lang.append(sub["lang"][j].as_py())
                j += 1
            else:
                out_html.append(None)
                out_ts.append(None)
                out_lang.append(None)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(out_ts, type=pa.timestamp("us")),
                "html": pa.array(out_html, type=pa.binary()),
                "lang": pa.array(out_lang, type=pa.string()),
                "fetch_status": pa.array(
                    ["ok" if i >= 0 else "notfound" for i in idx], type=pa.string()
                ),
            }
        )


class PartitionedPageStore:
    """Hive-partitioned bucket layout keyed by sha1(canon url) prefix.

    The layout is self-describing: ``build`` writes ``_store_meta.json``
    with the bucket count, and ``__init__`` prefers it over the argument —
    opening a store with the wrong bucket count would silently miss every
    lookup (keys route to the wrong bucket dir)."""

    META_NAME = "_store_meta.json"

    def __init__(self, root: str, num_buckets: int = 16):
        self.root = root
        meta_path = os.path.join(root, self.META_NAME)
        if os.path.exists(meta_path):
            import json

            with open(meta_path, encoding="utf-8") as f:
                num_buckets = int(json.load(f)["num_buckets"])
        self.num_buckets = num_buckets

    def cache_key(self) -> str:
        return f"partitioned:{self.root}:{self.num_buckets}"

    @staticmethod
    def build(
        pages_with_keys: pa.Table,
        root: str,
        num_buckets: int = 16,
        part_name: str = "part0",
    ) -> "PartitionedPageStore":
        """Layout build. ``pages_with_keys`` must carry ``url_sha1``; rows
        land in bucket sha1[0] % B, sorted by url_sha1 within the bucket so
        row-group stats prune point lookups. Call repeatedly with distinct
        ``part_name`` values to APPEND shards (each part is sorted within
        itself; the bucket dataset is a union of sorted files, which the
        filter scan prunes per file) — large corpora build incrementally
        without ever holding the whole table.

        At scale this build is itself a Dataset job
        (ds.write_parquet(partition_cols=['bucket'])); driver-side here
        because fixtures are small.
        """
        import json

        meta_path = os.path.join(root, PartitionedPageStore.META_NAME)
        if os.path.exists(meta_path):
            # appending under a DIFFERENT bucket count would re-route every
            # lookup by the new modulus, silently orphaning rows written
            # under the old one — fail loudly instead of overwriting
            with open(meta_path, encoding="utf-8") as f:
                existing = int(json.load(f)["num_buckets"])
            if existing != num_buckets:
                raise ValueError(
                    f"store at {root} was built with num_buckets={existing}; "
                    f"append requested num_buckets={num_buckets} — rebuild "
                    "the store or pass the original bucket count"
                )
        sha = pages_with_keys["url_sha1"].to_pylist()
        bucket = pa.array([s[0] % num_buckets for s in sha], type=pa.int32())
        t = pages_with_keys.append_column("bucket", bucket)
        # one global (bucket, sha1) sort + boundary slices beats B filter
        # passes over the full table
        t = t.sort_by([("bucket", "ascending"), ("url_sha1", "ascending")])
        bcol = t["bucket"].to_numpy()
        import numpy as np

        bounds = np.searchsorted(bcol, np.arange(num_buckets + 1))
        for b in range(num_buckets):
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            if lo == hi:
                continue
            sub = t.slice(lo, hi - lo)
            path = os.path.join(root, f"bucket={b}")
            os.makedirs(path, exist_ok=True)
            pq.write_table(
                sub.drop_columns(["bucket"]),
                os.path.join(path, f"{part_name}.parquet"),
                row_group_size=4096,
            )
        import json

        os.makedirs(root, exist_ok=True)
        meta_path = os.path.join(root, PartitionedPageStore.META_NAME)
        with open(meta_path, "w", encoding="utf-8") as f:
            json.dump({"num_buckets": num_buckets}, f)
        return PartitionedPageStore(root, num_buckets)

    def make_fetcher(self) -> "PartitionedFetcher":
        return PartitionedFetcher(self.root, self.num_buckets)


class PartitionedFetcher:
    """Reads only the buckets a batch's keys fall in, with an IN filter —
    Parquet predicate pushdown does the point lookups."""

    def __init__(self, root: str, num_buckets: int):
        self.root = root
        self.num_buckets = num_buckets

    def fetch_by_sha1(self, urls: list[str], sha1s: list[bytes]) -> pa.Table:
        by_bucket: dict[int, list[int]] = defaultdict(list)
        for pos, s in enumerate(sha1s):
            by_bucket[s[0] % self.num_buckets].append(pos)
        rows_by_url: dict[str, tuple] = {}
        for b, positions in by_bucket.items():
            path = os.path.join(self.root, f"bucket={b}")
            if not os.path.isdir(path):
                continue
            want = pa.array([sha1s[p] for p in positions], type=pa.binary())
            dset = pads.dataset(path, format="parquet")
            sub = dset.to_table(
                columns=["url", "warc_ts", "html", "lang", "url_sha1"],
                filter=pads.field("url_sha1").isin(want),
            )
            for row in sub.to_pylist():
                rows_by_url[row["url"]] = (row["warc_ts"], row["html"], row["lang"])
        out_ts, out_html, out_lang, status = [], [], [], []
        for u in urls:
            hit = rows_by_url.get(u)
            if hit:
                out_ts.append(hit[0]); out_html.append(hit[1]); out_lang.append(hit[2])
                status.append("ok")
            else:
                out_ts.append(None); out_html.append(None); out_lang.append(None)
                status.append("notfound")
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(out_ts, type=pa.timestamp("us")),
                "html": pa.array(out_html, type=pa.binary()),
                "lang": pa.array(out_lang, type=pa.string()),
                "fetch_status": pa.array(status, type=pa.string()),
            }
        )
