"""PartitionedPageStore layout invariants (incremental build guards)."""

import pyarrow as pa
import pytest

from webscrape_neko_jirushi_ray.functions.urlkit import add_url_key_columns
from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore


def _pages(tag: str, n: int = 8) -> pa.Table:
    urls = [f"https://s.test/{tag}/{i}" for i in range(n)]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array([0] * n, type=pa.timestamp("us")),
            "html": pa.array([f"<p>{tag}{i}</p>".encode() for i in range(n)],
                             type=pa.binary()),
            "lang": pa.array(["en"] * n, type=pa.string()),
        }
    )


def test_incremental_append_same_buckets_ok(tmp_path):
    root = str(tmp_path / "ps")
    PartitionedPageStore.build(add_url_key_columns(_pages("a")), root,
                               num_buckets=4, part_name="part0")
    store = PartitionedPageStore.build(
        add_url_key_columns(_pages("b")), root, num_buckets=4, part_name="part1"
    )
    f = store.make_fetcher()
    keyed = add_url_key_columns(_pages("a"))
    got = f.fetch_by_sha1(
        keyed["canon_url"].to_pylist(), keyed["url_sha1"].to_pylist()
    )
    assert got.num_rows == 8  # part0 rows still reachable after append


def test_append_with_mismatched_bucket_count_raises(tmp_path):
    """ADVICE r2: appending under a different num_buckets silently
    re-routed all lookups — must raise instead of overwriting the meta."""
    root = str(tmp_path / "ps")
    PartitionedPageStore.build(add_url_key_columns(_pages("a")), root,
                               num_buckets=4, part_name="part0")
    with pytest.raises(ValueError, match="num_buckets"):
        PartitionedPageStore.build(
            add_url_key_columns(_pages("b")), root,
            num_buckets=8, part_name="part1",
        )
