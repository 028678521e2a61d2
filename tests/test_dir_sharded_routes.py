"""VERDICT r4 #5: size routes on directory-sharded tables. _fact_rows
must sum per-fragment footer counts for multi-file parquet datasets so
the broadcast/driver small routes ENGAGE on partitioned inputs (the old
behavior silently assumed 'large' and always took the distributed
plan). Proven by (a) exact counts on a sharded copy, (b) a size-routed
query whose large path is monkeypatched to raise, (c) unchanged
answers vs the single-file input."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "orders", "lineitem"]


@pytest.fixture(scope="module")
def sharded_sf(tmp_path_factory):
    """sf0.001 with every table rewritten as a DIRECTORY of 3 parquet
    fragments (table.parquet/part-*.parquet)."""
    root = tmp_path_factory.mktemp("sharded_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{SF}/{t}.parquet")
        d = root / f"{t}.parquet"
        d.mkdir()
        n = tbl.num_rows
        cuts = [0, max(1, n // 3), max(2, 2 * n // 3), n]
        for i in range(3):
            pq.write_table(
                tbl.slice(cuts[i], cuts[i + 1] - cuts[i]),
                d / f"part-{i}.parquet",
            )
    return str(root)


def test_fact_rows_sums_fragments(sharded_sf):
    from webscrape_neko_jirushi_ray.pipelines.queries import _fact_rows

    for t in TABLES:
        want = pq.read_metadata(f"{SF}/{t}.parquet").num_rows
        assert _fact_rows(sharded_sf, t) == want, t
    # unreadable input still routes conservatively large
    from webscrape_neko_jirushi_ray.pipelines.queries import (
        _BLOOM_PREFILTER_ROUTE_ROWS,
    )

    assert (
        _fact_rows("/nonexistent", "nope") == _BLOOM_PREFILTER_ROUTE_ROWS + 1
    )


def test_broadcast_route_engages_on_sharded_input(
    ray_session, sharded_sf, monkeypatch
):
    """nation_revenue on the sharded copy must take the SMALL route (the
    distributed fallback is patched to raise) and match the single-file
    answer exactly."""
    import webscrape_neko_jirushi_ray.pipelines.queries as q

    want = q.nation_revenue(SF)

    def _boom(sf_dir):
        raise AssertionError(
            "distributed route engaged on a small sharded input"
        )

    import sys
    monkeypatch.setattr(
        sys.modules[q.nation_revenue.__module__],
        "nation_revenue_distributed", _boom,
    )
    got = q.nation_revenue(sharded_sf)
    pd.testing.assert_frame_equal(got, want)


def test_sharded_answers_unchanged(ray_session, sharded_sf):
    """A sample of size-routed queries over the sharded copy returns
    byte-identical results to the single-file input (both engage their
    small routes now; pq.read_table reads directories natively)."""
    import webscrape_neko_jirushi_ray.pipelines.queries as q

    for fn in (
        q.median_price_per_nation,
        q.nation_trade_matrix,
        q.customer_rfm_scores,
        q.order_price_gini_by_nation,
    ):
        want = fn(SF)
        got = fn(sharded_sf)
        pd.testing.assert_frame_equal(got, want), fn.__name__
