"""ADVICE r4: event_type_burstiness on an event type observed in exactly
ONE hour — Fano undefined (sample variance needs n >= 2). Engine must
emit NaN exactly where the DuckDB oracle's division emits NULL."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_burstiness_single_hour_type_is_nan(ray_session, tmp_path):
    import duckdb

    from webscrape_neko_jirushi_ray.pipelines.queries import (
        event_type_burstiness,
    )

    base = dt.datetime(2021, 3, 1, 0, 0, 0)
    rows = []
    # 'solo' fires 5 times inside a single hour -> n_hours == 1
    rows += [("solo", base + dt.timedelta(minutes=m)) for m in range(5)]
    # 'spread' fires across 4 hours with varying counts
    for h, k in [(0, 1), (1, 3), (2, 2), (3, 6)]:
        rows += [
            ("spread", base + dt.timedelta(hours=h, minutes=m))
            for m in range(k)
        ]
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    out = event_type_burstiness(str(tmp_path)).set_index("event_type")
    assert np.isnan(out.loc["solo", "fano"])
    assert out.loc["solo", "n_hours"] == 1 and out.loc["solo", "n_events"] == 5

    con = duckdb.connect()
    con.register("events", t)
    oracle = con.execute(
        """
        WITH hc AS (
            SELECT event_type,
                   CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY event_type, hour
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS n,
                   CAST(SUM(c) AS BIGINT) AS n_events,
                   CAST(SUM(c) AS DOUBLE) AS sc,
                   CAST(SUM(c * c) AS DOUBLE) AS scc
            FROM hc GROUP BY event_type
        )
        SELECT event_type, n_hours, n_events,
               ((n * scc - sc * sc) / (n * (n - 1))) / (sc / n) AS fano
        FROM m ORDER BY event_type
        """
    ).df().set_index("event_type")
    # oracle NULL -> pandas NaN; engine NaN must line up, and defined
    # values must match exactly
    assert pd.isna(oracle.loc["solo", "fano"])
    assert out.loc["spread", "fano"] == oracle.loc["spread", "fano"]
