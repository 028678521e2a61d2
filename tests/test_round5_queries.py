"""Round-5 additions: events_interarrival_cv, token_gini_per_lang,
source_dup_overlap — DuckDB-oracled on synthetic inputs that exercise
the NON-trivial paths (the driver corpus has zero cross-source dups and
well-behaved gaps, so these pin the interesting cases: ties, single-gap
types, 3+-source dup fans, tie-heavy token distributions)."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _check(got, sql, con):
    want = con.sql(sql).df()
    g = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    assert g.astype(str).equals(w.astype(str)), (g, w)


def test_interarrival_cv_ties_and_degenerates(ray_session, tmp_path):
    import __ray_entry__ as em

    base = dt.datetime(2022, 1, 1)
    rows = []
    # 'steady': exact 10s cadence -> cv 0; 'bursty': clumps; 'ties':
    # duplicate timestamps (zero gaps); 'solo': one event (no gaps ->
    # NULL); 'pair': exactly two events (n_gaps=1 -> NULL, sample var)
    for i in range(20):
        rows.append(("steady", base + dt.timedelta(seconds=10 * i)))
    for i in range(10):
        rows.append(("bursty", base + dt.timedelta(seconds=i)))
        rows.append(("bursty", base + dt.timedelta(hours=1, seconds=i)))
    for _ in range(5):
        rows.append(("ties", base))
    rows += [("ties", base + dt.timedelta(seconds=30))]
    rows.append(("solo", base))
    rows += [("pair", base), ("pair", base + dt.timedelta(seconds=7))]
    rng = np.random.default_rng(3)
    order = rng.permutation(len(rows))
    t = pa.table(
        {
            "event_type": pa.array([rows[i][0] for i in order], pa.string()),
            "ts": pa.array([rows[i][1] for i in order], pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = em.queries()["events_interarrival_cv"](str(tmp_path))
    con = duckdb.connect()
    con.register("events", t)
    _check(got, em.oracle_sql()["events_interarrival_cv"], con)
    g = got.set_index("event_type")
    assert g.loc["steady", "cv"] == 0.0
    assert pd.isna(g.loc["solo", "cv"]) and pd.isna(g.loc["pair", "cv"])
    assert g.loc["bursty", "cv"] > 1.0


def test_token_gini_hand_check_and_oracle(ray_session, tmp_path):
    import __ray_entry__ as em

    docs = [
        # lang 'u': 4 distinct tokens all count 1 -> gini 0
        ("u", "alpha beta gamma delta"),
        # lang 'z': counts {a:6, b:2, c:1, d:1}; sorted asc c=[1,1,2,6]
        # num = sum((2i-n-1)c) = (2-5)*1+(4-5)*1+(6-5)*2+(8-5)*6 = 16
        # gini = 16 / (4 * 10) = 0.4
        ("z", "a a a b c d"),
        ("z", "a a a b"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "lang": pa.array([d[0] for d in docs], pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = em.queries()["token_gini_per_lang"](str(tmp_path))
    con = duckdb.connect()
    con.register("documents", t)
    _check(got, em.oracle_sql()["token_gini_per_lang"], con)
    g = got.set_index("lang")
    assert g.loc["u", "token_gini"] == 0.0
    assert abs(g.loc["z", "token_gini"] - 0.4) < 1e-12


def test_source_dup_overlap_fanout(ray_session, tmp_path):
    import __ray_entry__ as em

    rows = [
        # "common" appears in s1, s2, s3 (whitespace-normalized match)
        ("s1", "The   shared TEXT"),
        ("s2", "the shared text"),
        ("s3", " the shared\ttext "),
        # "pairwise" only s1 & s3
        ("s1", "pairwise duplicate"),
        ("s3", "pairwise DUPLICATE"),
        # repeated within ONE source only -> no pair
        ("s2", "solo body"), ("s2", "solo body"),
        ("s1", "unique one"), ("s2", "unique two"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = em.queries()["source_dup_overlap"](str(tmp_path))
    con = duckdb.connect()
    con.register("documents", t)
    _check(got, em.oracle_sql()["source_dup_overlap"], con)
    m = {(r.source_a, r.source_b): r.shared_texts for r in got.itertuples()}
    assert m == {("s1", "s2"): 1, ("s1", "s3"): 2, ("s2", "s3"): 1}


def test_round5_queries_tolerate_empty_blocks(ray_session, tmp_path):
    """Upstream filters can hand the partials 0-row blocks; empty inputs
    must produce empty (or all-typed) results, not crashes."""
    import __ray_entry__ as em

    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    qs = em.queries()
    assert len(qs["events_interarrival_cv"](str(tmp_path))) == 0
    assert len(qs["token_gini_per_lang"](str(tmp_path))) == 0
    assert len(qs["source_dup_overlap"](str(tmp_path))) == 0
