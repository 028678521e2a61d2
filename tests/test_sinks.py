"""Resumable partitioned-Parquet sink (state/sinks): stamped partitions
are skipped byte-for-byte on re-run; unstamped partials are rewritten."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from webscrape_neko_jirushi_ray.state.sinks import (
    finished_partitions,
    write_partitioned_resumable,
)


def _ds(rows: list[tuple[int, str, str]]) -> ray.data.Dataset:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "lang": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    return ray.data.from_arrow(tbl).repartition(2)


def _read_lang(out: str, lang: str) -> set[str]:
    d = os.path.join(out, f"lang={lang}")
    tbl = pq.read_table(d)
    return set(tbl["text"].to_pylist())


def test_fresh_write_stamps_all(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    rows = [(1, "en", "one"), (2, "en", "two"), (3, "fr", "trois")]
    res = write_partitioned_resumable(_ds(rows), out, partition_col="lang")
    assert res == {"written": ["en", "fr"], "skipped": []}
    assert finished_partitions(out, "lang") == {"en", "fr"}
    assert _read_lang(out, "en") == {"one", "two"}


def test_resume_skips_stamped_and_rewrites_partial(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    rows = [(1, "en", "one"), (3, "fr", "trois"), (4, "de", "vier")]
    write_partitioned_resumable(_ds(rows), out, partition_col="lang")
    # simulate a crash on 'fr': drop its stamp (partial dir remains)
    os.remove(os.path.join(out, "lang=fr", "_SUCCESS"))
    # second run ships DIFFERENT rows for every lang; stamped partitions
    # must keep their original bytes, the unstamped one must be rewritten
    rows2 = [(1, "en", "POISON"), (3, "fr", "trois-v2"), (4, "de", "POISON")]
    res = write_partitioned_resumable(_ds(rows2), out, partition_col="lang")
    assert res["skipped"] == ["de", "en"]
    assert res["written"] == ["fr"]
    assert _read_lang(out, "en") == {"one"}  # untouched
    assert _read_lang(out, "de") == {"vier"}  # untouched
    assert _read_lang(out, "fr") == {"trois-v2"}  # rewritten from run 2


def test_resume_noop_when_everything_stamped(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    rows = [(1, "en", "one")]
    write_partitioned_resumable(_ds(rows), out, partition_col="lang")
    res = write_partitioned_resumable(
        _ds([(1, "en", "POISON")]), out, partition_col="lang"
    )
    assert res == {"written": [], "skipped": ["en"]}
    assert _read_lang(out, "en") == {"one"}


def test_resumable_sink_rejects_null_partition_values(ray_session, tmp_path):
    import pytest

    import pyarrow as pa
    import ray.data

    from webscrape_neko_jirushi_ray.state.sinks import (
        write_partitioned_resumable,
    )

    with_null = ray.data.from_arrow(
        pa.table({"p": pa.array(["a", None]), "v": pa.array([1, 2], pa.int64())})
    )
    with pytest.raises(Exception, match="null.*not resumable"):
        write_partitioned_resumable(
            with_null, str(tmp_path / "o1"), partition_col="p"
        )


def test_resumable_sink_roundtrips_hive_encoded_values(ray_session, tmp_path):
    """Values hive percent-encodes ('a/b', 'x=y', spaces, unicode) must
    write, stamp, and SKIP correctly on re-run — the skip set compares
    against the DECODED directory names (ADVICE r3)."""
    out = str(tmp_path / "enc")
    vals = ["a/b", "x=y", "a b", "a%b", "日本", "a~b", "a+b"]
    tbl = pa.table({"p": pa.array(vals), "v": pa.array([1] * len(vals), pa.int64())})
    res = write_partitioned_resumable(
        ray.data.from_arrow(tbl), out, partition_col="p"
    )
    assert sorted(res["written"]) == sorted(vals)
    assert finished_partitions(out, "p") == set(vals)
    # re-run with poison rows: every partition must be skipped untouched
    tbl2 = pa.table(
        {"p": pa.array(vals), "v": pa.array([99] * len(vals), pa.int64())}
    )
    res2 = write_partitioned_resumable(
        ray.data.from_arrow(tbl2), out, partition_col="p"
    )
    assert res2["written"] == [] and sorted(res2["skipped"]) == sorted(vals)
    got = pq.read_table(out).column("v").to_pylist()
    assert set(got) == {1}


def test_resumable_sink_tolerates_empty_blocks(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from webscrape_neko_jirushi_ray.state.sinks import (
        write_partitioned_resumable,
    )

    ds = ray.data.from_arrow(
        pa.table({"p": pa.array(["a", "b"]), "v": pa.array([1, 2], pa.int64())})
    ).repartition(6)  # more blocks than rows -> empty blocks in the stream
    res = write_partitioned_resumable(ds, str(tmp_path / "o"), partition_col="p")
    assert sorted(res["written"]) == ["a", "b"]


def test_compact_shards_roundtrip(ray_session, tmp_path):
    """Many tiny shards -> few right-sized files; rows and values
    identical, output file count matches ceil(rows/target), existing
    output dir refused."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscrape_neko_jirushi_ray.state.sinks import compact_shards

    src = tmp_path / "small"
    src.mkdir()
    rng = np.random.default_rng(3)
    all_rows = []
    for i in range(40):  # 40 shards x 50 rows
        t = pa.table(
            {
                "k": rng.integers(0, 1000, 50).astype("int64"),
                "v": rng.normal(size=50),
            }
        )
        pq.write_table(t, src / f"shard_{i:03d}.parquet")
        all_rows.append(t.to_pandas())
    want = (
        pd.concat(all_rows)
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )

    out = tmp_path / "compact"
    res = compact_shards(str(src), str(out), target_rows_per_file=500)
    assert res == {"files_in": 40, "rows": 2000, "files_out": 4}
    got = (
        pq.read_table(str(out))
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    n_files = len([n for n in out.iterdir() if n.suffix == ".parquet"])
    assert n_files == 4

    import pytest

    with pytest.raises(FileExistsError):
        compact_shards(str(src), str(out))


def test_write_sorted_ranges_total_order(ray_session, tmp_path):
    """Files read in name order reproduce the global sort; ranges are
    disjoint and internally sorted; manifest matches the files."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from webscrape_neko_jirushi_ray.state.sinks import write_sorted_ranges

    rng = np.random.default_rng(3)
    keys = rng.integers(-(10**9), 10**9, 20_000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {"k": pa.array(keys, pa.int64()),
             "payload": pa.array(np.arange(len(keys), dtype=np.int64))}
        )
    ).repartition(8)
    out = str(tmp_path / "sorted")
    manifest = write_sorted_ranges(ds, "k", out, num_files=7)
    assert manifest["rows"].sum() == len(keys)
    got = []
    prev_max = None
    for f in sorted(manifest["file"]):
        t = pq.read_table(f"{out}/{f}")
        col = t["k"].to_numpy()
        assert (np.diff(col) >= 0).all(), f  # internally sorted
        if prev_max is not None:
            assert col[0] >= prev_max  # disjoint ordered ranges
        prev_max = col[-1]
        got.append(col)
    joined = np.concatenate(got)
    assert (joined == np.sort(keys)).all()


def test_write_sorted_ranges_guards(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    import ray.data

    from webscrape_neko_jirushi_ray.state.sinks import write_sorted_ranges

    ds = ray.data.from_arrow(pa.table({"k": pa.array([3, 1], pa.int64())}))
    out = str(tmp_path / "dup")
    write_sorted_ranges(ds, "k", out, num_files=2)
    with pytest.raises(FileExistsError):
        write_sorted_ranges(ds, "k", out, num_files=2)
    nulls = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64())})
    )
    with pytest.raises(Exception):
        write_sorted_ranges(nulls, "k", str(tmp_path / "n"), num_files=2)
