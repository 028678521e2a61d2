"""Resumable partitioned-Parquet corpus sink.

The build-brief's "resumable output" contract: output is one directory
per partition key (hive-style ``col=value/``), each stamped with a
``_SUCCESS`` marker only after its rows are durably written, so a
re-run after a crash (1) SKIPS every stamped partition without reading
or writing a byte of it, (2) deletes and rewrites partial unstamped
directories. The reference's progress-checkpoint idea
(neko_jirushi_main.py's per-breed progress JSON) generalized to any
keyed Dataset.

Scale design: the skip decision needs only the distinct partition
values already on disk (a directory listing — O(partitions), never
O(rows)); the finished-set is shipped to tasks once via the filter's
captured set and pruned with ``pc.is_in`` (vectorized, no Python row
loop). The write itself is Ray's streaming ``write_parquet`` with
``partition_cols`` — blocks stream straight from upstream tasks to
files, nothing materializes on the driver.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MARKER = "_SUCCESS"


def _partition_dirs(out_dir: str, col: str) -> dict[str, str]:
    """{partition value (string form) -> absolute dir} for existing dirs.

    The writer percent-encodes values into directory names (RFC-3986
    quote: ``a b`` → ``a%20b``, ``x=y`` → ``x%3Dy``; ``~ . _ -`` stay
    verbatim), so the value is recovered with ``unquote`` — quote is
    injective, making the round-trip exact for every non-null value
    (ADVICE r3: the old charset whitelist hard-failed writes hive
    actually handles fine)."""
    from urllib.parse import unquote

    if not os.path.isdir(out_dir):
        return {}
    prefix = f"{col}="
    out = {}
    for name in os.listdir(out_dir):
        full = os.path.join(out_dir, name)
        if name.startswith(prefix) and os.path.isdir(full):
            out[unquote(name[len(prefix):])] = full
    return out


def finished_partitions(out_dir: str, col: str) -> set[str]:
    """Partition values whose directory carries the _SUCCESS stamp."""
    return {
        v
        for v, d in _partition_dirs(out_dir, col).items()
        if os.path.exists(os.path.join(d, _MARKER))
    }


def write_partitioned_resumable(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    partition_col: str,
) -> dict:
    """Write ``ds`` as hive-partitioned Parquet, skipping partitions a
    previous run already finished. Returns
    ``{"written": [values], "skipped": [values]}`` (string forms).
    """
    os.makedirs(out_dir, exist_ok=True)
    dirs = _partition_dirs(out_dir, partition_col)
    done = finished_partitions(out_dir, partition_col)
    # a crashed run leaves unstamped partials — rewrite them from scratch
    for v, d in dirs.items():
        if v not in done:
            shutil.rmtree(d)

    done_list = sorted(done)

    def _prune(batch: pa.Table) -> pa.Table:
        # contract guard: the skip set compares cast(value) against the
        # DECODED hive directory names (see _partition_dirs), which round-
        # trips every non-null value exactly. Nulls are the one genuinely
        # non-round-tripping case (__HIVE_DEFAULT_PARTITION__ is not a
        # value) — fail loudly on those only.
        if batch.num_rows == 0:
            return batch
        col = batch[partition_col]
        if col.null_count:
            raise ValueError(
                f"write_partitioned_resumable: null {partition_col!r} "
                "partition values are not resumable (hive encodes them as "
                "__HIVE_DEFAULT_PARTITION__, which the skip set cannot "
                "match); fill or drop nulls upstream"
            )
        if not done_list:
            return batch
        vals = pc.cast(col, pa.string())
        return batch.filter(
            pc.invert(pc.is_in(vals, value_set=pa.array(done_list)))
        )

    pending = ds.map_batches(_prune, batch_format="pyarrow")

    pending.write_parquet(out_dir, partition_cols=[partition_col])

    written = []
    for v, d in _partition_dirs(out_dir, partition_col).items():
        marker = os.path.join(d, _MARKER)
        if v not in done:
            with open(marker, "w") as f:
                f.write("ok\n")
            written.append(v)
    return {"written": sorted(written), "skipped": sorted(done)}


def compact_shards(
    in_dir: str,
    out_dir: str,
    *,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction (the 100-TB housekeeping op): coalesce a
    directory of many small parquet shards — what per-task streaming
    writes naturally produce — into ``ceil(rows / target)`` right-sized
    files. Row count comes from Ray's parquet metadata fast path (no
    data scan); the rewrite is a shuffle-free ``repartition`` (block
    split/merge, no all-to-all) into a streaming ``write_parquet``.
    Returns {files_in, rows, files_out}. The output directory must not
    exist (compaction is a rewrite, never an append)."""
    import math

    if os.path.exists(out_dir):
        raise FileExistsError(
            f"compact_shards output {out_dir!r} exists — compaction "
            "rewrites into a fresh directory (delete or point elsewhere)"
        )
    files_in = [
        n for n in os.listdir(in_dir) if n.endswith((".parquet", ".pq"))
    ]
    ds = ray.data.read_parquet(in_dir)
    rows = ds.count()
    n_out = max(1, math.ceil(rows / target_rows_per_file))
    ds.repartition(n_out).write_parquet(out_dir)
    return {"files_in": len(files_in), "rows": rows, "files_out": n_out}


def write_sorted_ranges(
    ds: "ray.data.Dataset",
    key: str,
    out_dir: str,
    *,
    num_files: int = 16,
    sample_size: int = 10_000,
) -> "pd.DataFrame":
    """Range-partitioned TOTAL-ORDER export: the corpus lands in
    ``num_files`` parquet files where file i is internally sorted by
    ``key`` and every key in file i <= every key in file i+1 — reading
    the files in name order IS the global sort (the sorted-run layout
    samplers, merge-join consumers and binary-search lookups want).

    Scale plan (the attach_dense_index sampling argument):
    - range boundaries come from a strided CROSS-BLOCK sample (driver
      state O(blocks x per_block), never O(rows); a clustered input
      cannot collapse the boundaries);
    - each row routes to its range via one vectorized searchsorted —
      ONE groupby shuffle total, no global sort exchange;
    - each range task lexsorts ITS slice and writes ITS file directly
      from the worker (multi-node deployments point out_dir at shared
      storage);
    - ranges with no rows write no file; files are named by zero-padded
      range id so lexicographic listing order == key order.

    Returns the manifest (file, rows, key_min, key_max) — O(num_files)
    driver state. Output dir must not exist (rewrite, never append).
    Nulls in ``key`` raise (no total order with nulls).
    """
    import numpy as np
    import pandas as pd

    if os.path.exists(out_dir):
        raise FileExistsError(
            f"write_sorted_ranges: {out_dir} exists — this sink rewrites, "
            "never appends; remove the directory or pick a fresh one"
        )
    os.makedirs(out_dir)

    per_block = max(8, sample_size // 256)

    def _block_sample(t: pa.Table) -> pa.Table:
        if t[key].null_count:
            raise ValueError("write_sorted_ranges: null sort keys")
        t = t.select([key])
        if t.num_rows <= per_block:
            return t
        idx = np.unique(
            np.linspace(0, t.num_rows - 1, per_block).astype(np.int64)
        )
        return t.take(pa.array(idx, pa.int64()))

    sample = ds.map_batches(
        _block_sample, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    if len(sample) == 0:
        return pd.DataFrame(
            {"file": [], "rows": [], "key_min": [], "key_max": []}
        )
    keys_sorted = np.sort(sample[key].to_numpy())
    r = min(num_files, len(keys_sorted))
    bounds = keys_sorted[
        [int(i * len(keys_sorted) / r) for i in range(1, r)]
    ]

    def _tag(t: pa.Table) -> pa.Table:
        if t[key].null_count:
            raise ValueError("write_sorted_ranges: null sort keys")
        v = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bounds, v, side="right")
        return t.append_column("_range_id", pa.array(rid, pa.int64()))

    width = len(str(max(r - 1, 1)))

    def _write(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq  # workers import their own handle

        rid = int(g["_range_id"][0].as_py())
        g = g.drop_columns(["_range_id"])
        order = pc.sort_indices(g, sort_keys=[(key, "ascending")])
        g = g.take(order)
        fname = f"range-{rid:0{width}d}.parquet"
        _pq.write_table(g, os.path.join(out_dir, fname))
        return pa.table(
            {
                "file": pa.array([fname], pa.string()),
                "rows": pa.array([g.num_rows], pa.int64()),
                "key_min": g[key].take(pa.array([0], pa.int64())),
                "key_max": g[key].take(pa.array([g.num_rows - 1], pa.int64())),
            }
        )

    manifest = (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("_range_id")
        .map_groups(_write, batch_format="pyarrow")
        .to_pandas()
    )
    return manifest.sort_values("file").reset_index(drop=True)
