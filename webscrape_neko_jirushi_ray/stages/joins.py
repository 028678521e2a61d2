"""Partition-bucketed distributed equi-joins over Ray Datasets.

Why not ``Dataset.join``: Ray 2.49's hash-shuffle join intermittently
fails ("No match ... for key field reference" in the aggregator finalize)
when an input contains the SCHEMA-LESS EMPTY BLOCKS that ``map_batches``
emits for empty inputs (the UDF is skipped, so the output block has no
columns) — and almost every real pipeline stage (filters, renames,
projections) can produce such blocks. This module implements the same
physical plan — hash-partition both sides on the key, join each partition
independently — on top of ``groupby(partition).map_groups``, which
tolerates empty blocks, and joins each partition with vectorized kernels
(pyarrow acero for inner, ``pc.is_in`` masks for semi/anti, so semi/anti
support ANY payload type including lists).

Partitioning assumption (document per the build brief): the join keys
hash-distribute over ``num_partitions`` buckets, and each bucket's rows
(both sides) fit in one worker's heap. Raise ``num_partitions`` with the
data; the shuffle itself is Ray's sort-based groupby and streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PART = "_jpart"
_SIDE = "_jside"
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _partition_of(keys: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        # string keys route by a deterministic vectorized hash; the
        # per-partition stitch still joins on the exact string, so a hash
        # collision only co-locates two keys, never merges them
        from ..functions.textkit import _hash_strings

        k = _hash_strings(["" if v is None else v for v in arr.to_pylist()])
    else:
        k = np.asarray(arr.to_numpy(zero_copy_only=False)).astype(np.uint64)
    mixed = (k * _MIX) >> np.uint64(33)
    return pa.array((mixed % np.uint64(num_partitions)).astype(np.int64))


def _pin_before_schema_probe(ds: "ray.data.Dataset"):
    """``ds.schema()`` EXECUTES the full upstream plan when it contains
    an all-to-all stage (aggregate / sort / shuffle) and the executed
    result is NOT reused by the later consume — a join fed by a lazy
    groupby silently paid its input twice (measured: a 147k-group
    aggregate cost ~5 s for the probe and ~5 s again for the join).
    Materialize first in that case so the probe's execution IS the
    join's input; map-only chains keep streaming (their probe runs a
    single block)."""
    try:
        stack = [ds._logical_plan.dag]
        has_a2a = False
        while stack:
            op = stack.pop()
            if any(
                k in type(op).__name__
                for k in ("Aggregate", "Sort", "RandomShuffle", "Repartition")
            ):
                has_a2a = True
                break
            stack.extend(op.input_dependencies)
    except Exception:
        has_a2a = False
    return ds.materialize() if has_a2a else ds


def _ensure_arrow_schema(ds: "ray.data.Dataset"):
    """(dataset, schema) with every schema type a real pa.DataType.

    A dataset whose blocks are pandas-backed (e.g. out of a
    ``map_groups(batch_format="pandas")``) reports PYTHON types from
    ``schema().types`` — ``pa.nulls(n, <class 'object'>)`` then raises
    inside the pad functions. Normalizing through an identity Arrow
    map_batches (fused by the planner, no extra pass at execution) makes
    the schema Arrow-typed. The schema probe pins all-to-all upstreams
    first (:func:`_pin_before_schema_probe`)."""
    ds = _pin_before_schema_probe(ds)
    s = ds.schema()
    if s is None or all(isinstance(t, pa.DataType) for t in s.types):
        return ds, s
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    return ds, ds.schema()


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key: str,
    right_key: str | None = None,
    how: str = "inner",
    num_partitions: int = 64,
    right_suffix: str = "_r",
    bloom_filter_left: bool = False,
    bloom_bits_log2: int = 23,
) -> "ray.data.Dataset":
    """Distributed equi-join on int64 or string keys.

    how: 'inner' | 'left_outer' | 'full_outer' | 'left_semi' |
    'left_anti'. For inner/outer, the right key column is dropped from
    the output (full outer COALESCES it into the left-named key column,
    since each key lives in exactly one hash partition) and conflicting
    right column names get ``right_suffix``; acero does the per-partition
    stitch, so non-key payloads must be acero-joinable types
    (ints/floats/strings/binary — NOT lists; blob-encode those).
    Unmatched rows carry nulls in the other side's columns. Semi/anti use
    is_in masks and carry any left payload type untouched.

    ``bloom_filter_left=True`` (inner / left_semi only) builds a Bloom
    filter of the right keys and prunes definite-non-matching left rows
    BEFORE the shuffle — bit-identical output, big-side shuffle payload
    shrinks toward the true match rate. The right side is materialized
    (it is consumed twice).
    """
    rk = right_key or key
    if bloom_filter_left:
        if how not in ("inner", "left_semi"):
            raise ValueError(
                "bloom_filter_left is only sound for inner/left_semi joins "
                "(anti and outer joins must keep non-matching left rows)"
            )
        right = right.materialize()
        bloom_ref = ray.put(build_bloom(right, rk, bits_log2=bloom_bits_log2))
        left = bloom_prefilter(
            left, bloom_ref, key, bits_log2=bloom_bits_log2
        )
    if how in ("left_semi", "left_anti"):
        return _semi_anti_join(
            left, right, key=key, right_key=rk, anti=(how == "left_anti"),
            num_partitions=num_partitions,
        )
    acero_how = {
        "inner": "inner",
        "left_outer": "left outer",
        "full_outer": "full outer",
    }.get(how)
    if acero_how is None:
        raise ValueError(f"unsupported join type {how!r}")

    left, lschema = _ensure_arrow_schema(left)
    right, rschema = _ensure_arrow_schema(right)
    if lschema is None or rschema is None:
        # Ray reports a None schema only for datasets with zero rows in
        # every block — an inner join against one is empty. Keep the left
        # schema (when it exists) so downstream column refs still resolve.
        if how != "inner":
            raise ValueError(
                "outer hash_join against a schema-less (all-empty) side: "
                "give the empty side a schema (e.g. limit(0) on a typed "
                "source) so null padding is typeable"
            )
        return left.limit(0)
    lnames = list(lschema.names)
    ltypes = list(lschema.types)
    rnames_in = list(rschema.names)
    rtypes_in = list(rschema.types)
    # rename right columns that collide with left ones (key col excepted —
    # it is dropped after the stitch)
    rmap = {}
    for n in rnames_in:
        rmap[n] = (n + right_suffix) if (n in lnames and n != rk) else n
    rnames = [rmap[n] for n in rnames_in]
    rk_out = rmap[rk]

    # combined schema both sides map into (other side's columns null-typed)
    all_names = [_PART, _SIDE] + lnames + [n for n in rnames if n not in lnames]
    all_types = {_PART: pa.int64(), _SIDE: pa.int8()}
    for n, t in zip(lnames, ltypes):
        all_types[n] = t
    for n, t in zip(rnames, rtypes_in):
        if n not in all_types:
            all_types[n] = t

    def _pad(t: pa.Table, side: int, key_col: str, names_here: list[str]) -> pa.Table:
        n = t.num_rows
        cols = {
            _PART: _partition_of(t[key_col], num_partitions),
            _SIDE: pa.array(np.full(n, side, dtype=np.int8)),
        }
        # intersect the plan-time name list with the batch's ACTUAL columns:
        # Ray's schema() can transiently over-report a Project's input
        # columns on complex plans (map_groups -> select_columns chains),
        # and a captured-list-only check would then raise KeyError on the
        # correctly-projected runtime blocks; over-reported names simply
        # null-pad (they are dropped or ignored downstream)
        here = set(names_here) & set(t.column_names)
        for name in all_names[2:]:
            cols[name] = t[name] if name in here else pa.nulls(n, all_types[name])
        return pa.table({nm: cols[nm] for nm in all_names})

    def _pad_left(t: pa.Table) -> pa.Table:
        return _pad(t, 0, key, lnames)

    def _pad_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([rmap.get(c, c) for c in t.column_names])
        return _pad(t, 1, rk_out, rnames)

    combined = left.map_batches(_pad_left, batch_format="pyarrow").union(
        right.map_batches(_pad_right, batch_format="pyarrow")
    )

    out_names = lnames + [n for n in rnames if n != rk_out and n not in lnames]

    def _stitch(g: pa.Table) -> pa.Table:
        side = g[_SIDE]
        lt = g.filter(pc.equal(side, 0)).select(lnames)
        rt = g.filter(pc.equal(side, 1)).select(rnames)
        if how == "inner" and (lt.num_rows == 0 or rt.num_rows == 0):
            return pa.table(
                {n: pa.array([], type=all_types[n]) for n in out_names}
            )
        joined = lt.join(
            rt, keys=[key], right_keys=[rk_out], join_type=acero_how
        )
        # full outer coalesces the key into the left-named column; right-
        # only rows otherwise surface with a null key
        return joined.select(out_names)

    return combined.groupby(_PART).map_groups(_stitch, batch_format="pyarrow")


def _semi_anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key: str,
    right_key: str,
    anti: bool,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Hash-partitioned semi/anti join: the right side is reduced to its
    key column; per partition the decision is one vectorized is_in. Left
    payload columns pass through untouched (any type)."""
    left, lschema = _ensure_arrow_schema(left)
    lnames = list(lschema.names)
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    key_type = ltypes[key]

    def _tag_left(t: pa.Table) -> pa.Table:
        out = t
        if _PART in out.column_names:
            out = out.drop_columns([_PART])
        return out.append_column(_PART, _partition_of(t[key], num_partitions))

    def _tag_right(t: pa.Table) -> pa.Table:
        keys = t[right_key]
        return pa.table(
            {
                _PART: _partition_of(keys, num_partitions),
                "_jkey": pc.cast(keys, key_type),
            }
        )

    left_t = left.map_batches(_tag_left, batch_format="pyarrow")
    right_t = right.map_batches(_tag_right, batch_format="pyarrow")

    def _decide(g: pa.Table) -> pa.Table:
        # side split via _jkey presence: right rows carry it non-null
        is_right = pc.is_valid(g["_jkey"])
        lt = g.filter(pc.invert(is_right)).select(lnames)
        rkeys = g.filter(is_right)["_jkey"].combine_chunks()
        if lt.num_rows == 0:
            return pa.table({n: pa.array([], type=ltypes[n]) for n in lnames})
        if len(rkeys) == 0:
            hit = pa.array(np.zeros(lt.num_rows, dtype=bool))
        else:
            hit = pc.is_in(lt[key], value_set=rkeys)
        mask = pc.invert(hit) if anti else hit
        return lt.filter(mask)

    # union needs one schema: pad left with null _jkey, right with null
    # left columns
    def _pad_left(t: pa.Table) -> pa.Table:
        return t.append_column("_jkey", pa.nulls(t.num_rows, key_type))

    def _pad_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in lnames:
            cols[n] = (
                pa.nulls(t.num_rows, ltypes[n])
            )
        cols[_PART] = t[_PART]
        cols["_jkey"] = t["_jkey"]
        order = lnames + [_PART, "_jkey"]
        return pa.table({nm: cols[nm] for nm in order})

    def _order_left(t: pa.Table) -> pa.Table:
        order = lnames + [_PART, "_jkey"]
        return t.select(order)

    combined = (
        left_t.map_batches(_pad_left, batch_format="pyarrow")
        .map_batches(_order_left, batch_format="pyarrow")
        .union(right_t.map_batches(_pad_right, batch_format="pyarrow"))
    )
    return combined.groupby(_PART).map_groups(_decide, batch_format="pyarrow")


def broadcast_join(
    left: "ray.data.Dataset",
    right_table: pa.Table,
    *,
    key: str,
    right_key: str | None = None,
    how: str = "inner",
    right_suffix: str = "_r",
) -> "ray.data.Dataset":
    """Zero-shuffle join against a SMALL dimension table (the brief's
    "broadcast small sides with ray.put + lookup inside map_batches"):
    ``right_table`` is sorted by key and put in the object store ONCE;
    every task reads it zero-copy and resolves matches with a vectorized
    ``np.searchsorted`` — the corpus side never moves.

    how: 'inner' | 'left_outer'. Right keys must be unique (dimension
    contract; raises otherwise). Use :func:`hash_join` when the right
    side doesn't comfortably fit in one worker's memory.
    """
    import ray as _ray

    rk = right_key or key
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported broadcast join type {how!r}")
    rt = right_table.sort_by(rk)
    rkeys = np.asarray(rt[rk].to_numpy(zero_copy_only=False))
    if len(np.unique(rkeys)) != len(rkeys):
        raise ValueError("broadcast_join right side has duplicate keys")
    left = _pin_before_schema_probe(left)
    lschema = left.schema()
    if lschema is None:
        # all blocks empty and schema-less (a fully-filtering upstream
        # map_batches) — same guard hash_join carries: inner against an
        # empty side is empty; outer null-padding is untypeable
        if how != "inner":
            raise ValueError(
                "broadcast_join left_outer against a schema-less "
                "(all-empty) left side: give it a schema (e.g. limit(0) "
                "on a typed source) so null padding is typeable"
            )
        return left.limit(0)
    lnames = list(lschema.names)
    payload_names = [n for n in rt.column_names if n != rk]
    out_names = {
        n: (n + right_suffix) if n in lnames else n for n in payload_names
    }
    rt_ref = _ray.put((rkeys, rt.select(payload_names)))

    def _lookup(t: pa.Table) -> pa.Table:
        keys_sorted, payload = _ray.get(rt_ref)
        kcol = t[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        lk = np.asarray(kcol.to_numpy(zero_copy_only=False))
        # null left keys are NON-MATCHES (SQL semantics), not probe fodder:
        # None in an object array makes searchsorted raise on string keys,
        # and NaN only accidentally misses on int keys (ADVICE r3). Patch
        # nulls with a valid sentinel for the probe, then veto their hits.
        valid = None
        if kcol.null_count:
            valid = np.asarray(pc.is_valid(kcol).to_numpy(zero_copy_only=False))
            if len(keys_sorted):
                lk = lk.copy()
                lk[~valid] = keys_sorted[0]
        idx = np.searchsorted(keys_sorted, lk)
        idx_c = np.clip(idx, 0, max(len(keys_sorted) - 1, 0))
        hit = (
            (keys_sorted[idx_c] == lk)
            if len(keys_sorted)
            else np.zeros(len(lk), dtype=bool)
        )
        if valid is not None:
            hit = hit & valid
        if how == "inner":
            t = t.filter(pa.array(hit))
            idx_c = idx_c[hit]
            for n in payload_names:
                t = t.append_column(
                    out_names[n],
                    payload[n].combine_chunks().take(pa.array(idx_c, pa.int64())),
                )
            return t
        # left_outer: attach values where hit, null otherwise
        if len(keys_sorted) == 0:
            # empty dimension: every payload column is all-null (take on
            # a 0-length array would raise)
            for n in payload_names:
                t = t.append_column(
                    out_names[n],
                    pa.nulls(len(lk), payload.schema.field(n).type),
                )
            return t
        take_idx = np.where(hit, idx_c, -1)
        mask = pa.array(take_idx >= 0)
        for n in payload_names:
            col = payload[n].combine_chunks().take(
                pa.array(np.maximum(take_idx, 0), pa.int64())
            )
            t = t.append_column(
                out_names[n], pc.if_else(mask, col, pa.nulls(len(lk), col.type))
            )
        return t

    return left.map_batches(_lookup, batch_format="pyarrow")


# --- Bloom-filter join pruning ---------------------------------------------
#
# At the design scale the dominant join cost is shuffling the BIG side;
# when the other side is selective (a filtered key set, a dimension
# subset), most big-side rows shuffle only to be dropped at the stitch.
# A Bloom filter of the small side's keys, broadcast once, prunes those
# rows BEFORE the all-to-all — false positives just ride the shuffle and
# die at the exact is_in/acero stitch, so results are bit-identical.
# Sound ONLY for inner / left_semi (left_anti and the outers must keep
# non-matching left rows).

_BLOOM_SEED1 = np.uint64(0x8B72E4A6F3C19D05)
_BLOOM_SEED2 = np.uint64(0x6A09E667F3BCC909)
_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    x = x + seed
    x = (x ^ (x >> np.uint64(30))) * _SM1
    x = (x ^ (x >> np.uint64(27))) * _SM2
    return x ^ (x >> np.uint64(31))


def _bloom_u64(keys: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """(uint64 key stream, validity mask): ints pass through, strings take
    the routing siphash. Null keys are masked — they never equi-match, so
    the caller decides whether they ride through."""
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    valid = np.asarray(
        pc.is_valid(arr).to_numpy(zero_copy_only=False), dtype=bool
    )
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        from ..functions.textkit import _hash_strings

        u = _hash_strings(["" if v is None else v for v in arr.to_pylist()])
    else:
        u = np.asarray(
            pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
    return u, valid


def _bloom_positions(u: np.ndarray, bits_log2: int, num_hashes: int):
    h1 = _splitmix(u, _BLOOM_SEED1)
    h2 = _splitmix(u, _BLOOM_SEED2) | np.uint64(1)
    mask = np.uint64((1 << bits_log2) - 1)
    for i in range(num_hashes):
        yield (h1 + np.uint64(i) * h2) & mask


def build_bloom(
    ds: "ray.data.Dataset", key: str, *, bits_log2: int = 23, num_hashes: int = 4
) -> np.ndarray:
    """One-pass distributed Bloom build: each batch sets its keys' bits in
    a local 2^bits_log2-bit bitmap (1 MiB at the default) and emits it as
    ONE binary row; the driver ORs O(blocks) bitmaps. Driver and
    per-batch state are bitmap-sized, never O(keys)."""
    nbytes = (1 << bits_log2) // 8

    def _partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        if t.num_rows:
            u, valid = _bloom_u64(t[key])
            u = u[valid]
            for p in _bloom_positions(u, bits_log2, num_hashes):
                np.bitwise_or.at(
                    bm,
                    (p >> np.uint64(3)).astype(np.int64),
                    (np.uint64(1) << (p & np.uint64(7))).astype(np.uint8),
                )
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    out = np.zeros(nbytes, np.uint8)
    for b in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v in b["bm"]:
            out |= np.frombuffer(v.as_py(), np.uint8)
    return out


def bloom_prefilter(
    left: "ray.data.Dataset",
    bloom_ref,
    key: str,
    *,
    bits_log2: int = 23,
    num_hashes: int = 4,
) -> "ray.data.Dataset":
    """Drop left rows whose key is DEFINITELY absent from the bloom
    (built by :func:`build_bloom`, shipped once via ``ray.put``). Null
    keys pass through untouched — the downstream join owns their
    semantics. False positives survive here and are removed by the
    exact join, so prefilter(join) == join bit-for-bit."""

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bm = ray.get(bloom_ref)
        u, valid = _bloom_u64(t[key])
        member = np.ones(len(u), dtype=bool)
        for p in _bloom_positions(u, bits_log2, num_hashes):
            bits = bm[(p >> np.uint64(3)).astype(np.int64)]
            member &= (
                bits & (np.uint64(1) << (p & np.uint64(7))).astype(np.uint8)
            ) != 0
        return t.filter(pa.array(member | ~valid))

    return left.map_batches(_f, batch_format="pyarrow")
