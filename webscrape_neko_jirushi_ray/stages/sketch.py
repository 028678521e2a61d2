"""Mergeable cardinality sketch: HyperLogLog distinct-token counting
(Flajolet et al. 2007) — the approximate-count class a 100-TB corpus
audit needs when the exact ``groupby token`` shuffle is not worth it
(vocabulary estimates, per-shard distinct URL counts, join-size hints).

Scale design: each batch collapses to its 2^p-register partial (one
``np.maximum.reduceat`` over sorted register hits — no Python per
token), partials merge associatively via ``groupby(register).max``, and
ONLY the merged register table (2^p rows, 4096 at p=12) reaches the
driver for the harmonic-mean estimate. Driver state is O(2^p) at any
corpus size; standard error is 1.04/sqrt(2^p) ≈ 1.6% at p=12, with the
linear-counting small-range correction below 2.5·m.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _register_partial(
    hashes: np.ndarray, p: int
) -> tuple[np.ndarray, np.ndarray]:
    """(register index, max rho) pairs for one batch, vectorized."""
    m_bits = np.uint64(64 - p)
    reg = (hashes >> m_bits).astype(np.int64)
    rest = hashes << np.uint64(p)  # low bits shifted up; zeros fill
    # rho = leading zeros of `rest` + 1, capped at 64-p+1 when rest == 0
    lz = np.full(len(rest), 64 - p, dtype=np.int64)
    nz = rest != 0
    if nz.any():
        # exact vectorized count-leading-zeros: binary-search by shifts
        cur = rest[nz].copy()
        exact = np.zeros(cur.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            exact[mask] += shift
            cur[mask] = cur[mask] << np.uint64(shift)
        lz[nz] = exact
    rho = np.minimum(lz + 1, 64 - p + 1).astype(np.int64)
    order = np.argsort(reg, kind="stable")
    r_s, rho_s = reg[order], rho[order]
    starts = np.concatenate(
        [[0], np.nonzero(r_s[1:] != r_s[:-1])[0] + 1]
    ).astype(np.int64)
    if len(r_s) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return r_s[starts], np.maximum.reduceat(rho_s, starts)


def hll_estimate(registers: np.ndarray, p: int) -> float:
    """Standard HLL estimate over a dense 2^p register array."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct_tokens(
    docs: "ray.data.Dataset",
    *,
    p: int = 12,
    text_col: str = "text",
) -> int:
    """Approximate COUNT(DISTINCT token) over the corpus."""
    from ..functions.textkit import _hash_strings

    def _partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(batch[text_col], pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.values
        enc = flat.dictionary_encode()
        # one hash per DISTINCT token in the batch (vocab, not stream)
        h = _hash_strings(enc.dictionary.to_pylist())
        reg, rho = _register_partial(h.astype(np.uint64), p)
        return pa.table(
            {
                "reg": pa.array(reg, type=pa.int64()),
                "rho": pa.array(rho, type=pa.int64()),
            }
        )

    merged = (
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=4096)
        .groupby("reg")
        .max("rho")
        .to_pandas()
    )
    registers = np.zeros(1 << p, dtype=np.int64)
    registers[merged["reg"].to_numpy(dtype=np.int64)] = merged[
        "max(rho)"
    ].to_numpy(dtype=np.int64)
    return int(round(hll_estimate(registers, p)))


def hll_distinct_tokens_by(
    docs: "ray.data.Dataset",
    *,
    group_col: str,
    p: int = 12,
    text_col: str = "text",
) -> "pa.Table":
    """Approximate COUNT(DISTINCT token) PER GROUP (per-language vocabulary
    audit). Same mergeable-register design as the global sketch, keyed:
    each batch emits (group, reg, rho) partials over its per-group batch
    VOCABULARY, ``groupby(group, reg).max`` merges associatively, and the
    driver sees O(groups x 2^p) register rows — never tokens. The
    per-batch loop is over GROUPS present in the batch (a handful of
    languages), not rows."""
    from ..functions.textkit import _hash_strings

    def _partial(batch: pa.Table) -> pa.Table:
        # fully vectorized (mirrors the global sketch): ONE Arrow split,
        # ONE dictionary encode per side, ONE hash of the batch's token
        # VOCABULARY, distinct (group, token) pairs via np.unique over
        # packed int codes — the only Python loop is over the handful of
        # groups present, never rows or tokens
        # null tolerance (the replaced per-row path skipped None text via
        # `if t:`): null texts become "" (zero tokens after the ''
        # filter); rows with a null GROUP are dropped — they belong to no
        # per-group vocabulary
        batch = batch.filter(pc.is_valid(batch[group_col]))
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "reg": pa.array([], type=pa.int64()),
                    "rho": pa.array([], type=pa.int64()),
                }
            )
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        genc = gcol.dictionary_encode()
        gcodes = np.asarray(
            genc.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        words = pc.split_pattern(
            pc.fill_null(pc.cast(batch[text_col], pa.string()), ""), " "
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = np.asarray(
            pc.list_value_length(words).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        tenc = words.values.dictionary_encode()
        tcodes = np.asarray(
            tenc.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        tdict = tenc.dictionary.to_pylist()
        if not tdict:  # empty batch / no tokens: nothing to sketch
            return pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "reg": pa.array([], type=pa.int64()),
                    "rho": pa.array([], type=pa.int64()),
                }
            )
        h_dict = _hash_strings(tdict)
        row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        g_of_tok = gcodes[row_of]
        if "" in tdict:  # empty tokens are not vocabulary
            keep = tcodes != tdict.index("")
            g_of_tok, tcodes_k = g_of_tok[keep], tcodes[keep]
        else:
            tcodes_k = tcodes
        pair = np.unique(g_of_tok * len(tdict) + tcodes_k)
        g_u, t_u = pair // len(tdict), pair % len(tdict)
        out_g: list = []
        out_reg: list[np.ndarray] = []
        out_rho: list[np.ndarray] = []
        gdict = genc.dictionary.to_pylist()
        for gi in np.unique(g_u):
            h = h_dict[t_u[g_u == gi]]
            reg, rho = _register_partial(h.astype(np.uint64), p)
            out_g.append(np.full(len(reg), gdict[gi], dtype=object))
            out_reg.append(reg)
            out_rho.append(rho)
        if not out_g:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "reg": pa.array([], type=pa.int64()),
                    "rho": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                group_col: pa.array(
                    np.concatenate(out_g), type=pa.string()
                ),
                "reg": pa.array(np.concatenate(out_reg), type=pa.int64()),
                "rho": pa.array(np.concatenate(out_rho), type=pa.int64()),
            }
        )

    merged = (
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=4096)
        .groupby([group_col, "reg"])
        .max("rho")
        .to_pandas()  # O(groups x 2^p) rows
    )
    rows_g, rows_n = [], []
    for g, sub in merged.groupby(group_col):
        registers = np.zeros(1 << p, dtype=np.int64)
        registers[sub["reg"].to_numpy(dtype=np.int64)] = sub[
            "max(rho)"
        ].to_numpy(dtype=np.int64)
        rows_g.append(g)
        rows_n.append(int(round(hll_estimate(registers, p))))
    return pa.table(
        {
            group_col: pa.array(rows_g, type=pa.string()),
            "est_distinct_tokens": pa.array(rows_n, type=pa.int64()),
        }
    )


# --- count-min sketch -------------------------------------------------------
#
# The point-frequency complement of the HLL cardinality sketch (Cormode &
# Muthukrishnan 2005): fixed O(depth x width) memory answers "how often
# did key k appear" with one-sided error — estimates NEVER undercount,
# and overshoot exceeds 2N/width with probability <= 2^-depth. The
# 100-TB use: frequency hints over unbounded key spaces (URLs, tokens)
# where even the exact heavy-hitter pigeonhole's candidate set is
# unwelcome driver state.

_CMS_SEEDS = (
    np.uint64(0xA076_1D64_78BD_642F),
    np.uint64(0xE703_7ED1_A0B4_28DB),
    np.uint64(0x8EBC_6AF0_9C88_C6E3),
    np.uint64(0x5899_65CC_7537_4CC3),
    np.uint64(0x1D8E_4E27_C47D_124F),
    np.uint64(0xEB44_ACCA_B455_D165),
)


def _cms_rows(u: np.ndarray, width_log2: int, depth: int):
    """Per-depth bucket positions for a uint64 key stream."""
    from .joins import _splitmix

    mask = np.uint64((1 << width_log2) - 1)
    for d in range(depth):
        yield _splitmix(u, _CMS_SEEDS[d]) & mask


def cms_build(
    ds: "ray.data.Dataset",
    col: str,
    *,
    width_log2: int = 16,
    depth: int = 4,
) -> np.ndarray:
    """(depth x 2^width_log2) int64 count matrix for the values of
    ``col`` (string or int). Each batch collapses to its value counts
    first (np.unique — hot keys cost one add), scatters them into a
    LOCAL matrix (np.add.at per depth row) and emits the matrix as
    ``depth`` binary rows; the driver sums O(blocks) matrices (addition
    commutes, so block splits are invisible — pinned by test). Driver
    and per-batch state are matrix-sized, never O(keys)."""
    if depth > len(_CMS_SEEDS):
        raise ValueError(f"depth > {len(_CMS_SEEDS)} not supported")
    width = 1 << width_log2

    def _partial(t: pa.Table) -> pa.Table:
        m = np.zeros((depth, width), dtype=np.int64)
        if t.num_rows:
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                from ..functions.textkit import _hash_strings

                vals, cnts = np.unique(
                    np.asarray(arr.to_pylist(), dtype=object), return_counts=True
                )
                u = _hash_strings(list(vals))
            else:
                vals, cnts = np.unique(
                    np.asarray(arr.to_numpy(zero_copy_only=False)).astype(
                        np.int64
                    ),
                    return_counts=True,
                )
                u = vals.astype(np.uint64)
            for d, pos in enumerate(_cms_rows(u, width_log2, depth)):
                np.add.at(m[d], pos.astype(np.int64), cnts.astype(np.int64))
        return pa.table(
            {
                "depth": pa.array(np.arange(depth, dtype=np.int64)),
                "row": pa.array([m[d].tobytes() for d in range(depth)],
                                 pa.large_binary()),
            }
        )

    out = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for d, blob in zip(b["depth"].to_pylist(), b["row"]):
            out[d] += np.frombuffer(blob.as_py(), dtype=np.int64)
    return out


def cms_estimate(
    sketch: np.ndarray, values, *, width_log2: int = 16
) -> np.ndarray:
    """Point-frequency estimates (min over depth rows) for a list of
    string or int keys. One-sided: estimate >= true count, always."""
    depth = sketch.shape[0]
    if len(values) == 0:
        return np.empty(0, dtype=np.int64)
    if isinstance(values[0], str):
        from ..functions.textkit import _hash_strings

        u = _hash_strings(list(values))
    else:
        u = np.asarray(values, dtype=np.int64).astype(np.uint64)
    est = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
    for d, pos in enumerate(_cms_rows(u, width_log2, depth)):
        est = np.minimum(est, sketch[d][pos.astype(np.int64)])
    return est


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (stratified weighted summary)
# ---------------------------------------------------------------------------

def _qs_compact(values: np.ndarray, weights: np.ndarray, k: int):
    """Compact a VALUE-SORTED weighted summary to <= k items, preserving
    total weight EXACTLY: the weight axis [0, W) is cut into k integer
    strata (boundaries floor(W*i/k) — telescoping, so stratum weights
    sum back to W) and each stratum is represented by the input item
    covering its midpoint. Per-compaction rank error <= W/k, and the
    representative choice is a pure function of the (value, weight)
    multiset — order-insensitive, deterministic, no RNG."""
    if len(values) <= k:
        return values, weights
    W = int(weights.sum())
    bounds = (W * np.arange(k + 1, dtype=np.int64)) // k
    mids = (bounds[:-1] + bounds[1:]) // 2
    cw = np.cumsum(weights)
    idx = np.searchsorted(cw, mids, side="right")
    out_w = np.diff(bounds)
    keep = out_w > 0
    return values[idx[keep]], out_w[keep]


def quantile_sketch(
    ds: "ray.data.Dataset",
    value_col: str,
    *,
    k: int = 512,
    combine_partitions: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Mergeable APPROXIMATE-QUANTILE summary of an int64/float64 column
    — the streaming alternative to textstats' exact histogram quantiles
    when the value domain is wide (floats, monotonically-growing ids)
    and O(distinct values) driver state is not acceptable.

    Returns ``(values, weights)`` sorted by value with
    ``weights.sum() == n`` exactly. Three-level merge tree, every level
    order-insensitive: (1) each batch sorts and compacts itself to k
    weighted items; (2) ONE hash-free repartition groups partials into
    ``combine_partitions`` blocks, each re-sorted and re-compacted;
    (3) the driver merges <= combine_partitions * k items once. Driver
    and worker state are O(k) regardless of corpus size. Rank error is
    bounded by W/k per compaction (3 levels => <= 3n/k, measured far
    tighter in test_sketch); nulls are refused loudly (a null would
    silently shrink every stratum)."""
    import pyarrow as pa

    def _partial(t: pa.Table) -> pa.Table:
        col = t[value_col]
        if isinstance(col, (pa.ChunkedArray, pa.Array)) and col.null_count:
            raise ValueError(
                f"quantile_sketch input {value_col!r} has nulls; "
                "fill or drop them upstream"
            )
        v = np.sort(np.asarray(col.to_numpy(zero_copy_only=False)))
        w = np.ones(len(v), dtype=np.int64)
        v, w = _qs_compact(v, w, k)
        return pa.table({"v": pa.array(v), "w": pa.array(w)})

    def _combine(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False))
        w = np.asarray(t["w"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((w, v))
        v, w = _qs_compact(v[order], w[order], k)
        return pa.table({"v": pa.array(v), "w": pa.array(w)})

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .repartition(combine_partitions)
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    v = merged["v"].to_numpy()
    w = merged["w"].to_numpy(dtype="int64")
    order = np.lexsort((w, v))
    return _qs_compact(v[order], w[order], k)


def quantile_sketch_query(
    values: np.ndarray, weights: np.ndarray, qs
) -> np.ndarray:
    """Lower weighted quantiles from a (value-sorted) summary: the value
    whose cumulative weight first reaches ceil(q * W)."""
    cw = np.cumsum(weights)
    W = int(cw[-1]) if len(cw) else 0
    if W == 0:
        return np.full(len(list(qs)), np.nan)
    targets = np.maximum(
        1, np.ceil(np.asarray(list(qs), dtype=np.float64) * W).astype(np.int64)
    )
    idx = np.searchsorted(cw, targets, side="left")
    return values[np.minimum(idx, len(values) - 1)]


def quantile_sketch_merge(
    a: tuple[np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray],
    *,
    k: int = 512,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two quantile summaries (the incremental-dump path: yesterday's
    persisted sketch + today's new data, without re-reading the corpus).
    Total weight stays exact; one further compaction adds <= W/k rank
    error on top of each input's own bound."""
    v = np.concatenate([a[0], b[0]])
    w = np.concatenate([a[1], b[1]]).astype(np.int64)
    order = np.lexsort((w, v))
    return _qs_compact(v[order], w[order], k)


def grouped_quantile_sketch(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    *,
    k: int = 256,
) -> dict:
    """Per-GROUP mergeable quantile summaries: ``{group: (values,
    weights)}`` with each group's ``weights.sum()`` exact — the grouped
    companion of :func:`quantile_sketch` for per-language / per-host
    distribution audits over wide value domains.

    Scale plan: each batch compacts every group it contains to ≤ k
    weighted items (one lexsort + segment reduceat pass — no per-group
    Python beyond the O(groups-in-batch) emit loop), ONE group-hash
    bucket shuffle co-locates partials, each bucket re-compacts its
    groups, and the driver merges ≤ groups × k rows. Driver state is
    O(groups × k) — the contract caps this at audit-style group counts
    (languages, hosts, shards), not per-user cardinalities."""
    import pyarrow as pa

    from .relops import _WB, _route_by_group

    def _partial(t: pa.Table) -> pa.Table:
        if _WB in t.column_names:
            t = t.drop_columns([_WB])
        if t.num_rows == 0:
            # upstream filters can yield 0-row blocks; np.concatenate of
            # zero partials would throw — emit the typed empty partial
            # (mirrors quantile_sketch._partial's empty tolerance)
            return pa.table(
                {
                    group_col: pa.array([], t.schema.field(group_col).type),
                    value_col: pa.array([], t.schema.field(value_col).type),
                    "w": pa.array([], pa.int64()),
                }
            )
        col = t[value_col]
        if isinstance(col, (pa.ChunkedArray, pa.Array)) and col.null_count:
            raise ValueError(
                f"grouped_quantile_sketch input {value_col!r} has nulls"
            )
        g = np.asarray(t[group_col].to_numpy(zero_copy_only=False))
        v = np.asarray(col.to_numpy(zero_copy_only=False))
        w = (
            np.asarray(t["w"].to_numpy(zero_copy_only=False), dtype=np.int64)
            if "w" in t.column_names
            else np.ones(len(v), dtype=np.int64)
        )
        order = np.lexsort((w, v, g))
        g, v, w = g[order], v[order], w[order]
        new = np.concatenate([[True], g[1:] != g[:-1]])
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [len(g)]])
        go, vo, wo = [], [], []
        for s, e in zip(starts, ends):
            cv, cw = _qs_compact(v[s:e], w[s:e], k)
            go.append(np.full(len(cv), g[s], dtype=object))
            vo.append(cv)
            wo.append(cw)
        return pa.table(
            {
                group_col: pa.array(np.concatenate(go)),
                value_col: pa.array(np.concatenate(vo)),
                "w": pa.array(np.concatenate(wo).astype(np.int64)),
            }
        )

    merged = (
        _route_by_group(
            ds.map_batches(_partial, batch_format="pyarrow"), group_col, 16
        )
        .groupby(_WB)
        .map_groups(_partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = {}
    for grp, sub in merged.groupby(group_col):
        v = sub[value_col].to_numpy()
        w = sub["w"].to_numpy(dtype="int64")
        order = np.lexsort((w, v))
        out[grp] = _qs_compact(v[order], w[order], k)
    return out
