"""Operator-coverage queries over the driver's testdata tables.

One callable per implemented operator family from SURVEY.md §2, each taking
``sf_dir`` and returning a Dataset / pandas DataFrame / pyarrow Table. The
matching ANSI-SQL oracles live in ``__ray_entry__.oracle_sql()``; column
names are identical on both sides (the driver hash-compares values under
sorted column names).

Float policy: per-row arithmetic is bit-identical between numpy/Arrow and
DuckDB (same IEEE doubles, same ops) and is NOT rounded. Multi-row FLOAT
sums are order-sensitive in the last ulps and can flip any post-hoc
rounding at a boundary, so money/value aggregates are computed in EXACT
integer units instead: per-row scale-and-round to cents (x100) or micros
(x1e6) — unambiguous for non-tie doubles — then integer sums, identical on
both sides. Ratios derived from those integers use the same double ops on
both sides and stay bit-identical.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..stages import dedup as dedup_stage
from ..stages import linededup
from ..stages import textstats
from ..stages import simsearch
from ..stages.extract import explode_images, extract_docs
from ..stages.textstats import add_lang_pred, add_quality, add_token_counts
from ..synth import synth_pages


def _read(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, **kw
    )


# --- relational operators (filters / projections / aggregates / joins) ----


def _to_scaled_int(arr, scale: int) -> pa.Array:
    """Per-row exact integer units: round(x*scale) as int64. Unambiguous
    for non-tie doubles, so Ray and DuckDB agree bit-for-bit."""
    return pc.cast(pc.round(pc.multiply(arr, float(scale))), pa.int64())


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate (A1/A2 analog; TPC-H Q1 shape): per-batch
    conversion to integer cents, then Ray's hash aggregate; input pruned to
    6 columns at the read. Averages derived from the exact integer sums."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    cutoff = _dt.datetime(1998, 9, 2)

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _to_scaled_int(t["l_quantity"], 100),
                "price_c": _to_scaled_int(t["l_extendedprice"], 100),
                "disc_price_dmc": _to_scaled_int(disc_price, 10_000),
                "disc_c": _to_scaled_int(t["l_discount"], 100),
            }
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("price_c", alias_name="sum_base_price_c"),
            Sum("disc_price_dmc", alias_name="sum_disc_price_dmc"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty_c", "sum_base_price_c", "sum_disc_price_dmc", "sum_disc_c"):
        out[c] = out[c].astype("int64")
    out["avg_qty"] = out["sum_qty_c"] / 100.0 / out["count_order"]
    out["avg_disc"] = out["sum_disc_c"] / 100.0 / out["count_order"]
    out = out.drop(columns=["sum_disc_c"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def tax_charge_summary(sf_dir: str) -> pd.DataFrame:
    """Tax-inclusive charge rollup — the full TPC-H Q1 charge expression
    ``extendedprice * (1 - discount) * (1 + tax)`` per (returnflag,
    linestatus), in exact 1e-6-scaled integer units (2+2+2 decimal
    factors make the true product a multiple of 1e-6, so the per-row
    scaled value sits epsilon-from-integer and Arrow/DuckDB round modes
    cannot diverge). The only consumer of ``l_tax`` in the corpus.
    Shuffle-free per-batch partials into a 6-group aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount", "l_tax"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        charge = pc.multiply(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pc.add(pa.scalar(1.0), t["l_tax"]),
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "charge_e6": _to_scaled_int(charge, 1_000_000),
            }
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("charge_e6", alias_name="sum_charge_e6"),
            Count(alias_name="n_items"),
        )
        .to_pandas()
    )
    out["sum_charge_e6"] = out["sum_charge_e6"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def similar_supplier_names(sf_dir: str) -> pd.DataFrame:
    """EXACT string-similarity self-join (fuzzy join family): every
    supplier pair whose raw char-3-gram Jaccard >= 0.8, with exact
    intersection/union sizes — the AllPairs/PPJoin prefix-filter kernel
    (:func:`..stages.simjoin.ngram_similarity_selfjoin`), not an LSH
    approximation, so a full O(n^2) SQL cross join reproduces it
    verbatim. The engine's zero-pad id naming makes near-identical
    names structurally common, which is exactly the entity-resolution
    shape this operator exists for."""
    from ..stages.simjoin import ngram_similarity_selfjoin

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": pc.cast(t["s_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    out = ngram_similarity_selfjoin(
        ds, id_col="s_suppkey", text_col="s_name", n=3, threshold=0.8
    ).to_pandas()
    out = out.rename(columns={"a": "key_a", "b": "key_b"})
    for c in ("key_a", "key_b", "n_inter", "n_union"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def supplier_name_typos(sf_dir: str) -> pd.DataFrame:
    """EXACT edit-distance self-join (the typo/fat-finger linkage shape):
    every supplier pair whose names are within Levenshtein distance 1,
    with the exact distance — symmetric-delete candidate generation +
    banded-DP verify (:func:`..stages.simjoin.edit_distance_selfjoin`),
    zero driver state, no recall loss, so the O(n^2) SQL ``levenshtein``
    cross join reproduces it verbatim. On zero-padded id-style names
    distance 1 means "one digit differs" — the classic record-linkage
    candidate set."""
    from ..stages.simjoin import edit_distance_selfjoin

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": pc.cast(t["s_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    out = edit_distance_selfjoin(
        ds, id_col="s_suppkey", text_col="s_name", k=1
    ).to_pandas()
    out = out.rename(columns={"a": "key_a", "b": "key_b"})
    for c in ("key_a", "key_b", "edit_dist"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def supplier_name_components(sf_dir: str) -> pd.DataFrame:
    """END-TO-END ENTITY RESOLUTION: group suppliers whose names are
    near-identical (char-3-gram Jaccard >= 0.8) into canonical
    components — the exact prefix-filtered similarity join
    (:func:`..stages.simjoin.ngram_similarity_selfjoin`) feeding the
    components machinery (:func:`_attach_components`: driver union-find
    under the edge-count route, min-label pointer jumping above).
    component = MIN suppkey reachable; suppliers with no similar name
    keep their own id. Oracle: the O(n^2) gram join + recursive
    transitive closure. Note the classic ER hazard this surfaces
    honestly: zero-padded consecutive names chain (i ~ i+1 at t=0.8),
    so the closure can merge far-apart ids through intermediate links —
    at sf0.1 the whole supplier table collapses to one component, and
    the oracle agrees; real deployments pick t per the linkage policy."""
    from ..stages.simjoin import ngram_similarity_selfjoin

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": pc.cast(t["s_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    pairs = (
        ngram_similarity_selfjoin(
            supp, id_col="s_suppkey", text_col="s_name", n=3, threshold=0.8
        )
        .select_columns(["a", "b"])
        .materialize()
    )
    nodes = supp.map_batches(
        lambda t: pa.table({"node": t["s_suppkey"]}), batch_format="pyarrow"
    )
    out = _attach_components(nodes, pairs)
    return out.rename(columns={"node": "s_suppkey"})


def filtered_lineitems(sf_dir: str) -> "ray.data.Dataset":
    """Row-level filter + computed projection (F-family/M-family analog):
    per-row arithmetic, no rounding needed."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def _f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.greater_equal(t["l_discount"], 0.05),
                pc.greater(t["l_quantity"], 24.0),
            ),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "l_quantity": t["l_quantity"],
                "revenue": rev,
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def top_event_types(sf_dir: str) -> pd.DataFrame:
    """Sort + top-k (O1 analog: the reference's top-10 file sizes)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "value_u": _to_scaled_int(t["value"], 1_000_000)}
        ),
        batch_format="pyarrow",
    )
    out = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value_u", alias_name="total_value_micros"))
        .to_pandas()
    )
    out["total_value_micros"] = out["total_value_micros"].astype("int64")
    return (
        out.sort_values(["n", "event_type"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )


_NATION_REVENUE_ROUTE_ROWS = 2_000_000
# small-side row bound under which an equi-join attach broadcasts the
# dimension (ray.put once + per-batch searchsorted; corpus never moves)
# instead of hash-partitioning both sides
_BROADCAST_SIDE_ROUTE_ROWS = 2_000_000
# edge-count bound under which connected components union-find on the
# driver (distributed label-prop rounds are pure fixed-latency overhead
# on small graphs)
_COMPONENTS_DRIVER_ROUTE_EDGES = 1_000_000
# fact-table row count ABOVE which selective big-big joins engage the
# bloom prefilter (stages/joins.build_bloom): the build barrier +
# broadcast cost ~2x a small join (measured +6 s at sf0.1) but the
# pruned shuffle payload wins once the big side is shuffle-bound
_BLOOM_PREFILTER_ROUTE_ROWS = 10_000_000

# PCA route: below this embedding dimension the one-pass dim^2
# Gram-partial plan (exact driver eigh) beats power iteration outright;
# above it dim^2 driver state stops being metadata-sized
_PCA_COVARIANCE_ROUTE_DIM = 1024


def _fact_rows(sf_dir: str, table: str) -> int:
    """Parquet-metadata row count. Single files read one footer;
    multi-file/directory datasets SUM the per-fragment footer counts
    (VERDICT r4 #5 — the old conservative "assume large" answer forced
    every size-routed query onto the distributed plan for partitioned
    inputs; footers are O(files) metadata reads, no row scan). Only a
    genuinely unreadable input keeps the conservative large answer."""
    path = f"{sf_dir}/{table}.parquet"
    try:
        return pq.read_metadata(path).num_rows
    except Exception:
        pass
    try:
        import pyarrow.dataset as pads

        frag_files = pads.dataset(path, format="parquet").files
        if not frag_files:
            raise ValueError("no parquet fragments")
        return sum(pq.read_metadata(f).num_rows for f in frag_files)
    except Exception:
        return _BLOOM_PREFILTER_ROUTE_ROWS + 1


def nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Hash join chain (J2/J3 analog), size-routed like
    embedding_dedup: below _NATION_REVENUE_ROUTE_ROWS customers (parquet
    metadata row count — no scan) the per-cust aggregate is merged on the
    driver (~tens of MB, and two fewer all-to-all latencies); above it the
    plan is the fully distributed :func:`nation_revenue_distributed`.
    Both plans are oracle-checked — the distributed one via its own
    queries() entry."""
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust > _NATION_REVENUE_ROUTE_ROWS:
        return nation_revenue_distributed(sf_dir)
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _to_scaled_int(t["o_totalprice"], 100)}
        ),
        batch_format="pyarrow",
    )
    per_cust = (
        orders.groupby("o_custkey")
        .aggregate(Sum("price_c", alias_name="cust_total_c"),
                   Count(alias_name="cust_orders"))
        .to_pandas()
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    m = per_cust.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = (
        m.groupby("n_name", as_index=False)
        .agg(revenue_c=("cust_total_c", "sum"), n_orders=("cust_orders", "sum"))
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_c"] = out["revenue_c"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def nation_revenue_distributed(sf_dir: str) -> pd.DataFrame:
    """The 100-TB-safe nation_revenue plan, pinned by its own oracle:
    orders pre-aggregate per custkey (combiner BEFORE the join), the
    per-cust⋈customer step is a partitioned hash_join (both sides
    O(customers) — never driver-materialized), the 25-row nation lookup
    is a zero-shuffle broadcast_join, and the driver sees only the
    25-row result."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import broadcast_join, hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _to_scaled_int(t["o_totalprice"], 100)}
        ),
        batch_format="pyarrow",
    )
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("price_c", alias_name="cust_total_c"),
        Count(alias_name="cust_orders"),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_join(
        per_cust, cust, key="o_custkey", right_key="c_custkey",
        num_partitions=32,
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    named = broadcast_join(
        joined.map_batches(
            lambda t: t.append_column(
                "n_nationkey", pc.cast(t["c_nationkey"], pa.int64())
            ),
            batch_format="pyarrow",
        ),
        nation.set_column(
            0, "n_nationkey", pc.cast(nation["n_nationkey"], pa.int64())
        ),
        key="n_nationkey",
    )
    out = (
        named.groupby("n_name")
        .aggregate(
            Sum("cust_total_c", alias_name="revenue_c"),
            Sum("cust_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_c"] = out["revenue_c"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join (J1/J4/D5 analog), distributed: partitioned left_anti
    hash_join — both sides co-partition on custkey and the per-partition
    decision is one vectorized is_in, so the distinct-orderer key set
    never materializes on the driver (at TPC-H scale it is O(customers)).
    The crawl engine's streamed frontier uses the same shape task-side;
    broadcast-key filtering remains the right plan only when the key set
    is provably small (see stages/spandedup.decontaminate)."""
    from ..stages.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    okeys = _read(sf_dir, "orders", ["o_custkey"])
    out = hash_join(
        cust, okeys, key="c_custkey", right_key="o_custkey",
        how="left_anti", num_partitions=32,
    ).to_pandas()
    if "c_custkey" not in out.columns:  # fully-matched: empty result block
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def distinct_mktsegments(sf_dir: str) -> pd.DataFrame:
    """Distinct (D-family): groupby-based unique."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    out = ds.groupby("c_mktsegment").count().to_pandas()[["c_mktsegment"]]
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def part_size_histogram(sf_dir: str) -> pd.DataFrame:
    """Value histogram (A4: the file-size histogram analog)."""
    ds = _read(sf_dir, "part", ["p_size"])
    out = ds.groupby("p_size").count().to_pandas().rename(columns={"count()": "n"})
    return out.sort_values("p_size").reset_index(drop=True)


def weighted_avg_discount(sf_dir: str) -> pd.DataFrame:
    """Weighted mean (A3: the reference's sum-of-sums / count semantics)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_discount"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "disc_amount_dmc": _to_scaled_int(
                    pc.multiply(t["l_extendedprice"], t["l_discount"]), 10_000
                ),
                "price_c": _to_scaled_int(t["l_extendedprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    agg = ds.aggregate(
        Sum("disc_amount_dmc", alias_name="sum_disc_amount_dmc"),
        Sum("price_c", alias_name="sum_price_c"),
    )
    # identical double ops on both sides from the exact integer sums
    w = (agg["sum_disc_amount_dmc"] / 10_000.0) / (agg["sum_price_c"] / 100.0)
    return pd.DataFrame({"weighted_avg_discount": [round(w, 6)]})


def events_hourly_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (§2.9 streaming analog): epoch-hour
    buckets per event_type."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def _bucket(t: pa.Table) -> pa.Table:
        epoch_us = pc.cast(t["ts"], pa.int64())
        hour = pc.divide(epoch_us, 3_600_000_000)
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.cast(hour, pa.int64()),
                "value_u": _to_scaled_int(t["value"], 1_000_000),
            }
        )

    out = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value_u", alias_name="total_value_micros"))
        .to_pandas()
    )
    out["total_value_micros"] = out["total_value_micros"].astype("int64")
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


# --- text / dedup / similarity operators ----------------------------------


def doc_token_counts(sf_dir: str) -> pd.DataFrame:
    """Token counting (whitespace tokenizer, SQL parity)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_token_counts(ds).select_columns(["doc_id", "n_tokens"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def char_class_profile_per_lang(sf_dir: str) -> pd.DataFrame:
    """Character-class PROFILE per language: exact corpus-wide counts of
    ASCII letters, digits, spaces, and everything else — the encoding /
    mojibake drift audit (a lang whose "other" share jumps between dumps
    grew a codec problem). Ratios of EXACT INT SUMS, not averages of
    per-doc ratios (the stopword-density lesson).

    Scale plan: shuffle-free — each batch reduces to O(langs) partial
    rows via three RE2 strip-and-measure kernels (utf8_length before /
    after `replace_substring_regex`), one tiny groupby finishes."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _partials(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        total = pc.utf8_length(s)

        def _count(pattern: str):
            stripped = pc.replace_substring_regex(s, pattern, "")
            return pc.subtract(total, pc.utf8_length(stripped))

        g = pa.table(
            {
                "lang": t["lang"],
                "n_chars": pc.cast(total, pa.int64()),
                "n_letters": pc.cast(_count("[A-Za-z]"), pa.int64()),
                "n_digits": pc.cast(_count("[0-9]"), pa.int64()),
                "n_spaces": pc.cast(_count(" "), pa.int64()),
            }
        ).group_by("lang").aggregate(
            [(c, "sum") for c in ("n_chars", "n_letters", "n_digits", "n_spaces")]
        )
        return g.rename_columns(
            ["lang", "n_chars", "n_letters", "n_digits", "n_spaces"]
        )

    agg = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(*[
            Sum(c, alias_name=c)
            for c in ("n_chars", "n_letters", "n_digits", "n_spaces")
        ])
        .to_pandas()
    )
    for c in ("n_chars", "n_letters", "n_digits", "n_spaces"):
        agg[c] = agg[c].astype("int64")
    agg["n_other"] = (
        agg["n_chars"] - agg["n_letters"] - agg["n_digits"] - agg["n_spaces"]
    ).astype("int64")
    agg["other_share"] = agg["n_other"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["n_chars"].to_numpy(dtype="int64").astype(np.float64)
    out = agg[
        ["lang", "n_chars", "n_letters", "n_digits", "n_spaces",
         "n_other", "other_share"]
    ]
    return out.sort_values("lang").reset_index(drop=True)


def doc_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-document zlib COMPRESSION RATIO — the redundancy quality
    signal real curation stacks gate on (template/boilerplate text
    compresses far below natural prose; the practical complement to
    doc_repetition's n-gram view). Not SQL-expressible (no DEFLATE in
    DuckDB), so rows-only for the driver; semantics pinned by
    test_textops' row-wise parity check.

    Scale plan: embarrassingly parallel map_batches; zlib.compress is
    per-row by nature (the codec boundary, like multimodal decode) but
    C-speed and allocation-free per call; output is O(docs) small
    columns. Level 6 fixed — zlib output is deterministic for a given
    (input, level, strategy) across CPython builds (it vendors zlib)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def _ratio(t: pa.Table) -> pa.Table:
        import zlib

        texts = t["text"].to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            b = (txt or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, 6))
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "raw_bytes": pa.array(raw),
                "compressed_bytes": pa.array(comp),
                "ratio": pa.array(
                    comp.astype(np.float64)
                    / np.maximum(raw, 1).astype(np.float64)
                ),
            }
        )

    out = ds.map_batches(_ratio, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality features (SQL-expressible subset; per-row arithmetic →
    bit-identical, no rounding)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_quality(ds).select_columns(
        ["doc_id", "n_words", "n_chars_nospace", "mean_word_len"]
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_by_lang(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact dedup keep-first by normalized-text md5 (D1/D2 over text)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = dedup_stage.exact_dedup(ds)
    out = kept.select_columns(["doc_id"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def minhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup dedup. SQL-oracled: the oracle computes the
    EXACT all-pairs word-shingle Jaccard >= 0.8 closure (explode + self
    join + recursive CTE), so equality also proves perfect LSH recall on
    this corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = dedup_stage.minhash_lsh_dedup(ds, threshold=0.8)
    return (
        kept.select_columns(["doc_id"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def simhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """SimHash Hamming<=3 near-dup dedup, run in the md5 token-hash space
    so the SQL oracle can recompute the EXACT signatures (DuckDB
    md5_number_upper == md5 digest[:8] little-endian), all-pairs Hamming,
    closure, keep-min. Equality proves the band shuffle's pigeonhole
    recall (<=3 bit flips must leave one of four 16-bit bands intact) and
    the whole verify/components machinery; the "fast" siphash space is
    the same machinery with a cheaper per-token hash."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = dedup_stage.simhash_dedup(ds, max_hamming=3, hash_space="md5")
    return (
        kept.select_columns(["doc_id"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def line_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """C4-style corpus-wide LINE dedup (8-word chunks as the line unit on
    this newline-free corpus): each chunk survives only at its first
    occurrence by (doc_id, position); docs are reassembled from surviving
    chunks, docs losing every chunk drop out. SQL-oracled exactly
    (string_split explode + keep-first window + string_agg reassembly)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = linededup.line_dedup(ds, width=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def within_doc_line_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Dolma-style WITHIN-document repeated-span removal: each doc keeps
    the first occurrence of every distinct 8-word chunk within itself
    (cross-doc repeats untouched). Shuffle-free single map_batches pass;
    SQL-oracled exactly (per-doc keep-first window + string_agg)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = linededup.within_doc_line_dedup(ds, width=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style within-doc repetition signals (all-int64, shuffle-free
    single pass): words, distinct words, top-word multiplicity, 8-word
    chunk count, within-doc duplicate chunks."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = linededup.add_repetition_stats(ds, width=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def pii_redact_docs(sf_dir: str) -> pd.DataFrame:
    """PII scrub over documents. The synthetic corpus carries no natural
    PII, so each doc first gets a deterministic doc_id-derived suffix
    (email + IPv4 + phone) — injected IDENTICALLY by the SQL oracle via
    string concat — then the RE2 redaction runs on both sides and the
    full redacted text plus per-kind match counts hash-compare exactly."""
    from ..stages.redact import redact_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _inject(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        dnp = did.to_numpy(zero_copy_only=False)
        dstr = pc.cast(did, pa.string())
        ip3 = pc.cast(pa.array(dnp % 256), pa.string())
        ip4 = pc.cast(pa.array(dnp % 100), pa.string())
        tel = pc.utf8_lpad(pc.cast(pa.array(dnp % 10000), pa.string()), 4, "0")
        text = pc.binary_join_element_wise(
            pc.cast(batch["text"], pa.string()),
            " user", dstr, "@mail.example.org ip 10.0.", ip3, ".", ip4,
            " tel 555-010-", tel,
            "",
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )

    out = redact_pii(
        ds.map_batches(_inject, batch_format="pyarrow"), counts=True
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def gopher_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition gate over documents (all-int thresholds:
    20 <= words, top-word multiplicity <= words/8, dup chunks <=
    chunks/10). Returns survivors with their signal columns."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = linededup.gopher_filter(ds, width=8, min_words=20).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def c4_line_filter_docs(sf_dir: str) -> pd.DataFrame:
    """C4-style line-quality gate (8-word chunks as the line unit):
    partial trailing chunks drop (the >=3-words rule analog), chunks
    containing the boilerplate tokens 'spark' or 'vector' drop (the
    javascript/cookie blacklist, instantiated with in-vocab tokens so
    the gate actually fires on this corpus), and docs keeping fewer
    than 3 chunks drop entirely. Shuffle-free single pass; SQL-oracled
    (list-split + contains + count + string_agg reassembly)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = linededup.c4_line_filter(
        ds, width=8, line_blacklist=("spark", "vector"), min_lines=3
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact corpus length percentiles (p25/50/75/95/99 of per-doc word
    counts) via distributed histogram combine — only the merged
    (length → count) histogram reaches the driver, never O(corpus).
    Nearest-rank convention floor((n-1)*q) so the SQL oracle reproduces
    it with integer math."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textstats.length_quantiles(ds)


def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Per-language deterministic stratified sampling (the multilingual
    temperature-resampling idiom, XLM-R style): keep 50% of 'en' docs and
    10% of every other language, selected by md5-low64(doc_id) % 100 —
    cluster-stable, no RNG state, the same doc survives on every node
    and rerun. SQL-parity via DuckDB md5_number_upper."""
    from ..functions import textkit

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = textkit._md5_low64([str(int(i)) for i in ids]) % np.uint64(100)
        rate = np.where(
            pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False),
            50,
            10,
        ).astype(np.uint64)
        return batch.filter(pa.array(h < rate))

    out = ds.map_batches(_keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-language p50/p90 of doc word counts via the grouped
    histogram combine — driver sees only the merged (lang, length)
    histogram. Same integer nearest-rank convention as
    doc_length_quantiles, reproduced per-group by the SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = textstats.grouped_length_quantiles(ds, group_col="lang")
    return out.sort_values(["lang", "q_pct"]).reset_index(drop=True)


def per_lang_head_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic 20-docs-per-language sample: top-20 per lang ordered
    by (md5-low64(doc_id), doc_id) — the group-wise reservoir idiom with
    a cluster-stable hash in place of RNG. Batch-local top-k prune before
    the single group merge, so the shuffle moves <= k x groups x blocks
    rows. SQL-parity via md5_number_upper ROW_NUMBER."""
    from ..functions import textkit
    from ..stages.relops import grouped_topk

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _hash(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = textkit._md5_low64([str(int(i)) for i in ids])
        return batch.append_column("_h", pa.array(h, type=pa.uint64()))

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    out = grouped_topk(
        hashed, group_col="lang", order_cols=["_h", "doc_id"], k=20
    ).drop_columns(["_h"]).to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def tfidf_top_terms_docs(sf_dir: str) -> pd.DataFrame:
    """Top-3 most distinctive terms per doc by the all-integer tf-idf
    surrogate tf*1e9//df (term-ascending tie-break). Size-routed: small
    vocabularies broadcast the (term, df) table and score doc-side with
    ZERO pair shuffles; giant vocabularies take the exact two-shuffle
    plan (term route + coarse doc-bucket route, both payload-bounded).
    SQL-oracled by identical integer math."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = textstats.tfidf_top_terms(ds, k=3).to_pandas()
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True)


def normalize_docs(sf_dir: str) -> pd.DataFrame:
    """Unicode-light text normalization (lowercase + whitespace collapse
    + trim) — the canonicalization step ahead of hashing/dedup. The
    corpus is already clean, so a deterministic doc_id-derived mixed-case
    + ragged-whitespace suffix is injected IDENTICALLY by the SQL oracle
    (the pii_redact pattern), then both engines run the same RE2
    normalization and hash-compare the result."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _norm(batch: pa.Table) -> pa.Table:
        dstr = pc.cast(batch["doc_id"], pa.string())
        injected = pc.binary_join_element_wise(
            pc.cast(batch["text"], pa.string()),
            "  MiXeD", dstr, "  TaIl ",
            "",
        )
        t = pc.utf8_lower(injected)
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    out = ds.map_batches(_norm, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_commonness_scores(sf_dir: str) -> pd.DataFrame:
    """Per-doc all-integer unigram 'commonness' (sum over token
    occurrences of the token's document frequency) — the perplexity-style
    quality-scoring surrogate, computed with a two-level pre-aggregated
    reduction (term-hash co-location for df, per-partition per-doc
    partials) and NO vocabulary broadcast."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = textstats.doc_commonness(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def distinct_token_estimate(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog (p=12) estimate of COUNT(DISTINCT token) over the
    documents corpus — per-batch register partials merged by one tiny
    groupby-max; driver state O(2^p). Approximate by construction, so
    rows-only for the driver; tests pin relative error <= 5% vs exact
    and bit-for-bit determinism."""
    from ..stages.sketch import hll_distinct_tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    est = hll_distinct_tokens(ds, p=12)
    return pd.DataFrame({"estimate_tokens": pd.array([est], dtype="int64")})


def kmeans_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd's k-means (k=8, 5 iterations) over the embeddings
    table: centroids broadcast once per iteration, per-batch combiner
    partials (k rows each), O(k x dim) driver state. Deterministic init
    (k lowest vec_ids). Iterative algorithm — rows-only for the driver;
    exact-equality vs a numpy Lloyd oracle is pinned in tests."""
    from ..stages.kmeans import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_fit(ds, k=8, iters=5, dim=64)
    out = kmeans_assign(ds, cent).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def inverted_index_terms(sf_dir: str) -> pd.DataFrame:
    """Distributed inverted-index build: term → document frequency +
    comma-joined ascending posting list. Batch-local (doc, term) dedup,
    one term-hash shuffle, per-partition vectorized assembly. SQL-oracled
    against DISTINCT + string_agg ORDER BY."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = textstats.inverted_index(ds, min_df=1).to_pandas()
    return out.sort_values("term").reset_index(drop=True)


def dup_span_removal_docs(sf_dir: str) -> pd.DataFrame:
    """ExactSubstr-style span dedup (Lee et al. 2021): every word covered
    by a corpus-duplicated 5-word window is removed (all occurrences),
    docs reassembled, empty docs drop. SQL-oracled against the windowed
    string_agg + HAVING>1 + coverage-join closure."""
    from ..stages.spandedup import dup_span_removal

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_span_removal(ds, n=5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _bench_train_split(ds):
    """The benchmark/train split used by every decontamination query and
    its SQL oracles: doc_id % 50 == 0 is the held-out eval set. ONE
    definition — the rule also appears verbatim in the oracle SQL, so
    change both together."""

    def _side(keep_bench: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 50 == 0) if keep_bench else (ids % 50 != 0)
            return t.filter(pa.array(m))

        return _f

    return (
        ds.map_batches(_side(True), batch_format="pyarrow"),
        ds.map_batches(_side(False), batch_format="pyarrow"),
    )


def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: docs with doc_id % 50 == 0 stand in for
    the eval suite; every other doc sharing ANY 4-word window with them
    is dropped. Broadcast-small-side probe (ray.put once, np.isin per
    batch), zero corpus shuffle. SQL-oracled via the windowed-gram IN."""
    from ..stages.spandedup import decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    bench, train = _bench_train_split(ds)
    out = decontaminate(train, bench, n=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def webtext_pipeline(sf_dir: str) -> pd.DataFrame:
    """Flagship END-TO-END training-data pipeline, hash-checked through
    all four stages by ONE nested SQL oracle: benchmark decontamination
    (4-gram overlap vs the doc_id%50==0 eval set) → corpus-wide line
    dedup (8-word chunks keep-first) → Gopher repetition gate → token-
    budget shard packing (2000-token shards, distributed prefix scan).
    Returns (doc_id, text, n_tokens, shard_id) of the packed corpus."""
    from ..stages.spandedup import decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    bench, train = _bench_train_split(ds)
    clean = decontaminate(train, bench, n=4)
    return _webtext_tail(clean)


def _webtext_tail(clean: "ray.data.Dataset") -> pd.DataFrame:
    """Shared tail of the webtext flagship: line dedup → Gopher gate →
    2000-token shard packing (distributed prefix scan)."""
    from ..functions.enumerate import attach_running_sum
    from ..stages.joins import hash_join

    ld = linededup.line_dedup(clean, width=8).materialize()  # 2 consumers
    gate = linededup.gopher_filter(ld, width=8, min_words=20).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_tokens": t["n_words"]}
        ),
        batch_format="pyarrow",
    )
    survivors = hash_join(ld, gate, key="doc_id", how="inner")
    scanned = attach_running_sum(
        survivors, ["doc_id"], "n_tokens", sum_col="_cum", num_ranges=8
    )

    def _shard(batch: pa.Table) -> pa.Table:
        excl = pc.subtract(batch["_cum"], batch["n_tokens"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "n_tokens": batch["n_tokens"],
                "shard_id": pc.divide(excl, pa.scalar(2000, pa.int64())),
            }
        )

    out = scanned.map_batches(_shard, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def webtext_pipeline_v2(sf_dir: str) -> pd.DataFrame:
    """The flagship chain with the C4 line-quality gate inserted after
    decontamination (decontaminate → C4 gate → line dedup → Gopher gate →
    shard packing) — five stages hash-checked by ONE nested SQL oracle.
    The C4 gate runs BEFORE the shuffling dedup so the shuffle sees only
    surviving lines."""
    from ..stages.spandedup import decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    bench, train = _bench_train_split(ds)
    clean = decontaminate(train, bench, n=4)
    gated = linededup.c4_line_filter(
        clean, width=8, line_blacklist=("spark", "vector"), min_lines=3
    )
    return _webtext_tail(gated)


def pack_training_shards(sf_dir: str) -> pd.DataFrame:
    """Token-budget shard packing (training-data sharding): docs in doc_id
    order are streamed into ~2000-token shards; a doc's shard is its
    EXCLUSIVE running token count // budget (shards straddle budgets, no
    doc is split). The running sum is the distributed range-partitioned
    prefix scan (functions/enumerate.attach_running_sum) — O(ranges)
    driver state, never O(docs)."""
    from ..functions.enumerate import attach_running_sum

    budget = 2000
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _count(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.list_value_length(
                pc.split_pattern(pc.cast(batch["text"], pa.string()), " ")
            ),
            pa.int64(),
        )
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    counts = ds.map_batches(_count, batch_format="pyarrow")
    scanned = attach_running_sum(
        counts, ["doc_id"], "n_tokens", sum_col="_cum", num_ranges=8
    )

    def _shard(batch: pa.Table) -> pa.Table:
        excl = pc.subtract(batch["_cum"], batch["n_tokens"])
        # int64 trunc-division == floor here (excl >= 0)
        shard = pc.divide(excl, pa.scalar(budget, pa.int64()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "shard_id": shard,
            }
        )

    out = scanned.map_batches(_shard, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def hash_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic ~10% corpus downsample: keep docs whose
    md5-low64(str(doc_id)) % 10 == 0 — the reproducible, cluster-stable
    sampling idiom (no RNG state to coordinate; the same doc survives on
    every node / every rerun). SQL-parity via DuckDB md5_number_upper."""
    from ..functions import textkit

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = textkit._md5_low64([str(int(i)) for i in ids])
        return batch.filter(pa.array(h % np.uint64(10) == 0))

    out = ds.map_batches(_keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Char-3gram Jaccard >= 0.9 near-dup dedup. SQL-oracled against the
    exact all-pairs gram Jaccard closure."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = dedup_stage.ngram_jaccard_dedup(ds, threshold=0.9)
    return (
        kept.select_columns(["doc_id"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


# Above this many vectors the broadcast brute-force matrix stops being the
# right plan; the hyperplane-LSH bucket shuffle takes over (tested equal on
# planted-dup corpora at matching thresholds).
_EMBEDDING_BRUTE_MAX_ROWS = 50_000


def embedding_dedup_vecs(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup with automatic plan choice: brute-force broadcast
    cosine for small corpora, hyperplane-LSH bucket shuffle at scale (row
    count read from Parquet metadata — no data scan). SQL-oracled: the
    oracle is the exact all-pairs LIST_COSINE_SIMILARITY >= 0.995
    closure."""
    import pyarrow.parquet as _pq

    meta = _pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_rows = meta.metadata.num_rows
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    if n_rows > _EMBEDDING_BRUTE_MAX_ROWS:
        dim = len(
            meta.read_row_group(0, columns=["embedding"])["embedding"][0]
        )
        kept = dedup_stage.embedding_dedup_lsh(
            ds, dim=dim, threshold=0.995, n_bits=12, multiprobe=1
        )
    else:
        kept = dedup_stage.embedding_dedup(ds, threshold=0.995)
    return (
        kept.select_columns(["vec_id"]).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )


def langid_docs(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic per doc. SQL-oracled: the oracle re-derives
    every branch of ``textkit.detect_lang`` (kana/hangul presence, CJK /
    cyrillic / ascii character-class ratios over the first 2000 chars,
    stopword fraction of the [A-Za-z']+ tokens) with the same float
    arithmetic, so equality pins the classifier exactly."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_lang_pred(ds).select_columns(["doc_id", "lang_pred"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """md5 fingerprint of normalized text (SQL parity)."""
    from ..stages.textstats import add_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = add_fingerprints(ds).select_columns(["doc_id", "fp_md5"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def knn_cosine_top10(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 (ints only in the
    output so the DuckDB float path can't cause hash drift)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.stack(emb.loc[emb.vec_id == 0, "embedding"].to_numpy())
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = simsearch.knn_brute_force(ds, qvec, k=10, exclude_ids={0}).to_pandas()
    return out[["rank", "vec_id"]].sort_values("rank").reset_index(drop=True)


def knn_lsh_top10(sf_dir: str) -> pd.DataFrame:
    """LSH-bucketed approximate top-10 (no SQL oracle; recall vs brute
    force asserted in tests)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.stack(emb.loc[emb.vec_id == 0, "embedding"].to_numpy())
    dim = len(emb["embedding"].iloc[0])
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = simsearch.knn_lsh(
        ds, qvec, k=10, dim=dim, n_bits=6, multiprobe=1, exclude_ids={0}
    ).to_pandas()
    return out[["rank", "vec_id"]].sort_values("rank").reset_index(drop=True)


# --- crawl-engine operators over the synthesized page table ---------------


def _golden_guard(out: pd.DataFrame, expected_md5: str, name: str) -> pd.DataFrame:
    """Assert-and-return for the crawl/extract rows-only queries (VERDICT
    r3 #9): the driver's check for these is rows-only by design (no SQL
    oracle exists for crawl ordering / HTML extraction), so a silent
    semantic drift could hide behind ``no_oracle``. Each query's full
    result is hashed against a corpus-keyed constant (synth seed=42,
    4 listing pages) pinned when the golden tests last passed — any
    visit-order / extraction / schema change now fails LOUDLY here too."""
    import hashlib

    payload = "\n".join(
        "\x1f".join(r) for r in out.astype(str).itertuples(index=False)
    )
    got = hashlib.md5(payload.encode()).hexdigest()
    assert got == expected_md5, (
        f"{name}: golden result hash {got} != pinned {expected_md5} — "
        "crawl order / extraction semantics drifted; re-run the golden "
        "tests and re-pin only if the change is intentional"
    )
    return out


def extract_docs_pages(sf_dir: str) -> pd.DataFrame:
    """Page extraction (M3-M6): synthesized input_hint pages → docs
    (rows-only check; byte-identity is pinned by tests/test_extract.py
    and the in-query golden hash)."""
    pages, _ = synth_pages(num_listing_pages=4, seed=42)
    docs = extract_docs(ray.data.from_arrow(pages))
    out = docs.select_columns(
        ["url", "cat_id", "name", "n_images", "n_links", "text"]
    ).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    return _golden_guard(
        out, "0ddcb45c09060c2490ed84819cfb6363", "extract_docs_pages"
    )


def harvest_images_pages(sf_dir: str) -> pd.DataFrame:
    """Image-link harvest exploded to rows (M3/M4/M10 + S3 analog)."""
    pages, _ = synth_pages(num_listing_pages=4, seed=42)
    docs = extract_docs(ray.data.from_arrow(pages))
    out = explode_images(docs).to_pandas()
    out = out.sort_values(["url", "seq"]).reset_index(drop=True)
    return _golden_guard(
        out, "c49b76927544d0f301673c3ca86e0096", "harvest_images_pages"
    )


def crawl_visits(sf_dir: str) -> pd.DataFrame:
    """Full frontier loop on the synthesized site (golden order pinned vs
    the sequential oracle in tests; rows-only check here)."""
    import tempfile

    from ..config import CrawlConfig
    from ..sources.pages import BroadcastPageStore
    from .crawl import crawl

    pages, seeds = synth_pages(num_listing_pages=4, seed=42)
    with tempfile.TemporaryDirectory() as td:
        res = crawl(
            BroadcastPageStore(pages),
            seeds,
            td,
            CrawlConfig(host_budget_per_round=32, max_rounds=20, seen_shards=2),
        )
    out = res.visits.to_pandas()
    out["url_sha1"] = out["url_sha1"].map(lambda b: b.hex())
    return _golden_guard(
        out, "11f10653a0260d9945cae4f581354cb7", "crawl_visits"
    )


# --- additional operator coverage (round-1 widening) ----------------------


def semi_join_customers(sf_dir: str) -> pd.DataFrame:
    """Semi-join (J1 positive form): customers WITH >=1 order, via a
    broadcast key set filtered inside map_batches."""
    import ray as _ray

    okeys = pa.array(
        pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])[
            "o_custkey"
        ].unique()
    )
    okeys_ref = _ray.put(okeys)
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def _semi(t: pa.Table) -> pa.Table:
        keys = _ray.get(okeys_ref)
        return t.filter(pc.is_in(t["c_custkey"], value_set=keys))

    out = cust.map_batches(_semi, batch_format="pyarrow").to_pandas()
    if "c_custkey" not in out.columns:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def union_distinct_nations(sf_dir: str) -> pd.DataFrame:
    """Union + distinct (D3: union of frontier sources then dedup)."""
    c = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["c_nationkey"], pa.int32())}),
        batch_format="pyarrow",
    )
    s = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["s_nationkey"], pa.int32())}),
        batch_format="pyarrow",
    )
    u = c.union(s)
    out = u.groupby("nationkey").count().to_pandas()[["nationkey"]]
    return out.sort_values("nationkey").reset_index(drop=True)


def kv_parse_props(sf_dir: str) -> pd.DataFrame:
    """Key-value parse (M6 analog): extract the integer under key 'k' from
    the JSON-ish props string with the same regex as the SQL oracle."""
    import re

    rx = re.compile(r'"k": (\d+)')
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def _kv(t: pa.Table) -> pa.Table:
        vals = [
            int(m.group(1)) if (m := rx.search(p or "")) else None
            for p in t["props"].to_pylist()
        ]
        return pa.table(
            {"event_id": t["event_id"], "k_val": pa.array(vals, type=pa.int64())}
        )

    out = ds.map_batches(_kv, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def session_windows(sf_dir: str) -> pd.DataFrame:
    """Sessionization (§2.9 streaming analog): per user, count sessions
    where a >30-minute gap starts a new session. One hash-bucket shuffle
    + vectorized diff/bincount across all of a bucket's users at once
    (stages/relops.grouped_session_count) — the engine's stateful-window
    idiom without a Python call per user."""
    from ..stages.relops import grouped_session_count

    GAP_US = 30 * 60 * 1_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "ts_us": pc.cast(t["ts"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = grouped_session_count(
        ds, group_col="user_id", ts_col="ts_us", gap=GAP_US,
        out_col="n_sessions",
    ).to_pandas()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def rank_customers(sf_dir: str) -> pd.DataFrame:
    """Global dense enumeration (O3/ST6: the cat_0001... counter): rank by
    (acctbal desc, custkey). Driver-side enumeration over the sorted key
    column — the documented small-cardinality path; at 10^9 groups this
    becomes range-partitioned offsets."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    df = ds.to_pandas().sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True]
    )
    df["bal_rank"] = range(1, len(df) + 1)
    return df[["c_custkey", "bal_rank"]].sort_values("c_custkey").reset_index(drop=True)


def dataset_totals(sf_dir: str) -> pd.DataFrame:
    """A5 analog: global dataset totals in one row."""
    from ray.data.aggregate import Count, Sum

    docs = _read(sf_dir, "documents", ["n_chars"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )
    n_events = _read(sf_dir, "events", ["event_id"]).count()
    n_vecs = _read(sf_dir, "embeddings", ["vec_id"]).count()
    avg_chars = docs["total_chars"] / docs["n_docs"]
    return pd.DataFrame(
        {
            "n_docs": [int(docs["n_docs"])],
            "total_chars": [int(docs["total_chars"])],
            "avg_chars": [avg_chars],
            "n_events": [int(n_events)],
            "n_vecs": [int(n_vecs)],
        }
    )


def strided_id_probe(sf_dir: str) -> pd.DataFrame:
    """O5: strided ID-range probe seeding (smart_cat_discovery.py:158-173)
    as ray.data.range + arithmetic map."""
    import ray.data as rd

    ranges = [(226400, 226500), (226500, 226600), (226600, 226700),
              (226700, 226800), (226800, 226900)]
    parts = []
    for lo, hi in ranges:
        n = (hi - lo + 4) // 5
        ds = rd.range(n).map_batches(
            lambda t, lo=lo: pa.table(
                {"cat_id": pc.add(pc.multiply(t["id"], 5), lo)}
            ),
            batch_format="pyarrow",
        )
        parts.append(ds)
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    out = u.to_pandas()
    out["cat_id"] = out["cat_id"].astype("int64")
    return out.sort_values("cat_id").reset_index(drop=True)


def content_type_extensions(sf_dir: str) -> pd.DataFrame:
    """M9: Content-Type -> extension mapping (config.py:117-123 of the
    reference; '.jpg' default)."""
    import ray.data as rd

    from ..config import CONTENT_TYPE_TO_EXTENSION, DEFAULT_IMAGE_EXTENSION

    cts = ["image/jpeg", "image/jpg", "image/png", "image/gif",
           "image/webp", "text/html", "application/json"]
    ds = rd.from_items([{"content_type": c} for c in cts])

    def _map(t: pa.Table) -> pa.Table:
        exts = [
            CONTENT_TYPE_TO_EXTENSION.get(c, DEFAULT_IMAGE_EXTENSION)
            for c in t["content_type"].to_pylist()
        ]
        return t.append_column("ext", pa.array(exts, type=pa.string()))

    return (
        ds.map_batches(_map, batch_format="pyarrow")
        .to_pandas()
        .sort_values("content_type")
        .reset_index(drop=True)
    )


def zero_pad_part_labels(sf_dir: str) -> pd.DataFrame:
    """M7/O3 formatting: the reference's cat_%04d / image_%03d zero-pad
    naming (reorganize_dataset.py:87,103) as a vectorized projection."""
    ds = _read(sf_dir, "part", ["p_partkey"])

    def _label(t: pa.Table) -> pa.Table:
        labels = [f"cat_{int(k) % 10000:04d}" for k in t["p_partkey"].to_pylist()]
        return t.append_column("label", pa.array(labels, type=pa.string()))

    out = ds.map_batches(_label, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def head_sample_orders(sf_dir: str) -> pd.DataFrame:
    """O6: deterministic head-n sample (sort then limit 10)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort("o_orderkey").limit(10).to_pandas()
    return out[["o_orderkey"]].reset_index(drop=True)


# --- image-pipeline coverage (rows-only; semantics pinned by tests) -------


def cleaning_advanced_counts(sf_dir: str) -> pd.DataFrame:
    """F1-F7 per-reason removal accounting over the synthetic image corpus
    (advanced_cleaning.py report shape)."""
    import ray.data as rd

    from ..stages.cleaning import advanced_cleaning_pipeline, removal_stats
    from ..synth import synth_images

    images = synth_images(num_cats=40, images_per_cat=8, seed=42)
    kept, quarantined = advanced_cleaning_pipeline(rd.from_arrow(images))
    stats = removal_stats(quarantined).to_pandas()
    stats = stats.rename(columns={"count()": "n"}).sort_values("removal_reason")
    total = pd.DataFrame(
        {"removal_reason": ["__kept__"], "n": [kept.count()]}
    )
    return pd.concat([stats, total], ignore_index=True)


def scorer_summary_stats(sf_dir: str) -> pd.DataFrame:
    """ST2/A3: pseudo-YOLO scoring summary with the reference's weighted
    mean (yolo_cat_detector.py:219-220)."""
    import ray.data as rd

    from ..stages.scorer import detection_summary, score_images
    from ..synth import synth_images

    images = synth_images(num_cats=30, images_per_cat=6, seed=42)
    s = detection_summary(score_images(rd.from_arrow(images), concurrency=2))
    return pd.DataFrame([s])


def incremental_hourly_window(sf_dir: str) -> pd.DataFrame:
    """§2.9 incremental form: the same tumbling-window aggregate as
    events_hourly_window, computed through per-bucket STATE ACTORS fed a
    ts-ordered stream (stages/streaming.py) instead of a groupby shuffle.
    Values scaled to exact integer micros so the SQL oracle matches."""
    from ..stages.streaming import incremental_windows

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "ts": t["ts"],
                "value_u": pc.cast(
                    _to_scaled_int(t["value"], 1_000_000), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = incremental_windows(
        ds, key_col="event_type", ts_col="ts", value_col="value_u",
        window_s=3600, num_buckets=4,
    ).to_pandas()
    out["hour"] = (out["window_start_us"] // 3_600_000_000).astype("int64")
    out["total_value_micros"] = out["value_sum"].round().astype("int64")
    out = out.rename(columns={"key": "event_type"})[
        ["event_type", "hour", "n", "total_value_micros"]
    ]
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def knn_ivf_top10(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate top-10 (no SQL oracle; recall pinned by
    tests on clustered data)."""
    from ..stages.simsearch import knn_ivf

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.stack(emb.loc[emb.vec_id == 0, "embedding"].to_numpy())
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_ivf(ds, qvec, k=10, n_lists=8, nprobe=4, exclude_ids={0}).to_pandas()
    return out[["rank", "vec_id"]].sort_values("rank").reset_index(drop=True)


def textprep_corpus(sf_dir: str) -> pd.DataFrame:
    """Composed training-data prep pipeline (langid -> quality -> exact
    dedup -> minhash near-dedup -> token counts); returns kept doc_ids +
    per-doc token counts. SQL-oracled END-TO-END: quality gate in exact
    integer arithmetic, md5 keep-first, then the exact near-dup closure
    over the surviving corpus."""
    from .textprep import prepare_text_corpus

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept, report = prepare_text_corpus(
        ds, min_words=5, min_quality=0.5, collect_report=False
    )
    out = kept.select_columns(["doc_id", "n_tokens"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def running_order_totals(sf_dir: str) -> pd.DataFrame:
    """Window function (running sum per partition): per customer, orders in
    (o_orderdate, o_orderkey) order with a cumulative total + row number.
    One hash-bucket shuffle, every customer's cumsum/rank computed in one
    segment pass (stages/relops.grouped_running_sum) — the engine's
    window idiom; cents ints keep the cumulative sums exact vs the SQL
    oracle."""
    from ..stages.relops import grouped_running_sum
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "price_c": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )

    out = (
        grouped_running_sum(
            ds,
            group_col="o_custkey",
            order_cols=["o_orderdate", "o_orderkey"],
            value_col="price_c",
            out_col="running_total_c",
            rank_col="order_rank",
        )
        .select_columns(
            ["o_orderkey", "o_custkey", "running_total_c", "order_rank"]
        )
        .to_pandas()
    )
    out["running_total_c"] = out["running_total_c"].astype("int64")
    out["order_rank"] = out["order_rank"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def rank_customers_distributed(sf_dir: str) -> pd.DataFrame:
    """Same ranking as rank_customers but through the range-partitioned
    distributed enumeration (functions/enumerate.py) — two plans, one
    answer, same DuckDB oracle."""
    from ..functions.enumerate import attach_dense_index

    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out = attach_dense_index(
        ds, ["c_acctbal", "c_custkey"], ascending=[False, True],
        index_col="bal_rank", num_ranges=8,
    ).to_pandas()
    return out[["c_custkey", "bal_rank"]].sort_values("c_custkey").reset_index(drop=True)


# --- custom relational operators (as-of / range joins, token top-k) -------


def asof_join_clicks_views(sf_dir: str) -> pd.DataFrame:
    """As-of join (custom operator — Ray Data has no native one): for each
    'click' event, the latest 'view' of the same user at or before the
    click. Right-side ties pre-resolved to max event_id per (user, ts) so
    the match is unambiguous on both sides (DuckDB ASOF JOIN oracle)."""
    from ray.data.aggregate import Max

    from ..stages.relops import asof_join

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _side(ev_type):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], ev_type)).drop_columns(
                ["event_type"]
            )

        return _f

    clicks = ds.map_batches(_side("click"), batch_format="pyarrow")
    views = (
        ds.map_batches(_side("view"), batch_format="pyarrow")
        .groupby(["user_id", "ts"])
        .aggregate(Max("event_id", alias_name="view_event_id"))
    )
    out = asof_join(
        clicks, views, by="user_id", on="ts", value_cols=["view_event_id"]
    ).to_pandas()
    out = out[["event_id", "user_id", "view_event_id"]]
    # the union pad makes left ints nullable inside groups -> float; clicks
    # themselves are never null, so restore exact int64
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    out["view_event_id"] = out["view_event_id"].astype("float64")
    return out.sort_values("event_id").reset_index(drop=True)


def range_join_quantity_buckets(sf_dir: str) -> pd.DataFrame:
    """Broadcast range join (custom operator): lineitem quantities
    classified into [lo, hi) buckets — the ranges are metadata (ray.put
    once), the fact table streams through one vectorized searchsorted."""
    from ..stages.relops import range_join_broadcast

    ranges = pa.table(
        {
            "lo": pa.array([0, 10, 20, 30, 40], type=pa.int64()),
            "hi": pa.array([10, 20, 30, 40, 60], type=pa.int64()),
            "bucket_label": pa.array(["xs", "s", "m", "l", "xl"]),
        }
    )
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    out = range_join_broadcast(
        ds, ranges, value_col="l_quantity",
        keep_cols=["l_orderkey", "l_linenumber"],
    ).to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def top_tokens(sf_dir: str) -> pd.DataFrame:
    """Global token top-20 with PARTIAL PRE-AGGREGATION: per-batch Counter
    partials (vocab-of-batch rows) -> groupby(token).sum -> distributed
    sort + limit. The full corpus never shuffles raw tokens — only
    per-batch (token, n) partials — the wordcount shape a 100 TB corpus
    needs."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..functions import textkit

    ds = _read(sf_dir, "documents", ["text"])

    def _partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(textkit.tokens_ws(txt or ""))
        items = sorted(c.items())
        return pa.table(
            {
                "token": pa.array([k for k, _ in items], type=pa.string()),
                "n": pa.array([v for _, v in items], type=pa.int64()),
            }
        )

    out = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=1024)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def fetch_list_visits(sf_dir: str) -> pd.DataFrame:
    """Streamed fetch-list crawl (the 10^10-scale headline path) over the
    synthesized site: Dataset frontier, task-side seen anti-join + visit
    shards, sub-host-range dense enumeration. Rows-only driver check; the
    visit-order contract is pinned bit-for-bit by tests/test_fetch_list.py
    against a sequential reference."""
    import tempfile

    from ..config import CrawlConfig
    from ..sources.pages import BroadcastPageStore
    from .crawl import crawl_fetch_list, seeds_to_frontier

    pages, _ = synth_pages(num_listing_pages=4, seed=42)
    frontier = seeds_to_frontier(pages["url"].to_pylist())
    with tempfile.TemporaryDirectory() as td:
        res = crawl_fetch_list(
            BroadcastPageStore(pages),
            frontier,
            td,
            CrawlConfig(
                host_budget_per_round=40, max_rounds=20, seen_shards=2,
                expand_links=False, fetch_batch_size=64,
            ),
        )
        out = res.visits_table().to_pandas()
    out["url_sha1"] = out["url_sha1"].map(lambda b: b.hex())
    out = out.sort_values("visit_idx").reset_index(drop=True)
    return _golden_guard(
        out, "e9b7158242931e8bca91f673817de316", "fetch_list_visits"
    )


# --- round-3 window / frequent-items / graph / outer-join operators -------


def user_event_gaps(sf_dir: str) -> pd.DataFrame:
    """Keyed LAG window (custom operator — Ray Data has no window
    functions): per-user inter-event gap in microseconds, ordered by
    (ts, event_id). One user-hash-bucket shuffle, every user's shift
    computed in one vectorized segment pass (stages/relops.grouped_lag);
    first-event rows (null lag) drop on both sides."""
    from ..stages.relops import grouped_lag

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    lagged = grouped_lag(
        ds.map_batches(_us, batch_format="pyarrow"),
        group_col="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="ts_us",
        out_col="prev_us",
    )

    def _gap(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["prev_us"]))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "gap_us": pc.subtract(t["ts_us"], t["prev_us"]),
            }
        )

    out = lagged.map_batches(_gap, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def heavy_hitter_tokens(sf_dir: str) -> pd.DataFrame:
    """Exact phi=1/50 frequent tokens by two-pass sketch-prune + verify
    (stages/heavyhitters): per-batch locally-heavy candidates (pigeonhole
    superset guarantee), broadcast, exact recount. Output is exact, so
    SQL-checkable — unlike a raw SpaceSaving sketch."""
    from ..stages.heavyhitters import heavy_hitter_tokens as _hh

    ds = _read(sf_dir, "documents", ["text"])
    return _hh(ds, text_col="text", k=50).to_pandas()


def pagerank_customers(sf_dir: str) -> pd.DataFrame:
    """Integer PageRank (stages/graph.pagerank_int), 5 rounds, over a
    deterministic order-derived graph: node set = customers, edges =
    DISTINCT (o_custkey -> 1 + o_orderkey % max(c_custkey)), self-loops
    dropped. All-integer message passing makes the ranks bit-reproducible
    and oracle-checkable by an unrolled SQL power iteration."""
    from ray.data.aggregate import Count, Max

    from ..stages.graph import pagerank_int

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])
    nodes = cust.map_batches(
        lambda t: pa.table({"node": t["c_custkey"]}), batch_format="pyarrow"
    )

    def _edges(t: pa.Table) -> pa.Table:
        src = pc.cast(t["o_custkey"], pa.int64())
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = pa.array((okey % maxc) + 1, type=pa.int64())
        tbl = pa.table({"src": src, "dst": dst})
        return tbl.filter(pc.not_equal(tbl["src"], tbl["dst"]))

    # no pre-dedup shuffle here: pagerank_int's src-keyed degree pass
    # dedups (src, dst) locally inside each co-located group
    edges = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    )
    out = pagerank_int(nodes, edges, iterations=5).to_pandas()
    out["pr_scaled"] = out["pr_scaled"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def outer_join_balances(sf_dir: str) -> pd.DataFrame:
    """Distributed FULL OUTER hash join (stages/joins.hash_join,
    partition-bucketed acero stitch, key coalesced per-partition):
    BUILDING-segment customers vs positive-balance customers on custkey —
    genuine unmatched rows on both sides; nulls coalesced to sentinels so
    the driver hash is type-stable."""
    from ..stages.joins import hash_join

    ds = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]
    )

    def _left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        return pa.table({"c_custkey": t["c_custkey"], "c_name": t["c_name"]})

    def _right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], 0.0))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": _to_scaled_int(t["c_acctbal"], 100),
            }
        )

    left = ds.map_batches(_left, batch_format="pyarrow")
    right = ds.map_batches(_right, batch_format="pyarrow")
    out = hash_join(
        left, right, key="c_custkey", how="full_outer"
    ).to_pandas()
    out["c_name"] = out["c_name"].fillna("<none>")
    out["bal_cents"] = out["bal_cents"].fillna(-1).astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def _order_stats_multilevel(sf_dir: str, include_priority_level: bool) -> pd.DataFrame:
    """Shared ROLLUP/CUBE engine: ONE corpus-sized groupby at the
    (status, priority) grain, then every coarser level RE-AGGREGATES the
    metadata-sized result instead of re-shuffling the corpus; the grand
    total is a driver scalar. CUBE = ROLLUP + the priority-only level."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": t["o_orderstatus"],
                "priority": t["o_orderpriority"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    fine = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["status", "priority"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="total_cents"))
        .materialize()  # |status| x |priority| rows — metadata-sized
    )

    def _const(col: str, val: str):
        return lambda t: t.append_column(
            col, pa.array([val] * t.num_rows, type=pa.string())
        )

    def _level(group_col: str, const_col: str):
        return (
            fine.groupby(group_col)
            .aggregate(
                Sum("n", alias_name="n"),
                Sum("total_cents", alias_name="total_cents"),
            )
            .map_batches(_const(const_col, "ALL"), batch_format="pyarrow")
        )

    levels = [_level("status", "priority")]
    if include_priority_level:
        levels.append(_level("priority", "status"))
    grand = fine.aggregate(
        Sum("n", alias_name="n"), Sum("total_cents", alias_name="total_cents")
    )  # driver scalar — two ints
    lvl0 = pd.DataFrame(
        {
            "status": ["ALL"],
            "priority": ["ALL"],
            "n": [int(grand["n"])],
            "total_cents": [int(grand["total_cents"])],
        }
    )
    cols = ["status", "priority", "n", "total_cents"]
    out = pd.concat(
        [fine.to_pandas()[cols]]
        + [lv.to_pandas()[cols] for lv in levels]
        + [lvl0[cols]],
        ignore_index=True,
    )
    out["n"] = out["n"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values(["status", "priority"]).reset_index(drop=True)


def rollup_order_stats(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP analog (multi-level aggregate) — see
    :func:`_order_stats_multilevel` for the one-corpus-shuffle shape."""
    return _order_stats_multilevel(sf_dir, include_priority_level=False)


def top_event_type_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped argmax / mode (per-key most frequent value): corpus groupby
    to (user, type) counts, then relops.grouped_topk k=1 with a
    batch-local prune — the distributed DISTINCT ON / QUALIFY shape."""
    from ray.data.aggregate import Count

    from ..stages.relops import grouped_topk

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = (
        ds.groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
        .map_batches(
            lambda t: t.append_column(
                "neg_n", pc.multiply(t["n"], pa.scalar(-1, pa.int64()))
            ),
            batch_format="pyarrow",
        )
    )
    out = grouped_topk(
        counts, group_col="user_id", order_cols=["neg_n", "event_type"], k=1
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return (
        out[["user_id", "event_type", "n"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def distinct_tokens_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-group HLL cardinality sketch (stages/sketch
    hll_distinct_tokens_by): approximate distinct-token count per
    language; driver sees O(langs x 4096) register rows. Rows-only by
    necessity (approximate); tests pin the error band vs exact."""
    from ..stages.sketch import hll_distinct_tokens_by

    ds = _read(sf_dir, "documents", ["lang", "text"])
    out = hll_distinct_tokens_by(ds, group_col="lang", p=12).to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def pivot_priority_status(sf_dir: str) -> pd.DataFrame:
    """PIVOT (long -> wide): order counts and total cents per priority,
    one column group per order status. Scale shape: ONE corpus groupby at
    the (priority, status) grain — the wide reshape runs on the
    metadata-sized result, never on the corpus."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "priority": t["o_orderpriority"],
                "status": t["o_orderstatus"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    fine = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["priority", "status"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()  # |priority| x |status| rows
    )
    statuses = ["F", "O", "P"]
    out = pd.DataFrame({"priority": sorted(fine["priority"].unique())})
    for s in statuses:
        sub = fine[fine["status"] == s].set_index("priority")
        # reindex with an int fill keeps the columns int64 end-to-end
        # (a map + fillna round-trip through float64 would lose exactness
        # for cent sums beyond 2^53)
        out[f"n_{s.lower()}"] = (
            sub["n"].reindex(out["priority"], fill_value=0).to_numpy()
        )
        out[f"cents_{s.lower()}"] = (
            sub["cents"].reindex(out["priority"], fill_value=0).to_numpy()
        )
    return out.sort_values("priority").reset_index(drop=True)


def cube_order_stats(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE analog: ROLLUP plus the priority-only level — see
    :func:`_order_stats_multilevel`."""
    return _order_stats_multilevel(sf_dir, include_priority_level=True)


def ntile_customers(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey): global rank
    via the distributed range-partitioned enumeration
    (functions/enumerate.attach_dense_index — O(ranges) driver state),
    then the SQL NTILE bucket is a pure vectorized formula of (rank, n):
    the first n%k buckets get ceil(n/k) rows, the rest floor(n/k)."""
    from ..functions.enumerate import attach_dense_index

    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": _to_scaled_int(t["c_acctbal"], 100),
            }
        )

    ranked = attach_dense_index(
        ds.map_batches(_prep, batch_format="pyarrow"),
        ["bal_cents", "c_custkey"],
        ascending=[False, True],
        index_col="rank",
    ).materialize()  # consumed twice below (count + bucket map)
    n = ranked.count()
    k = 4
    q, r = divmod(n, k)
    boundary = r * (q + 1)

    def _bucket(t: pa.Table) -> pa.Table:
        rank = np.asarray(t["rank"].to_numpy(zero_copy_only=False))
        big = (rank - 1) // (q + 1) + 1 if q + 1 > 0 else np.ones_like(rank)
        small = r + (rank - 1 - boundary) // q + 1 if q > 0 else np.ones_like(rank)
        bucket = np.where(rank <= boundary, big, small)
        return pa.table(
            {"c_custkey": t["c_custkey"], "bucket": pa.array(bucket, pa.int64())}
        )

    out = ranked.map_batches(_bucket, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def intersect_rich_building(sf_dir: str) -> pd.DataFrame:
    """INTERSECT: custkeys with acctbal > 5000 AND in the BUILDING
    segment — two pruned reads, distributed left-semi hash join (keys
    co-partitioned, is_in mask per partition; both sides stay Datasets)."""
    from ..stages.joins import hash_join

    rich = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 5000.0)),
        batch_format="pyarrow",
    )
    bldg = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    out = hash_join(
        rich.select_columns(["c_custkey"]),
        bldg.select_columns(["c_custkey"]),
        key="c_custkey",
        how="left_semi",
        num_partitions=32,
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def events_moving_sum(sf_dir: str) -> pd.DataFrame:
    """Bounded moving-window aggregate: per-user rolling sum of the last
    3 event values (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) via
    stages/relops.grouped_rolling_sum — one keyed shuffle, per-group
    vectorized cumsum difference, integer units for oracle exactness."""
    from ..stages.relops import grouped_rolling_sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value_u": _to_scaled_int(t["value"], 1_000_000),
            }
        )

    rolled = grouped_rolling_sum(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="value_u",
        out_col="win_sum_u",
        preceding=2,
    )
    out = rolled.select_columns(
        ["event_id", "user_id", "win_sum_u"]
    ).to_pandas()
    out["win_sum_u"] = out["win_sum_u"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_rolling_anomaly(sf_dir: str) -> pd.DataFrame:
    """ROLLING z-score anomaly gate: events whose value lies beyond 2
    rolling standard deviations of the SAME user's 4 PRECEDING events
    (frame EXCLUDES the current row — including it caps the max
    standardized deviation at sqrt(n-1) = 2, so a strict 2-sigma gate
    over an inclusive 5-frame is provably empty; the streaming
    complement of the global-moments ``event_value_anomalies``). All
    integer math: with preceding-frame sums s = Σv, ss = Σv², n = frame
    length, the |v - s/n| > 2σ test cross-multiplies to
    ``(v*n - s)² > 4*(n*ss - s²)`` — exact on both sides (cents keep
    every term ≤ ~1e12, far under int64). Frames shorter than 3
    preceding events are skipped (a 2-sample σ flags noise).

    Scale plan: Σv, Σv² and n come from ONE fused
    :func:`relops.grouped_rolling_sum` pass (multi-column + count_col —
    one bucket shuffle, one lexsort), then a shuffle-free vectorized
    filter."""
    from ..stages.relops import grouped_rolling_sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        v = _to_scaled_int(t["value"], 100)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "v": v,
                "v2": pc.multiply(v, v),
            }
        )

    rolled = grouped_rolling_sum(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="user_id",
        order_cols=["ts_us", "event_id"],
        value_col=["v", "v2"],
        out_col=["s", "ss"],
        count_col="n",
        preceding=4,
    )

    def _flag(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False), dtype=np.int64)
        # kernel frames are current-inclusive; subtract the current row
        # to get the 4-PRECEDING-to-1-PRECEDING moments
        s = np.asarray(t["s"].to_numpy(zero_copy_only=False), dtype=np.int64) - v
        ss = np.asarray(
            t["ss"].to_numpy(zero_copy_only=False), dtype=np.int64
        ) - v * v
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64) - 1
        d = v * n - s
        keep = (n >= 3) & (d * d > 4 * (n * ss - s * s))
        return pa.table(
            {
                "event_id": t["event_id"].filter(pa.array(keep)),
                "user_id": t["user_id"].filter(pa.array(keep)),
                "v_cents": t["v"].filter(pa.array(keep)),
                "n_window": pa.array(n[keep]),
            }
        )

    out = rolled.map_batches(_flag, batch_format="pyarrow").to_pandas()
    cols = ["event_id", "user_id", "v_cents", "n_window"]
    if out.empty:
        # Ray's to_pandas drops the schema of an all-empty dataset
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[cols].sort_values("event_id").reset_index(drop=True)


def incremental_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL corpus dedup — the production "new dump vs existing
    corpus" shape: sources src0-src9 are the EXISTING corpus, src10+
    the NEW dump; a new doc survives iff its prefix fingerprint (same
    8-token-head md5 as ``dedup_loss_by_source``) appears NOWHERE in
    the existing corpus AND it is the first (min doc_id) among the new
    dump's copies. The existing corpus is never rewritten — only its
    fingerprints ride the shuffle.

    Scale plan: ONE fingerprint-hash bucket shuffle co-locates every
    copy of a fingerprint (old and new), so the anti-join AND the
    keep-first collapse are bucket-local: per bucket one lexsort +
    boundary masks (run-level any(old) via np.maximum.reduceat,
    first-new via the run-start gather) — no driver state, no second
    shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def _fp(batch: pa.Table) -> pa.Table:
        import hashlib

        from ..functions import textkit

        fps = [
            hashlib.md5(
                " ".join(
                    textkit.normalize_for_fingerprint(t or "").split(" ")[:8]
                ).encode("utf-8")
            ).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        fp_u64 = np.array([int(f[:16], 16) for f in fps], dtype=np.uint64)
        srcs = batch["source"].to_pylist()
        is_new = np.array([int(s[3:]) >= 10 for s in srcs], dtype=bool)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "fp_md5": pa.array(fps, pa.string()),
                "is_new": pa.array(is_new),
                "_p": pa.array((fp_u64 % np.uint64(64)).astype(np.int64)),
            }
        )

    def _keep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
            }
        )
        if g.num_rows == 0:
            return empty
        fps = np.asarray(g["fp_md5"].to_pylist(), dtype=object)
        ids = np.asarray(
            g["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        new = np.asarray(g["is_new"].to_numpy(zero_copy_only=False), dtype=bool)
        order = np.lexsort((ids, fps))
        sfp, sid, snew = fps[order], ids[order], new[order]
        starts = np.nonzero(np.concatenate([[True], sfp[1:] != sfp[:-1]]))[0]
        run_id = np.cumsum(np.concatenate([[True], sfp[1:] != sfp[:-1]])) - 1
        has_old = np.maximum.reduceat((~snew).astype(np.int64), starts) > 0
        # first new row of each run: rows are (fp, id)-sorted, so it is
        # the earliest position in the run where is_new holds
        cnew = np.cumsum(snew.astype(np.int64))
        cnew0 = np.concatenate(([0], cnew))
        new_before_in_run = cnew0[np.arange(len(sfp))] - cnew0[starts[run_id]]
        keep = snew & (new_before_in_run == 0) & ~has_old[run_id]
        kept_pos = order[keep]
        return pa.table(
            {
                "doc_id": g["doc_id"].take(pa.array(kept_pos, pa.int64())),
                "source": g["source"].take(pa.array(kept_pos, pa.int64())),
            }
        )

    out = (
        ds.map_batches(_fp, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_keep, batch_format="pyarrow")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def fuzzy_decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Fuzzy benchmark decontamination over the documents table: drop
    corpus docs whose word-3-gram Jaccard with ANY benchmark doc
    reaches 0.5 (paraphrase leakage the exact window matcher misses).
    The fixture's stand-in benchmark = every 7th doc_id — at corpus
    scale the benchmark is an external small set, which is exactly the
    kernel's contract (:func:`..stages.spandedup.fuzzy_decontaminate`:
    broadcast inverted index, zero corpus shuffle). Returns the kept
    doc ids."""
    from ..stages.spandedup import fuzzy_decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _split(want_bench: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = np.asarray(
                t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            is_b = ids % 7 == 0
            return t.filter(pa.array(is_b if want_bench else ~is_b))

        return _f

    bench = ds.map_batches(_split(True), batch_format="pyarrow")
    corpus = ds.map_batches(_split(False), batch_format="pyarrow")
    kept = fuzzy_decontaminate(corpus, bench, k=3, threshold=0.5)
    out = kept.select_columns(["doc_id"]).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def range_join_price_bands(sf_dir: str) -> pd.DataFrame:
    """Distributed interval join with BOTH sides large and OVERLAPPING
    ranges (stages/relops.range_join_bucketed): customers' balance values
    vs part-derived price bands. Values route to one domain bucket each,
    ranges replicate only to buckets they overlap, one groupby(bucket)
    shuffle, vectorized per-bucket cross+mask — then the pair stream is
    aggregated per band WITHOUT materializing it."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relops import range_join_bucketed

    def _vals(t: pa.Table) -> pa.Table:
        cents = np.asarray(
            _to_scaled_int(t["c_acctbal"], 100).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "v": pa.array(np.abs(cents) % 38500, pa.int64()),
            }
        )

    def _rng(t: pa.Table) -> pa.Table:
        pk = np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False))
        lo = (pk % 500) * 77
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(lo + 300, pa.int64()),
            }
        )

    vals = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        _vals, batch_format="pyarrow"
    )
    rng = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        _rng, batch_format="pyarrow"
    )
    pairs = range_join_bucketed(
        vals, rng, value_col="v", lo_col="lo", hi_col="hi", bucket_width=256
    )
    out = (
        pairs.groupby("p_partkey")
        .aggregate(Count(alias_name="n"), Sum("v", alias_name="sum_v"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_v"] = out["sum_v"].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def events_preceding_hour_counts(sf_dir: str) -> pd.DataFrame:
    """Event-time interval SELF-JOIN (stream-stream windowed-join shape,
    stages/relops.grouped_interval_count): per event, how many same-user
    events landed in the preceding hour [ts-1h, ts). One user-keyed
    shuffle; per group two vectorized searchsorted probes — the
    O(rows x window) pair list is never materialized."""
    from ..stages.relops import grouped_interval_count

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    out = (
        grouped_interval_count(
            ds.map_batches(_us, batch_format="pyarrow"),
            group_col="user_id",
            ts_col="ts_us",
            lo_offset=-3_600_000_000,
            hi_offset=0,
            out_col="n_prev_hour",
        )
        .select_columns(["event_id", "user_id", "n_prev_hour"])
        .to_pandas()
    )
    out["n_prev_hour"] = out["n_prev_hour"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_range_hour_sum(sf_dir: str) -> pd.DataFrame:
    """TIME-based moving aggregate (SQL RANGE frame,
    stages/relops.grouped_range_sum): per event, the sum of same-user
    event values over the trailing hour INCLUSIVE of ties — one keyed
    shuffle, per-group prefix sum + two searchsorted probes."""
    from ..stages.relops import grouped_range_sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value_u": _to_scaled_int(t["value"], 1_000_000),
            }
        )

    out = (
        grouped_range_sum(
            ds.map_batches(_prep, batch_format="pyarrow"),
            group_col="user_id",
            ts_col="ts_us",
            value_col="value_u",
            preceding=3_600_000_000,
            out_col="hour_sum_u",
        )
        .select_columns(["event_id", "user_id", "hour_sum_u"])
        .to_pandas()
    )
    out["hour_sum_u"] = out["hour_sum_u"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def user_funnel_stages(sf_dir: str) -> pd.DataFrame:
    """Ordered funnel (view → click → purchase) per user
    (stages/relops.grouped_funnel_stage): deepest stage reachable by a
    strictly-increasing-ts chain. The shuffle carries only deduplicated
    funnel-relevant (user, stage, ts) observations; users with no
    funnel-type events are absent by construction."""
    from ..stages.relops import grouped_funnel_stage

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def _us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    out = grouped_funnel_stage(
        ds.map_batches(_us, batch_format="pyarrow"),
        group_col="user_id",
        type_col="event_type",
        ts_col="ts_us",
        stages=["view", "click", "purchase"],
    ).to_pandas()
    out["funnel_stage"] = out["funnel_stage"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def funnel_conversion_rates(sf_dir: str) -> pd.DataFrame:
    """FUNNEL CONVERSION report: per stage of view → click → purchase,
    how many users' strictly-increasing chains reach it and the
    step-conversion rate from the previous stage — the product-analytics
    rollup over user_funnel_stages' per-user table.

    Scale plan: the same grouped_funnel_stage shuffle, but the per-user
    stage table NEVER reaches the driver — each batch collapses to an
    O(stages) histogram partial and one tiny groupby finishes; reach is
    the suffix sum Σ(stage ≥ s), conversion ONE double division of
    exact int64 counts per row."""
    from ray.data.aggregate import Sum

    from ..stages.relops import grouped_funnel_stage

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def _us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    staged = grouped_funnel_stage(
        ds.map_batches(_us, batch_format="pyarrow"),
        group_col="user_id",
        type_col="event_type",
        ts_col="ts_us",
        stages=["view", "click", "purchase"],
    )

    def _hist(t: pa.Table) -> pa.Table:
        s = np.asarray(
            t["funnel_stage"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        vals, cnts = np.unique(s, return_counts=True)
        return pa.table(
            {
                "stage": pa.array(vals),
                "n": pa.array(cnts.astype(np.int64)),
            }
        )

    hist = (
        staged.map_batches(_hist, batch_format="pyarrow")
        .groupby("stage")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = {int(r["stage"]): int(r["n"]) for _i, r in hist.iterrows()}
    total = sum(counts.values())
    stage_names = ["view", "click", "purchase"]
    rows = []
    prev_reach = total
    for s, name in enumerate(stage_names, start=1):
        reach = sum(n for st, n in counts.items() if st >= s)
        rows.append(
            {
                "stage": s,
                "stage_name": name,
                "n_reached": reach,
                "conv_from_prev": np.float64(reach) / np.float64(prev_reach),
            }
        )
        prev_reach = reach
    out = pd.DataFrame(rows)
    out["stage"] = out["stage"].astype("int64")
    out["n_reached"] = out["n_reached"].astype("int64")
    return out


def triangle_count_customers(sf_dir: str) -> pd.DataFrame:
    """Multi-way distributed self-join: triangle count of the undirected
    order-derived customer graph (same derivation as pagerank_customers).
    Plan: canonicalize edges (a < b) + distinct (one shuffle), wedge join
    E⋈E on the shared LOW endpoint (each triangle a<b<c is generated
    exactly once as the wedge (a,b)-(a,c)), then a LEFT SEMI hash join of
    the wedge's closing pair (b,c) against the edge set on a composite
    int64 key, and a scalar count. Wedge volume is sum-of-squares of
    "higher-neighbor" degrees — the canonical a<b orientation is the
    standard bound that keeps hub fan-out quadratic only in FORWARD
    degree. Composite key b*(M+1)+c needs M < ~3e9 (int64); shard the
    key at larger node-id domains."""
    from ray.data.aggregate import Count, Max

    from ..stages.graph import triangle_count

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        src = np.asarray(pc.cast(t["o_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False))
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = (okey % maxc) + 1
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    edges = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
    )
    n = triangle_count(edges, max_node_id=maxc)
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


def profile_orders_table(sf_dir: str) -> pd.DataFrame:
    """Single-pass data-quality profile of the orders table
    (stages/profile.profile_columns): per column n / nulls / min / max —
    one streaming pass, O(columns x blocks) combine rows, O(columns)
    driver state."""
    from ..stages.profile import profile_columns

    ds = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
    return profile_columns(
        ds,
        int_cols=["o_orderkey", "o_custkey"],
        str_cols=["o_orderstatus", "o_orderpriority"],
    )


def _partkey_bags(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_discount"])
    heavy = ds.map_batches(
        lambda t: pa.table(
            {"l_partkey": t.filter(pc.greater(t["l_quantity"], 25.0))["l_partkey"]}
        ),
        batch_format="pyarrow",
    )
    discounted = ds.map_batches(
        lambda t: pa.table(
            {"l_partkey": t.filter(pc.greater(t["l_discount"], 0.05))["l_partkey"]}
        ),
        batch_format="pyarrow",
    )
    return heavy, discounted


def except_all_parts(sf_dir: str) -> pd.DataFrame:
    """SQL EXCEPT ALL (bag difference) via stages/relops.bag_difference:
    per-key counts collapse BOTH sides before anything shuffles, one
    count-level left-outer hash join, vectorized row re-expansion to the
    result multiplicity."""
    from ..stages.relops import bag_difference

    heavy, discounted = _partkey_bags(sf_dir)
    out = bag_difference(
        heavy, discounted, key="l_partkey", how="except_all"
    ).to_pandas()
    return out.sort_values("l_partkey").reset_index(drop=True)


def intersect_all_parts(sf_dir: str) -> pd.DataFrame:
    """SQL INTERSECT ALL (bag intersection) — min of the per-key counts,
    same count-collapse-first shape as except_all_parts."""
    from ..stages.relops import bag_difference

    heavy, discounted = _partkey_bags(sf_dir)
    out = bag_difference(
        heavy, discounted, key="l_partkey", how="intersect_all"
    ).to_pandas()
    return out.sort_values("l_partkey").reset_index(drop=True)


# --- round-4: reorganize layout as an ORACLED query (J2+O3) ---------------


def reorganize_layout_suppliers(sf_dir: str) -> pd.DataFrame:
    """The full reorganize stage (name coalesce + sanitize + global dense
    cat enumeration + per-cat filename numbering, reorganize_dataset.py:
    37-161) run over REAL tables so its semantics are SQL-oracled instead
    of only test-pinned: nation = the docs side (cat_id, name), supplier =
    the images side (cat_id, seq=s_suppkey, img_url=s_name). Exercises the
    distributed dimension build (attach_dense_index), the size-routed
    name/index attach, and the bucket-vectorized labeling."""
    import ray.data as rd

    from ..stages.reorganize import reorganize

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    docs = nation.map_batches(
        lambda t: pa.table(
            {
                "cat_id": pc.cast(t["n_nationkey"], pa.string()),
                "name": pc.cast(t["n_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supplier = _read(sf_dir, "supplier", ["s_nationkey", "s_suppkey", "s_name"])
    images = supplier.map_batches(
        lambda t: pa.table(
            {
                "cat_id": pc.cast(t["s_nationkey"], pa.string()),
                "seq": pc.cast(t["s_suppkey"], pa.int64()),
                "img_url": pc.cast(t["s_name"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    out = reorganize(docs, images).to_pandas()
    return out.sort_values(["cat_id", "seq"]).reset_index(drop=True)


def chunk_docs_sliding(sf_dir: str) -> pd.DataFrame:
    """Sliding-window chunking (window=16 tokens, stride=12) — one row per
    chunk with its text and token count. Shuffle-free vectorized explode;
    SQL-oracled via list slicing + generate_series."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = textstats.chunk_documents(ds, window=16, stride=12).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def top_bigrams_docs(sf_dir: str) -> pd.DataFrame:
    """Top-20 adjacent-token bigrams by global count (bigram-ascending
    tie-break) — combiner-first partial counts, one small groupby."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textstats.top_bigrams(ds, k=20)


def hourly_active_users(sf_dir: str) -> pd.DataFrame:
    """Exact windowed COUNT(DISTINCT) — distinct users per epoch hour.

    The exact complement of the HLL sketch path
    (``distinct_tokens_per_lang``): batch-local (hour, user) dedup (an
    Arrow group_by, no Python rows) shrinks the exchange first, ONE
    pair-hash bucket shuffle finishes the global dedup and emits
    per-bucket (hour, partial) counts, and the final groupby moves only
    O(buckets x hours) partial rows. Python-call count is bounded by the
    bucket count, never by user or hour cardinality.
    """
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    num_buckets = 64

    def _pairs(t: pa.Table) -> pa.Table:
        for c in ("ts", "user_id"):
            if t[c].null_count:
                raise ValueError(
                    f"hourly_active_users: column {c!r} has nulls — a null "
                    "would corrupt the uint64 pair hash silently; drop or "
                    "fill upstream"
                )
        hour = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000), pa.int64()
        )
        pairs = (
            pa.table({"hour": hour, "user_id": t["user_id"]})
            .group_by(["hour", "user_id"])
            .aggregate([])
        )
        h = pairs["hour"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (h * np.uint64(0x9E3779B97F4A7C15)) ^ (
            u * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        b = ((mix >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _bucket_partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"hour": g["hour"], "user_id": g["user_id"]})
            .group_by(["hour", "user_id"])
            .aggregate([])
        )
        per_hour = distinct.group_by("hour").aggregate([("user_id", "count")])
        return pa.table(
            {
                "hour": per_hour["hour"],
                "partial": pc.cast(per_hour["user_id_count"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_bucket_partials, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("partial", alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("hour").reset_index(drop=True)


def lineitems_above_part_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated-aggregate join-back (TPC-H Q17 family): line items whose
    quantity strictly exceeds their part's mean quantity.

    The mean is a combiner-reduced (sum, count) groupby that moves
    O(parts) rows; the comparison ``qty * count > sum`` stays in exact
    int64 so Ray and DuckDB agree bit-for-bit with no float division
    anywhere. The attach back onto lineitem is size-routed on the part
    table's parquet metadata (the nation_revenue pattern): below the
    threshold the O(parts) aggregate broadcasts once and the corpus
    side never moves; above it (or for directory datasets whose
    metadata one read can't see) the distributed hash join keyed on
    the SAME partkey takes over.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import broadcast_join, hash_join

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "l_partkey": t["l_partkey"],
                "qty": _to_scaled_int(t["l_quantity"], 1),
            }
        )

    items = ds.map_batches(_prep, batch_format="pyarrow")
    stats = items.groupby("l_partkey").aggregate(
        Sum("qty", alias_name="s"), Count(alias_name="c")
    )
    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _BROADCAST_SIDE_ROUTE_ROWS:
        stats_tbl = pa.Table.from_pandas(
            stats.to_pandas(), preserve_index=False
        )
        joined = broadcast_join(items, stats_tbl, key="l_partkey")
    else:
        joined = hash_join(items, stats, key="l_partkey")

    def _keep_above(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(t["qty"], pc.cast(t["c"], pa.int64())),
            pc.cast(t["s"], pa.int64()),
        )
        kept = t.filter(keep)
        return kept.select(["l_orderkey", "l_linenumber", "l_partkey", "qty"])

    out = joined.map_batches(_keep_above, batch_format="pyarrow").to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(
        drop=True
    )


def median_price_per_nation(sf_dir: str) -> pd.DataFrame:
    """Grouped EXACT median over a continuous column: per-nation median
    order price in integer cents, plus the order count.

    Even-count groups return the midpoint of the two middle values —
    numpy and DuckDB both compute (lo + hi) / 2 in double, an exact IEEE
    halving of exact int64 cents, so the hash matches bit-for-bit.
    orders→customer is size-routed on customer's parquet metadata
    (nation_revenue pattern): a small customer table broadcasts once
    (zero-shuffle searchsorted attach), a big one takes the distributed
    hash join. The 25-row nation name attach is a plain broadcast dict;
    the median itself is ONE key-routed shuffle and a single lexsort +
    segment-midpoint pass per bucket (no per-key Python calls). Nations
    bound the key space here; for high-cardinality keys over discrete
    values the histogram quantile path
    (textstats.grouped_length_quantiles) is the scale tool — this query
    pins the sort-selection shape.
    """
    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import (
        _WB,
        _group_codes,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation_names = {
        int(k): v
        for k, v in zip(
            *pq.read_table(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).to_pydict().values()
        )
    }

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust_tbl = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        joined = broadcast_join(
            orders, cust_tbl, key="o_custkey", right_key="c_custkey"
        )
    else:
        joined = hash_join(
            orders, cust, key="o_custkey", right_key="c_custkey"
        )
    lut = np.empty(max(nation_names) + 1, dtype=object)
    for k, v in nation_names.items():
        lut[k] = v

    def _name(t: pa.Table) -> pa.Table:
        keys = np.asarray(
            t["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        return pa.table(
            {"n_name": pa.array(lut[keys], pa.string()), "cents": t["cents"]}
        )

    named = joined.map_batches(_name, batch_format="pyarrow")

    def _median(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "n_name")
        cents = _int64_nonull(g["cents"], "cents")
        order = np.lexsort((cents, codes))
        sc = codes[order]
        svals = cents[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = ends - starts
        lo = svals[starts + (n - 1) // 2].astype(np.float64)
        hi = svals[starts + n // 2].astype(np.float64)
        names = pc.take(
            g["n_name"].combine_chunks()
            if isinstance(g["n_name"], pa.ChunkedArray)
            else g["n_name"],
            pa.array(order[starts]),
        )
        return pa.table(
            {
                "n_name": names,
                "median_price_cents": pa.array((lo + hi) / 2.0),
                "n_orders": pa.array(n.astype(np.int64)),
            }
        )

    out = (
        _route_by_group(named, "n_name", 16)
        .groupby(_WB)
        .map_groups(_median, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("n_name").reset_index(drop=True)


def user_sessions(sf_dir: str) -> pd.DataFrame:
    """Full sessionization table (the session-id sibling of
    grouped_session_count): one row per (user, session) with the
    1-based session ordinal, event count, and session start/end in
    epoch micros; sessions split on a >1 h same-user gap. One
    hash-bucket shuffle; per bucket a single lexsort + vectorized
    boundary masks; output is O(sessions). Duplicate timestamps are
    order-safe on both sides (ties have gap 0)."""
    from ..stages.relops import grouped_sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "us": pc.cast(t["ts"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = grouped_sessionize(
        ds, group_col="user_id", ts_col="us", gap=3_600_000_000
    ).to_pandas()
    out = out.rename(columns={"start_ts": "start_us", "end_ts": "end_us"})
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def supplier_golden_records(sf_dir: str) -> pd.DataFrame:
    """SURVIVORSHIP / golden-record election over the fuzzy-name entity
    components: one row per resolved entity with the representative
    (lowest-key) member's name, the member count, and merged attributes
    (max balance in exact cents, distinct nations) — the step after
    entity resolution that every MDM/dedup pipeline ships.

    Scale plan (r4 weak CLOSED — this was a full-dim driver pull into a
    per-component Python loop): the heavy lift IS
    supplier_name_components (simjoin candidates → size-routed closure,
    its own oracle); the rollup now runs DISTRIBUTED via
    :func:`golden_records_rollup` — the dim is scanned as a Dataset
    (never materialized on the driver), the (s_suppkey → component) map
    attaches size-routed (broadcast ≤ _BROADCAST_SIDE_ROUTE_ROWS, else a
    string of the same hash_join the reorganize stage uses), and ONE
    _WB-bucketed groupby collapses each component with vectorized
    segment kernels (lexsort + reduceat; nunique via the distinct-pair
    mask). Only the O(components) report crosses the driver —
    bounded-driver-pinned by test_golden_rollup_bounded_driver."""
    comp = supplier_name_components(sf_dir)
    sup = _read(
        sf_dir,
        "supplier",
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    comp_tbl = pa.table(
        {
            "s_suppkey": pa.array(
                comp["s_suppkey"].to_numpy(dtype="int64"), pa.int64()
            ),
            "component": pa.array(
                comp["component"].to_numpy(dtype="int64"), pa.int64()
            ),
        }
    )
    return golden_records_rollup(sup, comp_tbl)


def golden_records_rollup(
    sup: "ray.data.Dataset",
    comp_tbl: pa.Table,
    *,
    broadcast_threshold: int | None = None,
) -> pd.DataFrame:
    """Distributed survivorship rollup: supplier dim Dataset ⋈ the
    (s_suppkey → component) membership table → one O(components) report
    row per entity (rep = min-key member's name, member count, max
    balance in cents, distinct nations). The dim streams; the membership
    attaches size-routed; the per-component math is one lexsort + three
    reduceat passes per hash bucket — no per-component Python, nothing
    dim-sized on the driver."""
    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import (
        _WB,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    thr = (
        _BROADCAST_SIDE_ROUTE_ROWS
        if broadcast_threshold is None
        else broadcast_threshold
    )

    def _prep(t: pa.Table) -> pa.Table:
        bal = np.asarray(
            t["s_acctbal"].to_numpy(zero_copy_only=False), dtype=np.float64
        )
        return pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": pc.cast(t["s_name"], pa.string()),
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "bal_c": pa.array(np.round(bal * 100.0).astype(np.int64)),
            }
        )

    dim = sup.map_batches(_prep, batch_format="pyarrow")
    if comp_tbl.num_rows <= thr:
        joined = broadcast_join(
            dim, comp_tbl, key="s_suppkey", how="inner"
        )
    else:
        joined = hash_join(
            dim,
            ray.data.from_arrow(comp_tbl),
            key="s_suppkey",
            how="inner",
        )

    def _roll(g: pa.Table) -> pa.Table:
        if _WB in g.column_names:
            g = g.drop_columns([_WB])
        comp = _int64_nonull(g["component"], "component")
        key = _int64_nonull(g["s_suppkey"], "s_suppkey")
        bal = _int64_nonull(g["bal_c"], "bal_c")
        nat = _int64_nonull(g["s_nationkey"], "s_nationkey")
        order = np.lexsort((key, comp))
        c, b = comp[order], bal[order]
        starts, ends, _, _ = _segment_bounds(c)
        names_col = g["s_name"]
        if isinstance(names_col, pa.ChunkedArray):
            names_col = names_col.combine_chunks()
        rep_names = pc.take(
            names_col, pa.array(order[starts], pa.int64())
        )
        order2 = np.lexsort((nat, comp))
        c2, nt2 = comp[order2], nat[order2]
        newpair = np.concatenate(
            [[True], (c2[1:] != c2[:-1]) | (nt2[1:] != nt2[:-1])]
        )
        starts2, _, _, _ = _segment_bounds(c2)
        return pa.table(
            {
                "component": pa.array(c[starts]),
                "rep_name": rep_names,
                "n_members": pa.array(
                    (ends - starts).astype(np.int64)
                ),
                "max_acctbal_cents": pa.array(
                    np.maximum.reduceat(b, starts)
                ),
                "n_nations": pa.array(
                    np.add.reduceat(newpair.astype(np.int64), starts2)
                ),
            }
        )

    out = (
        _route_by_group(joined, "component", 16)
        .groupby(_WB)
        .map_groups(_roll, batch_format="pyarrow")
        .to_pandas()
    )
    for c in ("component", "n_members", "max_acctbal_cents", "n_nations"):
        out[c] = out[c].astype("int64")
    return out.sort_values("component").reset_index(drop=True)


def session_length_histogram(sf_dir: str) -> pd.DataFrame:
    """COUNT-OF-COUNTS over sessionization: how many sessions contain
    each event count — the engagement-shape histogram (one-hit bounces
    vs long sessions), composing the sessionize kernel with the
    dup-cluster histogram pattern.

    Scale plan: the grouped_sessionize shuffle emits O(sessions) rows;
    each batch collapses to (n_events, count) partials and one tiny
    groupby finishes — the session table itself never reaches the
    driver."""
    from ray.data.aggregate import Sum

    from ..stages.relops import grouped_sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "us": pc.cast(t["ts"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    sess = grouped_sessionize(
        ds, group_col="user_id", ts_col="us", gap=3_600_000_000
    )

    def _hist(t: pa.Table) -> pa.Table:
        n = np.asarray(
            t["n_events"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        vals, cnts = np.unique(n, return_counts=True)
        return pa.table(
            {
                "session_events": pa.array(vals),
                "n_sessions": pa.array(cnts.astype(np.int64)),
            }
        )

    out = (
        sess.map_batches(_hist, batch_format="pyarrow")
        .groupby("session_events")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"))
        .to_pandas()
    )
    out["session_events"] = out["session_events"].astype("int64")
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("session_events").reset_index(drop=True)


def fk_coverage_audit(sf_dir: str) -> pd.DataFrame:
    """REFERENTIAL-INTEGRITY audit across every foreign-key relation in
    the corpus: per relation the child row count, distinct child keys,
    how many of those keys resolve in the parent, and the orphan row
    count — the cross-table consistency report a pipeline runs before
    trusting any join (the validate_orders_rules companion, one level
    up: across tables instead of within one).

    Scale plan: each child table is READ ONCE (blocks sized ~1M rows —
    tiny default blocks fragmented the shuffle into hundreds of
    near-empty sort tasks) and ONE np.unique pass per batch collapses
    ALL of its foreign keys to composite (rel << 48 | key, n) partials
    (lineitem carries three relations in a single scan and a single
    dedup); the four streams union into ONE groupby shuffle over a
    single int64 producing the O(distinct keys) rollup — row totals,
    distinct counts and orphan sums all come off that table, never the
    raw children. Parent keys
    (unique — primary keys by construction) attach size-routed: when
    every parent fits ≤ _BROADCAST_SIDE_ROUTE_ROWS they broadcast once
    as one dict of sorted arrays and a single searchsorted pass reduces
    each batch to four int64 partials per relation (whole audit = ONE
    union shuffle + one tiny groupby); any oversized parent takes a
    per-relation left_semi hash_join on its rollup slice instead.
    Orphan rows = Σn − Σn(matched), so no outer join and nothing
    row-shaped crosses the driver."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import hash_join

    relations = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
    ]
    by_child: dict[str, list[tuple[int, str]]] = {}
    for rid, (rel, child, ckey, _p, _pk) in enumerate(relations):
        by_child.setdefault(child, []).append((rid, ckey))

    from ..stages.relops import _WB

    def _tagged(rid_keys):
        # fused composite partial: ALL of a child's relations collapse in
        # ONE np.unique pass over (rel << 48 | key) — 4x faster per batch
        # than one Arrow group_by per relation, and the bucket routing
        # rides along so no separate _route pass exists (r4 bench audit)
        def _f(t: pa.Table) -> pa.Table:
            comps = []
            for rid, ckey in rid_keys:
                k = np.asarray(
                    pc.cast(t[ckey], pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                )
                if k.size and (k.max() >= 1 << 48 or k.min() < 0):
                    raise ValueError(
                        "fk_coverage_audit composite key needs "
                        "0 <= key < 2^48"
                    )
                comps.append((np.int64(rid) << np.int64(48)) | k)
            comp, cnt = np.unique(np.concatenate(comps), return_counts=True)
            h = (
                comp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ) >> np.uint64(33)
            return pa.table(
                {
                    "comp": pa.array(comp),
                    "n": pa.array(cnt.astype(np.int64)),
                    _WB: pa.array((h % np.uint64(64)).astype(np.int64)),
                }
            )

        return _f

    # partial blocks sized ~1M child rows (≈24 MB of (comp, n, _WB)):
    # the default small-file parallelism fragments the shuffle into
    # hundreds of near-empty sort tasks (6.6 s → 0.5 s at sf0.1); at
    # scale the count grows linearly with the table, never above the
    # per-block memory budget
    streams = [
        _read(
            sf_dir,
            child,
            sorted({ck for _r, ck in rks}),
            override_num_blocks=max(
                1, -(-_fact_rows(sf_dir, child) // 1_000_000)
            ),
        ).map_batches(_tagged(rks), batch_format="pyarrow")
        for child, rks in by_child.items()
    ]
    union = streams[0]
    for s in streams[1:]:
        union = union.union(s)

    parent_sizes = {}
    for _rel, _c, _ck, parent, _pk in relations:
        if parent in parent_sizes:
            continue
        parent_sizes[parent] = _fact_rows(sf_dir, parent)

    stats: dict[int, tuple[int, int, int, int]] = {}
    if all(v <= _BROADCAST_SIDE_ROUTE_ROWS for v in parent_sizes.values()):
        pk_arrays = {}
        for rid, (_rel, _c, _ck, parent, pkey) in enumerate(relations):
            pk_arrays[rid] = np.unique(
                pq.read_table(f"{sf_dir}/{parent}.parquet", columns=[pkey])[
                    pkey
                ].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        pk_ref = ray.put(pk_arrays)

        def _audit(g: pa.Table) -> pa.Table:
            pks = ray.get(pk_ref)
            s = (
                pa.table({"comp": g["comp"], "n": g["n"]})
                .group_by("comp")
                .aggregate([("n", "sum")])
            )
            comp = np.asarray(
                s["comp"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            n = np.asarray(
                s["n_sum"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            rel = comp >> np.int64(48)
            k = comp & np.int64((1 << 48) - 1)
            out = {c: [] for c in ("rel", "cr", "dk", "mk", "mr")}
            for rid in np.unique(rel):
                m = rel == rid
                p = pks[int(rid)]
                km, nm = k[m], n[m]
                pos = np.searchsorted(p, km)
                hit = (pos < len(p)) & (
                    p[np.minimum(pos, len(p) - 1)] == km
                )
                out["rel"].append(int(rid))
                out["cr"].append(int(nm.sum()))
                out["dk"].append(int(m.sum()))
                out["mk"].append(int(hit.sum()))
                out["mr"].append(int(nm[hit].sum()))
            return pa.table(
                {c: pa.array(np.asarray(v, dtype=np.int64))
                 for c, v in out.items()}
            )

        agg = (
            union.groupby(_WB)
            .map_groups(_audit, batch_format="pyarrow")
            .groupby("rel")
            .aggregate(
                Sum("cr", alias_name="cr"),
                Sum("dk", alias_name="dk"),
                Sum("mk", alias_name="mk"),
                Sum("mr", alias_name="mr"),
            )
            .to_pandas()
        )
        for _i, r in agg.iterrows():
            stats[int(r["rel"])] = (
                int(r["cr"]), int(r["dk"]), int(r["mk"]), int(r["mr"])
            )
    else:
        def _unpack(t: pa.Table) -> pa.Table:
            comp = np.asarray(
                t["comp"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            return pa.table(
                {
                    "rel": pa.array(comp >> np.int64(48)),
                    "k": pa.array(comp & np.int64((1 << 48) - 1)),
                    "n": t["n"],
                }
            )

        rollup = (
            union.map_batches(_unpack, batch_format="pyarrow")
            .groupby(["rel", "k"]).aggregate(Sum("n", alias_name="n"))
            .materialize()  # sliced per relation below
        )
        for rid, (_rel, _c, _ck, parent, pkey) in enumerate(relations):
            dk = rollup.filter(expr=f"rel == {rid}")
            tot = dk.aggregate(
                Sum("n", alias_name="cr"), Count(alias_name="dk")
            )
            cr, dcount = int(tot["cr"] or 0), int(tot["dk"])
            pks = _read(sf_dir, parent, [pkey]).map_batches(
                lambda t, pkey=pkey: pa.table(
                    {"pk": pc.cast(t[pkey], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            matched = hash_join(
                dk, pks, key="k", right_key="pk", how="left_semi"
            )
            magg = matched.aggregate(
                Sum("n", alias_name="mr"), Count(alias_name="mk")
            )
            mr = int(magg["mr"]) if magg["mr"] is not None else 0
            stats[rid] = (cr, dcount, int(magg["mk"]), mr)

    rows = []
    for rid, (rel, _c, _ck, _p, _pk) in enumerate(relations):
        cr, dcount, mk, mr = stats[rid]
        rows.append(
            {
                "relation": rel,
                "child_rows": cr,
                "distinct_child_keys": dcount,
                "matched_keys": mk,
                "orphan_rows": cr - mr,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("child_rows", "distinct_child_keys", "matched_keys",
              "orphan_rows"):
        out[c] = out[c].astype("int64")
    return out.sort_values("relation").reset_index(drop=True)


def validate_orders_rules(sf_dir: str) -> pd.DataFrame:
    """Data-quality gate (expectation suite over orders): per rule, the
    violation count, row count, and rate — ONE streaming pass emitting
    O(rules x blocks) partial rows (stages/profile.check_rules), the
    ingest-validation step a production pipeline runs before the
    expensive stages. Rules chosen to actually fire on TPC-H-shaped
    data so the oracle is non-trivial."""
    from ..stages.profile import check_rules

    ds = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"],
    )
    rules = {
        "orderdate_before_1998": lambda t: pc.less(
            t["o_orderdate"], pa.scalar(_dt.datetime(1998, 1, 1))
        ),
        "status_is_final": lambda t: pc.equal(t["o_orderstatus"], "F"),
        "totalprice_under_200k": lambda t: pc.less(
            t["o_totalprice"], 200_000.0
        ),
        "orderkey_positive": lambda t: pc.greater(
            t["o_orderkey"], pa.scalar(0, pa.int64())
        ),
    }
    return check_rules(ds, rules)


def embedding_norms(sf_dir: str) -> pd.DataFrame:
    """Vectorized list-column math (the multimodal/embedding column
    shape): per vector, its dimension and scaled-integer squared norm
    sum(round(x*1000)^2) — exact int64 on both sides, no float-sum
    order sensitivity. Zero-copy plan: ONE flatten of the Arrow list
    column + np.add.reduceat at the list offsets; no per-row Python, no
    shuffle at all."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _norms(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            raise ValueError(
                "embedding_norms: null embedding rows — SQL LEN(NULL) is "
                "NULL while the offsets path would silently report dim 0; "
                "drop or fill upstream"
            )
        flat = np.asarray(
            col.values.to_numpy(zero_copy_only=False), dtype=np.float64
        )
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.round(flat * 1000.0).astype(np.int64)
        qsq = q * q
        starts = offs[:-1]
        lens = (offs[1:] - starts).astype(np.int64)
        normsq = np.zeros(len(starts), dtype=np.int64)
        nonempty = lens > 0
        if nonempty.any():
            sums = np.add.reduceat(qsq, starts[nonempty])
            normsq[nonempty] = sums
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "dim": pa.array(lens),
                "normsq_milli": pa.array(normsq),
            }
        )

    out = ds.map_batches(_norms, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def connected_components_customers(sf_dir: str) -> pd.DataFrame:
    """Connected components as a first-class graph query: the dedup
    engine's min-label + pointer-jumping kernel
    (stages/dedup.components_label_propagation — O(log diameter) rounds
    of joins + groupbys, no node→label dict ever leaves the cluster)
    over a SPARSE deterministic order-derived graph (only orders with
    o_orderkey % 37 == 0 contribute an edge, so the component structure
    is non-trivial: many small components + isolated nodes). Isolated
    customers keep their own id via a left-outer attach.

    Size-routed on the EDGE count (the O(entities) payload here, never
    the node set): a small edge list union-finds on the driver and
    broadcasts the node→component map — every distributed round costs
    several fixed-latency stages, pure overhead on a 400-edge graph;
    big graphs take the distributed kernel, pinned by a route-forcing
    test. Oracle: DuckDB recursive transitive closure + MIN over
    reachable ids."""
    from ray.data.aggregate import Max

    from ..stages.dedup import components_label_propagation
    from ..stages.joins import broadcast_join, hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        keep = (okey % 37) == 0
        src = np.asarray(
            t["o_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )[keep]
        dst = (okey[keep] % maxc) + 1
        m = src != dst
        return pa.table(
            {"a": pa.array(src[m]), "b": pa.array(dst[m], type=pa.int64())}
        )

    pairs = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    ).materialize()  # O(edges), consumed by count + one compute path
    nodes = cust.map_batches(
        lambda t: pa.table({"node": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    return _attach_components(nodes, pairs)


def _attach_components(nodes, pairs) -> pd.DataFrame:
    """(node, component) for every node, where component = MIN id
    reachable over the (a, b) edge Dataset; isolated nodes keep their
    own id. Size-routed on the EDGE count: a small edge list union-finds
    on the driver and broadcasts the node→component map (distributed
    rounds are pure fixed latency on tiny graphs); big graphs take the
    dedup engine's min-label pointer-jumping kernel. ``pairs`` must be
    materialized (counted + consumed)."""
    from ..stages.dedup import components_label_propagation
    from ..stages.joins import broadcast_join, hash_join

    if pairs.count() <= _COMPONENTS_DRIVER_ROUTE_EDGES:
        df = pairs.to_pandas()
        parent: dict[int, int] = {}

        def _find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for x, y in zip(df["a"].to_numpy(), df["b"].to_numpy()):
            rx, ry = _find(int(x)), _find(int(y))
            if rx != ry:
                # keep the smaller id as root -> root == component min
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        touched = sorted(parent)
        comp_tbl = pa.table(
            {
                "doc_id": pa.array(touched, pa.int64()),
                "component": pa.array(
                    [_find(x) for x in touched], pa.int64()
                ),
            }
        )
        joined = broadcast_join(
            nodes, comp_tbl, key="node", right_key="doc_id", how="left_outer"
        )
    else:
        comp = components_label_propagation(pairs)
        joined = hash_join(
            nodes, comp, key="node", right_key="doc_id", how="left_outer"
        )

    def _fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "component": pc.coalesce(t["component"], t["node"]),
            }
        )

    out = joined.map_batches(_fill, batch_format="pyarrow").to_pandas()
    out["component"] = out["component"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def length_outlier_filter_docs(sf_dir: str) -> pd.DataFrame:
    """IQR outlier gate (winsorize-style corpus audit, composed from the
    exact-quantile machinery): keep docs whose word count lies in
    [q25 - IQR//4, q75 + IQR//4] (a deliberately tight band so the
    gate is non-trivial on the synthetic corpus), quartiles by the
    repo's nearest-rank
    floor((n-1)*q) convention — all integer math, so the SQL oracle is
    exact. Two streaming passes: the histogram-combine quantile pass
    (O(distinct lengths) driver) picks the bounds, then a vectorized
    filter pass re-streams the corpus; nothing O(corpus) materializes."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    qdf = textstats.length_quantiles(ds, q_pcts=(25, 75))
    q25, q75 = (int(v) for v in qdf.sort_values("q_pct")["n_words"])
    iqr = q75 - q25
    lo, hi = q25 - iqr // 4, q75 + iqr // 4

    def _keep(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t["text"], pa.string()), " ")
        n = pc.list_value_length(words)
        n = pc.cast(n, pa.int64())
        keep = pc.and_(
            pc.greater_equal(n, pa.scalar(lo, pa.int64())),
            pc.less_equal(n, pa.scalar(hi, pa.int64())),
        )
        out = pa.table({"doc_id": t["doc_id"], "n_words": n})
        return out.filter(keep)

    out = ds.map_batches(_keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_loss_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source duplicate attribution (the Common-Crawl dump-overlap
    audit, over the documents table's `source` dimension): for each
    source, total docs and how many a keep-first (min doc_id) PREFIX
    dedup — md5 of the first 8 normalized tokens, the cheap
    boilerplate-head collapse — would drop. ONE fingerprint-hash bucket shuffle
    (whole fp groups co-locate, so the global first is bucket-local);
    per bucket a single lexsort + boundary mask marks non-first rows and
    an Arrow group_by collapses to (source, n, dupes) partials; the
    finishing groupby moves O(buckets x sources) rows. Same
    normalization as exact_dedup_docs, truncated to the 8-token head
    (whole-text md5 finds zero dupes on this corpus — the near-dups
    share heads, so the prefix gate is the non-trivial audit)."""
    from ray.data.aggregate import Sum

    from ..functions import textkit

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def _fp(batch: pa.Table) -> pa.Table:
        import hashlib

        fps = [
            hashlib.md5(
                " ".join(
                    textkit.normalize_for_fingerprint(t or "").split(" ")[:8]
                ).encode("utf-8")
            ).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        fp_u64 = np.array([int(f[:16], 16) for f in fps], dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "fp_md5": pa.array(fps, pa.string()),
                "_p": pa.array((fp_u64 % np.uint64(64)).astype(np.int64)),
            }
        )

    def _partials(g: pa.Table) -> pa.Table:
        fps = np.asarray(g["fp_md5"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fps))
        sfp = fps[order]
        first = np.concatenate([[True], sfp[1:] != sfp[:-1]])
        is_dupe = np.zeros(len(ids), dtype=np.int64)
        is_dupe[order] = (~first).astype(np.int64)
        t = pa.table({"source": g["source"], "dupe": pa.array(is_dupe)})
        agg = t.group_by("source").aggregate(
            [("dupe", "sum"), ("dupe", "count")]
        )
        return pa.table(
            {
                "source": agg["source"],
                "n_dupes": pc.cast(agg["dupe_sum"], pa.int64()),
                "n_docs": pc.cast(agg["dupe_count"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(_fp, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_dupes", alias_name="n_dupes"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .to_pandas()
    )
    out["n_dupes"] = out["n_dupes"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return (
        out[["source", "n_docs", "n_dupes"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def supplier_count_by_brand_type(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type) — a
    multi-key COUNT(DISTINCT) AFTER a join. The part dimension attaches
    by the size-routed broadcast (corpus side never shuffles below the
    threshold; hash join above); the distinct count is the
    hourly_active_users machinery generalized to a composite group:
    batch-local (brand, type, supp) Arrow dedup, ONE triple-hash bucket
    shuffle, per-bucket partials, finishing groupby over
    O(buckets x groups) rows."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import _WB

    items = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _BROADCAST_SIDE_ROUTE_ROWS:
        part_tbl = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type"]
        )
        joined = broadcast_join(
            items, part_tbl, key="l_partkey", right_key="p_partkey"
        )
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type"])
        joined = hash_join(
            items, part_ds, key="l_partkey", right_key="p_partkey"
        )
    num_buckets = 64

    def _triples(t: pa.Table) -> pa.Table:
        trip = (
            pa.table(
                {
                    "p_brand": t["p_brand"],
                    "p_type": t["p_type"],
                    "supp": t["l_suppkey"],
                }
            )
            .group_by(["p_brand", "p_type", "supp"])
            .aggregate([])
        )
        import pandas.util as pdu

        h = (
            pdu.hash_array(
                np.asarray(trip["p_brand"].to_pylist(), dtype=object)
            )
            ^ pdu.hash_array(
                np.asarray(trip["p_type"].to_pylist(), dtype=object)
            )
            ^ (
                trip["supp"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
            )
        )
        return trip.append_column(
            _WB, pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def _partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table(
                {
                    "p_brand": g["p_brand"],
                    "p_type": g["p_type"],
                    "supp": g["supp"],
                }
            )
            .group_by(["p_brand", "p_type", "supp"])
            .aggregate([])
        )
        agg = distinct.group_by(["p_brand", "p_type"]).aggregate(
            [("supp", "count")]
        )
        return pa.table(
            {
                "p_brand": agg["p_brand"],
                "p_type": agg["p_type"],
                "partial": pc.cast(agg["supp_count"], pa.int64()),
            }
        )

    out = (
        joined.map_batches(_triples, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_partials, batch_format="pyarrow")
        .groupby(["p_brand", "p_type"])
        .aggregate(Sum("partial", alias_name="supplier_cnt"))
        .to_pandas()
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out.sort_values(["p_brand", "p_type"]).reset_index(drop=True)


def top_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Top-k per group with k>1 (the per-key head / QUALIFY ROW_NUMBER()
    <= k shape; reference analog: per-cat newest-first listing order,
    fetch_cat_detail_page.py): each customer's 3 most expensive orders.

    Scale design — relops.grouped_topk: every batch prunes to its LOCAL
    top-3 per customer before the single hash-bucket shuffle, so at most
    k rows per (batch, customer) move; the final merge is one vectorized
    lexsort + rank mask per bucket, never per-key Python. Prices compare
    in exact integer cents; ties break on o_orderkey so the kept set is
    deterministic on both sides.
    """
    from ..stages.relops import grouped_topk

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        cents = _to_scaled_int(t["o_totalprice"], 100)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": cents,
                "neg_cents": pc.multiply(cents, pa.scalar(-1, pa.int64())),
            }
        )

    out = grouped_topk(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="o_custkey",
        order_cols=["neg_cents", "o_orderkey"],
        k=3,
    ).to_pandas()
    return (
        out[["o_custkey", "o_orderkey", "price_cents"]]
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )


def custorder_count_distribution(sf_dir: str) -> pd.DataFrame:
    """Count-of-counts distribution (TPC-H Q13 shape): how many customers
    placed exactly N orders, INCLUDING the zero-order customers the left
    outer join preserves.

    Scale design: the corpus-sized side (orders) collapses to one
    combiner-reduced groupby count per customer BEFORE any join; the
    (custkey, n) table is size-routed — ``broadcast_join`` (left outer,
    one ray.put) while the customer dimension is <= _BROADCAST_SIDE_ROUTE_ROWS,
    the string-free int64 ``hash_join`` above it or when directory
    metadata is unreadable. The second groupby runs at the |distinct
    order counts| grain — metadata-sized.
    """
    from ray.data.aggregate import Count

    from ..stages.joins import broadcast_join, hash_join

    counts = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        counts_tbl = pa.Table.from_pandas(
            counts.to_pandas(), preserve_index=False
        )
        joined = broadcast_join(
            cust, counts_tbl, key="c_custkey", right_key="o_custkey",
            how="left_outer",
        )
    else:
        joined = hash_join(
            cust, counts, key="c_custkey", right_key="o_custkey",
            how="left_outer",
        )

    def _fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": pc.fill_null(
                    pc.cast(t["n"], pa.int64()), pa.scalar(0, pa.int64())
                )
            }
        )

    out = (
        joined.map_batches(_fill, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()
    )
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def rich_segment_summary(sf_dir: str) -> pd.DataFrame:
    """Scalar-aggregate broadcast into a filter (TPC-H Q22 family): per
    market segment, the customers whose balance strictly exceeds the
    mean POSITIVE balance. The mean never materializes as a float —
    the comparison is ``cents * n_pos > sum_pos_cents`` in exact int64,
    so Ray and DuckDB agree bit-for-bit (int64 headroom: cents x
    customer count must stay under 2**63 — ~10^12 customers at 10^6
    cents; assert-free by data contract).

    Scale shape: one combiner-reduced aggregate produces TWO scalars on
    the driver; they broadcast by closure capture into the filter pass
    (no shuffle, no join), then one groupby at the |segments| grain.
    """
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "cents": _to_scaled_int(t["c_acctbal"], 100),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    pos = prepped.map_batches(
        lambda t: t.filter(pc.greater(t["cents"], pa.scalar(0, pa.int64()))),
        batch_format="pyarrow",
    ).aggregate(Sum("cents", alias_name="sp"), Count(alias_name="np"))
    n_pos = int(pos["np"] or 0)
    if n_pos == 0:  # SQL: NULL comparison -> empty result
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype=object),
                "n_rich": pd.Series([], dtype="int64"),
                "total_cents": pd.Series([], dtype="int64"),
            }
        )
    sum_pos = int(pos["sp"])

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(
                pc.multiply(t["cents"], pa.scalar(n_pos, pa.int64())),
                pa.scalar(sum_pos, pa.int64()),
            )
        )

    out = (
        prepped.map_batches(_keep, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_rich"), Sum("cents", alias_name="total_cents")
        )
        .to_pandas()
    )
    out["n_rich"] = out["n_rich"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def pareto_parts(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier): parts no other part dominates,
    maximizing p_size while minimizing retail price (dominance = size >=
    AND price <= with at least one strict). The NOT EXISTS self-join the
    oracle runs is O(n^2); the engine never compares pairs.

    Scale design: ONE combiner-reduced groupby to per-size min price
    (O(|distinct sizes|) rows — p_size is a small-domain attribute; the
    driver suffix-min over it is metadata-sized), then the two frontier
    arrays broadcast by closure into a single vectorized filter pass
    (np.searchsorted per batch). A part survives iff it matches its
    size's min price AND every strictly larger size is strictly more
    expensive. Zero corpus shuffles, zero pair comparisons.
    """
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
                "price_cents": _to_scaled_int(t["p_retailprice"], 100),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    per_size = (
        prepped.groupby("p_size")
        .aggregate(Min("price_cents", alias_name="mn"))
        .to_pandas()
        .sort_values("p_size")
    )
    sizes = per_size["p_size"].to_numpy(dtype=np.int64)
    mn_eq = per_size["mn"].to_numpy(dtype=np.int64)
    # min price over all STRICTLY larger sizes (suffix min, exclusive)
    mn_gt = np.empty(len(sizes), dtype=np.int64)
    running = np.iinfo(np.int64).max
    for i in range(len(sizes) - 1, -1, -1):
        mn_gt[i] = running
        running = min(running, int(mn_eq[i]))

    def _keep(t: pa.Table) -> pa.Table:
        sz = np.asarray(t["p_size"].to_numpy(zero_copy_only=False))
        pr = np.asarray(t["price_cents"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(sizes, sz)
        keep = (pr == mn_eq[idx]) & (pr < mn_gt[idx])
        return t.filter(pa.array(keep))

    out = prepped.map_batches(_keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def event_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Keyed PERCENT_RANK window (relops.grouped_percent_rank): each
    event's value percentile among the same user's events, RANK tie
    semantics. One hash-bucket shuffle; the per-bucket kernel computes
    every user's tie-shared ranks in one lexsort + cumsum-gather, and
    the (rank-1)/(n-1) division is int64→float64 on both engines so the
    doubles match the SQL oracle bit-for-bit."""
    from ..stages.relops import grouped_percent_rank

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "micros": _to_scaled_int(t["value"], 1_000_000),
            }
        )

    out = grouped_percent_rank(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="user_id",
        value_col="micros",
        out_col="pr",
    ).to_pandas()
    return (
        out[["event_id", "pr"]].sort_values("event_id").reset_index(drop=True)
    )


def nation_supplier_names(sf_dir: str) -> pd.DataFrame:
    """Grouped STRING_AGG / collect-list aggregate
    (relops.grouped_string_agg): per nation, the sorted comma-joined
    supplier roster. The 25-row nation dimension broadcasts once
    (joins.broadcast_join); the aggregate itself is the inverted-index
    assembly pattern — one bucket shuffle, one list-offset binary_join
    per bucket, no per-key Python."""
    from ..stages.joins import broadcast_join
    from ..stages.relops import grouped_string_agg

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    nation_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    named = broadcast_join(
        supp, nation_tbl, key="s_nationkey", right_key="n_nationkey"
    )
    out = grouped_string_agg(
        named,
        group_col="n_name",
        value_col="s_name",
        sep=",",
        out_col="suppliers",
        count_col="n_supp",
    ).to_pandas()
    return out.sort_values("n_name").reset_index(drop=True)


def urgent_heavy_orders(sf_dir: str) -> pd.DataFrame:
    """EXISTS-subquery aggregate (TPC-H Q4 shape): orders from 1996Q1
    having at least one line item with quantity > 45, counted per
    priority. The qualifying-orderkey set stays distributed — a
    left-semi hash join (is_in mask per partition), never a driver set;
    the priority rollup is one combiner-reduced groupby."""
    from ray.data.aggregate import Count

    from ..stages.joins import hash_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    heavy = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.filter(
            pc.greater(t["l_quantity"], pa.scalar(45.0))
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    kept = hash_join(
        orders, heavy, key="o_orderkey", right_key="l_orderkey",
        how="left_semi",
    )
    out = (
        kept.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def unpivot_part_metrics(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT (wide -> long; the complement of pivot_priority_status):
    each part's (size, price_cents) pair becomes two (metric, value)
    rows. Pure batch-local reshape — every map_batches task emits its
    own long block via one concat of constant-tagged projections; zero
    shuffle, zero per-row Python."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _long(t: pa.Table) -> pa.Table:
        keys = t["p_partkey"]
        size = pc.cast(t["p_size"], pa.int64())
        cents = _to_scaled_int(t["p_retailprice"], 100)
        n = t.num_rows
        return pa.table(
            {
                "p_partkey": pa.concat_arrays(
                    [keys.combine_chunks(), keys.combine_chunks()]
                ),
                "metric": pa.concat_arrays(
                    [
                        pa.array(["size"] * n, pa.string()),
                        pa.array(["price_cents"] * n, pa.string()),
                    ]
                ),
                "value": pa.concat_arrays(
                    [size.combine_chunks(), cents.combine_chunks()]
                ),
            }
        )

    out = ds.map_batches(_long, batch_format="pyarrow").to_pandas()
    return out.sort_values(["p_partkey", "metric"]).reset_index(drop=True)


def top_unshipped_orders(sf_dir: str) -> pd.DataFrame:
    """Three-table join pipeline with aggregate + global top-k (TPC-H Q3
    shape): BUILDING-segment customers' orders placed before the cutoff,
    revenue of their line items shipped after it, top 10 by revenue.

    Scale plan, one streaming pass per table:
    - the segment-filtered customer KEY SET attaches to orders via a
      size-routed semi join — broadcast ``is_in`` while the customer
      dimension is <= _BROADCAST_SIDE_ROUTE_ROWS, distributed left-semi
      hash join above (no driver set at scale);
    - orders x lineitem is the big-big distributed ``hash_join`` on
      l_orderkey, both sides pre-filtered AND pre-projected at the read;
    - revenue is a combiner-reduced groupby in exact dmc units (x10^4,
      the q1 policy);
    - the global top-10 never sorts the corpus: each batch prunes to its
      local 10 by (revenue desc, orderkey), the driver merges O(10 x
      blocks) survivors.
    """
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join

    cutoff = _dt.datetime(1996, 6, 30)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(
            pc.equal(t["c_mktsegment"], "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        keys = pa.array(
            sorted(cust.to_pandas()["c_custkey"]), pa.int64()
        )
        orders = orders.map_batches(
            lambda t: t.filter(pc.is_in(t["o_custkey"], value_set=keys)),
            batch_format="pyarrow",
        )
    else:
        orders = hash_join(
            orders, cust, key="o_custkey", right_key="c_custkey",
            how="left_semi",
        )

    def _prep_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    # BUILDING-segment + date-filtered orders are ~1/5 of the table: above
    # the route threshold a bloom prefilter drops most items rows before
    # the big-big shuffle (below it the build barrier dominates)
    joined = hash_join(
        items,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        key="l_orderkey",
        right_key="o_orderkey",
        bloom_filter_left=(
            _fact_rows(sf_dir, "lineitem") > _BLOOM_PREFILTER_ROUTE_ROWS
        ),
    )
    rev = joined.groupby(["l_orderkey", "o_orderdate"]).aggregate(
        Sum("rev_dmc", alias_name="revenue_dmc")
    )

    def _local_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= 10:
            return t
        r = np.asarray(t["revenue_dmc"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False))
        order = np.lexsort((k, -r))[:10]
        return t.take(pa.array(order, pa.int64()))

    out = rev.map_batches(_local_top, batch_format="pyarrow").to_pandas()
    out["revenue_dmc"] = out["revenue_dmc"].astype("int64")
    out = out.sort_values(
        ["revenue_dmc", "l_orderkey"], ascending=[False, True]
    ).head(10)
    return out[["l_orderkey", "revenue_dmc", "o_orderdate"]].reset_index(
        drop=True
    )


def order_price_mad(sf_dir: str) -> pd.DataFrame:
    """Robust statistics (median absolute deviation) as a TWO-PASS exact
    composition of the histogram-combine quantile machinery: pass 1
    finds the exact price median, pass 2 the exact median of absolute
    deviations from it.

    All internal state is integer: the median is carried as 2x its
    value (lo+hi of the middle pair — no fractional midpoint exists),
    deviations as |2*cents - med2|, and the driver only ever sees the
    O(distinct prices) merged histograms, never the corpus. The two
    emitted doubles are power-of-two divisions of exact int64s, so
    DuckDB's MEDIAN() midpoints match bit-for-bit (the
    median_price_per_nation argument, applied twice).

    Driver-state bound: O(distinct cent values) per pass — bounded by
    the business price range (~10^7 rows worst case), not by corpus
    size. For a genuinely unbounded-domain signal swap each pass for a
    two-level refine (coarse bucket histogram -> exact scan of the one
    bucket holding the target rank); the median stays exact."""

    def _hist_median2(ds_vals, col: str) -> tuple[int, int]:
        """(2 x exact median, n) from a histogram-combine pass."""
        hist = (
            ds_vals.groupby(col)
            .sum("cnt")
            .to_pandas()
            .sort_values(col)
        )
        values = hist[col].to_numpy(dtype=np.int64)
        counts = hist["sum(cnt)"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1]) if len(cum) else 0
        if n == 0:
            return 0, 0
        lo = values[int(np.searchsorted(cum, (n - 1) // 2 + 1))]
        hi = values[int(np.searchsorted(cum, n // 2 + 1))]
        return int(lo) + int(hi), n

    def _partial(col_in: str, col_out: str, transform=None):
        def _f(t: pa.Table) -> pa.Table:
            arr = t[col_in].to_numpy(zero_copy_only=False).astype(np.int64)
            if transform is not None:
                arr = transform(arr)
            vals, cnts = np.unique(arr, return_counts=True)
            return pa.table(
                {
                    col_out: pa.array(vals, pa.int64()),
                    "cnt": pa.array(cnts.astype(np.int64)),
                }
            )

        return _f

    cents = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    )
    med2, n = _hist_median2(
        cents.map_batches(
            _partial("cents", "cents"), batch_format="pyarrow", batch_size=8192
        ),
        "cents",
    )
    if n == 0:
        return pd.DataFrame(
            {
                "median_cents": pd.Series([], dtype="float64"),
                "mad_cents": pd.Series([], dtype="float64"),
                "n_orders": pd.Series([], dtype="int64"),
            }
        )
    mad2x2, _ = _hist_median2(
        cents.map_batches(
            _partial("cents", "dev2", lambda a: np.abs(2 * a - med2)),
            batch_format="pyarrow",
            batch_size=8192,
        ),
        "dev2",
    )
    return pd.DataFrame(
        {
            "median_cents": [med2 / 2.0],
            "mad_cents": [mad2x2 / 4.0],
            "n_orders": [n],
        }
    )


def orders_by_dow(sf_dir: str) -> pd.DataFrame:
    """Date-part extraction aggregate (§2.8 date-function family beyond
    truncation): order count and exact cent volume per day-of-week.
    ``pc.day_of_week(count_from_zero=True, week_start=7)`` reproduces
    DuckDB's Sunday=0 ``dayofweek`` convention exactly; one
    combiner-reduced groupby at the 7-row grain, zero driver state."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dow": pc.cast(
                    pc.day_of_week(
                        t["o_orderdate"], count_from_zero=True, week_start=7
                    ),
                    pa.int64(),
                ),
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values("dow").reset_index(drop=True)


def local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """Five-table join pipeline (TPC-H Q5 shape): revenue per ASIA
    nation from 1995-1996 orders where the customer and the line item's
    supplier share the nation.

    Scale plan — one streaming pass per fact table, dims broadcast:
    - region->nation resolves driver-side (both are O(10^1) catalogs);
    - the customer (custkey -> nationkey) map is pre-filtered to ASIA
      and size-routed: broadcast lookup <= _BROADCAST_SIDE_ROUTE_ROWS,
      distributed hash_join above (no driver set at scale);
    - supplier (suppkey -> nationkey) is the classic broadcast dim;
    - orders x lineitem is the single big-big hash_join on orderkey,
      both sides pre-filtered AND pre-projected at the read;
    - the c_nation == s_nation predicate is a vectorized batch filter
      AFTER the join, and the 25-row-grain rollup is combiner-reduced.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import broadcast_join, hash_join

    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1997, 1, 1)
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia_keys = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    asia_nation = nation.filter(
        pc.is_in(nation["n_regionkey"], value_set=asia_keys.combine_chunks())
    )
    asia_nationkeys = pc.cast(asia_nation["n_nationkey"], pa.int64()).combine_chunks()

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    # customer dim, pre-filtered to ASIA nations: size-routed attach
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust = cust.filter(
            pc.is_in(pc.cast(cust["c_nationkey"], pa.int64()), value_set=asia_nationkeys)
        )
        cust = pa.table(
            {
                "c_custkey": pc.cast(cust["c_custkey"], pa.int64()),
                "cust_nat": pc.cast(cust["c_nationkey"], pa.int64()),
            }
        )
        orders = broadcast_join(orders, cust, key="o_custkey", right_key="c_custkey")
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                    "cust_nat": pc.cast(t["c_nationkey"], pa.int64()),
                }
            ).filter(
                pc.is_in(
                    pc.cast(t["c_nationkey"], pa.int64()), value_set=asia_nationkeys
                )
            ),
            batch_format="pyarrow",
        )
        orders = hash_join(orders, cust_ds, key="o_custkey", right_key="c_custkey")

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp = pa.table(
        {
            "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
            "supp_nat": pc.cast(supp["s_nationkey"], pa.int64()),
        }
    )
    supp = supp.filter(pc.is_in(supp["supp_nat"], value_set=asia_nationkeys))

    def _prep_items(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(_prep_items, batch_format="pyarrow")
    items = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")
    # the orders side is doubly selective (ASIA customers x date window):
    # above the route threshold, a bloom of its orderkeys prunes
    # non-matching items BEFORE the all-to-all (bit-identical — false
    # positives die at the stitch); below it the build barrier costs
    # more than the small shuffle it would save
    joined = hash_join(
        items, orders, key="l_orderkey", right_key="o_orderkey",
        bloom_filter_left=(
            _fact_rows(sf_dir, "lineitem") > _BLOOM_PREFILTER_ROUTE_ROWS
        ),
    )
    joined = joined.map_batches(
        lambda t: t.filter(pc.equal(t["cust_nat"], t["supp_nat"])),
        batch_format="pyarrow",
    )
    out = (
        joined.groupby("supp_nat")
        .aggregate(
            Sum("rev_dmc", alias_name="revenue_dmc"),
            Count(alias_name="n_items"),
        )
        .to_pandas()
    )
    names = {
        int(k): v
        for k, v in zip(
            asia_nation["n_nationkey"].to_pylist(), asia_nation["n_name"].to_pylist()
        )
    }
    out["n_name"] = out["supp_nat"].map(names)
    out["revenue_dmc"] = out["revenue_dmc"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out = out[["n_name", "revenue_dmc", "n_items"]]
    return out.sort_values("n_name").reset_index(drop=True)


def top_returning_customers(sf_dir: str) -> pd.DataFrame:
    """Returned-revenue-per-customer, top 20 (TPC-H Q10 shape):
    R-flagged line-item revenue of 1996H1 orders grouped by customer.

    Scale plan: both fact tables are pre-filtered and pre-projected at
    the read; orders x lineitem is a distributed hash_join; the
    per-customer rollup is combiner-reduced; and the global top-20
    never sorts the corpus — each batch prunes to its local 20 by
    (revenue desc, custkey), the driver merges O(20 x blocks)
    survivors and only then attaches the 20-row name/nation dressing
    via an is_in-filtered dimension read."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 7, 1)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    def _prep_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_dmc": _to_scaled_int(rev, 10_000)}
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    joined = hash_join(items, orders, key="l_orderkey", right_key="o_orderkey")
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_dmc", alias_name="revenue_dmc")
    )

    def _local_top(t: pa.Table) -> pa.Table:
        if t.num_rows <= 20:
            return t
        r = np.asarray(t["revenue_dmc"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False))
        order = np.lexsort((k, -r))[:20]
        return t.take(pa.array(order, pa.int64()))

    top = per_cust.map_batches(_local_top, batch_format="pyarrow").to_pandas()
    top["revenue_dmc"] = top["revenue_dmc"].astype("int64")
    top = top.sort_values(
        ["revenue_dmc", "o_custkey"], ascending=[False, True]
    ).head(20)
    keys = pa.array(sorted(top["o_custkey"].astype("int64")), pa.int64())
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(pc.cast(cust["c_custkey"], pa.int64()), value_set=keys)
    ).to_pandas()
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"o_custkey": "c_custkey_out"})
    out["c_custkey"] = out["c_custkey_out"].astype("int64")
    out = out[["c_custkey", "c_name", "n_name", "revenue_dmc"]]
    return out.sort_values(
        ["revenue_dmc", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)


def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Conditional-aggregate ratio over a dimension attach (TPC-H Q14
    shape): the share of 1996 line-item revenue earned by PROMO-type
    parts. The part dimension collapses to a PROMO key set, size-routed:
    <= _BROADCAST_SIDE_ROUTE_ROWS parts it broadcasts as one is_in
    value set (zero shuffle); above, a left-semi-tagged hash_join
    splits the stream. Both revenue sums are exact dmc integers; the
    share is one double division of two int64s, bit-identical on both
    sides."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def _prep_items(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        )
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(_prep_items, batch_format="pyarrow")

    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _BROADCAST_SIDE_ROUTE_ROWS:
        part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        promo_keys = pc.cast(
            part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"], pa.int64()
        ).combine_chunks()
        tagged = items.map_batches(
            lambda t: t.append_column(
                "promo_dmc",
                pc.if_else(
                    pc.is_in(t["l_partkey"], value_set=promo_keys),
                    t["rev_dmc"],
                    pa.scalar(0, pa.int64()),
                ),
            ),
            batch_format="pyarrow",
        )
    else:
        promo = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": pc.cast(
                        t.filter(pc.equal(t["p_type"], "PROMO"))["p_partkey"],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        promo_items = hash_join(
            items, promo, key="l_partkey", right_key="p_partkey", how="left_semi"
        ).map_batches(
            lambda t: t.append_column("promo_dmc", t["rev_dmc"]),
            batch_format="pyarrow",
        )
        rest = hash_join(
            items, promo, key="l_partkey", right_key="p_partkey", how="left_anti"
        ).map_batches(
            lambda t: t.append_column(
                "promo_dmc", pa.array([0] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
        tagged = promo_items.union(rest)

    agg = tagged.aggregate(
        Sum("promo_dmc", alias_name="promo_rev_dmc"),
        Sum("rev_dmc", alias_name="total_rev_dmc"),
    )
    promo_rev = int(agg["promo_rev_dmc"])
    total_rev = int(agg["total_rev_dmc"])
    return pd.DataFrame(
        {
            "promo_rev_dmc": [promo_rev],
            "total_rev_dmc": [total_rev],
            "promo_share_pct": [100.0 * promo_rev / total_rev],
        }
    )


def top_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Argmax-by-aggregate (TPC-H Q15 shape): the supplier(s) with the
    maximum 1996Q1 line-item revenue. One combiner-reduced groupby to
    the per-supplier grain, a streaming Ray max() over it (never
    driver-materialized), one vectorized equality filter, and an
    is_in-filtered dimension read for the O(winners) name attach —
    ties all surface, exactly like the oracle's = (SELECT MAX...)."""
    from ray.data.aggregate import Sum

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            )
        )
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    per_supp = (
        _read(
            sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(_prep, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_dmc", alias_name="total_revenue_dmc"))
    )
    best = per_supp.max("total_revenue_dmc")
    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["total_revenue_dmc"], pa.scalar(int(best)))),
        batch_format="pyarrow",
    ).to_pandas()
    winners["total_revenue_dmc"] = winners["total_revenue_dmc"].astype("int64")
    keys = pa.array(sorted(winners["l_suppkey"].astype("int64")), pa.int64())
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    supp = supp.filter(
        pc.is_in(pc.cast(supp["s_suppkey"], pa.int64()), value_set=keys)
    ).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out = out[["s_suppkey", "s_name", "total_revenue_dmc"]]
    return out.sort_values("s_suppkey").reset_index(drop=True)


def large_volume_orders(sf_dir: str) -> pd.DataFrame:
    """HAVING-gated aggregate join-back (TPC-H Q18 shape): orders whose
    total line-item quantity exceeds 300 units, with their customer.
    The per-order quantity rollup is combined per batch (Arrow group_by
    BEFORE the Ray shuffle) then combiner-reduced and gated; the gate
    output is O(qualifying orders) and size-routed — while it is <=
    _BROADCAST_SIDE_ROUTE_ROWS the orders attach is a zero-shuffle
    broadcast_join of the qualifying table, above it a distributed
    inner hash_join on orderkey; the customer name attach is
    size-routed the same way. All quantities are exact centi-units."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    def _precombine(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty_c": _to_scaled_int(t["l_quantity"], 100),
            }
        )
        gb = t.group_by("l_orderkey").aggregate([("qty_c", "sum")])
        # Arrow group_by emits keys LAST — rename by name, not position
        return gb.rename_columns(
            ["qty_c" if n == "qty_c_sum" else n for n in gb.column_names]
        )

    qual = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(_precombine, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty_c", alias_name="sum_qty_c"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["sum_qty_c"], pa.scalar(30_000))),
            batch_format="pyarrow",
        )
        .materialize()
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "totalprice_c": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    n_qual = qual.count()
    if n_qual <= _BROADCAST_SIDE_ROUTE_ROWS:
        if n_qual:
            qdf = qual.to_pandas()
            qual_t = pa.table(
                {
                    "l_orderkey": pa.array(
                        qdf["l_orderkey"].astype("int64"), pa.int64()
                    ),
                    "sum_qty_c": pa.array(
                        qdf["sum_qty_c"].astype("int64"), pa.int64()
                    ),
                }
            )
        else:  # 0-row Ray->pandas drops columns; build the typed empty
            qual_t = pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "sum_qty_c": pa.array([], pa.int64()),
                }
            )
        joined = broadcast_join(
            orders, qual_t, key="o_orderkey", right_key="l_orderkey"
        ).map_batches(
            lambda t: t.append_column(
                "l_orderkey", pc.cast(t["o_orderkey"], pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = hash_join(qual, orders, key="l_orderkey", right_key="o_orderkey")
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        cust = cust.set_column(
            0, "c_custkey", pc.cast(cust["c_custkey"], pa.int64())
        )
        named = broadcast_join(joined, cust, key="o_custkey", right_key="c_custkey")
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("c_custkey"),
                "c_custkey",
                pc.cast(t["c_custkey"], pa.int64()),
            ),
            batch_format="pyarrow",
        )
        named = hash_join(joined, cust_ds, key="o_custkey", right_key="c_custkey")
    out = named.to_pandas()
    out["c_custkey"] = out["o_custkey"].astype("int64")
    out["o_orderkey"] = out["l_orderkey"].astype("int64")
    out["sum_qty_c"] = out["sum_qty_c"].astype("int64")
    out["totalprice_c"] = out["totalprice_c"].astype("int64")
    out = out[
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate", "totalprice_c", "sum_qty_c"]
    ]
    return out.sort_values("o_orderkey").reset_index(drop=True)


def concurrent_activity_spans(sf_dir: str) -> pd.DataFrame:
    """Per user-day activity span (first..last event, closed interval),
    the COUNT of other user-day spans that overlap it in time — the
    interval self-join collapsed to linear output
    (:func:`..stages.relops.interval_overlap_counts`: the rank identity
    ``|starts <= e| - |ends < s| - 1`` answered by two searchsorteds, no
    pair ever materialized; size-routed driver lexsort vs bucketed rank
    shuffle). The spans themselves are a per-batch Arrow group_by partial
    + one combiner-reduced Min/Max groupby.

    Oracle: the O(n^2) inequality join (DuckDB IEJoin) aggregated to
    counts — LEFT join so zero-overlap spans keep n_overlap = 0."""
    from ray.data.aggregate import Max, Min

    from ..stages.relops import interval_overlap_counts

    _US_DAY = 86_400_000_000

    def _partials(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        g = (
            pa.table(
                {
                    "user_id": pc.cast(t["user_id"], pa.int64()),
                    "day": pc.divide(ts, pa.scalar(_US_DAY, pa.int64())),
                    "s": ts,
                    "e": ts,
                }
            )
            .group_by(["user_id", "day"])
            .aggregate([("s", "min"), ("e", "max")])
        )
        return g.rename_columns(["user_id", "day", "s", "e"])

    spans = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Min("s", alias_name="s"), Max("e", alias_name="e"))
    )
    out = interval_overlap_counts(
        spans, id_cols=["user_id", "day"], start_col="s", end_col="e"
    ).to_pandas()
    for c in ("user_id", "day", "n_overlap"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


def order_price_equiwidth_hist(sf_dir: str) -> pd.DataFrame:
    """Equal-WIDTH histogram of order value (32 bins spanning the exact
    observed [min, max] cents range) — the data-profiling complement of
    the group-by-value histogram (part_size_histogram) and the
    quantile (equal-depth) family: two passes, a Min/Max aggregate then
    a per-batch bin partial + one combiner-reduced groupby. All bin
    math is integer (``(cents - lo) * 32 // (hi - lo + 1)``), so the
    SQL oracle reproduces every boundary bit-for-bit."""
    from ray.data.aggregate import Max, Min, Sum

    NB = 32
    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    ).materialize()
    mm = ds.aggregate(Min("cents", alias_name="lo"), Max("cents", alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    span = hi - lo + 1

    def _bins(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cents"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b, n = np.unique((c - lo) * NB // span, return_counts=True)
        return pa.table(
            {"bin": pa.array(b.astype(np.int64)), "n": pa.array(n.astype(np.int64))}
        )

    out = (
        ds.map_batches(_bins, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    out["bin_lo_cents"] = lo + out["bin"].astype("int64") * span // NB
    for c in ("bin", "n_orders", "bin_lo_cents"):
        out[c] = out[c].astype("int64")
    return (
        out[["bin", "bin_lo_cents", "n_orders"]]
        .sort_values("bin")
        .reset_index(drop=True)
    )


def weighted_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic WEIGHTED sample (Efraimidis–Spirakis style, RNG-free):
    top-50 docs by the key ``md5_52bit(doc_id) / weight`` with weight =
    char length — long docs proportionally likelier, yet the selection is
    reproducible on every node/rerun like the repo's other hash samples.
    Exactness: the 52-bit hash and the weight are both exactly
    representable doubles, so the single IEEE division is bit-identical
    in numpy and DuckDB; ties are impossible across distinct doc_ids at
    equal keys only if hashes collide, and (key, doc_id) ordering pins
    the limit deterministically anyway. One streaming pass with a
    per-batch top-50 prune; the driver merges O(50 × blocks) rows."""
    from ..functions import textkit

    K = 50
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _keys(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        texts = t["text"].to_pylist()
        w = np.asarray([max(len(s or ""), 1) for s in texts], dtype=np.int64)
        h52 = textkit._md5_low64([str(int(i)) for i in ids]) >> np.uint64(12)
        key = h52.astype(np.float64) / w.astype(np.float64)
        order = np.lexsort((ids, key))[:K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "n_chars": pa.array(w[order]),
                "w_key": pa.array(key[order]),
            }
        )

    cand = ds.map_batches(_keys, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["w_key", "doc_id"]).head(K).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out


def event_type_trigrams(sf_dir: str) -> pd.DataFrame:
    """Second-order Markov transition counts: every consecutive
    (t1, t2, t3) event-type triple inside a user's (ts, event_id)-ordered
    stream — the sequence-mining extension of event_type_transitions.
    ONE user-hash bucket shuffle; per bucket one lexsort + two
    segment-masked shifts produce all triples vectorized, pre-reduced to
    (t1, t2, t3, partial n) inside the task, then one combiner-reduced
    groupby — no per-user Python, no driver state beyond the O(types^3)
    result grain."""
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB, _group_codes, _int64_nonull, _route_by_group

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    _EMPTY_TRI = pa.table(
        {
            "t1": pa.array([], pa.string()),
            "t2": pa.array([], pa.string()),
            "t3": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def _tri(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_WB])
        if g.num_rows < 3:
            return _EMPTY_TRI
        codes = _group_codes(g, "user_id")
        ts = _int64_nonull(pc.cast(g["ts"], pa.timestamp("us")).cast(pa.int64()), "ts")
        eid = _int64_nonull(g["event_id"], "event_id")
        order = np.lexsort((eid, ts, codes))
        c = codes[order]
        et = np.asarray(g["event_type"].to_numpy(zero_copy_only=False), dtype=object)[
            order
        ]
        same = c[2:] == c[:-2]  # codes sorted: endpoints equal => run equal
        if not same.any():
            return _EMPTY_TRI
        tbl = pa.table(
            {
                "t1": pa.array(et[:-2][same], pa.string()),
                "t2": pa.array(et[1:-1][same], pa.string()),
                "t3": pa.array(et[2:][same], pa.string()),
            }
        )
        part = tbl.group_by(["t1", "t2", "t3"]).aggregate([([], "count_all")])
        return part.rename_columns(["t1", "t2", "t3", "n"])

    out = (
        _route_by_group(ds, "user_id", 64)
        .groupby(_WB)
        .map_groups(_tri, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)


def event_type_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition counts (LAG window + rollup): for
    each user's event stream ordered by (ts, event_id), count every
    (previous type -> next type) pair across the corpus.

    Scale plan: :func:`..stages.relops.grouped_lag` co-locates each
    user inside a hash bucket of users (ONE shuffle, Python calls
    bounded by bucket count), computes LAG(event_type) with one lexsort
    + segment-masked take per bucket, and the O(types^2)-grain rollup
    is a combiner-reduced groupby — no driver state beyond the final
    transition matrix."""
    from ray.data.aggregate import Count

    from ..stages.relops import grouped_lag

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    lagged = grouped_lag(
        ds,
        group_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="event_type",
        out_col="prev_type",
    )
    out = (
        lagged.map_batches(
            lambda t: pa.table(
                {
                    "prev_type": t["prev_type"],
                    "next_type": t["event_type"],
                }
            ).filter(pc.is_valid(t["prev_type"])),
            batch_format="pyarrow",
        )
        .groupby(["prev_type", "next_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def user_retention_matrix(sf_dir: str) -> pd.DataFrame:
    """Cohort retention (the first-touch attribution shape): users
    bucketed by their first-event day, counted on every day they were
    active. Classic two-phase plan:

    - phase 1 collapses the corpus to one (user, cohort_day) row via a
      combiner-reduced MIN groupby (epoch-int day buckets);
    - phase 2 collapses it to distinct (user, activity_day) pairs the
      same way;
    - the cohort attach is size-routed on the measured cohort-table
      row count: <= _BROADCAST_SIDE_ROUTE_ROWS users it broadcasts the
      (user, cohort_day) table (zero extra shuffle), above that a
      distributed hash_join on user_id — and the final (cohort_day,
      activity_day) rollup is a combiner-reduced count.
    """
    from ray.data.aggregate import Count, Min

    from ..stages.joins import broadcast_join, hash_join

    us_per_day = 86_400_000_000

    def _days(t: pa.Table) -> pa.Table:
        epoch_us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.cast(pc.divide(epoch_us, us_per_day), pa.int64()),
            }
        )

    days = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        _days, batch_format="pyarrow"
    )
    cohort = days.groupby("user_id").aggregate(
        Min("day", alias_name="cohort_day")
    ).materialize()
    active = days.groupby(["user_id", "day"]).aggregate(Count(alias_name="_n"))
    if cohort.count() <= _BROADCAST_SIDE_ROUTE_ROWS:
        cdf = cohort.to_pandas()
        cohort_t = pa.table(
            {
                "user_id": pa.array(cdf["user_id"].astype("int64"), pa.int64()),
                "cohort_day": pa.array(
                    cdf["cohort_day"].astype("int64"), pa.int64()
                ),
            }
        )
        joined = broadcast_join(
            active.select_columns(["user_id", "day"]), cohort_t, key="user_id"
        )
    else:
        joined = hash_join(
            active.select_columns(["user_id", "day"]),
            cohort,
            key="user_id",
            right_key="user_id",
        )
    out = (
        joined.groupby(["cohort_day", "day"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out = out.rename(columns={"day": "activity_day"})
    out["cohort_day"] = out["cohort_day"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    out = out[["cohort_day", "activity_day", "n_users"]]
    return out.sort_values(["cohort_day", "activity_day"]).reset_index(drop=True)


def first_last_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Boundary-row window aggregate (FIRST/LAST OVER a total order):
    each user's first and last event type by (ts, event_id), plus their
    event count — :func:`..stages.relops.grouped_first_last`, one
    hash-bucket shuffle and one lexsort + two segment-boundary takes
    per bucket; output is O(users)."""
    from ..stages.relops import grouped_first_last

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out = grouped_first_last(
        ds,
        group_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="event_type",
        first_col="first_type",
        last_col="last_type",
        count_col="n_events",
    ).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def nation_trade_matrix(sf_dir: str) -> pd.DataFrame:
    """International trade volume (TPC-H Q7 generalized): revenue per
    (supplier nation, customer nation, ship year) for every CROSS-nation
    pair.

    Scale plan (r4 rework): the orders -> customer-nation map is the
    SMALL side. Below the size route it is built driver-side in one
    vectorized searchsorted pass (O(orders) int64s, ~16 bytes/row) and
    broadcast, so the lineitem corpus streams ONCE with ZERO shuffles —
    supplier and order attaches are broadcast lookups and every batch
    pre-aggregates to the O(nations^2 x years) grain before one tiny
    groupby. Above the route (orders or customer > threshold) the
    distributed plan runs: size-routed customer attach, big-big
    hash_join on orderkey, then the SAME batch partial aggregation so
    the final all-to-all moves O(grain x blocks) rows, not the joined
    corpus."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    names = {
        int(k): v
        for k, v in zip(
            nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()
        )
    }

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp = pa.table(
        {
            "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
            "supp_nat": pc.cast(supp["s_nationkey"], pa.int64()),
        }
    )

    def _prep_items(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    def _partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["supp_nat"], t["cust_nat"]))
        t = pa.table(
            {
                "supp_nat": pc.cast(t["supp_nat"], pa.int64()),
                "cust_nat": pc.cast(t["cust_nat"], pa.int64()),
                "l_year": pc.cast(t["l_year"], pa.int64()),
                "rev_dmc": pc.cast(t["rev_dmc"], pa.int64()),
            }
        )
        g = t.group_by(["supp_nat", "cust_nat", "l_year"]).aggregate(
            [("rev_dmc", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "supp_nat": g["supp_nat"],
                "cust_nat": g["cust_nat"],
                "l_year": g["l_year"],
                "rev": pc.cast(g["rev_dmc_sum"], pa.int64()),
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    items = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")

    n_cust = _fact_rows(sf_dir, "customer")
    n_ord = _fact_rows(sf_dir, "orders")

    if max(n_cust, n_ord) <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        ckey = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cnat = np.asarray(cust["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ckey, kind="stable")
        ckey, cnat = ckey[order], cnat[order]
        otbl = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        okey = np.asarray(otbl["o_orderkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ocust = np.asarray(otbl["o_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        orders_map = pa.table(
            {
                "o_orderkey": pa.array(okey),
                "cust_nat": pa.array(cnat[np.searchsorted(ckey, ocust)]),
            }
        )
        joined = broadcast_join(
            items, orders_map, key="l_orderkey", right_key="o_orderkey"
        )
    else:
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
            cust = pq.read_table(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
            )
            cust = pa.table(
                {
                    "c_custkey": pc.cast(cust["c_custkey"], pa.int64()),
                    "cust_nat": pc.cast(cust["c_nationkey"], pa.int64()),
                }
            )
            orders = broadcast_join(
                orders, cust, key="o_custkey", right_key="c_custkey"
            )
        else:
            cust_ds = _read(
                sf_dir, "customer", ["c_custkey", "c_nationkey"]
            ).map_batches(
                lambda t: pa.table(
                    {
                        "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                        "cust_nat": pc.cast(t["c_nationkey"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            orders = hash_join(orders, cust_ds, key="o_custkey", right_key="c_custkey")
        orders = orders.select_columns(["o_orderkey", "cust_nat"])
        joined = hash_join(items, orders, key="l_orderkey", right_key="o_orderkey")

    out = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby(["supp_nat", "cust_nat", "l_year"])
        .aggregate(
            Sum("rev", alias_name="revenue_dmc"),
            Sum("n", alias_name="n_items"),
        )
        .to_pandas()
    )
    out["supp_nation"] = out["supp_nat"].map(names)
    out["cust_nation"] = out["cust_nat"].map(names)
    out["revenue_dmc"] = out["revenue_dmc"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    out = out[["supp_nation", "cust_nation", "l_year", "revenue_dmc", "n_items"]]
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)


def brand_discount_revenue(sf_dir: str) -> pd.DataFrame:
    """Disjunctive multi-predicate revenue (TPC-H Q19 shape): revenue
    from line items matching any of three (brand, size range, quantity
    range) clauses. The part dimension is pre-filtered to the three
    brands and size-routed — broadcast (partkey -> brand, size) lookup
    below the threshold, distributed inner hash_join above; the clause
    mask is one vectorized Arrow expression either way."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import hash_join

    CLAUSES = [
        ("Brand#12", 1, 15, 1.0, 11.0),
        ("Brand#23", 1, 25, 10.0, 20.0),
        ("Brand#3", 1, 35, 20.0, 30.0),
    ]
    brands = pa.array([c[0] for c in CLAUSES], pa.string())

    def _mask(t: pa.Table) -> pa.Array:
        m = None
        for brand, size_lo, size_hi, qty_lo, qty_hi in CLAUSES:
            clause = pc.and_(
                pc.and_(
                    pc.equal(t["p_brand"], brand),
                    pc.and_(
                        pc.greater_equal(t["p_size"], pa.scalar(size_lo)),
                        pc.less_equal(t["p_size"], pa.scalar(size_hi)),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(t["l_quantity"], pa.scalar(qty_lo)),
                    pc.less_equal(t["l_quantity"], pa.scalar(qty_hi)),
                ),
            )
            m = clause if m is None else pc.or_(m, clause)
        return m

    def _prep_items(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "l_quantity": t["l_quantity"],
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(_prep_items, batch_format="pyarrow")

    n_parts = _fact_rows(sf_dir, "part")
    if n_parts <= _BROADCAST_SIDE_ROUTE_ROWS:
        from ..stages.joins import broadcast_join

        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
        )
        part = part.filter(pc.is_in(part["p_brand"], value_set=brands))
        part = part.set_column(
            0, "p_partkey", pc.cast(part["p_partkey"], pa.int64())
        )
        joined = broadcast_join(items, part, key="l_partkey", right_key="p_partkey")
    else:
        def _brand_dim(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["p_brand"], value_set=brands))
            return pa.table(
                {
                    "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                    "p_brand": t["p_brand"],
                    "p_size": t["p_size"],
                }
            )

        part_ds = _read(
            sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
        ).map_batches(_brand_dim, batch_format="pyarrow")
        joined = hash_join(items, part_ds, key="l_partkey", right_key="p_partkey")
    kept = joined.map_batches(
        lambda t: t.filter(_mask(t)), batch_format="pyarrow"
    )
    agg = kept.aggregate(
        Sum("rev_dmc", alias_name="revenue_dmc"), Count(alias_name="n_items")
    )
    return pd.DataFrame(
        {
            "revenue_dmc": [int(agg["revenue_dmc"] or 0)],
            "n_items": [int(agg["n_items"] or 0)],
        }
    )


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroids (the k-means M-step as a
    standalone operator): exact mean of every embedding dimension per
    label. Per batch, the list column flattens zero-copy to one value
    array, per-row scaled-int conversion (x10^6 — float32 values are
    exact in float64) and ONE np.add.at into a dense (labels-in-batch x
    dims) partial matrix; each batch emits O(labels x dims) partial
    rows and a small groupby merges them. The corpus never shuffles;
    driver sees only the final (labels x dims)-grain table."""
    from ray.data.aggregate import Sum

    def _partials(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        offsets = emb.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        vals = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64)
        scaled = np.rint(vals * 1_000_000.0).astype(np.int64)
        dims = np.arange(len(vals), dtype=np.int64) - np.repeat(
            offsets[:-1], lens
        )
        ulab, codes = np.unique(labels, return_inverse=True)
        ndim = int(lens.max()) if len(lens) else 0
        sums = np.zeros((len(ulab), ndim), dtype=np.int64)
        cnts = np.zeros((len(ulab), ndim), dtype=np.int64)
        flat_codes = np.repeat(codes, lens) * ndim + dims
        np.add.at(sums.reshape(-1), flat_codes, scaled)
        np.add.at(cnts.reshape(-1), flat_codes, 1)
        lab_out = np.repeat(ulab, ndim)
        dim_out = np.tile(np.arange(ndim, dtype=np.int64), len(ulab))
        return pa.table(
            {
                "label": pa.array(lab_out, pa.int64()),
                "dim": pa.array(dim_out, pa.int64()),
                "sum_scaled": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(cnts.reshape(-1), pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_scaled", alias_name="sum_scaled"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["sum_scaled"] = out["sum_scaled"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["mean_scaled"] = out["sum_scaled"] / out["n"]
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


def winsorized_mean_price(sf_dir: str) -> pd.DataFrame:
    """Robust mean (5/95 winsorize) from ONE histogram-combine pass:
    per batch the price cents collapse to (value, count) partials, a
    single small groupby merges them, and the driver derives the exact
    nearest-rank p05/p95 AND the winsorized sum from the same merged
    histogram — clipping is a vectorized clip over O(distinct cents)
    rows, so no second corpus pass (unlike order_price_mad, whose
    second pass re-keys by a value computed from the first).

    Driver-state bound: O(distinct cent values) — the order_price_mad
    argument. The emitted mean is one double division of exact int64s.
    Nearest-rank convention floor((n-1)*q/100), matching
    doc_length_quantiles' oracle arithmetic."""

    def _partial(t: pa.Table) -> pa.Table:
        arr = _to_scaled_int(t["o_totalprice"], 100).to_numpy(
            zero_copy_only=False
        )
        vals, cnts = np.unique(arr, return_counts=True)
        return pa.table(
            {
                "cents": pa.array(vals, pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    hist = (
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("cents")
        .sum("cnt")
        .to_pandas()
        .sort_values("cents")
    )
    values = hist["cents"].to_numpy(dtype=np.int64)
    counts = hist["sum(cnt)"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pd.DataFrame(
            {
                "p05_cents": pd.Series([], dtype="int64"),
                "p95_cents": pd.Series([], dtype="int64"),
                "winsorized_sum_cents": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "winsorized_mean_cents": pd.Series([], dtype="float64"),
            }
        )
    p05 = int(values[int(np.searchsorted(cum, (n - 1) * 5 // 100 + 1))])
    p95 = int(values[int(np.searchsorted(cum, (n - 1) * 95 // 100 + 1))])
    clipped = np.clip(values, p05, p95)
    wsum = int(np.dot(clipped, counts))
    return pd.DataFrame(
        {
            "p05_cents": [p05],
            "p95_cents": [p95],
            "winsorized_sum_cents": [wsum],
            "n_orders": [n],
            "winsorized_mean_cents": [wsum / n],
        }
    )


def source_quality_report(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus profile (the data-curation dashboard shape):
    document count, exact total token count, mean tokens, and each
    source's share of the corpus. One streaming tokenize pass
    (textstats.add_token_counts — the doc_token_counts kernel), one
    combiner-reduced groupby at the O(sources) grain; the share
    denominator comes from the result itself, no second pass."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = (
        add_token_counts(ds)
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="total_tokens"),
        )
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_tokens"] = out["total_tokens"].astype("int64")
    out["mean_tokens"] = out["total_tokens"] / out["n_docs"]
    out["doc_share"] = out["n_docs"] / int(out["n_docs"].sum())
    out = out[["source", "n_docs", "total_tokens", "mean_tokens", "doc_share"]]
    return out.sort_values("source").reset_index(drop=True)


def events_daily_top_user(sf_dir: str) -> pd.DataFrame:
    """Per-day argmax user by exact total event value (the leaderboard
    shape): rollup to the (day, user) grain first (combiner-reduced —
    the corpus never reaches the window kernel), then
    :func:`..stages.relops.grouped_topk` with k=1 ordered by
    (-total, user) — deterministic min-user tie-break, batch-local
    prune before the one bucket shuffle."""
    from ray.data.aggregate import Sum

    from ..stages.relops import grouped_topk

    us_per_day = 86_400_000_000

    def _prep(t: pa.Table) -> pa.Table:
        epoch_us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "day": pc.cast(pc.divide(epoch_us, us_per_day), pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "value_u": _to_scaled_int(t["value"], 1_000_000),
            }
        )

    per_user_day = (
        _read(sf_dir, "events", ["ts", "user_id", "value"])
        .map_batches(_prep, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Sum("value_u", alias_name="total_u"))
        .map_batches(
            lambda t: t.append_column(
                "neg_total_u", pc.multiply(t["total_u"], pa.scalar(-1))
            ),
            batch_format="pyarrow",
        )
    )
    out = grouped_topk(
        per_user_day,
        group_col="day",
        order_cols=["neg_total_u", "user_id"],
        k=1,
    ).to_pandas()
    out["total_u"] = out["total_u"].astype("int64")
    out = out[["day", "user_id", "total_u"]]
    return out.sort_values("day").reset_index(drop=True)


def order_price_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact p50/p90/p99 of order price cents through the
    UNBOUNDED-DOMAIN quantile path
    (:func:`..stages.textstats.bucketed_exact_quantiles`): a coarse
    2^16-bucket histogram locates each target rank's bucket, one refine
    pass resolves the exact value inside only those buckets — driver
    state is bounded by the bucket count + slice widths, never by the
    domain's distinct-value count (the scale fallback the dense
    histogram queries document). Same nearest-rank convention as
    doc_length_quantiles."""
    from ..stages.textstats import bucketed_exact_quantiles

    cents = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    )
    out = bucketed_exact_quantiles(cents, "cents", (50, 90, 99))
    return out.rename(columns={"value": "price_cents"})


def regional_market_share(sf_dir: str) -> pd.DataFrame:
    """Share-within-group conditional ratio (TPC-H Q8 shape): for
    AMERICA-region customers' line items, the fraction of each ship
    year's revenue supplied by the region's alphabetically-first nation
    (data-derived, so the query is self-contained at any corpus). Same
    dim plan as the trade matrix — region/nation driver-side, customer
    map size-routed, supplier broadcast — then ONE big-big hash join
    and a per-year rollup carrying (target, total) exact-dmc sums; the
    share is one double division per year row."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    am_keys = region.filter(pc.equal(region["r_name"], "AMERICA"))["r_regionkey"]
    am_nation = nation.filter(
        pc.is_in(nation["n_regionkey"], value_set=am_keys.combine_chunks())
    )
    am_nationkeys = pc.cast(am_nation["n_nationkey"], pa.int64()).combine_chunks()
    names = sorted(am_nation["n_name"].to_pylist())
    target_name = names[0]
    target_key = int(
        am_nation.filter(pc.equal(am_nation["n_name"], target_name))[
            "n_nationkey"
        ][0].as_py()
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust = cust.filter(
            pc.is_in(pc.cast(cust["c_nationkey"], pa.int64()), value_set=am_nationkeys)
        )
        keys = pc.cast(cust["c_custkey"], pa.int64()).combine_chunks()
        orders = orders.map_batches(
            lambda t: t.filter(
                pc.is_in(pc.cast(t["o_custkey"], pa.int64()), value_set=keys)
            ).select(["o_orderkey"]),
            batch_format="pyarrow",
        )
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda t: pa.table(
                {"c_custkey": pc.cast(t["c_custkey"], pa.int64())}
            ).filter(
                pc.is_in(
                    pc.cast(t["c_nationkey"], pa.int64()), value_set=am_nationkeys
                )
            ),
            batch_format="pyarrow",
        )
        orders = hash_join(
            orders, cust_ds, key="o_custkey", right_key="c_custkey",
            how="left_semi",
        ).select_columns(["o_orderkey"])

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp = pa.table(
        {
            "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
            "supp_nat": pc.cast(supp["s_nationkey"], pa.int64()),
        }
    )

    def _prep_items(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev_dmc": _to_scaled_int(rev, 10_000),
            }
        )

    items = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(_prep_items, batch_format="pyarrow")
    items = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")
    joined = hash_join(items, orders, key="l_orderkey", right_key="o_orderkey")
    tagged = joined.map_batches(
        lambda t: pa.table(
            {
                "l_year": t["l_year"],
                "rev_dmc": t["rev_dmc"],
                "target_dmc": pc.if_else(
                    pc.equal(t["supp_nat"], pa.scalar(target_key)),
                    t["rev_dmc"],
                    pa.scalar(0, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = (
        tagged.groupby("l_year")
        .aggregate(
            Sum("target_dmc", alias_name="target_rev_dmc"),
            Sum("rev_dmc", alias_name="total_rev_dmc"),
        )
        .to_pandas()
    )
    out["target_rev_dmc"] = out["target_rev_dmc"].astype("int64")
    out["total_rev_dmc"] = out["total_rev_dmc"].astype("int64")
    out["market_share"] = out["target_rev_dmc"] / out["total_rev_dmc"]
    out = out[["l_year", "target_rev_dmc", "total_rev_dmc", "market_share"]]
    return out.sort_values("l_year").reset_index(drop=True)


def lang_confusion_matrix(sf_dir: str) -> pd.DataFrame:
    """Label-vs-prediction confusion matrix (the model-eval rollup over
    the n-gram language detector): declared lang x predicted lang
    counts. One streaming langid pass (the langid_docs kernel), one
    combiner-reduced groupby at the O(langs^2) grain."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = (
        add_lang_pred(ds)
        .groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def customer_order_gaps(sf_dir: str) -> pd.DataFrame:
    """Inter-event gap statistics per key (repeat-purchase cadence):
    LAG on each customer's order days, then exact gap sums — customers
    with a single order drop out (no gap exists). grouped_lag's one
    bucket shuffle + a combiner-reduced per-customer rollup; the mean
    is one double division of exact int64s."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relops import grouped_lag

    us_per_day = 86_400_000_000
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "day": pc.cast(
                    pc.divide(pc.cast(t["o_orderdate"], pa.int64()), us_per_day),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    lagged = grouped_lag(
        ds,
        group_col="o_custkey",
        order_cols=["day", "o_orderkey"],
        value_col="day",
        out_col="prev_day",
    )
    gaps = lagged.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "gap_days": pc.subtract(t["day"], t["prev_day"]),
            }
        ).filter(pc.is_valid(t["prev_day"])),
        batch_format="pyarrow",
    )
    out = (
        gaps.groupby("o_custkey")
        .aggregate(
            Count(alias_name="n_gaps"),
            Sum("gap_days", alias_name="total_gap_days"),
        )
        .to_pandas()
    )
    out["n_gaps"] = out["n_gaps"].astype("int64")
    out["total_gap_days"] = out["total_gap_days"].astype("int64")
    out["mean_gap_days"] = out["total_gap_days"] / out["n_gaps"]
    out = out[["o_custkey", "n_gaps", "total_gap_days", "mean_gap_days"]]
    return out.sort_values("o_custkey").reset_index(drop=True)


def token_count_estimates(sf_dir: str) -> pd.DataFrame:
    """Count-min-sketch point frequencies (the fixed-memory complement
    of the exact heavy-hitter pass): estimate the corpus counts of the
    exact phi=1/50 frequent tokens from a (4 x 2^16) CMS built in one
    streaming pass (per-batch matrix partials, driver sums O(blocks)
    matrices — never O(vocabulary)).

    Rows-only (the sketch is approximate by construction, like the HLL
    entries) — but self-guarded: the CMS one-sided contract
    (estimate >= exact, always) is ASSERTED in-query against the exact
    recount, so a broken sketch fails loudly rather than hiding behind
    the driver's rows-only check."""
    from ..stages.heavyhitters import heavy_hitter_tokens as _hh
    from ..stages.sketch import cms_build, cms_estimate

    ds = _read(sf_dir, "documents", ["text"])
    exact = _hh(ds, text_col="text", k=50).to_pandas()

    def _tokens(t: pa.Table) -> pa.Table:
        # exactly heavyhitters._batch_tokens' stream (tokens_ws parity)
        trimmed = pc.utf8_trim_whitespace(pc.cast(t["text"], pa.string()))
        toks = pc.list_flatten(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"tok": toks})

    tok_ds = ds.map_batches(_tokens, batch_format="pyarrow")
    sk = cms_build(tok_ds, "tok", width_log2=16, depth=4)
    est = cms_estimate(sk, list(exact["token"]), width_log2=16)
    out = exact.copy()
    out["cms_estimate"] = est.astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    assert (out["cms_estimate"] >= out["cnt"]).all(), (
        "CMS one-sided contract violated"
    )
    out = out[["token", "cnt", "cms_estimate"]]
    return out.sort_values("token").reset_index(drop=True)


def bfs_distances_customers(sf_dir: str) -> pd.DataFrame:
    """BFS shortest-path levels (iterative graph class, the frontier
    shape the crawl engine runs): minimum hop count <= 10 from the
    lowest customer key over a sparse deterministic order-derived
    directed graph (only o_orderkey % 7 == 0 contributes an edge, so
    the level structure spans all ten hops).

    Size-routed on EDGE count exactly like connected components: small
    edge lists BFS on the driver (np.isin per level — distributed
    rounds are pure fixed latency there); big graphs run
    :func:`..stages.graph.bfs_levels` (per hop: edge-corpus semi-join
    against the frontier, dedup groupby, anti-join vs visited — the
    frontier and visited sets never leave the cluster), pinned by a
    kernel parity test (test_bfs_distributed_kernel_parity — forcing
    the full 10-hop query distributed is ~20 shuffles of pure fixed
    latency at test scale). Oracle: bounded recursive CTE + MIN."""
    from ray.data.aggregate import Max, Min

    from ..stages.graph import bfs_levels, bfs_levels_driver

    cust = _read(sf_dir, "customer", ["c_custkey"])
    agg = cust.aggregate(
        Max("c_custkey", alias_name="mx"), Min("c_custkey", alias_name="mn")
    )
    maxc, source = int(agg["mx"]), int(agg["mn"])

    def _edges(t: pa.Table) -> pa.Table:
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        keep = (okey % 7) == 0
        src = np.asarray(
            t["o_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )[keep]
        dst = (okey[keep] % maxc) + 1
        m = src != dst
        return pa.table(
            {"src": pa.array(src[m]), "dst": pa.array(dst[m], type=pa.int64())}
        )

    edges = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    ).materialize()  # O(edges); consumed by count + one BFS path
    if edges.count() <= _COMPONENTS_DRIVER_ROUTE_EDGES:
        ep = edges.to_pandas()
        if len(ep) == 0:
            return pd.DataFrame(
                {"node": pd.Series([source], dtype="int64"),
                 "dist": pd.Series([0], dtype="int64")}
            )
        out = bfs_levels_driver(
            ep["src"].to_numpy(dtype="int64"),
            ep["dst"].to_numpy(dtype="int64"),
            source,
            max_hops=10,
        )
    else:
        out = bfs_levels(edges, source, max_hops=10)
    return out


def nation_price_qty_corr(sf_dir: str) -> pd.DataFrame:
    """Per-nation Pearson correlation between line-item price and
    quantity — the exact-integer-moments aggregate family (moments
    beyond sum/count: sum_xy / sum_x2 / sum_y2 in one pass).

    Scale plan: the supplier (suppkey -> nationkey) dim attaches
    size-routed (broadcast <= _BROADCAST_SIDE_ROUTE_ROWS, hash_join
    above); each batch pre-aggregates ALL SIX moments per nation with
    one Arrow group_by, so the exchange moves O(nations x blocks) rows
    and the final groupby is trivial. x is price in whole dollars
    (FLOOR — unambiguous on doubles, unlike ROUND's half-tie split
    between Arrow half-to-even and DuckDB half-away), bounding
    sum(x^2) at ~10^10 per row: int64-safe to ~10^8 rows per nation
    (document bound; beyond that drop x to hundreds of dollars). The
    final correlation is ONE identically-parenthesized double formula
    over the exact integer sums on both sides, so Ray and DuckDB agree
    bit-for-bit."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    items = _read(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_quantity"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "x": pc.cast(pc.floor(t["l_extendedprice"]), pa.int64()),
                "y": pc.cast(pc.floor(t["l_quantity"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    n_supp = _fact_rows(sf_dir, "supplier")
    if n_supp <= _BROADCAST_SIDE_ROUTE_ROWS:
        supp = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        supp = pa.table(
            {
                "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
                "nat": pc.cast(supp["s_nationkey"], pa.int64()),
            }
        )
        tagged = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")
    else:
        supp_ds = _read(
            sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
        ).map_batches(
            lambda t: pa.table(
                {
                    "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                    "nat": pc.cast(t["s_nationkey"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        tagged = hash_join(items, supp_ds, key="l_suppkey", right_key="s_suppkey")

    def _moment_partials(t: pa.Table) -> pa.Table:
        x, y = t["x"], t["y"]
        m = pa.table(
            {
                "nat": t["nat"],
                "n1": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sx": x,
                "sy": y,
                "sxy": pc.multiply(x, y),
                "sxx": pc.multiply(x, x),
                "syy": pc.multiply(y, y),
            }
        )
        return m.group_by("nat").aggregate(
            [(c, "sum") for c in ("n1", "sx", "sy", "sxy", "sxx", "syy")]
        ).rename_columns(["nat", "n1", "sx", "sy", "sxy", "sxx", "syy"])

    moments = (
        tagged.map_batches(_moment_partials, batch_format="pyarrow")
        .groupby("nat")
        .aggregate(*[
            Sum(c, alias_name=c)
            for c in ("n1", "sx", "sy", "sxy", "sxx", "syy")
        ])
        .to_pandas()
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nation["n_nationkey"] = nation["n_nationkey"].astype("int64")
    out = moments.merge(
        nation, left_on="nat", right_on="n_nationkey", how="inner"
    )
    n = out["n1"].to_numpy(dtype="float64")
    sx = out["sx"].to_numpy(dtype="float64")
    sy = out["sy"].to_numpy(dtype="float64")
    sxy = out["sxy"].to_numpy(dtype="float64")
    sxx = out["sxx"].to_numpy(dtype="float64")
    syy = out["syy"].to_numpy(dtype="float64")
    # identical parse tree to the SQL oracle — bit-identical doubles
    corr = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    res = pd.DataFrame(
        {
            "n_name": out["n_name"],
            "n_items": out["n1"].astype("int64"),
            "corr_pq": corr,
        }
    )
    return res.sort_values("n_name").reset_index(drop=True)


def sliding_active_users(sf_dir: str) -> pd.DataFrame:
    """Exact SLIDING-window COUNT(DISTINCT): distinct users active in
    the 3-hour window ending at each event hour — the overlapping-window
    complement of ``hourly_active_users`` (tumbling).

    Each batch dedups (hour, user) pairs locally, EXPLODES each pair to
    the <=3 window ends it contributes to (hour .. hour+2), re-dedups,
    and ships pair-hash-bucketed rows exactly like the tumbling path:
    ONE shuffle whose payload is O(3 x distinct pairs), never raw
    events. Per-bucket dedup + partial counts, then an O(buckets x
    windows) groupby. The final restriction to windows whose end hour
    actually has events merges two already-reduced O(hours) tables on
    the driver (documented bound: the dataset's hour span)."""
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    num_buckets = 64
    width = 3

    def _pairs(t: pa.Table) -> pa.Table:
        for c in ("ts", "user_id"):
            if t[c].null_count:
                raise ValueError(
                    f"sliding_active_users: column {c!r} has nulls — a null "
                    "would corrupt the uint64 pair hash silently"
                )
        hour = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000), pa.int64()
        )
        pairs = (
            pa.table({"hour": hour, "user_id": t["user_id"]})
            .group_by(["hour", "user_id"])
            .aggregate([])
        )
        h = pairs["hour"].to_numpy(zero_copy_only=False)
        u = pairs["user_id"].to_numpy(zero_copy_only=False)
        win = np.concatenate([h + off for off in range(width)])
        usr = np.tile(u, width)
        ex = (
            pa.table({"win": pa.array(win), "user_id": pa.array(usr)})
            .group_by(["win", "user_id"])
            .aggregate([])
        )
        wv = ex["win"].to_numpy(zero_copy_only=False).astype(np.uint64)
        uv = ex["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (wv * np.uint64(0x9E3779B97F4A7C15)) ^ (
            uv * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        b = ((mix >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int64)
        return ex.append_column(_WB, pa.array(b))

    def _bucket_partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"win": g["win"], "user_id": g["user_id"]})
            .group_by(["win", "user_id"])
            .aggregate([])
        )
        per_win = distinct.group_by("win").aggregate([("user_id", "count")])
        return pa.table(
            {
                "win": per_win["win"],
                "partial": pc.cast(per_win["user_id_count"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_bucket_partials, batch_format="pyarrow")
        .groupby("win")
        .aggregate(Sum("partial", alias_name="n_users"))
        .to_pandas()
    )
    hours = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "win": pc.unique(
                        pc.cast(
                            pc.divide(
                                pc.cast(t["ts"], pa.int64()), 3_600_000_000
                            ),
                            pa.int64(),
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("win")
        .count()
        .to_pandas()[["win"]]
    )
    out = counts.merge(hours, on="win", how="inner")
    out["win"] = out["win"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("win").reset_index(drop=True)


def late_supplier_share(sf_dir: str) -> pd.DataFrame:
    """Suppliers who shipped late inside multi-supplier orders (TPC-H
    Q21 family): among orders touching >= 2 distinct suppliers, per
    supplier the count of its line items shipped more than 60 days
    after the order date, plus its total items in such orders —
    suppliers with at least one late item, by name.

    Scale plan, three bounded exchanges: (1) the multi-supplier order
    set comes from batch-local (orderkey, suppkey) dedup + ONE
    orderkey-hash bucket shuffle (per-bucket distinct-supplier counts —
    the hourly_active_users machinery keyed on the order); (2) the
    O(multi orders) keyset picks up o_orderdate by filtering the orders
    scan against it and attaches to lineitem size-routed (broadcast
    <= _BROADCAST_SIDE_ROUTE_ROWS, big-big orderkey hash_join above,
    pinned by the route-forcing test); (3) per-supplier late/total
    counts are a combiner-reduced groupby, and only the O(suppliers)
    result ever reaches the driver. Lateness compares raw int64
    microsecond timestamps — no float dates anywhere."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import _WB

    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    num_buckets = 64

    def _pairs(t: pa.Table) -> pa.Table:
        pairs = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([])
        )
        o = pairs["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((o * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _multi_orders(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"o": g["l_orderkey"], "s": g["l_suppkey"]})
            .group_by(["o", "s"])
            .aggregate([])
        )
        cnt = distinct.group_by("o").aggregate([("s", "count")])
        keep = cnt.filter(pc.greater_equal(cnt["s_count"], pa.scalar(2)))
        return pa.table({"mo_orderkey": keep["o"]})

    multi = (
        items.map_batches(_pairs, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_multi_orders, batch_format="pyarrow")
        .materialize()  # O(multi orders); consumed by count + one join path
    )

    def _order_dates(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mo_orderkey": t["o_orderkey"],
                "odate": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        _order_dates, batch_format="pyarrow"
    )
    if multi.count() <= _BROADCAST_SIDE_ROUTE_ROWS:
        keyset = pa.Table.from_pandas(multi.to_pandas(), preserve_index=False)
        dated = broadcast_join(orders, keyset, key="mo_orderkey")
        tagged = broadcast_join(
            items,
            pa.Table.from_pandas(dated.to_pandas(), preserve_index=False),
            key="l_orderkey",
            right_key="mo_orderkey",
        )
    else:
        dated = hash_join(orders, multi, key="mo_orderkey", how="left_semi")
        tagged = hash_join(items, dated, key="l_orderkey", right_key="mo_orderkey")

    sixty_days_us = 60 * 86_400 * 1_000_000

    def _late_partials(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        late = pc.cast(
            pc.greater(ship, pc.add(t["odate"], pa.scalar(sixty_days_us))),
            pa.int64(),
        )
        return pa.table(
            {"l_suppkey": pc.cast(t["l_suppkey"], pa.int64()), "late": late}
        )

    per_supp = (
        tagged.map_batches(_late_partials, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("late", alias_name="n_late"), Count(alias_name="n_total"))
        .to_pandas()
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    supp["s_suppkey"] = supp["s_suppkey"].astype("int64")
    out = per_supp.merge(
        supp, left_on="l_suppkey", right_on="s_suppkey", how="inner"
    )
    out = out[out["n_late"] > 0][["s_name", "n_late", "n_total"]]
    out["n_late"] = out["n_late"].astype("int64")
    out["n_total"] = out["n_total"].astype("int64")
    return out.sort_values("s_name").reset_index(drop=True)


def event_value_cume_dist(sf_dir: str) -> pd.DataFrame:
    """Keyed CUME_DIST window (relops.grouped_cume_dist): each event's
    cumulative distribution position among the same user's values, tie
    rows sharing the count at their run's end. One hash-bucket shuffle;
    the <=-count / n division is int64->float64 on both engines so the
    doubles match the SQL oracle bit-for-bit."""
    from ..stages.relops import grouped_cume_dist

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "micros": _to_scaled_int(t["value"], 1_000_000),
            }
        )

    out = grouped_cume_dist(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="user_id",
        value_col="micros",
        out_col="cd",
    ).to_pandas()
    return (
        out[["event_id", "cd"]].sort_values("event_id").reset_index(drop=True)
    )


def customer_order_dense_rank(sf_dir: str) -> pd.DataFrame:
    """Keyed DENSE_RANK window (relops.grouped_dense_rank): each
    order's gap-free price rank within its customer — the k-th distinct
    total gets rank k. One hash-bucket shuffle, one lexsort + two
    cumsum gathers per bucket; all-int64, so ranks are exact."""
    from ..stages.relops import grouped_dense_rank

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    out = grouped_dense_rank(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="o_custkey",
        value_col="cents",
        out_col="dr",
    ).to_pandas()
    return (
        out[["o_orderkey", "dr"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def event_value_stddev_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-event-type sample standard deviation of the event value —
    the second-moment member of the exact-integer-moments family
    (nation_price_qty_corr carries the cross moments; this is the
    classic Welford-free two-sum path).

    Each batch pre-aggregates (n, sum, sum-of-squares) per type in
    integer CENTS with one Arrow group_by, so the exchange moves
    O(types x blocks) rows. cents^2 tops out ~2.4e9 for this domain,
    keeping the squared sum int64-safe to ~10^9 rows per type
    (documented bound; drop to whole units past that). The final
    sqrt((n*sxx - sx^2) / (n*(n-1))) is one identically-parenthesized
    double formula over exact integer sums on both sides — and the
    cents->units rescale divides by the exact double 100.0*100.0 INSIDE
    the sqrt, so Ray and DuckDB agree bit-for-bit."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _moments(t: pa.Table) -> pa.Table:
        cents = _to_scaled_int(t["value"], 100)
        m = pa.table(
            {
                "event_type": t["event_type"],
                "n1": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sx": cents,
                "sxx": pc.multiply(cents, cents),
            }
        )
        return (
            m.group_by("event_type")
            .aggregate([(c, "sum") for c in ("n1", "sx", "sxx")])
            .rename_columns(["event_type", "n1", "sx", "sxx"])
        )

    out = (
        ds.map_batches(_moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n1", "sx", "sxx")])
        .to_pandas()
    )
    n = out["n1"].to_numpy(dtype="float64")
    sx = out["sx"].to_numpy(dtype="float64")
    sxx = out["sxx"].to_numpy(dtype="float64")
    # identical parse tree to the SQL oracle — bit-identical doubles
    sd = np.sqrt((n * sxx - sx * sx) / (n * (n - 1)) / (100.0 * 100.0))
    res = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n_events": out["n1"].astype("int64"),
            "sd_value": sd,
        }
    )
    return res.sort_values("event_type").reset_index(drop=True)


def event_type_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-occurrence matrix: for every unordered pair of
    event types, how many users performed BOTH — the association-rule /
    co-engagement primitive (baskets = users, items = event types).

    Scale plan: batch-local (user, type) dedup, ONE user-hash bucket
    shuffle (a user's whole basket lands in one bucket, so bucket
    partials are disjoint user counts). Per bucket the basket is a
    BITMASK: one lexsort + np.bitwise_or.reduceat folds each user's
    types into a uint64, and each type pair is one vectorized
    mask-test over users — O(users x T^2) bit ops, no pair-row
    explosion ever materializes. T > 63 distinct types raises loudly
    (this operator targets low-cardinality taxonomies; shard the mask
    past that). Final groupby sums O(buckets x T^2) partial rows."""
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    num_buckets = 64

    def _pairs(t: pa.Table) -> pa.Table:
        for c in ("user_id", "event_type"):
            if t[c].null_count:
                raise ValueError(f"event_type_cooccurrence: nulls in {c!r}")
        pairs = (
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]})
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        u = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _cooccur(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"u": g["user_id"], "ty": g["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        ty = distinct["ty"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        enc = ty.dictionary_encode()
        names = enc.dictionary.to_pylist()
        if len(names) > 63:
            raise ValueError(
                f"event_type_cooccurrence: {len(names)} distinct types in "
                "one bucket exceeds the 63-bit basket mask — shard the mask "
                "or switch to pair expansion for high-cardinality taxonomies"
            )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = distinct["u"].to_numpy(zero_copy_only=False)
        order = np.argsort(users, kind="stable")
        u_s, c_s = users[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], u_s[1:] != u_s[:-1]])
        )
        masks = np.bitwise_or.reduceat(
            np.uint64(1) << c_s.astype(np.uint64), starts
        )
        rows_a, rows_b, rows_n = [], [], []
        # T^2/2 vectorized mask tests (T <= 63); never a pair-row blowup
        for i in range(len(names)):
            bit_i = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(names)):
                n = int(
                    (bit_i & ((masks >> np.uint64(j)) & np.uint64(1))).sum()
                )
                if n:
                    a, b = sorted((names[i], names[j]))
                    rows_a.append(a)
                    rows_b.append(b)
                    rows_n.append(n)
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    out = (
        ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_cooccur, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def supplier_copart_pairs(sf_dir: str) -> pd.DataFrame:
    """Bipartite projection: supplier pairs weighted by the number of
    distinct parts both have shipped (lineitem as the part-supplier
    incidence list) — the co-supply / co-purchase graph builder. Pairs
    sharing >= 2 parts survive.

    Scale plan: batch-local (part, supplier) dedup, ONE part-hash
    bucket shuffle; per bucket a second dedup, one lexsort by (part,
    supplier) and the triangle kernel's run-length forward-pair
    expansion (element at within-run position t pairs with the L-1-t
    after it — all np.repeat/arange, no per-part Python). Pairs
    collapse to a composite int64 key (a*2^32+b, suppkey < 2^31
    asserted) and pre-aggregate per bucket, so the final exchange
    carries O(qualifying pairs x buckets) rows, never the raw pair
    stream. Hot parts (huge supplier lists) are the documented skew
    risk: expansion is quadratic in ONE part's supplier count."""
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB

    items = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    num_buckets = 64

    def _dedup(t: pa.Table) -> pa.Table:
        pairs = (
            pa.table(
                {
                    "p": pc.cast(t["l_partkey"], pa.int64()),
                    "s": pc.cast(t["l_suppkey"], pa.int64()),
                }
            )
            .group_by(["p", "s"])
            .aggregate([])
        )
        p = pairs["p"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((p * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _expand(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"p": g["p"], "s": g["s"]}).group_by(["p", "s"]).aggregate([])
        )
        p = distinct["p"].to_numpy(zero_copy_only=False)
        s = distinct["s"].to_numpy(zero_copy_only=False)
        if len(s) and int(s.max()) >= 2**31:
            raise ValueError("supplier_copart_pairs: suppkey >= 2^31 breaks "
                             "the composite pair key — widen to two columns")
        o = np.lexsort((s, p))
        p_s, s_s = p[o], s[o]
        newrun = np.concatenate([[True], p_s[1:] != p_s[:-1]])
        starts = np.flatnonzero(newrun)
        lens = np.diff(np.concatenate([starts, [len(p_s)]]))
        within = np.arange(len(p_s), dtype=np.int64) - np.repeat(starts, lens)
        cnt_per = lens[np.cumsum(newrun) - 1] - 1 - within
        total = int(cnt_per.sum())
        if total == 0:
            return pa.table({"pairkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        i_idx = np.repeat(np.arange(len(p_s), dtype=np.int64), cnt_per)
        joff = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(cnt_per) - cnt_per, cnt_per)
            + 1
        )
        key = s_s[i_idx] * np.int64(2**32) + s_s[i_idx + joff]
        rolled = (
            pa.table({"pairkey": pa.array(key)})
            .group_by("pairkey")
            .aggregate([("pairkey", "count")])
        )
        return pa.table(
            {
                "pairkey": rolled["pairkey"],
                "n": pc.cast(rolled["pairkey_count"], pa.int64()),
            }
        )

    counts = (
        items.map_batches(_dedup, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_expand, batch_format="pyarrow")
        .groupby("pairkey")
        .aggregate(Sum("n", alias_name="n_shared_parts"))
        .to_pandas()
    )
    counts = counts[counts["n_shared_parts"] >= 2]
    key = counts["pairkey"].to_numpy(dtype="int64")
    out = pd.DataFrame(
        {
            "supp_a": key // 2**32,
            "supp_b": key % 2**32,
            "n_shared_parts": counts["n_shared_parts"].astype("int64").values,
        }
    )
    return out.sort_values(["supp_a", "supp_b"]).reset_index(drop=True)


def modal_priority_per_segment(sf_dir: str) -> pd.DataFrame:
    """Per-group MODE: each market segment's most frequent order
    priority (ties broken by the lexicographically smallest priority) —
    the categorical argmax aggregate.

    Scale plan: the customer (custkey -> segment) dim attaches
    size-routed (broadcast <= _BROADCAST_SIDE_ROUTE_ROWS, hash_join
    above); counts reduce combiner-first to the O(segments x
    priorities) grain, and only that tiny table reaches the driver for
    the per-segment argmax scan."""
    from ray.data.aggregate import Count

    from ..stages.joins import broadcast_join, hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        cust = pa.table(
            {
                "c_custkey": pc.cast(cust["c_custkey"], pa.int64()),
                "c_mktsegment": cust["c_mktsegment"],
            }
        )
        tagged = broadcast_join(orders, cust, key="o_custkey", right_key="c_custkey")
    else:
        cust_ds = _read(
            sf_dir, "customer", ["c_custkey", "c_mktsegment"]
        ).map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                    "c_mktsegment": t["c_mktsegment"],
                }
            ),
            batch_format="pyarrow",
        )
        tagged = hash_join(orders, cust_ds, key="o_custkey", right_key="c_custkey")

    counts = (
        tagged.groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Count(alias_name="n_orders"))
        .to_pandas()
    )
    counts["n_orders"] = counts["n_orders"].astype("int64")
    counts = counts.sort_values(
        ["c_mktsegment", "n_orders", "o_orderpriority"],
        ascending=[True, False, True],
    )
    out = counts.groupby("c_mktsegment", as_index=False).head(1)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def monthly_revenue_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue growth: per calendar month the exact
    order revenue in cents, the prior month's revenue, and the growth
    ratio — the time-series delta report (LAG over an aggregate).

    Scale plan: revenue reduces combiner-first to the O(months) grain
    (one groupby over per-batch partials); the LAG + ratio run on that
    already-tiny table on the driver (documented bound: the dataset's
    month span). Growth is one double expression over exact int64
    cents, identically parenthesized on both engines. Months with no
    prior month (the first) drop out."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        m = pc.month(t["o_orderdate"])
        ym = pc.add(pc.multiply(pc.cast(y, pa.int64()), 100),
                    pc.cast(m, pa.int64()))
        part = pa.table(
            {"ym": ym, "cents": _to_scaled_int(t["o_totalprice"], 100)}
        )
        rolled = part.group_by("ym").aggregate([("cents", "sum")])
        return pa.table(
            {"ym": rolled["ym"], "cents": rolled["cents_sum"]}
        )

    out = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("ym")
        .reset_index(drop=True)
    )
    out["prev_cents"] = out["rev_cents"].shift(1)
    out = out[out["prev_cents"].notna()].copy()
    rev = out["rev_cents"].to_numpy(dtype="float64")
    prev = out["prev_cents"].to_numpy(dtype="float64")
    # identical parse tree to the SQL oracle — bit-identical doubles
    growth = (rev - prev) / prev
    return pd.DataFrame(
        {
            "ym": out["ym"].astype("int64").values,
            "rev_cents": out["rev_cents"].astype("int64").values,
            "prev_cents": out["prev_cents"].astype("int64").values,
            "growth": growth,
        }
    )


def order_price_decile_report(sf_dir: str) -> pd.DataFrame:
    """Equi-depth decile report: exact p10..p90 boundaries split the
    order-price domain into ten population-balanced buckets, then each
    decile's count / exact-cents sum / min / max — the distribution
    dashboard primitive (value-based assignment, so boundary ties land
    deterministically in the same bucket on both engines).

    Scale plan: boundaries come from the unbounded-domain exact
    quantile pass (:func:`..stages.textstats.bucketed_exact_quantiles`
    — two streaming passes, driver state bounded by the coarse bucket
    count); the NINE boundary values broadcast by closure into one
    partial-rollup pass (searchsorted-left assignment + per-batch Arrow
    group_by), so the final groupby sees O(10 x blocks) rows."""
    from ray.data.aggregate import Max, Min, Sum

    from ..stages.textstats import bucketed_exact_quantiles

    cents = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    )
    bounds = bucketed_exact_quantiles(
        cents, "cents", tuple(range(10, 100, 10))
    )["value"].to_numpy(dtype="int64")

    def _assign(t: pa.Table) -> pa.Table:
        v = np.asarray(t["cents"].to_numpy(zero_copy_only=False), dtype=np.int64)
        decile = 1 + np.searchsorted(bounds, v, side="left")
        part = pa.table(
            {"decile": pa.array(decile.astype(np.int64)), "cents": t["cents"]}
        )
        rolled = part.group_by("decile").aggregate(
            [("cents", "count"), ("cents", "sum"),
             ("cents", "min"), ("cents", "max")]
        )
        return pa.table(
            {
                "decile": rolled["decile"],
                "n": pc.cast(rolled["cents_count"], pa.int64()),
                "s": rolled["cents_sum"],
                "mn": rolled["cents_min"],
                "mx": rolled["cents_max"],
            }
        )

    out = (
        cents.map_batches(_assign, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            Sum("n", alias_name="n_orders"),
            Sum("s", alias_name="sum_cents"),
            Min("mn", alias_name="min_cents"),
            Max("mx", alias_name="max_cents"),
        )
        .to_pandas()
    )
    for c in ("n_orders", "sum_cents", "min_cents", "max_cents"):
        out[c] = out[c].astype("int64")
    out["decile"] = out["decile"].astype("int64")
    return out.sort_values("decile").reset_index(drop=True)


def customer_graph_degrees(sf_dir: str) -> pd.DataFrame:
    """Out-degree distribution of the order-derived customer graph (the
    same deterministic edge set PageRank / BFS / triangles run on):
    how many nodes have each distinct out-degree — the graph-shape
    audit (power-law check, hub detection).

    Scale plan: batch-local (src, dst) dedup, ONE src-hash bucket
    shuffle (a node's whole adjacency lands in one bucket), per-bucket
    global dedup + per-src counts collapsing immediately to (degree,
    n_nodes) partials — the final groupby sees O(buckets x distinct
    degrees) rows, never the edge list."""
    from ray.data.aggregate import Max, Sum

    from ..stages.relops import _WB

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])
    num_buckets = 64

    def _edges(t: pa.Table) -> pa.Table:
        src = pc.cast(t["o_custkey"], pa.int64())
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = pa.array((okey % maxc) + 1, type=pa.int64())
        tbl = pa.table({"src": src, "dst": dst})
        tbl = tbl.filter(pc.not_equal(tbl["src"], tbl["dst"]))
        pairs = tbl.group_by(["src", "dst"]).aggregate([])
        s = pairs["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((s * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _degree_partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"src": g["src"], "dst": g["dst"]})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        deg = distinct.group_by("src").aggregate([("dst", "count")])
        hist = (
            pa.table({"deg": pc.cast(deg["dst_count"], pa.int64())})
            .group_by("deg")
            .aggregate([("deg", "count")])
        )
        return pa.table(
            {
                "out_degree": hist["deg"],
                "n": pc.cast(hist["deg_count"], pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_degree_partials, batch_format="pyarrow")
        .groupby("out_degree")
        .aggregate(Sum("n", alias_name="n_nodes"))
        .to_pandas()
    )
    out["out_degree"] = out["out_degree"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out.sort_values("out_degree").reset_index(drop=True)


def top_orders_with_ties(sf_dir: str) -> pd.DataFrame:
    """Top-3 orders per customer WITH TIES (the RANK() <= k QUALIFY
    shape — tie runs crossing the boundary come back whole, unlike
    top_orders_per_customer's ROW_NUMBER contract). Batch-local tie-rank
    prune bounds the single hash-bucket shuffle; negated cents order the
    kernel descending."""
    from ..stages.relops import grouped_topk_ties

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        cents = _to_scaled_int(t["o_totalprice"], 100)
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "price_cents": cents,
                "neg": pc.negate_checked(cents),
            }
        )

    out = grouped_topk_ties(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="o_custkey",
        value_col="neg",
        k=3,
        out_col="rnk",
    ).to_pandas()
    out = out[["o_custkey", "o_orderkey", "price_cents", "rnk"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)


def event_type_lift(sf_dir: str) -> pd.DataFrame:
    """Association-rule LIFT per event-type pair: observed co-occurrence
    over the independence expectation, lift = n_both * N / (n_a * n_b)
    on distinct-user counts — the recommendation-mining score layered on
    the co-occurrence matrix.

    Scale plan: the deduped (user, type) pair stream routes by user
    hash ONCE and is materialized (O(distinct pairs)); two grouped
    passes over it produce the bitmask pair partials
    (event_type_cooccurrence's kernel) and the per-type/total distinct
    counts (buckets partition users, so partials are disjoint). The
    lift join runs on the driver at the O(T^2) grain. The ratio is one
    identically-parenthesized double formula over exact int64 counts."""
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    num_buckets = 64

    def _pairs(t: pa.Table) -> pa.Table:
        for c in ("user_id", "event_type"):
            if t[c].null_count:
                raise ValueError(f"event_type_lift: nulls in {c!r}")
        pairs = (
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]})
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        u = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    routed = ds.map_batches(_pairs, batch_format="pyarrow").materialize()

    def _cooccur(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"u": g["user_id"], "ty": g["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        ty = distinct["ty"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        enc = ty.dictionary_encode()
        names = enc.dictionary.to_pylist()
        if len(names) > 63:
            raise ValueError("event_type_lift: > 63 types per bucket")
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = distinct["u"].to_numpy(zero_copy_only=False)
        order = np.argsort(users, kind="stable")
        u_s, c_s = users[order], codes[order]
        starts = np.flatnonzero(np.concatenate([[True], u_s[1:] != u_s[:-1]]))
        masks = np.bitwise_or.reduceat(np.uint64(1) << c_s.astype(np.uint64), starts)
        rows_a, rows_b, rows_n = [], [], []
        for i in range(len(names)):
            bit_i = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(names)):
                n = int((bit_i & ((masks >> np.uint64(j)) & np.uint64(1))).sum())
                if n:
                    a, b = sorted((names[i], names[j]))
                    rows_a.append(a); rows_b.append(b); rows_n.append(n)
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    def _type_partials(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"u": g["user_id"], "ty": g["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        per_type = distinct.group_by("ty").aggregate([("u", "count")])
        n_users = (
            distinct.group_by("u").aggregate([]).num_rows
        )  # distinct users in this bucket (buckets partition users)
        return pa.table(
            {
                "ty": pa.concat_arrays(
                    [per_type["ty"].combine_chunks(), pa.array(["\x00TOTAL"])]
                ),
                "n": pa.array(
                    list(
                        pc.cast(per_type["u_count"], pa.int64()).to_pylist()
                    )
                    + [n_users],
                    pa.int64(),
                ),
            }
        )

    both = (
        routed.groupby(_WB)
        .map_groups(_cooccur, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_both"))
        .to_pandas()
    )
    tc = (
        routed.groupby(_WB)
        .map_groups(_type_partials, batch_format="pyarrow")
        .groupby("ty")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_total = int(tc.loc[tc["ty"] == "\x00TOTAL", "n"].iloc[0])
    tmap = dict(
        zip(tc.loc[tc["ty"] != "\x00TOTAL", "ty"],
            tc.loc[tc["ty"] != "\x00TOTAL", "n"].astype("int64"))
    )
    nb = both["n_both"].to_numpy(dtype="float64")
    na = both["type_a"].map(tmap).to_numpy(dtype="float64")
    nbb = both["type_b"].map(tmap).to_numpy(dtype="float64")
    # identical parse tree to the SQL oracle — bit-identical doubles
    lift = (nb * float(n_total)) / (na * nbb)
    out = pd.DataFrame(
        {
            "type_a": both["type_a"],
            "type_b": both["type_b"],
            "n_both": both["n_both"].astype("int64"),
            "lift": lift,
        }
    )
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def doc_sentence_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document sentence statistics: terminator-run count ([.!?]+
    matches — the sentence-count proxy) and question-mark count, both
    via RE2 Arrow kernels (pc.count_substring_regex), shuffle-free and
    zero-copy over the corpus — the shallow readability-audit member of
    the text-analysis family."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_sentences": pc.cast(
                    pc.count_substring_regex(t["text"], r"[.!?]+"), pa.int64()
                ),
                "n_questions": pc.cast(
                    pc.count_substring_regex(t["text"], r"\?"), pa.int64()
                ),
            }
        )

    out = ds.map_batches(_stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def order_quartiles_per_customer(sf_dir: str) -> pd.DataFrame:
    """Per-group NTILE(4) (relops.grouped_ntile): each order's price
    quartile within its customer, SQL fill rule (first n%4 buckets get
    the extra row), o_orderkey as the required ROW_NUMBER tiebreaker.
    One hash-bucket shuffle, the global-NTILE formula applied
    vectorized across all customers at once."""
    from ..stages.relops import grouped_ntile

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    out = grouped_ntile(
        ds.map_batches(_prep, batch_format="pyarrow"),
        group_col="o_custkey",
        order_cols=["cents", "o_orderkey"],
        k=4,
        out_col="quartile",
    ).to_pandas()
    out = out[["o_orderkey", "quartile"]]
    out["quartile"] = out["quartile"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted exact median of line-item price: the smallest
    price (cents) whose cumulative quantity weight reaches half the
    total — the robust-statistics member that respects row weights
    (shipment-volume-weighted price levels).

    Scale plan: one combiner-reduced (cents -> total weight) groupby
    (per-batch Arrow group_by partials), then an O(distinct cents)
    driver cumsum scan — the dense-histogram family's documented driver
    bound (price domains are bounded; unbounded domains take the
    bucketed-quantile refine path). The half-total comparison is
    2*cum >= W in exact int64, so no float tie ambiguity exists."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def _prep(t: pa.Table) -> pa.Table:
        part = pa.table(
            {
                "cents": _to_scaled_int(t["l_extendedprice"], 100),
                "w": pc.cast(pc.floor(t["l_quantity"]), pa.int64()),
            }
        )
        rolled = part.group_by("cents").aggregate([("w", "sum")])
        return pa.table({"cents": rolled["cents"], "w": rolled["w_sum"]})

    hist = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    w = hist["w"].to_numpy(dtype="int64")
    cum = np.cumsum(w)
    total = int(cum[-1]) if len(cum) else 0
    idx = int(np.searchsorted(2 * cum, total))
    return pd.DataFrame(
        {
            "wmedian_cents": [int(hist["cents"].iloc[idx])],
            "total_weight": [total],
        }
    )


def doc_type_token_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-document type-token ratio (distinct tokens / tokens, the
    lexical-diversity member of the quality family), sharing
    doc_token_counts' whitespace tokenization exactly.

    Vectorized distinct counting without per-doc Python: one
    split_pattern_regex per batch, the flattened token stream gets
    int codes from np.unique(return_inverse) (the string-lexsort
    trick), and distinct-per-doc falls out of one (doc, code) lexsort
    + run mask. Shuffle-free; the ratio is one guarded double division
    on both engines."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _ttr(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = np.asarray(pc.list_value_length(toks).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        empty = np.asarray(
            pc.equal(trimmed, pa.scalar("")).to_numpy(zero_copy_only=False)
        )
        n_tok = np.where(empty, 0, lens)
        flat = toks.flatten()
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(doc_idx):
            codes = np.unique(
                np.asarray(flat.to_pandas(), dtype=object), return_inverse=True
            )[1]
            order = np.lexsort((codes, doc_idx))
            d_s, c_s = doc_idx[order], codes[order]
            new = np.concatenate(
                [[True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
            )
            n_dist = np.bincount(d_s[new], minlength=len(lens)).astype(np.int64)
        else:
            n_dist = np.zeros(len(lens), dtype=np.int64)
        n_dist = np.where(empty, 0, n_dist)
        # identical parse tree to the SQL oracle — bit-identical doubles
        ttr = np.where(
            n_tok > 0, n_dist.astype(np.float64) / n_tok.astype(np.float64), 0.0
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct": pa.array(n_dist, pa.int64()),
                "ttr": pa.array(ttr, pa.float64()),
            }
        )

    out = ds.map_batches(_ttr, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def daily_revenue_rank_in_month(sf_dir: str) -> pd.DataFrame:
    """Window-over-aggregate: each day's revenue rank within its
    calendar month (DENSE_RANK, highest revenue = 1) — the leaderboard
    -on-a-rollup shape. Revenue reduces combiner-first to the O(days)
    grain; the distributed dense-rank kernel then runs on that already
    -tiny keyed table (negated cents order it descending)."""
    from ray.data.aggregate import Sum

    from ..stages.relops import grouped_dense_rank

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    us_per_day = 86_400_000_000

    def _prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(pc.cast(t["o_orderdate"], pa.int64()), us_per_day),
            pa.int64(),
        )
        y = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        m = pc.cast(pc.month(t["o_orderdate"]), pa.int64())
        part = pa.table(
            {
                "day": day,
                "ym": pc.add(pc.multiply(y, 100), m),
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )
        rolled = part.group_by(["day", "ym"]).aggregate([("cents", "sum")])
        return pa.table(
            {
                "day": rolled["day"],
                "ym": rolled["ym"],
                "cents": rolled["cents_sum"],
            }
        )

    daily = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["day", "ym"])
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .map_batches(
            lambda t: t.append_column(
                "neg", pc.negate_checked(t["rev_cents"])
            ),
            batch_format="pyarrow",
        )
    )
    out = grouped_dense_rank(
        daily, group_col="ym", value_col="neg", out_col="rnk"
    ).to_pandas()
    out = out[["day", "ym", "rev_cents", "rnk"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def kcore_customers(sf_dir: str) -> pd.DataFrame:
    """3-core of the undirected order-derived customer graph
    (graph.kcore_nodes): nodes surviving the iterative degree-<3 peel,
    with their core degrees — the third iterative graph kernel after
    PageRank and connected components. Size-routed: driver peel under
    5M distinct edges, per-round distributed degree groupby above
    (route parity pinned by test_kcore_routes_match_reference). No SQL
    oracle exists (recursive CTEs cannot re-aggregate per round); the
    kernel is pinned by an independent brute-force peel in tests."""
    from ray.data.aggregate import Max

    from ..stages.graph import kcore_nodes

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        src = pc.cast(t["o_custkey"], pa.int64())
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = pa.array((okey % maxc) + 1, type=pa.int64())
        return pa.table({"src": src, "dst": dst})

    edges = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _edges, batch_format="pyarrow"
    )
    out = kcore_nodes(edges, k=3)
    return out.sort_values("node").reset_index(drop=True)


def mutual_edge_pairs(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-edge detection on the directed order-derived graph:
    node pairs linked in BOTH directions (the mutual-follow primitive).

    Scale plan: batch-local directed-pair dedup, ONE unordered-pair
    hash bucket shuffle (both directions of a pair land together), per
    bucket one (min, max, direction-count) rollup emitting only keys
    seen in both directions — output O(mutual pairs), the raw edge list
    never converges anywhere."""
    from ray.data.aggregate import Max, Sum

    from ..stages.relops import _WB

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])
    if maxc >= 2**31:
        raise ValueError(
            "mutual_edge_pairs: node ids >= 2^31 break the composite "
            "pair key — widen to two-column grouping"
        )
    num_buckets = 64

    def _edges(t: pa.Table) -> pa.Table:
        src = np.asarray(
            pc.cast(t["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = (okey % maxc) + 1
        keep = src != dst
        src, dst = src[keep], dst[keep]
        pairs = (
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        s = pairs["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pairs["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(s, d).astype(np.uint64)
        hi = np.maximum(s, d).astype(np.uint64)
        mix = (lo * np.uint64(0x9E3779B97F4A7C15)) ^ (
            hi * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        b = ((mix >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int64)
        return pairs.append_column(_WB, pa.array(b))

    def _mutual(g: pa.Table) -> pa.Table:
        pairs = (
            pa.table({"src": g["src"], "dst": g["dst"]})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        s = pairs["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pairs["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        key = lo * np.int64(2**32) + hi
        rolled = (
            pa.table({"key": pa.array(key)})
            .group_by("key")
            .aggregate([("key", "count")])
        )
        both = rolled.filter(pc.equal(rolled["key_count"], pa.scalar(2)))
        kv = both["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(kv // 2**32),
                "b": pa.array(kv % 2**32),
            }
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_mutual, batch_format="pyarrow")
        .to_pandas()
    )
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _canonical_order_edges(sf_dir: str):
    """Canonical DISTINCT undirected edge set (columns ``a`` < ``b``,
    int64) of the deterministic order-derived customer graph — the same
    derivation pagerank / BFS / triangles use (reference analog: the
    link graph smart_cat_discovery.py builds its BFS over). ONE
    (a, b)-groupby shuffle; the result is MATERIALIZED because every
    caller consumes it 2-3 times (degrees + triangles + join probe).
    Returns ``(edges_dataset, max_node_id)``."""
    from ray.data.aggregate import Count, Max

    cust = _read(sf_dir, "customer", ["c_custkey"])
    maxc = int(cust.aggregate(Max("c_custkey", alias_name="m"))["m"])

    def _edges(t: pa.Table) -> pa.Table:
        src = np.asarray(
            pc.cast(t["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dst = (okey % maxc) + 1
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    edges = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        .map_batches(_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
        .materialize()
    )
    return edges, maxc


def _edge_degrees(edges):
    """Per-node degree of a canonical undirected edge Dataset: batch
    -local ``np.unique`` partials over both endpoints, ONE groupby Sum —
    the exchange moves O(distinct nodes per block) rows."""
    from ray.data.aggregate import Sum

    def _deg_partials(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                np.asarray(t["a"].to_numpy(zero_copy_only=False)),
                np.asarray(t["b"].to_numpy(zero_copy_only=False)),
            ]
        )
        n, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "d": pa.array(c.astype(np.int64)),
            }
        )

    return (
        edges.map_batches(_deg_partials, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )


def _order_edges_driver(sf_dir: str):
    """DRIVER SMALL ROUTE for the order-derived graph queries: below
    ``min(_COMPONENTS_DRIVER_ROUTE_EDGES, _BROADCAST_SIDE_ROUTE_ROWS)``
    order rows, the edge derivation + canonical dedup run as one numpy
    pass over a driver-side parquet read — the pagerank / triangle_count
    driver-route precedent (the distributed plan's exchanges are pure
    fixed latency at this size, and its broadcast attaches pull the same
    O(nodes) tables to the driver anyway). Returns ``(a, b, maxc)``
    canonical unique arrays, or ``None`` to take the distributed plan
    (including when tests force the route knobs to 0)."""
    if not os.path.exists(f"{sf_dir}/orders.parquet"):
        return None
    n_orders = _fact_rows(sf_dir, "orders")
    if n_orders > min(
        _COMPONENTS_DRIVER_ROUTE_EDGES, _BROADCAST_SIDE_ROUTE_ROWS
    ):
        return None
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    maxc = int(pc.max(cust["c_custkey"]).as_py())
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )
    src = np.asarray(
        pc.cast(t["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
    )
    okey = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
    dst = (okey % maxc) + 1
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    uk = np.unique(a * (maxc + 1) + b)
    return uk // (maxc + 1), uk % (maxc + 1), maxc


def local_clustering_customers(sf_dir: str) -> pd.DataFrame:
    """Per-node LOCAL CLUSTERING COEFFICIENT of the order-derived
    customer graph: 2*tri(v) / (deg(v) * (deg(v)-1)) for deg >= 2 — the
    per-node companion to the scalar triangle_count_customers (community
    tightness feature for crawl-host neighborhoods).

    Scale plan: canonical-dedup shuffle (shared helper), degrees via
    batch-local unique partials + one groupby Sum, per-node triangle
    counts via graph.triangle_incidences (size-routed: driver numpy pass
    at test scale, broadcast-keys bucket shuffle to 20M edges, two hash
    joins beyond). The tri table attaches to the degree table size-routed
    (broadcast <= _BROADCAST_SIDE_ROUTE_ROWS else hash_join). Both
    factors are exact int64; the coefficient is ONE identically
    -parenthesized double division on both sides, so Ray and DuckDB
    agree bit-for-bit. Below the _order_edges_driver bound the whole
    query runs as one numpy pass (distributed plan route-forced by the
    hash-path test)."""
    from ..stages.graph import _wedge_triangles, triangle_incidences
    from ..stages.joins import broadcast_join, hash_join

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, maxc = drv
        deg_nodes, deg_cnt = np.unique(
            np.concatenate([a, b]), return_counts=True
        )
        ek = a * (maxc + 1) + b  # already sorted-unique by construction
        ta, tb, tc = _wedge_triangles(a, b, ek, maxc)
        tn, tcnt = np.unique(np.concatenate([ta, tb, tc]), return_counts=True)
        tri_full = np.zeros(len(deg_nodes), dtype=np.int64)
        tri_full[np.searchsorted(deg_nodes, tn)] = tcnt
        keep = deg_cnt >= 2
        node, d, tr = deg_nodes[keep], deg_cnt[keep].astype(np.int64), tri_full[keep]
        coeff = (2 * tr).astype(np.float64) / (d * (d - 1)).astype(np.float64)
        return pd.DataFrame(
            {"node": node, "deg": d, "tri": tr, "coeff": coeff}
        ).sort_values("node").reset_index(drop=True)

    edges, maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges)
    tri = triangle_incidences(edges, max_node_id=maxc, emit="nodes")

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        tp = tri.to_pandas()
        tri_tbl = pa.table(
            {
                "node": pa.array(tp["node"].to_numpy(dtype="int64")),
                "tri": pa.array(tp["tri"].to_numpy(dtype="int64")),
            }
        )
        joined = broadcast_join(deg, tri_tbl, key="node", how="left_outer")
    else:
        joined = hash_join(deg, tri, key="node", how="left_outer")

    def _final(t: pa.Table) -> pa.Table:
        d = np.asarray(
            pc.cast(t["deg"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        tr = np.asarray(
            pc.fill_null(pc.cast(t["tri"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        )
        node = np.asarray(
            pc.cast(t["node"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        keep = d >= 2
        node, d, tr = node[keep], d[keep], tr[keep]
        coeff = (2 * tr).astype(np.float64) / (d * (d - 1)).astype(np.float64)
        return pa.table(
            {
                "node": pa.array(node),
                "deg": pa.array(d),
                "tri": pa.array(tr),
                "coeff": pa.array(coeff, pa.float64()),
            }
        )

    out = joined.map_batches(_final, batch_format="pyarrow").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def edge_jaccard_customers(sf_dir: str) -> pd.DataFrame:
    """Per-edge COMMON-NEIGHBOR / JACCARD similarity over the order
    -derived customer graph: for each existing edge (a, b), the number
    of shared neighbors (= triangles through that edge) and
    common / ((deg(a)-1) + (deg(b)-1) - common) — the classic link
    -prediction feature, here as a distributed graph operator.

    Scale plan: one canonical-dedup shuffle; common-neighbor counts via
    graph.triangle_incidences(emit='edges') (size-routed like
    triangle_count); the O(tri-edges) common table and the O(nodes)
    degree table attach to the edge list via broadcast joins under
    _BROADCAST_SIDE_ROUTE_ROWS (hash_join route above — composite int64
    edge key a*(M+1)+b, node-id domain < ~3e9). All inputs to the final
    formula are exact int64; the division is one identical double op on
    both sides. Below the _order_edges_driver bound the whole query is
    one numpy pass (distributed plan route-forced by the hash-path
    test)."""
    from ..stages.graph import _wedge_triangles, triangle_incidences
    from ..stages.joins import broadcast_join, hash_join

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, maxc = drv
        M = maxc
        deg_nodes, deg_cnt = np.unique(
            np.concatenate([a, b]), return_counts=True
        )
        ek = a * (M + 1) + b  # sorted-unique by construction
        ta, tb, tc = _wedge_triangles(a, b, ek, M)
        ckeys, ccnt = np.unique(
            np.concatenate(
                [ta * (M + 1) + tb, ta * (M + 1) + tc, tb * (M + 1) + tc]
            ),
            return_counts=True,
        )
        common_full = np.zeros(len(ek), dtype=np.int64)
        common_full[np.searchsorted(ek, ckeys)] = ccnt
        da = deg_cnt[np.searchsorted(deg_nodes, a)].astype(np.int64)
        db = deg_cnt[np.searchsorted(deg_nodes, b)].astype(np.int64)
        denom = (da - 1) + (db - 1) - common_full
        keep = denom > 0
        return pd.DataFrame(
            {
                "a": a[keep],
                "b": b[keep],
                "common": common_full[keep],
                "jaccard": common_full[keep].astype(np.float64)
                / denom[keep].astype(np.float64),
            }
        ).sort_values(["a", "b"]).reset_index(drop=True)

    edges, maxc = _canonical_order_edges(sf_dir)
    M = maxc
    deg = _edge_degrees(edges)
    common = triangle_incidences(edges, max_node_id=maxc, emit="edges")

    def _ekey(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "ekey": pa.array(a * (M + 1) + b, pa.int64()),
            }
        )

    keyed = edges.map_batches(_ekey, batch_format="pyarrow")

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cp = common.to_pandas()
        ck = (
            cp["a"].to_numpy(dtype="int64") * (M + 1)
            + cp["b"].to_numpy(dtype="int64")
        )
        common_tbl = pa.table(
            {
                "ekey": pa.array(ck),
                "common": pa.array(cp["common"].to_numpy(dtype="int64")),
            }
        )
        dp = deg.to_pandas()
        nodes_np = dp["node"].to_numpy(dtype="int64")
        degs_np = dp["deg"].to_numpy(dtype="int64")
        da_tbl = pa.table({"node": pa.array(nodes_np), "da": pa.array(degs_np)})
        db_tbl = pa.table({"node": pa.array(nodes_np), "db": pa.array(degs_np)})
        j = broadcast_join(keyed, common_tbl, key="ekey", how="left_outer")
        j = broadcast_join(j, da_tbl, key="a", right_key="node")
        j = broadcast_join(j, db_tbl, key="b", right_key="node")
    else:
        common_keyed = common.map_batches(
            lambda t: pa.table(
                {
                    "ekey": pa.array(
                        np.asarray(t["a"].to_numpy(zero_copy_only=False))
                        * (M + 1)
                        + np.asarray(t["b"].to_numpy(zero_copy_only=False)),
                        pa.int64(),
                    ),
                    "common": t["common"],
                }
            ),
            batch_format="pyarrow",
        )
        j = hash_join(keyed, common_keyed, key="ekey", how="left_outer")
        da = deg.map_batches(
            lambda t: pa.table({"node": t["node"], "da": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow",
        )
        db = deg.map_batches(
            lambda t: pa.table({"node": t["node"], "db": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow",
        )
        j = hash_join(j, da, key="a", right_key="node")
        j = hash_join(j, db, key="b", right_key="node")

    def _final(t: pa.Table) -> pa.Table:
        a = np.asarray(pc.cast(t["a"], pa.int64()).to_numpy(zero_copy_only=False))
        b = np.asarray(pc.cast(t["b"], pa.int64()).to_numpy(zero_copy_only=False))
        cm = np.asarray(
            pc.fill_null(pc.cast(t["common"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        )
        da_ = np.asarray(pc.cast(t["da"], pa.int64()).to_numpy(zero_copy_only=False))
        db_ = np.asarray(pc.cast(t["db"], pa.int64()).to_numpy(zero_copy_only=False))
        denom = (da_ - 1) + (db_ - 1) - cm
        keep = denom > 0
        a, b, cm, denom = a[keep], b[keep], cm[keep], denom[keep]
        jac = cm.astype(np.float64) / denom.astype(np.float64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "common": pa.array(cm),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    out = j.map_batches(_final, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def order_price_gini_by_nation(sf_dir: str) -> pd.DataFrame:
    """Per-nation GINI COEFFICIENT of order prices — the concentration /
    inequality statistic over a sorted-rank weighted sum:
    gini = (2*Σ i*x_(i) - (n+1)*Σx) / (n*Σx) with x ascending-sorted
    exact floor-dollar int64 values (tied values commute in Σ i*x, so
    the arbitrary tie order on both sides cannot change the result).

    Scale plan: customer attach size-routed (broadcast searchsorted
    under _BROADCAST_SIDE_ROUTE_ROWS, hash_join above), nation-name
    attach is a 25-entry np.object lut, then ONE key-routed bucket
    shuffle and a single lexsort + np.add.reduceat pass per bucket —
    no per-key Python. Int64 bound: Σ i*x caps near n² * max_dollars/2,
    safe to ~10^6 rows per group at 10^6-dollar prices; beyond that
    drop x to thousands-of-dollars units (same bound family as
    nation_price_qty_corr, documented not enforced)."""
    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import (
        _WB,
        _group_codes,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "v": pc.cast(pc.floor(t["o_totalprice"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nation_names = {
        int(k): v
        for k, v in zip(
            *pq.read_table(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).to_pydict().values()
        )
    }
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust_tbl = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        joined = broadcast_join(
            orders, cust_tbl, key="o_custkey", right_key="c_custkey"
        )
    else:
        joined = hash_join(
            orders,
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
            key="o_custkey",
            right_key="c_custkey",
        )
    lut = np.empty(max(nation_names) + 1, dtype=object)
    for k, v in nation_names.items():
        lut[k] = v

    def _name(t: pa.Table) -> pa.Table:
        keys = np.asarray(
            t["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        return pa.table(
            {"n_name": pa.array(lut[keys], pa.string()), "v": t["v"]}
        )

    named = joined.map_batches(_name, batch_format="pyarrow")

    def _gini(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "n_name")
        v = _int64_nonull(g["v"], "v")
        order = np.lexsort((v, codes))
        sc, sv = codes[order], v[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = (ends - starts).astype(np.int64)
        i_within = (
            np.arange(len(sv), dtype=np.int64) - np.repeat(starts, n) + 1
        )
        six = np.add.reduceat(i_within * sv, starts)
        sx = np.add.reduceat(sv, starts)
        names = pc.take(
            g["n_name"].combine_chunks()
            if isinstance(g["n_name"], pa.ChunkedArray)
            else g["n_name"],
            pa.array(order[starts]),
        )
        gini = (2 * six - (n + 1) * sx).astype(np.float64) / (
            n * sx
        ).astype(np.float64)
        return pa.table(
            {
                "n_name": names,
                "n_orders": pa.array(n),
                "gini": pa.array(gini, pa.float64()),
            }
        )

    out = (
        _route_by_group(named, "n_name", 16)
        .groupby(_WB)
        .map_groups(_gini, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("n_name").reset_index(drop=True)


def event_user_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-user GINI-SIMPSON DIVERSITY of event types:
    1 - Σc_i²/N² computed as (N² - Σc_i²)/N² — the behavioral-entropy
    sibling that stays in EXACT int64 (a true Shannon entropy would sum
    per-group doubles, whose order DuckDB does not pin).

    Scale plan: batch-local (user, type) count partials, ONE
    user-hash bucket shuffle, per bucket two Arrow group_by rollups
    (type-level collapse, then user-level Σc / Σc² / distinct-type
    count) — output O(users), raw events never converge anywhere."""
    from ..stages.relops import _WB, _route_by_group

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        c = (
            pa.table({"u": t["user_id"], "ty": t["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "user_id": c["u"],
                "ty": c["ty"],
                "n": pc.cast(c["count_all"], pa.int64()),
            }
        )

    def _rollup(g: pa.Table) -> pa.Table:
        c = (
            pa.table({"u": g["user_id"], "ty": g["ty"], "n": g["n"]})
            .group_by(["u", "ty"])
            .aggregate([("n", "sum")])
        )
        n = np.asarray(c["n_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        t2 = pa.table(
            {
                "u": c["u"],
                "n": pa.array(n),
                "c2": pa.array(n * n),
                "one": pa.array(np.ones(len(n), dtype=np.int64)),
            }
        )
        s = t2.group_by("u").aggregate(
            [("n", "sum"), ("c2", "sum"), ("one", "sum")]
        )
        ntot = np.asarray(s["n_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sc2 = np.asarray(s["c2_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        simpson = (ntot * ntot - sc2).astype(np.float64) / (
            ntot * ntot
        ).astype(np.float64)
        return pa.table(
            {
                "user_id": pc.cast(s["u"], pa.int64()),
                "n_events": pa.array(ntot),
                "n_types": pc.cast(s["one_sum"], pa.int64()),
                "simpson": pa.array(simpson, pa.float64()),
            }
        )

    out = (
        _route_by_group(
            ev.map_batches(_partial, batch_format="pyarrow"), "user_id", 32
        )
        .groupby(_WB)
        .map_groups(_rollup, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def hapax_ratio_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language HAPAX LEGOMENA ratio: the share of the language's
    distinct vocabulary that occurs exactly once — the classic corpus
    -quality / contamination signal (synthetic or template text craters
    it; diverse natural text keeps it near half).

    Scale plan: the wordcount shape — fully vectorized per-batch
    (lang, token) partials (flat whitespace split + dictionary-encode +
    composite-code np.unique; no Python row loop), where token identity
    is the 128-bit two-siphash pair (h1, h2)
    (:func:`textkit.hash2_strings` — the bigram-novelty trust model: a
    miscount needs two distinct tokens colliding on BOTH 64-bit hashes,
    ~2^-128 per pair). The global merge is ONE pair-hash bucket shuffle
    (the hourly_active_users pattern — single int64 sort key, NOT a
    3-column sort groupby: measured 155 s → 8 s over 18M token
    instances at 32 CPUs): each bucket finishes its vocabulary's sums
    with one Arrow group_by and emits per-(lang) hapax/distinct
    partials, so the final groupby moves O(langs x buckets) rows. Raw
    tokens never shuffle; the exchange is three int64s + lang per
    batch-vocab entry."""
    from ray.data.aggregate import Sum

    from ..functions import textkit
    from ..stages.relops import _WB

    ds = _read(sf_dir, "documents", ["lang", "text"])
    num_buckets = 64

    _EMPTY_PARTIAL = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "h1": pa.array([], pa.int64()),
            "h2": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            _WB: pa.array([], pa.int64()),
        }
    )

    def _partial(t: pa.Table) -> pa.Table:
        flat, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        if len(flat) == 0:
            return _EMPTY_PARTIAL
        langs = np.asarray(t["lang"].to_numpy(zero_copy_only=False), dtype=object)
        uniq_langs, lang_codes = np.unique(langs, return_inverse=True)
        tok_lang = np.repeat(lang_codes.astype(np.int64), np.diff(ptr))
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_numpy(zero_copy_only=False)
        tok_code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # batch-local distinct (lang, token) counts via one composite code
        comp = tok_lang * np.int64(len(vocab)) + tok_code
        keys, counts_ = np.unique(comp, return_counts=True)
        k_lang = (keys // len(vocab)).astype(np.int64)
        k_tok = (keys % len(vocab)).astype(np.int64)
        h1, h2 = textkit.hash2_strings(vocab, salt="hx")
        b = (h1.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(uniq_langs[k_lang], pa.string()),
                "h1": pa.array(h1[k_tok]),
                "h2": pa.array(h2[k_tok]),
                "n": pa.array(counts_.astype(np.int64)),
                _WB: pa.array(b[k_tok]),
            }
        )

    def _bucket_partials(g: pa.Table) -> pa.Table:
        sums = g.group_by(["lang", "h1", "h2"]).aggregate([("n", "sum")])
        n = np.asarray(
            sums["n_sum"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        tl = pa.table(
            {
                "lang": sums["lang"],
                "hap": pa.array((n == 1).astype(np.int64)),
                "one": pa.array(np.ones(len(n), dtype=np.int64)),
            }
        )
        s = tl.group_by("lang").aggregate([("hap", "sum"), ("one", "sum")])
        return pa.table(
            {
                "lang": s["lang"],
                "h": pc.cast(s["hap_sum"], pa.int64()),
                "d": pc.cast(s["one_sum"], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=4096)
        .groupby(_WB)
        .map_groups(_bucket_partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("h", alias_name="n_hapax"), Sum("d", alias_name="n_distinct"))
        .to_pandas()
    )
    agg["n_hapax"] = agg["n_hapax"].astype("int64")
    agg["n_distinct"] = agg["n_distinct"].astype("int64")
    agg["hapax_ratio"] = agg["n_hapax"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["n_distinct"].to_numpy(dtype="int64").astype(np.float64)
    out = agg[["lang", "n_distinct", "n_hapax", "hapax_ratio"]]
    return out.sort_values("lang").reset_index(drop=True)


def lang_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise VOCABULARY OVERLAP between languages: exact Jaccard of
    the distinct whitespace-token sets of every language pair sharing at
    least one token — the cross-lingual contamination / code-switching
    audit (a high en↔fr vocabulary Jaccard in a "clean" split means
    mislabeled or mixed documents).

    Scale plan: the hapax machinery's distinct-(lang, token) shape —
    vectorized batch partials (flat whitespace split, two-siphash token
    identity, composite-code np.unique), ONE token-hash bucket shuffle
    of (lang, h1, h2) presence rows. Each bucket owns its tokens
    EXCLUSIVELY (bucket = h1 % B), so per-token language SETS are
    bucket-local: tokens sort once, `bitwise_or.reduceat` collapses each
    token's languages to ONE int64 bitmask (languages ≤ 63 — the
    documented bound; a corpus beyond that wants a two-level lang
    grouping), and the bucket emits O(distinct masks) rows, each
    expanded to its language pairs + per-language vocab partials. The
    final groupby moves O(buckets × lang²) rows; raw tokens never leave
    their bucket, and nothing pair-shaped ever touches the token list.
    Union/Jaccard are derived from exact int64 sizes (|A∪B| =
    |A|+|B|−|A∩B|) with one double division, identically parenthesized
    in the SQL oracle."""
    from ray.data.aggregate import Sum

    from ..functions import textkit
    from ..stages.relops import _WB

    ds = _read(sf_dir, "documents", ["lang", "text"])
    num_buckets = 64

    _EMPTY = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "h1": pa.array([], pa.int64()),
            "h2": pa.array([], pa.int64()),
            _WB: pa.array([], pa.int64()),
        }
    )

    def _presence(t: pa.Table) -> pa.Table:
        flat, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        if len(flat) == 0:
            return _EMPTY
        langs = np.asarray(t["lang"].to_numpy(zero_copy_only=False), dtype=object)
        uniq_langs, lang_codes = np.unique(langs, return_inverse=True)
        tok_lang = np.repeat(lang_codes.astype(np.int64), np.diff(ptr))
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_numpy(zero_copy_only=False)
        tok_code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.unique(tok_lang * np.int64(len(vocab)) + tok_code)
        k_lang = (comp // len(vocab)).astype(np.int64)
        k_tok = (comp % len(vocab)).astype(np.int64)
        h1, h2 = textkit.hash2_strings(vocab, salt="hx")
        b = (h1.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(uniq_langs[k_lang], pa.string()),
                "h1": pa.array(h1[k_tok]),
                "h2": pa.array(h2[k_tok]),
                _WB: pa.array(b[k_tok]),
            }
        )

    def _bucket_pairs(g: pa.Table) -> pa.Table:
        distinct = (
            pa.table({"lang": g["lang"], "h1": g["h1"], "h2": g["h2"]})
            .group_by(["lang", "h1", "h2"])
            .aggregate([])
        )
        lv = distinct["lang"]
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        enc = lv.dictionary_encode()
        lang_names = enc.dictionary.to_pylist()
        if len(lang_names) > 63:
            raise ValueError(
                "lang_vocab_overlap's bitmask kernel supports <= 63 "
                "languages; a wider corpus wants a two-level grouping"
            )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = np.asarray(distinct["h1"].to_numpy(zero_copy_only=False))
        h2 = np.asarray(distinct["h2"].to_numpy(zero_copy_only=False))
        order = np.lexsort((h2, h1))
        h1s, h2s, cs = h1[order], h2[order], codes[order]
        newtok = np.concatenate(
            [[True], (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        )
        starts = np.nonzero(newtok)[0]
        masks = np.bitwise_or.reduceat(
            np.int64(1) << cs, starts
        )
        um, uc = np.unique(masks, return_counts=True)
        la, lb, n = [], [], []
        for m, c in zip(um, uc):
            bits = [i for i in range(len(lang_names)) if m >> i & 1]
            for i, bi in enumerate(bits):
                la.append(lang_names[bi])
                lb.append("")  # per-lang vocab-size partial
                n.append(int(c))
                for bj in bits[i + 1:]:
                    x, y = sorted((lang_names[bi], lang_names[bj]))
                    la.append(x)
                    lb.append(y)
                    n.append(int(c))
        return pa.table(
            {
                "lang_a": pa.array(la, pa.string()),
                "lang_b": pa.array(lb, pa.string()),
                "n": pa.array(np.asarray(n, dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(_presence, batch_format="pyarrow", batch_size=4096)
        .groupby(_WB)
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .groupby(["lang_a", "lang_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    vocab = (
        agg[agg["lang_b"] == ""]
        .set_index("lang_a")["n"]
        .astype("int64")
    )
    pairs = agg[agg["lang_b"] != ""].copy()
    pairs["inter_size"] = pairs["n"].astype("int64")
    pairs["vocab_a"] = pairs["lang_a"].map(vocab).astype("int64")
    pairs["vocab_b"] = pairs["lang_b"].map(vocab).astype("int64")
    pairs["union_size"] = (
        pairs["vocab_a"] + pairs["vocab_b"] - pairs["inter_size"]
    ).astype("int64")
    pairs["jaccard"] = pairs["inter_size"].to_numpy(dtype="int64").astype(
        np.float64
    ) / pairs["union_size"].to_numpy(dtype="int64").astype(np.float64)
    out = pairs[
        ["lang_a", "lang_b", "inter_size", "vocab_a", "vocab_b",
         "union_size", "jaccard"]
    ]
    return out.sort_values(["lang_a", "lang_b"]).reset_index(drop=True)


def token_shift_report(sf_dir: str) -> pd.DataFrame:
    """TOKEN SHIFT report: the 20 tokens most over-represented in the
    even-numbered sources versus the odd-numbered ones — the domain
    -shift / split-leakage audit a training-data pipeline runs before
    mixing corpora (a token whose rate differs wildly between "halves"
    of the same crawl flags templating or source skew).

    Exactness: ranking by the rate difference ca/ta − cb/tb is float
    -unpinnable, so the sort key is the CROSS-MULTIPLIED integer
    ``shift_score = ca·tb − cb·ta`` (same sign and order as the rate
    difference; exact int64 to ~3·10⁹ tokens per side — beyond that,
    downscale totals by a common factor first). Ties break on the token
    string, so the LIMIT boundary is deterministic on both sides.

    Scale plan: one tiny totals pass (2 ints per batch), then the
    wordcount shape — vectorized batch-distinct (token, grp, n)
    partials, ONE token-hash bucket shuffle (strings ship once per
    distinct (batch, token): this op must surface the token STRING, so
    unlike the hapax/vocab-growth families it cannot hash-only), a
    per-bucket pivot + exact-score top-20 prune, and a driver top-20
    over ≤ buckets×20 candidates."""
    from ray.data.aggregate import Sum

    from ..functions import textkit
    from ..stages.relops import _WB

    num_buckets = 64

    def _grp_codes(t: pa.Table) -> np.ndarray:
        g = pc.cast(
            pc.utf8_slice_codeunits(t["source"], 3, 32), pa.int64()
        )
        return (
            np.asarray(g.to_numpy(zero_copy_only=False), dtype=np.int64) % 2
        )

    def _totals(t: pa.Table) -> pa.Table:
        flat, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        grp = np.repeat(_grp_codes(t), np.diff(ptr))
        return pa.table(
            {
                "ta": pa.array([int((grp == 0).sum())], pa.int64()),
                "tb": pa.array([int((grp == 1).sum())], pa.int64()),
            }
        )

    docs = _read(sf_dir, "documents", ["source", "text"])
    tot = docs.map_batches(_totals, batch_format="pyarrow").aggregate(
        Sum("ta", alias_name="ta"), Sum("tb", alias_name="tb")
    )
    ta, tb = int(tot["ta"]), int(tot["tb"])

    _EMPTY = pa.table(
        {
            "token": pa.array([], pa.string()),
            "ca": pa.array([], pa.int64()),
            "cb": pa.array([], pa.int64()),
            _WB: pa.array([], pa.int64()),
        }
    )

    def _partials(t: pa.Table) -> pa.Table:
        flat, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        if len(flat) == 0:
            return _EMPTY
        grp = np.repeat(_grp_codes(t), np.diff(ptr))
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        comp, cnt = np.unique(code * 2 + grp, return_counts=True)
        k_tok = (comp // 2).astype(np.int64)
        k_grp = (comp % 2).astype(np.int64)
        n = cnt.astype(np.int64)
        h1, _h2 = textkit.hash2_strings(
            vocab.to_numpy(zero_copy_only=False), salt="hx"
        )
        return pa.table(
            {
                "token": vocab.take(pa.array(k_tok)),
                "ca": pa.array(np.where(k_grp == 0, n, 0)),
                "cb": pa.array(np.where(k_grp == 1, n, 0)),
                _WB: pa.array(
                    (h1[k_tok].astype(np.uint64) % np.uint64(num_buckets))
                    .astype(np.int64)
                ),
            }
        )

    def _bucket_top(g: pa.Table) -> pa.Table:
        s = g.group_by("token").aggregate([("ca", "sum"), ("cb", "sum")])
        ca = np.asarray(s["ca_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cb = np.asarray(s["cb_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        score = ca * np.int64(tb) - cb * np.int64(ta)
        toks = np.asarray(s["token"].to_numpy(zero_copy_only=False), dtype=object)
        order = np.lexsort((toks, -score))[:20]
        return pa.table(
            {
                "token": pa.array(toks[order], pa.string()),
                "ca": pa.array(ca[order]),
                "cb": pa.array(cb[order]),
                "shift_score": pa.array(score[order]),
            }
        )

    cand = (
        docs.map_batches(_partials, batch_format="pyarrow", batch_size=4096)
        .groupby(_WB)
        .map_groups(_bucket_top, batch_format="pyarrow")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["shift_score", "token"], ascending=[False, True]
    ).head(20)
    for c in ("ca", "cb", "shift_score"):
        cand[c] = cand[c].astype("int64")
    return cand[["token", "ca", "cb", "shift_score"]].reset_index(drop=True)


def profit_by_nation_year(sf_dir: str) -> pd.DataFrame:
    """Four-dimension star join (TPC-H Q9 shape, adapted to the columns
    this corpus has): per (supplier nation, order year) profit =
    Σ round((l_extendedprice*(1-l_discount) - 0.6*p_retailprice
    *l_quantity) * 100) — revenue minus an imputed 60%-of-retail cost,
    in exact integer cents.

    Scale plan: the fact table streams ONCE; part / supplier / orders
    dims attach size-routed (broadcast searchsorted under
    _BROADCAST_SIDE_ROUTE_ROWS per side, distributed hash_join above —
    orders is the side that actually grows, its dim is pre-projected to
    (orderkey, year) before either route), nation name is a 25-entry
    lut, and every batch pre-aggregates (nation, year, profit) partials
    so the final groupby sees O(nations x years x blocks) rows. The
    per-row double expression is identically parenthesized on both
    sides; sums are int64."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    def _prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]),
        )
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev": rev,
                "l_quantity": t["l_quantity"],
            }
        )

    items = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).map_batches(_prep, batch_format="pyarrow")

    def _rows(table: str) -> int:
        return _fact_rows(sf_dir, table)

    # part dim: partkey -> retail price (double feeds the per-row formula)
    if _rows("part") <= _BROADCAST_SIDE_ROUTE_ROWS:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
        )
        part = pa.table(
            {
                "p_partkey": pc.cast(part["p_partkey"], pa.int64()),
                "retail": part["p_retailprice"],
            }
        )
        items = broadcast_join(items, part, key="l_partkey", right_key="p_partkey")
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                    "retail": t["p_retailprice"],
                }
            ),
            batch_format="pyarrow",
        )
        items = hash_join(items, part_ds, key="l_partkey", right_key="p_partkey")

    # supplier dim: suppkey -> nationkey
    if _rows("supplier") <= _BROADCAST_SIDE_ROUTE_ROWS:
        supp = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        supp = pa.table(
            {
                "s_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
                "nat": pc.cast(supp["s_nationkey"], pa.int64()),
            }
        )
        items = broadcast_join(items, supp, key="l_suppkey", right_key="s_suppkey")
    else:
        supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda t: pa.table(
                {
                    "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                    "nat": pc.cast(t["s_nationkey"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        items = hash_join(items, supp_ds, key="l_suppkey", right_key="s_suppkey")

    # orders dim: orderkey -> order year (the side that grows with the fact
    # table — pre-projected to two int64 columns before either route)
    def _odim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    if _rows("orders") <= _BROADCAST_SIDE_ROUTE_ROWS:
        odim = _odim(
            pq.read_table(
                f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
            )
        )
        items = broadcast_join(items, odim, key="l_orderkey", right_key="o_orderkey")
    else:
        odim_ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
            _odim, batch_format="pyarrow"
        )
        items = hash_join(items, odim_ds, key="l_orderkey", right_key="o_orderkey")

    nation_names = {
        int(k): v
        for k, v in zip(
            *pq.read_table(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).to_pydict().values()
        )
    }
    lut = np.empty(max(nation_names) + 1, dtype=object)
    for k, v in nation_names.items():
        lut[k] = v

    def _partials(t: pa.Table) -> pa.Table:
        cost = pc.multiply(
            pc.multiply(pa.scalar(0.6), t["retail"]), t["l_quantity"]
        )
        # this expression lands on exact .5 cents often (money inputs with
        # exact binary fractions) — DuckDB ROUND is half-AWAY-from-zero,
        # Arrow defaults to half-to-even, so pin the tie direction
        profit_c = pc.cast(
            pc.round(
                pc.multiply(pc.subtract(t["rev"], cost), pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        keys = np.asarray(t["nat"].to_numpy(zero_copy_only=False), dtype=np.int64)
        g = (
            pa.table(
                {
                    "n_name": pa.array(lut[keys], pa.string()),
                    "o_year": t["o_year"],
                    "p": profit_c,
                }
            )
            .group_by(["n_name", "o_year"])
            .aggregate([("p", "sum")])
        )
        return pa.table(
            {
                "n_name": g["n_name"],
                "o_year": g["o_year"],
                "p": pc.cast(g["p_sum"], pa.int64()),
            }
        )

    out = (
        items.map_batches(_partials, batch_format="pyarrow")
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("p", alias_name="profit_c"))
        .to_pandas()
    )
    out["o_year"] = out["o_year"].astype("int64")
    out["profit_c"] = out["profit_c"].astype("int64")
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


def supplier_abc_classes(sf_dir: str) -> pd.DataFrame:
    """Global ABC CLASSIFICATION of suppliers by cumulative account
    -balance share (the inventory-management 80/20 cut): suppliers sorted
    by balance descending, class A while the inclusive running sum stays
    within 50% of the total, B within 80%, C beyond — the global
    -prefix-scan shape (functions/enumerate.attach_running_sum: sampled
    range boundaries, per-range sums, O(ranges) driver scan), classified
    entirely in exact integer cents (2*run <= tot and 5*run <= 4*tot, no
    percentage doubles anywhere)."""
    from ray.data.aggregate import Sum

    from ..functions.enumerate import attach_running_sum

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "bal_c": _to_scaled_int(t["s_acctbal"], 100),
                "neg_c": pc.multiply(
                    _to_scaled_int(t["s_acctbal"], 100), pa.scalar(-1, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: total + running sum

    tot = int(supp.aggregate(Sum("bal_c", alias_name="t"))["t"])
    run = attach_running_sum(
        supp, ["neg_c", "s_suppkey"], "bal_c", sum_col="run_c"
    )

    def _classify(t: pa.Table) -> pa.Table:
        r = np.asarray(t["run_c"].to_numpy(zero_copy_only=False), dtype=np.int64)
        abc = np.where(
            2 * r <= tot, "A", np.where(5 * r <= 4 * tot, "B", "C")
        )
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "bal_c": t["bal_c"],
                "run_c": pc.cast(t["run_c"], pa.int64()),
                "abc": pa.array(abc, pa.string()),
            }
        )

    out = run.map_batches(_classify, batch_format="pyarrow").to_pandas()
    return out.sort_values("s_suppkey").reset_index(drop=True)


def user_active_week_mask(sf_dir: str) -> pd.DataFrame:
    """Per-user ACTIVITY BITMASK — bitwise-OR aggregate family (the one
    aggregate shape Ray/Arrow's builtin Sum/Count/Min/Max set lacks):
    dow_mask-style OR of 1 << iso_week(ts) over each user's events, plus
    the distinct-week count (popcount of the mask) and total events.
    ISO weeks 1..53 keep the mask inside int64.

    Scale plan: batch-local lexsort + np.bitwise_or.reduceat partials
    (one (user, mask, n) row per user per batch), ONE user-hash bucket
    shuffle, per-bucket OR/sum rollup — raw events never shuffle and the
    OR is associative/commutative so any partial grouping is exact."""
    from ..stages.relops import _WB, _route_by_group

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(t: pa.Table) -> pa.Table:
        u = np.asarray(
            pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        wk = np.asarray(
            pc.cast(pc.iso_week(t["ts"]), pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        bits = np.int64(1) << wk
        o = np.argsort(u, kind="stable")
        us, bs = u[o], bits[o]
        starts = np.nonzero(
            np.concatenate([[True], us[1:] != us[:-1]])
        )[0]
        mask = np.bitwise_or.reduceat(bs, starts)
        ends = np.concatenate([starts[1:], [len(us)]])
        return pa.table(
            {
                "user_id": pa.array(us[starts]),
                "mask": pa.array(mask),
                "n": pa.array((ends - starts).astype(np.int64)),
            }
        )

    def _rollup(g: pa.Table) -> pa.Table:
        u = np.asarray(g["user_id"].to_numpy(zero_copy_only=False))
        m = np.asarray(g["mask"].to_numpy(zero_copy_only=False))
        n = np.asarray(g["n"].to_numpy(zero_copy_only=False))
        o = np.argsort(u, kind="stable")
        us, ms, ns = u[o], m[o], n[o]
        starts = np.nonzero(
            np.concatenate([[True], us[1:] != us[:-1]])
        )[0]
        mask = np.bitwise_or.reduceat(ms, starts)
        n_events = np.add.reduceat(ns, starts)
        # popcount via uint64 view (np.bit_count needs numpy >= 2)
        pop = np.array(
            [int(x).bit_count() for x in mask.tolist()], dtype=np.int64
        )
        return pa.table(
            {
                "user_id": pa.array(us[starts]),
                "week_mask": pa.array(mask),
                "n_active_weeks": pa.array(pop),
                "n_events": pa.array(n_events),
            }
        )

    out = (
        _route_by_group(
            ev.map_batches(_partial, batch_format="pyarrow"), "user_id", 32
        )
        .groupby(_WB)
        .map_groups(_rollup, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def _ntile_from_rank(rank0: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from a 0-based dense row number over n rows: the
    first n % k tiles take floor(n/k)+1 rows, the rest floor(n/k)."""
    q, rem = divmod(n, k)
    boundary = rem * (q + 1)
    small = rank0 < boundary
    tile = np.empty(len(rank0), dtype=np.int64)
    tile[small] = rank0[small] // (q + 1) + 1
    if q > 0:
        tile[~small] = rem + (rank0[~small] - boundary) // q + 1
    return tile


def customer_rfm_scores(sf_dir: str) -> pd.DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary quartiles) — the
    classic customer-scoring composite: one per-customer aggregate pass,
    then THREE distributed global rank passes (functions/enumerate
    .attach_dense_index: sampled range boundaries, O(ranges) driver
    state) over the same Dataset — no joins, each pass just attaches an
    index column — and a final map deriving NTILE(4) tiles from the
    ranks with SQL's first-tiles-take-the-remainder fill. Ties are
    pinned by custkey on both sides, so the quartile assignment is
    deterministic."""
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.enumerate import attach_dense_index

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "mx_us": pc.cast(t["o_orderdate"], pa.int64()),
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    per_cust = (
        orders.map_batches(_prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Max("mx_us", alias_name="mx_us"),
            Count(alias_name="cnt"),
            Sum("cents", alias_name="sum_c"),
        )
        .materialize()
    )
    n = per_cust.count()

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        # small route: the per-customer aggregate is one driver table —
        # three np.lexsort rank passes beat three range-partition passes
        # of pure fixed latency (the dense-index plan below is the 10^8+
        # -customer path, route-forced green by the hash-path test)
        p = per_cust.to_pandas()
        ck = p["o_custkey"].to_numpy(dtype="int64")
        tiles = {}
        for name, col in (
            ("r_tile", p["mx_us"].to_numpy(dtype="int64")),
            ("f_tile", p["cnt"].to_numpy(dtype="int64")),
            ("m_tile", p["sum_c"].to_numpy(dtype="int64")),
        ):
            order = np.lexsort((ck, -col))
            rank0 = np.empty(len(ck), dtype=np.int64)
            rank0[order] = np.arange(len(ck), dtype=np.int64)
            tiles[name] = _ntile_from_rank(rank0, n, 4)
        out = pd.DataFrame(
            {
                "c_custkey": ck,
                "r_tile": tiles["r_tile"],
                "f_tile": tiles["f_tile"],
                "m_tile": tiles["m_tile"],
                "rfm": 100 * tiles["r_tile"] + 10 * tiles["f_tile"]
                + tiles["m_tile"],
            }
        )
        return out.sort_values("c_custkey").reset_index(drop=True)

    ds = attach_dense_index(
        per_cust, ["mx_us", "o_custkey"], ascending=[False, True],
        index_col="r_rank",
    )
    ds = attach_dense_index(
        ds, ["cnt", "o_custkey"], ascending=[False, True], index_col="f_rank"
    )
    ds = attach_dense_index(
        ds, ["sum_c", "o_custkey"], ascending=[False, True], index_col="m_rank"
    )

    def _tiles(t: pa.Table) -> pa.Table:
        r = _ntile_from_rank(
            np.asarray(t["r_rank"].to_numpy(zero_copy_only=False)) - 1, n, 4
        )
        f = _ntile_from_rank(
            np.asarray(t["f_rank"].to_numpy(zero_copy_only=False)) - 1, n, 4
        )
        m = _ntile_from_rank(
            np.asarray(t["m_rank"].to_numpy(zero_copy_only=False)) - 1, n, 4
        )
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "r_tile": pa.array(r),
                "f_tile": pa.array(f),
                "m_tile": pa.array(m),
                "rfm": pa.array(100 * r + 10 * f + m),
            }
        )

    out = ds.map_batches(_tiles, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def doc_bigram_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-document NOVELTY score — the share of a doc's distinct
    adjacent-token bigrams whose GLOBAL first occurrence (min doc_id) is
    this doc: the contribution-attribution statistic a dedup/curation
    pipeline uses to find template-heavy vs original documents.

    Scale plan: each batch forms its bigrams vectorized (the
    top_bigrams flat-buffer kernel) and emits batch-local DISTINCT
    (doc_id, bigram) pairs — a doc lives in exactly one batch row, so
    batch-distinct IS globally distinct and the per-doc denominator
    never shuffles at all. The numerator is ONE bigram groupby
    (Min(doc_id)) followed by per-batch (first_doc, 1) partial counts
    into a small doc groupby — no join-back of the vocabulary. The two
    O(docs) tables meet in a size-routed left join."""
    from ..stages.joins import broadcast_join, hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    den, num = _bigram_novelty_parts(ds)

    n_docs = _fact_rows(sf_dir, "documents")
    if n_docs <= _BROADCAST_SIDE_ROUTE_ROWS:
        np_ = num.to_pandas()
        num_tbl = pa.table(
            {
                "doc_id": pa.array(np_["doc_id"].to_numpy(dtype="int64")),
                "n_new": pa.array(np_["n_new"].to_numpy(dtype="int64")),
            }
        )
        j = broadcast_join(den, num_tbl, key="doc_id", how="left_outer")
    else:
        j = hash_join(den, num, key="doc_id", how="left_outer")

    def _final(t: pa.Table) -> pa.Table:
        nb = np.asarray(
            pc.cast(t["n_bigrams"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        nn = np.asarray(
            pc.fill_null(pc.cast(t["n_new"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(nb),
                "n_new": pa.array(nn),
                "novelty": pa.array(
                    nn.astype(np.float64) / nb.astype(np.float64), pa.float64()
                ),
            }
        )

    out = j.map_batches(_final, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _bigram_novelty_parts(ds):
    """Shared builder for the bigram first-occurrence novelty family:
    returns ``(den, num)`` Datasets — per-doc distinct-bigram counts
    (no shuffle: a doc lives in one batch row, so batch-distinct IS
    globally distinct) and per-doc first-occurrence counts (ONE
    vocabulary Min-groupby, no vocabulary join-back). Docs with < 2
    tokens have no bigrams and appear in neither table.

    Scale plan (round-4: the string-shuffle fix VERDICT flagged):
    bigram IDENTITY is a 128-bit hash — two independent siphash-64
    values of the bigram string (distinct ``hash_key``s) — computed
    once per batch-distinct bigram via dictionary-encode, so the
    materialized pair table and the vocabulary exchange carry three
    int64s per row instead of a variable-width string (~2-4x smaller
    at web-corpus bigram lengths). A collision needs BOTH 64-bit
    hashes to collide on two distinct bigrams (~2^-128 per pair — the
    same identity-trust model as the md5 fingerprints the exact-dedup
    family keys on). The Min-groupby additionally pre-combines
    batch-locally, so the shuffle ships each batch's vocabulary once,
    not every (doc, bigram) pair."""
    from ray.data.aggregate import Min, Sum

    def _pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "b1": pa.array([], pa.int64()),
                "b2": pa.array([], pa.int64()),
            }
        )
        words = pc.split_pattern(pc.cast(batch["text"], pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(offsets[0])
        flat = words.values.slice(base, int(offsets[-1]) - base)
        m = len(flat)
        if m < 2:
            return empty
        valid = np.ones(m - 1, dtype=bool)
        ends = offsets[1:] - base - 1
        valid[ends[(ends >= 0) & (ends < m - 1)]] = False
        doc_ids = np.asarray(
            batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        # bigram at flat position i belongs to the doc whose token range
        # contains i
        owner = (
            np.searchsorted(offsets - base, np.arange(m - 1), side="right") - 1
        )
        left = flat.slice(0, m - 1).filter(pa.array(valid))
        right = flat.slice(1, m - 1).filter(pa.array(valid))
        big = pc.binary_join_element_wise(left, right, " ")
        docs = doc_ids[owner[valid]]
        if len(big) == 0:
            return empty
        # hash once per batch-distinct bigram (dictionary-encode first —
        # zipfian streams repeat heavily), two independent siphash keys
        enc = pc.dictionary_encode(big)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_numpy(zero_copy_only=False)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = pd.util.hash_array(
            vocab, hash_key="nkj.bigram.key.1", categorize=False
        ).view(np.int64)
        h2 = pd.util.hash_array(
            vocab, hash_key="nkj.bigram.key.2", categorize=False
        ).view(np.int64)
        return (
            pa.table(
                {
                    "doc_id": pa.array(docs),
                    "b1": pa.array(h1[idx]),
                    "b2": pa.array(h2[idx]),
                }
            )
            .group_by(["doc_id", "b1", "b2"])
            .aggregate([])
        )

    pairs = ds.map_batches(_pairs, batch_format="pyarrow").materialize()

    # denominator: batch-distinct pairs are globally distinct, so the
    # per-doc count is exact without any shuffle
    def _den(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("b1", "count")])
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "n_bigrams": pc.cast(g["b1_count"], pa.int64()),
            }
        )

    den = pairs.map_batches(_den, batch_format="pyarrow")

    # numerator: batch-local pre-Min (each batch's vocabulary once),
    # then the ONE global Min-groupby over 128-bit bigram identities
    def _pre_min(t: pa.Table) -> pa.Table:
        g = t.group_by(["b1", "b2"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["b1", "b2", "doc_min"])

    first = (
        pairs.map_batches(_pre_min, batch_format="pyarrow")
        .groupby(["b1", "b2"])
        .aggregate(Min("doc_min", alias_name="first_doc"))
    )

    def _num_partials(t: pa.Table) -> pa.Table:
        g = t.group_by("first_doc").aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": pc.cast(g["first_doc"], pa.int64()),
                "k": pc.cast(g["count_all"], pa.int64()),
            }
        )

    num = (
        first.map_batches(_num_partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("k", alias_name="n_new"))
    )
    return den, num


def _novelty_gate(ds, thr: float):
    """Bigram-novelty NOISE SCREEN for pipeline composition: keep docs
    whose first-occurrence bigram share is <= ``thr`` — documents whose
    bigrams are overwhelmingly never-seen-again are the OCR-garbage /
    gibberish tail a curation pass drops (docs with < 2 tokens have no
    bigrams and drop too). The O(docs) novelty table is computed by
    :func:`_bigram_novelty_parts`; the keep-set attaches back size
    -routed — broadcast isin below _BROADCAST_SIDE_ROUTE_ROWS docs,
    left-semi hash_join above. Input must be deterministic (it streams
    twice: novelty + filter)."""
    from ..stages.joins import broadcast_join, hash_join

    ds = ds.materialize()
    den, num = _bigram_novelty_parts(ds)
    joined = hash_join(den, num, key="doc_id", how="left_outer")

    def _keep_ids(t: pa.Table) -> pa.Table:
        nb = np.asarray(
            pc.cast(t["n_bigrams"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        nn = np.asarray(
            pc.fill_null(pc.cast(t["n_new"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
        )
        nov = nn.astype(np.float64) / nb.astype(np.float64)
        m = nov <= thr
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(m))
            }
        )

    keep = joined.map_batches(_keep_ids, batch_format="pyarrow").materialize()
    if keep.count() <= _BROADCAST_SIDE_ROUTE_ROWS:
        ids = np.sort(keep.to_pandas()["doc_id"].to_numpy(dtype="int64"))

        def _filter(t: pa.Table) -> pa.Table:
            d = np.asarray(
                pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
            )
            pos = np.clip(np.searchsorted(ids, d), 0, max(len(ids) - 1, 0))
            m = (ids[pos] == d) if len(ids) else np.zeros(len(d), bool)
            return t.filter(pa.array(m))

        return ds.map_batches(_filter, batch_format="pyarrow")
    return hash_join(ds, keep, key="doc_id", how="left_semi")


def nation_revenue_share_in_region(sf_dir: str) -> pd.DataFrame:
    """RATIO-TO-REPORT window shape: each nation's share of its REGION's
    order revenue — a two-level rollup where the inner group divides by
    its super-group total. Customer attach is size-routed; every batch
    pre-aggregates (nationkey, cents) so the exchange is O(nations x
    blocks); the 25-row nation result takes its region totals on the
    driver (fixed-cardinality dimension, same contract as
    nation_revenue's small route). Exact integer cents; one double
    division per row."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        cust_tbl = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        joined = broadcast_join(
            orders, cust_tbl, key="o_custkey", right_key="c_custkey"
        )
    else:
        joined = hash_join(
            orders,
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
            key="o_custkey",
            right_key="c_custkey",
        )

    def _partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"nat": pc.cast(t["c_nationkey"], pa.int64()),
                      "c": t["cents"]})
            .group_by("nat")
            .aggregate([("c", "sum")])
        )
        return pa.table(
            {"nat": g["nat"], "c": pc.cast(g["c_sum"], pa.int64())}
        )

    per_nat = (
        joined.map_batches(_partials, batch_format="pyarrow")
        .groupby("nat")
        .aggregate(Sum("c", alias_name="rev_c"))
        .to_pandas()
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pd.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    m = per_nat.merge(nation, left_on="nat", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    m["rev_c"] = m["rev_c"].astype("int64")
    region_tot = m.groupby("r_name")["rev_c"].transform("sum").astype("int64")
    m["region_c"] = region_tot
    m["share"] = m["rev_c"].to_numpy(dtype="int64").astype(np.float64) / (
        region_tot.to_numpy(dtype="int64").astype(np.float64)
    )
    out = m[["n_name", "r_name", "rev_c", "region_c", "share"]]
    return out.sort_values("n_name").reset_index(drop=True)


def avg_neighbor_degree_customers(sf_dir: str) -> pd.DataFrame:
    """Average NEIGHBOR degree per node (the assortativity feature — one
    round of message passing: each node averages its neighbors'
    degrees) over the order-derived customer graph.

    Scale plan: canonical edges once (shared helper), degrees via the
    batch-partial groupby, neighbor-degree attach size-routed
    (broadcast searchsorted on the O(nodes) degree table, hash_join
    above), per-batch (node, sum_deg, cnt) partials into one final
    groupby. Exact int64 sums; one double division. Below the
    _order_edges_driver bound the whole query is one numpy pass
    (distributed plan route-forced by the hash-path test)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, _maxc = drv
        deg_nodes, deg_cnt = np.unique(
            np.concatenate([a, b]), return_counts=True
        )
        u = np.concatenate([b, a])  # neighbor of v = concat(a, b)
        v_codes = np.searchsorted(deg_nodes, np.concatenate([a, b]))
        nb_deg = deg_cnt[np.searchsorted(deg_nodes, u)]
        # float64 bincount sums are exact here: sum_deg <= deg^2 << 2^53
        # at the 1M-edge driver bound
        sum_deg = np.bincount(
            v_codes, weights=nb_deg, minlength=len(deg_nodes)
        ).astype(np.int64)
        d = deg_cnt.astype(np.int64)
        return pd.DataFrame(
            {
                "node": deg_nodes,
                "deg": d,
                "sum_deg": sum_deg,
                "avg_neighbor_deg": sum_deg.astype(np.float64)
                / d.astype(np.float64),
            }
        ).sort_values("node").reset_index(drop=True)

    edges, _maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges)

    def _dirs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b])),
                "u": pa.array(np.concatenate([b, a])),
            }
        )

    dirs = edges.map_batches(_dirs, batch_format="pyarrow")

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        dp = deg.to_pandas()
        deg_tbl = pa.table(
            {
                "node": pa.array(dp["node"].to_numpy(dtype="int64")),
                "nb_deg": pa.array(dp["deg"].to_numpy(dtype="int64")),
            }
        )
        j = broadcast_join(dirs, deg_tbl, key="u", right_key="node")
    else:
        nb = deg.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "nb_deg": pc.cast(t["deg"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        j = hash_join(dirs, nb, key="u", right_key="node")

    def _partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "v": t["v"],
                    "s": pc.cast(t["nb_deg"], pa.int64()),
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by("v")
            .aggregate([("s", "sum"), ("one", "sum")])
        )
        return pa.table(
            {
                "node": g["v"],
                "s": pc.cast(g["s_sum"], pa.int64()),
                "d": pc.cast(g["one_sum"], pa.int64()),
            }
        )

    agg = (
        j.map_batches(_partials, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("s", alias_name="sum_deg"), Sum("d", alias_name="deg"))
        .to_pandas()
    )
    agg["sum_deg"] = agg["sum_deg"].astype("int64")
    agg["deg"] = agg["deg"].astype("int64")
    agg["avg_neighbor_deg"] = agg["sum_deg"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["deg"].to_numpy(dtype="int64").astype(np.float64)
    out = agg[["node", "deg", "sum_deg", "avg_neighbor_deg"]]
    return out.sort_values("node").reset_index(drop=True)


def degree_assortativity_customers(sf_dir: str) -> pd.DataFrame:
    """DEGREE ASSORTATIVITY of the order-derived customer graph: the
    Pearson correlation of (deg(v), deg(u)) over all directed neighbor
    pairs of the canonical undirected edge set (Newman 2002) — does the
    graph wire hubs to hubs (r > 0, social-network shape) or hubs to
    leaves (r < 0, web/crawl-host shape)?

    Exactness + scale plan: over directed pairs the marginal moments
    are node-local — n = Σdeg, sx = sy = Σdeg², sxx = syy = Σdeg³ —
    so they come straight off the O(nodes) degree table (batch partials
    + one tiny Sum); only the cross moment sxy = 2·Σ_edges deg(a)·deg(b)
    touches the edge list, with the degree table attached size-routed
    (broadcast searchsorted ≤ _BROADCAST_SIDE_ROUTE_ROWS, hash_join ×2
    above) and reduced per batch. All moments are exact int64 (safe to
    deg ≤ ~2·10⁵ at 10⁸ nodes: Σdeg³ ≤ ~10¹⁸ — beyond that bucket the
    degree tail first); the final r is ONE identically-parenthesized
    double formula on both sides. Below the _order_edges_driver bound
    the whole query is one numpy pass (distributed plan route-forced by
    the graph-route test)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, hash_join

    def _finish(n_i: int, sx_i: int, sxx_i: int, sxy_i: int) -> pd.DataFrame:
        n = np.float64(n_i)
        sx = np.float64(sx_i)
        sy = np.float64(sx_i)
        sxx = np.float64(sxx_i)
        syy = np.float64(sxx_i)
        sxy = np.float64(sxy_i)
        r = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        return pd.DataFrame(
            {
                "n_pairs": pd.Series([n_i], dtype="int64"),
                "assortativity": pd.Series([r], dtype="float64"),
            }
        )

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, _maxc = drv
        nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        d = cnt.astype(np.int64)
        da = d[np.searchsorted(nodes, a)]
        db = d[np.searchsorted(nodes, b)]
        return _finish(
            int(d.sum()),
            int((d * d).sum()),
            int((d * d * d).sum()),
            2 * int((da * db).sum()),
        )

    edges, _maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges).materialize()  # O(nodes); consumed twice

    def _marginals(t: pa.Table) -> pa.Table:
        d = np.asarray(t["deg"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "n": pa.array([int(d.sum())], pa.int64()),
                "s2": pa.array([int((d * d).sum())], pa.int64()),
                "s3": pa.array([int((d * d * d).sum())], pa.int64()),
            }
        )

    marg = deg.map_batches(_marginals, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("s2", alias_name="s2"),
        Sum("s3", alias_name="s3"),
    )

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        dp = deg.to_pandas()
        nodes = dp["node"].to_numpy(dtype="int64")
        dv = dp["deg"].to_numpy(dtype="int64")
        order = np.argsort(nodes)
        nodes, dv = nodes[order], dv[order]
        node_ref = ray.put(nodes)
        deg_ref = ray.put(dv)

        def _xy(t: pa.Table) -> pa.Table:
            nd, dd = ray.get(node_ref), ray.get(deg_ref)
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
            da = dd[np.searchsorted(nd, a)]
            db = dd[np.searchsorted(nd, b)]
            return pa.table(
                {"xy": pa.array([2 * int((da * db).sum())], pa.int64())}
            )

        sxy = int(
            edges.map_batches(_xy, batch_format="pyarrow").aggregate(
                Sum("xy", alias_name="xy")
            )["xy"]
        )
    else:
        da_t = deg.map_batches(
            lambda t: pa.table(
                {"node_a": t["node"], "dega": pc.cast(t["deg"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        db_t = deg.map_batches(
            lambda t: pa.table(
                {"node_b": t["node"], "degb": pc.cast(t["deg"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        j = hash_join(edges, da_t, key="a", right_key="node_a")
        j = hash_join(j, db_t, key="b", right_key="node_b")

        def _xy2(t: pa.Table) -> pa.Table:
            da = np.asarray(
                t["dega"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            db = np.asarray(
                t["degb"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            return pa.table(
                {"xy": pa.array([2 * int((da * db).sum())], pa.int64())}
            )

        sxy = int(
            j.map_batches(_xy2, batch_format="pyarrow").aggregate(
                Sum("xy", alias_name="xy")
            )["xy"]
        )

    return _finish(int(marg["n"]), int(marg["s2"]), int(marg["s3"]), sxy)


def event_value_autocorr(sf_dir: str) -> pd.DataFrame:
    """LAG-1 AUTOCORRELATION of the value series per event type (ordered
    by ts with event_id tie-break): Pearson correlation of consecutive
    (vᵢ, vᵢ₊₁) pairs — the temporal-structure audit (near zero for
    memoryless streams, high for drifting meters; the sequential cousin
    of nation_price_qty_corr's exact-integer-moments family).

    Scale plan: values go to exact integer cents per batch, ONE
    type-hash bucket shuffle co-locates each type's full series, and
    every bucket lexsorts once and reduces its consecutive same-segment
    pairs to SIX int64 moment partials per type — the final groupby
    sees O(types × buckets) rows and the corpus never shuffles twice.
    Moments are int64-exact to ~9·10⁸ rows per type at |value| ≤ 10³
    (Σv² ≤ 10¹⁰·rows — drop to whole units beyond); the correlation is
    ONE identically-parenthesized double formula over the exact sums on
    both sides."""
    from ray.data.aggregate import Sum

    from ..stages.relops import _WB, _group_codes, _route_by_group, _segment_bounds

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"]).map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
                "v": _to_scaled_int(t["value"], 100),
            }
        ),
        batch_format="pyarrow",
    )

    def _pair_moments(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_WB])
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
                    },
                }
            )
        codes = _group_codes(g, "event_type")
        us = np.asarray(g["us"].to_numpy(zero_copy_only=False), dtype=np.int64)
        eid = np.asarray(
            g["event_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        order = np.lexsort((eid, us, codes))
        cs = codes[order]
        v = np.asarray(g["v"].to_numpy(zero_copy_only=False), dtype=np.int64)[
            order
        ]
        same = cs[1:] == cs[:-1]
        x, y = v[:-1][same], v[1:][same]
        types = g["event_type"].combine_chunks() if isinstance(
            g["event_type"], pa.ChunkedArray
        ) else g["event_type"]
        pair_type = types.take(
            pa.array(order[:-1][same], pa.int64())
        )
        pairs = pa.table(
            {
                "event_type": pair_type,
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
            }
        )
        s = pairs.group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
        )
        return s.rename_columns(
            ["event_type", "n", "sx", "sy", "sxy", "sxx", "syy"]
        )

    agg = (
        _route_by_group(ev, "event_type", 64)
        .groupby(_WB)
        .map_groups(_pair_moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[
            Sum(c, alias_name=c)
            for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
        ])
        .to_pandas()
    )
    n = agg["n"].to_numpy(dtype="int64").astype(np.float64)
    sx = agg["sx"].to_numpy(dtype="int64").astype(np.float64)
    sy = agg["sy"].to_numpy(dtype="int64").astype(np.float64)
    sxy = agg["sxy"].to_numpy(dtype="int64").astype(np.float64)
    sxx = agg["sxx"].to_numpy(dtype="int64").astype(np.float64)
    syy = agg["syy"].to_numpy(dtype="int64").astype(np.float64)
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n_pairs": agg["n"].astype("int64"),
            "autocorr": (n * sxy - sx * sy)
            / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def event_type_burstiness(sf_dir: str) -> pd.DataFrame:
    """BURSTINESS (Fano factor) of each event type's hourly arrival
    counts: sample variance / mean over the type's OBSERVED hours
    (zero-event hours excluded by definition, mirrored in the oracle) —
    ≈1 for Poisson arrivals, ≫1 for bursty traffic (the crawl-side
    hotspot detector applied to the events table).

    Scale plan: batch partials pre-aggregate (type, hour) counts, ONE
    small groupby collapses to the O(types × hours) count table, a
    second batch-partial pass reduces it to exact int64 moments
    (n, Σc, Σc²) per type, and the driver applies ONE identically
    -parenthesized double formula: ((n·Σc² − Σc·Σc) / (n·(n−1))) /
    (Σc / n)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def _hour_partials(t: pa.Table) -> pa.Table:
        us = np.asarray(
            pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "hour": pa.array(us // 3_600_000_000),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["event_type", "hour"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["event_type", "hour", "n"])

    counts = (
        ev.map_batches(_hour_partials, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="c"))
    )

    def _moments(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"].to_numpy(zero_copy_only=False), dtype=np.int64)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "n": pa.array(np.ones(len(c), dtype=np.int64)),
                    "sc": pa.array(c),
                    "scc": pa.array(c * c),
                }
            )
            .group_by("event_type")
            .aggregate([("n", "sum"), ("sc", "sum"), ("scc", "sum")])
        )
        return g.rename_columns(["event_type", "n", "sc", "scc"])

    agg = (
        counts.map_batches(_moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sc", alias_name="sc"),
            Sum("scc", alias_name="scc"),
        )
        .to_pandas()
    )
    n = agg["n"].to_numpy(dtype="int64").astype(np.float64)
    sc = agg["sc"].to_numpy(dtype="int64").astype(np.float64)
    scc = agg["scc"].to_numpy(dtype="int64").astype(np.float64)
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n_hours": agg["n"].astype("int64"),
            "n_events": agg["sc"].astype("int64"),
            "fano": np.where(
                n > 1,
                ((n * scc - sc * sc) / np.where(n > 1, n * (n - 1), 1.0))
                / (sc / n),
                np.nan,
            ),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def embedding_top_component(sf_dir: str) -> pd.DataFrame:
    """TOP PRINCIPAL COMPONENT of the embedding cloud, dim-routed
    (stages/pca.py): dim ≤ _PCA_COVARIANCE_ROUTE_DIM takes the ONE-PASS
    Gram-partial plan (dim² driver state is a few KB — exact eigh, no
    iteration; 30 s → sub-second at sf0.1), larger dims take the
    kmeans-class power iteration (O(dim) state, one dim-vector partial
    per block per iteration, no dim×dim matrix anywhere). Iterative /
    float-converged → rows-only; pinned by test_pca's exact-eigh
    parity, partition invariance, and cross-route agreement."""
    from ..stages.pca import (
        covariance_top_component,
        power_iteration_top_component,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    first = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, 1)
    dim = len(first["embedding"][0])
    if dim <= _PCA_COVARIANCE_ROUTE_DIM:
        out = covariance_top_component(ds, "embedding", dim)
    else:
        out = power_iteration_top_component(ds, "embedding", dim)
    return pd.DataFrame(
        {
            "dim_idx": pd.Series(np.arange(dim), dtype="int64"),
            "loading": pd.Series(out["component"], dtype="float64"),
            "eigenvalue": pd.Series([out["eigenvalue"]] * dim, dtype="float64"),
            "explained_share": pd.Series(
                [out["explained_share"]] * dim, dtype="float64"
            ),
            "n_vectors": pd.Series([out["n_vectors"]] * dim, dtype="int64"),
        }
    )


def url_token_density_per_source(sf_dir: str) -> pd.DataFrame:
    """URL/EMAIL token density per source: the share of whitespace
    tokens that look like links or addresses — the C4-family
    boilerplate/navigation-chrome audit at the SOURCE grain (a source
    whose density spikes is shipping menus, not prose). Ratio of EXACT
    INT SUMS (the stopword-density lesson), flagged tokens defined by
    one RE2 class: containing '://' or '@' or starting 'www.'.

    Scale plan: shuffle-free — flat whitespace split per batch, one
    vectorized match, O(sources) partials, tiny groupby."""
    from ray.data.aggregate import Sum

    from ..functions import textkit

    ds = _read(sf_dir, "documents", ["source", "text"])
    pat = r"(://|@|^www\.)"

    def _partials(t: pa.Table) -> pa.Table:
        flat, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        if len(flat) == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_urlish": pa.array([], pa.int64()),
                }
            )
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), dtype=object),
            np.diff(ptr),
        )
        hit = np.asarray(
            pc.match_substring_regex(flat, pat).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "source": pa.array(src, pa.string()),
                    "n_tokens": pa.array(np.ones(len(src), dtype=np.int64)),
                    "n_urlish": pa.array(hit),
                }
            )
            .group_by("source")
            .aggregate([("n_tokens", "sum"), ("n_urlish", "sum")])
        )
        return g.rename_columns(["source", "n_tokens", "n_urlish"])

    agg = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_urlish", alias_name="n_urlish"),
        )
        .to_pandas()
    )
    agg["n_tokens"] = agg["n_tokens"].astype("int64")
    agg["n_urlish"] = agg["n_urlish"].astype("int64")
    agg["urlish_share"] = agg["n_urlish"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["n_tokens"].to_numpy(dtype="int64").astype(np.float64)
    return agg[["source", "n_tokens", "n_urlish", "urlish_share"]].sort_values(
        "source"
    ).reset_index(drop=True)


def lang_script_mismatch_docs(sf_dir: str) -> pd.DataFrame:
    """SCRIPT-MISMATCH audit: documents whose language tag demands a
    non-Latin script (zh/ja/ko/ru/ar) but whose text contains ZERO
    non-ASCII characters — the classic mislabeled-document detector
    (char_class_profile_per_lang's per-document companion; this corpus'
    synthetic zh docs are all-ASCII, so the audit fires by design).

    Scale plan: shuffle-free single pass — one RE2 strip-and-measure
    per batch (non-ASCII count = len − len(ascii-only)), a 20-char
    noise floor, output O(flagged docs)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars", "text"])
    cjk = ("zh", "ja", "ko", "ru", "ar")

    def _flag(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        non_ascii = pc.subtract(
            pc.utf8_length(s),
            pc.utf8_length(
                pc.replace_substring_regex(s, r"[^\x00-\x7F]", "")
            ),
        )
        keep = pc.and_(
            pc.and_(
                pc.is_in(t["lang"], value_set=pa.array(list(cjk))),
                pc.equal(non_ascii, pa.scalar(0)),
            ),
            pc.greater_equal(t["n_chars"], pa.scalar(20)),
        )
        out = t.filter(keep)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "lang": out["lang"],
                "n_chars": pc.cast(out["n_chars"], pa.int64()),
            }
        )

    out = ds.map_batches(_flag, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "lang": pd.Series([], dtype="object"),
                "n_chars": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_length_sketch_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language document-length quantiles via the GROUPED mergeable
    quantile sketch — the O(groups × k)-state path that replaces
    lang_length_quantiles' exact histogram when the value domain is
    wide. Approximate by construction → rows-only; pinned by the sketch
    bound tests plus the exact-vs-sketch tolerance check in
    test_queries_duckdb."""
    from ..stages.sketch import grouped_quantile_sketch, quantile_sketch_query

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    sk = grouped_quantile_sketch(ds, "lang", "n_chars", k=256)
    qs = [0.25, 0.5, 0.75]
    rows = []
    for lang in sorted(sk):
        v, w = sk[lang]
        est = quantile_sketch_query(v, w, qs)
        rows.append(
            {
                "lang": lang,
                "n_docs": int(w.sum()),
                "p25_est": int(est[0]),
                "p50_est": int(est[1]),
                "p75_est": int(est[2]),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_docs", "p25_est", "p50_est", "p75_est"):
        out[c] = out[c].astype("int64")
    return out


def order_price_sketch_quantiles(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE order-price quantiles via the mergeable stratified
    quantile sketch (stages/sketch.quantile_sketch) — the O(k) driver
    -state alternative to order_price_percentiles' exact histogram when
    the value domain is wide. Approximate by construction, so rows-only
    for the driver (like HLL/k-means); semantics pinned by
    test_sketch's rank-error bound and test_queries_duckdb's
    exact-vs-sketch tolerance check on this corpus."""
    from ..stages.sketch import quantile_sketch, quantile_sketch_query

    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _to_scaled_int(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    )
    v, w = quantile_sketch(ds, "cents", k=512)
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = quantile_sketch_query(v, w, qs)
    return pd.DataFrame(
        {
            "q": pd.Series(qs, dtype="float64"),
            "price_cents_est": pd.Series(est, dtype="int64"),
            "n_rows": pd.Series([int(w.sum())] * len(qs), dtype="int64"),
        }
    )


def degree_gini_customers(sf_dir: str) -> pd.DataFrame:
    """GINI COEFFICIENT of the canonical customer-graph degree
    distribution — the hub-concentration scalar (0 = regular graph,
    →1 = one hub owns every edge; the inequality companion to
    degree_assortativity_customers over the same edge set).

    Exactness + scale plan: gini = (2·Σi·d₍ᵢ₎ − (n+1)·Σd) / (n·Σd) over
    ascending ordinals i — tied degrees commute in Σi·d, so the whole
    statistic is a pure function of the DEGREE HISTOGRAM: degrees come
    off the shared canonical-edge machinery (one dedup shuffle + one
    groupby), collapse to (degree, n_nodes) partials batch-locally, and
    the driver finishes from O(distinct degrees) rows — run-sum
    identity Σi·v over a tie run of length c starting after a rows is
    v·(c·a + c(c+1)/2). Numerator and denominator are exact integers
    (int64-safe to Σi·d < 2⁶³ ≈ n²·d̄/2 — beyond ~10⁹ nodes bucket the
    histogram tail first); ONE double division on both sides."""
    from ray.data.aggregate import Sum

    def _finish(vals: np.ndarray, cnts: np.ndarray) -> pd.DataFrame:
        order = np.argsort(vals)
        v = vals[order].astype(object)  # python ints: overflow-loud path
        c = cnts[order].astype(object)
        a = np.concatenate(([0], np.cumsum(c)[:-1]))
        n = int(sum(c))
        sd = int(sum(v * c))
        sixd = int(sum(v * (c * a + c * (c + 1) // 2)))
        num = 2 * sixd - (n + 1) * sd
        den = n * sd
        if abs(num) >= 2**63 or den >= 2**63:
            raise ValueError(
                "degree_gini moment exceeds int64 — bucket the degree "
                "histogram tail before the rollup"
            )
        return pd.DataFrame(
            {
                "n_nodes": pd.Series([n], dtype="int64"),
                "gini": pd.Series(
                    [np.float64(num) / np.float64(den)], dtype="float64"
                ),
            }
        )

    drv = _order_edges_driver(sf_dir)
    if drv is not None:
        a, b, _maxc = drv
        _nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        vals, cnts = np.unique(cnt.astype(np.int64), return_counts=True)
        return _finish(vals, cnts.astype(np.int64))

    edges, _maxc = _canonical_order_edges(sf_dir)
    deg = _edge_degrees(edges)

    def _hist(t: pa.Table) -> pa.Table:
        d = np.asarray(t["deg"].to_numpy(zero_copy_only=False), dtype=np.int64)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table(
            {
                "degree": pa.array(vals),
                "n": pa.array(cnts.astype(np.int64)),
            }
        )

    hist = (
        deg.map_batches(_hist, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return _finish(
        hist["degree"].to_numpy(dtype="int64"), hist["n"].to_numpy(dtype="int64")
    )


def events_value_forward_fill(sf_dir: str) -> pd.DataFrame:
    """Per-user FORWARD FILL (LAST_VALUE ... IGNORE NULLS): click events
    carry no usable value in this scenario, so each click inherits the
    latest preceding non-click value of the same user (ordered by ts
    with event_id tie-break); clicks before any non-click event stay
    null. Runs on relops.grouped_forward_fill — one bucket shuffle, one
    lexsort + segment-barrier cummax per bucket; the double payload
    passes through a take untouched, so values are bit-identical to the
    SQL oracle."""
    from ..stages.relops import grouped_forward_fill

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        masked = pc.if_else(
            pc.equal(t["event_type"], pa.scalar("click")),
            pa.scalar(None, pa.float64()),
            t["value"],
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "v": masked,
            }
        )

    out = grouped_forward_fill(
        ev.map_batches(_prep, batch_format="pyarrow"),
        group_col="user_id",
        order_cols=["us", "event_id"],
        value_col="v",
        out_col="filled_value",
    ).select_columns(["event_id", "user_id", "filled_value"]).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def lang_source_chi2_cells(sf_dir: str) -> pd.DataFrame:
    """CHI-SQUARE CONTINGENCY cells over the lang x source grid: observed
    count, expected count under independence (row_total x col_total / N),
    and the per-cell chi² contribution (o-e)²/e — the
    distribution-drift / association test a curation pipeline runs
    between corpus slices. Per-cell output avoids the cross-cell float
    sum whose order SQL does not pin; margins are exact int64 and every
    double op is one identical expression on both sides.

    Scale plan: batch-local (lang, source) count partials, one tiny
    groupby; margins derive from the O(cells) result on the driver
    (fixed-cardinality dims, the nation_revenue small-route contract)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"], "source": t["source"]})
            .group_by(["lang", "source"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "lang": g["lang"],
                "source": g["source"],
                "o": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()
    )
    cells["o"] = cells["o"].astype("int64")
    rt = cells.groupby("lang")["o"].transform("sum").to_numpy(dtype="int64")
    ct = cells.groupby("source")["o"].transform("sum").to_numpy(dtype="int64")
    n = int(cells["o"].sum())
    o = cells["o"].to_numpy(dtype="int64")
    e = (rt * ct).astype(np.float64) / np.float64(n)
    d = o.astype(np.float64) - e
    cells["expected"] = e
    cells["chi2_cell"] = d * d / e
    return cells.sort_values(["lang", "source"]).reset_index(drop=True)


def user_daily_streaks(sf_dir: str) -> pd.DataFrame:
    """GAPS-AND-ISLANDS per user: count of consecutive-day activity
    streaks, the longest streak, and total active days — the classic
    engagement metric built from the day - row_number() island trick.

    Scale plan: batch-local DISTINCT (user, epoch-day) partials, ONE
    user-hash bucket shuffle, per bucket one lexsort then fully
    vectorized island detection (boundary mask -> reduceat island
    lengths -> per-user reduceat of counts/max) — no per-user Python,
    output O(users)."""
    from ..stages.relops import _WB, _route_by_group

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def _days(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
            pa.int64(),
        )
        return (
            pa.table({"user_id": t["user_id"], "d": day})
            .group_by(["user_id", "d"])
            .aggregate([])
        )

    def _streaks(g: pa.Table) -> pa.Table:
        u = np.asarray(g["user_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(g["d"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # cross-batch duplicates of (user, day) collapse here
        keep = np.concatenate([[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])])
        u, d = u[keep], d[keep]
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_streaks": pa.array([], pa.int64()),
                    "longest_streak": pa.array([], pa.int64()),
                    "n_active_days": pa.array([], pa.int64()),
                }
            )
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        new_isl = new_user | np.concatenate([[True], d[1:] != d[:-1] + 1])
        isl_starts = np.nonzero(new_isl)[0]
        isl_len = np.diff(np.concatenate([isl_starts, [n]]))
        isl_user = u[isl_starts]
        user_starts = np.nonzero(
            np.concatenate([[True], isl_user[1:] != isl_user[:-1]])
        )[0]
        n_streaks = np.diff(np.concatenate([user_starts, [len(isl_user)]]))
        longest = np.maximum.reduceat(isl_len, user_starts)
        active = np.add.reduceat(isl_len, user_starts)
        return pa.table(
            {
                "user_id": pa.array(isl_user[user_starts]),
                "n_streaks": pa.array(n_streaks.astype(np.int64)),
                "longest_streak": pa.array(longest.astype(np.int64)),
                "n_active_days": pa.array(active.astype(np.int64)),
            }
        )

    out = (
        _route_by_group(
            ev.map_batches(_days, batch_format="pyarrow"), "user_id", 32
        )
        .groupby(_WB)
        .map_groups(_streaks, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_hourly_dense(sf_dir: str) -> pd.DataFrame:
    """DENSE CALENDAR SPINE: every epoch hour between the corpus's first
    and last event, with the event count zero-filled for silent hours —
    the gap-free timeseries a reporting/forecasting stage needs (a plain
    groupby silently drops empty buckets).

    Scale plan: one streaming min/max aggregate bounds the spine,
    ``ray.data.range`` GENERATES the hour dimension distributed (no
    driver list), and the O(span-hours) observed-count table broadcasts
    onto the spine (left outer searchsorted; the spine never shuffles).
    The span is data-dependent but sf-independent (~2 years of hours);
    a multi-decade spine would flip the join direction."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.joins import broadcast_join

    ev = _read(sf_dir, "events", ["ts"]).map_batches(
        lambda t: pa.table(
            {
                "hr": pc.cast(
                    pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: bounds + counts
    b = ev.aggregate(Min("hr", alias_name="mn"), Max("hr", alias_name="mx"))
    mn, mx = int(b["mn"]), int(b["mx"])

    counts = ev.groupby("hr").aggregate(Count(alias_name="n")).to_pandas()
    counts_tbl = pa.table(
        {
            "hr": pa.array(counts["hr"].to_numpy(dtype="int64")),
            "n": pa.array(counts["n"].to_numpy(dtype="int64")),
        }
    )

    spine = ray.data.range(mx - mn + 1).map_batches(
        lambda t: pa.table(
            {"hr": pc.add(pc.cast(t["id"], pa.int64()), pa.scalar(mn))}
        ),
        batch_format="pyarrow",
    )
    j = broadcast_join(spine, counts_tbl, key="hr", how="left_outer")
    out = j.map_batches(
        lambda t: pa.table(
            {
                "hr": t["hr"],
                "n_events": pc.fill_null(pc.cast(t["n"], pa.int64()), 0),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("hr").reset_index(drop=True)


def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-DIMENSION mean and sample variance of the embedding matrix —
    the feature-drift / whitening profile. Floats are made exact first:
    each value rounds to int micros per row (ties pinned
    half-away-from-zero to match SQL ROUND), the six-figure sums are
    exact int64, and mean/variance come from ONE identical double
    formula on both sides.

    Scale plan: each batch reshapes the Arrow list column's flat value
    buffer (zero-copy) to (rows, dim) and emits per-dim (n, sx, sxx)
    partials — the exchange is O(dims x blocks), the matrix never
    shuffles. Int64 bound: sxx caps at ~1e12 per row-dim at |v| <= 1,
    safe past 10^9 rows per dim."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def _partials(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "sxx": pa.array([], pa.int64()),
                }
            )
        q = pc.cast(
            pc.round(
                pc.multiply(pc.cast(col.values, pa.float64()), 1_000_000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        dim = len(q) // t.num_rows
        m = np.asarray(q, dtype=np.int64).reshape(t.num_rows, dim)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
                "n": pa.array(np.full(dim, t.num_rows, dtype=np.int64)),
                "sx": pa.array(m.sum(axis=0, dtype=np.int64)),
                "sxx": pa.array((m * m).sum(axis=0, dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
    )
    n = agg["n"].to_numpy(dtype="int64").astype(np.float64)
    sx = agg["sx"].to_numpy(dtype="int64").astype(np.float64)
    sxx = agg["sxx"].to_numpy(dtype="int64").astype(np.float64)
    out = pd.DataFrame(
        {
            "dim": agg["dim"].astype("int64"),
            "n": agg["n"].astype("int64"),
            "mean_v": sx / n / 1_000_000.0,
            "var_v": (n * sxx - sx * sx) / (n * (n - 1))
            / 1_000_000.0
            / 1_000_000.0,
        }
    )
    return out.sort_values("dim").reset_index(drop=True)


def order_price_p90cont_by_priority(sf_dir: str) -> pd.DataFrame:
    """Per-priority INTERPOLATED percentile (SQL PERCENTILE_CONT /
    quantile_cont 0.9) of order price in cents — the continuous
    complement of the exact DISCRETE quantile family: position
    (n-1)*q, two-weight lerp lo*(1-frac) + hi*frac between the two
    straddling order statistics, every double op one identical
    expression on both sides (pinned against DuckDB's quantile_cont).

    Scale plan: the median_price_per_nation kernel shape — ONE
    key-routed bucket shuffle, per bucket one lexsort + two
    segment-offset gathers; priorities bound the key space."""
    from ..stages.relops import (
        _WB,
        _group_codes,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    Q = 0.9
    orders = _read(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )

    def _p90(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "o_orderpriority")
        cents = _int64_nonull(g["cents"], "cents")
        order = np.lexsort((cents, codes))
        sc, sv = codes[order], cents[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = (ends - starts).astype(np.int64)
        pos = (n - 1) * Q
        fl = np.floor(pos)
        frac = pos - fl
        lo = sv[starts + fl.astype(np.int64)].astype(np.float64)
        hi = sv[starts + np.ceil(pos).astype(np.int64)].astype(np.float64)
        # DuckDB's quantile_cont is the TWO-WEIGHT lerp lo*(1-f) + hi*f
        # (NOT lo + (hi-lo)*f — the two differ in the last ulp)
        p90 = lo * (1 - frac) + hi * frac
        names = pc.take(
            g["o_orderpriority"].combine_chunks()
            if isinstance(g["o_orderpriority"], pa.ChunkedArray)
            else g["o_orderpriority"],
            pa.array(order[starts]),
        )
        return pa.table(
            {
                "o_orderpriority": names,
                "n_orders": pa.array(n),
                "p90_cents": pa.array(p90, pa.float64()),
            }
        )

    out = (
        _route_by_group(orders, "o_orderpriority", 8)
        .groupby(_WB)
        .map_groups(_p90, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def user_time_to_first_purchase(sf_dir: str) -> pd.DataFrame:
    """CONDITIONAL-MIN aggregate (SQL's MIN(...) FILTER): per user, the
    first event of any type, the first 'purchase', and the activation
    delay between them — only users who ever purchase qualify (the
    HAVING FILTER > 0 gate).

    Scale plan: per-batch Arrow group_by partials carrying BOTH mins
    (the filtered one null when the batch has no purchase — nulls
    propagate through min untouched), one tiny user groupby, a final
    vectorized null-gate; exact int64 epoch-micro arithmetic."""
    from ray.data.aggregate import Min

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        p_us = pc.if_else(
            pc.equal(t["event_type"], pa.scalar("purchase")),
            us,
            pa.scalar(None, pa.int64()),
        )
        g = (
            pa.table({"user_id": t["user_id"], "a": us, "p": p_us})
            .group_by("user_id")
            .aggregate([("a", "min"), ("p", "min")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "a": g["a_min"],
                "p": g["p_min"],
            }
        )

    agg = (
        ev.map_batches(_partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("a", alias_name="first_any_us"),
                   Min("p", alias_name="first_purchase_us"))
        .to_pandas()
    )
    agg = agg[agg["first_purchase_us"].notna()].copy()
    agg["first_any_us"] = agg["first_any_us"].astype("int64")
    agg["first_purchase_us"] = agg["first_purchase_us"].astype("int64")
    agg["delta_us"] = agg["first_purchase_us"] - agg["first_any_us"]
    out = agg[["user_id", "first_any_us", "first_purchase_us", "delta_us"]]
    return out.sort_values("user_id").reset_index(drop=True)


def events_rolling_max3(sf_dir: str) -> pd.DataFrame:
    """Per-user ROLLING MAX over the last 3 events (ROWS 2 PRECEDING —
    peak/envelope tracking): relops.grouped_rolling_max — one bucket
    shuffle, lexsort + two same-segment shift-compare passes. MAX
    selects rather than computes, so the raw double values are exact on
    both sides; ordering ties pinned by event_id."""
    from ..stages.relops import grouped_rolling_max

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_rolling_max(
        ev,
        group_col="user_id",
        order_cols=["us", "event_id"],
        value_col="value",
        window=3,
        out_col="rmax3",
    ).select_columns(["event_id", "user_id", "value", "rmax3"]).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_rolling_median5(sf_dir: str) -> pd.DataFrame:
    """Per-user ROLLING MEDIAN over the last 5 events (ROWS 4 PRECEDING
    — robust smoothing that shrugs off the spikes the z-score gate
    flags): relops.grouped_rolling_median — one bucket shuffle, lexsort
    + a masked rows x 5 sliding matrix + np.nanmedian per bucket.
    Even-length frames interpolate as lo*0.5+hi*0.5, bit-identical to
    DuckDB's quantile_cont(0.5) (one rounding of (lo+hi)/2 either way);
    ordering ties pinned by event_id."""
    from ..stages.relops import grouped_rolling_median

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_rolling_median(
        ev,
        group_col="user_id",
        order_cols=["us", "event_id"],
        value_col="value",
        window=5,
        out_col="rmedian5",
    ).select_columns(["event_id", "user_id", "value", "rmedian5"]).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def event_value_anomalies(sf_dir: str) -> pd.DataFrame:
    """Z-SCORE ANOMALY gate: events whose value sits more than 2.5
    sample standard deviations from their type's mean — the
    moments-then-scan shape (the exact-integer-moments family applied
    per row). ONE tiny moments groupby (n, Σc, Σc² in integer cents per
    type), the O(types) table broadcasts by closure, and a second
    streaming pass computes z per row with the IDENTICAL double formula
    the oracle uses — corpus never shuffles."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def _moment_partials(t: pa.Table) -> pa.Table:
        c = _to_scaled_int(t["value"], 100)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "sx": c,
                    "sxx": pc.multiply(c, c),
                }
            )
            .group_by("event_type")
            .aggregate([("one", "sum"), ("sx", "sum"), ("sxx", "sum")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["one_sum"], pa.int64()),
                "sx": pc.cast(g["sx_sum"], pa.int64()),
                "sxx": pc.cast(g["sxx_sum"], pa.int64()),
            }
        )

    m = (
        ev.map_batches(_moment_partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
    )
    stats: dict[str, tuple[float, float]] = {}
    for _, r in m.iterrows():
        n = float(int(r["n"]))
        sx = float(int(r["sx"]))
        sxx = float(int(r["sxx"]))
        mean_v = sx / n / 100.0
        sd_v = np.sqrt((n * sxx - sx * sx) / (n * (n - 1)) / (100.0 * 100.0))
        stats[r["event_type"]] = (mean_v, sd_v)

    def _scan(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_pylist()
        mean_v = np.array([stats[ty][0] for ty in types])
        sd_v = np.array([stats[ty][1] for ty in types])
        v = np.asarray(t["value"].to_numpy(zero_copy_only=False))
        z = (v - mean_v) / sd_v
        keep = np.abs(z) > 2.5
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "event_type": t["event_type"].filter(pa.array(keep)),
                "value": t["value"].filter(pa.array(keep)),
                "z": pa.array(z[keep], pa.float64()),
            }
        )

    out = ev.map_batches(_scan, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def order_mad_by_priority(sf_dir: str) -> pd.DataFrame:
    """Per-group MEDIAN ABSOLUTE DEVIATION (robust dispersion): MAD =
    median(|x - median(x)|) per order priority, both medians with the
    even-count interpolated midpoint. Two grouped selection passes: the
    first yields the O(groups) median table (broadcast by closure), the
    second sorts |x - med| per bucket — selection plus ONE exact IEEE
    halving per level, so doubles match SQL's quantile_cont(0.5)
    bit-for-bit."""
    from ..stages.relops import (
        _WB,
        _group_codes,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    orders = _read(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # two passes: group medians, then deviations

    def _median_pass(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "o_orderpriority")
        cents = _int64_nonull(g["cents"], "cents")
        order = np.lexsort((cents, codes))
        sc, sv = codes[order], cents[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = ends - starts
        lo = sv[starts + (n - 1) // 2].astype(np.float64)
        hi = sv[starts + n // 2].astype(np.float64)
        names = pc.take(
            g["o_orderpriority"].combine_chunks()
            if isinstance(g["o_orderpriority"], pa.ChunkedArray)
            else g["o_orderpriority"],
            pa.array(order[starts]),
        )
        return pa.table(
            {"o_orderpriority": names, "med": pa.array(lo * 0.5 + hi * 0.5)}
        )

    meds = (
        _route_by_group(orders, "o_orderpriority", 8)
        .groupby(_WB)
        .map_groups(_median_pass, batch_format="pyarrow")
        .to_pandas()
    )
    med_map = dict(zip(meds["o_orderpriority"], meds["med"]))

    def _dev(t: pa.Table) -> pa.Table:
        m = np.array(
            [med_map[p] for p in t["o_orderpriority"].to_pylist()]
        )
        c = np.asarray(t["cents"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "dev": pa.array(np.abs(c - m), pa.float64()),
            }
        )

    def _mad_pass(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "o_orderpriority")
        dv = np.asarray(g["dev"].to_numpy(zero_copy_only=False))
        order = np.lexsort((dv, codes))
        sc, sv = codes[order], dv[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = ends - starts
        lo = sv[starts + (n - 1) // 2]
        hi = sv[starts + n // 2]
        names = pc.take(
            g["o_orderpriority"].combine_chunks()
            if isinstance(g["o_orderpriority"], pa.ChunkedArray)
            else g["o_orderpriority"],
            pa.array(order[starts]),
        )
        return pa.table(
            {
                "o_orderpriority": names,
                "n_orders": pa.array(n.astype(np.int64)),
                "mad_cents": pa.array(lo * 0.5 + hi * 0.5, pa.float64()),
            }
        )

    out = (
        _route_by_group(
            orders.map_batches(_dev, batch_format="pyarrow"),
            "o_orderpriority",
            8,
        )
        .groupby(_WB)
        .map_groups(_mad_pass, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def top_event_types_with_other(sf_dir: str) -> pd.DataFrame:
    """DATA-DEPENDENT RECODE (top-k + 'OTHER' rollup): the two most
    frequent event types keep their names, everything else folds into
    an OTHER bucket — the reporting recode whose category set is itself
    a query result. Pass 1: tiny combiner-reduced type counts; the
    winner set (count desc, type asc tie-break) broadcasts by closure;
    pass 2 recodes and re-aggregates. Both passes exchange O(types)
    rows."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type"])

    def _counts(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ev.map_batches(_counts, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = counts.sort_values(
        ["n", "event_type"], ascending=[False, True]
    ).reset_index(drop=True)
    top = set(counts["event_type"].head(2))

    out = counts.copy()
    out["bucket"] = np.where(
        out["event_type"].isin(sorted(top)), out["event_type"], "OTHER"
    )
    agg = (
        out.groupby("bucket", as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_events"})
    )
    agg["n_events"] = agg["n_events"].astype("int64")
    return agg.sort_values("bucket").reset_index(drop=True)


def webtext_pipeline_v3(sf_dir: str) -> pd.DataFrame:
    """The flagship chain with the bigram-novelty NOISE SCREEN inserted
    after decontamination (decontaminate → novelty<=0.2 gibberish gate →
    C4 line gate → line dedup → Gopher gate → shard packing) — SIX
    stages hash-checked by one nested SQL oracle. The novelty gate drops
    documents whose distinct bigrams are overwhelmingly first-occurrence
    (the OCR-garbage tail); its vocabulary Min-groupby runs over the
    decontaminated corpus BEFORE the chunking stages so the screen sees
    original text."""
    from ..stages.spandedup import decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench, train = _bench_train_split(ds)
    clean = decontaminate(train, bench, n=4)
    screened = _novelty_gate(clean, 0.2)
    gated = linededup.c4_line_filter(
        screened, width=8, line_blacklist=("spark", "vector"), min_lines=3
    )
    return _webtext_tail(gated)


def cohort_revenue_matrix(sf_dir: str) -> pd.DataFrame:
    """REVENUE COHORT matrix: customers bucketed by their FIRST order
    month, revenue and order counts rolled up by months-since-first —
    the LTV-decay view (the revenue companion to user_retention_matrix,
    which counts event users). All cents exact int64.

    Scale plan: one combiner-reduced groupby(custkey) Min pass computes
    each customer's first month (the output is O(customers), the
    exchange O(custkeys per block)); it attaches back to the order
    stream size-routed (broadcast searchsorted ≤
    _BROADCAST_SIDE_ROUTE_ROWS, hash_join above) and every batch
    pre-aggregates (cohort, months_since, cents, n) partials, so the
    final groupby sees O(months² × blocks) rows."""
    from ray.data.aggregate import Min, Sum

    from ..stages.joins import broadcast_join, hash_join

    def _mkey(t: pa.Table) -> pa.Table:
        m = pc.add(
            pc.multiply(pc.year(t["o_orderdate"]), pa.scalar(12)),
            pc.subtract(pc.month(t["o_orderdate"]), pa.scalar(1)),
        )
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "m": pc.cast(m, pa.int64()),
                "c": _to_scaled_int(t["o_totalprice"], 100),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(_mkey, batch_format="pyarrow").materialize()
    first = orders.groupby("o_custkey").aggregate(Min("m", alias_name="fm"))

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        fp = first.to_pandas()
        ft = pa.table(
            {
                "k": pa.array(fp["o_custkey"].to_numpy(dtype="int64")),
                "fm": pa.array(fp["fm"].to_numpy(dtype="int64")),
            }
        )
        tagged = broadcast_join(orders, ft, key="o_custkey", right_key="k")
    else:
        fds = first.map_batches(
            lambda t: pa.table(
                {"k": t["o_custkey"], "fm": pc.cast(t["fm"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        tagged = hash_join(orders, fds, key="o_custkey", right_key="k")

    def _partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "fm": t["fm"],
                    "ms": pc.subtract(t["m"], t["fm"]),
                    "c": t["c"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["fm", "ms"])
            .aggregate([("c", "sum"), ("one", "sum")])
        )
        return g.rename_columns(["fm", "ms", "c", "n"])

    agg = (
        tagged.map_batches(_partials, batch_format="pyarrow")
        .groupby(["fm", "ms"])
        .aggregate(Sum("c", alias_name="revenue_c"), Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    fm = agg["fm"].to_numpy(dtype="int64")
    out = pd.DataFrame(
        {
            "cohort_year": (fm // 12).astype("int64"),
            "cohort_month": (fm % 12 + 1).astype("int64"),
            "months_since": agg["ms"].astype("int64"),
            "revenue_c": agg["revenue_c"].astype("int64"),
            "n_orders": agg["n_orders"].astype("int64"),
        }
    )
    return out.sort_values(
        ["cohort_year", "cohort_month", "months_since"]
    ).reset_index(drop=True)


def region_revenue_hhi(sf_dir: str) -> pd.DataFrame:
    """HERFINDAHL–HIRSCHMAN market-concentration index per region:
    Σ(nation revenue)² / (Σ nation revenue)² over the region's nations —
    the antitrust-style concentration scalar (1/n = evenly split, →1 =
    one nation owns the region; the regional companion to
    order_price_gini_by_nation's inequality view).

    Scale plan: the entire heavy lift IS :func:`nation_revenue` (size
    -routed, its distributed plan separately oracled); this rollup
    post-processes the 25-row per-nation table against the 5-row region
    dim on the driver. Revenue moments are exact arbitrary-precision
    ints (Σr² exceeds int64 from sf0.01 up — the SQL side carries them
    as HUGEINT) collapsed in ONE identically-parenthesized double
    expression: double(Σr²) / (double(Σr) · double(Σr))."""
    nr = nation_revenue(sf_dir)
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_name", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    m = nr.merge(nation, on="n_name").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    rows = []
    for r_name, g in m.groupby("r_name"):
        r = [int(x) for x in g["revenue_c"]]
        num = sum(x * x for x in r)
        sd = sum(r)
        rows.append(
            {
                "r_name": r_name,
                "n_nations": len(r),
                "hhi": np.float64(num)
                / (np.float64(sd) * np.float64(sd)),
            }
        )
    out = pd.DataFrame(rows)
    out["n_nations"] = out["n_nations"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


def webtext_pipeline_v4(sf_dir: str) -> pd.DataFrame:
    """The flagship chain with FUZZY decontamination at the head: word-3
    -gram Jaccard >= 0.5 vs the benchmark split (paraphrase leakage the
    exact window matcher misses) → bigram-novelty gibberish screen → C4
    line gate → line dedup → Gopher gate → shard packing — six stages
    hash-checked by ONE nested SQL oracle. Versus v3 the head swaps the
    exact 4-gram window decontaminate for the broadcast-inverted-index
    fuzzy kernel (zero corpus shuffle) and uses its %7 benchmark split;
    sub-3-token docs drop at the head by the fuzzy contract (no shingle
    set to clear them)."""
    from ..stages.spandedup import fuzzy_decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _split(want_bench: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = np.asarray(
                t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            is_b = ids % 7 == 0
            return t.filter(pa.array(is_b if want_bench else ~is_b))

        return _f

    bench = ds.map_batches(_split(True), batch_format="pyarrow")
    corpus = ds.map_batches(_split(False), batch_format="pyarrow")
    clean = fuzzy_decontaminate(corpus, bench, k=3, threshold=0.5)
    screened = _novelty_gate(clean, 0.2)
    gated = linededup.c4_line_filter(
        screened, width=8, line_blacklist=("spark", "vector"), min_lines=3
    )
    return _webtext_tail(gated)


def events_daily_ohlc(sf_dir: str) -> pd.DataFrame:
    """OHLC BARS per (user, day): open/close = first/last value in
    (ts, event_id) order, high/low = extremes, plus the tick count —
    the timeseries-bar rollup (finance OHLC, telemetry roll-ups). Every
    output is a SELECTION of an input double (no arithmetic), so values
    are bit-exact on both sides.

    Scale plan: ONE user-hash bucket shuffle; per bucket one lexsort by
    (user, day, ts, event_id) and a composite-boundary segment pass —
    open/close by offset gather, high/low via maximum/minimum.reduceat.
    Output O(user-days)."""
    from ..stages.relops import _WB, _route_by_group

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )

    def _ohlc(g: pa.Table) -> pa.Table:
        u = np.asarray(g["user_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        us = np.asarray(g["us"].to_numpy(zero_copy_only=False), dtype=np.int64)
        eid = np.asarray(g["event_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        v = np.asarray(g["value"].to_numpy(zero_copy_only=False))
        d = us // 86_400_000_000
        order = np.lexsort((eid, us, d, u))
        u, d, v = u[order], d[order], v[order]
        n = len(u)
        new = np.concatenate([[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])])
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [n]])
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "day": pa.array(d[starts]),
                "open": pa.array(v[starts], pa.float64()),
                "high": pa.array(np.maximum.reduceat(v, starts), pa.float64()),
                "low": pa.array(np.minimum.reduceat(v, starts), pa.float64()),
                "close": pa.array(v[ends - 1], pa.float64()),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    out = (
        _route_by_group(ev, "user_id", 32)
        .groupby(_WB)
        .map_groups(_ohlc, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


def vocab_growth_curve(sf_dir: str) -> pd.DataFrame:
    """HEAPS'-LAW vocabulary growth curve: after each document (in
    doc_id order), the cumulative token count and the cumulative
    DISTINCT-token count — the corpus-diversity diagnostic that shows
    where a crawl stops contributing new vocabulary.

    Scale plan: per-doc token counts need no shuffle (a doc lives in one
    batch row; vectorized flat whitespace split, no Python row loop);
    the distinct curve is first-occurrence attribution — the
    doc_bigram_novelty machinery on unigrams: each batch pre-Mins its
    OWN vocabulary (np.minimum.at over dictionary codes) and ships
    (w1, w2, doc_min) int64 triples, where (w1, w2) is the 128-bit
    two-siphash token identity (:func:`textkit.hash2_strings`), into
    ONE pair-hash bucket shuffle (single int64 sort key — the
    hourly_active_users pattern; a vocabulary lives in exactly one
    bucket, so the per-bucket Arrow Min is the global Min) that emits
    (first_doc, count) partials directly — token strings never shuffle
    and no 2-column sort groupby runs. The two O(docs) tables join
    size-routed and BOTH cumulative columns come from the distributed
    range-partitioned prefix scan (attach_running_sum), O(ranges)
    driver state."""
    from ray.data.aggregate import Sum

    from ..functions import textkit
    from ..functions.enumerate import attach_running_sum
    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import _WB

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _pertok(t: pa.Table) -> pa.Table:
        _, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        n = np.diff(ptr)
        keep = n > 0
        docs = np.asarray(
            t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )[keep]
        return pa.table(
            {
                "doc_id": pa.array(docs),
                "n_tok": pa.array(n[keep].astype(np.int64)),
            }
        )

    num_buckets = 64

    _EMPTY_FIRST = pa.table(
        {
            "w1": pa.array([], pa.int64()),
            "w2": pa.array([], pa.int64()),
            "doc_min": pa.array([], pa.int64()),
            _WB: pa.array([], pa.int64()),
        }
    )

    def _first_partials(t: pa.Table) -> pa.Table:
        flat, ptr = textkit.flat_tokens_ws_arrow(t["text"])
        if len(flat) == 0:
            return _EMPTY_FIRST
        docs = np.asarray(
            t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        tok_doc = np.repeat(docs, np.diff(ptr))
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_numpy(zero_copy_only=False)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        mind = np.full(len(vocab), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mind, idx, tok_doc)
        h1, h2 = textkit.hash2_strings(vocab, salt="vg")
        b = (h1.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "w1": pa.array(h1),
                "w2": pa.array(h2),
                "doc_min": pa.array(mind),
                _WB: pa.array(b),
            }
        )

    def _bucket_first_counts(g: pa.Table) -> pa.Table:
        # whole vocabulary of this bucket is here: Arrow Min IS global
        first = g.group_by(["w1", "w2"]).aggregate([("doc_min", "min")])
        cnt = first.group_by("doc_min_min").aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": pc.cast(cnt["doc_min_min"], pa.int64()),
                "k": pc.cast(cnt["count_all"], pa.int64()),
            }
        )

    pertok = ds.map_batches(_pertok, batch_format="pyarrow")
    newk = (
        ds.map_batches(_first_partials, batch_format="pyarrow", batch_size=4096)
        .groupby(_WB)
        .map_groups(_bucket_first_counts, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("k", alias_name="n_new"))
    )

    n_docs = _fact_rows(sf_dir, "documents")
    if n_docs <= _BROADCAST_SIDE_ROUTE_ROWS:
        np_ = newk.to_pandas()
        newk_tbl = pa.table(
            {
                "doc_id": pa.array(np_["doc_id"].to_numpy(dtype="int64")),
                "n_new": pa.array(np_["n_new"].to_numpy(dtype="int64")),
            }
        )
        j = broadcast_join(pertok, newk_tbl, key="doc_id", how="left_outer")
    else:
        j = hash_join(pertok, newk, key="doc_id", how="left_outer")

    j = j.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
                "n_new": pc.fill_null(pc.cast(t["n_new"], pa.int64()), 0),
            }
        ),
        batch_format="pyarrow",
    )
    j = attach_running_sum(
        j,
        ["doc_id"],
        ["n_tok", "n_new"],
        sum_col=["cum_tokens", "cum_distinct"],
    )
    out = j.select_columns(["doc_id", "cum_tokens", "cum_distinct"]).to_pandas()
    out["cum_tokens"] = out["cum_tokens"].astype("int64")
    out["cum_distinct"] = out["cum_distinct"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def training_mix_order(sf_dir: str) -> pd.DataFrame:
    """TRAINING-MIX INTERLEAVING: a deterministic global sampling order
    that up-weights English 3:1 over every other language (the data
    -mixture scheduling step before shard packing) — stride scheduling
    with EXACT integer keys: doc j of language L gets
    key = rn_L(j) x (LCM / weight_L), and the mix order sorts by
    (key, lang, doc_id), so weighted languages surface proportionally
    often with zero RNG.

    Scale plan: per-language row numbers from ONE lang-bucket shuffle
    (lexsort + segment positions), then the global mix rank from the
    distributed range-partitioned dense index — no driver state beyond
    O(ranges)."""
    from ..functions.enumerate import attach_dense_index
    from ..stages.relops import _WB, _route_by_group

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _rn(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_WB])
        lang = g["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        codes = lang.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        did = np.asarray(g["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((did, codes))
        c_s = codes[order]
        starts = np.nonzero(
            np.concatenate([[True], c_s[1:] != c_s[:-1]])
        )[0]
        lens = np.diff(np.concatenate([starts, [len(c_s)]]))
        rn = (
            np.arange(len(c_s), dtype=np.int64)
            - np.repeat(starts, lens)
            + 1
        )
        g = g.take(pa.array(order, pa.int64()))
        mult = np.where(
            np.asarray(g["lang"].to_pylist(), dtype=object) == "en", 1, 3
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "lang": g["lang"],
                "key": pa.array(rn * mult),
            }
        )

    keyed = (
        _route_by_group(ds, "lang", 8)
        .groupby(_WB)
        .map_groups(_rn, batch_format="pyarrow")
    )
    n_docs = _fact_rows(sf_dir, "documents")
    if n_docs <= _BROADCAST_SIDE_ROUTE_ROWS:
        # small route: the keyed table is one driver frame — a numpy
        # lexsort beats a range-partition pass of pure fixed latency
        # (the dense-index plan below is the 10^8+-doc path, pinned by
        # the hash-path route test)
        p = keyed.to_pandas()
        key = p["key"].to_numpy(dtype="int64")
        did = p["doc_id"].to_numpy(dtype="int64")
        lang = p["lang"].to_numpy(dtype=object)
        order = np.lexsort((did, lang, key))
        rank = np.empty(len(p), dtype=np.int64)
        rank[order] = np.arange(1, len(p) + 1, dtype=np.int64)
        out = pd.DataFrame(
            {"doc_id": did, "lang": lang, "mix_rank": rank}
        )
        return out.sort_values("doc_id").reset_index(drop=True)
    ranked = attach_dense_index(
        keyed, ["key", "lang", "doc_id"], index_col="mix_rank"
    )
    out = ranked.select_columns(["doc_id", "lang", "mix_rank"]).to_pandas()
    out["mix_rank"] = out["mix_rank"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def order_reconciliation_audit(sf_dir: str) -> pd.DataFrame:
    """LEDGER RECONCILIATION audit: orders whose header total disagrees
    with the sum of their line-item extended prices by more than 5% —
    the cross-table consistency gate an ingest pipeline runs between
    fact tables. Comparison is ALL-integer: |diff| * 20 > total_cents
    (no percentage doubles).

    Scale plan: lineitem collapses to per-order cent sums (batch-local
    Arrow group_by partials, ONE orderkey-hash BUCKET shuffle with a
    vectorized per-bucket rollup — Python calls bounded by the bucket
    count, ~2x faster than the sort-based aggregate at this key
    cardinality); the orders header attaches size-routed (broadcast
    searchsorted under the threshold, hash_join above); the gate is one
    vectorized filter. Exchange is O(orders), never O(lineitems)."""
    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import _WB

    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    num_buckets = 64

    def _partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                    "c": _to_scaled_int(t["l_extendedprice"], 100),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("c", "sum")])
        )
        k = g["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (
            ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "c": pc.cast(g["c_sum"], pa.int64()),
                _WB: pa.array(b),
            }
        )

    def _rollup(g: pa.Table) -> pa.Table:
        k = np.asarray(
            g["l_orderkey"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        c = np.asarray(g["c"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(k, kind="stable")
        ks, cs = k[order], c[order]
        starts = np.nonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))[0]
        return pa.table(
            {
                "l_orderkey": pa.array(ks[starts]),
                "lines_cents": pa.array(np.add.reduceat(cs, starts)),
            }
        )

    per_order = (
        items.map_batches(_partials, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_rollup, batch_format="pyarrow")
    )

    n_orders = _fact_rows(sf_dir, "orders")
    if n_orders <= _BROADCAST_SIDE_ROUTE_ROWS:
        hdr = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        hdr = pa.table(
            {
                "o_orderkey": pc.cast(hdr["o_orderkey"], pa.int64()),
                "total_cents": _to_scaled_int(hdr["o_totalprice"], 100),
            }
        )
        j = broadcast_join(
            per_order, hdr, key="l_orderkey", right_key="o_orderkey"
        )
    else:
        hdr_ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                    "total_cents": _to_scaled_int(t["o_totalprice"], 100),
                }
            ),
            batch_format="pyarrow",
        )
        j = hash_join(per_order, hdr_ds, key="l_orderkey", right_key="o_orderkey")

    def _gate(t: pa.Table) -> pa.Table:
        lc = np.asarray(
            pc.cast(t["lines_cents"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        tc = np.asarray(
            pc.cast(t["total_cents"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        ok = np.asarray(
            pc.cast(t["l_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        diff = lc - tc
        keep = np.abs(diff) * 20 > tc
        return pa.table(
            {
                "o_orderkey": pa.array(ok[keep]),
                "total_cents": pa.array(tc[keep]),
                "lines_cents": pa.array(lc[keep]),
                "diff_cents": pa.array(diff[keep]),
            }
        )

    out = j.map_batches(_gate, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def dup_rate_by_length_decile(sf_dir: str) -> pd.DataFrame:
    """CURATION CROSS-TAB: near-duplicate rate as a function of document
    length — prefix-fingerprint keep-first dupe flags (the
    dedup_loss_by_source gate) crossed with global length DECILES
    (NTILE(10) by (n_chars, doc_id)); answers "are short docs the
    duplicate-heavy tail?".

    Scale plan: one fp-bucket shuffle emits O(docs) dupe flags (global
    first is bucket-local); deciles come from the distributed dense
    index + the SQL remainder-fill; the two O(docs) tables meet in a
    size-routed join and collapse to 10 rows."""
    import hashlib

    from ..functions import textkit
    from ..functions.enumerate import attach_dense_index
    from ..stages.joins import broadcast_join, hash_join
    from ..stages.relops import _WB

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(
                " ".join(
                    textkit.normalize_for_fingerprint(t or "").split(" ")[:8]
                ).encode("utf-8")
            ).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        fp_u64 = np.array([int(f[:16], 16) for f in fps], dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "fp_md5": pa.array(fps, pa.string()),
                _WB: pa.array((fp_u64 % np.uint64(64)).astype(np.int64)),
            }
        )

    def _flags(g: pa.Table) -> pa.Table:
        fps = np.asarray(g["fp_md5"].to_pylist(), dtype=object)
        ids = np.asarray(g["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((ids, fps))
        sfp = fps[order]
        first = np.concatenate([[True], sfp[1:] != sfp[:-1]])
        dupe = np.zeros(len(ids), dtype=np.int64)
        dupe[order] = (~first).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids), "dupe": pa.array(dupe)}
        )

    flags = (
        ds.map_batches(_fp, batch_format="pyarrow")
        .groupby(_WB)
        .map_groups(_flags, batch_format="pyarrow")
    )

    lens = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    ranked = attach_dense_index(
        lens, ["n_chars", "doc_id"], index_col="_rank"
    ).materialize()
    n = ranked.count()

    def _decile(t: pa.Table) -> pa.Table:
        r0 = np.asarray(t["_rank"].to_numpy(zero_copy_only=False)) - 1
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "decile": pa.array(_ntile_from_rank(r0, n, 10)),
            }
        )

    deciles = ranked.map_batches(_decile, batch_format="pyarrow")

    if n <= _BROADCAST_SIDE_ROUTE_ROWS:
        dp = deciles.to_pandas()
        dec_tbl = pa.table(
            {
                "doc_id": pa.array(dp["doc_id"].to_numpy(dtype="int64")),
                "decile": pa.array(dp["decile"].to_numpy(dtype="int64")),
            }
        )
        j = broadcast_join(flags, dec_tbl, key="doc_id")
    else:
        j = hash_join(flags, deciles, key="doc_id")

    def _rollup(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "decile": pc.cast(t["decile"], pa.int64()),
                    "dupe": pc.cast(t["dupe"], pa.int64()),
                }
            )
            .group_by("decile")
            .aggregate([("dupe", "sum"), ("dupe", "count")])
        )
        return pa.table(
            {
                "decile": g["decile"],
                "d": pc.cast(g["dupe_sum"], pa.int64()),
                "c": pc.cast(g["dupe_count"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        j.map_batches(_rollup, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("d", alias_name="n_dupes"), Sum("c", alias_name="n_docs"))
        .to_pandas()
    )
    agg["n_dupes"] = agg["n_dupes"].astype("int64")
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["dup_rate"] = agg["n_dupes"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["n_docs"].to_numpy(dtype="int64").astype(np.float64)
    out = agg[["decile", "n_docs", "n_dupes", "dup_rate"]]
    return out.sort_values("decile").reset_index(drop=True)


def top_bigram_per_lang(sf_dir: str) -> pd.DataFrame:
    """GROUPED ARGMAX over a derived vocabulary: each language's most
    frequent adjacent-token bigram (count desc, bigram asc tie-break) —
    the per-slice collocation signature. Per-batch vectorized bigram
    expansion (the top_bigrams flat-buffer kernel with a lang owner
    map) collapsing to (lang, bigram) partials, ONE vocabulary groupby,
    batch-local argmax partials per lang, final O(langs) driver pick —
    the vocabulary never converges anywhere."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t["text"], pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(offsets[0])
        flat = words.values.slice(base, int(offsets[-1]) - base)
        m = len(flat)
        if m < 2:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "bigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        valid = np.ones(m - 1, dtype=bool)
        ends = offsets[1:] - base - 1
        valid[ends[(ends >= 0) & (ends < m - 1)]] = False
        owner = (
            np.searchsorted(offsets - base, np.arange(m - 1), side="right") - 1
        )
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        left = flat.slice(0, m - 1).filter(pa.array(valid))
        right = flat.slice(1, m - 1).filter(pa.array(valid))
        big = pc.binary_join_element_wise(left, right, " ")
        g = (
            pa.table(
                {
                    "lang": pa.array(langs[owner[valid]], pa.string()),
                    "bigram": big,
                }
            )
            .group_by(["lang", "bigram"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "lang": g["lang"],
                "bigram": g["bigram"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=1024)
        .groupby(["lang", "bigram"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def _local_argmax(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        big = np.asarray(t["bigram"].to_pylist(), dtype=object)
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((big, -n, lang))
        sl = lang[order]
        starts = np.nonzero(np.concatenate([[True], sl[1:] != sl[:-1]]))[0]
        pick = order[starts]
        return pa.table(
            {
                "lang": pa.array(lang[pick], pa.string()),
                "bigram": pa.array(big[pick], pa.string()),
                "n": pa.array(n[pick]),
            }
        )

    cand = counts.map_batches(_local_argmax, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["lang", "n", "bigram"], ascending=[True, False, True]
    )
    out = cand.groupby("lang", as_index=False).first()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def customer_quartile_migration(sf_dir: str) -> pd.DataFrame:
    """RANK-MIGRATION transition matrix: customers active in BOTH halves
    of the corpus's history (orders in <= 1997 AND >= 1999) are
    quartiled by revenue within each half, and the 4x4 matrix counts who
    moved where — the churn/upsell drift report.

    Scale plan: ONE conditional-sum aggregate pass (period tags per
    batch), the both-active filter is vectorized, and the two quartile
    assignments reuse the NTILE remainder-fill from ranks — driver
    numpy lexsort under _BROADCAST_SIDE_ROUTE_ROWS customers (the rfm
    small route), attach_dense_index passes above. Output is 16 rows."""
    from ray.data.aggregate import Sum

    from ..functions.enumerate import attach_dense_index

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        cents = _to_scaled_int(t["o_totalprice"], 100)
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "a": pc.if_else(pc.less_equal(yr, 1997), cents, zero),
                "b": pc.if_else(pc.greater_equal(yr, 1999), cents, zero),
            }
        )

    per_cust = (
        orders.map_batches(_prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("a", alias_name="rev_a"), Sum("b", alias_name="rev_b"))
        .materialize()
    )

    n_cust = _fact_rows(sf_dir, "customer")
    if n_cust <= _BROADCAST_SIDE_ROUTE_ROWS:
        p = per_cust.to_pandas()
        p = p[(p["rev_a"] > 0) & (p["rev_b"] > 0)].reset_index(drop=True)
        ck = p["o_custkey"].to_numpy(dtype="int64")
        n = len(p)
        tiles = {}
        for name, col in (
            ("qa", p["rev_a"].to_numpy(dtype="int64")),
            ("qb", p["rev_b"].to_numpy(dtype="int64")),
        ):
            order = np.lexsort((ck, -col))
            rank0 = np.empty(n, dtype=np.int64)
            rank0[order] = np.arange(n, dtype=np.int64)
            tiles[name] = _ntile_from_rank(rank0, n, 4)
        m = pd.DataFrame({"qa": tiles["qa"], "qb": tiles["qb"]})
    else:
        both = per_cust.filter(
            lambda r: r["rev_a"] > 0 and r["rev_b"] > 0
        ).materialize()
        n = both.count()
        ds2 = attach_dense_index(
            both, ["rev_a", "o_custkey"], ascending=[False, True],
            index_col="ra",
        )
        ds2 = attach_dense_index(
            ds2, ["rev_b", "o_custkey"], ascending=[False, True],
            index_col="rb",
        )
        mm = ds2.to_pandas()
        m = pd.DataFrame(
            {
                "qa": _ntile_from_rank(
                    mm["ra"].to_numpy(dtype="int64") - 1, n, 4
                ),
                "qb": _ntile_from_rank(
                    mm["rb"].to_numpy(dtype="int64") - 1, n, 4
                ),
            }
        )
    out = (
        m.groupby(["qa", "qb"], as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
    )
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values(["qa", "qb"]).reset_index(drop=True)


def customer_spend_trend(sf_dir: str) -> pd.DataFrame:
    """Per-customer OLS TREND SLOPE of order value over the order
    sequence (1, 2, ... in date order): the spend-trajectory feature
    (growing vs shrinking accounts) — the grouped-regression member of
    the exact-integer-moments family. slope = (nΣxy - ΣxΣy) /
    (nΣx² - (Σx)²) with x = per-customer ROW_NUMBER (date, orderkey tie
    -break) and y = exact cents; customers need >= 2 orders (the
    denominator is 0 otherwise).

    Scale plan: ONE custkey-hash bucket shuffle; per bucket one lexsort
    + within-segment positions + np.add.reduceat for all four moments —
    no per-key Python; the final slope is one identical double formula
    on both sides. Int64 bound: Σxy <= n² x max_cents / 2 — safe past
    10^4 orders/customer at 10^8-cent orders (documented)."""
    from ..stages.relops import (
        _WB,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
    )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c": pc.cast(t["o_custkey"], pa.int64()),
                "d": pc.cast(t["o_orderdate"], pa.int64()),
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "y": _to_scaled_int(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )

    def _slope(g: pa.Table) -> pa.Table:
        c = _int64_nonull(g["c"], "c")
        d = _int64_nonull(g["d"], "d")
        k = _int64_nonull(g["k"], "k")
        y = _int64_nonull(g["y"], "y")
        order = np.lexsort((k, d, c))
        cs, ys = c[order], y[order]
        starts, ends, seg_start, _ = _segment_bounds(cs)
        n = (ends - starts).astype(np.int64)
        x = (
            np.arange(len(cs), dtype=np.int64)
            - np.repeat(starts, n)
            + 1
        )
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(ys, starts)
        sxy = np.add.reduceat(x * ys, starts)
        sxx = np.add.reduceat(x * x, starts)
        keep = n >= 2
        num = (n * sxy - sx * sy).astype(np.float64)
        den = (n * sxx - sx * sx).astype(np.float64)
        slope = np.zeros(len(n))
        slope[keep] = num[keep] / den[keep]
        return pa.table(
            {
                "c_custkey": pa.array(cs[starts][keep]),
                "n_orders": pa.array(n[keep]),
                "slope_cents": pa.array(slope[keep], pa.float64()),
            }
        )

    out = (
        _route_by_group(orders, "c", 32)
        .groupby(_WB)
        .map_groups(_slope, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("c_custkey").reset_index(drop=True)


def party_directory(sf_dir: str) -> pd.DataFrame:
    """Schema-aligned MULTI-SOURCE UNION with lineage tags: customers
    and suppliers projected to one (kind, key, name, nationkey, bal_c)
    directory — the heterogeneous-source consolidation shape (the
    frontier-union D3 analog as a relational operator). Two projected
    streams, one Dataset union, no shuffle at all."""
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda t: pa.table(
            {
                "kind": pa.array(["customer"] * t.num_rows, pa.string()),
                "key": pc.cast(t["c_custkey"], pa.int64()),
                "name": t["c_name"],
                "nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                "bal_c": _to_scaled_int(t["c_acctbal"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    supp = _read(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    ).map_batches(
        lambda t: pa.table(
            {
                "kind": pa.array(["supplier"] * t.num_rows, pa.string()),
                "key": pc.cast(t["s_suppkey"], pa.int64()),
                "name": t["s_name"],
                "nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "bal_c": _to_scaled_int(t["s_acctbal"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    out = cust.union(supp).to_pandas()
    return out.sort_values(["kind", "key"]).reset_index(drop=True)


def stopword_density_per_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language STOPWORD DENSITY from exact integer counts
    (Σ stopword tokens / Σ tokens — NOT an average of per-doc ratios,
    whose float sum order SQL does not pin): the language-model
    fluency/quality signal at corpus grain.

    Scale plan: fully vectorized — one Arrow split to the flat token
    buffer, pc.utf8_lower + pc.is_in against the 22-word broadcast list,
    np.bincount by batch-local lang codes; the exchange is O(langs x
    blocks) int64 partials."""
    from ray.data.aggregate import Sum

    from ..functions.textkit import STOPWORDS

    stop_arr = pa.array(sorted(STOPWORDS), pa.string())
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t["text"], pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(offsets[0])
        flat = words.values.slice(base, int(offsets[-1]) - base)
        is_stop = np.asarray(
            pc.is_in(pc.utf8_lower(flat), value_set=stop_arr).to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        lang = t["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        codes_arr = lang.dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        owner = codes[
            np.searchsorted(
                offsets - base, np.arange(len(flat)), side="right"
            )
            - 1
        ]
        k = len(codes_arr.dictionary)
        n_tok = np.bincount(owner, minlength=k).astype(np.int64)
        n_stop = np.bincount(owner, weights=is_stop, minlength=k).astype(np.int64)
        return pa.table(
            {
                "lang": codes_arr.dictionary,
                "t": pa.array(n_tok),
                "s": pa.array(n_stop),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("t", alias_name="n_tokens"), Sum("s", alias_name="n_stop"))
        .to_pandas()
    )
    agg["n_tokens"] = agg["n_tokens"].astype("int64")
    agg["n_stop"] = agg["n_stop"].astype("int64")
    agg["stop_density"] = agg["n_stop"].to_numpy(dtype="int64").astype(
        np.float64
    ) / agg["n_tokens"].to_numpy(dtype="int64").astype(np.float64)
    out = agg[["lang", "n_tokens", "n_stop", "stop_density"]]
    return out.sort_values("lang").reset_index(drop=True)


def dup_cluster_size_histogram(sf_dir: str) -> pd.DataFrame:
    """DUPLICATE-CLUSTER SIZE distribution: how many prefix-fingerprint
    clusters have exactly k members — the count-of-counts (TPC-H Q13
    shape) applied to dedup analysis (a heavy tail of large clusters
    means boilerplate floods the corpus).

    Scale plan: per-batch fp partial counts, ONE vocabulary groupby to
    cluster sizes, per-batch size-histogram partials into a tiny final
    groupby — the fp table never converges anywhere."""
    import hashlib

    from ray.data.aggregate import Sum

    from ..functions import textkit

    ds = _read(sf_dir, "documents", ["text"])

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(
                " ".join(
                    textkit.normalize_for_fingerprint(t or "").split(" ")[:8]
                ).encode("utf-8")
            ).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        g = (
            pa.table({"fp": pa.array(fps, pa.string())})
            .group_by("fp")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"fp": g["fp"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    sizes = (
        ds.map_batches(_fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Sum("n", alias_name="sz"))
    )

    def _hist(t: pa.Table) -> pa.Table:
        sz = np.asarray(t["sz"].to_numpy(zero_copy_only=False), dtype=np.int64)
        u, c = np.unique(sz, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(u),
                "k": pa.array(c.astype(np.int64)),
            }
        )

    out = (
        sizes.map_batches(_hist, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("k", alias_name="n_clusters"))
        .to_pandas()
    )
    out["cluster_size"] = out["cluster_size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    return out.sort_values("cluster_size").reset_index(drop=True)


def time_to_next_purchase_by_type(sf_dir: str) -> pd.DataFrame:
    """SEQUENCE feature via BACKWARD FILL: for every event, the time to
    the user's next purchase at-or-after it (purchases map to 0), then
    the exact per-type median — the conversion-latency profile. The
    backward fill is relops.grouped_forward_fill run on NEGATED order
    keys (the nearest following purchase IS the min over the following
    frame, because timestamps ascend); the median is one key-routed
    lexsort + segment-midpoint pass. Exact int64 micros everywhere; the
    midpoint halving is the one IEEE double op (matches SQL
    quantile_cont(0.5))."""
    from ..stages.relops import (
        _WB,
        _group_codes,
        _int64_nonull,
        _route_by_group,
        _segment_bounds,
        grouped_forward_fill,
    )

    ev = _read(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "us": pc.cast(t["ts"], pa.int64()),
                "neg_us": pc.multiply(
                    pc.cast(t["ts"], pa.int64()), pa.scalar(-1, pa.int64())
                ),
                "neg_id": pc.multiply(
                    pc.cast(t["event_id"], pa.int64()), pa.scalar(-1, pa.int64())
                ),
                "pts": pc.if_else(
                    pc.equal(t["event_type"], pa.scalar("purchase")),
                    pc.cast(t["ts"], pa.int64()),
                    pa.scalar(None, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    filled = grouped_forward_fill(
        ev,
        group_col="user_id",
        order_cols=["neg_us", "neg_id"],
        value_col="pts",
        out_col="nxt",
    )

    def _delta(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["nxt"]))
        return pa.table(
            {
                "event_type": t["event_type"],
                "delta": pc.subtract(
                    pc.cast(t["nxt"], pa.int64()), t["us"]
                ),
            }
        )

    deltas = filled.map_batches(_delta, batch_format="pyarrow")

    def _median(g: pa.Table) -> pa.Table:
        codes = _group_codes(g, "event_type")
        d = _int64_nonull(g["delta"], "delta")
        order = np.lexsort((d, codes))
        sc, sv = codes[order], d[order]
        starts, ends, _, _ = _segment_bounds(sc)
        n = ends - starts
        lo = sv[starts + (n - 1) // 2].astype(np.float64)
        hi = sv[starts + n // 2].astype(np.float64)
        names = pc.take(
            g["event_type"].combine_chunks()
            if isinstance(g["event_type"], pa.ChunkedArray)
            else g["event_type"],
            pa.array(order[starts]),
        )
        return pa.table(
            {
                "event_type": names,
                "n_events": pa.array(n.astype(np.int64)),
                "median_delta_us": pa.array((lo + hi) / 2.0, pa.float64()),
            }
        )

    out = (
        _route_by_group(deltas, "event_type", 8)
        .groupby(_WB)
        .map_groups(_median, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def benford_first_digit_orders(sf_dir: str) -> pd.DataFrame:
    """BENFORD'S-LAW first-digit audit of order totals (the forensic
    -accounting screen for fabricated values): counts and observed
    shares per leading digit, extracted via STRING slicing of the exact
    integer cents — no log10 whose last-ulp boundary SQL and numpy could
    disagree on. One vectorized map + a 9-row combiner-reduced groupby;
    the share division is the only double op."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def _digits(t: pa.Table) -> pa.Table:
        cents = _to_scaled_int(t["o_totalprice"], 100)
        d = pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), start=0, stop=1
        )
        g = pa.table({"digit": d}).group_by("digit").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"digit": g["digit"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    agg = (
        ds.map_batches(_digits, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    agg["n_orders"] = agg["n_orders"].astype("int64")
    total = int(agg["n_orders"].sum())
    agg["share"] = agg["n_orders"].to_numpy(dtype="int64").astype(
        np.float64
    ) / np.float64(total)
    out = agg[["digit", "n_orders", "share"]]
    return out.sort_values("digit").reset_index(drop=True)
