"""Event-stream queries: sessions, windows, funnels, retention, time series.

Split from the former single-file queries module (VERDICT r4 #8);
names resolve cross-family via the package cross-link in __init__.
"""

from . import _base
from ._base import *  # noqa: F401,F403 — np/pa/pc/pd/ray + stage imports


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


def session_windows(sf_dir: str) -> pd.DataFrame:
    """Sessionization (§2.9 streaming analog): per user, count sessions
    where a >30-minute gap starts a new session. One hash-bucket shuffle
    + vectorized diff/bincount across all of a bucket's users at once
    (stages/relops.grouped_session_count) — the engine's stateful-window
    idiom without a Python call per user."""
    from ...stages.relops import grouped_session_count

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


def incremental_hourly_window(sf_dir: str) -> pd.DataFrame:
    """§2.9 incremental form: the same tumbling-window aggregate as
    events_hourly_window, computed through per-bucket STATE ACTORS fed a
    ts-ordered stream (stages/streaming.py) instead of a groupby shuffle.
    Values scaled to exact integer micros so the SQL oracle matches."""
    from ...stages.streaming import incremental_windows

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


def asof_join_clicks_views(sf_dir: str) -> pd.DataFrame:
    """As-of join (custom operator — Ray Data has no native one): for each
    'click' event, the latest 'view' of the same user at or before the
    click. Right-side ties pre-resolved to max event_id per (user, ts) so
    the match is unambiguous on both sides (DuckDB ASOF JOIN oracle)."""
    from ray.data.aggregate import Max

    from ...stages.relops import asof_join

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


def user_event_gaps(sf_dir: str) -> pd.DataFrame:
    """Keyed LAG window (custom operator — Ray Data has no window
    functions): per-user inter-event gap in microseconds, ordered by
    (ts, event_id). One user-hash-bucket shuffle, every user's shift
    computed in one vectorized segment pass (stages/relops.grouped_lag);
    first-event rows (null lag) drop on both sides."""
    from ...stages.relops import grouped_lag

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


def top_event_type_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped argmax / mode (per-key most frequent value): corpus groupby
    to (user, type) counts, then relops.grouped_topk k=1 with a
    batch-local prune — the distributed DISTINCT ON / QUALIFY shape."""
    from ray.data.aggregate import Count

    from ...stages.relops import grouped_topk

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


def events_moving_sum(sf_dir: str) -> pd.DataFrame:
    """Bounded moving-window aggregate: per-user rolling sum of the last
    3 event values (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) via
    stages/relops.grouped_rolling_sum — one keyed shuffle, per-group
    vectorized cumsum difference, integer units for oracle exactness."""
    from ...stages.relops import grouped_rolling_sum

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
    from ...stages.relops import grouped_rolling_sum

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


def events_preceding_hour_counts(sf_dir: str) -> pd.DataFrame:
    """Event-time interval SELF-JOIN (stream-stream windowed-join shape,
    stages/relops.grouped_interval_count): per event, how many same-user
    events landed in the preceding hour [ts-1h, ts). One user-keyed
    shuffle; per group two vectorized searchsorted probes — the
    O(rows x window) pair list is never materialized."""
    from ...stages.relops import grouped_interval_count

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
    from ...stages.relops import grouped_range_sum

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
    from ...stages.relops import grouped_funnel_stage

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

    from ...stages.relops import grouped_funnel_stage

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

    from ...stages.relops import _WB

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


def user_sessions(sf_dir: str) -> pd.DataFrame:
    """Full sessionization table (the session-id sibling of
    grouped_session_count): one row per (user, session) with the
    1-based session ordinal, event count, and session start/end in
    epoch micros; sessions split on a >1 h same-user gap. One
    hash-bucket shuffle; per bucket a single lexsort + vectorized
    boundary masks; output is O(sessions). Duplicate timestamps are
    order-safe on both sides (ties have gap 0)."""
    from ...stages.relops import grouped_sessionize

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

    from ...stages.relops import grouped_sessionize

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


def event_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Keyed PERCENT_RANK window (relops.grouped_percent_rank): each
    event's value percentile among the same user's events, RANK tie
    semantics. One hash-bucket shuffle; the per-bucket kernel computes
    every user's tie-shared ranks in one lexsort + cumsum-gather, and
    the (rank-1)/(n-1) division is int64→float64 on both engines so the
    doubles match the SQL oracle bit-for-bit."""
    from ...stages.relops import grouped_percent_rank

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

    from ...stages.relops import interval_overlap_counts

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

    from ...stages.relops import _WB, _group_codes, _int64_nonull, _route_by_group

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

    from ...stages.relops import grouped_lag

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

    from ...stages.joins import broadcast_join, hash_join

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
    if cohort.count() <= _base._BROADCAST_SIDE_ROUTE_ROWS:
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
    from ...stages.relops import grouped_first_last

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


def events_daily_top_user(sf_dir: str) -> pd.DataFrame:
    """Per-day argmax user by exact total event value (the leaderboard
    shape): rollup to the (day, user) grain first (combiner-reduced —
    the corpus never reaches the window kernel), then
    :func:`..stages.relops.grouped_topk` with k=1 ordered by
    (-total, user) — deterministic min-user tie-break, batch-local
    prune before the one bucket shuffle."""
    from ray.data.aggregate import Sum

    from ...stages.relops import grouped_topk

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

    from ...stages.relops import _WB

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


def event_value_cume_dist(sf_dir: str) -> pd.DataFrame:
    """Keyed CUME_DIST window (relops.grouped_cume_dist): each event's
    cumulative distribution position among the same user's values, tie
    rows sharing the count at their run's end. One hash-bucket shuffle;
    the <=-count / n division is int64->float64 on both engines so the
    doubles match the SQL oracle bit-for-bit."""
    from ...stages.relops import grouped_cume_dist

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


def event_user_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-user GINI-SIMPSON DIVERSITY of event types:
    1 - Σc_i²/N² computed as (N² - Σc_i²)/N² — the behavioral-entropy
    sibling that stays in EXACT int64 (a true Shannon entropy would sum
    per-group doubles, whose order DuckDB does not pin).

    Scale plan: batch-local (user, type) count partials, ONE
    user-hash bucket shuffle, per bucket two Arrow group_by rollups
    (type-level collapse, then user-level Σc / Σc² / distinct-type
    count) — output O(users), raw events never converge anywhere."""
    from ...stages.relops import _WB, _route_by_group

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
    from ...stages.relops import _WB, _route_by_group

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

    from ...stages.relops import _WB, _group_codes, _route_by_group, _segment_bounds

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


def events_value_forward_fill(sf_dir: str) -> pd.DataFrame:
    """Per-user FORWARD FILL (LAST_VALUE ... IGNORE NULLS): click events
    carry no usable value in this scenario, so each click inherits the
    latest preceding non-click value of the same user (ordered by ts
    with event_id tie-break); clicks before any non-click event stay
    null. Runs on relops.grouped_forward_fill — one bucket shuffle, one
    lexsort + segment-barrier cummax per bucket; the double payload
    passes through a take untouched, so values are bit-identical to the
    SQL oracle."""
    from ...stages.relops import grouped_forward_fill

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


def user_daily_streaks(sf_dir: str) -> pd.DataFrame:
    """GAPS-AND-ISLANDS per user: count of consecutive-day activity
    streaks, the longest streak, and total active days — the classic
    engagement metric built from the day - row_number() island trick.

    Scale plan: batch-local DISTINCT (user, epoch-day) partials, ONE
    user-hash bucket shuffle, per bucket one lexsort then fully
    vectorized island detection (boundary mask -> reduceat island
    lengths -> per-user reduceat of counts/max) — no per-user Python,
    output O(users)."""
    from ...stages.relops import _WB, _route_by_group

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

    from ...stages.joins import broadcast_join

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
    from ...stages.relops import grouped_rolling_max

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
    from ...stages.relops import grouped_rolling_median

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
    from ...stages.relops import _WB, _route_by_group

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
    from ...stages.relops import (
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


def events_interarrival_cv(sf_dir: str) -> pd.DataFrame:
    """Per-event-type INTER-ARRIVAL coefficient of variation: gaps
    between consecutive arrivals (deciseconds — floor(us/1e5), the
    resolution that keeps Σgap² exact in int64 across a multi-year
    span), CV = sample-stddev(gap) / mean(gap) — the dispersion
    companion of event_type_burstiness (CV≈1 Poisson, ≫1 bursty) and
    the crawl politeness tuner's per-host arrival model applied to the
    events table.

    Scale plan: per-batch partials collapse events to distinct
    (type, ds, count) rows (ties are pure zero gaps — they never ship),
    ONE type-hash bucket shuffle co-locates each type, and each bucket
    reduces its types to exact int64 moments (n_gaps, Σg, Σg²) with a
    lexsort + one np.diff — consecutive-distinct diffs are invariant
    under tie order, so engine and SQL agree bit-for-bit. The driver
    sees O(types) moment rows and applies ONE identically-parenthesized
    double formula; n<2 or zero-mean types are NULL like the oracle.

    Documented bound (the grouped_quantile_sketch contract): a type's
    whole distinct-decisecond history lands in ONE bucket task, so
    per-type volume is capped at min(events, time-span deciseconds) per
    task — audit-style type counts over year-scale spans fit; a
    few-type 10^10-event corpus wants the sort-range-partition variant
    (diffs inside ranges + boundary stitch, the rolling-kernel shape)
    instead of this bucket plan."""
    from ...stages.relops import _WB, _route_by_group

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    _EMPTY_CV = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "ds": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_CV
        us = np.asarray(
            pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        ds = us // 100_000
        types = np.asarray(
            t["event_type"].to_numpy(zero_copy_only=False), dtype=object
        )
        uniq, codes = np.unique(types, return_inverse=True)
        comp = codes.astype(np.int64) * np.int64(1 << 44) + ds
        if ds.size and (ds.max() >= 1 << 44 or ds.min() < 0):
            raise ValueError("events_interarrival_cv: ds out of 2^44 range")
        keys, cnt = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(
                    uniq[keys // np.int64(1 << 44)], pa.string()
                ),
                "ds": pa.array(keys % np.int64(1 << 44)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def _moments(g: pa.Table) -> pa.Table:
        if _WB in g.column_names:
            g = g.drop_columns([_WB])
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    "sg": pa.array([], pa.int64()),
                    "sgg": pa.array([], pa.int64()),
                }
            )
        types = np.asarray(
            g["event_type"].to_numpy(zero_copy_only=False), dtype=object
        )
        ds = np.asarray(g["ds"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cnt = np.asarray(
            g["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        uniq, codes = np.unique(types, return_inverse=True)
        order = np.lexsort((ds, codes))
        c, d, m = codes[order], ds[order], cnt[order]
        # cross-batch repeats of the same (type, ds) merge here
        same = np.concatenate(
            [[False], (c[1:] == c[:-1]) & (d[1:] == d[:-1])]
        )
        if same.any():
            keep = ~same
            first = np.nonzero(keep)[0]
            seg = np.cumsum(keep) - 1
            m = np.bincount(seg, weights=m).astype(np.int64)
            c, d = c[first], d[first]
        newseg = np.concatenate([[True], c[1:] != c[:-1]])
        gaps = np.diff(d)
        gaps[newseg[1:]] = 0  # mask cross-type diffs
        valid = ~newseg[1:]
        starts = np.nonzero(newseg)[0]
        seg_id = np.cumsum(newseg) - 1
        n_events = np.bincount(seg_id, weights=m).astype(np.int64)
        sg = np.bincount(
            seg_id[1:][valid], weights=gaps[valid],
            minlength=len(starts),
        ).astype(np.int64)
        sgg = np.bincount(
            seg_id[1:][valid], weights=(gaps * gaps)[valid],
            minlength=len(starts),
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(uniq[c[starts]], pa.string()),
                "n_gaps": pa.array(n_events - 1),
                "sg": pa.array(sg),
                "sgg": pa.array(sgg),
            }
        )

    agg = (
        _route_by_group(
            ev.map_batches(_partial, batch_format="pyarrow"),
            "event_type",
            16,
        )
        .groupby(_WB)
        .map_groups(_moments, batch_format="pyarrow")
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_gaps": pd.Series([], dtype="int64"),
                "total_gap_ds": pd.Series([], dtype="int64"),
                "cv": pd.Series([], dtype="float64"),
            }
        )
    n = agg["n_gaps"].to_numpy(dtype="int64").astype(np.float64)
    sg = agg["sg"].to_numpy(dtype="int64").astype(np.float64)
    sgg = agg["sgg"].to_numpy(dtype="int64").astype(np.float64)
    ok = (n > 1) & (sg > 0)
    cv = np.where(
        ok,
        np.sqrt(
            (n * sgg - sg * sg) / np.where(ok, n * (n - 1), 1.0)
        )
        / (sg / np.where(ok, n, 1.0)),
        np.nan,
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n_gaps": agg["n_gaps"].astype("int64"),
            "total_gap_ds": agg["sg"].astype("int64"),
            "cv": cv,
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)
