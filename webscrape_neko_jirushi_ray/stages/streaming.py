"""Stream-shaped processing: incremental windowed aggregation with actor
state (SURVEY.md §2.9 / ray_guide "Streaming-shaped workloads").

Ray Data has no event-time watermarks; the pattern for stream-shaped
references is: treat the input as an ordered log (sort by ts), feed
batches to per-key-bucket actors that hold open-window state, emit a
window when the watermark (max event time seen minus allowed lateness)
passes its end, and flush the rest at end-of-stream.

Ordering assumption (stated per the guide): batches arrive in global ts
order (the pipeline sorts first); within a batch, rows may be unordered.
Late rows inside the lateness bound merge into their open window; rows
later than that are counted in ``late_dropped`` (the reference's
failed-set-style accounting rather than an exception).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray


def _stable_bucket(key, num_buckets: int) -> int:
    """Process-stable key routing (Python's hash() is randomized)."""
    h = hashlib.md5(str(key).encode("utf-8")).digest()
    return int.from_bytes(h[:4], "little") % num_buckets


@ray.remote(num_cpus=0.25)
class WindowBucketActor:
    """Holds open tumbling windows for its share of keys."""

    def __init__(self, window_us: int, lateness_us: int):
        self.window_us = window_us
        self.lateness_us = lateness_us
        # (key, window_start) -> [count, value_sum]
        self.open: dict[tuple, list] = defaultdict(lambda: [0, 0.0])
        self.emitted: list[tuple] = []
        self.late_dropped = 0
        self.watermark = -(1 << 62)

    def feed(self, keys: list, ts_us: list, values: list) -> None:
        for k, t, v in zip(keys, ts_us, values):
            if t < self.watermark - self.lateness_us:
                self.late_dropped += 1
                continue
            w = (t // self.window_us) * self.window_us
            cell = self.open[(k, w)]
            cell[0] += 1
            cell[1] += v
            if t > self.watermark:
                self.watermark = t
        self._emit_closed()

    def _emit_closed(self) -> None:
        horizon = self.watermark - self.lateness_us
        for kw in [kw for kw in self.open if kw[1] + self.window_us <= horizon]:
            c = self.open.pop(kw)
            self.emitted.append((kw[0], kw[1], c[0], c[1]))

    def flush(self) -> pa.Table:
        for kw, c in sorted(self.open.items()):
            self.emitted.append((kw[0], kw[1], c[0], c[1]))
        self.open.clear()
        keys = [e[0] for e in self.emitted]
        return pa.table(
            {
                "key": pa.array(keys),
                "window_start_us": pa.array([e[1] for e in self.emitted], type=pa.int64()),
                "n": pa.array([e[2] for e in self.emitted], type=pa.int64()),
                "value_sum": pa.array([e[3] for e in self.emitted], type=pa.float64()),
                "late_dropped_total": pa.array(
                    [self.late_dropped] * len(self.emitted), type=pa.int64()
                ),
            }
        )


def incremental_windows(
    events,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
    lateness_s: int = 0,
    num_buckets: int = 4,
    batch_size: int = 4096,
) -> pa.Table:
    """events Dataset → finalized tumbling windows (key, window_start_us,
    n, value_sum), computed incrementally through per-bucket state actors.

    The Dataset is ts-sorted (a shuffle), then streamed batch-by-batch
    through ``iter_batches`` with rows routed to ``hash(key) % K`` actors —
    state stays bounded by open windows, never by the stream length."""
    window_us = window_s * 1_000_000
    lateness_us = lateness_s * 1_000_000
    actors = [
        WindowBucketActor.remote(window_us, lateness_us) for _ in range(num_buckets)
    ]
    ordered = events.sort(ts_col)
    pending = []
    for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        keys = batch[key_col].to_pylist()
        ts = np.asarray(
            batch[ts_col].cast(pa.int64()).to_pylist()
            if hasattr(batch[ts_col], "cast")
            else batch[ts_col].to_pylist(),
            dtype=np.int64,
        )
        vals = batch[value_col].to_pylist()
        buckets = np.asarray([_stable_bucket(k, num_buckets) for k in keys])
        for b in range(num_buckets):
            idx = np.nonzero(buckets == b)[0]
            if idx.size:
                pending.append(
                    actors[b].feed.remote(
                        [keys[i] for i in idx],
                        ts[idx].tolist(),
                        [vals[i] for i in idx],
                    )
                )
    ray.get(pending)
    parts = ray.get([a.flush.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    out = pa.concat_tables([p for p in parts if p.num_rows], promote_options="default")
    return out.sort_by([("key", "ascending"), ("window_start_us", "ascending")])
