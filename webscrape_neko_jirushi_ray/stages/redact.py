"""PII redaction over a text column — vectorized RE2 scrub.

Web-crawl training corpora scrub personally identifiable information
before anything downstream sees the text (emails, IPv4 addresses, phone
numbers are the canonical trio). This stage is a pure map: one
``map_batches`` pass, no shuffle, no state — so it scales linearly and
composes in front of any dedup/quality stage.

Scale design: each pattern is ONE ``pc.replace_substring_regex`` Arrow C
kernel call per batch (RE2 under the hood, precompiled inside Arrow) —
no Python touches a string. Match counts (for audit/report sinks) come
from ``pc.count_substring_regex`` on the pre-scrub text. DuckDB's
``regexp_replace(..., 'g')`` / ``regexp_extract_all`` are RE2 too, which
is what makes the driver oracle an exact string-equality check.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# (name, RE2 pattern, replacement) — applied in order. EMAIL first: its
# local/domain parts contain dots and digits that the later patterns
# must never see; IP before PHONE is safe (phones here have no dots).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phones", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_batch(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Scrub one Arrow string column; returns the redacted column."""
    out = pc.cast(col, pa.string())
    for _, pat, repl in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def redact_pii(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    counts: bool = True,
) -> "ray.data.Dataset":
    """Redact PII in ``text_col`` in place; with ``counts`` adds one
    int64 ``n_<kind>`` column per pattern (match count pre-scrub)."""

    def _redact(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch[text_col], pa.string())
        if counts:
            for name, pat, _ in PII_PATTERNS:
                n = pc.cast(pc.count_substring_regex(col, pattern=pat), pa.int64())
                batch = batch.append_column(f"n_{name}", n)
        return batch.set_column(
            batch.schema.get_field_index(text_col), text_col, redact_batch(col)
        )

    return ds.map_batches(_redact, batch_format="pyarrow", batch_size=4096)
