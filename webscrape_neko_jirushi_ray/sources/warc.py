"""WARC source/sink: read Common-Crawl-style WARC files into the pages
table (input_hint schema) and write them back.

Minimal WARC/1.0 implementation over public format docs (ISO 28500):
records are ``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<block>\\r\\n\\r\\n``;
``response`` records carry an HTTP envelope whose body is the page bytes.
Handles plain and gzip member-per-record files (the Common Crawl layout)
with stdlib zlib only.

Reading is a Ray pipeline: ``read_binary_files`` over the .warc(.gz)
shards → per-file record parse in ``map_batches`` → pages rows. One task
per file — the Common Crawl distribution unit (~1 GB gz segments), which
is the right parallel grain at 10^5 segments.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import os

import pyarrow as pa

import ray.data

WARC_VERSION = b"WARC/1.0"


def _http_envelope(body: bytes, content_type: str = "text/html; charset=UTF-8") -> bytes:
    head = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
    )
    return head + body


def write_warc(
    pages: pa.Table, path: str, *, compress: bool = True
) -> str:
    """pages(url, warc_ts, html, ...) → one WARC file (gzip member per
    record when ``compress``, per the Common Crawl convention)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    raw = io.BytesIO()
    for row in pages.to_pylist():
        body = _http_envelope(row["html"] or b"")
        ts = row["warc_ts"] or _dt.datetime(2025, 1, 1)
        headers = (
            WARC_VERSION + b"\r\n"
            + b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {row['url']}\r\n".encode()
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
        )
        record = headers + body + b"\r\n\r\n"
        if compress:
            raw.write(gzip.compress(record))
        else:
            raw.write(record)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw.getvalue())
    os.replace(tmp, path)
    return path


def parse_warc_bytes(blob: bytes) -> list[dict]:
    """One WARC file's bytes → [{url, warc_ts, html}] for response records.
    Handles gzip (multi-member) and plain files."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)  # zlib handles concatenated members
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(WARC_VERSION, pos)
        if start < 0:
            break
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode()] = v.strip().decode()
        length = int(headers.get("content-length", "0"))
        block = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        # strip the HTTP envelope
        http_end = block.find(b"\r\n\r\n")
        body = block[http_end + 4 :] if http_end >= 0 else block
        ts_raw = headers.get("warc-date", "2025-01-01T00:00:00Z")
        ts = _dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
        out.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": ts,
                "html": body,
            }
        )
    return out


def read_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """WARC shards → pages Dataset (url, warc_ts, html, text, lang).
    ``text`` is recomputed with the engine's extractor; lang left '' (the
    langid stage fills it downstream)."""
    from ..functions.htmlkit import extract_text

    files = ray.data.read_binary_files(paths, include_paths=False)

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for blob in batch["bytes"].to_pylist():
            rows.extend(parse_warc_bytes(blob))
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], type=pa.string()),
                "warc_ts": pa.array(
                    [r["warc_ts"] for r in rows], type=pa.timestamp("us")
                ),
                "html": pa.array([r["html"] for r in rows], type=pa.binary()),
                "text": pa.array(
                    [
                        extract_text(r["html"].decode("utf-8", errors="replace"))
                        for r in rows
                    ],
                    type=pa.string(),
                ),
                "lang": pa.array([""] * len(rows), type=pa.string()),
            }
        )

    return files.map_batches(_parse, batch_format="pyarrow", batch_size=1)
