"""PII redaction (stages/redact) + Gopher repetition gate semantics."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from webscrape_neko_jirushi_ray.stages.linededup import gopher_filter
from webscrape_neko_jirushi_ray.stages.redact import redact_pii


def _ds(rows: list[dict]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
                "text": pa.array([r["text"] for r in rows]),
            }
        )
    )


def test_redact_all_three_kinds():
    ds = _ds(
        [
            {
                "doc_id": 1,
                "text": "mail bob.smith+tag@sub.example.co.uk or 192.168.1.255 "
                "tel 555-010-0042 done",
            }
        ]
    )
    out = redact_pii(ds).to_pandas().iloc[0]
    assert out["text"] == "mail <EMAIL> or <IP> tel <PHONE> done"
    assert (out["n_emails"], out["n_ips"], out["n_phones"]) == (1, 1, 1)


def test_redact_no_pii_is_identity():
    ds = _ds([{"doc_id": 2, "text": "plain words only 12 34-56 a.b"}])
    out = redact_pii(ds).to_pandas().iloc[0]
    assert out["text"] == "plain words only 12 34-56 a.b"
    assert (out["n_emails"], out["n_ips"], out["n_phones"]) == (0, 0, 0)


def test_redact_multiple_and_boundaries():
    # two emails, word-boundary guards: 1.2.3.4.5 has no clean \b IPv4 and
    # gets greedily matched left-to-right; digits glued to letters don't
    # match the phone pattern
    ds = _ds(
        [
            {
                "doc_id": 3,
                "text": "a@b.co c@d.org ip 10.0.0.1 x555-010-0042 555-010-0042",
            }
        ]
    )
    out = redact_pii(ds).to_pandas().iloc[0]
    assert out["text"] == "<EMAIL> <EMAIL> ip <IP> x555-010-0042 <PHONE>"
    assert (out["n_emails"], out["n_ips"], out["n_phones"]) == (2, 1, 1)


def test_redact_counts_optional():
    ds = _ds([{"doc_id": 4, "text": "a@b.co"}])
    out = redact_pii(ds, counts=False).to_pandas()
    assert list(out.columns) == ["doc_id", "text"]
    assert out.iloc[0]["text"] == "<EMAIL>"


def test_gopher_filter_thresholds():
    short = " ".join(f"w{i}" for i in range(10))            # <20 words
    repet = " ".join(["dup"] * 10 + [f"u{i}" for i in range(30)])  # top 10/40
    clean = " ".join(f"t{i}" for i in range(40))             # passes
    selfdup = " ".join([f"c{i%8}" for i in range(8)] * 5)    # 5 identical chunks
    ds = _ds(
        [
            {"doc_id": 1, "text": short},
            {"doc_id": 2, "text": repet},
            {"doc_id": 3, "text": clean},
            {"doc_id": 4, "text": selfdup},
        ]
    )
    got = gopher_filter(ds, width=8, min_words=20).to_pandas()
    assert sorted(got["doc_id"]) == [3]
    row = got.iloc[0]
    assert row["n_words"] == 40 and row["n_dup_chunks"] == 0
