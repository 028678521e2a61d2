"""Exact frequency heavy hitters in two passes (sketch-prune + verify).

The classic streaming result behind Misra-Gries / SpaceSaving: any token
whose GLOBAL frequency exceeds N/k must, by pigeonhole, exceed N_b/k in at
least one batch b (sum of per-batch totals = N; if every local share were
<= N_b/k the global sum would be <= N/k). So the union of per-batch
locally-heavy tokens — at most k per batch — is a guaranteed SUPERSET of
the global heavy hitters, and a second exact counting pass over just those
candidates makes the output EXACT (hence SQL-checkable), never streaming
the corpus vocabulary anywhere.

Scale design:
- pass 1 is shuffle-free: one vectorized unique+count per batch, emitting
  <= k candidate rows + 1 total row per batch (metadata-sized);
- the candidate set (<= k x blocks rows) is the ONLY driver
  materialization, and it is bounded by the plan shape, not the corpus;
  it broadcasts once via ``ray.put``;
- pass 2 is a per-batch ``np.isin`` count against the broadcast candidates
  -> one tiny ``groupby(token).sum`` over <= k x blocks partial rows.

Reference parity: extends the wordcount/top-k family
(``pipelines/queries.top_tokens``; reference counter reports
``image_scraping.py`` summary counters) with the bounded-memory frequent-
items shape a 100 TB token stream needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ray.data.aggregate import Sum


def _batch_tokens(t: pa.Table, text_col: str) -> np.ndarray:
    """Vectorized whitespace tokens of a batch (tokens_ws parity: trim,
    split on runs of whitespace, no empty tokens)."""
    trimmed = pc.utf8_trim_whitespace(t[text_col])
    toks = pc.list_flatten(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
    toks = toks.filter(pc.not_equal(toks, ""))
    return np.asarray(toks.to_numpy(zero_copy_only=False))


def heavy_hitter_tokens(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    k: int = 50,
    batch_size: int = 1024,
) -> pa.Table:
    """All tokens with global count * k > total tokens, with EXACT counts.

    Returns a small pyarrow table (token, cnt) sorted by token — by
    definition at most k-1 rows.
    """

    def _pass1(t: pa.Table) -> pa.Table:
        toks = _batch_tokens(t, text_col)
        if len(toks) == 0:
            return pa.table(
                {
                    "token": pa.array([None], type=pa.string()),
                    "n": pa.array([0], type=pa.int64()),
                }
            )
        vocab, cnt = np.unique(toks, return_counts=True)
        heavy = cnt * k > len(toks)
        return pa.table(
            {
                # null-token row carries the batch's total for the exact
                # threshold N; candidate rows carry their local counts
                "token": pa.array(
                    list(vocab[heavy]) + [None], type=pa.string()
                ),
                "n": pa.array(
                    list(cnt[heavy]) + [len(toks)], type=pa.int64()
                ),
            }
        )

    partials = ds.map_batches(
        _pass1, batch_format="pyarrow", batch_size=batch_size
    ).materialize()

    # candidate set: <= k x blocks rows — bounded by the plan, not the data
    cand_tbl = (
        partials.map_batches(
            lambda t: t.filter(pc.is_valid(t["token"])),
            batch_format="pyarrow",
        )
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    cand_df = cand_tbl.to_pandas()
    if "token" not in cand_df.columns or len(cand_df) == 0:
        # no batch had a locally-heavy token => no global heavy hitter
        return pa.table(
            {
                "token": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    cands = np.asarray(cand_df["token"], dtype=object).astype(str)
    total = partials.map_batches(
        lambda t: t.filter(pc.is_null(t["token"])), batch_format="pyarrow"
    ).aggregate(Sum("n", alias_name="n"))["n"]
    cands_ref = ray.put(np.sort(cands))

    def _pass2(t: pa.Table) -> pa.Table:
        toks = _batch_tokens(t, text_col)
        cand = ray.get(cands_ref)
        if len(toks) == 0 or len(cand) == 0:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        toks = toks[np.isin(toks, cand)]
        vocab, cnt = np.unique(toks, return_counts=True)
        return pa.table(
            {
                "token": pa.array(vocab, type=pa.string()),
                "cnt": pa.array(cnt, type=pa.int64()),
            }
        )

    exact = (
        ds.map_batches(_pass2, batch_format="pyarrow", batch_size=batch_size)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    out = exact.to_pandas()  # <= k x blocks rows
    out = out[out["cnt"] * k > int(total)]
    out = out.sort_values("token").reset_index(drop=True)
    return pa.table(
        {
            "token": pa.array(out["token"], type=pa.string()),
            "cnt": pa.array(out["cnt"], type=pa.int64()),
        }
    )
