"""Document-level text analysis stages over the documents table.

Each stage is a vectorized/batched ``map_batches`` transform adding columns;
row-wise kernels live in ``functions/textkit.py`` (tested directly, and the
SQL-parity ones oracled through DuckDB in ``pipelines/queries.py``).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions import textkit


def add_token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """+ n_tokens (whitespace, SQL-parity) and n_bpeish (BPE-style regex)."""

    def _tok(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = batch.append_column(
            "n_tokens",
            pa.array([textkit.token_count_ws(t or "") for t in texts], type=pa.int64()),
        )
        return out.append_column(
            "n_bpeish",
            pa.array([len(textkit.tokens_bpeish(t or "")) for t in texts], type=pa.int64()),
        )

    return docs.map_batches(_tok, batch_format="pyarrow", batch_size=2048)


def add_quality(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """+ the quality_stats feature columns and the scalar quality_score."""

    def _q(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        stats = [textkit.quality_stats(t or "") for t in texts]
        out = batch
        for name, typ in (
            ("n_words", pa.int64()),
            ("n_chars_nospace", pa.int64()),
            ("mean_word_len", pa.float64()),
            ("alpha_ratio", pa.float64()),
            ("upper_ratio", pa.float64()),
            ("punct_ratio", pa.float64()),
            ("stopword_ratio", pa.float64()),
        ):
            out = out.append_column(name, pa.array([s[name] for s in stats], type=typ))
        return out.append_column(
            "quality_score",
            pa.array(
                [textkit.quality_score_from_stats(s) for s in stats],
                type=pa.float64(),
            ),
        )

    return docs.map_batches(_q, batch_format="pyarrow", batch_size=2048)


class LangIdStage:
    """Language-ID as a stateful stage (regexes compiled once per actor —
    the ST-pattern; with a real fasttext-style model this is where it
    loads). Adds ``lang_pred``."""

    def __init__(self):
        self.detect = textkit.detect_lang  # regexes are module-compiled

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "lang_pred",
            pa.array(
                [self.detect(t or "") for t in batch["text"].to_pylist()],
                type=pa.string(),
            ),
        )


def add_lang_pred(
    docs: "ray.data.Dataset", concurrency: int | None = None
) -> "ray.data.Dataset":
    """+ ``lang_pred``. Default is a TASK-pool map_batches (the heuristic
    detector's regexes are module-compiled, so there is no per-actor setup
    to amortize), which lets Ray fuse this stage with adjacent map/filter
    stages instead of pinning an actor-pool boundary into the plan. Pass
    ``concurrency`` to run ``LangIdStage`` as an actor pool — the shape a
    real model-loading language ID (fasttext-style) needs."""
    if concurrency is None:
        stage = LangIdStage()
        return docs.map_batches(
            lambda b: stage(b), batch_format="pyarrow", batch_size=2048
        )
    return docs.map_batches(
        LangIdStage, batch_format="pyarrow", batch_size=2048, concurrency=concurrency
    )


def add_fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """+ fp_md5 (SQL-parity md5 of normalized text) and fp_rolling
    (Rabin-Karp min-window signature)."""

    def _fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = batch.append_column(
            "fp_md5",
            pa.array([textkit.fingerprint_md5(t or "") for t in texts], type=pa.string()),
        )
        return out.append_column(
            "fp_rolling",
            pa.array([textkit.rolling_fingerprint(t or "") for t in texts], type=pa.int64()),
        )

    return docs.map_batches(_fp, batch_format="pyarrow", batch_size=2048)
