"""Training-data text-preparation pipeline: the composed endpoint.

Chains the training-data operators the way a 100 TB corpus run would:

    documents
      → language ID (actor stage)
      → quality scoring + length filters (vectorized)
      → exact dedup (normalized-md5 keep-first)
      → MinHash-LSH near-dedup (shingle/band shuffle + verify)
      → token counting
      → kept corpus + per-stage accounting

Every stage streams; the only materialized artifacts are the per-stage
counters (scalars) and the LSH candidate set (bounded by banding). The
stage order is the cost-aware one: cheap row-local filters first, the
shuffle-heavy near-dedup last, over the already-shrunk corpus.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..stages.dedup import exact_dedup, minhash_lsh_dedup
from ..stages.textstats import add_lang_pred, add_quality, add_token_counts


def prepare_text_corpus(
    docs: "ray.data.Dataset",
    *,
    keep_langs: tuple[str, ...] | None = None,
    min_words: int = 10,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
) -> tuple["ray.data.Dataset", dict]:
    """Returns (kept_docs, report). ``docs`` needs doc_id + text columns."""
    # datasets are lazy: each stage is materialize()d once so the stage
    # counters don't re-execute the whole lineage (the corpus shrinks
    # monotonically, so pinning each survivor set is the cheap direction;
    # at 100 TB the counters would instead come from written stage outputs)
    report: dict[str, int] = {"input": docs.count()}

    staged = add_quality(add_lang_pred(docs))
    if keep_langs:
        langs = set(keep_langs)
        staged = staged.map_batches(
            lambda t, _l=langs: t.filter(
                pa.array([x in _l for x in t["lang_pred"].to_pylist()])
            ),
            batch_format="pyarrow",
        ).materialize()
        report["after_lang_filter"] = staged.count()

    def _quality_gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.greater_equal(t["n_words"], min_words),
            pc.greater_equal(t["quality_score"], min_quality),
        )
        return t.filter(mask)

    staged = staged.map_batches(_quality_gate, batch_format="pyarrow").materialize()
    report["after_quality"] = staged.count()

    staged = exact_dedup(staged).materialize()
    report["after_exact_dedup"] = staged.count()

    staged = minhash_lsh_dedup(staged, threshold=near_dup_threshold).materialize()
    report["after_near_dedup"] = staged.count()

    staged = add_token_counts(staged)
    tok = staged.aggregate(ray.data.aggregate.Sum("n_tokens", alias_name="total_tokens"))
    report["total_tokens"] = int(tok["total_tokens"] or 0)
    return staged, report
