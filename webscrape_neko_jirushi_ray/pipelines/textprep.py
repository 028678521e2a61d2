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
    collect_report: bool = True,
) -> tuple["ray.data.Dataset", dict]:
    """Returns (kept_docs, report). ``docs`` needs doc_id + text columns.
    ``collect_report=False`` skips the per-stage survivor counters: each
    counter pins (materializes) its stage boundary, a fixed per-stage Ray
    job the counters alone pay for — callers that only want the kept
    corpus (the benched query path) chain one lineage instead. At 100 TB
    the counters would come from written stage outputs either way."""
    # datasets are lazy: each counted stage is materialize()d once so the
    # stage counters don't re-execute the whole lineage (the corpus
    # shrinks monotonically, so pinning each survivor set is the cheap
    # direction)
    report: dict[str, int] = {}
    if collect_report:
        report["input"] = docs.count()

    staged = add_quality(add_lang_pred(docs))
    if keep_langs:
        langs = set(keep_langs)
        staged = staged.map_batches(
            lambda t, _l=langs: t.filter(
                pa.array([x in _l for x in t["lang_pred"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
        if collect_report:
            staged = staged.materialize()
            report["after_lang_filter"] = staged.count()

    def _quality_gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.greater_equal(t["n_words"], min_words),
            pc.greater_equal(t["quality_score"], min_quality),
        )
        return t.filter(mask)

    staged = staged.map_batches(_quality_gate, batch_format="pyarrow")
    if collect_report:
        staged = staged.materialize()
        report["after_quality"] = staged.count()

    # ALWAYS pin here: the near-dedup consumes this lineage three times
    # (shingle blobs, the pair verify's doc side, and the kept output) —
    # unpinned, the lang/quality/exact stages would re-execute per consumer
    staged = exact_dedup(staged).materialize()
    if collect_report:
        report["after_exact_dedup"] = staged.count()

    staged = minhash_lsh_dedup(staged, threshold=near_dup_threshold)
    if collect_report:
        staged = staged.materialize()
        report["after_near_dedup"] = staged.count()

    staged = add_token_counts(staged)
    if collect_report:
        tok = staged.aggregate(
            ray.data.aggregate.Sum("n_tokens", alias_name="total_tokens")
        )
        report["total_tokens"] = int(tok["total_tokens"] or 0)
    return staged, report
