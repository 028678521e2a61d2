"""Line/chunk-level corpus dedup + within-doc repetition stats.

C4/RefinedWeb-style exact substring dedup at line granularity: every
document is split into fixed-width token "lines" (WIDTH words each — the
stand-in for newline-delimited lines on corpora without newlines, exactly
the C4 three-sentence-span trick), each line is kept only at its FIRST
corpus occurrence (min (doc_id, position)), and surviving lines are
reassembled per document in original order. Documents that lose every
line drop out. Generalizes the reference's exact-duplicate removal
(aggressive_cleaning.py:170-200) from whole-file MD5 to within-document
spans — the form that moves the needle on web-crawl training data, where
boilerplate repeats across pages that are not full duplicates.

Gopher-style repetition stats (Rae et al. 2021 quality signals) ride the
same tokenization: words-per-doc, distinct words, top-word multiplicity,
chunk count and within-doc duplicate-chunk count — all row-local
(NO shuffle; one map_batches pass).

Scale design:
- chunking is Arrow-vectorized end-to-end: ``pc.split_pattern`` → flat
  word values + numpy offset math → ``pa.ListArray.from_arrays`` →
  ``pc.binary_join``. No Python loop touches a word.
- grouping/uniqueness runs on ``dictionary_encode`` integer codes
  (Arrow C kernel), never on Python strings.
- keep-first is the hash-partition + partition-scan pattern of
  stages/dedup.exact_dedup: lines shuffle ONCE keyed by a 64-bit line
  hash partition; within a partition one lexsort + boundary mask — not a
  per-distinct-line group call. The routing hash itself is vectorized
  (vocabulary-hash + segmented polynomial — no per-line Python; lines
  are near-all-distinct so hashing "only unique lines" wouldn't help).
- reassembly co-partitions surviving lines by doc_id hash and rebuilds
  each partition's docs with one lexsort + list-offset join.
Nothing materializes O(corpus) state on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# fibonacci-mix for partition assignment (same constant as stages/dedup)
_PMIX = np.uint64(0x9E3779B97F4A7C15)

_LINE_PARTITIONS = 64


def _split_words(batch: pa.Table, text_col: str) -> tuple[pa.Array, np.ndarray]:
    """(flat word values aligned to offset 0, per-doc word counts).
    DuckDB-string_split-equal: trailing/double separators yield empty
    words; '' yields one empty word."""
    words = pc.split_pattern(pc.cast(batch[text_col], pa.string()), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    base, end = int(offsets[0]), int(offsets[-1])
    flat = words.values.slice(base, end - base)
    return flat, counts


def _line_pows(width: int) -> np.ndarray:
    """Per-position odd multipliers for the order-sensitive line hash."""
    rng = np.random.default_rng(0x11EDED)
    return (
        rng.integers(0, np.iinfo(np.int64).max, size=width, dtype=np.int64)
        .astype(np.uint64)
        | np.uint64(1)
    )


def _line_hashes(
    flat_words: pa.Array, offsets: np.ndarray, width: int
) -> np.ndarray:
    """uint64 routing hash per line, fully vectorized: hash the VOCABULARY
    once (dictionary_encode C kernel → one hash per distinct word), then
    an order-sensitive segmented polynomial (per-position odd multiplier,
    np.add.reduceat over line starts). Collisions only co-locate lines —
    keep-first still compares actual strings — so a 64-bit mix is plenty
    and NO per-line Python runs (8-word chunks are near-all-distinct, so
    a hash-each-unique-line loop would be O(corpus))."""
    from ..functions.textkit import _hash_strings

    enc = flat_words.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_h = _hash_strings(enc.dictionary.to_pylist())
    wh = vocab_h[codes]
    total = len(codes)
    line_lens = np.diff(np.append(offsets, total))
    word_line = np.repeat(np.arange(len(offsets), dtype=np.int64), line_lens)
    pos_in_line = np.arange(total, dtype=np.int64) - offsets[word_line]
    vals = wh * _line_pows(width)[pos_in_line]
    h = np.add.reduceat(vals, offsets) if total else np.empty(0, np.uint64)
    # mix in the line length so 'a' and 'a a' (same word, same multiplier
    # prefix sums by coincidence) can't alias trivially
    h = (h ^ (line_lens.astype(np.uint64) * _PMIX)) * _PMIX
    return h ^ (h >> np.uint64(29))


def _chunk_lines(
    flat_words: pa.Array, counts: np.ndarray, width: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Group each doc's words into WIDTH-word lines.

    Returns (line strings, doc index per line, cid per line). Lines tile
    each doc contiguously and docs tile the flat word array contiguously,
    so the list offsets are just every line's start word plus a terminal
    total — one ListArray build + one binary_join kernel.
    """
    n_lines = (counts + width - 1) // width  # ceil; every doc has >=1 word
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), n_lines)
    line_cum = np.concatenate([[0], np.cumsum(n_lines)]).astype(np.int64)
    cid = np.arange(int(line_cum[-1]), dtype=np.int64) - line_cum[:-1][doc_idx]
    doc_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    line_start = (doc_starts[doc_idx] + cid * width).astype(np.int64)
    total = int(counts.sum())
    offsets = np.concatenate([line_start, [total]]).astype(np.int32)
    lines_list = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), flat_words
    )
    lines = pc.binary_join(lines_list, " ")
    return lines, doc_idx, cid, line_start


def explode_lines(
    docs: "ray.data.Dataset",
    *,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_hash: bool = False,
) -> "ray.data.Dataset":
    """documents → one row per WIDTH-word line: (doc_id, cid, line[, _lh]).
    ``include_hash`` adds the vectorized uint64 routing hash (computed in
    the same pass from the word dictionary — see :func:`_line_hashes`)."""

    def _explode(batch: pa.Table) -> pa.Table:
        flat, counts = _split_words(batch, text_col)
        lines, doc_idx, cid, line_start = _chunk_lines(flat, counts, width)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        cols = {
            id_col: pa.array(ids, type=pa.int64()),
            "cid": pa.array(cid, type=pa.int64()),
            "line": lines,
        }
        if include_hash:
            cols["_lh"] = pa.array(
                _line_hashes(flat, line_start, width), type=pa.uint64()
            )
        return pa.table(cols)

    return docs.map_batches(_explode, batch_format="pyarrow", batch_size=1024)


def _dict_codes(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, pa.Array]:
    """(int codes per row, unique values) via the Arrow C kernel."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, enc.dictionary


def line_dedup(
    docs: "ray.data.Dataset",
    *,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = _LINE_PARTITIONS,
) -> "ray.data.Dataset":
    """Corpus-wide keep-first line dedup → (doc_id, text) of reassembled
    survivors. A line survives only at its first occurrence ordered by
    (doc_id, cid); docs whose every line is removed drop out.

    ``num_partitions`` sizes BOTH shuffles (line keep-first, doc
    reassembly): each partition is one ``map_groups`` task holding
    ~corpus/num_partitions bytes of exploded lines, so size it to
    ≈ corpus_bytes / 256 MB at scale (the default 64 fits the ≤ 10 GB
    bench corpora; a 100-TB run wants ~4×10^5)."""

    lines_ds = explode_lines(
        docs, width=width, id_col=id_col, text_col=text_col, include_hash=True
    )

    def _part(batch: pa.Table) -> pa.Table:
        # route by the precomputed vectorized line hash (collisions merely
        # co-locate — keep-first compares line strings via dict codes)
        h = batch["_lh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = ((h * _PMIX) >> np.uint64(33)) % np.uint64(num_partitions)
        return batch.drop_columns(["_lh"]).append_column(
            "_p", pa.array(p.astype(np.int64))
        )

    def _first_per_line(g: pa.Table) -> pa.Table:
        codes, _ = _dict_codes(g["line"])
        ids = g[id_col].to_numpy(zero_copy_only=False)
        cids = g["cid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cids, ids, codes))
        cs = codes[order]
        keep_sorted = np.concatenate([[True], cs[1:] != cs[:-1]])
        take = np.sort(np.asarray(order)[keep_sorted])
        return g.take(pa.array(take, type=pa.int64())).drop_columns(["_p"])

    survivors = (
        lines_ds.map_batches(_part, batch_format="pyarrow", batch_size=4096)
        .groupby("_p")
        .map_groups(_first_per_line, batch_format="pyarrow")
    )

    # reassemble: co-partition surviving lines by doc id, then one
    # lexsort + list-offset binary_join per partition
    def _docpart(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = ((ids * _PMIX) >> np.uint64(33)) % np.uint64(num_partitions)
        return batch.append_column("_dp", pa.array(p.astype(np.int64)))

    def _reassemble(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_dp"])
        ids = g[id_col].to_numpy(zero_copy_only=False)
        cids = g["cid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cids, ids))
        ids_s = ids[order]
        lines_s = g["line"].take(pa.array(order, type=pa.int64()))
        if isinstance(lines_s, pa.ChunkedArray):
            lines_s = lines_s.combine_chunks()
        boundaries = np.concatenate(
            [[0], np.nonzero(ids_s[1:] != ids_s[:-1])[0] + 1, [len(ids_s)]]
        ).astype(np.int32)
        doc_lists = pa.ListArray.from_arrays(
            pa.array(boundaries, type=pa.int32()), lines_s
        )
        texts = pc.binary_join(doc_lists, " ")
        return pa.table(
            {
                id_col: pa.array(ids_s[boundaries[:-1]], type=pa.int64()),
                text_col: texts,
            }
        )

    return (
        survivors.map_batches(_docpart, batch_format="pyarrow", batch_size=4096)
        .groupby("_dp")
        .map_groups(_reassemble, batch_format="pyarrow")
    )


def within_doc_line_dedup(
    docs: "ray.data.Dataset",
    *,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Within-document repeated-span removal (the Dolma/RefinedWeb
    paragraph-dedup variant of :func:`line_dedup`): each doc keeps only
    the FIRST occurrence of every distinct WIDTH-word line *within
    itself*; cross-document repeats are untouched. Generalizes the
    reference's within-page keep-first dedup (comprehensive_scraper.py:185,
    198) from image URLs to text spans.

    Scale design: completely SHUFFLE-FREE — a doc's chunks never leave
    the row's own batch, so this is one vectorized ``map_batches`` pass
    (chunk explode → dict-encode → lexsort keep-first mask → list-offset
    reassembly) with zero cross-task state. Safe at any corpus size.
    """

    def _dedup(batch: pa.Table) -> pa.Table:
        flat, counts = _split_words(batch, text_col)
        lines, doc_idx, cid, _ls = _chunk_lines(flat, counts, width)
        line_codes, _ = _dict_codes(lines)
        # first occurrence of each (doc, line), order pinned by cid
        order = np.lexsort((cid, line_codes, doc_idx))
        d_s, c_s = doc_idx[order], line_codes[order]
        first = np.concatenate(
            [[True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        )
        keep = np.sort(np.asarray(order)[first])  # back to (doc, cid) order
        kept_doc = doc_idx[keep]
        lines_kept = lines.take(pa.array(keep, type=pa.int64()))
        if isinstance(lines_kept, pa.ChunkedArray):
            lines_kept = lines_kept.combine_chunks()
        # every doc keeps its cid=0 line, so bincount aligns with the batch
        per_doc = np.bincount(kept_doc, minlength=len(counts)).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(per_doc)]).astype(np.int32)
        doc_lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), lines_kept
        )
        return pa.table(
            {id_col: batch[id_col], text_col: pc.binary_join(doc_lists, " ")}
        )

    return docs.map_batches(_dedup, batch_format="pyarrow", batch_size=1024)


def c4_line_filter(
    docs: "ray.data.Dataset",
    *,
    width: int = 8,
    min_line_words: int | None = None,
    line_blacklist: tuple[str, ...] = (),
    doc_blacklist: tuple[str, ...] = (),
    min_lines: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """C4-style line-level quality gate (Raffel et al. 2020 §2.2),
    adapted to this newline-free corpus where WIDTH-word chunks stand in
    for lines (same convention as :func:`line_dedup`):

    - drop lines shorter than ``min_line_words`` words (default: WIDTH,
      i.e. trailing partial chunks — C4's ">= 3 words" rule analog),
    - drop lines containing any ``line_blacklist`` substring (C4's
      "javascript"/"cookie" boilerplate rule),
    - drop the WHOLE doc if its text contains any ``doc_blacklist``
      substring (C4's curly-brace / lorem-ipsum rule),
    - drop docs with fewer than ``min_lines`` surviving lines (C4's
      ">= 3 sentences" rule), reassembling the rest in order.

    Scale design: completely SHUFFLE-FREE — every rule is row-local, so
    this is one vectorized ``map_batches`` pass (``pc.match_substring``
    per blacklist entry, word-count mask from the chunk offsets, bincount
    + list-offset reassembly). Safe at any corpus size; compose BEFORE
    the shuffling dedup stages so they see less data.
    """
    min_w = width if min_line_words is None else min_line_words

    def _any_substring(arr: pa.Array, needles: tuple[str, ...]):
        mask = None
        for s in needles:
            m = pc.match_substring(arr, s)
            mask = m if mask is None else pc.or_(mask, m)
        return mask

    def _gate(batch: pa.Table) -> pa.Table:
        if doc_blacklist:
            bad = _any_substring(
                pc.cast(batch[text_col], pa.string()), doc_blacklist
            )
            batch = batch.filter(pc.invert(bad))
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    text_col: pa.array([], type=pa.string()),
                }
            )
        flat, counts = _split_words(batch, text_col)
        lines, doc_idx, _cid, line_start = _chunk_lines(flat, counts, width)
        total = int(counts.sum())
        line_words = np.diff(np.append(line_start, total))
        keep = line_words >= min_w
        if line_blacklist:
            bad_line = _any_substring(lines, line_blacklist)
            keep &= np.invert(bad_line.to_numpy(zero_copy_only=False))
        kept_idx = np.nonzero(keep)[0]
        kept_doc = doc_idx[kept_idx]
        per_doc = np.bincount(kept_doc, minlength=len(counts)).astype(np.int64)
        doc_keep = per_doc >= min_lines
        # drop lines of dropped docs, then reassemble survivors in order
        kept_idx = kept_idx[doc_keep[kept_doc]]
        lines_kept = lines.take(pa.array(kept_idx, type=pa.int64()))
        if isinstance(lines_kept, pa.ChunkedArray):
            lines_kept = lines_kept.combine_chunks()
        offsets = np.concatenate(
            [[0], np.cumsum(per_doc[doc_keep])]
        ).astype(np.int32)
        doc_lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), lines_kept
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_keep]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                text_col: pc.binary_join(doc_lists, " "),
            }
        )

    return docs.map_batches(_gate, batch_format="pyarrow", batch_size=1024)


def add_repetition_stats(
    docs: "ray.data.Dataset",
    *,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Gopher-style within-doc repetition signals, one shuffle-free pass:
    (doc_id, n_words, n_distinct_words, top_word_count, n_chunks,
    n_dup_chunks). All int64 so DuckDB-side value hashes compare cleanly
    (no float-rounding policy needed)."""

    def _run_stats(group_of: np.ndarray, codes: np.ndarray, n_docs: int):
        """distinct-count and max-run-length per doc over (doc, code)
        pairs — one lexsort + reduceat, no per-doc Python. Every doc has
        >=1 row, so reduceat output aligns with docs 0..n-1."""
        if n_docs == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty
        order = np.lexsort((codes, group_of))
        d_s, c_s = group_of[order], codes[order]
        new_run = np.concatenate(
            [[True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        )
        run_starts = np.nonzero(new_run)[0]
        run_lens = np.diff(np.concatenate([run_starts, [len(codes)]]))
        run_doc = d_s[run_starts]
        n_distinct = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
        doc_run_starts = np.nonzero(
            np.concatenate([[True], run_doc[1:] != run_doc[:-1]])
        )[0]
        max_run = np.maximum.reduceat(run_lens, doc_run_starts).astype(np.int64)
        return n_distinct, max_run

    def _stats(batch: pa.Table) -> pa.Table:
        flat, counts = _split_words(batch, text_col)
        n_docs = len(counts)
        word_codes, _ = _dict_codes(flat)
        doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        n_distinct, top_count = _run_stats(doc_of_word, word_codes, n_docs)
        lines, doc_idx, _cid, _ls = _chunk_lines(flat, counts, width)
        line_codes, _ = _dict_codes(lines)
        n_chunks = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        n_distinct_chunks, _ = _run_stats(doc_idx, line_codes, n_docs)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(counts.astype(np.int64)),
                "n_distinct_words": pa.array(n_distinct),
                "top_word_count": pa.array(top_count),
                "n_chunks": pa.array(n_chunks),
                "n_dup_chunks": pa.array(n_chunks - n_distinct_chunks),
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow", batch_size=1024)


def gopher_filter(
    docs: "ray.data.Dataset",
    *,
    width: int = 8,
    min_words: int = 20,
    max_words: int = 100_000,
    top_word_max_x8: bool = True,
    dup_chunk_max_x10: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Gopher-style repetition quality gate (Rae et al. 2021 §A1.1),
    shuffle-free: keep docs with ``min_words <= n_words <= max_words``,
    top-word multiplicity ≤ 1/8 of words (``top_word_count*8 <=
    n_words``), and within-doc duplicate chunks ≤ 1/10 of chunks
    (``n_dup_chunks*10 <= n_chunks``). All-integer comparisons so the
    DuckDB oracle hash-compares with no float policy. Returns the signal
    columns alongside ``id_col`` for audit sinks."""

    stats = add_repetition_stats(
        docs, width=width, id_col=id_col, text_col=text_col
    )

    def _gate(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"]
        keep = pc.and_(
            pc.greater_equal(nw, pa.scalar(min_words, pa.int64())),
            pc.less_equal(nw, pa.scalar(max_words, pa.int64())),
        )
        if top_word_max_x8:
            keep = pc.and_(
                keep,
                pc.less_equal(pc.multiply(batch["top_word_count"], 8), nw),
            )
        if dup_chunk_max_x10:
            keep = pc.and_(
                keep,
                pc.less_equal(
                    pc.multiply(batch["n_dup_chunks"], 10), batch["n_chunks"]
                ),
            )
        return batch.filter(keep)

    return stats.map_batches(_gate, batch_format="pyarrow", batch_size=4096)
