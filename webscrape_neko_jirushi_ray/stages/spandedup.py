"""ExactSubstr-style duplicate-span removal (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

Semantics (pinned by the SQL oracle and the Python-oracle tests): a
window = N consecutive words inside one document. A window CONTENT is
duplicated if it occurs >= 2 times corpus-wide (within or across docs).
Every word covered by at least one duplicated window is removed — ALL
occurrences, first included (the conservative variant: duplicated
boilerplate contributes nothing to training, so no occurrence is
privileged). Documents are reassembled from surviving words in order;
documents losing every word drop out.

The reference engine removes whole duplicate FILES by md5
(aggressive_cleaning.py:170-200); this is the span-granular analog the
paper shows matters for web text, sharing the tokenize/explode/partition
machinery of stages/linededup.

Scale design (no suffix array — fixed-N windows):
- window hashes are vectorized: vocabulary hashed once per batch
  (dictionary_encode C kernel), then TWO independent order-sensitive
  polynomials over each sliding window (N vectorized adds each, no
  per-window Python). Grouping compares the (h1, h2) pair == effective
  128-bit key, so hash collisions need a simultaneous 2^-128 event to
  produce a false span removal (the paper's suffix array is exact; at
  10^10 windows a single 64-bit key would see real birthday collisions).
- ONE shuffle keyed by h1-hash partition finds multi-occurrence windows
  (lexsort + run-length >= 2 over the partition — not a per-group call).
- covered window STARTS (only docs containing dups — a small fraction of
  the corpus) aggregate into one int64 blob per doc, inner-join back to
  those docs; untouched docs bypass via the anti-join leg and are never
  re-tokenized. Coverage expansion is a vectorized +1/-1 delta cumsum.
Nothing materializes O(corpus) driver state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textkit import _hash_strings
from .joins import hash_join
from .linededup import _PMIX, _split_words

_SPAN_PARTITIONS = 64


def _window_mults(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, np.iinfo(np.int64).max, size=n, dtype=np.int64)
        .astype(np.uint64)
        | np.uint64(1)
    )


def _window_rows_fn(
    n: int, id_col: str, text_col: str, num_partitions: int = _SPAN_PARTITIONS
):
    """docs batch → (h1, h2, doc_id, pos, _p) for every valid N-word
    window (pos = 0-based start within the doc)."""
    p1 = _window_mults(n, 0x5BA11)
    p2 = _window_mults(n, 0xD0C5)

    def _fn(batch: pa.Table) -> pa.Table:
        flat, counts = _split_words(batch, text_col)
        total = int(counts.sum())
        if total < n:
            return pa.table(
                {
                    "h1": pa.array([], type=pa.uint64()),
                    "h2": pa.array([], type=pa.uint64()),
                    id_col: pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                    "_p": pa.array([], type=pa.int64()),
                }
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        wh = _hash_strings(enc.dictionary.to_pylist())[codes]
        m = total - n + 1  # candidate window starts in flat space
        h1 = np.zeros(m, dtype=np.uint64)
        h2 = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            w = wh[j : j + m]
            h1 += w * p1[j]
            h2 += w * p2[j]
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        starts = np.arange(m, dtype=np.int64)
        valid = doc_of[starts] == doc_of[starts + n - 1]
        sv = starts[valid]
        doc_idx = doc_of[sv]
        doc_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        part = ((h1[sv] * _PMIX) >> np.uint64(33)) % np.uint64(num_partitions)
        return pa.table(
            {
                "h1": pa.array(h1[sv]),
                "h2": pa.array(h2[sv]),
                id_col: pa.array(ids, type=pa.int64()),
                "pos": pa.array(sv - doc_starts[doc_idx], type=pa.int64()),
                "_p": pa.array(part.astype(np.int64)),
            }
        )

    return _fn


def _dup_starts_fn(id_col: str):
    """partition of window rows → (doc_id, pos) of every occurrence of a
    window content seen >= 2 times (within this h1-partition == globally,
    since equal windows share h1)."""

    def _fn(g: pa.Table) -> pa.Table:
        h1 = g["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = g["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        new_run = np.concatenate(
            [[True], (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        )
        run_id = np.cumsum(new_run) - 1
        run_sizes = np.bincount(run_id)
        dup_sorted = run_sizes[run_id] >= 2
        take = order[dup_sorted]
        return pa.table(
            {
                id_col: g[id_col].take(pa.array(take, type=pa.int64())),
                "pos": g["pos"].take(pa.array(take, type=pa.int64())),
            }
        )

    return _fn


def dup_span_removal(
    docs: "ray.data.Dataset",
    *,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = _SPAN_PARTITIONS,
) -> "ray.data.Dataset":
    """Remove every word covered by a corpus-duplicated N-word window;
    returns (id_col, text_col) of reassembled survivors.

    ``num_partitions`` sizes the dup-scan shuffle (each partition is one
    map_groups task holding ~windows/num_partitions rows) and the two
    doc joins; size it to ≈ corpus_bytes / 256 MB at scale (default 64
    fits bench corpora)."""

    window_rows = docs.map_batches(
        _window_rows_fn(n, id_col, text_col, num_partitions),
        batch_format="pyarrow",
        batch_size=1024,
    )
    dup_starts = window_rows.groupby("_p").map_groups(
        _dup_starts_fn(id_col), batch_format="pyarrow"
    )

    # one int64-blob of sorted window starts per affected doc
    def _blob(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        ids_s, pos_s = ids[order], pos[order]
        bounds = np.nonzero(np.concatenate([[True], ids_s[1:] != ids_s[:-1]]))[0]
        ends = np.append(bounds[1:], len(ids_s))
        return pa.table(
            {
                id_col: pa.array(ids_s[bounds], type=pa.int64()),
                "starts": pa.array(
                    [
                        pos_s[lo:hi].astype(np.int64).tobytes()
                        for lo, hi in zip(bounds, ends)
                    ],
                    type=pa.binary(),
                ),
            }
        )

    start_blobs = (
        dup_starts.map_batches(
            lambda t: t.append_column(
                "_dp",
                pa.array(
                    (
                        (
                            t[id_col]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.uint64)
                            * _PMIX
                        )
                        >> np.uint64(33)
                    ).astype(np.int64)
                    % num_partitions
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("_dp")
        .map_groups(
            lambda g: _blob(g.drop_columns(["_dp"])), batch_format="pyarrow"
        )
    ).materialize()  # bounded: one row per AFFECTED doc

    if start_blobs.count() == 0:  # no duplicated window anywhere
        return docs.select_columns([id_col, text_col])

    untouched = hash_join(
        docs, start_blobs, key=id_col, how="left_anti",
        num_partitions=num_partitions,
    )
    affected = hash_join(
        docs, start_blobs, key=id_col, how="inner",
        num_partitions=num_partitions,
    )

    def _cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    text_col: pa.array([], type=pa.string()),
                }
            )
        flat, counts = _split_words(batch, text_col)
        total = int(counts.sum())
        doc_starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        delta = np.zeros(total + 1, dtype=np.int64)
        blobs = batch["starts"].to_pylist()
        blob_lens = np.fromiter(
            (len(b) // 8 for b in blobs), dtype=np.int64, count=len(blobs)
        )
        all_starts = np.frombuffer(b"".join(blobs), dtype=np.int64)
        doc_of_start = np.repeat(
            np.arange(len(blobs), dtype=np.int64), blob_lens
        )
        g_starts = all_starts + doc_starts[doc_of_start]
        g_ends = np.minimum(g_starts + n, doc_starts[doc_of_start + 1])
        np.add.at(delta, g_starts, 1)
        np.add.at(delta, g_ends, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        kept_doc = doc_of[keep]
        kept_words = flat.filter(pa.array(keep))
        kept_counts = np.bincount(kept_doc, minlength=len(counts))
        nonempty = kept_counts > 0
        offsets = np.concatenate(
            [[0], np.cumsum(kept_counts[nonempty])]
        ).astype(np.int32)
        texts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_words),
            " ",
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False)[nonempty]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                text_col: texts,
            }
        )

    rebuilt = affected.map_batches(
        _cut, batch_format="pyarrow", batch_size=1024
    )
    return untouched.select_columns([id_col, text_col]).union(rebuilt)


def _batch_window_hashes(
    batch: pa.Table, n: int, text_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1 per valid window, h2 per valid window, doc index per window)
    — the same double polynomial as :func:`dup_span_removal`."""
    p1 = _window_mults(n, 0x5BA11)
    p2 = _window_mults(n, 0xD0C5)
    flat, counts = _split_words(batch, text_col)
    total = int(counts.sum())
    if total < n:
        e = np.empty(0, dtype=np.uint64)
        return e, e, np.empty(0, dtype=np.int64)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    wh = _hash_strings(enc.dictionary.to_pylist())[codes]
    m = total - n + 1
    h1 = np.zeros(m, dtype=np.uint64)
    h2 = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        w = wh[j : j + m]
        h1 += w * p1[j]
        h2 += w * p2[j]
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.arange(m, dtype=np.int64)
    valid = doc_of[starts] == doc_of[starts + n - 1]
    sv = starts[valid]
    return h1[sv], h2[sv], doc_of[sv]


def decontaminate(
    docs: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Benchmark decontamination (the GPT-3/PaLM training-data hygiene
    step): drop every training doc sharing ANY N-word window with the
    benchmark set. The benchmark is SMALL by definition (eval suites are
    kilobytes against a 100-TB corpus), so its window-hash set is built
    once, shipped once via ``ray.put``, and probed per batch with one
    vectorized ``np.isin`` — the broadcast-small-side pattern, zero
    shuffle over the corpus. Hash space: the same (h1, h2) 128-bit
    double polynomial as :func:`dup_span_removal` (here combined into
    one 64-bit mixed key per window; a benchmark of 10^6 windows makes
    a false drop a ~10^-13/window event — acceptable for a filter that
    errs toward dropping)."""

    def _mix(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        x = (h1 * _PMIX) ^ h2
        return x ^ (x >> np.uint64(31))

    bench_keys: list[np.ndarray] = []
    for b in benchmark.map_batches(
        lambda t, _n=n, _tc=text_col: pa.table(
            {"k": pa.array(_mix(*_batch_window_hashes(t, _n, _tc)[:2]))}
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        bench_keys.append(b["k"].to_numpy(zero_copy_only=False))
    keys = np.unique(np.concatenate(bench_keys)) if bench_keys else np.empty(
        0, dtype=np.uint64
    )
    keys_ref = ray.put(keys)

    def _clean(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        if len(ks) == 0:
            return batch
        h1, h2, doc_of = _batch_window_hashes(batch, n, text_col)
        hit_docs = np.unique(doc_of[np.isin(_mix(h1, h2), ks)])
        keep = np.ones(batch.num_rows, dtype=bool)
        keep[hit_docs] = False
        return batch.filter(pa.array(keep))

    return docs.map_batches(_clean, batch_format="pyarrow", batch_size=1024)


def _shingle_sets_ws_batch(col, k: int):
    """Vectorized per-row DISTINCT word-k-gram shingle hashes over an
    Arrow string column (RAW ``\\s+`` tokens — no normalization, the SQL
    ``string_split(trim(regexp_replace(text,'\\s+',' ','g')),' ')``
    convention). Returns ``(own_u, h_u, nrows)``: parallel arrays of
    (row index, shingle hash) over the batch's distinct (row, shingle)
    pairs — rows with fewer than k tokens contribute nothing."""
    from ..functions.textkit import flat_tokens_ws_arrow

    flat, ptr = flat_tokens_ws_arrow(col)
    nrows = len(ptr) - 1
    m = len(flat)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64), nrows)
    if m < k:
        return empty
    owner = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(ptr))
    valid = owner[: m - k + 1] == owner[k - 1 :]
    if not valid.any():
        return empty
    parts = [flat.slice(j, m - k + 1) for j in range(k)]
    sh = pc.binary_join_element_wise(*parts, " ")
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    sh = sh.filter(pa.array(valid))
    own = owner[: m - k + 1][valid]
    enc = pc.dictionary_encode(sh)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_numpy(zero_copy_only=False)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h = _hash_strings(list(vocab))[idx]
    # distinct (row, shingle) pairs via one lexsort + boundary mask
    order = np.lexsort((h, own))
    own_s, h_s = own[order], h[order]
    first = np.concatenate(
        [[True], (own_s[1:] != own_s[:-1]) | (h_s[1:] != h_s[:-1])]
    )
    return own_s[first], h_s[first], nrows


def fuzzy_decontaminate(
    docs: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    *,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """FUZZY benchmark decontamination — the near-duplicate complement
    of :func:`decontaminate`: drop every training doc whose word-k-gram
    shingle-set Jaccard with ANY benchmark doc reaches ``threshold``
    (paraphrased / lightly-edited leakage that exact window matching
    misses). Docs with fewer than k tokens are dropped (no shingle set
    to clear them — the conservative call, matching the SQL oracle's
    ``len(toks) >= k`` corpus definition).

    Scale plan: the benchmark is SMALL by contract (eval suites vs a
    100-TB corpus), so its shingle INVERTED INDEX (one sorted hash
    array + parallel bench-doc owner ids + per-bench set sizes) is
    built once and shipped once via ``ray.put``; each corpus batch then
    runs ONE searchsorted of its distinct (row, shingle) pairs against
    the index, expands only the matches, and accumulates per
    (doc, bench) intersection counts with a bincount-style unique —
    zero corpus shuffle, work linear in matches, not in
    |corpus| x |benchmark|. Threshold math is exact rational
    cross-multiplication (the simjoin float-tie lesson)."""
    from fractions import Fraction

    _fr = Fraction(str(threshold))
    tn, td = _fr.numerator, _fr.denominator

    bench_hash: list[np.ndarray] = []
    bench_owner: list[np.ndarray] = []
    lens_b: list[int] = []
    n_bench = 0
    for b in benchmark.map_batches(
        lambda t: t.select([text_col]), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        own_u, h_u, nrows = _shingle_sets_ws_batch(b[text_col], k)
        counts = np.bincount(own_u, minlength=nrows)
        for r in range(nrows):
            lens_b.append(int(counts[r]))
        bench_hash.append(h_u)
        bench_owner.append(own_u + n_bench)
        n_bench += nrows
    if n_bench and bench_hash:
        H = np.concatenate(bench_hash)
        O = np.concatenate(bench_owner)
        s = np.argsort(H, kind="stable")
        H, O = H[s], O[s]
    else:
        H = np.empty(0, dtype=np.uint64)
        O = np.empty(0, dtype=np.int64)
    LB = np.asarray(lens_b, dtype=np.int64)
    idx_ref = ray.put((H, O, LB))

    def _clean(batch: pa.Table) -> pa.Table:
        H, O, LB = ray.get(idx_ref)
        own_u, h_u, nrows = _shingle_sets_ws_batch(batch[text_col], k)
        doc_len = np.bincount(own_u, minlength=nrows)
        hit = np.zeros(nrows, dtype=bool)
        if len(H) and len(h_u):
            lo = np.searchsorted(H, h_u, side="left")
            hi = np.searchsorted(H, h_u, side="right")
            cnt = hi - lo
            tot = int(cnt.sum())
            if tot:
                doc_rep = np.repeat(own_u, cnt)
                base = np.repeat(lo, cnt)
                off = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt
                )
                bench_rep = O[base + off]
                pair = doc_rep * np.int64(len(LB)) + bench_rep
                upair, inter = np.unique(pair, return_counts=True)
                d_i = (upair // len(LB)).astype(np.int64)
                b_i = (upair % len(LB)).astype(np.int64)
                union = doc_len[d_i] + LB[b_i] - inter
                bad = inter * td >= tn * union
                hit[np.unique(d_i[bad])] = True
        keep = (~hit) & (doc_len > 0)
        return batch.filter(pa.array(keep))

    return docs.map_batches(_clean, batch_format="pyarrow")
