"""Exact set-similarity self-join (AllPairs/PPJoin prefix filtering).

Finds every pair of rows whose char n-gram sets have Jaccard >= t,
EXACTLY — no LSH recall loss — using the classic prefix-filter bound
(Chaudhuri et al. SSJoin ICDE'06; Bayardo et al. WWW'07, public
knowledge): under any global total order of grams, two sets with
Jaccard(a, b) >= t must share at least one gram within their first
``|x| - ceil(t * |x|) + 1`` grams. Ordering grams by ascending document
frequency makes those prefixes the RAREST grams, so candidate buckets
stay small.

Scale plan: three passes over the (small-dim) input — gram partial-df,
blob build, prefix emission — then ONE gram-bucket shuffle for
candidate generation and the dedup machinery's two co-group shuffles
for exact verification (:func:`dedup._verify_pairs_cogroup` with the
``batch_result`` extension carrying exact intersection/union counts).
Driver state is the gram document-frequency map, bounded by the char
n-gram vocabulary (<= charset^n, ~10^5 for n=3 — document this bound
before reusing the kernel on word grams, whose vocabulary is corpus-
sized). Pairs never exist outside workers.

Gram identity is the 64-bit keyed siphash the shingle/ngram dedup
family already trusts (textkit._hash_strings): a miscount needs two
distinct grams of the SAME pair of names to collide, ~2^-64 per gram
pair — the same model the DuckDB-oracled ngram_dedup_docs runs under.

Honest bounds (exactness forbids the caps the LSH family uses):
- A clique of k IDENTICAL strings emits all k(k-1)/2 pairs — the
  OUTPUT is quadratic in clique size because the answer is. Corpora
  with massive exact-dup cliques (the part table: 64 distinct names
  over 20k rows) should run exact_dedup first; this was measured, and
  is why the registered query joins supplier names instead.
- Low thresholds weaken the filter (prefix length ~ (1-t)L + 1), and
  a tiny gram alphabet concentrates df — candidate volume is
  O(sum over prefix-grams of bucket^2). The 150k-row soak (62-char
  alphabet, t=0.7) is the reference point: ~11G raw pairs -> 31 s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import textkit
from .dedup import _JOIN_PARTITIONS, _part_of, _verify_pairs_cogroup

_EMPTY_EDIT_OUT = pa.table(
    {
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "edit_dist": pa.array([], pa.int64()),
    }
)


def _deletion_variants(s: str, k: int) -> set[str]:
    """All strings reachable from ``s`` by deleting at most ``k``
    characters (including ``s`` itself) — the SymSpell symmetric-delete
    signature set. |result| = sum_{j<=k} C(len(s), j)."""
    seen = {s}
    frontier = [s]
    for _ in range(k):
        nxt = []
        for t in frontier:
            for i in range(len(t)):
                v = t[:i] + t[i + 1 :]
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return seen


def _levenshtein_banded(a: str, b: str, k: int) -> int:
    """Exact Levenshtein distance if it is <= ``k``, else any value > k
    (band DP, O(len(a) * (2k+1)) cells). Cells outside the |i-j| <= k
    diagonal band have true distance > k, so clamping them to k+1 keeps
    every in-band value that matters (<= k) exact."""
    la, lb = len(a), len(b)
    if la > lb:  # iterate over the shorter string's rows
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return k + 1
    big = k + 1
    prev = list(range(lb + 1))
    for j in range(k + 1, lb + 1):
        prev[j] = big
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur = [big] * (lb + 1)
        if lo == 1:
            cur[0] = i if i <= k else big
        ca = a[i - 1]
        best = big
        for j in range(lo, hi + 1):
            v = prev[j - 1] + (0 if ca == b[j - 1] else 1)
            up = prev[j] + 1
            if up < v:
                v = up
            left = cur[j - 1] + 1
            if left < v:
                v = left
            if v > big:
                v = big
            cur[j] = v
            if v < best:
                best = v
        if best > k:
            return big
        prev = cur
    return prev[lb]


def edit_distance_selfjoin(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    text_col: str,
    k: int = 1,
    num_partitions: int = _JOIN_PARTITIONS,
) -> "ray.data.Dataset":
    """All (a < b) id pairs whose texts are within Levenshtein distance
    ``k``, EXACTLY, with the exact ``edit_dist`` column — the typo-join /
    entity-resolution complement of :func:`ngram_similarity_selfjoin`.

    Candidates come from the symmetric-delete signature (SymSpell, public
    knowledge): if ed(a, b) <= k under insert/delete/substitute, an
    optimal alignment has i + d + s <= k edits, and deleting the d
    deleted + s substituted positions from ``a`` (<= k deletions) and the
    i inserted + s substituted positions from ``b`` (<= k deletions)
    reaches the SAME string — so the two deletion-variant sets intersect.
    Hash collisions can only ADD candidates (grouping is by variant hash;
    a missed pair would need equal variant strings with unequal hashes),
    and the band-DP verify is exact, so the join has no recall loss.

    Scale plan: ZERO driver state (unlike the Jaccard join there is no
    global df pass) — one variant-hash bucket shuffle for candidate
    generation, then the dedup machinery's two co-group shuffles carry
    the raw UTF-8 texts to a banded-DP verify
    (:func:`dedup._verify_pairs_cogroup`, ``batch_result``).

    Honest bounds: variants per row = sum_{j<=k} C(L, j) = O(L^k) — right
    for short keys (names, titles, codes); for long texts partition the
    string first (PassJoin, Li et al. VLDB'11) before reusing this.
    Cliques of equal strings emit all pairs because the answer is
    quadratic, exactly like the Jaccard join (docstring above)."""
    if k < 0:
        raise ValueError("k must be >= 0")

    def _blob_fn(t: pa.Table) -> pa.Table:
        texts = [s or "" for s in t[text_col].to_pylist()]
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array([s.encode() for s in texts], type=pa.binary()),
            }
        )

    blobs = ds.map_batches(_blob_fn, batch_format="pyarrow").materialize()
    if blobs.count() == 0:
        return ray.data.from_arrow(_EMPTY_EDIT_OUT)

    def _variant_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        texts = [b.decode() for b in t["sh"].to_pylist()]
        per_row = [sorted(_deletion_variants(s, k)) for s in texts]
        flat: list[str] = [v for vs in per_row for v in vs]
        gh = textkit._hash_strings(flat)
        id_out = np.repeat(ids, [len(vs) for vs in per_row])
        len_out = np.repeat(
            np.asarray([len(s) for s in texts], dtype=np.int64),
            [len(vs) for vs in per_row],
        )
        return pa.table(
            {
                "g": pa.array(gh.view(np.int64)),
                "doc_id": pa.array(id_out),
                "L": pa.array(len_out),
                "_p": pa.array(_part_of(gh, num_partitions)),
            }
        )

    variants = blobs.map_batches(_variant_rows, batch_format="pyarrow")

    _EMPTY_CAND = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )

    def _cand_pairs(grp: pa.Table) -> pa.Table:
        g = grp["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = grp["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Ls = grp["L"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, g))
        g, ids, Ls = g[order], ids[order], Ls[order]
        bounds = np.nonzero(np.concatenate([[True], g[1:] != g[:-1]]))[0]
        bounds = np.append(bounds, len(g))
        a_out, b_out = [], []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if hi - lo < 2:
                continue
            bids, bls = ids[lo:hi], Ls[lo:hi]
            ii, jj = np.triu_indices(hi - lo, k=1)
            # length band: ed <= k forces | |a| - |b| | <= k
            ok = (np.abs(bls[ii] - bls[jj]) <= k) & (bids[ii] != bids[jj])
            if not ok.any():
                continue
            a_out.append(np.minimum(bids[ii][ok], bids[jj][ok]))
            b_out.append(np.maximum(bids[ii][ok], bids[jj][ok]))
        if not a_out:
            return _EMPTY_CAND
        stacked = np.unique(
            np.stack([np.concatenate(a_out), np.concatenate(b_out)], axis=1),
            axis=0,
        )
        return pa.table(
            {
                "a": pa.array(stacked[:, 0], type=pa.int64()),
                "b": pa.array(stacked[:, 1], type=pa.int64()),
            }
        )

    cands = variants.groupby("_p").map_groups(_cand_pairs, batch_format="pyarrow")

    def _edit_dists(blobs_a, blobs_b):
        m = len(blobs_a)
        ok = np.empty(m, dtype=bool)
        dist = np.empty(m, dtype=np.int64)
        for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
            d = _levenshtein_banded(ba.decode(), bb.decode(), k)
            dist[i] = d
            ok[i] = d <= k
        return ok, {"edit_dist": dist}

    return _verify_pairs_cogroup(
        cands,
        blobs,
        num_partitions=num_partitions,
        batch_result=_edit_dists,
        extra_cols={"edit_dist": pa.int64()},
    )


def _char_grams_raw_batch(texts: list[str | None], n: int) -> list[np.ndarray]:
    """Per-row sorted unique uint64 hashes of the RAW char n-grams
    (``text[i:i+n]`` for every position; no normalization, no short-text
    fallback — rows shorter than n get an empty set), mirroring the SQL
    ``substr(text, i, n) for i in 1..len-n+1`` definition exactly."""
    grams_per_row: list[list[str]] = []
    for t in texts:
        t = t or ""
        if len(t) < n:
            grams_per_row.append([])
        else:
            grams_per_row.append([t[i : i + n] for i in range(len(t) - n + 1)])
    gh = textkit._hash_strings([g for grams in grams_per_row for g in grams])
    out: list[np.ndarray] = []
    pos = 0
    for grams in grams_per_row:
        m = len(grams)
        out.append(np.unique(gh[pos : pos + m]))
        pos += m
    return out


def ngram_similarity_selfjoin(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    num_partitions: int = _JOIN_PARTITIONS,
) -> "ray.data.Dataset":
    """All (a < b) id pairs whose char n-gram Jaccard >= ``threshold``,
    with exact ``n_inter`` / ``n_union`` columns. Rows with no grams
    (text shorter than n) never pair."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    # exact rational threshold: every comparison below is integer math.
    # Float t breaks ties catastrophically here — 0.6 * 5 is
    # 3.0000000000000004 in IEEE, which flips BOTH the prefix length
    # (ceil too big -> prefix too short -> MISSED pairs) and the final
    # Jaccard test (k >= t*u false on exactly-threshold pairs the SQL
    # oracle's integer cross-multiplication keeps).
    from fractions import Fraction

    _fr = Fraction(str(threshold))
    tn, td = _fr.numerator, _fr.denominator

    def _blob_fn(t: pa.Table) -> pa.Table:
        hashes = _char_grams_raw_batch(t[text_col].to_pylist(), n)
        keep = [i for i, h in enumerate(hashes) if len(h)]
        ids = np.asarray(
            t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64
        )[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array(
                    [hashes[i].tobytes() for i in keep], type=pa.binary()
                ),
            }
        )

    blobs = ds.map_batches(_blob_fn, batch_format="pyarrow").materialize()

    # global gram document frequency: batch-local distinct already holds
    # (blobs are per-row unique), so partials are (gram, 1) rows
    def _df_partials(t: pa.Table) -> pa.Table:
        gs = [np.frombuffer(b, dtype=np.uint64) for b in t["sh"].to_pylist()]
        if not gs:
            return pa.table(
                {"g": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        allg = np.concatenate(gs)
        uniq, cnt = np.unique(allg, return_counts=True)
        return pa.table(
            {
                "g": pa.array(uniq.view(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    df_tbl = (
        blobs.map_batches(_df_partials, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("c", alias_name="df"))
        .to_pandas()
    )
    if len(df_tbl) == 0 or "g" not in df_tbl.columns:
        # no row has any gram (every text shorter than n): no pairs. The
        # empty aggregate is also schema-less, so bail before indexing.
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n_inter": pa.array([], pa.int64()),
                    "n_union": pa.array([], pa.int64()),
                }
            )
        )
    # driver state bound: char n-gram vocabulary (docstring contract)
    gram_order = np.asarray(df_tbl["g"].to_numpy(), dtype=np.int64).view(np.uint64)
    gram_df = np.asarray(df_tbl["df"].to_numpy(), dtype=np.int64)
    sort_g = np.argsort(gram_order, kind="stable")
    gram_order, gram_df = gram_order[sort_g], gram_df[sort_g]
    import ray as _ray

    df_ref = _ray.put((gram_order, gram_df))

    def _prefix_rows(t: pa.Table) -> pa.Table:
        go, gd = _ray.get(df_ref)
        gs_out, id_out, len_out = [], [], []
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        for rid, blob in zip(ids, t["sh"].to_pylist()):
            g = np.frombuffer(blob, dtype=np.uint64)
            L = len(g)
            p = L - (-(-tn * L) // td) + 1  # exact ceil(t*L)
            dfs = gd[np.searchsorted(go, g)]
            order = np.lexsort((g, dfs))
            pref = g[order[:p]]
            gs_out.append(pref)
            id_out.append(np.full(len(pref), rid, dtype=np.int64))
            len_out.append(np.full(len(pref), L, dtype=np.int64))
        if not gs_out:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "L": pa.array([], pa.int64()),
                    "_p": pa.array([], pa.int64()),
                }
            )
        g_all = np.concatenate(gs_out)
        return pa.table(
            {
                "g": pa.array(g_all.view(np.int64)),
                "doc_id": pa.array(np.concatenate(id_out)),
                "L": pa.array(np.concatenate(len_out)),
                "_p": pa.array(_part_of(g_all, num_partitions)),
            }
        )

    prefixes = blobs.map_batches(_prefix_rows, batch_format="pyarrow")

    _EMPTY_CAND = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )

    def _cand_pairs(grp: pa.Table) -> pa.Table:
        g = grp["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = grp["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Ls = grp["L"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, g))
        g, ids, Ls = g[order], ids[order], Ls[order]
        bounds = np.nonzero(np.concatenate([[True], g[1:] != g[:-1]]))[0]
        bounds = np.append(bounds, len(g))
        a_out, b_out = [], []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if hi - lo < 2:
                continue
            bids, bls = ids[lo:hi], Ls[lo:hi]
            ii, jj = np.triu_indices(hi - lo, k=1)
            # length filter: Jaccard >= t forces t*|x| <= |y| <= |x|/t
            la, lb = bls[ii], bls[jj]
            okl = (np.minimum(la, lb) * td >= tn * np.maximum(la, lb)) & (
                bids[ii] != bids[jj]
            )
            if not okl.any():
                continue
            a_out.append(np.minimum(bids[ii][okl], bids[jj][okl]))
            b_out.append(np.maximum(bids[ii][okl], bids[jj][okl]))
        if not a_out:
            return _EMPTY_CAND
        stacked = np.unique(
            np.stack([np.concatenate(a_out), np.concatenate(b_out)], axis=1),
            axis=0,
        )
        return pa.table(
            {
                "a": pa.array(stacked[:, 0], type=pa.int64()),
                "b": pa.array(stacked[:, 1], type=pa.int64()),
            }
        )

    cands = prefixes.groupby("_p").map_groups(_cand_pairs, batch_format="pyarrow")

    def _jaccard_counts(blobs_a, blobs_b):
        m = len(blobs_a)
        ok = np.empty(m, dtype=bool)
        inter = np.empty(m, dtype=np.int64)
        union = np.empty(m, dtype=np.int64)
        for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
            a = np.frombuffer(ba, dtype=np.uint64)
            b = np.frombuffer(bb, dtype=np.uint64)
            k = len(np.intersect1d(a, b, assume_unique=True))
            u = len(a) + len(b) - k
            inter[i], union[i] = k, u
            ok[i] = k * td >= tn * u  # integer-exact threshold test
        return ok, {"n_inter": inter, "n_union": union}

    return _verify_pairs_cogroup(
        cands,
        blobs,
        num_partitions=num_partitions,
        batch_result=_jaccard_counts,
        extra_cols={"n_inter": pa.int64(), "n_union": pa.int64()},
    )
