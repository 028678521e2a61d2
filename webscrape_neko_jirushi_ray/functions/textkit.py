"""Text-analysis kernels: tokenization, quality stats, language ID,
fingerprints, shingles, MinHash, SimHash.

Row-wise pure functions + vectorized batch helpers consumed by
``stages/textstats.py`` and ``stages/dedup.py``. Tokenization is pinned to
``\\s+`` splitting of the trimmed text so the DuckDB oracle can reproduce it
exactly (``regexp_split_to_array(trim(text), '\\s+')``).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np

_WS_SPLIT = re.compile(r"\s+")
_WS_ALL = re.compile(r"\s+")
_WORD_RE = re.compile(r"[A-Za-z']+")
# BPE-ish token regex (GPT-2-style pretokenizer shape, public knowledge):
# contractions | words | numbers | other non-space | space runs
_BPEISH_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)

# Hiragana/Katakana/CJK ranges for the ja heuristic
_JA_RE = re.compile(r"[぀-ヿ]")
_CJK_RE = re.compile(r"[一-鿿]")
_HANGUL_RE = re.compile(r"[가-힯]")
_CYR_RE = re.compile(r"[Ѐ-ӿ]")


def tokens_ws(text: str) -> list[str]:
    """Whitespace tokens of the trimmed text; [] for blank text. The
    SQL-parity tokenizer."""
    t = text.strip()
    return _WS_SPLIT.split(t) if t else []


def token_count_ws(text: str) -> int:
    return len(tokens_ws(text))


# Unicode whitespace beyond ASCII (the chars Python's \s matches above
# 0x7f). Batches containing ANY of these take the exact row-wise path:
# pyarrow 16.1's utf8_split_whitespace can MIS-SPLIT a batch containing
# multi-byte whitespace — identical rows in one call come back with
# different tokenizations (allocation-dependent; found by the
# test_textkit_vec hypothesis sweep, e.g. a trailing '\\x1d\\x1d' run
# surviving as a token only in the batch's last row).
_EXOTIC_WS_RE2 = (
    "[\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"
)


def flat_tokens_ws_arrow(col):
    """Vectorized :func:`tokens_ws` over an Arrow string column — NO
    Python row loop on the hot path. Returns ``(flat, ptr)``: ``flat``
    is the concatenation of every row's whitespace tokens (Arrow string
    array) and ``ptr`` the int64 row-pointer array (len = nrows+1; row
    i's tokens are ``flat[ptr[i]:ptr[i+1]]``). Null/blank rows
    contribute zero tokens, matching ``tokens_ws(txt or '')`` exactly
    (Arrow's whitespace split emits empty strings at the trim edges and
    inside runs; they are filtered here, leaving precisely the maximal
    non-whitespace runs). Batches containing non-ASCII whitespace fall
    back to row-wise :func:`tokens_ws` (see ``_EXOTIC_WS_RE2`` — a
    pyarrow 16.1 splitter bug makes the vectorized kernel unreliable
    there); ASCII-whitespace text, i.e. every real corpus this engine
    benches, stays fully vectorized."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.fill_null(pc.cast(col, pa.string()), "")
    exotic = pc.any(pc.match_substring_regex(s, _EXOTIC_WS_RE2)).as_py()
    if exotic:
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        rows = [tokens_ws(x) for x in s.to_pylist()]
        counts = np.fromiter((len(r) for r in rows), dtype=np.int64, count=len(rows))
        ptr = np.concatenate(([0], np.cumsum(counts, dtype=np.int64)))
        flat = pa.array(
            [t for r in rows for t in r], pa.string()
        )
        return flat, ptr
    words = pc.utf8_split_whitespace(s)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    nrows = len(words)
    # list_flatten + repeat(list_value_length), NOT manual
    # .values.slice(offsets) arithmetic: list_flatten is the documented
    # offset-honoring flatten, and the repeat gives each flat token its
    # row id without searchsorted edge cases
    lens = np.asarray(
        pc.list_value_length(words).to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    m = len(flat)
    if m == 0:
        return flat, np.zeros(nrows + 1, dtype=np.int64)
    keep = np.asarray(pc.not_equal(flat, "").to_numpy(zero_copy_only=False))
    row_of = np.repeat(np.arange(nrows, dtype=np.int64), lens)
    counts = np.bincount(row_of[keep], minlength=nrows)
    flat2 = flat.filter(pa.array(keep))
    ptr = np.concatenate(([0], np.cumsum(counts, dtype=np.int64)))
    return flat2, ptr


def hash2_strings(vocab: np.ndarray, salt: str = "") -> tuple[np.ndarray, np.ndarray]:
    """TWO independent siphash-64 values (int64 arrays) of each string in
    ``vocab`` (object dtype) — a 128-bit string identity for string-free
    shuffles. A collision needs two distinct strings to collide on BOTH
    keyed hashes (~2^-128 per pair) — the same identity-trust model as
    the md5 fingerprints the exact-dedup family keys on. ``salt`` (<= 4
    chars) decorates the pandas 16-byte hash keys so different operator
    families occupy independent hash spaces."""
    import pandas as _pd2

    if len(vocab) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    k1 = (f"nkj.h2a.{salt}" + "0" * 16)[:16]
    k2 = (f"nkj.h2b.{salt}" + "1" * 16)[:16]
    h1 = _pd2.util.hash_array(vocab, hash_key=k1, categorize=False).view(np.int64)
    h2 = _pd2.util.hash_array(vocab, hash_key=k2, categorize=False).view(np.int64)
    return h1, h2


def tokens_bpeish(text: str) -> list[str]:
    """BPE-style pretokens (regex only, no merges) — the 'token counting'
    slot of a training-data pipeline; NOT SQL-oracled."""
    return [t for t in _BPEISH_RE.findall(text) if not t.isspace()]


def quality_stats(text: str) -> dict:
    """Per-doc quality features (length / punctuation / stopword ratios) —
    the heuristic quality-scoring slot. All fields reproducible in ANSI SQL
    (see pipelines/queries) except stopword_ratio which uses DuckDB list
    lambdas in the oracle."""
    toks = tokens_ws(text)
    n_words = len(toks)
    n_chars = len(text)
    nospace = _WS_ALL.sub("", text)
    n_alpha = sum(ch.isalpha() for ch in text)
    n_upper = sum(ch.isupper() for ch in text)
    n_punct = sum(ch in ".,;:!?\"'()[]{}" for ch in text)
    n_stop = sum(t.lower() in STOPWORDS for t in toks)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_chars_nospace": len(nospace),
        "mean_word_len": (len(nospace) / n_words) if n_words else 0.0,
        "alpha_ratio": (n_alpha / n_chars) if n_chars else 0.0,
        "upper_ratio": (n_upper / n_chars) if n_chars else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
    }


def quality_score_from_stats(s: dict) -> float:
    """Score from an already-computed ``quality_stats`` dict — the batch
    stage computes stats once per doc and derives the score from them
    (scoring from raw text would re-scan every character)."""
    score = 0.0
    if 20 <= s["n_words"] <= 100_000:
        score += 0.25
    if 2.0 <= s["mean_word_len"] <= 12.0:
        score += 0.25
    if s["punct_ratio"] <= 0.2:
        score += 0.25
    if 0.05 <= s["stopword_ratio"] <= 0.7:
        score += 0.25
    return score


def quality_score(text: str) -> float:
    """Scalar quality score in [0,1]: the reference's 4-indicator
    keep/drop shape (cleanup_dataset.py:75-129) transplanted to text —
    each indicator contributes 0.25."""
    return quality_score_from_stats(quality_stats(text))


def detect_lang(text: str) -> str:
    """Character-class n-gram heuristic language ID: ja (kana), zh (CJK w/o
    kana), ko (hangul), ru (cyrillic), en (ascii + stopword hits), else
    'unknown'. Deterministic; meant for routing, not linguistics."""
    if not text:
        return "unknown"
    sample = text[:2000]
    n = len(sample)
    if _JA_RE.search(sample):
        return "ja"
    if _HANGUL_RE.search(sample):
        return "ko"
    cjk = len(_CJK_RE.findall(sample))
    if cjk > 0.05 * n:
        return "zh"
    if len(_CYR_RE.findall(sample)) > 0.3 * n:
        return "ru"
    toks = [t.lower() for t in _WORD_RE.findall(sample)]
    if toks and sum(t in STOPWORDS for t in toks) / len(toks) > 0.03:
        return "en"
    if sum(ch.isascii() for ch in sample) > 0.9 * n:
        return "en"
    return "unknown"


def normalize_for_fingerprint(text: str) -> str:
    """lowercase + collapse whitespace — the canonical form both the
    Python fingerprint and the SQL oracle hash."""
    return _WS_ALL.sub(" ", text.lower()).strip()


def fingerprint_md5(text: str) -> str:
    """Document fingerprint: md5 hex of the normalized text (SQL parity:
    md5(lower(regexp_replace(text,'\\s+',' ','g')) trimmed)."""
    return hashlib.md5(normalize_for_fingerprint(text).encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 8, mod: int = 1 << 31) -> int:
    """Rabin-Karp-style rolling-hash document fingerprint: min rolling hash
    over byte windows of the normalized text (a winnowing-lite signature)."""
    data = normalize_for_fingerprint(text).encode("utf-8")
    if len(data) < window:
        return int.from_bytes(hashlib.md5(data).digest()[:4], "little") % mod
    B = 257
    Bpow = pow(B, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * B + b) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * Bpow) * B + data[i]) % mod
        if h < best:
            best = h
    return best


# --- shingling / MinHash / SimHash ---------------------------------------


def shingles(text: str, k: int = 5) -> set[bytes]:
    """k-word shingles (md5'd to 8 bytes) of the whitespace tokens."""
    toks = tokens_ws(normalize_for_fingerprint(text))
    if len(toks) < k:
        return {hashlib.md5(" ".join(toks).encode()).digest()[:8]} if toks else set()
    out = set()
    for i in range(len(toks) - k + 1):
        out.add(hashlib.md5(" ".join(toks[i : i + k]).encode()).digest()[:8])
    return out


def char_ngrams(text: str, n: int = 3) -> set[str]:
    t = normalize_for_fingerprint(text)
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


_MINHASH_SEEDS = None


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for num_perm universal hashes."""
    global _MINHASH_SEEDS
    if _MINHASH_SEEDS is None or len(_MINHASH_SEEDS[0]) < num_perm:
        rng = np.random.default_rng(0xDECAF)
        a = rng.integers(1, (1 << 61) - 1, size=max(num_perm, 128), dtype=np.uint64)
        b = rng.integers(0, (1 << 61) - 1, size=max(num_perm, 128), dtype=np.uint64)
        _MINHASH_SEEDS = (a, b)
    return _MINHASH_SEEDS[0][:num_perm], _MINHASH_SEEDS[1][:num_perm]


_MERSENNE = np.uint64((1 << 61) - 1)


def minhash_signature(sh: set[bytes], num_perm: int = 128) -> np.ndarray:
    """MinHash signature over 8-byte shingle hashes (vectorized: one
    (n_shingles x num_perm) matmul-free pass)."""
    a, b = _minhash_params(num_perm)
    if not sh:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = np.frombuffer(b"".join(sorted(sh)), dtype="<u8").astype(np.uint64)
    # (n, p): (a*v + b) mod mersenne61
    prod = (vals[:, None] * a[None, :] + b[None, :]) & np.uint64(0xFFFFFFFFFFFFFFFF)
    hashed = (prod % _MERSENNE).astype(np.uint64)
    return hashed.min(axis=0)


def minhash_signatures_batch(
    shingle_sets: list[set[bytes]], num_perm: int = 128
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures in ONE vectorized pass:
    concatenate all docs' shingle values, hash the whole (total, num_perm)
    matrix, then segment-min with np.minimum.reduceat. Identical output to
    per-doc ``minhash_signature`` (tested), ~an order of magnitude faster
    for batch-sized corpora."""
    a, b = _minhash_params(num_perm)
    n = len(shingle_sets)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    lengths = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    nonempty = np.nonzero(lengths > 0)[0]
    if nonempty.size == 0:
        return out
    blob = b"".join(
        b"".join(sorted(shingle_sets[i])) for i in nonempty
    )
    vals = np.frombuffer(blob, dtype="<u8").astype(np.uint64)
    prod = (vals[:, None] * a[None, :] + b[None, :]) & np.uint64(0xFFFFFFFFFFFFFFFF)
    hashed = (prod % _MERSENNE).astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
    mins = np.minimum.reduceat(hashed, offsets, axis=0)
    out[nonempty] = mins
    return out


# --- vectorized uint64 kernels (the batch hot path) ----------------------
#
# The per-doc md5 shingle/simhash functions above are the readable
# reference semantics (and what small unit tests pin); the batch kernels
# below compute the same STRUCTURES (k-token shingles, char n-grams,
# simhash sign-sums) in a different 64-bit hash space, fully vectorized:
# one pandas.util.hash_array call per batch for all token/gram strings
# (C siphash, deterministic fixed key), numpy window polynomials for the
# shingle combine, reduceat for per-doc segmentation. Jaccard/Hamming
# decisions are hash-space-invariant (64-bit collisions are negligible),
# so dedup pipelines built on these match brute-force computations built
# on the md5 variants — which is exactly what tests/test_dedup_text.py
# asserts.

import pandas as _pd

_FNV_PRIME = 1099511628211
_POW_CACHE: dict[int, np.ndarray] = {}
# byte-wise popcount table (numpy<2 has no bitwise_count)
_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def _window_pows(k: int) -> np.ndarray:
    """[P^(k-1), ..., P, 1] mod 2^64 — polynomial weights for a k-window."""
    pw = _POW_CACHE.get(k)
    if pw is None:
        pw = np.array(
            [pow(_FNV_PRIME, k - 1 - i, 1 << 64) for i in range(k)],
            dtype=np.uint64,
        )
        _POW_CACHE[k] = pw
    return pw


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: decorrelates the linear polynomial combine."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hash_strings(strs: list[str]) -> np.ndarray:
    """Vectorized deterministic string->uint64 (pandas siphash, fixed key)."""
    if not strs:
        return np.empty(0, dtype=np.uint64)
    return _pd.util.hash_array(np.asarray(strs, dtype=object)).astype(np.uint64)


def _md5_low64(strs: list[str]) -> np.ndarray:
    """string->uint64 via md5 digest[:8] little-endian — the SQL-parity
    hash space (DuckDB ``md5_number_upper`` computes the identical value).
    Each DISTINCT string is digested once (np.unique first): token streams
    repeat heavily, so the hashlib loop runs over the vocabulary, not the
    corpus."""
    if not strs:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(strs, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    hu = np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in uniq.tolist()
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hu[inv]


def shingle_hashes_batch(texts: list[str | None], k: int = 5) -> list[np.ndarray]:
    """Per-doc SORTED UNIQUE uint64 hashes of the k-token shingles of the
    normalized text (same shingle structure as ``shingles()``: docs shorter
    than k tokens get one all-tokens shingle; empty docs get none). One
    vectorized hash pass over every token in the batch."""
    toks_per_doc = [
        tokens_ws(normalize_for_fingerprint(t or "")) for t in texts
    ]
    th = _hash_strings([tok for toks in toks_per_doc for tok in toks])
    out: list[np.ndarray] = []
    pos = 0
    pows_k = _window_pows(k)
    for toks in toks_per_doc:
        m = len(toks)
        h = th[pos : pos + m]
        pos += m
        if m == 0:
            out.append(np.empty(0, dtype=np.uint64))
        elif m < k:
            val = (h * _window_pows(m)).sum(dtype=np.uint64)
            out.append(_mix64(np.array([val], dtype=np.uint64)))
        else:
            sw = np.lib.stride_tricks.sliding_window_view(h, k)
            vals = (sw * pows_k[None, :]).sum(axis=1, dtype=np.uint64)
            out.append(np.unique(_mix64(vals)))
    return out


def char_ngram_hashes_batch(texts: list[str | None], n: int = 3) -> list[np.ndarray]:
    """Per-doc sorted unique uint64 hashes of the char n-grams of the
    normalized text (same structure as ``char_ngrams()``)."""
    grams_per_doc: list[list[str]] = []
    for t in texts:
        norm = normalize_for_fingerprint(t or "")
        if not norm:
            grams_per_doc.append([])
        elif len(norm) < n:
            grams_per_doc.append([norm])
        else:
            grams_per_doc.append([norm[i : i + n] for i in range(len(norm) - n + 1)])
    gh = _hash_strings([g for grams in grams_per_doc for g in grams])
    out: list[np.ndarray] = []
    pos = 0
    for grams in grams_per_doc:
        m = len(grams)
        out.append(np.unique(gh[pos : pos + m]))
        pos += m
    return out


def jaccard_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two SORTED UNIQUE uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (len(a) + len(b) - inter)


def minhash_from_hashes_batch(
    hash_arrays: list[np.ndarray], num_perm: int = 128
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures straight from uint64 shingle
    hashes (no bytes round-trip): concatenate, hash the (total, num_perm)
    matrix once, segment-min with reduceat."""
    a, b = _minhash_params(num_perm)
    n = len(hash_arrays)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    lengths = np.array([len(x) for x in hash_arrays], dtype=np.int64)
    nonempty = np.nonzero(lengths > 0)[0]
    if nonempty.size == 0:
        return out
    vals = np.concatenate([hash_arrays[i] for i in nonempty]).astype(np.uint64)
    prod = (vals[:, None] * a[None, :] + b[None, :]) & np.uint64(0xFFFFFFFFFFFFFFFF)
    hashed = (prod % _MERSENNE).astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
    out[nonempty] = np.minimum.reduceat(hashed, offsets, axis=0)
    return out


def lsh_band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 band-bucket keys from (n_docs, num_perm)
    signatures: polynomial combine of each band's rows + a band-index mix
    so buckets never collide across bands. Vectorized over the batch."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    chunks = sigs[:, : bands * rows].reshape(n, bands, rows)
    pows = _window_pows(rows)
    vals = (chunks * pows[None, None, :]).sum(axis=2, dtype=np.uint64)
    band_salt = _mix64(np.arange(1, bands + 1, dtype=np.uint64))
    return _mix64(vals ^ band_salt[None, :])


def simhash64_batch(
    texts: list[str | None], hash_space: str = "fast"
) -> np.ndarray:
    """Vectorized 64-bit SimHash over whitespace tokens (weight 1 each):
    per-bit sign sums via reduceat. Empty docs hash to 0 (matching
    ``simhash64``'s structure). ``hash_space``: "fast" = the batch siphash
    space (the scale default); "md5" = md5-low64-LE per token, bit-exact
    with scalar ``simhash64`` AND reproducible in SQL (DuckDB
    ``md5_number_upper``) — the oracle space."""
    toks_per_doc = [
        tokens_ws(normalize_for_fingerprint(t or "")) for t in texts
    ]
    hash_fn = _md5_low64 if hash_space == "md5" else _hash_strings
    th = hash_fn([tok for toks in toks_per_doc for tok in toks])
    lengths = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nonempty = np.nonzero(lengths > 0)[0]
    if nonempty.size == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)
    signs = (
        ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1
    )
    offsets = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
    acc = np.add.reduceat(signs, offsets, axis=0)
    bits = (acc > 0).astype(np.uint64)
    out[nonempty] = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def hamming64_matrix(sigs: np.ndarray) -> np.ndarray:
    """(n, n) pairwise Hamming distances of uint64 signatures via a
    byte-table popcount (numpy<2-safe)."""
    x = np.ascontiguousarray(sigs[:, None] ^ sigs[None, :])
    return _POPCNT8[x.view(np.uint8).reshape(x.shape + (8,))].sum(
        axis=-1, dtype=np.int64
    )


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[bytes]:
    """Split the signature into bands; each band hashes to one bucket key
    (band_id prefixed so buckets don't collide across bands)."""
    rows = len(sig) // bands
    keys = []
    for bnd in range(bands):
        chunk = sig[bnd * rows : (bnd + 1) * rows].tobytes()
        keys.append(struct.pack("<H", bnd) + hashlib.md5(chunk).digest()[:8])
    return keys


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weight 1 each)."""
    toks = tokens_ws(normalize_for_fingerprint(text))
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
