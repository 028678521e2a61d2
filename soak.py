"""Scale-soak harness: the scale-critical kernels over deterministic
synthetic corpora 1-2 orders of magnitude above the sf0.1 bench, so the
soak numbers quoted in BASELINE.md / ROUND notes are reproducible with
one command. Prints ONE JSON line.

Usage:
    python soak.py                 # all soaks, RAY_GRAFT_CPUS (default 32)
    python soak.py sessionize ...  # named subset

Each soak synthesizes its input to /tmp parquet first (untimed) and
times only the pipeline, mirroring how bench.py treats corpus setup.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _write(tmp: str, name: str, table: pa.Table, row_group_size: int = 200_000):
    path = os.path.join(tmp, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def soak_sessionize(tmp: str) -> dict:
    """grouped_sessionize over 10M events / 500k users (one bucket
    shuffle, O(sessions) output) — exercised through the user_sessions
    query itself."""
    from webscrape_neko_jirushi_ray.pipelines import queries as q

    rng = np.random.default_rng(7)
    n = 10_000_000
    ts = rng.integers(0, 3_600_000_000_000, n).astype("datetime64[us]")
    _write(
        tmp,
        "sess/events.parquet",
        pa.table(
            {
                "user_id": rng.integers(0, 500_000, n).astype(np.int64),
                "ts": pa.array(ts),
            }
        ),
    )
    t0 = time.perf_counter()
    out = q.user_sessions(os.path.join(tmp, "sess"))
    return {"sec": round(time.perf_counter() - t0, 2), "sessions": len(out)}


def soak_count_distinct(tmp: str) -> dict:
    """Exact windowed COUNT(DISTINCT) over 10M events / 1M users via the
    hourly_active_users query (pair-hash bucket shuffle)."""
    from webscrape_neko_jirushi_ray.pipelines import queries as q

    rng = np.random.default_rng(11)
    n = 10_000_000
    ts = rng.integers(0, 720 * 3_600_000_000, n).astype("datetime64[us]")
    _write(
        tmp,
        "cd/events.parquet",
        pa.table(
            {
                "user_id": rng.integers(0, 1_000_000, n).astype(np.int64),
                "ts": pa.array(ts),
            }
        ),
    )
    t0 = time.perf_counter()
    out = q.hourly_active_users(os.path.join(tmp, "cd"))
    return {"sec": round(time.perf_counter() - t0, 2), "hours": len(out)}


def soak_dense_index(tmp: str) -> dict:
    """attach_dense_index over 5M unique keys (vectorized merge-lexsort
    range tagging; two bounded shuffles, O(ranges) driver)."""
    import ray.data

    from webscrape_neko_jirushi_ray.functions.enumerate import attach_dense_index

    rng = np.random.default_rng(13)
    n = 5_000_000
    keys = rng.permutation(n).astype(np.int64)
    _write(tmp, "di/rows.parquet", pa.table({"k": keys}))
    ds = ray.data.read_parquet(os.path.join(tmp, "di"))
    t0 = time.perf_counter()
    ranked = attach_dense_index(ds, ["k"], index_col="rank", num_ranges=128)
    n_out = ranked.count()
    return {"sec": round(time.perf_counter() - t0, 2), "rows": n_out}


def soak_exact_dedup(tmp: str) -> dict:
    """exact_dedup over 1M docs with ~20% duplicates (fingerprint-hash
    bucket shuffle, vectorized keep-first)."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.dedup import exact_dedup

    rng = np.random.default_rng(17)
    n = 1_000_000
    base = rng.integers(0, 800_000, n)  # collisions = duplicate texts
    texts = [f"document body number {int(b)} with shared tail tokens" for b in base]
    _write(
        tmp,
        "dd/docs.parquet",
        pa.table(
            {"doc_id": np.arange(n, dtype=np.int64), "text": texts}
        ),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "dd"))
    t0 = time.perf_counter()
    kept = exact_dedup(ds).count()
    return {"sec": round(time.perf_counter() - t0, 2), "kept": kept}


def soak_percent_rank(tmp: str) -> dict:
    """grouped_percent_rank over 10M rows / 500k groups — per-bucket
    lexsort + cumsum-gather; Python calls bounded by num_partitions."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_percent_rank

    rng = np.random.default_rng(19)
    n = 10_000_000
    _write(
        tmp,
        "pr/rows.parquet",
        pa.table(
            {
                "g": rng.integers(0, 500_000, n).astype(np.int64),
                "v": rng.integers(0, 1000, n).astype(np.int64),
            }
        ),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "pr"))
    t0 = time.perf_counter()
    n_out = grouped_percent_rank(ds, group_col="g", value_col="v").count()
    return {"sec": round(time.perf_counter() - t0, 2), "rows": n_out}


def soak_string_agg(tmp: str) -> dict:
    """grouped_string_agg over 5M rows / 200k groups — one bucket
    shuffle, one list-offset binary_join per bucket."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_string_agg

    rng = np.random.default_rng(23)
    n = 5_000_000
    vals = np.char.add("v", rng.integers(0, 10_000, n).astype("U5"))
    _write(
        tmp,
        "sa/rows.parquet",
        pa.table(
            {
                "g": rng.integers(0, 200_000, n).astype(np.int64),
                "v": pa.array(vals.tolist(), pa.string()),
            }
        ),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "sa"))
    t0 = time.perf_counter()
    n_out = grouped_string_agg(ds, group_col="g", value_col="v").count()
    return {"sec": round(time.perf_counter() - t0, 2), "groups": n_out}


def soak_first_last(tmp: str) -> dict:
    """grouped_first_last over 10M rows / 500k groups: one bucket
    shuffle, one lexsort + two boundary takes per bucket."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_first_last

    rng = np.random.default_rng(11)
    n = 10_000_000
    _write(
        tmp,
        "fl/rows.parquet",
        pa.table(
            {
                "g": rng.integers(0, 500_000, n).astype(np.int64),
                "o": rng.integers(0, 10**9, n).astype(np.int64),
                "rid": np.arange(n, dtype=np.int64),
                "v": rng.integers(0, 1000, n).astype(np.int64),
            }
        ),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "fl"))
    t0 = time.perf_counter()
    cnt = grouped_first_last(
        ds, group_col="g", order_cols=["o", "rid"], value_col="v",
        count_col="n",
    ).count()
    return {"sec": round(time.perf_counter() - t0, 2), "groups": cnt}


def soak_bloom_join(tmp: str) -> dict:
    """Bloom-prefiltered left_semi at the scale where the route turns it
    on: 20M-row big side vs a 100k-key selective side. Reports both the
    plain and bloomed join times AND the prefilter survivor count (the
    shuffle-payload saving the route buys)."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.joins import (
        bloom_prefilter, build_bloom, hash_join,
    )

    rng = np.random.default_rng(13)
    n = 20_000_000
    _write(
        tmp,
        "bl/big.parquet",
        pa.table(
            {
                "k": rng.integers(0, 10_000_000, n).astype(np.int64),
                "payload": np.arange(n, dtype=np.int64),
            }
        ),
    )
    keys = rng.choice(100_000, size=100_000, replace=False).astype(np.int64)
    _write(tmp, "bl/small.parquet", pa.table({"k": pa.array(keys, pa.int64())}))
    big = ray.data.read_parquet(os.path.join(tmp, "bl/big.parquet"))
    small = ray.data.read_parquet(os.path.join(tmp, "bl/small.parquet"))
    t0 = time.perf_counter()
    plain = hash_join(big, small, key="k", how="left_semi").count()
    t_plain = round(time.perf_counter() - t0, 2)
    big2 = ray.data.read_parquet(os.path.join(tmp, "bl/big.parquet"))
    small2 = ray.data.read_parquet(os.path.join(tmp, "bl/small.parquet"))
    t0 = time.perf_counter()
    bloomed = hash_join(
        big2, small2, key="k", how="left_semi", bloom_filter_left=True
    ).count()
    t_bloom = round(time.perf_counter() - t0, 2)
    assert plain == bloomed, (plain, bloomed)
    import ray as _ray

    bm = build_bloom(small, "k")
    survivors = bloom_prefilter(big, _ray.put(bm), "k").count()
    return {
        "plain_sec": t_plain,
        "bloom_sec": t_bloom,
        "matches": plain,
        "prefilter_survivors": survivors,
        "big_rows": n,
    }


def soak_cms(tmp: str) -> dict:
    """Count-min over 20M int keys (2M distinct): per-batch matrix
    partials, driver sums O(blocks) 2 MiB matrices."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(17)
    n = 20_000_000
    _write(
        tmp,
        "cms/rows.parquet",
        pa.table({"k": rng.integers(0, 2_000_000, n).astype(np.int64)}),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "cms"))
    t0 = time.perf_counter()
    sk = cms_build(ds, "k", width_log2=20, depth=4)
    sec = round(time.perf_counter() - t0, 2)
    est = cms_estimate(sk, np.arange(100, dtype=np.int64), width_log2=20)
    return {"sec": sec, "total": int(sk[0].sum()), "sample_max_est": int(est.max())}


def soak_bucketed_quantiles(tmp: str) -> dict:
    """Two-level exact quantiles over 20M rows spanning a 2^44 domain
    (dense histograms would need ~20M driver rows; this path needs
    <= 2^16 + slice)."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.textstats import (
        bucketed_exact_quantiles,
    )

    rng = np.random.default_rng(19)
    n = 20_000_000
    _write(
        tmp,
        "bq/rows.parquet",
        pa.table({"v": rng.integers(-(2**43), 2**43, n).astype(np.int64)}),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "bq"))
    t0 = time.perf_counter()
    out = bucketed_exact_quantiles(ds, "v", (1, 50, 99))
    return {
        "sec": round(time.perf_counter() - t0, 2),
        "p50": int(out[out["q_pct"] == 50]["value"].iloc[0]),
    }


def soak_token_shuffle(tmp: str) -> dict:
    """hapax_ratio_per_lang + vocab_growth_curve over 300k docs x ~60
    zipfian tokens (~18M token instances, ~200k-word vocabulary) — the
    unigram families whose r4 rewrite shuffles (h1, h2) int64 identities
    instead of token strings, with fully vectorized batch partials."""
    from webscrape_neko_jirushi_ray.pipelines import queries as q

    rng = np.random.default_rng(23)
    n_docs, vocab_n = 300_000, 200_000
    vocab = np.array(
        ["w%06d" % i for i in range(vocab_n)], dtype=object
    )
    lens = rng.integers(20, 100, n_docs)
    total = int(lens.sum())
    # zipf-ish: square a uniform to skew toward low ids
    ids = (rng.random(total) ** 2 * vocab_n).astype(np.int64)
    flat = vocab[ids]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = np.array(
        [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(n_docs)],
        dtype=object,
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "lang": pa.array(
                np.array(["en", "ja", "de", "fr"], dtype=object)[
                    rng.integers(0, 4, n_docs)
                ]
            ),
            "text": pa.array(texts, pa.string()),
        }
    )
    # 16 shard FILES, not one: ray.data.read_parquet schedules one read
    # task per file, so a single-file text corpus serializes the fused
    # read->tokenize stage behind one task (measured 3x slower here).
    # A real crawl corpus is always many shards; model that shape.
    shard = (n_docs + 15) // 16
    for i in range(16):
        _write(
            tmp,
            f"tok/documents.parquet/part-{i:02d}.parquet",
            tbl.slice(i * shard, shard),
            row_group_size=20_000,
        )
    d = os.path.join(tmp, "tok")
    t0 = time.perf_counter()
    hap = q.hapax_ratio_per_lang(d)
    t1 = time.perf_counter()
    vg = q.vocab_growth_curve(d)
    t2 = time.perf_counter()
    return {
        "hapax_sec": round(t1 - t0, 2),
        "vocab_growth_sec": round(t2 - t1, 2),
        "langs": len(hap),
        "docs": len(vg),
    }


def soak_simjoin(tmp: str) -> dict:
    """Exact prefix-filtered similarity self-join over 150k 24-char
    entity strings (62-char alphabet, ~216k-trigram vocabulary) with 5%
    planted near-duplicates (1-char mutations, Jaccard ~0.84) — the
    entity-resolution shape at 150x the bench supplier table. Random
    non-dup strings land far below t, so the prefix filter must prune
    ~11G raw pairs down to the planted ones."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.simjoin import (
        ngram_similarity_selfjoin,
    )

    rng = np.random.default_rng(31)
    n, slen = 150_000, 24
    alpha = np.array(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    )
    chars = alpha[rng.integers(0, len(alpha), (n, slen))]
    # plant near-dups: last 5% of rows copy a random earlier row with
    # one mutated position
    n_dup = n // 20
    src = rng.integers(0, n - n_dup, n_dup)
    chars[n - n_dup :] = chars[src]
    pos = rng.integers(0, slen, n_dup)
    chars[np.arange(n - n_dup, n), pos] = alpha[
        rng.integers(0, len(alpha), n_dup)
    ]
    texts = np.array(["".join(row) for row in chars], dtype=object)
    _write(
        tmp,
        "sj/rows.parquet",
        pa.table(
            {
                "rid": pa.array(np.arange(n, dtype=np.int64)),
                "txt": pa.array(texts, pa.string()),
            }
        ),
        row_group_size=10_000,
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "sj"))
    t0 = time.perf_counter()
    out = ngram_similarity_selfjoin(
        ds, id_col="rid", text_col="txt", n=3, threshold=0.7
    ).to_pandas()
    return {"sec": round(time.perf_counter() - t0, 2), "pairs": len(out)}


def soak_fuzzy_decon(tmp: str) -> dict:
    """fuzzy_decontaminate over 300k docs x ~60 zipfian tokens vs a
    1,000-doc benchmark (every 300th doc verbatim -> those dup rows and
    near-identical neighbors must drop): the broadcast-inverted-index
    probe at 600x the bench corpus. Work should be linear in matches —
    random zipfian docs rarely clear Jaccard 0.5."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.spandedup import (
        fuzzy_decontaminate,
    )

    rng = np.random.default_rng(29)
    n_docs, vocab_n = 300_000, 200_000
    vocab = np.array(["w%06d" % i for i in range(vocab_n)], dtype=object)
    lens = rng.integers(20, 100, n_docs)
    total = int(lens.sum())
    ids = (rng.random(total) ** 2 * vocab_n).astype(np.int64)
    flat = vocab[ids]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = np.array(
        [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(n_docs)],
        dtype=object,
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    shard = (n_docs + 15) // 16
    for i in range(16):
        _write(
            tmp,
            f"fd/docs.parquet/part-{i:02d}.parquet",
            tbl.slice(i * shard, shard),
            row_group_size=10_000,
        )
    docs = ray.data.read_parquet(os.path.join(tmp, "fd"))

    def _bench_rows(t: pa.Table) -> pa.Table:
        did = np.asarray(
            t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        return t.filter(pa.array(did % 300 == 0))

    bench = docs.map_batches(_bench_rows, batch_format="pyarrow")
    t0 = time.perf_counter()
    kept = fuzzy_decontaminate(docs, bench, k=3, threshold=0.5).count()
    return {
        "sec": round(time.perf_counter() - t0, 2),
        "kept": kept,
        "dropped": n_docs - kept,
    }


def soak_edit_join(tmp: str) -> dict:
    """Exact edit-distance self-join (k=1) over 200k 20-char entity
    strings with 5% planted single-char typos — symmetric-delete
    signatures mean 21 variant rows per string (4.2M-row bucket
    shuffle), zero driver state. Random 62-alphabet strings essentially
    never collide, so found pairs ≈ planted typos (+ mutation
    coincidences)."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.simjoin import edit_distance_selfjoin

    rng = np.random.default_rng(37)
    n, slen = 200_000, 20
    alpha = np.array(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    )
    chars = alpha[rng.integers(0, len(alpha), (n, slen))]
    n_dup = n // 20
    src = rng.integers(0, n - n_dup, n_dup)
    chars[n - n_dup :] = chars[src]
    pos = rng.integers(0, slen, n_dup)
    chars[np.arange(n - n_dup, n), pos] = alpha[rng.integers(0, len(alpha), n_dup)]
    texts = np.array(["".join(row) for row in chars], dtype=object)
    tbl = pa.table(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "txt": pa.array(texts, pa.string()),
        }
    )
    shard = (n + 15) // 16
    for i in range(16):
        _write(
            tmp,
            f"ej/rows.parquet/part-{i:02d}.parquet",
            tbl.slice(i * shard, shard),
            row_group_size=10_000,
        )
    ds = ray.data.read_parquet(os.path.join(tmp, "ej"))
    t0 = time.perf_counter()
    out = edit_distance_selfjoin(ds, id_col="rid", text_col="txt", k=1).to_pandas()
    return {
        "sec": round(time.perf_counter() - t0, 2),
        "pairs": len(out),
        "planted": int(n_dup),
    }


def soak_interval_overlap(tmp: str) -> dict:
    """interval_overlap_counts over 5M intervals (~1000 mean overlap
    degree: the pair set is ~2.5G — counts stay linear). Runs the
    DISTRIBUTED bucket-rank route (route-forced) and cross-checks it
    against the driver-lexsort route on the identical input: totals and
    a 1,000-row sample must match exactly."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import interval_overlap_counts

    rng = np.random.default_rng(41)
    n = 5_000_000
    s = rng.integers(0, 1_000_000_000, n).astype(np.int64)
    e = s + rng.integers(0, 200_000, n).astype(np.int64)
    tbl = pa.table(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "s": pa.array(s),
            "e": pa.array(e),
        }
    )
    shard = (n + 15) // 16
    for i in range(16):
        _write(
            tmp,
            f"iv/spans.parquet/part-{i:02d}.parquet",
            tbl.slice(i * shard, shard),
            row_group_size=200_000,
        )
    ds = ray.data.read_parquet(os.path.join(tmp, "iv"))
    t0 = time.perf_counter()
    dist = interval_overlap_counts(
        ds, id_cols=["rid"], start_col="s", end_col="e",
        small_max_rows=0, num_buckets=4096,
    ).to_pandas()
    dist_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    drv = interval_overlap_counts(
        ds, id_cols=["rid"], start_col="s", end_col="e",
    ).to_pandas()
    drv_sec = round(time.perf_counter() - t0, 2)
    a = dist.sort_values("rid").reset_index(drop=True)
    b = drv.sort_values("rid").reset_index(drop=True)
    assert int(a["n_overlap"].sum()) == int(b["n_overlap"].sum())
    idx = rng.integers(0, n, 1000)
    assert (
        a["n_overlap"].to_numpy()[idx] == b["n_overlap"].to_numpy()[idx]
    ).all()
    return {
        "dist_sec": dist_sec,
        "driver_sec": drv_sec,
        "mean_overlap": round(float(a["n_overlap"].mean()), 1),
    }


def soak_rolling_median(tmp: str) -> dict:
    """grouped_rolling_median window=5 over 10M rows / 500k groups —
    one bucket shuffle, masked sliding-matrix nanmedian per bucket."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.relops import grouped_rolling_median

    rng = np.random.default_rng(23)
    n = 10_000_000
    _write(
        tmp,
        "rmed/rows.parquet",
        pa.table(
            {
                "g": rng.integers(0, 500_000, n).astype(np.int64),
                "o": rng.integers(0, 10**9, n).astype(np.int64),
                "rid": np.arange(n, dtype=np.int64),
                "v": rng.normal(size=n),
            }
        ),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "rmed"))
    t0 = time.perf_counter()
    n_out = grouped_rolling_median(
        ds, group_col="g", order_cols=["o", "rid"], value_col="v", window=5
    ).count()
    return {"sec": round(time.perf_counter() - t0, 2), "rows": n_out}


def soak_quantile_sketch(tmp: str) -> dict:
    """quantile_sketch k=512 over 20M wide-domain values — O(k) driver
    state; checks the three-level merge tree and the rank-error bound
    at soak scale."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.sketch import (
        quantile_sketch, quantile_sketch_query,
    )

    rng = np.random.default_rng(29)
    n = 20_000_000
    data = rng.integers(0, 2**62, n)
    _write(tmp, "qs/rows.parquet", pa.table({"x": data.astype(np.int64)}))
    ds = ray.data.read_parquet(os.path.join(tmp, "qs"))
    t0 = time.perf_counter()
    v, w = quantile_sketch(ds, "x", k=512)
    sec = round(time.perf_counter() - t0, 2)
    assert int(w.sum()) == n
    est = quantile_sketch_query(v, w, [0.5])[0]
    s = np.sort(data)
    rank = float(np.searchsorted(s, est, side="left"))
    err = abs(rank - 0.5 * n) / n
    return {"sec": sec, "rows": n, "p50_rank_err": round(err, 5)}


def soak_sitemaps(tmp: str) -> dict:
    """sitemaps_to_frontier over an index of 40 leaves x 10k URLs
    (400k locs, 5% cross-leaf duplicates) — driver state O(41 sitemap
    files); the keep-first shuffle and dense-index enumeration carry
    the URL volume."""
    import datetime as dt

    import ray.data

    from webscrape_neko_jirushi_ray.sources.pages import BroadcastPageStore
    from webscrape_neko_jirushi_ray.sources.sitemaps import sitemaps_to_frontier

    n_leaves, per_leaf = 40, 10_000
    leaves = [f"http://big.example/sm{i}.xml" for i in range(n_leaves)]
    bodies = {
        "http://big.example/sitemap.xml": (
            "<sitemapindex>"
            + "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in leaves)
            + "</sitemapindex>"
        ).encode()
    }
    for i, leaf in enumerate(leaves):
        start = i * per_leaf * 95 // 100  # 5% overlap with prior leaf
        urls = "".join(
            f"<url><loc>http://big.example/p{start + j}</loc></url>"
            for j in range(per_leaf)
        )
        bodies[leaf] = f"<urlset>{urls}</urlset>".encode()
    store = BroadcastPageStore(
        pa.table(
            {
                "url": pa.array(sorted(bodies), pa.string()),
                "warc_ts": pa.array(
                    [dt.datetime(2020, 1, 1)] * len(bodies),
                    pa.timestamp("us"),
                ),
                "html": pa.array(
                    [bodies[u] for u in sorted(bodies)], pa.binary()
                ),
                "lang": pa.array(["en"] * len(bodies), pa.string()),
            }
        )
    )
    t0 = time.perf_counter()
    fr = sitemaps_to_frontier(store, ["http://big.example/sitemap.xml"])
    n_out = fr.count()
    sec = round(time.perf_counter() - t0, 2)
    expected = (n_leaves - 1) * per_leaf * 95 // 100 + per_leaf
    assert n_out == expected, (n_out, expected)
    return {"sec": sec, "urls_in": n_leaves * per_leaf, "frontier": n_out}


def soak_fk_audit(tmp: str) -> dict:
    """fk_coverage_audit over a 20M-row lineitem / 2M-key orders corpus
    (plus the smaller dims) with 0.1% planted orphans — the fused
    single-shuffle plan at soak scale; asserts exact orphan counts."""
    import ray.data

    from webscrape_neko_jirushi_ray.pipelines import queries as q

    rng = np.random.default_rng(83)
    root = os.path.join(tmp, "fk")
    os.makedirs(root, exist_ok=True)
    n_li, n_ord, n_part, n_supp, n_cust = (
        20_000_000, 2_000_000, 200_000, 10_000, 200_000
    )
    ok = rng.integers(1, n_ord + 1, n_li)
    orphan_mask = rng.random(n_li) < 0.001
    ok[orphan_mask] = rng.integers(n_ord + 1, n_ord * 2, orphan_mask.sum())
    _write(
        tmp, "fk/lineitem.parquet",
        pa.table(
            {
                "l_orderkey": ok.astype(np.int64),
                "l_partkey": rng.integers(1, n_part + 1, n_li).astype(np.int64),
                "l_suppkey": rng.integers(1, n_supp + 1, n_li).astype(np.int64),
            }
        ),
    )
    _write(tmp, "fk/orders.parquet", pa.table(
        {"o_orderkey": np.arange(1, n_ord + 1, dtype=np.int64),
         "o_custkey": rng.integers(1, n_cust + 1, n_ord).astype(np.int64)}))
    _write(tmp, "fk/part.parquet", pa.table(
        {"p_partkey": np.arange(1, n_part + 1, dtype=np.int64)}))
    _write(tmp, "fk/supplier.parquet", pa.table(
        {"s_suppkey": np.arange(1, n_supp + 1, dtype=np.int64),
         "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int64)}))
    _write(tmp, "fk/customer.parquet", pa.table(
        {"c_custkey": np.arange(1, n_cust + 1, dtype=np.int64),
         "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int64)}))
    _write(tmp, "fk/nation.parquet", pa.table(
        {"n_nationkey": np.arange(25, dtype=np.int64)}))
    t0 = time.perf_counter()
    out = q.fk_coverage_audit(root)
    sec = round(time.perf_counter() - t0, 2)
    row = out[out["relation"] == "lineitem.l_orderkey->orders"].iloc[0]
    assert int(row["orphan_rows"]) == int(orphan_mask.sum()), (
        row["orphan_rows"], orphan_mask.sum()
    )
    assert int(row["child_rows"]) == n_li
    return {"sec": sec, "child_rows": n_li,
            "orphans": int(row["orphan_rows"])}




def _kill_resume_build(root: str, rep: int):
    """Synthesize the replicated refetch corpus (bench.py's incremental
    REP pattern): a partitioned page store + a pre-keyed seed frontier,
    ~21k URLs per rep. Returns (store, frontier_table)."""
    from webscrape_neko_jirushi_ray.functions.urlkit import (
        add_url_key_columns,
    )
    from webscrape_neko_jirushi_ray.pipelines.crawl import seeds_to_frontier
    from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore
    from webscrape_neko_jirushi_ray.synth import synth_pages

    pages, _seeds = synth_pages(
        num_listing_pages=1400, seed=42, minor_host_pages=20
    )
    store_root = os.path.join(root, "pstore")
    chunks = []
    base_urls = pages["url"].to_pylist()
    n_total = 0
    for k in range(rep):
        if k == 0:
            rep_tbl, urls_k = pages, base_urls
        else:
            urls_k = [f"{u}?rep={k}" for u in base_urls]
            rep_tbl = pages.set_column(0, "url", pa.array(urls_k))
        PartitionedPageStore.build(
            add_url_key_columns(rep_tbl), store_root, num_buckets=64,
            part_name=f"part{k}",
        )
        chunk = seeds_to_frontier(urls_k)
        chunk = chunk.set_column(
            chunk.schema.get_field_index("discovery_seq"),
            "discovery_seq",
            pa.array(
                [n_total + i for i in range(chunk.num_rows)], type=pa.int64()
            ),
        )
        chunks.append(chunk)
        n_total += chunk.num_rows
    return PartitionedPageStore(store_root, 64), pa.concat_tables(chunks)


def _kill_resume_cfg(budget: int):
    from webscrape_neko_jirushi_ray.config import CrawlConfig

    return CrawlConfig(
        # dominant host carries most URLs: the budget slices the corpus
        # into ~8 BFS rounds so the kill lands mid-crawl with completed
        # checkpoints behind it
        host_budget_per_round=budget,
        max_rounds=50,
        seen_shards=8,
        # EXACT seen mode: the byte-equality assertion needs a fully
        # deterministic baseline. Cuckoo mode is ~1e-6/lookup false
        # positive BY DESIGN (state/seen.py) and the drops are
        # insertion-order-dependent — measured live at this soak's
        # scale: two identical 983,872-URL cuckoo runs differed by
        # exactly one dropped URL (the design rate), so cuckoo-mode
        # byte-equality is not a meaningful contract
        seen_mode="exact",
        host_salt_buckets=32,
        fetch_concurrency=max(4, NUM_CPUS - 2),
        fetch_batch_size=64,
        small_round_threshold=256,
        expand_links=False,
    )


def _kill_resume_child(job_file: str) -> None:
    """Child entry (run as `soak.py _kill_resume_child <job.json>`): own
    Ray instance, runs the crawl until the parent SIGKILLs the process
    group mid-round."""
    import ray

    from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
    from webscrape_neko_jirushi_ray.sources.pages import PartitionedPageStore

    with open(job_file, encoding="utf-8") as f:
        job = json.load(f)
    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    store = PartitionedPageStore(job["store_root"], 64)
    frontier = pq.read_table(job["frontier"])
    crawl(
        store, [], job["out_dir"], _kill_resume_cfg(int(job["budget"])),
        seed_frontier=frontier,
    )
    ray.shutdown()


def _result_digest(res) -> tuple[str, int, str, int]:
    """(visits-md5, visits-rows, docs-md5, docs-rows): the byte-equality
    fingerprint of a crawl's outputs — the full visit log in visit order
    and every extracted doc row sorted by url."""
    import hashlib

    def _tbl_md5(t: pa.Table) -> str:
        # IPC bytes of a single-chunk, column-sorted table are a pure
        # function of its contents — a vectorized whole-table hash
        t = t.select(sorted(t.column_names)).combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return hashlib.md5(sink.getvalue().to_pybytes()).hexdigest()

    v = res.visits_table()
    v = v.sort_by([("visit_idx", "ascending")]).select(
        ["visit_idx", "url", "round", "fetch_status", "url_sha1"]
    )
    docs_files = res.nonempty_docs_paths()
    d_rows, d_md5 = 0, ""
    if docs_files:
        d = pq.read_table(docs_files).sort_by([("url", "ascending")])
        d_rows = d.num_rows
        d_md5 = _tbl_md5(d)
    return _tbl_md5(v), v.num_rows, d_md5, d_rows


def soak_kill_resume(tmp: str) -> dict:
    """KILL/RESUME AT SCALE (VERDICT r4 #7): a ~1M-URL multi-round
    refetch crawl is run (a) uninterrupted in this process and (b) in a
    SUBPROCESS whose whole process group is SIGKILLed mid-round (a real
    kill -9 — partial docs shards, missing manifest, dead actors), then
    resumed here with resume=True. The visit log, extracted docs, and
    ok-set sha1s must be BYTE-EQUAL between the two runs (exact seen
    mode — see _kill_resume_cfg for why cuckoo cannot promise this)."""
    import signal
    import subprocess

    from webscrape_neko_jirushi_ray.pipelines.crawl import crawl
    from webscrape_neko_jirushi_ray.state import checkpoint as ckpt

    root = os.path.join(tmp, "kill_resume")
    os.makedirs(root, exist_ok=True)
    # ~31k URLs per rep; 32 reps ≈ the 1M-URL target
    rep = int(os.environ.get("GRAFT_SOAK_KR_REP", "32"))
    store, frontier = _kill_resume_build(root, rep)
    n_urls = frontier.num_rows
    frontier_path = os.path.join(root, "frontier.parquet")
    pq.write_table(frontier, frontier_path)
    # ~8 BFS rounds at any rep: rounds = ceil(busiest-host URLs / budget)
    import pyarrow.compute as _pc

    max_host = int(
        _pc.max(
            _pc.value_counts(frontier["host"]).field("counts")
        ).as_py()
    )
    budget = max(500, max_host // 8)
    cfg = _kill_resume_cfg(budget)

    # --- uninterrupted reference run ------------------------------------
    t0 = time.time()
    full = crawl(store, [], os.path.join(root, "full"), cfg,
                 seed_frontier=frontier)
    t_full = round(time.time() - t0, 2)
    full_digest = _result_digest(full)
    full_sha = full.visited_sha1s()

    # --- killed run (subprocess, own Ray instance, own process group) ---
    out_killed = os.path.join(root, "killed")
    job_file = os.path.join(root, "job.json")
    with open(job_file, "w", encoding="utf-8") as f:
        json.dump(
            {"store_root": store.root, "frontier": frontier_path,
             "out_dir": out_killed, "budget": budget}, f,
        )
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "_kill_resume_child", job_file],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        start_new_session=True,  # killpg reaps its raylet + workers too
    )
    # kill MID-ROUND: wait for round 2's manifest (checkpoints exist),
    # then give round 3 a head start and SIGKILL the process group
    deadline = time.time() + max(120.0, 4 * t_full)
    while time.time() < deadline:
        if ckpt.last_complete_round(out_killed) >= 2:
            break
        if child.poll() is not None:
            raise AssertionError("child crawl exited before the kill")
        time.sleep(0.2)
    time.sleep(max(0.5, t_full / full.rounds / 2))
    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
    child.wait()
    killed_rounds = ckpt.last_complete_round(out_killed) + 1
    assert killed_rounds < full.rounds, (
        f"kill landed after completion ({killed_rounds} rounds) — "
        "vacuous soak"
    )

    # --- resume to completion in THIS process ---------------------------
    t0 = time.time()
    res = crawl(store, [], out_killed, cfg, seed_frontier=frontier,
                resume=True)
    t_resume = round(time.time() - t0, 2)
    res_digest = _result_digest(res)
    assert res_digest == full_digest, (res_digest, full_digest)
    assert res.visited_sha1s() == full_sha
    return {
        "sec_full": t_full, "sec_resume": t_resume, "urls": n_urls,
        "rounds_full": full.rounds, "rounds_at_kill": killed_rounds,
        "visits": full_digest[1], "docs_rows": full_digest[3],
        "byte_equal": True,
    }




def soak_minhash(tmp: str) -> dict:
    """minhash_lsh_dedup over 500k docs with ~10% planted near-dup pairs
    (one token mutated — Jaccard above the 0.8 threshold) — the VERDICT
    r4 #6 chain (bands → bucket groupby → co-group verify → components)
    now pipelines without the candidate materialize barrier."""
    import ray.data

    from webscrape_neko_jirushi_ray.stages.dedup import minhash_lsh_dedup

    rng = np.random.default_rng(29)
    n = 500_000
    base_ids = rng.integers(0, 450_000, n)
    toks = np.char.add("tok", (base_ids[:, None] * 13 + np.arange(12)[None, :]).astype("U8"))
    texts = [" ".join(row) for row in toks]
    # mutate the tail 50k into near-dups of their base (11/13 shingles shared)
    for i in range(450_000, n):
        parts = texts[i].split()
        parts[5] = f"mut{i}"
        texts[i] = " ".join(parts)
    _write(
        tmp, "mh/docs.parquet",
        pa.table({"doc_id": np.arange(n, dtype=np.int64), "text": texts}),
    )
    ds = ray.data.read_parquet(os.path.join(tmp, "mh"))
    t0 = time.perf_counter()
    kept = minhash_lsh_dedup(ds, threshold=0.8, shingle_k=5).count()
    return {"sec": round(time.perf_counter() - t0, 2), "n": n, "kept": kept}


SOAKS = {
    "kill_resume": soak_kill_resume,
    "minhash": soak_minhash,
    "sessionize": soak_sessionize,
    "rolling_median": soak_rolling_median,
    "quantile_sketch": soak_quantile_sketch,
    "sitemaps": soak_sitemaps,
    "fk_audit": soak_fk_audit,
    "edit_join": soak_edit_join,
    "interval_overlap": soak_interval_overlap,
    "token_shuffle": soak_token_shuffle,
    "simjoin": soak_simjoin,
    "fuzzy_decon": soak_fuzzy_decon,
    "count_distinct": soak_count_distinct,
    "dense_index": soak_dense_index,
    "exact_dedup": soak_exact_dedup,
    "percent_rank": soak_percent_rank,
    "string_agg": soak_string_agg,
    "first_last": soak_first_last,
    "bloom_join": soak_bloom_join,
    "cms": soak_cms,
    "bucketed_quantiles": soak_bucketed_quantiles,
}


def main() -> None:
    import ray

    names = [a for a in sys.argv[1:] if a in SOAKS] or list(SOAKS)
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    results = {}
    with tempfile.TemporaryDirectory(prefix="graft_soak_") as tmp:
        for name in names:
            results[name] = SOAKS[name](tmp)
    print(json.dumps({"num_cpus": NUM_CPUS, "soaks": results}))
    ray.shutdown()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "_kill_resume_child":
        _kill_resume_child(sys.argv[2])
        sys.exit(0)
    main()
