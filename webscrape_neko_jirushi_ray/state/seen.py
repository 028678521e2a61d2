"""Sharded URL-seen set: the Ray rebuild of the reference's in-memory
``scraped_cats`` / ``discovered_urls`` sets persisted to JSON
(comprehensive_scraper.py:62-96,144-146,258; smart_cat_discovery.py:40-71).

North-star structure: K shard actors, each holding either an exact Python
set (fixture/golden mode) or a cuckoo filter (scale mode), keyed by
``sha1(canonicalize(url))``. Routing is ``uint64(sha1[:8]) % K`` — stable
across processes. The batch RPC ``add_if_absent`` is the crawl loop's
anti-join against the seen set (J1): one round-trip per (shard, round), not
per URL.

Sizing (SURVEY.md §4): a cuckoo shard at 16 bits/key ≈ 1.3 GB per 10^9
keys; 16 shards cover a 10^10-URL frontier with FP ≲ 1e-6 per lookup at
~0.95 load. Snapshots are Parquet (exact mode: the key bytes; cuckoo mode:
the fingerprint table), written atomically next to the round manifest so
resume never double-fetches (checkpoint.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.urlkit import shard_of_keys

# Version tag of CuckooFilter._fingerprint's key→fp mapping, persisted in
# every cuckoo snapshot and checked on restore (a scheme change otherwise
# silently voids all persisted membership). Bump when _fingerprint changes.
FP_SCHEME = "mix48-v2"


class CuckooFilter:
    """Minimal numpy cuckoo filter: 16-bit fingerprints, 4 slots/bucket.

    Deterministic (seeded bucket hashing, fixed eviction walk). ``add``
    returns False only on table-full (caller should size capacity with
    ~1.25x headroom). Supports save/load as a flat uint16 array.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = max(1, 1 << int(np.ceil(np.log2(max(1, capacity) / self.SLOTS))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self._rng = np.random.default_rng(0xC0FFEE)

    @staticmethod
    def _fingerprint(keys: np.ndarray) -> np.ndarray:
        # Rehash before taking fingerprint bits: shard routing upstream is
        # u64 % num_shards over the SAME u64, so raw low bits would be
        # partially constant within a shard (effective entropy 16-log2(K)
        # bits -> FP rate ~K x the design 1e-6). The multiplicative mix
        # makes the 16 fingerprint bits independent of the routing bits.
        mixed = (keys * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)
        fp = mixed.astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _index(self, keys: np.ndarray) -> np.ndarray:
        return ((keys >> np.uint64(16)) % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # standard partial-key cuckoo: alt = idx XOR hash(fp)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.n_buckets)
        return (idx.astype(np.uint64) ^ h).astype(np.int64) % self.n_buckets

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        fp = self._fingerprint(keys)
        i1 = self._index(keys)
        i2 = self._alt_index(i1, fp)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def _insert_one(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return True
        # evict deterministically
        cur_idx, cur_fp = idx, fp
        for kick in range(self.MAX_KICKS):
            slot = kick % self.SLOTS
            victim = int(self.table[cur_idx, slot])
            self.table[cur_idx, slot] = cur_fp
            cur_fp = victim
            cur_idx = int(
                self._alt_index(np.array([cur_idx]), np.array([cur_fp], dtype=np.uint16))[0]
            )
            row = self.table[cur_idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur_fp
                return True
        return False

    def add_many(self, keys: np.ndarray) -> None:
        fp = self._fingerprint(keys)
        i1 = self._index(keys)
        i2 = self._alt_index(i1, fp)
        for k in range(len(keys)):
            # skip if present (makes add idempotent)
            if (self.table[i1[k]] == fp[k]).any() or (self.table[i2[k]] == fp[k]).any():
                continue
            if not self._insert_one(int(i1[k]), int(fp[k])):
                raise RuntimeError("cuckoo filter full — size capacity with headroom")


def _keys_to_u64(keys: list[bytes]) -> np.ndarray:
    if not keys:
        return np.empty(0, dtype=np.uint64)
    return np.frombuffer(b"".join(k[:8] for k in keys), dtype=">u8").astype(np.uint64)


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set. ``mode`` = 'exact' | 'cuckoo'."""

    def __init__(self, shard_id: int, mode: str = "exact", capacity: int = 1_000_000):
        self.shard_id = shard_id
        self.mode = mode
        self.exact: set[bytes] = set()
        self.cuckoo = CuckooFilter(capacity) if mode == "cuckoo" else None
        # epoch-tagged fresh set for retry-safe anti-joins: keys inserted
        # during epoch e stay "fresh" (add_if_absent returns True again for
        # epoch-e calls), so a Ray task retried after its first attempt's
        # RPC committed does NOT see its own insertions as already-seen and
        # silently drop frontier URLs. Freshness is SAME-epoch only — a key
        # inserted in round r must read as seen from round r+1 on, or
        # re-discovered URLs would re-enter the frontier. Memory: one
        # round's insertions; the PREVIOUS epoch's state is RETAINED so a
        # Ray lineage reconstruction of round r's blocks while round r+1
        # is live still replays exactly (materialize() survives worker
        # loss only through re-execution — answering a one-round-old
        # epoch with empty state would silently drop frontier rows).
        # Two-or-more rounds back the window is gone: fail LOUDLY rather
        # than lose data (resume from the round checkpoint instead).
        # Callers without fault-tolerance needs pass epoch=None and get
        # the classic exactly-once semantics.
        self._fresh_epoch: int | None = None
        self._fresh: set = set()
        self._prev_epoch: int | None = None
        self._prev_fresh: set = set()
        # claim/resolve side-table: min order-key per key claimed THIS
        # epoch (see claim_min). Same lifetime/retention as _fresh.
        self._minseq: dict = {}
        self._prev_minseq: dict = {}

    def _epoch_state(self, epoch: int) -> tuple[set, dict]:
        if self._fresh_epoch is None or epoch > self._fresh_epoch:
            if self._fresh_epoch is not None and epoch == self._fresh_epoch + 1:
                # consecutive advance: current state becomes the retained
                # previous round
                self._prev_epoch = self._fresh_epoch
                self._prev_fresh = self._fresh
                self._prev_minseq = self._minseq
            else:
                self._prev_epoch = None
                self._prev_fresh = set()
                self._prev_minseq = {}
            self._fresh_epoch = epoch
            self._fresh = set()
            self._minseq = {}
            return self._fresh, self._minseq
        if epoch == self._fresh_epoch:
            return self._fresh, self._minseq
        if epoch == self._prev_epoch:
            # one-round-old replay (lineage reconstruction of the prior
            # round's blocks): answer from the retained state
            return self._prev_fresh, self._prev_minseq
        raise RuntimeError(
            f"seen-set epoch {epoch} expired (live epoch "
            f"{self._fresh_epoch}): a task replayed across more than one "
            "round boundary — its answers can no longer be reconstructed "
            "exactly; resume the crawl from the round checkpoint"
        )

    def _fresh_set(self, epoch: int) -> set:
        return self._epoch_state(epoch)[0]

    def add_if_absent(self, keys: list[bytes], epoch: int | None = None) -> np.ndarray:
        """Returns a boolean mask: True where the key was NEW (now added).
        With ``epoch``, a key this shard already inserted DURING the same
        epoch also reports True — idempotent under Ray task retries (see
        __init__). Within-epoch uniqueness of keys is the caller's job
        (the crawl pre-dedups each round by sha1)."""
        if self.mode == "exact":
            fresh_set = self._fresh_set(epoch) if epoch is not None else None
            out = np.empty(len(keys), dtype=bool)
            for i, k in enumerate(keys):
                if k in self.exact:
                    out[i] = fresh_set is not None and k in fresh_set
                else:
                    self.exact.add(k)
                    if fresh_set is not None:
                        fresh_set.add(k)
                    out[i] = True
            return out
        return self.add_if_absent_u64(_keys_to_u64(keys), epoch)

    def add_if_absent_u64(
        self, u: np.ndarray, epoch: int | None = None
    ) -> np.ndarray:
        """Cuckoo-mode fast path: keys pre-converted to ``uint64(sha1[:8])``
        (functions/urlkit.sha1_col_to_u64) — the exact value the bytes path
        derives shard-side, so semantics are identical while the RPC ships
        an 8-byte-per-key numpy array instead of a Python bytes list."""
        if self.mode != "cuckoo":
            raise ValueError("u64 path requires cuckoo mode (exact mode "
                             "keys full sha1 bytes)")
        present = self.cuckoo.contains_many(u)
        fresh = ~present
        if fresh.any():
            self.cuckoo.add_many(u[fresh])
        if epoch is not None:
            fresh_set = self._fresh_set(epoch)
            if present.any():
                hit = np.fromiter(
                    (int(x) in fresh_set for x in u[present]),
                    dtype=bool,
                    count=int(present.sum()),
                )
                fresh[np.nonzero(present)[0][hit]] = True
            fresh_set.update(int(x) for x in u[~present])
        return fresh

    # --- claim/resolve: fused keep-first dedup + anti-join ---------------
    # Two-phase, shuffle-free alternative to "hash-shuffle keep-first, then
    # add_if_absent": during a first streaming pass every task CLAIMS its
    # (key, order) pairs — the shard records the min order per key not seen
    # before this epoch — and after a barrier a second read-only RESOLVE
    # pass keeps exactly the row whose order equals the recorded min.
    # Survivor = min-order row per not-previously-seen key: the same
    # contract as the shuffle path, with zero shuffle bytes moved.
    # Retry-safe without fingerprints: claim is commutative+idempotent
    # (set-add and min), and resolve is a pure read — the winning order
    # value is unique per key (caller guarantees globally unique order
    # values, e.g. discovery_seq), so a retried task recomputes the same
    # mask. Memory: O(one epoch's new keys) on top of the base set, same
    # order as the _fresh retry window, dropped on epoch advance.

    def claim_min(self, keys: list[bytes], seqs: np.ndarray, epoch: int) -> None:
        """Exact mode: record min seq per claimable key (new this epoch)."""
        fresh_set, minseq = self._epoch_state(epoch)
        for k, s in zip(keys, seqs.tolist()):
            if k in self.exact and k not in fresh_set:
                continue  # seen in a prior epoch — resolves False
            self.exact.add(k)
            fresh_set.add(k)
            prev = minseq.get(k)
            if prev is None or s < prev:
                minseq[k] = s

    def resolve_min(self, keys: list[bytes], seqs: np.ndarray, epoch: int) -> np.ndarray:
        _, minseq = self._epoch_state(epoch)
        return np.fromiter(
            (minseq.get(k) == s for k, s in zip(keys, seqs.tolist())),
            dtype=bool,
            count=len(keys),
        )

    def claim_min_u64(self, u: np.ndarray, seqs: np.ndarray, epoch: int) -> None:
        """Cuckoo-mode claim: keys are uint64(sha1[:8]) (the filter's own
        key space). Vectorized local min per unique key, then dict merge."""
        fresh_set, minseq = self._epoch_state(epoch)
        if not len(u):
            return
        order = np.lexsort((seqs, u))
        uu, ss = u[order], seqs[order]
        first = np.concatenate([[True], uu[1:] != uu[:-1]])
        uniq, umin = uu[first], ss[first]
        present = self.cuckoo.contains_many(uniq)
        ins = []
        for k, s, p in zip(uniq.tolist(), umin.tolist(), present.tolist()):
            if p and k not in fresh_set:
                continue
            if not p:
                ins.append(k)
            fresh_set.add(k)
            prev = minseq.get(k)
            if prev is None or s < prev:
                minseq[k] = s
        if ins:
            self.cuckoo.add_many(np.array(ins, dtype=np.uint64))

    def resolve_min_u64(self, u: np.ndarray, seqs: np.ndarray, epoch: int) -> np.ndarray:
        _, minseq = self._epoch_state(epoch)
        return np.fromiter(
            (minseq.get(k) == s for k, s in zip(u.tolist(), seqs.tolist())),
            dtype=bool,
            count=len(u),
        )

    def contains(self, keys: list[bytes]) -> np.ndarray:
        if self.mode == "exact":
            return np.array([k in self.exact for k in keys], dtype=bool)
        return self.cuckoo.contains_many(_keys_to_u64(keys))

    def size(self) -> int:
        if self.mode == "exact":
            return len(self.exact)
        return int((self.cuckoo.table != 0).sum())

    def snapshot(self, path: str) -> str:
        """Atomic Parquet snapshot (tmp + rename)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        if self.mode == "exact":
            tbl = pa.table({"key": pa.array(sorted(self.exact), type=pa.binary())})
        else:
            tbl = pa.table(
                {"fp": pa.array(self.cuckoo.table.ravel(), type=pa.uint16())},
                metadata={
                    b"n_buckets": str(self.cuckoo.n_buckets).encode(),
                    b"fp_scheme": FP_SCHEME.encode(),
                },
            )
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        tbl = pq.read_table(path)
        if self.mode == "exact":
            self.exact = set(tbl["key"].to_pylist())
            return len(self.exact)
        # fingerprint-scheme guard: a snapshot written under a different
        # _fingerprint() would reload a table whose stored fp values no
        # longer match any live key's probe — every prior membership
        # silently lost and the resumed crawl re-fetches everything. Fail
        # loudly instead (snapshots before the scheme tag existed raise
        # too: they predate the round-2 fp remix).
        scheme = (tbl.schema.metadata or {}).get(b"fp_scheme", b"").decode()
        if scheme != FP_SCHEME:
            raise ValueError(
                f"cuckoo snapshot {path} uses fingerprint scheme "
                f"{scheme or '<untagged>'!r}, this build uses {FP_SCHEME!r} — "
                "membership would be silently lost; rebuild the seen set "
                "from the crawl output instead of restoring"
            )
        n_buckets = int(tbl.schema.metadata[b"n_buckets"])
        flat = np.asarray(tbl["fp"].to_numpy(zero_copy_only=False), dtype=np.uint16)
        self.cuckoo.n_buckets = n_buckets
        self.cuckoo.table = flat.reshape(n_buckets, CuckooFilter.SLOTS).copy()
        return self.size()


class ShardedSeenSet:
    """Driver-side handle over K SeenShard actors."""

    def __init__(self, num_shards: int = 4, mode: str = "exact",
                 capacity_per_shard: int = 1_000_000):
        self.num_shards = num_shards
        self.mode = mode
        self.shards = [
            SeenShard.remote(i, mode, capacity_per_shard) for i in range(num_shards)
        ]

    def _route(self, keys: list[bytes]) -> tuple[list[list[bytes]], list[list[int]]]:
        shard_ids = shard_of_keys(keys, self.num_shards)
        # vectorized routing: stable argsort by shard + boundary slices
        order = np.argsort(shard_ids, kind="stable")
        bounds = np.searchsorted(shard_ids[order], np.arange(self.num_shards + 1))
        per_shard_keys: list[list[bytes]] = []
        per_shard_pos: list[list[int]] = []
        for s in range(self.num_shards):
            idx = order[bounds[s] : bounds[s + 1]]
            per_shard_pos.append(idx.tolist())
            per_shard_keys.append([keys[i] for i in idx])
        return per_shard_keys, per_shard_pos

    def add_if_absent(self, keys: list[bytes], epoch: int | None = None) -> np.ndarray:
        """Batched cross-shard membership-and-add; one RPC per shard.
        ``epoch`` makes the add retry-idempotent (see SeenShard)."""
        out = np.zeros(len(keys), dtype=bool)
        if not keys:
            return out
        per_keys, per_pos = self._route(keys)
        refs = [
            self.shards[s].add_if_absent.remote(per_keys[s], epoch)
            for s in range(self.num_shards)
            if per_keys[s]
        ]
        live = [s for s in range(self.num_shards) if per_keys[s]]
        for s, mask in zip(live, ray.get(refs)):
            out[np.array(per_pos[s], dtype=np.int64)] = mask
        return out

    def add_if_absent_u64(
        self, u: np.ndarray, epoch: int | None = None
    ) -> np.ndarray:
        """Batched u64 fast path (cuckoo mode only): numpy routing, one
        numpy-array RPC per shard. Routing is ``u % K`` — the same value
        ``shard_of_keys`` computes from the sha1 bytes, so bytes-path and
        u64-path callers interleave safely on one seen set."""
        out = np.zeros(len(u), dtype=bool)
        if not len(u):
            return out
        shard_ids = (u % np.uint64(self.num_shards)).astype(np.int64)
        order = np.argsort(shard_ids, kind="stable")
        bounds = np.searchsorted(shard_ids[order], np.arange(self.num_shards + 1))
        refs, slices = [], []
        for s in range(self.num_shards):
            idx = order[bounds[s] : bounds[s + 1]]
            if len(idx):
                refs.append(self.shards[s].add_if_absent_u64.remote(u[idx], epoch))
                slices.append(idx)
        for idx, mask in zip(slices, ray.get(refs)):
            out[idx] = mask
        return out

    def _route_u64(self, u: np.ndarray):
        shard_ids = (u % np.uint64(self.num_shards)).astype(np.int64)
        order = np.argsort(shard_ids, kind="stable")
        bounds = np.searchsorted(shard_ids[order], np.arange(self.num_shards + 1))
        return order, bounds

    def claim_min(self, keys: list[bytes], seqs: np.ndarray, epoch: int) -> None:
        """Batched claim pass (see SeenShard.claim_min) — blocks until every
        shard has committed (the caller's task-completion barrier)."""
        if not keys:
            return
        per_keys, per_pos = self._route(keys)
        refs = [
            self.shards[s].claim_min.remote(
                per_keys[s], seqs[np.array(per_pos[s], dtype=np.int64)], epoch
            )
            for s in range(self.num_shards)
            if per_keys[s]
        ]
        ray.get(refs)

    def resolve_min(self, keys: list[bytes], seqs: np.ndarray, epoch: int) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        if not keys:
            return out
        per_keys, per_pos = self._route(keys)
        refs, live = [], []
        for s in range(self.num_shards):
            if per_keys[s]:
                refs.append(
                    self.shards[s].resolve_min.remote(
                        per_keys[s], seqs[np.array(per_pos[s], dtype=np.int64)], epoch
                    )
                )
                live.append(s)
        for s, mask in zip(live, ray.get(refs)):
            out[np.array(per_pos[s], dtype=np.int64)] = mask
        return out

    def claim_min_u64(self, u: np.ndarray, seqs: np.ndarray, epoch: int) -> None:
        if not len(u):
            return
        order, bounds = self._route_u64(u)
        refs = []
        for s in range(self.num_shards):
            idx = order[bounds[s] : bounds[s + 1]]
            if len(idx):
                refs.append(
                    self.shards[s].claim_min_u64.remote(u[idx], seqs[idx], epoch)
                )
        ray.get(refs)

    def resolve_min_u64(self, u: np.ndarray, seqs: np.ndarray, epoch: int) -> np.ndarray:
        out = np.zeros(len(u), dtype=bool)
        if not len(u):
            return out
        order, bounds = self._route_u64(u)
        refs, slices = [], []
        for s in range(self.num_shards):
            idx = order[bounds[s] : bounds[s + 1]]
            if len(idx):
                refs.append(
                    self.shards[s].resolve_min_u64.remote(u[idx], seqs[idx], epoch)
                )
                slices.append(idx)
        for idx, mask in zip(slices, ray.get(refs)):
            out[idx] = mask
        return out

    def contains(self, keys: list[bytes]) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        if not keys:
            return out
        per_keys, per_pos = self._route(keys)
        refs = [
            self.shards[s].contains.remote(per_keys[s])
            for s in range(self.num_shards)
            if per_keys[s]
        ]
        live = [s for s in range(self.num_shards) if per_keys[s]]
        for s, mask in zip(live, ray.get(refs)):
            out[np.array(per_pos[s], dtype=np.int64)] = mask
        return out

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self, snap_dir: str) -> list[str]:
        return ray.get(
            [
                s.snapshot.remote(os.path.join(snap_dir, f"seen_shard_{i:04d}.parquet"))
                for i, s in enumerate(self.shards)
            ]
        )

    def restore(self, snap_dir: str) -> int:
        ray.get(
            [
                s.restore.remote(os.path.join(snap_dir, f"seen_shard_{i:04d}.parquet"))
                for i, s in enumerate(self.shards)
            ]
        )
        return self.size()

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
