"""Seen-set shard tests: exact vs cuckoo modes, snapshot/restore
(SURVEY.md ST3/D1)."""

import hashlib

import numpy as np
import pytest

from webscrape_neko_jirushi_ray.state.seen import CuckooFilter, ShardedSeenSet


def keys(n, tag=""):
    return [hashlib.sha1(f"{tag}{i}".encode()).digest() for i in range(n)]


def test_cuckoo_filter_no_false_negatives():
    cf = CuckooFilter(capacity=20000)
    ks = np.frombuffer(b"".join(k[:8] for k in keys(10000)), dtype=">u8").astype(np.uint64)
    cf.add_many(ks)
    assert cf.contains_many(ks).all()


def test_cuckoo_filter_low_false_positive_rate():
    cf = CuckooFilter(capacity=20000)
    ks = np.frombuffer(b"".join(k[:8] for k in keys(10000, "in")), dtype=">u8").astype(np.uint64)
    cf.add_many(ks)
    other = np.frombuffer(b"".join(k[:8] for k in keys(10000, "out")), dtype=">u8").astype(np.uint64)
    fp = cf.contains_many(other).mean()
    assert fp < 0.01, f"false positive rate too high: {fp}"


@pytest.mark.parametrize("mode", ["exact", "cuckoo"])
def test_sharded_add_if_absent(ray_session, mode):
    seen = ShardedSeenSet(num_shards=3, mode=mode, capacity_per_shard=100_000)
    try:
        ks = keys(500)
        fresh = seen.add_if_absent(ks)
        assert fresh.all()
        again = seen.add_if_absent(ks)
        assert not again.any()
        # mixed batch
        mixed = ks[:100] + keys(100, "new")
        mask = seen.add_if_absent(mixed)
        assert not mask[:100].any()
        assert mask[100:].all()
        assert seen.size() >= 600 if mode == "exact" else True
    finally:
        seen.shutdown()


def test_snapshot_restore_roundtrip(ray_session, tmp_path):
    seen = ShardedSeenSet(num_shards=2, mode="exact")
    ks = keys(300)
    try:
        seen.add_if_absent(ks)
        seen.snapshot(str(tmp_path / "snap"))
    finally:
        seen.shutdown()
    seen2 = ShardedSeenSet(num_shards=2, mode="exact")
    try:
        seen2.restore(str(tmp_path / "snap"))
        assert seen2.contains(ks).all()
        assert not seen2.add_if_absent(ks).any()
    finally:
        seen2.shutdown()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.lists(st.binary(min_size=20, max_size=20), min_size=1, max_size=200))
def test_cuckoo_property_no_false_negatives(keys_list):
    cf = CuckooFilter(capacity=4096)
    ks = np.frombuffer(
        b"".join(k[:8] for k in keys_list), dtype=">u8"
    ).astype(np.uint64)
    cf.add_many(ks)
    assert cf.contains_many(ks).all()


def test_cuckoo_fingerprint_independent_of_shard_routing():
    """Regression: fingerprints must not reuse the routing bits. Keys that
    all land in one shard (same u64 residue) must still span the full
    16-bit fingerprint space — before the mix, low log2(K) bits were
    constant per shard, collapsing entropy K-fold."""
    import numpy as np

    from webscrape_neko_jirushi_ray.state.seen import CuckooFilter

    # 100k keys, all routed to shard 3 of 16 (u64 % 16 == 3)
    keys = (np.arange(100_000, dtype=np.uint64) * np.uint64(16)) + np.uint64(3)
    fp = CuckooFilter._fingerprint(keys)
    # full 16-bit space: expect ~51k distinct; pre-fix ceiling was 4096
    assert len(np.unique(fp)) > 20_000


@pytest.mark.parametrize("mode", ["exact", "cuckoo"])
def test_add_if_absent_epoch_retry_idempotent(ray_session, mode):
    """ADVICE r2: a Ray task retried after its add_if_absent RPC committed
    must see its own insertions as fresh (same epoch), while later epochs
    still see them as seen — no URL loss under fault-tolerance retries, no
    re-discovery leak across rounds."""
    seen = ShardedSeenSet(num_shards=3, mode=mode, capacity_per_shard=100_000)
    try:
        ks = keys(400, "e")
        first = seen.add_if_absent(ks, epoch=1)
        assert first.all()
        retry = seen.add_if_absent(ks, epoch=1)  # simulated task retry
        assert retry.all(), "same-epoch retry must re-report fresh"
        later = seen.add_if_absent(ks, epoch=2)  # next round re-discovery
        assert not later.any(), "freshness must not leak across epochs"
        # a ONE-round-old replay (Ray lineage reconstruction of the prior
        # round's blocks) must reproduce its original answers exactly —
        # the previous epoch's state is retained
        stale = seen.add_if_absent(ks[:50], epoch=1)
        assert stale.all(), "one-round-old replay must reproduce answers"
        fresh2 = seen.add_if_absent(keys(50, "zz-"), epoch=2)
        assert fresh2.all()
        retry2 = seen.add_if_absent(keys(50, "zz-"), epoch=2)
        assert retry2.all(), "prior-epoch replay must not clear the live set"
        # two-or-more rounds back the window is gone: loud failure, not
        # silent row loss
        seen.add_if_absent(keys(5, "e3-"), epoch=3)
        with pytest.raises(Exception, match="expired"):
            seen.add_if_absent(ks[:5], epoch=1)
        # epoch=None keeps the classic exactly-once contract
        ks3 = keys(50, "qq-")
        assert seen.add_if_absent(ks3).all()
        assert not seen.add_if_absent(ks3).any()
    finally:
        seen.shutdown()


def test_cuckoo_snapshot_fp_scheme_guard(ray_session, tmp_path):
    """ADVICE r2: restoring a cuckoo snapshot written under a different
    fingerprint scheme must fail loudly, never silently void membership."""
    import pyarrow.parquet as _pq
    import pyarrow as _pa

    seen = ShardedSeenSet(num_shards=1, mode="cuckoo", capacity_per_shard=10_000)
    try:
        seen.add_if_absent(keys(100, "fp"))
        snap = str(tmp_path / "snap")
        seen.snapshot(snap)
    finally:
        seen.shutdown()
    path = snap + "/seen_shard_0000.parquet"
    t = _pq.read_table(path)
    meta = dict(t.schema.metadata)
    assert meta[b"fp_scheme"]  # tagged on write
    # roundtrip under the same scheme works
    seen2 = ShardedSeenSet(num_shards=1, mode="cuckoo", capacity_per_shard=10_000)
    try:
        seen2.restore(snap)
        assert seen2.contains(keys(100, "fp")).all()
    finally:
        seen2.shutdown()
    # forge an old/other scheme -> restore must raise
    meta[b"fp_scheme"] = b"legacy-v1"
    _pq.write_table(t.replace_schema_metadata(meta), path)
    seen3 = ShardedSeenSet(num_shards=1, mode="cuckoo", capacity_per_shard=10_000)
    try:
        with pytest.raises(Exception) as ei:
            seen3.restore(snap)
        assert "fingerprint scheme" in str(ei.value)
    finally:
        seen3.shutdown()


def test_u64_path_interleaves_with_bytes_path(ray_session):
    """Cuckoo fast path: sha1_col_to_u64 equals the per-key uint64, the
    u64 RPC routes identically to the bytes RPC (same shard sees the same
    key either way), and epoch freshness carries across the two paths."""
    import pyarrow as pa

    from webscrape_neko_jirushi_ray.functions.urlkit import sha1_col_to_u64

    ks = keys(400, "u64")
    col = pa.array(ks, type=pa.binary())
    u = sha1_col_to_u64(col)
    want = np.array(
        [int.from_bytes(k[:8], "big") for k in ks], dtype=np.uint64
    )
    assert (u == want).all()

    seen = ShardedSeenSet(num_shards=3, mode="cuckoo", capacity_per_shard=100_000)
    try:
        fresh = seen.add_if_absent_u64(u[:200], epoch=1)
        assert fresh.all()
        # same keys via the BYTES path: already present
        assert not seen.add_if_absent(ks[:200]).any()
        # epoch retry-idempotence holds on the u64 path
        assert seen.add_if_absent_u64(u[:200], epoch=1).all()
        assert not seen.add_if_absent_u64(u[:200], epoch=2).any()
        # mixed: bytes-inserted keys read as present via u64
        assert seen.add_if_absent(ks[200:]).all()
        assert not seen.add_if_absent_u64(u[200:]).any()
    finally:
        seen.shutdown()


@pytest.mark.parametrize("mode", ["exact", "cuckoo"])
def test_claim_resolve_min_dedup_antijoin(ray_session, mode):
    """The claim/resolve protocol fuses keep-first dedup with the seen
    anti-join: survivor = the min-order row per key NOT seen in a prior
    epoch; claim is retry-idempotent (commutative min), resolve is pure."""
    from webscrape_neko_jirushi_ray.functions.urlkit import sha1_col_to_u64
    import pyarrow as pa

    seen = ShardedSeenSet(num_shards=3, mode=mode, capacity_per_shard=100_000)

    def _claim(ks, seqs, epoch):
        s = np.asarray(seqs, dtype=np.int64)
        if mode == "cuckoo":
            seen.claim_min_u64(sha1_col_to_u64(pa.array(ks, pa.binary())), s, epoch)
        else:
            seen.claim_min(ks, s, epoch)

    def _resolve(ks, seqs, epoch):
        s = np.asarray(seqs, dtype=np.int64)
        if mode == "cuckoo":
            return seen.resolve_min_u64(
                sha1_col_to_u64(pa.array(ks, pa.binary())), s, epoch
            )
        return seen.resolve_min(ks, s, epoch)

    try:
        ks = keys(6, "cr")
        # pre-seed ks[0] in an earlier epoch: it must NOT survive later
        assert seen.add_if_absent([ks[0]], epoch=0).all()

        # epoch 1: ks[1] claimed twice (two tasks, orders 10 and 7 — min
        # wins); ks[0] re-discovered; ks[2..4] singles
        batch1 = ([ks[0], ks[1], ks[2]], [5, 10, 20])
        batch2 = ([ks[1], ks[3], ks[4]], [7, 30, 40])
        _claim(*batch1, 1)
        _claim(*batch2, 1)
        _claim(*batch2, 1)  # task retry: same claim, same state
        m1 = _resolve(*batch1, 1)
        m2 = _resolve(*batch2, 1)
        assert m1.tolist() == [False, False, True]  # ks[0] pre-seen; 10 lost to 7
        assert m2.tolist() == [True, True, True]
        # resolve retry is pure — same masks
        assert _resolve(*batch2, 1).tolist() == [True, True, True]

        # epoch 2: everything claimed in epoch 1 is now "seen before"
        _claim([ks[1], ks[5]], [100, 101], 2)
        m3 = _resolve([ks[1], ks[5]], [100, 101], 2)
        assert m3.tolist() == [False, True]
    finally:
        seen.shutdown()
