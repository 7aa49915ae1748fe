"""Maintenance writer lease (round-11 verdict task 2): two concurrent
maintenance writers on one index root must not interleave the
stage/rename protocol — the loser aborts LOUDLY before mutating, and an
ingest writer refuses new batches while maintenance holds the lease.
"""

import json
import time

import pytest
from pyspark.sql import functions as F

from qafs_spark.pipeline.lease import (
    LeaseHeldError,
    MaintenanceLease,
    refuse_if_held,
)


# -- protocol unit tests -----------------------------------------------------


def test_lease_acquire_excludes_second_writer(spark, tmp_path):
    root = str(tmp_path / "ix")
    a = MaintenanceLease(spark, root, op="compact")
    a.acquire()
    b = MaintenanceLease(spark, root, op="rebuild")
    with pytest.raises(LeaseHeldError, match="op=compact"):
        b.acquire()
    assert b.held_by_other()["owner"] == a.owner
    assert a.release() is True
    # freed: b can now acquire, and a's probe sees b
    b.acquire()
    assert a.held_by_other()["owner"] == b.owner
    b.release()


def test_lease_context_manager_releases_on_error(spark, tmp_path):
    root = str(tmp_path / "ix")
    with pytest.raises(RuntimeError, match="boom"):
        with MaintenanceLease(spark, root, op="compact"):
            raise RuntimeError("boom")
    # released despite the exception
    MaintenanceLease(spark, root, op="rebuild").acquire().release()


def test_lease_expiry_takeover_and_stale_release(spark, tmp_path):
    """A crashed holder's expired lease is taken over via
    rename-then-create; the crashed holder's release() is then a no-op
    (it must NOT delete the new holder's lease)."""
    root = str(tmp_path / "ix")
    dead = MaintenanceLease(spark, root, op="compact", ttl_sec=0.05)
    dead.acquire()
    time.sleep(0.1)  # lease expires; holder "crashed" (no release)
    taker = MaintenanceLease(spark, root, op="rebuild")
    taker.acquire()  # takeover succeeds
    assert taker.current()["owner"] == taker.owner
    # the dead writer coming back must not free the taker's lease
    assert dead.release() is False
    assert taker.current()["owner"] == taker.owner
    # and a third writer still sees the taker's live lease
    with pytest.raises(LeaseHeldError):
        MaintenanceLease(spark, root, op="scrub").acquire()
    taker.release()


def test_lease_corrupt_file_is_takeover_not_brick(spark, tmp_path):
    """A corrupt/garbage lease file parses as no-lease and is taken over
    through the same rename-then-create path — corruption can't brick
    the index's maintenance forever."""
    root = tmp_path / "ix"
    root.mkdir()
    (root / "_maintenance_lease").write_text("not json{{{")
    lease = MaintenanceLease(spark, str(root), op="compact")
    lease.acquire()
    assert json.loads(
        (root / "_maintenance_lease").read_text()
    )["owner"] == lease.owner
    lease.release()


def test_force_release_breaks_glass_and_ttl_tiers(spark, tmp_path):
    """force_release deletes a live lease unconditionally (the operator's
    break-glass for a known-dead holder before TTL expiry) and returns
    the held record; the maintenance decorator defaults to the 6h
    REWRITE TTL (full dataset rewrites run hours at scale and have no
    renewal thread)."""
    import inspect

    from qafs_spark.pipeline.lease import (
        DEFAULT_REWRITE_TTL_SEC,
        force_release,
        maintenance_op,
    )

    root = str(tmp_path / "ix")
    assert force_release(spark, root) is None  # nothing held: no-op
    holder = MaintenanceLease(spark, root, op="compact")
    holder.acquire()
    rec = force_release(spark, root)
    assert rec and rec["owner"] == holder.owner and rec["op"] == "compact"
    # glass broken: a new writer acquires immediately, no TTL wait
    MaintenanceLease(spark, root, op="rebuild").acquire().release()
    # the stale holder's release is a clean no-op
    assert holder.release() is False
    assert inspect.signature(maintenance_op).parameters[
        "ttl_sec"
    ].default == DEFAULT_REWRITE_TTL_SEC == 6 * 3600.0


def test_refuse_if_held_probe(spark, tmp_path):
    root = str(tmp_path / "ix")
    refuse_if_held(spark, root, "apply_batch")  # no lease: no-op
    holder = MaintenanceLease(spark, root, op="compact")
    holder.acquire()
    with pytest.raises(LeaseHeldError, match="apply_batch refused"):
        refuse_if_held(spark, root, "apply_batch")
    holder.release()
    refuse_if_held(spark, root, "apply_batch")  # freed again


# -- index integration -------------------------------------------------------


@pytest.fixture
def small_vec_index(spark, tmp_path):
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx = CellVectorIndex(spark, str(tmp_path / "vx"), nlist=4)
    assert idx.apply_batch(df.filter(F.col("vec_id") % 2 == 0), 0, threshold=0.3)
    return idx, df


def test_two_maintenance_writers_loser_aborts_before_mutation(
    spark, small_vec_index
):
    """The injected race: writer A (simulated by an externally held
    lease) is mid-maintenance when writer B calls compact()/retrain().
    B must abort with LeaseHeldError and leave EVERY dataset byte-alone —
    pairs, vectors listing, watermark."""
    idx, df = small_vec_index
    from qafs_spark import storage as fs_storage

    pairs_before = sorted(map(tuple, idx.pairs().collect()))
    sig_before = fs_storage.dir_signature(spark, idx.vectors_path)
    wm_before = idx._compacted_through()

    a = MaintenanceLease(spark, idx.root, op="compact")
    a.acquire()
    with pytest.raises(LeaseHeldError):
        idx.compact()
    with pytest.raises(LeaseHeldError):
        idx.retrain()
    with pytest.raises(LeaseHeldError):
        idx.compact_pairs()
    with pytest.raises(LeaseHeldError):
        idx.scrub_pairs([0])
    # ingest writers also refuse while maintenance holds the lease
    with pytest.raises(LeaseHeldError):
        idx.apply_batch(df.filter(F.col("vec_id") % 2 == 1), 1, threshold=0.3)
    with pytest.raises(LeaseHeldError):
        idx.delete_ids([2])
    # nothing mutated
    assert sorted(map(tuple, idx.pairs().collect())) == pairs_before
    assert fs_storage.dir_signature(spark, idx.vectors_path) == sig_before
    assert idx._compacted_through() == wm_before
    a.release()
    # lease freed: the same ops now run (and release the lease after)
    assert idx.apply_batch(
        df.filter(F.col("vec_id") % 2 == 1), 1, threshold=0.3
    )
    assert idx.compact() >= 0
    assert idx.compact() == 0 or True  # idempotent follow-up allowed
    refuse_if_held(spark, idx.root, "apply_batch")  # no lease left behind


def test_crashed_maintenance_writer_lease_expires_and_successor_runs(
    spark, small_vec_index
):
    """Crash injection: the maintenance holder dies without release().
    Until expiry every writer refuses; after expiry the successor's
    compact() takes the lease over and completes, and the exactly-once
    invariants (applied set, pair rows) hold."""
    idx, df = small_vec_index
    crashed = MaintenanceLease(spark, idx.root, op="compact", ttl_sec=0.2)
    crashed.acquire()
    with pytest.raises(LeaseHeldError):
        idx.apply_batch(df.filter(F.col("vec_id") % 2 == 1), 1, threshold=0.3)
    time.sleep(0.3)
    # expired: ingest proceeds (held_by_other ignores expired leases)
    assert idx.apply_batch(
        df.filter(F.col("vec_id") % 2 == 1), 1, threshold=0.3
    )
    pairs_before = sorted(map(tuple, idx.pairs().collect()))
    # successor maintenance takes the expired lease over and completes
    assert idx.compact() >= 0
    assert idx.batch_applied(0) and idx.batch_applied(1)
    assert sorted(map(tuple, idx.pairs().collect())) == pairs_before
    refuse_if_held(spark, idx.root, "apply_batch")  # released after compact


def test_banded_and_text_index_maintenance_is_leased(spark, tmp_path):
    """The banded MinHash and inverted BM25 indexes honor the same lease
    on their mutators."""
    from qafs_spark.pipeline.banded_index import BandedMinHashIndex
    from qafs_spark.pipeline.text_index import InvertedIndex

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} common tail words") for i in range(12)],
        ["doc_id", "text"],
    )
    bix = BandedMinHashIndex(
        spark, str(tmp_path / "bx"), n=2, num_hashes=16, num_bands=8,
        num_partitions=4,
    )
    assert bix.apply_batch(docs, 0, threshold=0.2)
    tix = InvertedIndex(spark, str(tmp_path / "tx"), num_partitions=4)
    assert tix.apply_batch(docs, 0)

    for ix, ops in (
        (bix, [lambda: bix.compact(), lambda: bix.compact_pairs(),
               lambda: bix.scrub_pairs([0]),
               lambda: bix.apply_batch(docs, 1), lambda: bix.delete_ids([1])]),
        (tix, [lambda: tix.compact(), lambda: tix.rebuild(8),
               lambda: tix.apply_batch(docs, 1), lambda: tix.delete_ids([1])]),
    ):
        held = MaintenanceLease(spark, ix.root, op="test")
        held.acquire()
        for op in ops:
            with pytest.raises(LeaseHeldError):
                op()
        held.release()
    # freed: one mutator per index runs and releases cleanly
    assert bix.compact() >= 0
    assert tix.compact() >= 0
    refuse_if_held(spark, bix.root, "apply_batch")
    refuse_if_held(spark, tix.root, "apply_batch")


# -- round 12: release TOCTOU, renew, commit-time fence ----------------------


def test_release_toctou_restores_takeover_lease(spark, tmp_path):
    """The r11-verdict nit: a takeover landing BETWEEN release's
    ownership read and its delete must not lose the new holder's lease.
    Injected by wrapping the holder's current() so the takeover fires
    right after the read; the rename-aside release then sees the foreign
    token and renames the taker's lease back untouched."""
    root = str(tmp_path / "ix")
    dead = MaintenanceLease(spark, root, op="compact", ttl_sec=0.05)
    dead.acquire()
    time.sleep(0.1)  # expired; holder is slow, not crashed
    taker = MaintenanceLease(spark, root, op="rebuild")
    orig = dead.current
    fired = {}

    def race_current():
        rec = orig()
        if not fired:
            fired["x"] = True
            taker.acquire()  # expiry takeover inside the TOCTOU window
        return rec

    dead.current = race_current
    assert dead.release() is False  # lost — and deleted NOTHING
    assert taker.current()["owner"] == taker.owner  # taker's lease intact
    assert taker.release() is True


def test_renew_extends_live_holder(spark, tmp_path):
    root = str(tmp_path / "ix")
    a = MaintenanceLease(spark, root, op="compact", ttl_sec=30.0)
    a.acquire()
    before = float(a.current()["expires_at"])
    a.renew(ttl_sec=3600.0)
    after = float(a.current()["expires_at"])
    assert after > before + 1000  # fresh, longer TTL from now
    assert a.current()["owner"] == a.owner
    # still excludes other writers, and release still works
    with pytest.raises(LeaseHeldError):
        MaintenanceLease(spark, root, op="rebuild").acquire()
    assert a.release() is True


def test_renew_after_takeover_raises_and_preserves_new_holder(spark, tmp_path):
    """A holder that outlived its TTL and lost the lease must get
    LeaseHeldError from renew() — BEFORE mutating anything — and the new
    holder's lease must survive the attempt."""
    root = str(tmp_path / "ix")
    slow = MaintenanceLease(spark, root, op="compact", ttl_sec=0.05)
    slow.acquire()
    time.sleep(0.1)
    taker = MaintenanceLease(spark, root, op="rebuild")
    taker.acquire()
    with pytest.raises(LeaseHeldError, match="lost to expiry takeover"):
        slow.renew()
    assert taker.current()["owner"] == taker.owner
    assert taker.release() is True


def test_fence_token_changes_on_every_acquire(spark, tmp_path):
    from qafs_spark.pipeline.lease import fence_token, verify_commit_fence

    root = str(tmp_path / "ix")
    assert fence_token(spark, root) is None  # no maintenance ever
    verify_commit_fence(spark, root, None, "apply_batch")  # passes
    a = MaintenanceLease(spark, root, op="compact")
    a.acquire()
    t1 = fence_token(spark, root)
    assert t1 is not None
    a.release()
    assert fence_token(spark, root) == t1  # release does not bump
    verify_commit_fence(spark, root, t1, "apply_batch")  # same window: ok
    b = MaintenanceLease(spark, root, op="rebuild")
    b.acquire()
    b.release()
    t2 = fence_token(spark, root)
    assert t2 is not None and t2 != t1
    # a batch that started under t1 must abort even though no lease is
    # live any more — the window opened and closed mid-batch
    with pytest.raises(LeaseHeldError, match="fence"):
        verify_commit_fence(spark, root, t1, "apply_batch")


def test_apply_batch_aborts_at_commit_on_midflight_maintenance(
    spark, small_vec_index
):
    """Round-12 verdict task 3: a batch already mid-flight when
    maintenance acquires must abort AT COMMIT (not land its applied-log
    entry), stay unapplied, and replay cleanly afterwards. The
    mid-flight acquire is injected by wrapping dedup_batch — entry
    probes have already passed by the time it runs. The maintenance
    writer even RELEASES before the commit check, proving the fence
    catches the opened-and-closed-mid-batch schedule a point probe
    misses."""
    idx, df = small_vec_index
    batch = df.filter(F.col("vec_id") % 2 == 1)
    orig = idx.dedup_batch
    fired = {}

    def midflight(*args, **kwargs):
        out = orig(*args, **kwargs)
        if not fired:
            fired["x"] = True
            m = MaintenanceLease(spark, idx.root, op="compact")
            m.acquire()
            m.release()  # opened AND closed while the batch is in flight
        return out

    idx.dedup_batch = midflight
    with pytest.raises(LeaseHeldError, match="aborted at commit"):
        idx.apply_batch(batch, 1, threshold=0.3)
    idx.dedup_batch = orig
    # not applied: the log append never ran (fresh instance re-reads FS)
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    fresh = CellVectorIndex(spark, idx.root, nlist=4)
    assert not fresh.batch_applied(1)
    # replay after maintenance: byte-identical recommit succeeds
    assert fresh.apply_batch(batch, 1, threshold=0.3)
    assert fresh.batch_applied(1)
    refuse_if_held(spark, idx.root, "apply_batch")


def test_shared_block_artifacts_reclaimed_per_batch(spark, small_vec_index):
    """Round-12 ADVICE fix: the blocked scorer's b-side artifacts are
    removed deterministically by unpersist_intermediates (apply_batch's
    finally), so a long-running streaming ingest holds at most one
    batch's blocks instead of accumulating one Python broadcast per
    micro-batch."""
    import os

    idx, df = small_vec_index
    assert idx._shared_blocks == []  # apply_batch reclaimed its own
    pairs, _ = idx.dedup_batch(
        df.filter(F.col("vec_id") % 2 == 1), threshold=0.3,
    )
    assert len(idx._shared_blocks) == 1
    h = idx._shared_blocks[0]
    stage_files = [
        os.path.join(h._stage, f) for f in h.names.values()
    ]
    for p in stage_files:
        assert os.path.exists(p)
    pairs.count()  # materialize before reclaiming
    idx.unpersist_intermediates()
    assert idx._shared_blocks == []
    for p in stage_files:
        assert not os.path.exists(p)


def test_renew_bumps_fence_so_gap_ingest_aborts_at_commit(spark, tmp_path):
    """Round-13 ADVICE fix: renew()'s rename-aside -> re-create swap
    leaves the lease path ABSENT for a moment; an ingest batch whose
    entry held-probe lands in that gap passes and captures the
    pre-renew token. renew() now bumps the fence, so such a batch
    aborts at its commit check even after maintenance releases."""
    from qafs_spark.pipeline.lease import fence_token, verify_commit_fence

    root = str(tmp_path / "ix")
    m = MaintenanceLease(spark, root, op="rebuild")
    m.acquire()
    # a batch entering during renew's lease-path gap captures this token
    t0 = fence_token(spark, root)
    assert t0 is not None
    m.renew()
    t1 = fence_token(spark, root)
    assert t1 is not None and t1 != t0  # renew bumps
    assert m.release() is True
    # maintenance is over, held-probe passes — only the token catches it
    with pytest.raises(LeaseHeldError, match="changed mid-batch"):
        verify_commit_fence(spark, root, t0, "apply_batch")
    # a batch that entered AFTER the renew commits fine
    verify_commit_fence(spark, root, t1, "apply_batch")


def test_apply_batch_entry_interleaved_acquire_aborts(spark, small_vec_index):
    """Round-13 ADVICE fix: the fence token is captured BEFORE the entry
    held-probe. An acquire+release landing between the two entry reads
    (injected by wrapping the probe) used to hand the batch the
    POST-bump token — the commit check then passed despite the batch
    running entirely inside the maintenance window. With token-first
    capture the interleaved window always reads as a token change."""
    from qafs_spark.pipeline import lease as lease_mod

    idx, df = small_vec_index
    batch = df.filter(F.col("vec_id") % 2 == 0)
    real_probe = lease_mod.refuse_if_held
    fired = {}

    def probe(spark_, root, what):
        if what == "apply_batch" and not fired:
            fired["x"] = True
            m = MaintenanceLease(spark_, root, op="compact")
            m.acquire()
            m.release()  # window opens AND closes between the two reads
        return real_probe(spark_, root, what)

    lease_mod.refuse_if_held = probe
    try:
        with pytest.raises(LeaseHeldError, match="aborted at commit"):
            idx.apply_batch(batch, 9, threshold=0.3)
    finally:
        lease_mod.refuse_if_held = real_probe
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    fresh = CellVectorIndex(spark, idx.root, nlist=4)
    assert not fresh.batch_applied(9)
    assert fresh.apply_batch(batch, 9, threshold=0.3)  # clean replay


def test_create_file_atomic_two_thread_race_single_winner(spark, tmp_path):
    """Round-13 verdict task 6: local-FS create-if-absent is a kernel
    O_CREAT|O_EXCL, so of two same-host racers EXACTLY one wins, every
    iteration. (The old Hadoop RawLocalFileSystem path is
    exists-then-open — looping this window reliably produced double
    winners.) Content integrity: the winner's payload is what is read
    back, never an interleaving of the two."""
    import threading

    from qafs_spark import storage as fs_storage

    path = str(tmp_path / "lease")
    iters = 200
    results = [[None] * iters for _ in range(2)]
    barrier = threading.Barrier(2)

    def racer(slot):
        for i in range(iters):
            barrier.wait()
            results[slot][i] = fs_storage.create_file_atomic(
                spark, path, f"writer-{slot}-iter-{i}"
            )
            barrier.wait()
            if slot == 0:  # one cleaner per iteration, after both raced
                fs_storage.delete_path(spark, path)

    threads = [threading.Thread(target=racer, args=(s,)) for s in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(iters):
        wins = int(bool(results[0][i])) + int(bool(results[1][i]))
        assert wins == 1, f"iteration {i}: {wins} winners (must be exactly 1)"


def test_create_file_atomic_basics(spark, tmp_path):
    """Create-if-absent contract on the local fast path: success writes
    the full payload readably (Hadoop-side read), a second create
    refuses, and a missing parent is created implicitly — the same
    semantics Hadoop ``FileSystem.create`` gives the non-local branch
    (round-14, after round-13 ADVICE: the broad OSError catch both
    conflated real I/O errors with 'exists' and silently diverged from
    the Hadoop branch on missing parents)."""
    from qafs_spark import storage as fs_storage

    path = str(tmp_path / "f")
    assert fs_storage.create_file_atomic(spark, path, "hello") is True
    assert fs_storage.read_small_file(spark, path) == "hello"
    assert fs_storage.create_file_atomic(spark, path, "other") is False
    assert fs_storage.read_small_file(spark, path) == "hello"
    missing = str(tmp_path / "no-such-dir" / "f")
    assert fs_storage.create_file_atomic(spark, missing, "x") is True
    assert fs_storage.read_small_file(spark, missing) == "x"
    # a real I/O failure (unwritable parent) surfaces with its cause,
    # never as a silent False ('exists')
    import os
    import pytest

    locked = tmp_path / "locked"
    locked.mkdir()
    os.chmod(locked, 0o500)
    try:
        if os.access(str(locked), os.W_OK):  # running as root: skip leg
            return
        with pytest.raises(PermissionError):
            fs_storage.create_file_atomic(
                spark, str(locked / "f"), "x"
            )
    finally:
        os.chmod(locked, 0o755)


def test_collect_blocks_chunked_equals_single_shot(spark, small_vec_index):
    """Round-13 fix (found by the dim-768 decade): the blocked scorer's
    b-side collect carries a hidden × dim factor — one-shot toPandas of
    a 233k-row batch at dim 768 breaches spark.driver.maxResultSize.
    Above COLLECT_CHUNK_BYTES the collect now runs in ascending
    partition-id groups over a persisted selection. Pinned: with the
    threshold forced to 1 byte (every group collected separately) the
    resulting pair set is BIT-IDENTICAL to the single-shot path, and
    the shared-block artifacts carry identical arrays."""
    import numpy as np

    from qafs_spark.pipeline import vector_index as vi

    idx, df = small_vec_index
    batch = df.filter(F.col("vec_id") % 2 == 1)

    def pairs_and_blocks():
        pairs, _ = idx.dedup_batch(batch, threshold=0.3)
        got = {
            (r["id_a"], r["id_b"]): r["cosine"] for r in pairs.collect()
        }
        h = idx._shared_blocks[-1]
        arrs = h.load()
        arrs = tuple(np.array(a) for a in arrs)
        idx.unpersist_intermediates()
        return got, arrs

    single, arr_s = pairs_and_blocks()
    orig = vi.COLLECT_CHUNK_BYTES
    vi.COLLECT_CHUNK_BYTES = 1
    try:
        chunked, arr_c = pairs_and_blocks()
    finally:
        vi.COLLECT_CHUNK_BYTES = orig
    assert chunked == single and len(single) > 0
    for a, b in zip(arr_s, arr_c):
        assert a.shape == b.shape
        assert np.array_equal(a, b)


def _qsblk_registry_entries(spark):
    """All added-files registry paths for shared-block artifacts —
    test-side view of the map whose snapshot rides in every task
    description (the round-12 ADVICE leak surface)."""
    from qafs_spark.pipeline.vector_index import _added_files_registry

    reg = _added_files_registry(spark.sparkContext)
    assert reg is not None, "registry must be reachable in local mode"
    found = []
    it = reg.keysIterator()
    outer = []
    while it.hasNext():
        outer.append(it.next())
    for ok in outer:
        opt = reg.get(ok)
        if not opt.isDefined():
            continue
        inner = opt.get()
        it2 = inner.keysIterator()
        while it2.hasNext():
            k = it2.next()
            if "qsblk-" in k:
                found.append(k)
    return found


def test_added_files_registry_bounded_across_batches(spark, small_vec_index):
    """Round-14 fix for the round-12 ADVICE residual: each micro-batch's
    shared-block artifacts no longer accumulate added-files registry
    entries (whose snapshot rides in EVERY task's serialized payload).
    Pinned over 6 ingest cycles: entries return to zero after each
    unpersist_intermediates, the live high-water mark is one handle's
    artifact set, and in slot mode the artifact NAME set is constant
    across batches (bounding the driver file-server map too)."""
    idx, df = small_vec_index
    assert _qsblk_registry_entries(spark) == []
    name_sets = []
    for i in range(6):
        pairs, _ = idx.dedup_batch(
            df.filter(F.col("vec_id") % 3 == i % 3), threshold=0.3,
        )
        live = _qsblk_registry_entries(spark)
        assert 0 < len(live) <= 5  # ids/vecs/norms/pos/epoch, one handle
        pairs.count()
        name_sets.append(frozenset(idx._shared_blocks[-1].names.values()))
        idx.unpersist_intermediates()
        assert _qsblk_registry_entries(spark) == []
    # local master => slot reuse active => the same names every batch
    assert len(set(name_sets)) == 1


def test_recycled_slot_load_fails_loudly(spark, small_vec_index):
    """A handle whose slot a LATER batch overwrote must fail loudly at
    load() (epoch guard), never silently serve the next batch's bytes —
    the same materialize-before-cleanup contract the uuid-named path
    enforced via missing files."""
    import pytest

    idx, df = small_vec_index
    pairs, _ = idx.dedup_batch(
        df.filter(F.col("vec_id") % 2 == 1), threshold=0.3
    )
    pairs.count()
    stale = idx._shared_blocks[-1]
    assert stale._slot_mode  # local master => slot mode
    idx.unpersist_intermediates()  # frees the slot
    pairs2, _ = idx.dedup_batch(
        df.filter(F.col("vec_id") % 3 == 0), threshold=0.3
    )
    pairs2.count()
    fresh = idx._shared_blocks[-1]
    assert fresh.names == stale.names  # slot (and names) reused
    assert fresh.epoch != stale.epoch
    fresh.load()  # live handle reads its own epoch fine
    with pytest.raises(RuntimeError, match="slot recycled"):
        stale.load()
    idx.unpersist_intermediates()


def test_collect_blocks_skewed_partition_split_by_ranges(spark, tmp_path):
    """Round-13 ADVICE: packing fetch groups from the AVERAGE rows per
    partition let one skewed cached partition exceed the byte budget in
    a single toPandas. Round 14 packs from exact per-partition counts
    and splits an oversized partition by monotonically_increasing_id
    ranges. Pinned: with everything forced into ONE partition and the
    budget forced to ~4 rows' worth, the pair set and artifact arrays
    still match the single-shot collect bit-for-bit."""
    import numpy as np

    from qafs_spark.pipeline import vector_index as vi
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).coalesce(1)
    idx = CellVectorIndex(spark, str(tmp_path / "vxskew"), nlist=2)
    assert idx.apply_batch(df.filter(F.col("vec_id") < 20), 0, threshold=0.3)
    batch = df.filter(F.col("vec_id") >= 20).coalesce(1)

    def pairs_and_blocks():
        pairs, _ = idx.dedup_batch(batch, threshold=0.3)
        got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs.collect()}
        h = idx._shared_blocks[-1]
        arrs = tuple(np.array(a) for a in h.load())
        idx.unpersist_intermediates()
        return got, arrs

    single, arr_s = pairs_and_blocks()
    orig = vi.COLLECT_CHUNK_BYTES
    vi.COLLECT_CHUNK_BYTES = 4 * (6 * 16 + 128)  # ~4 rows per fetch
    try:
        chunked, arr_c = pairs_and_blocks()
    finally:
        vi.COLLECT_CHUNK_BYTES = orig
    assert chunked == single and len(single) > 0
    for a, b in zip(arr_s, arr_c):
        assert np.array_equal(a, b)


def test_block_dtype_float32_bounded_drift(spark, tmp_path):
    """Round-14 verdict task 4: block_dtype='float32' halves the
    shared-block vecs artifact (the dim term in per-node footprint) at
    a bounded cosine drift. Pinned on a fixture whose cosines sit far
    from the threshold: identical pair SET vs the float64 parity run,
    max |cos32 - cos64| under 1e-6, the artifact really is float32 on
    disk, and the persisted parquet vectors stay float64 (serving knob,
    not an on-disk format)."""
    import numpy as np

    from qafs_spark.pipeline.vector_index import CellVectorIndex

    import random

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    seed_b = df.filter(F.col("vec_id") % 2 == 0)
    batch = df.filter(F.col("vec_id") % 2 == 1)

    def run(dtype, sub):
        idx = CellVectorIndex(
            spark, str(tmp_path / sub), nlist=4, block_dtype=dtype
        )
        assert idx.apply_batch(seed_b, 0, threshold=0.3)
        pairs, _ = idx.dedup_batch(batch, threshold=0.3)
        got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs.collect()}
        h = idx._shared_blocks[-1]
        vecs_dtype = str(np.array(h.load()[1]).dtype)
        idx.unpersist_intermediates()
        stored = spark.read.parquet(idx.vectors_path)
        assert dict(stored.dtypes)["vec"] == "array<double>"
        return got, vecs_dtype

    p64, d64 = run("float64", "v64")
    p32, d32 = run("float32", "v32")
    assert d64 == "float64" and d32 == "float32"
    assert set(p64) == set(p32) and len(p64) > 0
    drift = max(abs(p64[k] - p32[k]) for k in p64)
    assert drift < 1e-6, drift

    import pytest

    with pytest.raises(ValueError, match="block_dtype"):
        CellVectorIndex(spark, str(tmp_path / "bad"), block_dtype="f16")


def test_added_files_probe_pinned_and_loud_on_failure(spark):
    """Round 15 (verdict task 3): (a) the private-JVM-member probe the
    registry bounding rides on WORKS on the installed Spark — a Spark
    bump that breaks it fails here instead of silently re-opening the
    round-12 leak; (b) when the probe DOES fail, it warns once per
    process instead of degrading silently."""
    import pytest

    from qafs_spark.pipeline import vector_index as vi

    # (a) probe resolves on this Spark build
    assert vi._added_files_registry(spark.sparkContext) is not None
    assert vi._slot_reuse_ok(spark.sparkContext)  # local master

    # (b) loud degradation: a context whose JVM handle raises
    class _Boom:
        def __getattr__(self, _):
            raise RuntimeError("no jvm")

    vi._PROBE_WARNED = False
    with pytest.warns(UserWarning, match="addedFiles is not reachable"):
        assert vi._added_files_registry(_Boom()) is None
    # once per process: second failure is silent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert vi._added_files_registry(_Boom()) is None
    vi._PROBE_WARNED = True  # leave quiet for the rest of the session
