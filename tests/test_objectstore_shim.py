"""Drive the lease protocol and exactly-once index commits through the
object-store semantics shim (round-15 verdict task 4, carried since 11).

The sandbox has no cloud jars/credentials; the webhdfs leg covers
"genuinely remote Hadoop FS" but not object-store SEMANTICS. The shim
(:mod:`qafs_spark.testing.objectstore`) swaps the storage layer's
small-file surface for S3-like behavior — non-atomic create-if-absent,
copy+delete rename, eventual HEAD/LIST + read-after-overwrite — and
these tests pin which protocol guarantees survive, which degrade
gracefully, and which remain documented residuals. What's left after
this file needs real credentials only (connector config, conditional-
write detection, LIST pagination timing)."""

import time

import pytest

from qafs_spark.pipeline import lease as L
from qafs_spark.testing.objectstore import ObjectStoreShim


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "idx")


def test_lease_lifecycle_under_object_store(spark, root, monkeypatch):
    """Strong-consistency object store (modern S3, lag=0): the full
    lease lifecycle must behave exactly as on HDFS — acquire, refuse,
    fence bump, release, reacquire, expiry takeover (whose rename-aside
    is now a copy+delete)."""
    ObjectStoreShim().patch(monkeypatch)
    a = L.MaintenanceLease(spark, root, op="fold", owner="a")
    a.acquire()
    tok1 = L.fence_token(spark, root)
    assert tok1
    with pytest.raises(L.LeaseHeldError):
        L.MaintenanceLease(spark, root, op="compact", owner="b").acquire()
    with pytest.raises(L.LeaseHeldError):
        L.refuse_if_held(spark, root, "apply_batch")
    assert a.release()
    b = L.MaintenanceLease(spark, root, op="compact", owner="b")
    b.acquire()  # reacquire after release
    assert L.fence_token(spark, root) != tok1  # bumped per window
    assert b.release()
    # expiry takeover: a dead holder's record times out; the taker's
    # rename-aside runs as copy+delete under the shim and must still
    # hand the lease to exactly one taker
    dead = L.MaintenanceLease(spark, root, op="fold", owner="dead",
                              ttl_sec=0.01)
    dead.acquire()
    time.sleep(0.05)
    c = L.MaintenanceLease(spark, root, op="rebuild", owner="c")
    c.acquire()
    assert c.current()["owner"] == "c"
    assert c.release()


def test_apply_batch_exactly_once_under_object_store(
    spark, root, monkeypatch
):
    """The vector index's exactly-once commit (applied-log manifest +
    fence capture/verify) rides the patched small-file surface; a
    replayed batch must be a no-op and a fresh batch must commit, on
    object-store semantics."""
    from pyspark.sql import functions as F

    from qafs_spark.pipeline.vector_index import CellVectorIndex

    ObjectStoreShim().patch(monkeypatch)
    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(24)],
        ["vec_id", "embedding"],
    )
    idx = CellVectorIndex(spark, root, nlist=2)
    assert idx.apply_batch(df.filter(F.col("vec_id") < 12), 0,
                           threshold=0.5)
    assert not idx.apply_batch(df.filter(F.col("vec_id") < 12), 0,
                               threshold=0.5)  # replay: no-op
    assert idx.apply_batch(df.filter(F.col("vec_id") >= 12), 1,
                           threshold=0.5)
    assert idx.batch_applied(0) and idx.batch_applied(1)
    # maintenance refusal still enforced through the shim
    hold = L.MaintenanceLease(spark, root, op="fold", owner="m").acquire()
    with pytest.raises(L.LeaseHeldError):
        idx.apply_batch(df, 2, threshold=0.5)
    hold.release()


def test_simultaneous_put_window_is_the_documented_residual(
    spark, root, monkeypatch
):
    """Non-atomic create-if-absent: when BOTH racers' PUTs land inside
    each other's probe→PUT window AND each verifies before the other's
    overwrite, both believe they created the file — the double-hold the
    lease docstring documents as the microsecond residual read-back
    cannot close (and why real S3 deployments should use conditional
    writes). Pinned deterministically via the shim's create_race hook
    so the docstring's claim stays true to the code."""
    import json

    shim = ObjectStoreShim().patch(monkeypatch)
    a = L.MaintenanceLease(spark, root, op="fold", owner="a")
    b = L.MaintenanceLease(spark, root, op="fold", owner="b")
    import qafs_spark.storage as st
    st.mkdirs(spark, root)

    results = {}

    def inside_a_window(_path):
        # B's complete create+verify lands while A is between its
        # probe and its PUT
        shim.hooks.pop("create_race", None)
        results["b"] = b._try_create()

    shim.hooks["create_race"] = inside_a_window
    results["a"] = a._try_create()
    # both passed their probe; B verified before A's overwrite; A's
    # verify sees A's own (last) PUT: the documented double-hold.
    assert results == {"a": True, "b": True}
    # the surviving record is A's (last writer wins the content)
    assert json.loads(st.read_small_file(spark, a.path))["owner"] == "a"


def test_stale_head_acquirer_aborts_and_holder_degrades_gracefully(
    spark, root, monkeypatch
):
    """Eventual HEAD/LIST (lag on): a second acquirer whose exists-probe
    misses the fresh lease file PUTs over it — but its read-back verify
    serves the OLD bytes (read-after-overwrite lag), so it sees the
    first owner's record and aborts: EXACTLY ONE holder believes it
    holds. The clobbered first holder's release then returns False
    (record no longer carries its owner) — graceful lost-lease, never
    a silent double-maintenance."""
    ObjectStoreShim(lag_sec=5.0).patch(monkeypatch)
    a = L.MaintenanceLease(spark, root, op="fold", owner="a")
    a.acquire()  # own GET is read-after-write consistent
    b = L.MaintenanceLease(spark, root, op="compact", owner="b")
    with pytest.raises(L.LeaseHeldError):
        b.acquire()  # stale probe passes, read-back aborts
    assert not b._held
    # the store's TRUE bytes now carry b's record (last PUT wins)
    import json
    import os

    with open(os.path.join(root, "_maintenance_lease"), "rb") as f:
        assert json.loads(f.read())["owner"] == "b"
    # a's release: its stale GET still shows its own record, but the
    # rename-aside-verify step reads the aside file FRESH (new key →
    # strong GET), sees the foreign record, renames it back untouched
    # and returns False — graceful lost-lease
    assert a.release() is False
    with open(os.path.join(root, "_maintenance_lease"), "rb") as f:
        assert json.loads(f.read())["owner"] == "b"  # restored, intact


def test_rename_window_both_visible_then_source_gone(
    spark, tmp_path, monkeypatch
):
    """Copy+delete rename: inside the window BOTH paths exist (a crash
    there leaves both — the takeover/release aside-name uniqueness is
    what makes that safe); after, only the destination."""
    import os

    shim = ObjectStoreShim().patch(monkeypatch)
    import qafs_spark.storage as st

    src = str(tmp_path / "a.txt")
    dst = str(tmp_path / "b.txt")
    with open(src, "w") as f:
        f.write("x")
    seen = {}

    def in_window(_):
        seen["src"] = os.path.exists(src)
        seen["dst"] = os.path.exists(dst)

    shim.hooks["rename_window"] = in_window
    assert st.rename_path(spark, src, dst)
    assert seen == {"src": True, "dst": True}
    assert not os.path.exists(src) and os.path.exists(dst)
    # rename onto an existing destination OVERWRITES (object-store PUT)
    with open(src, "w") as f:
        f.write("y")
    assert st.rename_path(spark, src, dst)
    with open(dst) as f:
        assert f.read() == "y"


def test_conditional_put_closes_the_double_hold(spark, root, monkeypatch):
    """Conditional writes (S3 PUT If-None-Match:* GA Aug 2024, GCS
    if-generation-match:0, ABFS ETag): the EXACT schedule that produces
    the double-hold under unconditional PUT — B's complete create+verify
    landing inside A's probe→PUT window — now hands the lease to exactly
    one owner: A's conditioned PUT fails (412-equivalent) against B's
    object, so A's _try_create returns False and acquire() refuses."""
    import json

    shim = ObjectStoreShim(conditional_put=True).patch(monkeypatch)
    a = L.MaintenanceLease(spark, root, op="fold", owner="a")
    b = L.MaintenanceLease(spark, root, op="compact", owner="b")
    import qafs_spark.storage as st
    st.mkdirs(spark, root)

    results = {}

    def inside_a_window(_path):
        shim.hooks.pop("create_race", None)
        results["b"] = b._try_create()

    shim.hooks["create_race"] = inside_a_window
    results["a"] = a._try_create()
    # same interleave as the double-hold test; conditional PUT flips it
    assert results == {"a": False, "b": True}
    assert json.loads(st.read_small_file(spark, a.path))["owner"] == "b"
    # and through the full protocol: the loser raises, never holds
    with pytest.raises(L.LeaseHeldError):
        L.MaintenanceLease(spark, root, op="fold", owner="a2").acquire()


def test_conditional_put_beats_stale_head(spark, root, monkeypatch):
    """Eventual HEAD/LIST + conditional PUT: an acquirer whose stale
    exists-probe misses the fresh lease file still CANNOT clobber it —
    the condition is evaluated against the strongly-consistent object
    index, not the lagged view, so the PUT fails and the first holder's
    record survives byte-for-byte (stronger than the unconditional-PUT
    case, where the holder degrades to a graceful lost-lease)."""
    import json
    import os

    ObjectStoreShim(lag_sec=5.0, conditional_put=True).patch(monkeypatch)
    a = L.MaintenanceLease(spark, root, op="fold", owner="a")
    a.acquire()
    b = L.MaintenanceLease(spark, root, op="compact", owner="b")
    with pytest.raises(L.LeaseHeldError):
        b.acquire()
    assert not b._held
    with open(os.path.join(root, "_maintenance_lease"), "rb") as f:
        assert json.loads(f.read())["owner"] == "a"  # never clobbered
    assert a.release() is True  # holder unharmed, clean release
