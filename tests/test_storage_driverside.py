"""Focused pins for the round-16 commit-path internals.

Round 16 moved the index sinks' control-plane writes (applied-log
entries, meta rows, watermarks, markers) off Spark jobs onto the
driver-side ``storage.write_small_parquet`` path, and overlapped the
per-batch dataset writes via ``storage.run_concurrent``.  The sink
suites exercise both transitively; these tests pin the helpers'
contracts directly:

- driver-side parquet is read-equivalent to the job-based
  ``createDataFrame().repartition(1).write`` recipe it replaced
  (schema names, Spark types, values, None handling);
- append accumulates, ``overwrite=True`` replaces;
- a torn write (crash mid-stream) leaves only a dot-prefixed temp file
  that Spark readers ignore — the dataset stays readable;
- ``run_concurrent`` waits for ALL callables before raising the FIRST
  failure (no write is abandoned mid-flight).
"""

import os

import pytest

from qafs_spark import storage


SCHEMA = [("batch_id", "int64"), ("source", "string"), ("score", "double")]
ROWS = [
    (0, "web", 0.5),
    (1, None, 1.25),
    (None, "books", None),
]


def _job_write(spark, path, rows):
    """The pre-round-16 recipe these writes used."""
    df = spark.createDataFrame(
        [tuple(r) for r in rows],
        schema="batch_id long, source string, score double",
    )
    df.repartition(1).write.mode("append").parquet(path)


def test_driver_write_matches_job_write(spark, tmp_store):
    a = os.path.join(tmp_store, "driver_side")
    b = os.path.join(tmp_store, "job_side")
    storage.write_small_parquet(spark, a, ROWS, SCHEMA)
    _job_write(spark, b, ROWS)

    da, db = spark.read.parquet(a), spark.read.parquet(b)
    assert [(f.name, f.dataType) for f in da.schema.fields] == [
        (f.name, f.dataType) for f in db.schema.fields
    ]
    key = lambda r: (r[0] is None, r[0], r[1] is None, r[1])
    assert sorted(map(tuple, da.collect()), key=key) == sorted(
        map(tuple, db.collect()), key=key
    )


def test_append_accumulates_and_overwrite_replaces(spark, tmp_store):
    path = os.path.join(tmp_store, "log")
    storage.write_small_parquet(spark, path, [(1, "a", 0.0)], SCHEMA)
    storage.write_small_parquet(spark, path, [(2, "b", 1.0)], SCHEMA)
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a", 0.0), (2, "b", 1.0)]

    storage.write_small_parquet(
        spark, path, [(9, "z", 9.0)], SCHEMA, overwrite=True
    )
    got = [tuple(r) for r in spark.read.parquet(path).collect()]
    assert got == [(9, "z", 9.0)]


def test_torn_write_is_invisible_to_readers(spark, tmp_store):
    path = os.path.join(tmp_store, "log")
    storage.write_small_parquet(spark, path, [(1, "a", 0.0)], SCHEMA)
    # Simulate a writer that died mid-stream: its dot-prefixed temp file
    # holds garbage bytes and was never renamed into place.
    with open(os.path.join(path, ".part-dead.parquet.inprogress"), "wb") as f:
        f.write(b"\x00not a parquet file")
    got = [tuple(r) for r in spark.read.parquet(path).collect()]
    assert got == [(1, "a", 0.0)]


def test_run_concurrent_finishes_all_then_raises_first():
    ran = []

    def ok(tag):
        def f():
            ran.append(tag)

        return f

    def boom():
        ran.append("boom")
        raise RuntimeError("first failure")

    with pytest.raises(RuntimeError, match="first failure"):
        storage.run_concurrent([ok("a"), boom, ok("b")])
    # Every callable completed before the raise — nothing abandoned.
    assert sorted(ran) == ["a", "b", "boom"]


def test_run_concurrent_single_callable_runs_inline():
    ran = []
    storage.run_concurrent([lambda: ran.append("only")])
    assert ran == ["only"]
