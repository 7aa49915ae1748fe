"""Applied-batch manifest: O(1) metadata reads for the persisted indexes.

The three persisted indexes (:mod:`banded_index`, :mod:`vector_index`,
:mod:`text_index`) commit each micro-batch into its own ``batch_id=N``
partition directories and need to answer, on every probe/pairs read,
"which batches durably committed?". The original answer — list the
marker dataset's batch directories and probe one ``_SUCCESS`` file per
uncompacted batch — costs O(uncompacted batches) driver-side FS
round-trips per read; at 10⁴+ micro-batches between compactions, on an
object store, that metadata term dominates the read itself.

This module replaces it with a commit log, the idiom table formats use
(Delta's ``_delta_log``, Iceberg's snapshot manifests), kept deliberately
tiny:

- ``applied_log/`` — a parquet dataset of ``(batch_id)`` rows. One row is
  appended after a batch's LAST dataset write (so a log entry witnesses a
  complete commit — the log IS the applied marker); the append is
  crash-safe because Spark's committer stages part files under
  ``_temporary`` and a torn append is simply invisible.
- Readers take the applied set as: every id at or below the compaction
  watermark, plus the log's entries. One parquet read, cached per
  instance (the indexes are single-writer, and the writing instance
  updates its own cache in place), so a long-lived reader issues ZERO
  FS metadata ops per probe after the first.
- ``compact()``/``rebuild()``/``retrain()`` rewrite the log to a single
  sentinel row at the fold target — the log never accumulates past a
  compaction, and a crash inside the rewrite degrades to the legacy
  ``_SUCCESS`` scan (see below), never to wrong answers.

Legacy indexes written before the log existed fall back to exactly one
directory-listing + ``_SUCCESS`` scan (the old protocol), and the first
``apply_batch`` on such an index backfills the log from that scan, so
the fallback runs at most once per index lifetime.
"""

from __future__ import annotations

from typing import Optional, Set

from pyspark.sql import SparkSession

from .. import storage as fs_storage


def read_log(spark: SparkSession, log_path: str) -> Optional[Set[int]]:
    """The log's batch-id set, or None when the log does not exist yet
    (caller falls back to the legacy _SUCCESS scan)."""
    if not fs_storage.path_exists(spark, log_path):
        return None
    try:
        return {
            int(r["batch_id"])
            for r in spark.read.parquet(log_path).collect()
        }
    except Exception:
        # dir exists but holds no committed part files (crash inside the
        # very first append): indistinguishable from "no log"
        return None


def legacy_scan(
    spark: SparkSession, marker_path: str, through: int,
    require_all=(),
) -> Set[int]:
    """The pre-manifest protocol, run at most once per index lifetime:
    batch dirs of the LAST-written dataset carrying their own _SUCCESS.

    ``require_all`` (round 17, ADVICE): additional dataset roots whose
    ``batch_id=N/_SUCCESS`` must ALSO exist for the batch to count.
    Indexes whose commits run CONCURRENT dataset writes (round 16+) have
    no "written last" marker dataset — a crashed concurrent batch can
    leave any subset of its directories, so the fallback must take the
    intersection across every dataset the commit writes. For a genuinely
    pre-concurrency index the serial write order made the marker dataset
    imply all earlier ones, so the intersection is the same set and the
    fallback's answer is unchanged there."""
    out: Set[int] = set()
    for d in fs_storage.list_dirs(spark, marker_path):
        if not d.startswith("batch_id="):
            continue
        bid = int(d.split("=", 1)[1])
        if bid > through and fs_storage.path_exists(
            spark, fs_storage.join(marker_path, d, "_SUCCESS")
        ) and all(
            fs_storage.path_exists(
                spark, fs_storage.join(p, d, "_SUCCESS")
            )
            for p in require_all
        ):
            out.add(bid)
    return out


def append(
    spark: SparkSession, log_path: str, batch_ids
) -> None:
    """Append entries driver-side (round 16: one tiny parquet file
    written through the Hadoop FS client — no Spark job; the previous
    ``createDataFrame(...).repartition(1).write`` paid a ~0.4 s job
    submit + committer round per micro-batch commit, the largest fixed
    term in the streaming sinks' serial commit chain). Crash-safe — the
    bytes land under a dot-prefixed temp name and rename into place, so
    a torn append is invisible to readers, the same contract the
    job-based append had via ``_temporary`` staging."""
    rows = [(int(b),) for b in sorted(set(batch_ids))]
    if not rows:
        return
    fs_storage.write_small_parquet(
        spark, log_path, rows, [("batch_id", "int64")]
    )


def ensure(spark: SparkSession, log_path: str, batch_ids=()) -> None:
    """Make the log EXIST (with ``batch_ids``, possibly zero rows) if it
    does not yet. Round 16: the sinks call this before their first
    commit so the legacy ``_SUCCESS``-scan fallback can never engage on
    an index written with CONCURRENT dataset writes — the fallback
    infers "applied" from the last-written dataset's markers, a
    write-order assumption concurrent commits no longer satisfy. A
    0-row log reads back as the empty applied set (not None), which is
    exactly right for a fresh index.

    Round 17 (ADVICE): gate on the log actually READING, not on the
    directory existing — a crash inside the very first append leaves
    the dir present but unreadable (read_log → None), and a
    path-exists gate would no-op here while callers mark their caches
    log-backed; the next append would then create a log holding only
    the new batch id and the pre-log applied set would silently drop
    out. Writing the backfill whenever the log does not read heals
    exactly that state."""
    if read_log(spark, log_path) is not None:
        return
    fs_storage.write_small_parquet(
        spark, log_path, [(int(b),) for b in sorted(set(batch_ids))],
        [("batch_id", "int64")],
    )


def reset(spark: SparkSession, log_path: str, target: int) -> None:
    """Fold the log after a compaction/rebuild: one sentinel row at the
    fold target (already covered by the watermark — its only job is to
    keep the log EXISTING so the legacy fallback never re-runs). A crash
    mid-overwrite leaves the log missing, which degrades to the legacy
    scan — correct, because the watermark advanced first."""
    fs_storage.delete_path(spark, log_path)
    append(spark, log_path, [int(target)])
