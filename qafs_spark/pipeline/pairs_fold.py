"""Pairs-log folding: bound the per-batch directory growth of the dedup
indexes' pair logs.

The pairs datasets (:class:`banded_index.BandedMinHashIndex`,
:class:`vector_index.CellVectorIndex`) keep one ``batch_id=N`` directory
per micro-batch forever: they are the historical output record, and
:meth:`compact` deliberately never rewrites them (folding them under one
batch id would destroy per-batch provenance). At streaming cadence that
is an O(batches) directory listing on every ``pairs()`` read — the same
metadata class the ``applied_log`` manifest removed from the probe path.

``fold()`` moves the pair rows of batches at or below the compaction
watermark into a consolidated ``pairs_hist`` dataset with ``batch_id``
carried as a DATA column — provenance preserved, reader output
bit-identical — so the live ``pairs/`` tree only ever holds directories
newer than the last fold. Protocol mirrors the indexes' rebuild markers:

1. stage ``pairs_hist.__fold__`` = current history ∪ the moved batches'
   rows (one rewrite; history stays small relative to the corpus — it
   is pair-sized);
2. write the ``pairs_fold_commit`` intent marker (the commit point);
3. ``recover()``: swap the staging in (rename-aside), advance the
   ``pairs_folded`` watermark, delete the moved live directories, drop
   the marker.

Crash-finishable from any point: the marker implies a complete staging,
every recovery step is idempotent, and readers run ``recover()`` before
reading (one cached ``path_exists`` when idle), so the
double-visibility window between the history swap and the live-dir
deletes is never observable.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import storage as fs_storage


def _hist(spark: SparkSession, hist_path: str, cols: List[str]):
    if not fs_storage.path_exists(spark, hist_path):
        return None
    try:
        return spark.read.parquet(hist_path).select(*cols)
    except Exception:
        return None


def folded_through(spark: SparkSession, folded_path: str) -> int:
    """Highest batch id folded into the history dataset (-1 if never
    folded). Cache per instance — it only moves when THIS instance
    folds."""
    if not fs_storage.path_exists(spark, folded_path):
        return -1
    return int(spark.read.parquet(folded_path).first()["through"])


def recover(
    spark: SparkSession,
    pairs_path: str,
    hist_path: str,
    folded_path: str,
    marker_path: str,
) -> bool:
    """Finish a fold whose intent marker committed. Idempotent; safe to
    call from any public entry. Returns True if a fold was finished."""
    if not fs_storage.path_exists(spark, marker_path):
        return False
    target = int(spark.read.parquet(marker_path).first()["through"])
    staging = hist_path.rstrip("/") + ".__fold__"
    if fs_storage.path_exists(spark, staging):
        old = hist_path.rstrip("/") + ".__old__"
        fs_storage.delete_path(spark, old)
        if fs_storage.path_exists(spark, hist_path):
            fs_storage.rename_path(spark, hist_path, old)
        fs_storage.rename_path(spark, staging, hist_path)
        fs_storage.delete_path(spark, old)
    spark.createDataFrame(
        [(int(target),)], "through long"
    ).repartition(1).write.mode("overwrite").parquet(folded_path)
    for d in fs_storage.list_dirs(spark, pairs_path):
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) <= target:
            fs_storage.delete_path(
                spark, fs_storage.join(pairs_path, d)
            )
    fs_storage.delete_path(spark, marker_path)
    return True


def fold(
    spark: SparkSession,
    pairs_path: str,
    hist_path: str,
    folded_path: str,
    marker_path: str,
    target: int,
    cols: List[str],
) -> int:
    """Fold live batch dirs with folded < batch_id <= ``target`` (the
    compaction watermark — at-or-below it every batch is applied by
    definition) into the history dataset. Returns the number of
    directories folded. **Run quiesced**, like compact()."""
    recover(spark, pairs_path, hist_path, folded_path, marker_path)
    if not fs_storage.path_exists(spark, pairs_path):
        return 0
    already = folded_through(spark, folded_path)
    moved = [
        int(d.split("=", 1)[1])
        for d in fs_storage.list_dirs(spark, pairs_path)
        if d.startswith("batch_id=")
        and already < int(d.split("=", 1)[1]) <= int(target)
    ]
    if not moved:
        return 0
    live = (
        spark.read.parquet(pairs_path)
        .filter(
            F.col("batch_id").cast("long").isin([int(b) for b in moved])
        )
        .select(
            *[c for c in cols if c != "batch_id"],
            F.col("batch_id").cast("long").alias("batch_id"),
        )
    )
    hist = _hist(spark, hist_path, cols)
    staged = live if hist is None else hist.unionByName(live)
    staging = hist_path.rstrip("/") + ".__fold__"
    fs_storage.delete_path(spark, staging)
    staged.write.mode("overwrite").parquet(staging)
    spark.createDataFrame(
        [(int(target),)], "through long"
    ).repartition(1).write.mode("overwrite").parquet(marker_path)
    recover(spark, pairs_path, hist_path, folded_path, marker_path)
    return len(moved)


def scrub_hist(
    spark: SparkSession,
    hist_path: str,
    tomb: DataFrame,
    cols: List[str],
) -> int:
    """Drop every history pair touching the tombstoned ids (rename-aside
    rewrite, crash-recoverable via the caller's ``.__old__`` sweep).
    Returns the number of rows dropped."""
    hist = _hist(spark, hist_path, cols)
    if hist is None:
        return 0
    before = hist.count()
    kept = hist.join(
        F.broadcast(tomb.select(F.col("id").alias("id_a"))),
        "id_a", "left_anti",
    ).join(
        F.broadcast(tomb.select(F.col("id").alias("id_b"))),
        "id_b", "left_anti",
    )
    staging = hist_path.rstrip("/") + ".__scrub__"
    old = hist_path.rstrip("/") + ".__old__"
    fs_storage.delete_path(spark, staging)
    kept.write.mode("overwrite").parquet(staging)
    fs_storage.delete_path(spark, old)
    fs_storage.rename_path(spark, hist_path, old)
    fs_storage.rename_path(spark, staging, hist_path)
    fs_storage.delete_path(spark, old)
    h2 = _hist(spark, hist_path, cols)
    return before - (0 if h2 is None else h2.count())


def read_all(
    spark: SparkSession,
    pairs_path: str,
    hist_path: str,
    folded: int,
    applied_cond,
    cols: List[str],
    empty_schema: str,
) -> DataFrame:
    """History ∪ live view: folded rows are applied by construction;
    live directories above the fold watermark filter through the
    caller's applied-batch predicate. Bit-identical to the pre-fold
    reader's output."""
    out = _hist(spark, hist_path, cols)
    try:
        live = spark.read.parquet(pairs_path)
    except Exception:
        live = None
    if live is not None:
        live = (
            live.filter(F.col("batch_id").cast("long") > int(folded))
            .filter(applied_cond)
            .select(
                *[c for c in cols if c != "batch_id"],
                F.col("batch_id").cast("long").alias("batch_id"),
            )
        )
        out = live if out is None else out.unionByName(live)
    if out is None:
        return spark.createDataFrame([], empty_schema)
    return out
