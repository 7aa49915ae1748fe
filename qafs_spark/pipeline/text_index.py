"""Persisted inverted index: BM25 retrieval whose per-query cost is a
partition-pruned postings probe, with incremental exactly-once ingestion.

The lexical member of the persisted-index trio (:mod:`banded_index` for
MinHash, :mod:`vector_index` for embeddings). :func:`text.bm25_topk`
re-tokenizes the corpus per query — right for one-off audits, wrong for a
retrieval service over a continuously-fed corpus. Here each document is
tokenized ONCE, at ingest:

- ``postings/batch_id=N/term_pfx=K/`` — (term, id, tf) rows partitioned
  by a term-hash prefix. A query's terms map to a bounded prefix set, so
  the probe reads only matching partition directories — the classic
  inverted-index seek expressed as parquet partition pruning.
- ``doclens/batch_id=N/`` — (id, dl) rows; corpus scalars (N, avgdl) are
  one narrow aggregate over this two-column table at query time, so they
  are always exact — including after merge-on-read deletes.

Scoring is byte-identical to :func:`text.bm25_topk` (same expression
shapes, same micro-unit freeze), so a full-corpus index query replays the
same DuckDB oracle — asserted by the ``bm25_index_topk`` catalog row and
a bit-equality pytest against the on-the-fly operator.

Exactly-once ingestion, merge-on-read deletes, and compaction use the
same recipes as the sibling indexes (per-batch overwrite directories; an
``applied_log`` manifest entry appended after the last dataset write as
the applied marker — :mod:`manifest`, one cached read, O(1) metadata ops
per search; broadcast tombstone anti-joins; rename-aside compaction
swap). Same checkpoint/index lifecycle caveat as
:mod:`streaming.dedup_lsh`.
"""

from __future__ import annotations

import json
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import storage as fs_storage
from . import lease, manifest
from .text import tokens

# doclens fold sizing: one row per live document (two narrow columns), so
# ~2M rows per write task keeps files in the tens-of-MB range; 1 file for
# gate-scale corpora, hundreds of parallel tasks at 10^9 docs
_DOCLENS_ROWS_PER_TASK = 2_000_000


def _doclens_partitions(n_rows: int) -> int:
    return max(1, -(-int(n_rows) // _DOCLENS_ROWS_PER_TASK))


class InvertedIndex:
    """Persisted BM25 index rooted at ``root``."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_partitions: int = 64,
    ) -> None:
        self.spark = spark
        self.root = root
        self.num_partitions = num_partitions
        j = fs_storage.join
        self.postings_path = j(root, "postings")
        self.doclens_path = j(root, "doclens")
        self.meta_path = j(root, "meta")
        self.deletes_path = j(root, "deletes")
        self.watermark_path = j(root, "compacted_through")
        self.rebuild_marker_path = j(root, "rebuild_commit")
        self.applied_log_path = j(root, "applied_log")
        # per-instance metadata caches (watermark, tombstones, meta
        # validation) — see banded_index for the rationale; invalidated
        # by delete_ids/compact
        self._ct_cache: Optional[int] = None
        self._tomb_cache = "unset"
        self._tomb_sig = None
        self._meta_checked = False
        # (applied-ids set above the watermark, log-exists flag) — one
        # cached commit-log read replaces the per-batch _SUCCESS probes
        self._applied_cache: Optional[tuple] = None

    def _invalidate_meta_caches(self) -> None:
        if isinstance(self._tomb_cache, DataFrame):
            self._tomb_cache.unpersist()
        self._tomb_cache = "unset"
        self._ct_cache = None
        self._applied_cache = None

    def _sync_tombstones(self) -> None:
        """Cross-instance delete visibility on a cheap signal: one
        listing of the tiny ``deletes/`` dataset (bounded by delete_ids
        calls since the last compact) compared against the signature
        captured when the cached tombstone frame was built; a mismatch
        drops just that cache. Called once per apply_batch, so a
        long-lived WRITER (the streaming sinks hold one instance for the
        stream's lifetime) observes delete_ids issued through other
        instances at its next micro-batch. Plain READERS may serve a
        cached tombstone set until :meth:`refresh` — which guarantees
        the next read observes the delete."""
        if self._tomb_cache == "unset":
            return
        if (
            fs_storage.dir_signature(self.spark, self.deletes_path)
            != self._tomb_sig
        ):
            if isinstance(self._tomb_cache, DataFrame):
                self._tomb_cache.unpersist()
            self._tomb_cache = "unset"

    def refresh(self) -> None:
        """Drop every per-instance metadata cache (tombstones, compaction
        watermark, applied-batch set) so the next read re-syncs with
        mutations other instances committed — deletes, compactions,
        applied batches. Single-writer per index is still the contract;
        this is the reader-side lever."""
        self._invalidate_meta_caches()

    def _pfx(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.num_partitions))

    def _check_meta(self) -> None:
        if self._meta_checked:
            return
        cfg = {"num_partitions": self.num_partitions}
        if fs_storage.path_exists(self.spark, self.meta_path):
            stored = json.loads(
                self.spark.read.parquet(self.meta_path).first()["config"]
            )
            if stored != cfg:
                raise ValueError(
                    f"index at {self.root} was built with {stored}, got "
                    f"{cfg} — the prefix modulus is immutable"
                )
        else:
            fs_storage.write_small_parquet(
                self.spark, self.meta_path,
                [(json.dumps(cfg),)], [("config", "string")],
                overwrite=True,
            )
        self._meta_checked = True

    # -- merge-on-read deletes ---------------------------------------------

    def delete_ids(self, ids) -> int:
        """Tombstone documents; probes and corpus scalars exclude them
        immediately, :meth:`compact` drops their rows physically."""
        # round 11: refuse new writes while a maintenance writer
        # holds the root's lease (lease.py) — maintenance renames
        # live datasets aside; a batch landing mid-swap could be
        # orphaned. One small-file read per batch.
        if getattr(self, "_lease_depth", 0) == 0:
            lease.refuse_if_held(self.spark, self.root, "delete_ids")
        if isinstance(ids, DataFrame):
            df = ids.toDF("id").distinct()
        else:
            if not ids:
                return 0
            df = self.spark.createDataFrame([(i,) for i in ids], ["id"]).distinct()
        df.repartition(1).write.mode("append").parquet(self.deletes_path)
        n = df.count()
        self._invalidate_meta_caches()
        return n

    def _tombstones(self) -> Optional[DataFrame]:
        if self._tomb_cache != "unset":
            return self._tomb_cache
        self._tomb_sig = fs_storage.dir_signature(self.spark, self.deletes_path)
        if self._tomb_sig is None:
            self._tomb_cache = None
            return None
        try:
            tomb = self.spark.read.parquet(self.deletes_path).select("id")
            tomb = tomb.persist()
            tomb.count()
        except Exception:
            tomb = None
        self._tomb_cache = tomb
        return tomb

    def _minus_deleted(self, df: DataFrame) -> DataFrame:
        tomb = self._tombstones()
        if tomb is None:
            return df
        return df.join(F.broadcast(tomb), "id", "left_anti")

    # -- exactly-once ingestion --------------------------------------------

    def _compacted_through(self) -> int:
        if self._ct_cache is not None:
            return self._ct_cache
        if not fs_storage.path_exists(self.spark, self.watermark_path):
            self._ct_cache = -1
        else:
            self._ct_cache = int(
                self.spark.read.parquet(self.watermark_path).first()["through"]
            )
        return self._ct_cache

    def batch_applied(self, batch_id: int) -> bool:
        """Applied iff at/below the compaction watermark or recorded in
        the applied-log manifest (appended after the last dataset write;
        a crash before the append reads as not-applied and the replay
        re-commits byte-identical directories)."""
        if int(batch_id) <= self._compacted_through():
            return True
        return int(batch_id) in self._applied_set()

    def _applied_set(self) -> set:
        """Batch ids above the compaction watermark whose ingestion
        durably committed. One cached read of the ``applied_log``
        manifest (O(1) metadata ops per search, independent of
        uncompacted-batch count); a legacy index without a log falls
        back to one _SUCCESS directory scan of the last-written dataset
        (doclens). Search reads filter through this so a concurrent or
        crashed apply_batch — whose postings land BEFORE its doclens —
        can never skew n_docs/avgdl or surface partial postings."""
        if self._applied_cache is not None:
            return self._applied_cache[0]
        through = self._compacted_through()
        logged = manifest.read_log(self.spark, self.applied_log_path)
        if logged is None:
            s = manifest.legacy_scan(self.spark, self.doclens_path, through)
            self._applied_cache = (s, False)
        else:
            s = {b for b in logged if b > through}
            self._applied_cache = (s, True)
        return s

    def _log_applied(self, batch_id: int) -> None:
        """Record a completed commit in the manifest (backfilling a
        legacy index's applied set on the first logged batch)."""
        s = self._applied_set()
        new = {int(batch_id)}
        if not self._applied_cache[1]:
            new |= s
        manifest.append(self.spark, self.applied_log_path, new)
        self._applied_cache = (s | {int(batch_id)}, True)

    def _applied_cond(self):
        """Predicate selecting rows of durably-applied batches; zero FS
        ops on a warm instance (watermark + applied set are cached)."""
        through = self._compacted_through()
        marked = [str(b) for b in self._applied_set()]
        return (F.col("batch_id").cast("long") <= F.lit(through)) | (
            F.col("batch_id").isin(marked)
        )

    def _fold_targets(self) -> list:
        """Applied batch ids eligible for folding (compaction/rebuild
        source set); raises on an unapplied batch dir below the fold
        target — see BandedMinHashIndex._fold_targets."""
        dirs = []
        for d in fs_storage.list_dirs(self.spark, self.doclens_path):
            if d.startswith("batch_id="):
                dirs.append(int(d.split("=", 1)[1]))
        through = self._compacted_through()
        marked = self._applied_set()
        applied = [b for b in dirs if b <= through or b in marked]
        unapplied = sorted(set(dirs) - set(applied))
        if applied and unapplied and min(unapplied) < max(applied):
            raise ValueError(
                f"batch dirs {unapplied} at {self.root} never durably "
                f"committed but sit below the fold target {max(applied)}"
                " — replay them (or delete their directories) before "
                "compact/rebuild"
            )
        return applied

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> bool:
        """Tokenize the batch ONCE and commit its postings + doc lengths,
        exactly once (doclens, then the applied-log append that marks the
        batch committed). Ids must be disjoint from stored ids.
        Zero-token documents contribute no rows (same contract as
        bm25_topk's token stream)."""
        # round 11 entry probe + round 12 fence capture: the token is
        # re-verified just before the applied-log append, so maintenance
        # acquiring mid-batch aborts the commit loudly (lease.py) and
        # the batch stays replayable. Token FIRST, held-probe second
        # (round 13): an acquire between the two reads then bumps the
        # token after the capture and the commit check aborts, instead
        # of the batch capturing the post-bump token and committing
        # inside the maintenance window.
        start_fence = None
        if getattr(self, "_lease_depth", 0) == 0:
            start_fence = lease.fence_token(self.spark, self.root)
            lease.refuse_if_held(self.spark, self.root, "apply_batch")
        self._recover_compaction()
        self._sync_tombstones()
        if self.batch_applied(batch_id):
            return False
        self._check_meta()
        j = fs_storage.join
        bdir = f"batch_id={int(batch_id)}"
        tok = batch.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        # tf is persisted across the two writes so the batch is tokenized
        # exactly once: dl is by definition the per-doc sum of tf, so the
        # doclens write folds the materialized tf instead of re-deriving
        # the token stream from the batch lineage a second time
        tf = (
            tok.groupBy("id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("term_pfx", self._pfx(F.col("term")))
            .persist()
        )
        try:
            (
                tf.repartition(F.col("term_pfx"))
                .sortWithinPartitions("term")  # row-group locality for probes
                .write.partitionBy("term_pfx")
                .mode("overwrite")
                .parquet(j(self.postings_path, bdir))
            )
            dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
            dl.write.mode("overwrite").parquet(j(self.doclens_path, bdir))
            if getattr(self, "_lease_depth", 0) == 0:
                lease.verify_commit_fence(
                    self.spark, self.root, start_fence, "apply_batch"
                )
            self._log_applied(int(batch_id))
        finally:
            tf.unpersist()
        return True

    # -- retrieval ---------------------------------------------------------

    def search(
        self,
        query_terms: List[str],
        k: int = 20,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """(doc, score_micro, rank): Okapi BM25 top-k over the live
        corpus, byte-identical scoring to :func:`text.bm25_topk`.

        The postings read is pruned to the query terms' prefix partitions
        (bounded by ``min(len(terms), num_partitions)`` directories);
        corpus scalars come from one narrow aggregate over the two-column
        ``doclens`` table, so they stay exact under tombstones. Global
        top-k plans as TakeOrderedAndProject, ranks are a window over
        <= k rows."""
        from pyspark.sql import Window

        self._recover_compaction()  # incl. finishing a committed rebuild
        if not (
            fs_storage.path_exists(self.spark, self.postings_path)
            and fs_storage.path_exists(self.spark, self.doclens_path)
        ):
            raise ValueError(f"no index at {self.root}")
        applied_cond = self._applied_cond()
        dl = self._minus_deleted(
            self.spark.read.parquet(self.doclens_path)
            .filter(applied_cond)
            .select("id", "dl")
        )
        terms = sorted(set(query_terms))
        if not terms:
            # zero-term query: BM25 over no postings is an empty ranking,
            # typed like a populated one (createDataFrame can't infer an
            # empty frame's schema, so derive it from doclens)
            return dl.select(
                F.col("id").alias("doc"),
                F.lit(0).cast("long").alias("score_micro"),
                F.lit(0).cast("int").alias("rank"),
            ).limit(0)
        pfxs = {
            r[0]
            for r in self.spark.createDataFrame(
                [(t,) for t in terms], ["term"]
            ).select(self._pfx(F.col("term"))).collect()
        }
        post = (
            self.spark.read.parquet(self.postings_path)
            .filter(applied_cond)
            .filter(F.col("term_pfx").isin([str(p) for p in sorted(pfxs)]))
        )
        tf = self._minus_deleted(
            post.filter(F.col("term").isin(terms)).select("id", "term", "tf")
        )
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_tokens"),
        )
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        joined = (
            tf.join(F.broadcast(dfreq), "term")
            .join(dl, "id")
            .crossJoin(F.broadcast(stats))
        )
        nd = F.col("n_docs").cast("double")
        dfd = F.col("df").cast("double")
        tfd = F.col("tf").cast("double")
        dld = F.col("dl").cast("double")
        avgdl = F.col("total_tokens").cast("double") / nd
        idf = F.log(F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
        denom = tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / avgdl))
        part = idf * (tfd * F.lit(k1 + 1.0)) / denom
        per_doc = (
            joined.select(
                F.col("id").alias("doc"),
                F.round(part * F.lit(1_000_000)).cast("long").alias("s_micro"),
            )
            .groupBy("doc")
            .agg(F.sum("s_micro").alias("score_micro"))
        )
        topk = per_doc.orderBy(
            F.col("score_micro").desc(), F.col("doc").asc()
        ).limit(k)
        w = Window.orderBy(F.col("score_micro").desc(), F.col("doc").asc())
        return topk.withColumn("rank", F.row_number().over(w))

    # -- compaction --------------------------------------------------------

    def _recover_compaction(self) -> None:
        for path in (self.postings_path, self.doclens_path):
            old = path.rstrip("/") + ".__old__"
            if not fs_storage.path_exists(self.spark, path) and (
                fs_storage.path_exists(self.spark, old)
            ):
                fs_storage.rename_path(self.spark, old, path)
        self._recover_rebuild()

    # -- parameter rebuild (prefix-modulus change) -------------------------

    def _swap_in(self, path: str, staging_suffix: str) -> None:
        staging = path.rstrip("/") + staging_suffix
        if not fs_storage.path_exists(self.spark, staging):
            return
        old = path.rstrip("/") + ".__old__"
        fs_storage.delete_path(self.spark, old)
        if fs_storage.path_exists(self.spark, path):
            fs_storage.rename_path(self.spark, path, old)
        fs_storage.rename_path(self.spark, staging, path)
        fs_storage.delete_path(self.spark, old)

    def _recover_rebuild(self) -> None:
        """Finish a committed rebuild (same config-carrying marker
        protocol as the sibling indexes — replays safely from any crash
        point, even by an instance constructed with the old modulus)."""
        if not fs_storage.path_exists(self.spark, self.rebuild_marker_path):
            return
        marker = self.spark.read.parquet(self.rebuild_marker_path).first()
        self._swap_in(self.postings_path, ".__rebuild__")
        self._swap_in(self.doclens_path, ".__rebuild__")
        try:
            cfg = json.loads(marker["config"])
            self.num_partitions = int(
                cfg.get("num_partitions", self.num_partitions)
            )
        except Exception:
            pass
        fs_storage.write_small_parquet(
            self.spark, self.meta_path,
            [(json.dumps({"num_partitions": self.num_partitions}),)],
            [("config", "string")], overwrite=True,
        )
        fs_storage.delete_path(self.spark, self.deletes_path)
        fs_storage.delete_path(self.spark, self.rebuild_marker_path)
        self._invalidate_meta_caches()
        self._meta_checked = False
        manifest.reset(
            self.spark, self.applied_log_path, self._compacted_through()
        )
        self._applied_cache = (set(), True)

    @lease.maintenance_op("rebuild")
    def rebuild(self, num_partitions: int) -> int:
        """Re-partition the index under a NEW term-prefix modulus — the
        knob that bounds probe fan-out — without re-tokenizing anything:
        postings rows re-hash to their new prefix directly (term strings
        are stored), doclens fold unchanged, tombstones drop out. Same
        write-ahead marker + rename-aside protocol as
        :meth:`banded_index.BandedMinHashIndex.rebuild`; **run
        quiesced**; instances must use the new modulus afterwards.
        Returns the number of live documents re-indexed."""
        self._recover_compaction()
        applied = self._fold_targets()
        if not applied:
            raise ValueError(f"no index at {self.root}")
        target = max(applied)
        # applied-cond captured BEFORE num_partitions mutates (it only
        # depends on the watermark/applied caches, but capture early for
        # clarity); a crashed batch's partial postings must not be folded
        # under batch_id=target — its stream replay re-ingests it cleanly
        applied_cond = self._applied_cond()
        self.num_partitions = int(num_partitions)
        bid = F.lit(str(target))
        post = self._minus_deleted(
            self.spark.read.parquet(self.postings_path)
            .filter(applied_cond)
            .select("id", "term", "tf")
        )
        (
            post.withColumn("term_pfx", self._pfx(F.col("term")))
            .withColumn("batch_id", bid)
            .repartition(F.col("term_pfx"))
            .sortWithinPartitions("term")
            .write.partitionBy("batch_id", "term_pfx")
            .mode("overwrite")
            .parquet(self.postings_path.rstrip("/") + ".__rebuild__")
        )
        dl = self._minus_deleted(
            self.spark.read.parquet(self.doclens_path)
            .filter(applied_cond)
            .select("id", "dl")
        )
        n_live = dl.count()
        # doclens is CORPUS-sized (one row per live document): spread the
        # fold across hash-of-id tasks scaled to the row count — never a
        # single-task write of a multi-GB table (round-10 fix; small
        # corpora still produce one file)
        (
            dl.withColumn("batch_id", bid)
            .repartition(_doclens_partitions(n_live), F.col("id"))
            .write.partitionBy("batch_id")
            .mode("overwrite")
            .parquet(self.doclens_path.rstrip("/") + ".__rebuild__")
        )
        # staging done — extend the lease before committing (round 12)
        lease.renew_active(self)
        fs_storage.write_small_parquet(
            self.spark, self.watermark_path,
            [(int(target),)], [("through", "int64")], overwrite=True,
        )
        fs_storage.write_small_parquet(
            self.spark, self.rebuild_marker_path,
            [(json.dumps({"num_partitions": self.num_partitions}),)],
            [("config", "string")], overwrite=True,
        )
        self._recover_rebuild()
        self._ct_cache = int(target)
        return n_live

    @lease.maintenance_op("compact")
    def compact(self) -> int:
        """Fold applied batch directories into one and drop tombstoned
        documents physically (rename-aside swap, crash-recoverable; run
        quiesced — same protocol as the sibling indexes)."""
        self._recover_compaction()
        applied = self._fold_targets()
        has_tombstones = fs_storage.path_exists(self.spark, self.deletes_path)
        if not applied or (len(applied) <= 1 and not has_tombstones):
            return 0
        target = max(applied)
        applied_cond = self._applied_cond()
        fs_storage.write_small_parquet(
            self.spark, self.watermark_path,
            [(int(target),)], [("through", "int64")], overwrite=True,
        )

        def swap(path: str, df, part_cols: list) -> None:
            staging = path.rstrip("/") + ".__compact__"
            old = path.rstrip("/") + ".__old__"
            fs_storage.delete_path(self.spark, staging)
            out = df.withColumn("batch_id", F.lit(str(target)))
            if part_cols:
                out = out.repartition(*[F.col(c) for c in part_cols])
            else:
                # the no-part-cols dataset is doclens — corpus-sized;
                # scale the fold's task count to its row count instead of
                # folding through one task (round-10 fix)
                out = out.repartition(
                    _doclens_partitions(df.count()), F.col("id")
                )
            (
                out.write.partitionBy("batch_id", *part_cols)
                .mode("overwrite")
                .parquet(staging)
            )
            # staging done — extend the lease before each swap (round 12)
            lease.renew_active(self)
            fs_storage.delete_path(self.spark, old)
            fs_storage.rename_path(self.spark, path, old)
            fs_storage.rename_path(self.spark, staging, path)
            fs_storage.delete_path(self.spark, old)

        swap(
            self.postings_path,
            self._minus_deleted(
                self.spark.read.parquet(self.postings_path)
                .filter(applied_cond)
                .select("id", "term", "tf", "term_pfx")
            ),
            ["term_pfx"],
        )
        swap(
            self.doclens_path,
            self._minus_deleted(
                self.spark.read.parquet(self.doclens_path)
                .filter(applied_cond)
                .select("id", "dl")
            ),
            [],
        )
        fs_storage.delete_path(self.spark, self.deletes_path)
        manifest.reset(self.spark, self.applied_log_path, int(target))
        self._invalidate_meta_caches()
        self._ct_cache = int(target)
        self._applied_cache = (set(), True)
        return len(applied) - 1
