#!/usr/bin/env python3
"""Scale the driver's synthetic testdata up by an integer factor.

The driver ships sf0.001/0.01/0.1 only; the scale-regime bench (BENCH_NOTES
round-5 item) needs a larger datapoint. This builds an sfN directory from
sf0.1 by unioning K id-offset replicas — with the replica transforms chosen
so every headline query's WORK grows linearly, i.e. the scaled data behaves
like a bigger corpus, not like K exact clones:

* fact tables (lineitem/orders/customer/supplier/part/events): keys are
  offset per replica consistently across tables (joins keep exactly the
  same fan-out per key); dates/timestamps unchanged (filter selectivity is
  preserved).
* region/nation: fixed dimensions, never scaled (TPC-H convention).
* documents: every whitespace token gets a replica suffix — replicas share
  ZERO shingles with each other, so near-dup pair structure replicates
  per-copy instead of exploding quadratically across copies (10 exact
  clones of every doc would turn minhash/jaccard into a different,
  artificially quadratic workload).
* embeddings: vectors are cyclically rotated per replica (norm-preserving,
  direction-changing) so ANN buckets spread instead of stacking — EXCEPT a
  deterministic ~9% subset per replica (base ``vec_id % 11 == k % 11``)
  which is PLANTED as a true near-duplicate of its replica-0 base:
  ``v' = v + 0.1·rot_k(v)``, whose cosine with ``v`` is bounded below by
  ``sqrt(1-0.1²) ≈ 0.99499`` for ANY rotation alignment (writing
  ``c = cos(v, rot_k v)``, ``cos(v,v') = (1+0.1c)/sqrt(1.01+0.2c)`` is
  minimized at ``c = -0.1``, giving ``sqrt(0.99)``; the oft-quoted
  ``1/sqrt(1.01) ≈ 0.99504`` is only the ``c = 0`` value) — comfortably
  above the 0.85 dedup threshold and tight enough that hyperplane
  sub-bucketing keeps ~0.97 per-bit pair survival. Round 10: gives the scaled fixture a
  KNOWN ground-truth pair set (base_id, base_id + k·offset) so guard /
  recall measurements at 100k+ vectors are non-vacuous (the pure-rotation
  fixture had zero true pairs at 0.85). ``planted_pairs()`` below
  reconstructs the set.

Usage: python tools/make_scaled_sf.py <src_sf_dir> <dst_dir> <factor>
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F


def scale(spark, src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)

    def read(t):
        return spark.read.parquet(f"{src}/{t}.parquet")

    def write(df, t):
        # single file per table, like the source layout
        df.coalesce(max(1, factor // 2)).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    for t in ("region", "nation"):
        write(read(t), t)

    # events: the shipped fixture's ts column is TIMESTAMP(NANOS), which a
    # plain spark.read.parquet cannot even decode on Spark <= 4.0 — set up
    # sources.events' probe + conf handling BEFORE any events read (the
    # offsets pass below reads it too). NOTE the dtype change: Spark cannot
    # WRITE nanos, so the replica's ts comes out as whatever this runtime
    # surfaced (bigint on <= 4.0, micros timestamp_ntz on >= 4.1) — the
    # scaled fixture therefore does NOT exercise the nanos-decode probe
    # path; only the shipped sf dirs do. Queries are unaffected:
    # read_events normalizes either dtype.
    from qafs_spark.sources import events as ev

    ts_dtype = ev.probe_event_ts_dtype(spark, f"{src}/events.parquet")
    ev._ensure_read_conf(spark, ts_dtype)

    # per-table key offsets (max+1 so replicas never collide)
    offsets = {}
    for t, key in (
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        offsets[t] = read(t).agg(F.max(key)).collect()[0][0] + 1
    offsets["user"] = read("events").agg(F.max("user_id")).collect()[0][0] + 1

    def replicate(t, transform):
        base = read(t)
        out = None
        for k in range(factor):
            rep = transform(base, k)
            out = rep if out is None else out.unionByName(rep)
        write(out, t)

    replicate("customer", lambda d, k: d.withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(k * offsets["customer"])))
    replicate("supplier", lambda d, k: d.withColumn(
        "s_suppkey", F.col("s_suppkey") + F.lit(k * offsets["supplier"])))
    replicate("part", lambda d, k: d.withColumn(
        "p_partkey", F.col("p_partkey") + F.lit(k * offsets["part"])))
    replicate("orders", lambda d, k: d
              .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * offsets["orders"]))
              .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * offsets["customer"])))
    replicate("lineitem", lambda d, k: d
              .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * offsets["orders"]))
              .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * offsets["part"]))
              .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * offsets["supplier"])))
    replicate("events", lambda d, k: d
              .withColumn("event_id", F.col("event_id") + F.lit(k * offsets["events"]))
              .withColumn("user_id", F.col("user_id") + F.lit(k * offsets["user"])))
    # stderr: bench.py's stdout is a ONE-JSON-LINE contract the driver
    # parses; the fixture build must not pollute it (round-14 find)
    import sys as _sys

    print(f"note: scaled events.ts dtype = {ts_dtype} (nanos annotation "
          "not preserved by the rewrite)", file=_sys.stderr)

    def doc_rep(d, k):
        d = d.withColumn("doc_id", F.col("doc_id") + F.lit(k * offsets["documents"]))
        if k:
            # per-replica token suffix "·<k>" — distinct for EVERY k (the
            # old chr(96+k) letter scheme degraded past factor 26), and the
            # middle-dot separator cannot occur in the ASCII source corpus,
            # so replicas share zero tokens (hence zero shingles)
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1·{k}")
            ).withColumn("n_chars", F.length("text"))
        return d

    replicate("documents", doc_rep)

    replicate(
        "embeddings", lambda d, k: _emb_rep(d, k, offsets["embeddings"])
    )


def _emb_rep(d, k: int, off: int, dim: int = 64):
    """One embeddings replica: an orthogonal per-replica transform for
    spread, planted near-dups for ground truth (module docstring).

    The transform is T_k = D_{k//dim} · rot_{k mod dim}: a cyclic
    rotation composed, for k >= dim (round 11 — rotation alone wraps at
    the vector dimension, which would make replicas k and k+dim EXACT
    clones and explode the pair structure quadratically), with a
    Rademacher diagonal whose signs are the bits of k//dim. (rot, signs)
    is unique per k, T_k is orthogonal (norm-preserving), and for
    k < dim the sign pattern is all-+1 so existing fixtures (factors
    <= 64, incl. the standing sf1 and the 100k guard fixture) are
    BYTE-IDENTICAL to the pre-round-11 definition. The planted-pair
    cosine bound sqrt(0.99) holds for ANY orthogonal T, same proof."""
    if k:
        rotated = F.concat(
            F.slice("embedding", (k % dim) + 1, 4096),
            F.slice("embedding", 1, k % dim),
        )
        j = k // dim
        if j:
            signs = F.array(
                *[F.lit(-1.0 if (j >> i) & 1 else 1.0) for i in range(dim)]
            )
            rotated = F.zip_with(rotated, signs, lambda x, s: x * s)
        planted = (F.col("vec_id") % 11) == (k % 11)  # base id, pre-offset
        d = d.withColumn(
            "embedding",
            F.when(
                planted,
                # near-dup of the replica-0 base: v + 0.1*T_k(v);
                # cos(v, v') >= sqrt(0.99) ~ 0.99499 for any v
                # (minimum at cos(v, T_k v) = -0.1; see module docstring)
                F.zip_with(
                    "embedding", rotated,
                    lambda x, y: x + F.lit(0.1) * y,
                ),
            ).otherwise(rotated).cast("array<float>"),
        )
    return d.withColumn("vec_id", F.col("vec_id") + F.lit(k * off))


def _expand_dim(col, dim_base: int, dim_out: int):
    """Expand ``dim_base`` → ``dim_out`` (an integer multiple) as a
    LINEAR ISOMETRY (round-13 verdict task 2 — all prior scale evidence
    was dim-64): output block j is ``(-1)^j · rot_{(7j) % dim_base}(v)``.
    Orthogonal blocks preserve inner products, so dot products scale by
    exactly ``nblocks`` and norms by ``sqrt(nblocks)`` — every COSINE,
    including the planted-pair sqrt(0.99) bound and the hot-blend cone,
    is preserved EXACTLY, keeping the ground truth and recall compares
    meaningful. Meanwhile per-row bytes, shuffle volume, einsum flops,
    the mmap artifact footprint and any per-dim plan cost scale honestly
    with ``dim_out``. Distinct rotations per block mean no block is a
    byte-repeat of another (parquet can't compress the expansion away).
    The expanded cloud spans a dim_base-dim subspace of R^dim_out —
    like real embeddings, whose intrinsic dim sits far below ambient."""
    if dim_out % dim_base:
        raise ValueError(f"dim_out {dim_out} not a multiple of {dim_base}")
    blocks = []
    for j in range(dim_out // dim_base):
        r = (7 * j) % dim_base
        b = (
            F.concat(F.slice(col, r + 1, 4096), F.slice(col, 1, r))
            if r
            else col
        )
        if j % 2:
            b = F.transform(b, lambda x: -x)
        blocks.append(b)
    return F.concat(*blocks)


def scale_embeddings(
    spark, src: str, dst_file: str, factor: int, chunk: int = 50,
    dim_out: int = None,
) -> int:
    """Build JUST the scaled embeddings table (the guard/recall benches
    need nothing else). Returns the replica id offset.

    Replicas are written in ``chunk``-wide appends (round 11): a
    factor-F single union is an F-way plan whose analysis/execution
    memory grows with F — a 1000-way union OOM-killed a ~10 GB driver
    cgroup — while chunked appends bound the live plan at ``chunk``
    branches with identical output rows. For ``factor <= chunk`` the
    write is one overwrite with the same coalesce as before, so the
    standing ≤50× fixtures are byte-identical to prior rounds.

    ``dim_out`` (round 13): expand every base vector to this dimension
    via :func:`_expand_dim` BEFORE replication — cosines (and therefore
    the planted-pair ground truth) are preserved exactly; bytes, flops
    and shuffle volume scale with the realistic dim. ``None`` keeps the
    source dim (byte-identical to prior rounds)."""
    base = spark.read.parquet(f"{src}/embeddings.parquet")
    off = base.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(base.select("embedding").first()[0])
    if dim_out:
        base = base.withColumn(
            "embedding",
            _expand_dim(F.col("embedding"), dim, int(dim_out)).cast(
                "array<float>"
            ),
        )
        dim = int(dim_out)
    for c0 in range(0, factor, chunk):
        c1 = min(c0 + chunk, factor)
        out = None
        for k in range(c0, c1):
            rep = _emb_rep(base, k, off, dim=dim)
            out = rep if out is None else out.unionByName(rep)
        (
            out.coalesce(max(1, (c1 - c0) // 2))
            .write.mode("overwrite" if c0 == 0 else "append")
            .parquet(dst_file)
        )
    return off


def _hot_blend(col, beta: float = 1.0):
    """Blend a vector toward the fixed hot direction e_0:
    ``v' = v + beta*|v|*e_0``. With beta=1 the hot mass lies in a 45-deg
    cone around e_0 — the members share a dominant component (so a
    coarse/stale quantizer funnels them into FEW cells) while
    inter-member cosines stay ~0.5 (far below dedup thresholds, so the
    TRUE pair output stays linear: only the planted blends are near-dup
    pairs). Norm-changing is fine: every consumer is cosine-based."""
    nrm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))
    return F.concat(
        F.array(F.element_at(col, 1) + F.lit(float(beta)) * nrm),
        F.slice(col, 2, 4096),
    )


def scale_embeddings_skewed(
    spark, src: str, dst_file: str, factor: int,
    hot_mod: int = 10, hot_lt: int = 3, beta: float = 1.0, chunk: int = 50,
    dim_out: int = None,
) -> int:
    """Clustered-skew variant of :func:`scale_embeddings` (round-12
    verdict task 2): identical replica structure and planted near-dup
    pairs, but ~``hot_lt/hot_mod`` (default 30%) of every replica's rows
    — selected by BASE vec_id, so both members of every planted pair get
    the same treatment and the :func:`planted_pairs` ground truth holds
    (a shared additive component only raises the pair cosine) — are
    blended toward one fixed direction (:func:`_hot_blend`). k-means
    sized for the AVERAGE cell then funnels the hot mass into the few
    cells whose centroids carry the dominant component: the
    guard-engagement regime the uniform fixture (max/min occupancy 1.36
    at 1M, BENCH_NOTES round 11) never reaches. Returns the replica id
    offset. ``dim_out`` as in :func:`scale_embeddings` (the hot blend
    adds the dominant component AFTER expansion, so the cone geometry —
    and the quantizer funneling it causes — is dim-independent)."""
    base = spark.read.parquet(f"{src}/embeddings.parquet")
    off = base.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(base.select("embedding").first()[0])
    if dim_out:
        base = base.withColumn(
            "embedding",
            _expand_dim(F.col("embedding"), dim, int(dim_out)).cast(
                "array<float>"
            ),
        )
        dim = int(dim_out)
    for c0 in range(0, factor, chunk):
        c1 = min(c0 + chunk, factor)
        out = None
        for k in range(c0, c1):
            rep = _emb_rep(base, k, off, dim=dim)
            hot = ((F.col("vec_id") - F.lit(k * off)) % hot_mod) < hot_lt
            rep = rep.withColumn(
                "embedding",
                F.when(hot, _hot_blend(F.col("embedding"), beta))
                .otherwise(F.col("embedding"))
                .cast("array<float>"),
            )
            out = rep if out is None else out.unionByName(rep)
        (
            out.coalesce(max(1, (c1 - c0) // 2))
            .write.mode("overwrite" if c0 == 0 else "append")
            .parquet(dst_file)
        )
    return off


def planted_pairs(spark, src: str, factor: int):
    """Ground-truth near-dup pairs the scaled fixture contains BY
    CONSTRUCTION: for each replica k>0, base vectors with
    ``vec_id % 11 == k % 11`` were blended (not rotated), so
    (base_id, base_id + k*offset) has cosine >= sqrt(0.99) ≈ 0.99499. Returns a
    DataFrame (id_a, id_b) with id_a < id_b."""
    base = spark.read.parquet(f"{src}/embeddings.parquet").select("vec_id")
    off = base.agg(F.max("vec_id")).collect()[0][0] + 1
    out = None
    for k in range(1, factor):
        rep = base.filter((F.col("vec_id") % 11) == (k % 11)).select(
            F.col("vec_id").alias("id_a"),
            (F.col("vec_id") + F.lit(k * off)).alias("id_b"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> int:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from qafs_spark.session import get_spark

    spark = get_spark(app_name="make-scaled-sf")
    scale(spark, src, dst, factor)
    for t in ("lineitem", "documents", "events", "embeddings"):
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())
    return 0


if __name__ == "__main__":
    sys.exit(main())
