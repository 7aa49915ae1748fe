#!/usr/bin/env python3
"""In-JVM alternating A/B of unrolled vs loop-form sketch expressions
(round 17: the simhash bit extraction and the minhash signature/band
keys). The unrolled variants are INLINED here (they were the shipped
forms before round 17 session 2) so the comparison stays reproducible
at any later tip; the loop variants come from the library.

Methodology: one JVM, ``spark.sql.codegen.cache.maxEntries=0`` so EVERY
run pays plan analysis + Janino compile (the cost the bench's
once-per-process queries pay on their first run), A/B alternating with
``clearCache()`` between runs — host drift cancels. Row equality is
asserted before timing.

Usage: python tools/codegen_loopform_ab.py [simhash|minhash]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from qafs_spark.session import get_spark
from qafs_spark.pipeline import dedup as dd
from qafs_spark.pipeline.dedup import (
    MERSENNE31,
    SIMHASH_BITS,
    _PACK_FIELDS,
    _PACK_WIDTH,
    hamming64,
    minhash_params,
    token_hashes,
    tokens,
    with_shingle_hashes,
)

spark = get_spark(
    app_name="codegen-loopform-ab",
    extra_conf={"spark.sql.codegen.cache.maxEntries": "0"},
)
spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
    "overwrite"
).save()

DOCS = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")


# -- pre-round-17 unrolled forms, inlined ----------------------------------
def simhash_table_unrolled(df, text_col, id_col):
    from qafs_spark.pipeline import spread

    df = spread(df)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(token_hashes(F.col(text_col))).alias("h"),
    )
    n_packs = (SIMHASH_BITS + _PACK_FIELDS - 1) // _PACK_FIELDS
    packs = []
    for j in range(n_packs):
        expr = None
        for k in range(_PACK_FIELDS):
            b = j * _PACK_FIELDS + k
            if b >= SIMHASH_BITS:
                break
            bit = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("long")
            piece = F.shiftleft(bit, _PACK_WIDTH * k)
            expr = piece if expr is None else expr + piece
        packs.append(F.sum(expr).alias(f"_p{j}"))
    votes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("_n"), *packs)
    mask = (1 << _PACK_WIDTH) - 1
    sketch = None
    for b in range(SIMHASH_BITS):
        j, k = divmod(b, _PACK_FIELDS)
        cnt = F.shiftright(F.col(f"_p{j}"), _PACK_WIDTH * k).bitwiseAND(
            F.lit(mask)
        )
        bit = F.shiftright(F.col("_n") - cnt * F.lit(2), 63).bitwiseAND(F.lit(1))
        piece = F.shiftleft(bit, b)
        sketch = piece if sketch is None else sketch + piece
    return votes.select("id", sketch.alias("sh"))


def sig_unrolled(hashes, num_hashes=32, seed=42):
    def perm(a, b):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31)

    return F.array(
        *[
            F.array_min(F.transform(hashes, perm(a, b)))
            for a, b in minhash_params(num_hashes, seed)
        ]
    )


def band_keys_unrolled(signature, num_bands, rows_per_band):
    keys = []
    for band in range(num_bands):
        sl = F.slice(signature, band * rows_per_band + 1, rows_per_band)
        keys.append(
            F.concat_ws(
                "|",
                F.lit(str(band)),
                F.array_join(F.transform(sl, lambda x: x.cast("string")), ","),
            )
        )
    return F.array(*keys)


# -- pipelines over each variant -------------------------------------------
def simhash_pairs_with(table_fn, max_distance=3):
    docs = DOCS.filter(F.length(F.trim("text")) > 0)
    n_blocks = max_distance + 1
    block_bits = SIMHASH_BITS // n_blocks
    s = table_fn(docs, "text", "doc_id")
    block_structs = []
    for i in range(n_blocks):
        width = (
            block_bits
            if i < n_blocks - 1
            else SIMHASH_BITS - block_bits * (n_blocks - 1)
        )
        mask = (1 << width) - 1
        block_structs.append(
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("sh"), i * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
        )
    all_blocks = s.select(
        "id", "sh", F.explode(F.array(*block_structs)).alias("bk")
    ).select(
        "id", "sh", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key")
    )
    a, b = all_blocks.alias("a"), all_blocks.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_pairs_with(sig_fn, band_fn):
    from pyspark import StorageLevel

    nonempty = DOCS.filter(F.size(tokens(F.col("text"))) >= 3)
    base = with_shingle_hashes(nonempty, "text", "doc_id", 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    with_sig = base.select("id", sig_fn(F.col("sh")).alias("sig"))
    banded = with_sig.select(
        "id", F.explode(band_fn(F.col("sig"), 16, 2)).alias("band")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verif = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast(
        "double"
    )
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return verif.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= 0.5)


def run_ab(label, fn_a, fn_b, key):
    ra = sorted(key(r) for r in fn_a().collect())
    spark.catalog.clearCache()
    rb = sorted(key(r) for r in fn_b().collect())
    spark.catalog.clearCache()
    eq = "IDENTICAL" if ra == rb else "MISMATCH"
    print(f"# {label} equality: {eq} ({len(ra)} vs {len(rb)})", flush=True)
    assert eq == "IDENTICAL"
    res = {"A": [], "B": []}
    for i in range(6):
        for name, fn in (("A", fn_a), ("B", fn_b)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            res[name].append(dt)
            print(f"# {label} round{i} {name}: {dt}", flush=True)
    for k, v in res.items():
        print(
            f"{label} {k}: runs={v} min={min(v)} "
            f"median={sorted(v)[len(v) // 2]}"
        )


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("simhash", "both"):
    run_ab(
        "simhash",
        lambda: simhash_pairs_with(simhash_table_unrolled),
        lambda: simhash_pairs_with(dd.simhash_table),
        key=lambda r: (r.id_a, r.id_b, r.distance),
    )
if which in ("minhash", "both"):
    run_ab(
        "minhash",
        lambda: minhash_pairs_with(
            sig_unrolled, band_keys_unrolled
        ),
        lambda: minhash_pairs_with(
            lambda h: dd.minhash_signature_from_hashes(h, 32, 42),
            dd.lsh_band_keys,
        ),
        key=lambda r: (r.id_a, r.id_b, r.jaccard),
    )
