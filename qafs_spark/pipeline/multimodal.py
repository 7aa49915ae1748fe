"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Convention (what a 100 TB multimodal corpus table looks like here):

    asset STRUCT<
        content:  BINARY,            -- raw encoded bytes (opaque)
        media_type: STRING,          -- "image/png", "audio/wav", ...
        meta: MAP<STRING, STRING>    -- typed-ish metadata (dims, codec, ...)
    >

The Spark-side plumbing — schemas, partitioning, Arrow batch shapes, UDF
signatures — is real and tested. The actual codec work (image decode,
resample, frame extraction) is STUBBED: the codec libraries (Pillow,
ffmpeg, torchaudio) are not in this container. Each stub either raises
``NotImplementedError`` (``engine="real"``) or runs a deterministic fake
(``engine="fake"``) that exercises the full distributed path with
reproducible outputs, so the pipeline around the decoder is verifiable.

Scale notes: decode runs in ``mapInPandas`` (Arrow-batched, one Python
worker per core, no per-row overhead); binary columns stay opaque through
shuffles (never hashed/compared); frame sampling emits multiple rows per
asset via the iterator contract without materializing whole videos.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def asset_column(
    content: Column, media_type: Column, meta: Optional[Column] = None
) -> Column:
    meta = meta if meta is not None else F.create_map().cast("map<string,string>")
    return F.struct(
        content.alias("content"),
        media_type.alias("media_type"),
        meta.alias("meta"),
    )


def fake_image_bytes(seed_col: Column) -> Column:
    """Deterministic fake 'encoded image': header + md5-stream bytes.

    Lets tests build a multimodal table from any string column without
    codec libraries; the fake decoder below parses it back.
    """
    return F.to_binary(
        F.concat(F.lit("FAKEIMG1"), F.md5(seed_col.cast("string"))), F.lit("utf-8")
    )


def _fake_decode(content: bytes) -> np.ndarray:
    """Parse the FAKEIMG1 format into a deterministic 8x8 gray 'image'."""
    digest = hashlib.md5(content).digest()  # 16 bytes → tile to 64
    arr = np.frombuffer((digest * 4)[:64], dtype=np.uint8)
    return arr.reshape(8, 8)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("sha", T.StringType()),
    ]
)


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    engine: str = "fake",
) -> DataFrame:
    """Decode → per-image features, as an Arrow-batched mapInPandas stage.

    engine="real" raises NotImplementedError (codec libs absent here; slot
    Pillow/cv2 into ``_fake_decode``'s place on a real cluster).
    """
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(DECODE_SCHEMA.fields)
    )

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if engine == "real":
                raise NotImplementedError(
                    "Real image decode requires codec libraries "
                    "(Pillow/cv2) not present in this environment"
                )
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                img = _fake_decode(bytes(content))
                rows.append(
                    {
                        id_col: rid,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_intensity": float(img.mean()),
                        "sha": hashlib.sha256(bytes(content)).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, content_col).mapInPandas(runner, schema=out_schema)


def resize_images(
    df: DataFrame,
    target: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
    engine: str = "fake",
) -> DataFrame:
    """'Resize' each fake-decoded image to target×target via block-mean
    pooling — stands in for a real resize kernel; same mapInPandas shape."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pixels", T.ArrayType(T.DoubleType())),
        ]
    )

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if engine == "real":
                raise NotImplementedError("Real resize requires codec libs")
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                img = _fake_decode(bytes(content)).astype(np.float64)
                blk = img.shape[0] // target
                pooled = img.reshape(target, blk, target, blk).mean(axis=(1, 3))
                rows.append({id_col: rid, "pixels": pooled.ravel().tolist()})
            yield pd.DataFrame(rows, columns=[id_col, "pixels"])

    return df.select(id_col, content_col).mapInPandas(runner, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
    engine: str = "fake",
) -> DataFrame:
    """Frame sampling for 'video' assets: emits multiple rows per asset
    through the mapInPandas iterator contract (no whole-video in memory).
    Fake frames derive deterministically from the content hash + index."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if engine == "real":
                raise NotImplementedError("Real frame extraction requires ffmpeg")
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[content_col]):
                content = bytes(raw)
                for i in range(0, n_frames * every_n, every_n):
                    frame = hashlib.sha1(content + i.to_bytes(4, "big")).hexdigest()
                    rows.append(
                        {id_col: rid, "frame_idx": i, "frame_sha": frame}
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_sha"])

    return df.select(id_col, content_col).mapInPandas(runner, schema=out_schema)
