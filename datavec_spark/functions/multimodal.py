"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Mirrors the reference's media readers (datavec-data/datavec-data-image/...
ImageRecordReader.java:33, WavFileRecordReader.java:32,
CodecRecordReader.java:56) restated for Spark: media lives in a
`binary` column (from `spark.read.format("binaryFile")` or a lake table)
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas stages over mapInPandas.

Codec chain: PIL when installed (any format) → pure-stdlib PNG decode
(png_codec.py — zlib inflate + scanline unfilter) → pure-numpy baseline
JPEG decode (jpeg_codec.py — T.81 sequential DCT + Huffman; covers
4:4:4/4:2:2/4:2:0, grey/YCbCr, restart markers) → deterministic fake
(bytes-hash-seeded arrays) for formats with no available codec
(progressive JPEG, video codecs). The Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is identical across all paths.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

try:  # real decoder if available (not in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _fake_decode(data: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic stand-in decoder: pixels seeded from content sha256."""
    seed = int.from_bytes(hashlib.sha256(data or b"").digest()[:4], "big")
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)


def read_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest a media directory: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def decode_and_resize(
    df: DataFrame, content_col: str = "content", height: int = 32, width: int = 32,
    channels: int = 3,
) -> DataFrame:
    """binary → flattened float pixel array (h*w*c) + shape metadata, via
    mapInPandas (Arrow batches; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch)."""
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("pixels", T.ArrayType(T.FloatType())),
           T.StructField("meta", IMAGE_META)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, metas = [], []
            for data in pdf[content_col]:
                raw = bytes(data) if data is not None else b""
                arr, fmt = None, "fake"
                if _HAS_PIL and raw:
                    # real decode path when PIL is present; bytes that are
                    # not a decodable image fall back to the deterministic fake
                    try:
                        import io
                        with Image.open(io.BytesIO(raw)) as im:
                            fmt = (im.format or "unknown").lower()
                            mode = "RGB" if channels == 3 else "L"
                            im = im.convert(mode).resize((width, height))
                            arr = np.asarray(im, dtype=np.uint8).reshape(height, width, channels)
                    except Exception:
                        arr = None
                if arr is None and raw:
                    # stdlib PNG / baseline-JPEG paths: real decode without PIL
                    from datavec_spark.functions.jpeg_codec import (
                        decode_jpeg, is_jpeg,
                    )
                    from datavec_spark.functions.png_codec import (
                        decode_png, is_png, resize_nearest, to_channels,
                    )

                    if is_png(raw):
                        try:
                            px = decode_png(raw)
                            arr = resize_nearest(to_channels(px, channels), height, width)
                            fmt = "png"
                        except (ValueError, MemoryError):
                            arr = None
                    elif is_jpeg(raw):
                        try:
                            px = decode_jpeg(raw)
                            arr = resize_nearest(to_channels(px, channels), height, width)
                            fmt = "jpeg"
                        except (ValueError, MemoryError):
                            # progressive/arithmetic/corrupt → deterministic
                            # fake; MemoryError too (r6 advice #3): a
                            # decompression-bomb-shaped baseline JPEG must
                            # not crash the Spark task — the 'never crash a
                            # task' contract beats surfacing the OOM
                            arr = None
                if arr is None:
                    arr, fmt = _fake_decode(raw, height, width, channels), "fake"
                pixels.append(arr.astype(np.float32).ravel() / 255.0)
                metas.append({"width": width, "height": height,
                              "channels": channels, "format": fmt})
            pdf = pdf.copy()
            pdf["pixels"] = pixels
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def image_features(df: DataFrame, pixels_col: str = "pixels") -> DataFrame:
    """Cheap per-image features from the decoded array — native exprs."""
    p = F.col(pixels_col)
    mean = F.aggregate(p, F.lit(0.0), lambda s, x: s + x) / F.size(p)
    return df.withColumns({
        "px_mean": F.round(mean, 6),
        "px_min": F.array_min(p),
        "px_max": F.array_max(p),
    })


def frame_sample(
    df: DataFrame, content_col: str = "content", n_frames: int = 4,
    height: int = 16, width: int = 16,
) -> DataFrame:
    """Video frame sampling stub: binary → n_frames decoded frames
    (deterministic fake), one output row per frame (UDTF-shaped expansion,
    the BaseSequenceExpansionTransform.java:39 pattern)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [T.StructField("frame_idx", T.IntegerType()),
           T.StructField("frame", T.ArrayType(T.FloatType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col]) if row[content_col] is not None else b""
                for i in range(n_frames):
                    arr = _fake_decode(data + bytes([i]), height, width, 1)
                    out = {k: v for k, v in row.items() if k != content_col}
                    out["frame_idx"] = i
                    out["frame"] = arr.astype(np.float32).ravel() / 255.0
                    rows.append(out)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(kernel, out_schema)
