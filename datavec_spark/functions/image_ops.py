"""Image-array transforms over decoded pixel columns.

Reference parity: the ImageTransform family
(datavec-data-image/.../transform/CropImageTransform.java:35,
FlipImageTransform.java:33, RotateImageTransform.java:42,
ScaleImageTransform.java:35, tested in TestImageTransform.java). The
reference wraps JavaCV per image; here each op is a numpy kernel over
Arrow batches of flattened float pixel arrays (the decode_and_resize
output shape: `pixels` = h*w*c floats + known dims), so a million-image
partition processes as vectorized batches with zero per-row Python
overhead beyond the batch loop — and no codec/JavaCV dependency, because
these operate on already-decoded arrays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _map_pixels(df: DataFrame, pixels_col: str, fn, out_h: int, out_w: int,
                h: int, w: int, c: int) -> DataFrame:
    """Shared kernel runner: fn(np[h,w,c]) -> np[out_h,out_w,c]."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != pixels_col]
        + [T.StructField(pixels_col, T.ArrayType(T.FloatType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px in pdf[pixels_col]:
                arr = np.asarray(px, dtype=np.float32).reshape(h, w, c)
                out.append(fn(arr).astype(np.float32).ravel())
            pdf = pdf.copy()
            pdf[pixels_col] = out
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def crop(df: DataFrame, h: int, w: int, c: int, top: int, left: int,
         crop_h: int, crop_w: int, pixels_col: str = "pixels") -> DataFrame:
    """CropImageTransform.java:35: fixed-window crop."""
    return _map_pixels(df, pixels_col,
                       lambda a: a[top:top + crop_h, left:left + crop_w, :],
                       crop_h, crop_w, h, w, c)


def flip(df: DataFrame, h: int, w: int, c: int, mode: str = "horizontal",
         pixels_col: str = "pixels") -> DataFrame:
    """FlipImageTransform.java:33: horizontal (mirror), vertical, or both."""
    fns = {
        "horizontal": lambda a: a[:, ::-1, :],
        "vertical": lambda a: a[::-1, :, :],
        "both": lambda a: a[::-1, ::-1, :],
    }
    return _map_pixels(df, pixels_col, fns[mode], h, w, h, w, c)


def rotate90(df: DataFrame, h: int, w: int, c: int, turns: int = 1,
             pixels_col: str = "pixels") -> DataFrame:
    """RotateImageTransform.java:42 restricted to exact quarter turns
    (lossless; arbitrary-angle rotation needs an interpolating codec lib)."""
    turns = turns % 4
    out_h, out_w = (h, w) if turns % 2 == 0 else (w, h)
    return _map_pixels(df, pixels_col, lambda a: np.rot90(a, k=turns),
                       out_h, out_w, h, w, c)


def scale(df: DataFrame, h: int, w: int, c: int, out_h: int, out_w: int,
          pixels_col: str = "pixels") -> DataFrame:
    """ScaleImageTransform.java:35: nearest-neighbor resize (pure numpy
    index math — no interpolation library)."""
    ri = (np.arange(out_h) * h // out_h)
    ci = (np.arange(out_w) * w // out_w)

    return _map_pixels(df, pixels_col, lambda a: a[np.ix_(ri, ci)],
                       out_h, out_w, h, w, c)
