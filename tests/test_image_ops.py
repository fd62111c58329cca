"""ImageTransform family parity tests (TestImageTransform.java analog) —
crop/flip/rotate/scale as numpy kernels over decoded pixel arrays."""

import numpy as np
import pytest

from datavec_spark.functions.image_ops import crop, flip, rotate90, scale

H, W, C = 4, 6, 1


@pytest.fixture(scope="module")
def img_df(spark):
    # deterministic gradient: pixel(r, c) = r*10 + c
    arr = np.arange(H * W, dtype=np.float32).reshape(H, W, C)
    return spark.createDataFrame(
        [(1, [float(x) for x in arr.ravel()])], "id int, pixels array<float>"
    ), arr


def _px(df):
    return np.array(df.collect()[0]["pixels"], dtype=np.float32)


def test_crop(spark, img_df):
    df, arr = img_df
    out = _px(crop(df, H, W, C, top=1, left=2, crop_h=2, crop_w=3))
    assert np.array_equal(out.reshape(2, 3, C), arr[1:3, 2:5, :])


def test_flip_modes(spark, img_df):
    df, arr = img_df
    assert np.array_equal(_px(flip(df, H, W, C, "horizontal")).reshape(H, W, C),
                          arr[:, ::-1, :])
    assert np.array_equal(_px(flip(df, H, W, C, "vertical")).reshape(H, W, C),
                          arr[::-1, :, :])
    assert np.array_equal(_px(flip(df, H, W, C, "both")).reshape(H, W, C),
                          arr[::-1, ::-1, :])


def test_rotate90(spark, img_df):
    df, arr = img_df
    out = _px(rotate90(df, H, W, C, turns=1)).reshape(W, H, C)
    assert np.array_equal(out, np.rot90(arr, 1))
    # 4 turns = identity
    out4 = _px(rotate90(df, H, W, C, turns=4)).reshape(H, W, C)
    assert np.array_equal(out4, arr)


def test_scale_nearest(spark, img_df):
    df, arr = img_df
    out = _px(scale(df, H, W, C, out_h=2, out_w=3)).reshape(2, 3, C)
    ri = np.arange(2) * H // 2
    ci = np.arange(3) * W // 3
    assert np.array_equal(out, arr[np.ix_(ri, ci)])
    # upscale round-trips every source pixel somewhere
    up = _px(scale(df, H, W, C, out_h=8, out_w=12))
    assert set(up.tolist()) == set(arr.ravel().tolist())
