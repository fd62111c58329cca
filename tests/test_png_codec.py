"""Pure-stdlib PNG codec tests: filter-type round-trips, color types,
palette expansion, unsupported-feature rejection, and the Spark
decode_and_resize path producing a REAL decode (format='png') without PIL."""

import struct
import zlib

import numpy as np
import pytest

from datavec_spark.functions.png_codec import (
    decode_png, encode_png, is_png, resize_nearest, to_channels,
)

RNG = np.random.RandomState(7)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter(filter_type):
    arr = RNG.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    data = encode_png(arr, filter_type=filter_type)
    assert is_png(data)
    out = decode_png(data)
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_color_types(channels):
    arr = RNG.randint(0, 256, size=(4, 4, channels), dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_type=2))
    assert out.shape == (4, 4, channels)
    assert np.array_equal(out, arr)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def test_palette_expansion():
    # hand-built color-type-3 PNG: 2x2 indices into a 3-color palette
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    data = (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))
    out = decode_png(data)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, palette[idx])


def test_rejects_unsupported():
    arr = RNG.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    good = encode_png(arr)
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    # corrupt the IHDR bit depth to 16
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (good[:8] + _chunk(b"IHDR", bad_ihdr) + good[8 + 12 + 13:])
    with pytest.raises(ValueError):
        decode_png(bad)
    # interlaced flag
    il_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    il = (good[:8] + _chunk(b"IHDR", il_ihdr) + good[8 + 12 + 13:])
    with pytest.raises(ValueError):
        decode_png(il)


def test_resize_and_channels():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8, 1)
    assert up[0, 0, 0] == arr[0, 0, 0] and up[7, 7, 0] == arr[3, 3, 0]
    rgb = to_channels(arr, 3)
    assert rgb.shape == (4, 4, 3) and np.array_equal(rgb[:, :, 0], arr[:, :, 0])
    grey = to_channels(rgb, 1)
    assert np.array_equal(grey, arr)  # pure grey survives the luma round-trip
    rgba = RNG.randint(0, 256, size=(2, 2, 4), dtype=np.uint8)
    assert np.array_equal(to_channels(rgba, 3), rgba[:, :, :3])


def test_spark_decode_and_resize_real_png(spark):
    """decode_and_resize yields a REAL decode (format='png', exact pixels)
    for PNG bytes with no PIL in the environment; non-PNG bytes still get
    the deterministic fake."""
    from datavec_spark.functions.multimodal import decode_and_resize

    arr = RNG.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    png = encode_png(arr, filter_type=1)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image"))],
        "id int, content binary",
    )
    out = {r["id"]: r for r in
           decode_and_resize(df, height=4, width=4, channels=3).collect()}
    assert out[1]["meta"]["format"] == "png"
    got = np.round(np.array(out[1]["pixels"], dtype=np.float32)
                   .reshape(4, 4, 3) * 255.0).astype(np.uint8)
    assert np.array_equal(got, arr)
    assert out[2]["meta"]["format"] == "fake"
    assert len(out[2]["pixels"]) == 4 * 4 * 3
