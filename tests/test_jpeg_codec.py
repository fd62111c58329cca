"""Baseline JPEG codec tests: encode/decode round trips across
subsampling modes, restart markers, hand-computed DC-only vectors,
unsupported-process rejection, and the Spark decode_and_resize path
producing a REAL decode (format='jpeg') without PIL.

The encoder deliberately uses per-image fixed-length canonical Huffman
tables while a wild-file decoder exercises arbitrary canonical tables —
so encode→decode is not a single shared table definition tested against
itself; the hand-built vectors below additionally pin decode behavior
with no encoder involvement at all.
"""

import struct

import numpy as np
import pytest

from datavec_spark.functions.jpeg_codec import (
    decode_jpeg, encode_jpeg, is_jpeg,
)

RNG = np.random.RandomState(11)


def test_is_jpeg():
    assert is_jpeg(b"\xff\xd8\xff\xe0rest")
    assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
    assert not is_jpeg(b"")


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_solid_color_exact(subsampling):
    """A solid color is DC-only: decode must recover it within the YCbCr
    round-trip quantum (±2), in every subsampling mode, odd dims included."""
    img = np.full((17, 13, 3), (200, 80, 40), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert out.shape == (17, 13, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_gradient_roundtrip_quality95():
    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack([(yy * 8) % 256, (xx * 8) % 256, ((yy + xx) * 4) % 256],
                   axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 12
    assert diff.mean() <= 3.0


def test_grayscale_roundtrip():
    yy, _ = np.mgrid[0:24, 0:32]
    img = (yy * 10 % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (24, 32, 1)
    assert int(np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()) <= 2


def test_restart_markers():
    """DRI/RSTn: encode with a 2-MCU restart interval, decode must resync
    and reset DC predictors — a predictor bug shows up as banding, i.e.
    large diffs past the first restart."""
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack([(yy * 11) % 256, (xx * 7) % 256, ((yy * xx) // 3) % 256],
                   axis=2).astype(np.uint8)
    data = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI emitted
    out = decode_jpeg(data)
    # the quantised coefficients are identical with and without restarts,
    # so the two decodes must agree EXACTLY — any resync/predictor bug
    # diverges from the first restart onward
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.array_equal(out, plain)


def test_dc_only_hand_vector():
    """Decoder-only check (no encoder in the loop): constant grey 128 means
    every level-shifted sample is 0, every coefficient 0 — any valid JPEG
    of it decodes to exactly 128. Built by hand with an explicit Huffman
    table: DC symbol 0 (code '0', length 1), AC EOB symbol 0 (code '0')."""
    # quant table: all ones (zigzag order), id 0, 8-bit precision
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0: 8-bit, 8x8, 1 component id=1, 1x1 sampling, quant 0
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    # DHT: DC table 0 = {symbol 0 at length 1}; AC table 0 = {symbol 0 at length 1}
    dc = b"\x00" + bytes([1] + [0] * 15) + b"\x00"
    ac = b"\x10" + bytes([1] + [0] * 15) + b"\x00"
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dc) + len(ac)) + dc + ac
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + bytes([1, 0x00]) \
        + bytes([0, 63, 0])
    # scan: DC code '0' (category 0, no amplitude) + AC EOB '0' → bits '00',
    # padded with 1s to one byte: 0b00111111
    scan = bytes([0b00111111])
    data = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out, np.full((8, 8, 1), 128, dtype=np.uint8))


def test_dc_amplitude_hand_vector():
    """Same hand-built frame but DC category 2, amplitude bits '11' (+3):
    coefficient 3 with quant 1 → plane = round(3/8 * 1) + 128 = 128.375 →
    128... use quant 16 instead: DC=3*16=48 → pixel = 48/8 + 128 = 134."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    # DC table: symbols {0:'0', 2:'10'} → bits: one len-1, one len-2
    dc = b"\x00" + bytes([1, 1] + [0] * 14) + bytes([0, 2])
    ac = b"\x10" + bytes([1] + [0] * 15) + b"\x00"
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dc) + len(ac)) + dc + ac
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + bytes([1, 0x00]) \
        + bytes([0, 63, 0])
    # bits: DC sym 2 = '10', amplitude '11' (=3), AC EOB '0' → '10110' + pad
    scan = bytes([0b10110111])
    data = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    out = decode_jpeg(data)
    # orthonormal IDCT of DC-only block: pixel = DC/8 + 128 = 48/8 + 128
    assert np.array_equal(out, np.full((8, 8, 1), 134, dtype=np.uint8))


def test_rejects_unsupported():
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_jpeg(img, quality=90)
    # progressive: flip SOF0 marker to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(prog)
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not an image")
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[:len(good) - (len(good) - good.find(b"\xff\xda")) // 2])
    # implausible dims: SOI + DQT + SOF claiming 65535x65535
    with pytest.raises(ValueError, match="implausible"):
        bomb = bytearray(good)
        i = bomb.find(b"\xff\xc0")
        struct.pack_into(">HH", bomb, i + 5, 65535, 65535)
        decode_jpeg(bytes(bomb))


def test_spark_decode_and_resize_real_jpeg(spark):
    """decode_and_resize yields a REAL decode (format='jpeg') for baseline
    JPEG bytes with no PIL; a progressive JPEG falls back to the
    deterministic fake (format='fake') instead of failing the task."""
    from datavec_spark.functions.multimodal import decode_and_resize

    img = np.full((8, 8, 3), (10, 180, 60), dtype=np.uint8)
    good = encode_jpeg(img, quality=95)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(prog))],
        "id int, content binary",
    )
    out = {r["id"]: r for r in
           decode_and_resize(df, height=8, width=8, channels=3).collect()}
    assert out[1]["meta"]["format"] == "jpeg"
    got = np.round(np.array(out[1]["pixels"], dtype=np.float32)
                   .reshape(8, 8, 3) * 255.0).astype(np.uint8)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2
    assert out[2]["meta"]["format"] == "fake"


def test_decode_tolerates_fill_bytes_before_restart_markers():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes; a
    spec-legal encoder may pad before RSTn. Insert a fill byte before
    every restart marker of a restart-interval stream and require the
    decode to be identical (r6 advice #5)."""
    import numpy as np

    from datavec_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    enc = encode_jpeg(img, quality=90, restart_interval=2)
    # find RSTn markers (0xFFD0-0xFFD7) in the entropy stream and pad them
    padded = bytearray()
    i = 0
    n_padded = 0
    while i < len(enc):
        if (enc[i] == 0xFF and i + 1 < len(enc)
                and 0xD0 <= enc[i + 1] <= 0xD7):
            padded.append(0xFF)  # fill byte before the marker
            n_padded += 1
        padded.append(enc[i])
        i += 1
    assert n_padded > 0, "fixture must actually contain restart markers"
    base = decode_jpeg(enc)
    filled = decode_jpeg(bytes(padded))
    assert np.array_equal(base, filled)
