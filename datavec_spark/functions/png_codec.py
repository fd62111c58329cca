"""Pure-stdlib PNG codec (zlib inflate + scanline unfilter).

Retires the last acknowledged codec stub in the multimodal path: the
container has no PIL, but PNG is just zlib-compressed filtered scanlines
(public spec: RFC 2083 / W3C PNG), so a real decode needs only `zlib` and
`struct`. Supports the common web corpus shape — 8-bit depth, color types
0 (grey), 2 (RGB), 3 (palette), 4 (grey+alpha), 6 (RGBA), non-interlaced —
and raises ValueError on anything else (the caller's guard falls back to
the deterministic fake, same contract as an undecodable byte blob).

The per-scanline unfilter loop is Python, which is fine here: image decode
is inherently per-file CPU work that runs inside an Arrow-batched
mapInPandas kernel; the *plumbing* stays vectorized, and a row costs
O(width · channels) numpy ops.

Reference parity: ImageRecordReader.java:33 / NativeImageLoader decode
path — reimplemented from the public PNG spec, not from the reference.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> raw channels per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == _PNG_SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (spec §6: None/Sub/Up/Average/Paeth).
    Returns (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.uint16)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


PIXEL_CAP = 1 << 26  # 64M pixels — sanity cap before any allocation


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8. Palette images are
    expanded to RGB; grey+alpha / RGBA keep their alpha channel.

    EVERY decode failure raises ValueError — a valid signature with a
    corrupt body (truncated chunk → struct.error, corrupt IDAT →
    zlib.error, palette index beyond PLTE → IndexError) must not crash a
    Spark task; the mapInPandas caller catches ValueError and falls back
    to the deterministic fake, same contract as an undecodable blob."""
    try:
        return _decode_png_inner(data)
    except (ValueError, MemoryError):
        # MemoryError is real resource exhaustion, not a corrupt input —
        # it must surface to the caller, never be masked as "bad PNG"
        # and silently replaced by the deterministic fake image.
        raise
    except Exception as exc:  # zlib.error, struct.error, IndexError, ...
        raise ValueError(f"corrupt PNG body: {type(exc).__name__}: {exc}") from exc


def _decode_png_inner(data: bytes) -> np.ndarray:
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if bitdepth != 8:
        raise ValueError(f"unsupported PNG bit depth {bitdepth} (only 8)")
    if colortype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {colortype}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if width == 0 or height == 0 or width * height > PIXEL_CAP:
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    chans = _CHANNELS[colortype]
    stride = width * chans
    # Bounded inflate: the declared dims fix the exact decompressed size,
    # so never allocate more — a crafted small-dims/multi-GB-IDAT bomb
    # otherwise inflates fully before any length check (round-4 advice
    # item #4). Leftover compressed input past the bound = bomb/corrupt.
    expected = height * (stride + 1)
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected)
    if dobj.unconsumed_tail:
        raise ValueError("PNG IDAT inflates past declared dimensions")
    if len(raw) != expected:
        raise ValueError("PNG data length mismatch")
    arr = _unfilter(raw, height, stride, chans).reshape(height, width, chans)
    if colortype == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, c) uint8 → PNG bytes (color type from channel count;
    every scanline uses `filter_type`, exercising each unfilter path in
    round-trip tests). Test/fixture helper — a writer is also an operator
    sink in its own right (writers.py family)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = a.reshape(h, stride).astype(np.int16)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(c, dtype=np.int16), cur[:-c]])
            enc = (cur - left) % 256
        elif filter_type == 2:
            enc = (cur - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(c, dtype=np.int16), cur[:-c]])
            enc = (cur - ((left + prev) >> 1)) % 256
        elif filter_type == 4:
            enc = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                up = int(prev[i])
                ul = int(prev[i - c]) if i >= c else 0
                enc[i] = (int(cur[i]) - _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def resize_nearest(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center mapping — the
    classic sampling grid), so the no-PIL decode path produces stable
    fixed-shape tensors."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.floor((np.arange(height) + 0.5) * h / height)).astype(int), h - 1)
    xs = np.minimum((np.floor((np.arange(width) + 0.5) * w / width)).astype(int), w - 1)
    return arr[ys][:, xs]


def to_channels(arr: np.ndarray, channels: int) -> np.ndarray:
    """Channel coercion: grey↔RGB, drop/ignore alpha — mirrors the
    Image.convert('RGB'|'L') step of the PIL path (ITU-R 601 luma)."""
    c = arr.shape[2]
    if channels == c:
        return arr
    if channels == 3:
        if c == 1:
            return np.repeat(arr, 3, axis=2)
        if c == 2:  # grey+alpha -> grey replicated
            return np.repeat(arr[:, :, :1], 3, axis=2)
        if c == 4:
            return arr[:, :, :3]
    if channels == 1:
        if c >= 3:
            rgb = arr[:, :, :3].astype(np.float32)
            luma = rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
            return np.round(luma).astype(np.uint8)[:, :, None]
        if c == 2:
            return arr[:, :, :1]
    raise ValueError(f"cannot coerce {c} channels to {channels}")
