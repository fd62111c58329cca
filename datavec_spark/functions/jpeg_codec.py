"""Pure-stdlib/numpy baseline JPEG codec (sequential DCT, Huffman).

Retires the JPEG entry from the acknowledged codec-stub list: the container
has no PIL/libjpeg, but *baseline* JFIF — the overwhelming shape of a web
image corpus — is fully specified in public ITU-T T.81 (Annex F sequential
DCT + Annex K reference tables) and needs only `struct` and numpy. Scope:

- decode: baseline sequential (SOF0/SOF1), 8-bit, 1 component (grey) or
  3 components (JFIF YCbCr, any H/V sampling factors ≤ 2 — covers 4:4:4,
  4:2:2, 4:2:0), restart intervals (DRI/RSTn), multi-table DQT/DHT
  segments. Everything else (progressive SOF2, arithmetic coding, 12-bit,
  CMYK/4-component, hierarchical) raises ValueError — the mapInPandas
  caller's guard falls back to the deterministic fake, same contract as an
  undecodable byte blob (multimodal.py codec chain).
- encode: baseline fixture/writer path — 4:4:4 or 4:2:0, IJG-style quality
  scaling of the Annex K quantisation tables, per-image canonical Huffman
  tables computed from actual symbol counts (fixed-length canonical codes:
  valid per the spec, simple, and independent of the Annex K code tables
  the decoder would otherwise share — so round-trip tests do not reuse one
  table definition on both sides).

Entropy (de)coding is a per-block Python loop — fine here for the same
reason as png_codec.py: image decode is per-file CPU work inside an
Arrow-batched mapInPandas kernel; the dequant + IDCT runs batched over all
blocks of a component in one numpy einsum, and the *plumbing* stays
vectorized.

Reference parity: ImageRecordReader.java:33 / NativeImageLoader decode
path (the reference links libjpeg via JavaCV) — reimplemented from the
public T.81 spec, not from the reference.
"""

from __future__ import annotations

import math
import struct

import numpy as np

PIXEL_CAP = 1 << 26  # 64M pixels — sanity cap before any allocation

# ---------------------------------------------------------------- tables

# zig-zag scan order: index k -> (row, col); odd diagonals run top-right
# to bottom-left, even diagonals the reverse (T.81 Figure 5)
_ZIGZAG = [
    (r, s - r)
    for s in range(15)
    for r in (range(max(0, s - 7), min(8, s + 1)) if s % 2
              else reversed(range(max(0, s - 7), min(8, s + 1))))
]
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# orthonormal 8-point DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C
_DCT = np.array(
    [[math.cos((2 * x + 1) * u * math.pi / 16)
      * (math.sqrt(1.0 / 8) if u == 0 else math.sqrt(2.0 / 8))
      for x in range(8)] for u in range(8)]
)

# Annex K.1 reference quantisation tables (public spec)
_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------- decode


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman per T.81 C.2: (code length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("DHT value list shorter than BITS counts")
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    RSTn markers are consumed only via restart() at MCU boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        if self.p >= len(self.d):
            raise ValueError("entropy stream truncated")
        b = self.d[self.p]
        if b == 0xFF:
            nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else None
            if nxt != 0x00:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy stream"
                                 if nxt is not None else "truncated at 0xFF")
            self.p += 2
            return 0xFF
        self.p += 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self, idx: int) -> None:
        self.n = 0  # byte-align
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them (a fill byte is a 0xFF whose successor is
        # another 0xFF; the final 0xFF is the marker prefix itself)
        while (self.p + 1 < len(self.d) and self.d[self.p] == 0xFF
               and self.d[self.p + 1] == 0xFF):
            self.p += 1
        if (self.p + 1 >= len(self.d) or self.d[self.p] != 0xFF
                or self.d[self.p + 1] != 0xD0 + (idx & 7)):
            raise ValueError("expected restart marker RST%d" % (idx & 7))
        self.p += 2


def _decode_sym(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code (no match within 16 bits)")


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: map t low-order bits to the signed amplitude
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (height, width, channels) uint8 (channels 1 or 3).

    EVERY decode failure raises ValueError (same contract as decode_png):
    a valid SOI with a corrupt body — truncated segment, bad Huffman code,
    marker mid-stream — must not crash a Spark task; the mapInPandas
    caller catches ValueError and falls back to the deterministic fake."""
    try:
        return _decode_inner(data)
    except (ValueError, MemoryError):
        raise
    except Exception as exc:  # struct.error, IndexError, ...
        raise ValueError(f"corrupt JPEG body: {type(exc).__name__}: {exc}") from exc


def _decode_inner(data: bytes) -> np.ndarray:
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}       # Tq -> (64,) zigzag-order ints
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None                            # (h, w, comps)
    while True:
        if pos + 4 > len(data):
            raise ValueError("ran off segment stream before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {data[pos]:#x}")
        marker = data[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI with no scan (standalone marker, no length)
            raise ValueError("EOI before SOS (no image data)")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: standalone
            raise ValueError(f"unexpected standalone marker 0xFF{marker:02X}")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT: one or more tables
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(body, dtype=np.uint8,
                                        count=64, offset=off).astype(np.int32)
                    off += 64
                else:
                    tbl = np.frombuffer(body, dtype=">u2",
                                        count=64, offset=off).astype(np.int32)
                    off += 128
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT: one or more tables
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = body[off + 17:off + 17 + n]
                off += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline sequential
            prec, h, w, nf = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if nf not in (1, 3):
                raise ValueError(f"unsupported component count {nf}")
            if h == 0 or w == 0 or h * w > PIXEL_CAP:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                hi, vi = hv >> 4, hv & 15
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(f"unsupported sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process SOF{marker - 0xC0}")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            return _decode_scan(data, pos, frame, scan, quant,
                                huff_dc, huff_ac, restart_interval)
        # else: APPn / COM / others — skipped
    raise ValueError("no SOS marker")  # pragma: no cover


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("scan component count != frame component count")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        c = dict(by_id[cs])
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("scan references undefined Huffman table")
        if c["tq"] not in quant:
            raise ValueError("frame references undefined quant table")
        c["dc"], c["ac"], c["q"] = huff_dc[td], huff_ac[ta], quant[c["tq"]]
        order.append(c)

    hmax = max(c["h"] for c in order)
    vmax = max(c["v"] for c in order)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in order:
        c["bw"] = mcux * c["h"]          # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0

    r = _BitReader(data, pos)
    n_mcus = mcux * mcuy
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            r.restart(m // restart_interval - 1)
            for c in order:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in order:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = c["coef"][(my * c["v"] + v) * c["bw"]
                                    + mx * c["h"] + hh]
                    # DC
                    t = _decode_sym(r, c["dc"])
                    if t > 11:
                        raise ValueError(f"bad DC category {t}")
                    c["pred"] += _extend(r.bits(t), t) if t else 0
                    blk[0] = c["pred"]
                    # AC
                    k = 1
                    while k < 64:
                        rs = _decode_sym(r, c["ac"])
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break          # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        blk[k] = _extend(r.bits(size), size)
                        k += 1

    planes = []
    for c in order:
        # batched dequant + dezigzag + IDCT over every block of the plane
        f = np.zeros((c["coef"].shape[0], 8, 8), dtype=np.float64)
        f[:, _ZZ_ROWS, _ZZ_COLS] = c["coef"] * c["q"][None, :]
        px = np.einsum("ij,njk,kl->nil", _DCT.T, f, _DCT) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        plane = (px.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8))
        # upsample to full MCU-padded resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w].astype(np.float64))

    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)
        out.append(t)
    return out[0], out[1]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _block_symbols(coef_zz: np.ndarray, pred: int) -> tuple[list, list, int]:
    """One quantised zigzag block → (dc symbols, ac symbols, new pred).
    Symbols are (code, amplitude_value, amplitude_bits) triples."""
    dc = int(coef_zz[0])
    diff = dc - pred
    t = _category(diff)
    dcs = [(t, _amplitude(diff, t), t)]
    acs = []
    run = 0
    nz = np.nonzero(coef_zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        acs.append(((run << 4) | s, _amplitude(v, s), s))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))  # EOB
    return dcs, acs, dc


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Canonical fixed-length Huffman table over the symbols that actually
    occur: every symbol gets length L = ceil(log2(n+1)) — the +1 keeps the
    all-ones code unassigned, as T.81 requires. Valid (if suboptimal)
    baseline Huffman; deliberately NOT the Annex K tables the decoder
    exercises in the wild, so round-trips don't share table definitions."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length()) if n else 1
    while (1 << length) - 1 < n:  # need n codes, all-ones excluded
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {v: (code, length) for code, v in enumerate(vals)}
    return bits, bytes(vals), enc


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "4:4:4", restart_interval: int = 0) -> bytes:
    """(h, w) / (h, w, 1) uint8 grey or (h, w, 3) uint8 RGB → baseline JFIF
    bytes. Fixture/writer helper (the reference's ImageWriter role)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError(f"encode_jpeg needs 1 or 3 channels, got {ch}")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    ql, qc = _quality_tables(quality)
    ql_zz = ql[_ZZ_ROWS, _ZZ_COLS]
    qc_zz = qc[_ZZ_ROWS, _ZZ_COLS]

    if ch == 3:
        rgb = a.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsampling == "4:2:0":
            sf = [(2, 2), (1, 1), (1, 1)]
            cb = _halve(cb)
            cr = _halve(cr)
        elif subsampling == "4:2:2":
            sf = [(2, 1), (1, 1), (1, 1)]
            cb = _halve_h(cb)
            cr = _halve_h(cr)
        else:
            sf = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qz = [ql_zz, qc_zz, qc_zz]
    else:
        planes = [a[:, :, 0].astype(np.float64)]
        sf = [(1, 1)]
        qz = [ql_zz]

    hmax = max(s[0] for s in sf)
    vmax = max(s[1] for s in sf)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per component: pad plane to its block grid, forward DCT all blocks
    comp_blocks = []
    for plane, (hi, vi), q in zip(planes, sf, qz):
        bw, bh = mcux * hi, mcuy * vi
        ph, pw = bh * 8, bw * 8
        padded = np.empty((ph, pw), dtype=np.float64)
        ih, iw = plane.shape
        padded[:ih, :iw] = plane
        padded[ih:, :iw] = plane[ih - 1:ih, :]          # edge-replicate pad
        padded[:, iw:] = padded[:, iw - 1:iw]
        blocks = (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(bh * bw, 8, 8) - 128.0)
        f = np.einsum("ij,njk,kl->nil", _DCT, blocks, _DCT.T)
        zz = f[:, _ZZ_ROWS, _ZZ_COLS]
        coef = np.round(zz / q[None, :]).astype(np.int32)
        comp_blocks.append({"coef": coef, "bw": bw, "h": hi, "v": vi})

    # pass 1: symbol streams per MCU (+ restart resets), collecting alphabets
    n_tables = 2 if ch == 3 else 1  # table id 0 = luma, 1 = chroma
    dc_syms = [set() for _ in range(n_tables)]
    ac_syms = [set() for _ in range(n_tables)]
    stream = []          # (table_id, is_ac, code, amp, ampbits)
    preds = [0] * len(planes)
    n_mcus = mcux * mcuy
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            stream.append(("RST", (m // restart_interval - 1) & 7, 0, 0, 0))
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comp_blocks):
            tid = 0 if ci == 0 else 1
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    idx = (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
                    dcs, acs, preds[ci] = _block_symbols(c["coef"][idx], preds[ci])
                    for code, amp, ab in dcs:
                        dc_syms[tid].add(code)
                        stream.append((tid, 0, code, amp, ab))
                    for code, amp, ab in acs:
                        ac_syms[tid].add(code)
                        stream.append((tid, 1, code, amp, ab))

    dc_tabs = [_fixed_length_table(s) for s in dc_syms]
    ac_tabs = [_fixed_length_table(s) for s in ac_syms]

    # pass 2: emit
    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"       # APP0
    dqt = bytearray([0x00]) + bytes(ql_zz.astype(np.uint8))
    if ch == 3:
        dqt += bytearray([0x01]) + bytes(qc_zz.astype(np.uint8))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytearray([ch])
    for ci, (hi, vi) in enumerate(sf):
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytearray()
    for tid in range(n_tables):
        for cls, (bits, vals, _enc) in ((0, dc_tabs[tid]), (1, ac_tabs[tid])):
            dht += bytes([(cls << 4) | tid]) + bytes(bits) + vals
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([ch])
    for ci in range(ch):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw_ = _BitWriter()
    for item in stream:
        if item[0] == "RST":
            bw_.flush()
            out += bw_.out
            bw_.out = bytearray()
            out += bytes([0xFF, 0xD0 + item[1]])
            continue
        tid, is_ac, code, amp, ab = item
        enc = (ac_tabs if is_ac else dc_tabs)[tid][2]
        c, length = enc[code]
        bw_.write(c, length)
        if ab:
            bw_.write(amp, ab)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def _halve(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge replication for odd dims."""
    h, w = plane.shape
    if h % 2:
        plane = np.vstack([plane, plane[-1:, :]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    h2, w2 = plane.shape
    return plane.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))


def _halve_h(plane: np.ndarray) -> np.ndarray:
    """Horizontal-only 2x box average (4:2:2 chroma)."""
    h, w = plane.shape
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return plane.reshape(h, plane.shape[1] // 2, 2).mean(axis=2)
