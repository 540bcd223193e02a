"""Dependency-free baseline JPEG codec (encode + decode, ITU-T T.81).

The container has no PIL, so JPEG was the one image format whose decode
branch (operators/media.py PIL fallback) could never execute in CI — the
same gap the round-3 PNG codec closed for zlib-compressed payloads
(reference decode behavior: annotators/base.py:77-163 operates on real
PNG/JPEG bytes). This module closes it for JPEG with an honest,
spec-faithful *baseline sequential* implementation:

- ``encode_jpeg(w, h, pixel)``: JFIF output — Annex K.1/K.2 quantization
  tables (quality-50, used as published), Annex K.3 standard Huffman
  tables, 4:4:4 sampling (no subsampling, so the decoded luma is the
  DCT round-trip of BT.601 Y alone), optional restart intervals.
- ``decode_jpeg(payload) -> (w, h, 1)``: header walk (DQT/DHT/SOF/DRI/
  SOS) with structural validation of the entropy-coded segment — the
  scan must terminate at EOI with only stuffed/restart markers inside,
  so truncated or garbage payloads raise ValueError instead of passing.
- ``decode_jpeg_gray(payload) -> (w, h, luma bytes)``: the REAL decode —
  canonical Huffman decode, dequantize, 8x8 IDCT, restart handling,
  generic h/v sampling factors with pixel-replication upsample; returns
  the Y component (JPEG's Y *is* BT.601 luma, the same definition
  ``imagecodec._luma`` floors for the lossless formats).

Everything here is from the public T.81 spec (marker layout §B, Huffman
coding §C/§F, the example tables in Annex K). Determinism: the IDCT is a
fixed 8x8 float64 matrix product followed by rint — the same function
runs in the Spark kernel and in the pure-Python golden chain, so decoded
bytes are identical in both engines.

progressive/arithmetic/12-bit JPEGs raise ValueError("unsupported ...")
— PIL remains the wider-coverage path where importable.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K — published example tables)
# --------------------------------------------------------------------------

# K.1 luminance / K.2 chrominance quantization (natural row-major order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# zigzag scan: natural (row-major) index of each zigzag position (§A.3.6)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUMA_VALS = tuple(range(12))
_DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
_DC_CHROMA_VALS = tuple(range(12))

_AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

_AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
_AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# orthonormal 8x8 DCT-II basis: forward F = C @ B @ C.T, inverse B = C.T @ F @ C
_C = np.array([
    [
        (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


def _canonical_codes(bits, vals):
    """§C.2 canonical code assignment → {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """Same assignment, keyed for decode: {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with §B.1.1.5 0xFF→0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if not length:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        """Pad to a byte boundary with 1-bits (§F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, block, qtab, dc_tbl, ac_tbl, pred):
    coef = _C @ block @ _C.T
    q = np.rint(coef / qtab).astype(np.int64)
    zz = q.flatten()[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _mag(diff)
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _mag(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _zz_bytes(qtab: np.ndarray) -> bytes:
    return bytes(int(v) for v in qtab.flatten()[_ZIGZAG])


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (the public libjpeg rule:
    scale = 5000/Q below 50, 200-2Q at or above; entries clamped to
    1..255). quality=50 returns the table as published."""
    if not (1 <= quality <= 100):
        raise ValueError("JPEG quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)


def encode_jpeg(
    width: int,
    height: int,
    pixel=None,
    restart_interval: int = 0,
    quality: int = 50,
) -> bytes:
    """Baseline JFIF, 3-component 4:4:4, Annex K tables scaled by the IJG
    ``quality`` rule (50 = the tables as published). ``pixel`` defaults
    to the shared deterministic texture every encoder in this package uses
    (imagecodec.pattern_rgb) so the same geometry draws the same IMAGE —
    though unlike the lossless encoders, the decoded pixels are the DCT
    round-trip of that image, not the exact bytes."""
    if pixel is None:
        from .imagecodec import pattern_rgb as pixel  # no import cycle: lazy
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("JPEG dimensions must be in 1..65535")
    q_luma = _scaled_quant(_Q_LUMA, quality)
    q_chroma = _scaled_quant(_Q_CHROMA, quality)

    rgb = np.array(
        [[pixel(x, y) for x in range(width)] for y in range(height)],
        dtype=np.float64,
    )
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    # JFIF BT.601 full-range transform, already level-shifted by -128
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b - 128.0,
        -0.168736 * r - 0.331264 * g + 0.5 * b,
        0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    pw, ph = -(-width // 8) * 8, -(-height // 8) * 8
    planes = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge") for p in planes
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65 + 65)
    out += b"\x00" + _zz_bytes(q_luma) + b"\x01" + _zz_bytes(q_chroma)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes((1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    for tclass_id, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out += bytes((tclass_id,)) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    bw = _BitWriter()
    preds = [0, 0, 0]
    qtabs = (q_luma, q_chroma, q_chroma)
    tsel = (0, 1, 1)
    blocks_x, blocks_y = pw // 8, ph // 8
    rst = 0
    for m in range(blocks_x * blocks_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.buf
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0, 0, 0]
        by, bx = divmod(m, blocks_x)
        for c in range(3):
            block = planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            preds[c] = _encode_block(
                bw, block, qtabs[c], _ENC_DC[tsel[c]], _ENC_AC[tsel[c]], preds[c]
            )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs 0xFF00.
    Raises ValueError when the stream runs into a real marker or EOF —
    corrupt payloads fail loudly rather than decode garbage."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("corrupt JPEG: entropy data truncated")
                if self.data[self.pos] != 0x00:
                    raise ValueError(
                        f"corrupt JPEG: marker 0x{self.data[self.pos]:02x} inside scan"
                    )
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _parse(payload: bytes):
    """Marker walk up to (and including) SOS. Returns
    (frame, qt, hdc, hac, dri, scan, entropy_pos) where frame =
    (width, height, [(comp_id, h, v, tq), ...])."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    frame = None
    dri = 0
    while True:
        if pos + 2 > len(payload) or payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        while pos < len(payload) and payload[pos] == 0xFF:  # §B.1.1.2 fill bytes
            pos += 1
        if pos >= len(payload):
            raise ValueError("corrupt JPEG: truncated before SOS")
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:
            raise ValueError("corrupt JPEG: EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            raise ValueError(f"corrupt JPEG: standalone marker 0x{marker:02x} in header")
        if pos + 2 > len(payload):
            raise ValueError("corrupt JPEG: truncated segment length")
        (length,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + length]
        if length < 2 or len(seg) != length - 2:
            raise ValueError(f"corrupt JPEG: truncated 0x{marker:02x} segment")
        end = pos + length
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                n = 64 * (2 if pq else 1)
                raw = seg[i + 1 : i + 1 + n]
                if pq > 1 or len(raw) < n:
                    raise ValueError("corrupt JPEG: bad DQT table")
                qt[tq] = np.frombuffer(
                    raw, dtype=">u2" if pq else np.uint8
                ).astype(np.float64)
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("corrupt JPEG: truncated DHT")
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = tuple(seg[i + 1 : i + 17])
                total = sum(bits)
                vals = tuple(seg[i + 17 : i + 17 + total])
                if tc > 1 or len(vals) < total:
                    raise ValueError("corrupt JPEG: bad DHT table")
                (hdc if tc == 0 else hac)[th] = _decode_table(bits, vals)
                i += 17 + total
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            precision = seg[0]
            h, w = struct.unpack_from(">HH", seg, 1)
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            if w == 0 or h == 0:
                raise ValueError(f"corrupt JPEG header: dimensions {w}x{h}")
            ncomp = seg[5]
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("corrupt JPEG: truncated SOF")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"corrupt JPEG: sampling {hi}x{vi}")
                comps.append((cid, hi, vi, seg[8 + 3 * c]))
            frame = (int(w), int(h), comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG (SOF marker 0x{marker:02x}: progressive/"
                "arithmetic/lossless) — only baseline sequential decodes "
                "dependency-free"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("corrupt JPEG: truncated SOS")
            scan = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            return frame, qt, hdc, hac, dri, scan, end
        pos = end


def decode_jpeg(payload: bytes) -> tuple[int, int, int]:
    """Header walk → (width, height, 1), with the entropy-coded segment
    structurally validated: only stuffed 0xFF00 and RST markers may appear
    inside, and the scan must terminate at EOI — so truncation and
    garbage raise instead of returning a lying geometry."""
    try:
        frame, _qt, _hdc, _hac, _dri, _scan, pos = _parse(payload)
        i = pos
        while i + 1 < len(payload):
            if payload[i] == 0xFF:
                m = payload[i + 1]
                if m == 0x00 or 0xD0 <= m <= 0xD7:
                    i += 2
                    continue
                if m == 0xD9:
                    return frame[0], frame[1], 1
                raise ValueError(f"corrupt JPEG: unexpected marker 0x{m:02x} in scan")
            i += 1
        raise ValueError("corrupt JPEG: missing EOI")
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG payload: {e}") from e


def _decode_sym(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_block(reader, dc_tbl, ac_tbl, qtab_zz, pred):
    coef = np.zeros(64)
    s = _decode_sym(reader, dc_tbl)
    if s > 11:
        raise ValueError("corrupt JPEG: DC category > 11")
    diff = _extend(reader.bits(s), s) if s else 0
    pred += diff
    coef[0] = pred * qtab_zz[0]
    k = 1
    while k < 64:
        sym = _decode_sym(reader, ac_tbl)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 15
        k += run
        if k > 63 or size == 0:
            raise ValueError("corrupt JPEG: AC run past block end")
        coef[k] = _extend(reader.bits(size), size) * qtab_zz[k]
        k += 1
    block = np.zeros(64)
    block[_ZIGZAG] = coef
    block = block.reshape(8, 8)
    return _C.T @ block @ _C, pred


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Full baseline decode → (width, height, Y-channel bytes, top-down
    row-major). Returns JPEG's own Y component — the BT.601 luma the
    lossless decoders compute via ``imagecodec._luma`` — upsampled by
    pixel replication when Y is subsampled (it isn't, in any real
    encoder, but the MCU walk handles generic h/v factors)."""
    try:
        frame, qt, hdc, hac, dri, scan, pos = _parse(payload)
        w, h, comps = frame
        comp_by_id = {c[0]: c for c in comps}
        if len(scan) != len(comps):
            # a partial scan uses non-interleaved per-component MCU
            # geometry — refuse rather than walk the wrong grid
            raise ValueError(
                "unsupported JPEG: non-interleaved multi-scan layout "
                f"(scan has {len(scan)} of {len(comps)} components)"
            )
        for cid, _td, _ta in scan:
            if cid not in comp_by_id:
                raise ValueError(f"corrupt JPEG: scan component {cid} not in frame")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        planes = {
            cid: np.zeros((mcuy * vi * 8, mcux * hi * 8))
            for cid, hi, vi, _tq in comps
        }
        preds = {cid: 0 for cid, *_ in comps}
        reader = _BitReader(payload, pos)
        rst = 0
        for m in range(mcux * mcuy):
            if dri and m and m % dri == 0:
                rpos = reader.pos  # byte-align: drop pad bits with the buffer
                if payload[rpos : rpos + 2] != bytes((0xFF, 0xD0 + rst)):
                    raise ValueError(f"corrupt JPEG: expected RST{rst} at byte {rpos}")
                reader = _BitReader(payload, rpos + 2)
                rst = (rst + 1) % 8
                preds = {cid: 0 for cid in preds}
            my, mx = divmod(m, mcux)
            for cid, td, ta in scan:
                _, hi, vi, tq = comp_by_id[cid]
                if td not in hdc or ta not in hac or tq not in qt:
                    raise ValueError("corrupt JPEG: scan references missing table")
                for v in range(vi):
                    for hh in range(hi):
                        block, preds[cid] = _decode_block(
                            reader, hdc[td], hac[ta], qt[tq], preds[cid]
                        )
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
        cid0, hi0, vi0, _ = comps[0]
        yplane = planes[cid0]
        if (hi0, vi0) != (hmax, vmax):
            # integer replication only: a legal-but-exotic frame whose luma
            # factor does not divide the max factor (e.g. Y=3x3, C=4x4)
            # would otherwise floor-divide to a too-small plane and return
            # fewer than w*h luma bytes, breaking the documented contract
            if vmax % vi0 or hmax % hi0:
                raise ValueError(
                    "unsupported JPEG: luma sampling factors "
                    f"{hi0}x{vi0} do not divide max factors {hmax}x{vmax}"
                )
            yplane = np.repeat(
                np.repeat(yplane, vmax // vi0, axis=0), hmax // hi0, axis=1
            )
        out = np.clip(np.rint(yplane) + 128.0, 0, 255).astype(np.uint8)[:h, :w]
        return w, h, out.tobytes()
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG payload: {e}") from e
