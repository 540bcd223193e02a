"""Dependency-free image codecs: BMP / PPM (incl. P6 frame streams) / GIF / PNG.

The container has no PIL/ffmpeg, so the engine's real-decode leg
(operators/media.py) would otherwise be code that never executes. These are
honest format parsers for three PUBLIC formats (all header layouts from
their published specs), each ~30 lines:

- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (Windows bitmap spec) — geometry
  from the fixed-offset header fields, top-down (negative height) handled.
- PPM: netpbm ``P6``/``P5`` ASCII header (whitespace/comment tokenizer per
  the netpbm spec). Concatenated P6 frames — the ``ppm_pipe`` image2pipe
  convention — decode as a multi-frame stream (n_frames = frame count).
- GIF: GIF87a/89a logical screen descriptor + block walk; n_frames = image
  descriptor (0x2C) count, skipping extensions and color tables by their
  declared sizes (the animated-GIF frame-count rule).

Encoders exist so tests and the driver contract can synthesize REAL bytes
(actual pixel data for the small geometries used in checks) and round-trip
them through the decoders — the decode leg runs unconditionally in CI, with
PIL remaining the preferred path for formats these parsers don't cover
(reference decode behavior: annotators/base.py:77-163).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def encode_bmp(width: int, height: int) -> bytes:
    """24-bit uncompressed BMP with a deterministic pixel pattern."""
    row = width * 3
    pad = (4 - row % 4) % 4
    pixels = bytearray()
    for y in range(height):
        for x in range(width):
            pixels += bytes(((x + y) % 256, (2 * x + y) % 256, (x + 2 * y) % 256))
        pixels += b"\x00" * pad
    data_offset = 14 + 40
    file_size = data_offset + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + info + bytes(pixels)


def decode_bmp(payload: bytes) -> tuple[int, int, int]:
    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    info_size = struct.unpack_from("<I", payload, 14)[0]
    if info_size >= 40:
        width, height = struct.unpack_from("<ii", payload, 18)
    elif info_size == 12:  # OS/2 BITMAPCOREHEADER: u16 dims
        width, height = struct.unpack_from("<HH", payload, 18)
    else:
        raise ValueError(f"unsupported BMP header size {info_size}")
    return abs(width), abs(height), 1  # negative height = top-down rows


# --------------------------------------------------------------------------
# PPM / PGM (netpbm) + concatenated-frame streams
# --------------------------------------------------------------------------


def encode_ppm(width: int, height: int) -> bytes:
    """Binary P6 with a deterministic pixel pattern."""
    header = f"P6\n{width} {height}\n255\n".encode()
    pixels = bytes(
        (x + y + c) % 256 for y in range(height) for x in range(width) for c in range(3)
    )
    return header + pixels


def encode_ppm_stream(width: int, height: int, n_frames: int) -> bytes:
    """Concatenated P6 frames — the image2pipe ppm sequence convention."""
    return encode_ppm(width, height) * n_frames


def _ppm_header(payload: bytes, pos: int) -> tuple[int, int, int, int]:
    """Parse one netpbm header from ``pos``: returns (w, h, bpp, data_pos)."""
    magic = payload[pos : pos + 2]
    bands = {b"P6": 3, b"P5": 1}.get(magic)
    if bands is None:
        raise ValueError("not a binary PPM/PGM payload")
    i = pos + 2
    fields: list[int] = []
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        try:
            fields.append(int(payload[i:j]))
        except ValueError:
            raise ValueError(
                f"corrupt PPM header: non-numeric field {payload[i:j]!r} at byte {i}"
            ) from None
        i = j
    width, height, maxval = fields
    # Explicit bounds per the netpbm spec: dimensions strictly positive,
    # maxval in (0, 65536). Unchecked, a negative/zero field makes the
    # caller's frame loop advance ``pos`` by a non-positive byte count and
    # re-parse the same header forever (a hung executor task, not an error).
    if width <= 0 or height <= 0:
        raise ValueError(f"corrupt PPM header: dimensions {width}x{height} at byte {pos}")
    if not (0 < maxval < 65536):
        raise ValueError(f"corrupt PPM header: maxval {maxval} at byte {pos}")
    if maxval >= 256:
        bands *= 2  # 16-bit samples
    return width, height, bands, i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> tuple[int, int, int]:
    """Single frame or concatenated P6 stream → (w, h, n_frames)."""
    width, height, bands, pos = _ppm_header(payload, 0)
    n_frames = 1
    pos += width * height * bands
    while pos < len(payload):
        prev = pos
        w2, h2, b2, pos = _ppm_header(payload, pos)
        pos += w2 * h2 * b2
        if pos <= prev:  # defense-in-depth: a frame must consume >=1 byte
            raise ValueError(f"corrupt PPM stream: frame at byte {prev} consumed no bytes")
        n_frames += 1
    return width, height, n_frames


# --------------------------------------------------------------------------
# GIF (87a/89a), animated
# --------------------------------------------------------------------------


def encode_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    """Minimal animated GIF: header-complete, per-frame descriptors with a
    2-entry local color table and a clear+EOI LZW stream (header-level
    decoders — ours, PIL's open() — read geometry and frame count without
    touching pixel data)."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("GIF dimensions are u16")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x00, 0, 0)  # no global table
    for _ in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x80)
        out += b"\x00\x00\x00\xff\xff\xff"  # 2-entry local color table
        # LZW min code size 2: clear(4) then EOI(5), 3-bit codes LSB-packed
        out += b"\x02\x01\x2c\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, int]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    if packed & 0x80:  # global color table: 3·2^(size+1) bytes
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            pos = _skip_subblocks(payload, pos)
        elif block == 0x2C:  # image descriptor
            n_frames += 1
            _l, _t, _w, _h, fpacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(payload, pos)
        else:
            raise ValueError(f"corrupt GIF block 0x{block:02x} at {pos - 1}")
    return width, height, max(n_frames, 1)


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while pos < len(payload):
        size = payload[pos]
        pos += 1 + size
        if size == 0:
            return pos
    return pos


# --------------------------------------------------------------------------
# PNG (stdlib zlib; spec: https://www.w3.org/TR/png-3/ public chunk layout)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# bytes per pixel for 8-bit depth by color type: gray, truecolor, indexed,
# gray+alpha, truecolor+alpha
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(width: int, height: int) -> bytes:
    """Real 8-bit truecolor PNG with a deterministic pixel pattern: IHDR +
    one zlib-compressed IDAT of filter-0 scanlines + IEND, CRCs included —
    round-trips through any spec decoder (ours below, PIL where present)."""
    import zlib

    if width <= 0 or height <= 0:
        raise ValueError("PNG dimensions must be positive")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None) per scanline
        for x in range(width):
            raw += bytes(((x + y) % 256, (2 * x + y) % 256, (x + 2 * y) % 256))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int]:
    """Chunk walk → IHDR geometry, verified by REALLY inflating the IDAT
    stream and checking the unfiltered scanline payload has exactly
    height·(1 + width·bpp) bytes (so a lying header or truncated stream
    raises instead of passing). n_frames = acTL num_frames for APNG, 1
    otherwise. 8-bit depths only — others raise (PIL remains the
    wider-coverage path where importable)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bpp = 0
    n_frames = 1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError(f"corrupt PNG: truncated {ctype!r} chunk at {pos}")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, _inter = struct.unpack_from(
                ">IIBBBBB", data, 0
            )
            if width <= 0 or height <= 0:
                raise ValueError(f"corrupt PNG header: dimensions {width}x{height}")
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth {depth}, color type {color}); "
                    "only 8-bit depths decode dependency-free"
                )
            bpp = _PNG_CHANNELS[color]
        elif ctype == b"acTL":  # APNG animation control: frame count
            (n_frames,) = struct.unpack_from(">I", data, 0)
            n_frames = max(n_frames, 1)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if width is None:
        raise ValueError("corrupt PNG: no IHDR chunk")
    if not idat:
        raise ValueError("corrupt PNG: no IDAT data")
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * bpp)
    if len(raw) != expect:
        raise ValueError(
            f"corrupt PNG: inflated {len(raw)} bytes, geometry implies {expect}"
        )
    if any(raw[y * (1 + width * bpp)] > 4 for y in range(height)):
        raise ValueError("corrupt PNG: invalid scanline filter type")
    return width, height, n_frames


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------


def decode_geometry(payload: bytes) -> tuple[int, int, int]:
    """Sniff magic bytes → (width, height, n_frames). Raises ValueError
    both on formats these parsers don't cover (the caller may then try
    PIL) and on TRUNCATED/CORRUPT payloads of a recognized format — the
    parsers' internal struct/index errors must not escape as anything but
    ValueError, or the lenient fake-fallback path would crash instead of
    falling back (pinned by tests)."""
    import zlib

    try:
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] in (b"P6", b"P5"):
            return decode_ppm(payload)
        if payload[:3] == b"GIF":
            return decode_gif(payload)
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)
    except (struct.error, IndexError, zlib.error) as e:
        raise ValueError(f"corrupt {payload[:2]!r} payload: {e}") from e
    raise ValueError(f"unrecognized image magic {payload[:4]!r}")
