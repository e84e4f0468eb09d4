"""Pure-Python image codecs: 24-bit BMP, binary PPM (P6), PNG (8-bit
truecolor), and baseline-sequential JPEG (grayscale / YCbCr 4:4:4 /
4:2:0, restart intervals).

The build contract stubs codec *libraries* (PIL/librosa are not in the
container), but nothing stops a from-scratch implementation of a public
format — the same approach `sources/avro.py` took for the Avro container
spec. This module implements, from the published format specs:

- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes), 24 bpp,
  BI_RGB (no compression), little-endian fields, pixel rows stored
  BOTTOM-UP (positive biHeight) or top-down (negative biHeight), each row
  zero-padded to a 4-byte boundary, samples in B,G,R byte order.
- PPM: 'P6' magma/whitespace header with '#' comments (width, height,
  maxval <= 255), then height rows of width R,G,B byte triples, top-down,
  no row padding.
- PNG (RFC 2083 / W3C PNG spec): 8-byte signature; big-endian length-
  prefixed chunks (IHDR/IDAT/IEND) each with a CRC-32 over type+data;
  pixel data = per-scanline filter byte + filtered bytes, concatenated
  across IDAT chunks and DEFLATE-compressed (stdlib zlib — the one
  compressed container the environment CAN decode from scratch). All five
  scanline filters (None/Sub/Up/Average/Paeth) are implemented on both
  sides; the encoder emits 8-bit truecolor (color type 2), the decoder
  also accepts 8-bit grayscale (0, replicated to RGB) and RGBA (6, alpha
  dropped — the decode contract is (h, w, 3)); non-interlaced.
- JPEG (ITU-T T.81 baseline sequential + JFIF): see the JPEG section
  further down — full marker parse, canonical Huffman entropy decode
  with 0xFF00 unstuffing and restart markers, dequant + zigzag + IDCT,
  YCbCr->RGB with chroma upsampling. Progressive/arithmetic/12-bit are
  rejected loudly. The encoder pins the DC quant step to 8 so flat 8x8
  tiles round-trip BIT-EXACTLY (every AC term of a flat block is zero),
  which is what lets a LOSSY format carry a first-principles SQL oracle.

The formats differ in every layout decision (row order, channel order,
row padding, header encoding, compression), so a decoder bug in any of
them breaks the feature parity the multimodal_decode_bmp /
multimodal_decode_png oracles check.

Used executor-side inside Arrow-batched mapInPandas (plans/multimodal.py);
nothing here touches Spark.

Reference parity note: bdt has no binary/media surface at all (SURVEY.md
§2, Tier-B extension family) — this is part of the training-data-pipeline
extension, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER_SIZE = 14 + 40  # file header + BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP.

    Rows are written bottom-up with 4-byte stride padding and B,G,R sample
    order, per the BMP spec.
    """
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    data_size = stride * h
    file_size = _BMP_HEADER_SIZE + data_size
    out = bytearray()
    # BITMAPFILEHEADER: magic, file size, two reserved shorts, data offset
    out += struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_SIZE)
    # BITMAPINFOHEADER: size, w, h (positive => bottom-up), planes, bpp,
    # compression (0 = BI_RGB), image size, x/y ppm, palette counts
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    bgr = pixels[:, :, ::-1]  # RGB -> BGR
    for y in range(h - 1, -1, -1):  # bottom row first
        out += bgr[y].tobytes() + pad
    return bytes(out)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    header = f"P6\n# bdt_spark codec\n{w} {h}\n255\n".encode("ascii")
    return header + pixels.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): pick the neighbor (left a, up b,
    up-left c) closest to the linear estimate a + b - c, ties broken
    a, then b, then c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(
    ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int = 3
) -> bytes:
    """Apply PNG filter `ftype` to one raw scanline (uint8, len = w*bpp),
    given the PRIOR raw scanline (zeros for the first row). `bpp` is the
    byte distance to the "left" sample (channels for 8-bit depth)."""
    n = len(raw)
    raw_i = raw.astype(np.int32)
    left = np.zeros(n, dtype=np.int32)
    left[bpp:] = raw_i[:-bpp]
    up = prior.astype(np.int32)
    upleft = np.zeros(n, dtype=np.int32)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = raw_i
    elif ftype == 1:  # Sub
        out = raw_i - left
    elif ftype == 2:  # Up
        out = raw_i - up
    elif ftype == 3:  # Average
        out = raw_i - (left + up) // 2
    elif ftype == 4:  # Paeth — vectorized: the ENCODER predicts from RAW
        # neighbors (left/up/up-left of the unfiltered scanlines), so no
        # sequential dependency exists on this side (unlike unfiltering,
        # where Sub/Average/Paeth reference reconstructed bytes)
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out = raw_i - pred
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return (out % 256).astype(np.uint8).tobytes()


def _unfilter_scanline(
    ftype: int, filt: np.ndarray, prior: np.ndarray, bpp: int = 3
) -> np.ndarray:
    """Invert PNG filter `ftype` on one filtered scanline. Sub/Average/
    Paeth reference the RECONSTRUCTED left neighbor, so those run
    sequentially per pixel; Up/None stay vectorized."""
    n = len(filt)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:  # Up
        return ((filt.astype(np.int32) + prior) % 256).astype(np.uint8)
    out = np.zeros(n, dtype=np.int32)
    f = filt.astype(np.int32)
    up = prior.astype(np.int32)
    if ftype == 1:  # Sub: out[i] = f[i] + out[i-bpp] is a per-channel
        # prefix sum — vectorized as cumsum mod 256 on each byte lane
        for c in range(bpp):
            out[c::bpp] = np.cumsum(f[c::bpp], dtype=np.int64) % 256
    elif ftype == 3:  # Average
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (f[i] + (left + up[i]) // 2) % 256
    elif ftype == 4:  # Paeth
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            ul = up[i - bpp] if i >= bpp else 0
            out[i] = (f[i] + _paeth(int(left), int(up[i]), int(ul))) % 256
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return out.astype(np.uint8)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG.

    `filter_type` pins one scanline filter for every row (0..4); None
    cycles row_index % 5 so a multi-row image exercises ALL five filters
    — any filter/unfilter asymmetry breaks the round-trip immediately.
    """
    import zlib

    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_png expects (h, w, 3) RGB")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = pixels.reshape(h, w * 3)
    prior = np.zeros(w * 3, dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        ft = (y % 5) if filter_type is None else filter_type
        lines.append(ft)
        lines += _filter_scanline(ft, raw[y], prior)
        prior = raw[y]
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[str, np.ndarray]:
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    n = len(payload)
    w = h = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > n:  # header + data + CRC must all fit
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (0, 2, 6):
                raise ValueError(
                    f"only 8-bit grayscale/truecolor/RGBA PNG supported "
                    f"(depth={depth}, color type {color})"
                )
            if comp != 0 or filt != 0:
                raise ValueError("bad PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped per spec
        pos += 12 + length
    if w is None or not seen_iend:
        raise ValueError("missing PNG IHDR/IEND chunk")
    if w <= 0 or h <= 0:
        raise ValueError("bad PNG dimensions")
    channels = {0: 1, 2: 3, 6: 4}[color]
    lines = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * channels
    if len(lines) != stride * h:
        raise ValueError("PNG pixel data size mismatch")
    lines = lines.reshape(h, stride)
    out = np.zeros((h, w * channels), dtype=np.uint8)
    prior = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        out[y] = _unfilter_scanline(
            int(lines[y, 0]), lines[y, 1:], prior, bpp=channels
        )
        prior = out[y]
    px = out.reshape(h, w, channels)
    if color == 0:  # grayscale -> replicate into RGB
        px = np.repeat(px, 3, axis=2)
    elif color == 6:  # RGBA -> drop alpha (decoder contract is (h,w,3))
        px = np.ascontiguousarray(px[:, :, :3])
    return "png", px


def _decode_bmp(payload: bytes) -> tuple[str, np.ndarray]:
    if len(payload) < _BMP_HEADER_SIZE:
        raise ValueError("truncated BMP header")
    magic, _file_size, _r1, _r2, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("bad BMP magic")
    (hdr_size, w, h_signed, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (got {bpp}bpp/{compression})")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * 3 + 3) & ~3
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]  # stored bottom-up -> image order
    # contiguous writable copy (the flips above are views over the
    # read-only payload buffer) — same mutability contract as the PPM path
    return "bmp", np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def _decode_ppm(payload: bytes) -> tuple[str, np.ndarray]:
    if payload[:2] != b"P6":
        raise ValueError("bad PPM magic")
    # Header: three whitespace-separated ints after the magic; '#' starts a
    # comment running to end-of-line. A single whitespace byte ends the
    # header before the binary raster.
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before raster data
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError("bad PPM header values")
    need = w * h * 3
    if n < pos + need:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return "ppm", px.reshape(h, w, 3).copy()


def decode_image_bytes(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode a BMP, PPM, PNG, or baseline JPEG payload to
    ('bmp'|'ppm'|'png'|'jpeg', (h, w, 3) uint8 RGB).

    Raises ValueError for unsupported/corrupt formats. All four decoders
    are from-scratch implementations of the public specs (see module
    docstring and the JPEG section below) — no codec libraries.
    """
    payload = bytes(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    raise ValueError(
        "unsupported image format (supported: BMP 24bpp, PPM P6, PNG rgb8, "
        "baseline JPEG)"
    )


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81 / JFIF) — from the public spec
# ---------------------------------------------------------------------------
#
# Same contract as the PNG codec above: a from-scratch implementation of a
# public format, no codec libraries. Encoder emits baseline-sequential
# JFIF (SOI/APP0/DQT/SOF0/DHT/SOS/EOI; grayscale or YCbCr 4:4:4 / 4:2:0);
# decoder handles any baseline stream with 1 or 3 components, sampling
# factors up to 2x2, restart intervals, and 0xFF00 byte unstuffing.
# Progressive (SOF2), arithmetic coding, and 12-bit precision are
# rejected loudly.
#
# Exactness note (what makes the SQL oracle possible for a LOSSY format):
# a FLAT 8x8 block has only a DC coefficient — every AC term of the FDCT
# is exactly zero, so AC quantization destroys nothing. With the DC
# quantization step pinned to 8, DC = 8*(v-128) quantizes to exactly
# v-128 and reconstructs exactly, so images built from flat 8x8 tiles
# round-trip BIT-EXACTLY through the full entropy-coded pipeline while
# still exercising Huffman coding, zigzag, dequant, and the IDCT.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_ZZ = np.array(_ZIGZAG)  # vectorized (de)zigzag index

# Standard Huffman table specs (T.81 Annex K.3): (BITS[1..16], HUFFVAL).
# Encoder and decoder both derive canonical codes from these via the
# spec's Generate_size_table/Generate_code_table procedure, and the spec
# is also what gets serialized into DHT — so the two sides cannot drift.
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# Quantization tables: the standard T.81 Annex K.1 luminance/chrominance
# example tables, with the DC step OVERRIDDEN to 8 — the flat-tile
# exactness pin (see module note above). AC steps only matter for
# non-flat content, where baseline JPEG is lossy by design.
_QUANT_LUM = [
    8, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHR = [
    8, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis M: FDCT = M @ s @ M.T, IDCT = M.T @
    S @ M (T.81 A.3.3 normalization)."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman per T.81 C.2."""
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


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1s (before a restart marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def raw_marker(self, tag: int) -> None:
        """Emit a bare marker (RSTn) — NOT byte-stuffed."""
        assert self.nbits == 0
        self.buf += bytes([0xFF, tag])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _mag_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter,
    coefs_zz: list[int],
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one quantized, zigzagged block; returns the new DC
    predictor."""
    dc = coefs_zz[0]
    diff = dc - pred
    s = _mag_category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coefs_zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = coefs_zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _mag_category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _dht_payload(tclass: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return bytes([(tclass << 4) | tid] + bits + vals)


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range color transform (rounded to uint8 planes)."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    clip = lambda p: np.clip(np.rint(p), 0, 255)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def encode_jpeg(
    pixels: np.ndarray,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline-sequential JFIF JPEG.

    `subsampling` is the luma sampling factor pair: (1, 1) = 4:4:4,
    (2, 2) = 4:2:0 (chroma planes 2x2-mean-downsampled). Grayscale input
    ignores it (single component). `restart_interval` > 0 emits a DRI
    segment and an RSTn marker every N MCUs (DC predictors reset,
    bitstream byte-aligned) — the stream-resynchronization feature a
    robust 100 TB ingest path must parse. Quant tables are the T.81
    Annex K examples with the DC step pinned to 8, so flat 8x8 tiles
    round-trip bit-exactly (see module note); non-flat content is lossy
    as JPEG always is."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"bad jpeg dims {w}x{h}")
    sh, sv = (1, 1) if gray else subsampling
    if (sh, sv) not in ((1, 1), (2, 2)):
        raise ValueError("subsampling must be (1,1) [4:4:4] or (2,2) [4:2:0]")

    qlum = np.array(_QUANT_LUM, dtype=np.float64)
    qchr = np.array(_QUANT_CHR, dtype=np.float64)
    qlum2d = qlum.reshape(8, 8)
    qchr2d = qchr.reshape(8, 8)

    if gray:
        planes = [(pixels, qlum2d, 1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(pixels)
        if (sh, sv) == (2, 2):
            # 2x2 mean downsample (pad odd dims by edge replication first)
            def down(p):
                hp = np.pad(
                    p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge"
                )
                return np.rint(
                    (hp[0::2, 0::2] + hp[0::2, 1::2]
                     + hp[1::2, 0::2] + hp[1::2, 1::2]) / 4.0
                )
            cb, cr = down(cb), down(cr)
        planes = [(y, qlum2d, sh, sv), (cb, qchr2d, 1, 1), (cr, qchr2d, 1, 1)]

    # MCU grid from the max sampling factors; pad each plane so its block
    # grid is an exact multiple of its per-MCU block count
    mcus_x = -(-w // (8 * sh))
    mcus_y = -(-h // (8 * sv))
    grids = []
    for plane, quant, ch, cv in planes:
        tw, th = mcus_x * ch * 8, mcus_y * cv * 8
        ph, pw = plane.shape
        padded = np.pad(
            np.asarray(plane, dtype=np.float64),
            ((0, th - ph), (0, tw - pw)),
            mode="edge",
        )
        grid = {}
        for by in range(th // 8):
            for bx in range(tw // 8):
                blk = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                coefs = _DCT_M @ blk @ _DCT_M.T
                q = np.rint(coefs / quant).astype(np.int64).reshape(64)
                grid[(by, bx)] = q[_ZZ].tolist()
        grids.append(grid)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT payloads are in zigzag order per spec
    out += _marker(
        0xDB, bytes([0x00]) + bytes(int(qlum[_ZIGZAG[i]]) for i in range(64))
    )
    if not gray:
        out += _marker(
            0xDB,
            bytes([0x01]) + bytes(int(qchr[_ZIGZAG[i]]) for i in range(64)),
        )
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        sof += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _marker(0xC0, sof)
    # DHT
    out += _marker(0xC4, _dht_payload(0, 0, _STD_DC_LUM))
    out += _marker(0xC4, _dht_payload(1, 0, _STD_AC_LUM))
    if not gray:
        out += _marker(0xC4, _dht_payload(0, 1, _STD_DC_CHR))
        out += _marker(0xC4, _dht_payload(1, 1, _STD_AC_CHR))
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([ncomp])
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_lum = _huff_codes(*_STD_DC_LUM)
    ac_lum = _huff_codes(*_STD_AC_LUM)
    dc_chr = _huff_codes(*_STD_DC_CHR)
    ac_chr = _huff_codes(*_STD_AC_CHR)
    tables = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * 2
    samp = [(sh, sv)] + [(1, 1)] * 2

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.align()
                bw.raw_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            mcu_count += 1
            for ci in range(len(planes)):
                ch, cv = samp[ci] if not gray else (1, 1)
                dc_t, ac_t = tables[ci] if not gray else (dc_lum, ac_lum)
                for dy in range(cv):
                    for dx in range(ch):
                        coefs = grids[ci][(my * cv + dy, mx * ch + dx)]
                        preds[ci] = _encode_block(
                            bw, coefs, preds[ci], dc_t, ac_t
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (restart markers are handled by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("jpeg: truncated entropy-coded segment")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed 0xFF data byte
                self.pos += 2
            else:
                raise ValueError("jpeg: hit marker inside entropy segment")
        else:
            self.pos += 1
        # _fill only runs with nbits == 0 (read_bit refills on empty), so
        # the accumulator is REPLACED, not extended — appending (acc<<8)|b
        # would retain every consumed byte's bits and make entropy decode
        # O(n^2) bigint copying over the segment length
        self.acc = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def at_restart_marker(self) -> int | None:
        """Peek: next two bytes an RSTn marker? Return n or None."""
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            return d[p + 1] - 0xD0
        return None

    def skip_restart_marker(self) -> None:
        self.pos += 2


class _HuffDecoder:
    """Canonical Huffman decode table from a DHT (BITS, HUFFVAL) spec —
    (min_code, max_code, first_index) per length, the T.81 F.2.2.3
    DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                return self.vals[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s low bits to the signed amplitude."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_jpeg(payload: bytes) -> tuple[str, np.ndarray]:
    """Baseline-sequential JPEG decoder (T.81/JFIF) -> ('jpeg', (h, w, 3)
    uint8 RGB). Grayscale replicated to RGB; YCbCr converted per JFIF.
    Rejects progressive/arithmetic/12-bit streams loudly."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, ch, cv, tq)])
    while True:
        if pos + 4 > len(d):
            raise ValueError("jpeg: truncated before SOS")
        if d[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        tag = d[pos + 1]
        if tag == 0xFF:  # optional 0xFF fill bytes before a marker
            pos += 1     # (T.81 B.1.1.2): skip one and re-examine
            continue
        if tag == 0xD8 or tag == 0x01 or 0xD0 <= tag <= 0xD7:
            pos += 2     # standalone markers carry no length segment
            continue
        seglen = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        seg = d[pos + 4:pos + 2 + seglen]
        # a payload cut inside the segment body yields a short slice; every
        # downstream parser indexes to the declared length, so surface the
        # truncation as the contract's ValueError here rather than as an
        # IndexError/struct.error deep in a table parser
        if seglen < 2 or len(seg) != seglen - 2:
            raise ValueError("jpeg: truncated marker segment")
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                if i + 65 > len(seg):
                    raise ValueError("jpeg: truncated quant table")
                zz = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                nat = np.zeros(64)
                for j in range(64):
                    nat[_ZIGZAG[j]] = zz[j]
                qtables[tid] = nat.reshape(8, 8)
                i += 65
        elif tag == 0xC4:  # DHT (possibly several)
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("jpeg: truncated huffman table header")
                tclass, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                if i + 17 + n > len(seg):
                    raise ValueError("jpeg: truncated huffman value list")
                vals = list(seg[i + 17:i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tclass == 0 else huff_ac)[tid] = dec
                i += 17 + n
        elif tag == 0xC0 or tag == 0xC1:  # SOF0/1 baseline(+ext seq huff)
            if len(seg) < 6:
                raise ValueError("jpeg: truncated frame header")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if len(seg) < 6 + nc * 3:
                raise ValueError("jpeg: truncated frame components")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential Huffman (SOF0/SOF1) "
                f"supported, got SOF marker 0x{tag:02x}"
            )
        elif tag == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif tag == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                # a spec-valid baseline stream MAY carry one scan per
                # component; silently decoding only the first scan would
                # return a color-stripped image with wrong features —
                # reject loudly instead
                raise ValueError(
                    "jpeg: non-interleaved multi-scan streams unsupported "
                    f"(scan has {ns} of {len(frame[2])} components)"
                )
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + c * 2], seg[2 + c * 2]
                scomps.append((cs, tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            return "jpeg", _decode_scan(
                d, pos, frame, scomps, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        elif tag == 0xD9:
            raise ValueError("jpeg: EOI before any scan")
        # APPn/COM/anything else: skip
        pos = pos + 2 + seglen


def _decode_scan(
    d, pos, frame, scomps, qtables, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("jpeg: sampling factors above 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    meta = []  # (cid, ch, cv, quant, dc_dec, ac_dec)
    for cs, td, ta in scomps:
        if cs not in by_id:
            raise ValueError(f"jpeg: scan references undefined component {cs}")
        ch, cv, tq = by_id[cs]
        # undefined table ids must surface as the contract's ValueError,
        # not a bare KeyError that crashes a quarantine-on-ValueError
        # ingest path
        if tq not in qtables:
            raise ValueError(f"jpeg: undefined quant table {tq}")
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError(f"jpeg: undefined Huffman table dc={td} ac={ta}")
        planes[cs] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
        meta.append((cs, ch, cv, qtables[tq], huff_dc[td], huff_ac[ta]))

    br = _BitReader(d, pos)
    preds = {cs: 0 for cs, *_ in meta}
    mcu_count = 0
    expected_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.align()
                n = br.at_restart_marker()
                if n is None:
                    raise ValueError("jpeg: expected restart marker")
                if n != expected_rst:
                    raise ValueError("jpeg: restart marker out of order")
                br.skip_restart_marker()
                expected_rst = (expected_rst + 1) % 8
                preds = {cs: 0 for cs, *_ in meta}
            for cs, ch, cv, quant, dc_dec, ac_dec in meta:
                for dy in range(cv):
                    for dx in range(ch):
                        s = dc_dec.decode(br)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[cs] += diff
                        zz = np.zeros(64)
                        zz[0] = preds[cs]
                        k = 1
                        while k <= 63:
                            rs = ac_dec.decode(br)
                            r, ssz = rs >> 4, rs & 0x0F
                            if ssz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.read_bits(ssz), ssz)
                            k += 1
                        nat_flat = np.zeros(64)
                        nat_flat[_ZZ] = zz
                        deq = nat_flat.reshape(8, 8) * quant
                        blk = _DCT_M.T @ deq @ _DCT_M + 128.0
                        py, px = (my * cv + dy) * 8, (mx * ch + dx) * 8
                        planes[cs][py:py + 8, px:px + 8] = blk
            mcu_count += 1

    if len(meta) == 1:
        cs = meta[0][0]
        g = np.clip(np.rint(planes[cs][:h, :w]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    # upsample chroma to luma grid by pixel replication, then JFIF inverse
    full = {}
    for cs, ch, cv, *_ in meta:
        p = planes[cs]
        if ch < hmax or cv < vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full[cs] = p[:h, :w]
    y_id, cb_id, cr_id = (m[0] for m in meta)
    y, cb, cr = full[y_id], full[cb_id] - 128.0, full[cr_id] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit) — the audio companion of the image codecs
# ---------------------------------------------------------------------------
#
# Public-spec container parse, same contract as the image codecs above:
# the multimodal audio path gets a REAL decode (RIFF chunk walk, fmt
# validation, PCM extraction) instead of raw-byte arithmetic. Mono/stereo
# 16-bit PCM; unknown chunks (LIST/INFO/fact/...) are skipped per the
# RIFF spec; compressed formats are rejected loudly.


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, extra_chunk: bytes | None = None
) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a PCM WAV file.

    `extra_chunk` (pre-serialized RIFF chunk bytes) is inserted before
    the data chunk — used by tests to prove the decoder skips unknown
    chunks instead of misparsing."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        body += extra_chunk
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM 16-bit WAV payload to (sample_rate, (n, ch) int16).

    Walks the RIFF chunk list (unknown chunks skipped, word-aligned),
    validates the fmt chunk (format tag 1 = PCM, 16 bits/sample), and
    raises ValueError for truncated/compressed/malformed streams."""
    d = bytes(payload)
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(d):
        cid = d[pos:pos + 4]
        (clen,) = struct.unpack("<I", d[pos + 4:pos + 8])
        body = d[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
            # spec-wise more chunks may follow; first data chunk is the
            # audio payload
            break
        pos += 8 + clen + (clen % 2)  # word alignment
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    tag, ch, rate, _brate, _balign, bits = fmt
    if tag != 1:
        raise ValueError(f"wav: only PCM supported, got format tag {tag}")
    if bits != 16:
        raise ValueError(f"wav: only 16-bit PCM supported, got {bits}")
    if ch < 1:
        raise ValueError("wav: zero channels")
    if len(data) % (2 * ch):
        raise ValueError("wav: data length not a sample multiple")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return rate, arr
