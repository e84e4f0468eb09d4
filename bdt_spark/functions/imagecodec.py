"""Pure-Python image codecs: 24-bit uncompressed BMP and binary PPM (P6).

The build contract stubs codec *libraries* (PIL/librosa are not in the
container), but nothing stops a from-scratch implementation of a public
uncompressed format — the same approach `sources/avro.py` took for the Avro
container spec. This module implements, from the published format specs:

- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes), 24 bpp,
  BI_RGB (no compression), little-endian fields, pixel rows stored
  BOTTOM-UP (positive biHeight) or top-down (negative biHeight), each row
  zero-padded to a 4-byte boundary, samples in B,G,R byte order.
- PPM: 'P6' magma/whitespace header with '#' comments (width, height,
  maxval <= 255), then height rows of width R,G,B byte triples, top-down,
  no row padding.

The two formats differ in every layout decision (row order, channel order,
row padding, header encoding), so a decoder bug in any of them breaks the
feature parity the multimodal_decode_bmp oracle checks.

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
    """Decode a BMP or PPM payload to ('bmp'|'ppm', (h, w, 3) uint8 RGB).

    Raises ValueError for unsupported/corrupt formats (compressed formats
    like PNG/JPEG need codec libraries this environment does not ship).
    """
    payload = bytes(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise ValueError("unsupported image format (supported: BMP 24bpp, PPM P6)")
