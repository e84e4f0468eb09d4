"""Pure-Python image codecs: 24-bit BMP, binary PPM (P6), and PNG (8-bit
truecolor).

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
    """Decode a BMP, PPM, or PNG payload to ('bmp'|'ppm'|'png',
    (h, w, 3) uint8 RGB).

    Raises ValueError for unsupported/corrupt formats (JPEG needs codec
    libraries this environment does not ship; PNG's DEFLATE stream is
    stdlib zlib, so it is decodable from scratch).
    """
    payload = bytes(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    raise ValueError(
        "unsupported image format (supported: BMP 24bpp, PPM P6, PNG rgb8)"
    )
