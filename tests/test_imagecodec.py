"""Pure-Python BMP/PPM codec: layout round-trips and corrupt-input guards.

Round-trip tests sweep widths 1..8 so every stride-padding residue (w*3
mod 4) is exercised; hand-built payloads pin the layout details a
symmetric encode/decode pair could both get wrong (bottom-up row order,
BGR sample order, top-down negative-height BMPs, PPM comments).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bdt_spark.functions.imagecodec import (
    decode_image_bytes,
    encode_bmp,
    encode_ppm,
)


def _gradient(h: int, w: int) -> np.ndarray:
    k = np.arange(h * w, dtype=np.int32)
    px = np.stack([k % 256, (k * 7 + 3) % 256, (k * 13 + 91) % 256], axis=1)
    return px.astype(np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("w", range(1, 9))
@pytest.mark.parametrize("h", [1, 3, 5])
def test_bmp_roundtrip_all_strides(w, h):
    px = _gradient(h, w)
    fmt, out = decode_image_bytes(encode_bmp(px))
    assert fmt == "bmp"
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("w", [1, 2, 5, 8])
def test_ppm_roundtrip(w):
    px = _gradient(4, w)
    fmt, out = decode_image_bytes(encode_ppm(px))
    assert fmt == "ppm"
    np.testing.assert_array_equal(out, px)


def test_bmp_rows_stored_bottom_up_bgr():
    """Pin the on-disk layout itself, not just the round-trip: the FIRST
    stored row must be the BOTTOM image row, bytes in B,G,R order."""
    px = np.zeros((2, 1, 3), dtype=np.uint8)
    px[0, 0] = (1, 2, 3)  # top row RGB
    px[1, 0] = (9, 8, 7)  # bottom row RGB
    payload = encode_bmp(px)
    data_off = struct.unpack_from("<I", payload, 10)[0]
    first_stored = payload[data_off : data_off + 3]
    assert first_stored == bytes([7, 8, 9])  # bottom row, BGR


def test_bmp_top_down_negative_height():
    """A decoder-only case the encoder never emits: biHeight < 0 means rows
    are stored top-down and must NOT be flipped."""
    px = _gradient(3, 2)
    payload = bytearray(encode_bmp(px[::-1]))  # stored order == image order
    struct.pack_into("<i", payload, 22, -3)  # biHeight = -3 (top-down)
    fmt, out = decode_image_bytes(bytes(payload))
    assert fmt == "bmp"
    np.testing.assert_array_equal(out, px)


def test_ppm_header_comments_and_whitespace():
    px = _gradient(2, 3)
    raster = px.tobytes()
    payload = b"P6 # inline\n# full comment line\n 3\t2 # trailing\n255\n" + raster
    fmt, out = decode_image_bytes(payload)
    assert fmt == "ppm"
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"PNG not really",
        b"BM" + b"\x00" * 10,  # truncated header
        b"P6\n3 2\n255\n" + b"\x00" * 5,  # truncated raster
        b"P6\n0 2\n255\n",  # zero width
    ],
)
def test_corrupt_payloads_raise(payload):
    with pytest.raises(ValueError):
        decode_image_bytes(payload)


def test_bmp_compressed_rejected():
    px = _gradient(2, 2)
    payload = bytearray(encode_bmp(px))
    struct.pack_into("<I", payload, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(ValueError):
        decode_image_bytes(bytes(payload))
