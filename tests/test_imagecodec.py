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
    encode_png,
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


# --- PNG (round 7: real compressed-format codec via stdlib zlib) ------------


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(ft):
    """Every scanline filter round-trips on its own — an asymmetric
    filter/unfilter pair fails here before it can hide in the cycle."""
    px = _gradient(6, 5)
    fmt, out = decode_image_bytes(encode_png(px, filter_type=ft))
    assert fmt == "png"
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("w", range(1, 9))
@pytest.mark.parametrize("h", [1, 4, 7])
def test_png_roundtrip_filter_cycle(w, h):
    """Default encoding cycles filters 0..4 by row; images with h >= 5
    exercise all five in one payload."""
    px = _gradient(h, w)
    fmt, out = decode_image_bytes(encode_png(px))
    assert fmt == "png"
    np.testing.assert_array_equal(out, px)


def test_png_filter_bytes_pinned_on_disk():
    """Pin the wire format, not just the round-trip: row y's filter byte
    is y % 5, and a Sub-filtered row stores horizontal deltas."""
    import zlib

    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[1] = [(10, 20, 30), (13, 25, 37), (16, 30, 44)]
    payload = encode_png(px)  # row 0 -> filter 0, row 1 -> filter 1 (Sub)
    # IDAT starts after signature(8) + IHDR chunk(12+13)
    idat_data_off = 8 + 25 + 8
    length = struct.unpack_from(">I", payload, 8 + 25)[0]
    lines = zlib.decompress(payload[idat_data_off : idat_data_off + length])
    stride = 1 + 3 * 3
    assert lines[0] == 0 and lines[stride] == 1
    # Sub row: first pixel verbatim, then per-channel deltas (+3, +5, +7)
    assert list(lines[stride + 1 : stride + 10]) == [10, 20, 30, 3, 5, 7, 3, 5, 7]


def test_png_paeth_predictor_spec_cases():
    from bdt_spark.functions.imagecodec import _paeth

    # ties break a, then b, then c (PNG spec §6.6) — sweep against an
    # inline transliteration of the spec's pseudocode
    def spec_paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    for a in range(0, 256, 17):
        for b in range(0, 256, 23):
            for c in range(0, 256, 29):
                assert _paeth(a, b, c) == spec_paeth(a, b, c)
    assert _paeth(0, 255, 128) == 128  # p=127: pc=1 < pa=127,pb=128 -> c
    assert _paeth(100, 101, 0) == 101  # p=201: pb=100 < pa=101 -> b


def test_png_ancillary_chunks_skipped():
    """tEXt and other ancillary chunks between IHDR and IDAT must be
    skipped per spec, with their CRCs still validated."""
    import zlib

    px = _gradient(3, 3)
    payload = encode_png(px)
    ihdr_end = 8 + 25
    text = b"comment\x00bdt_spark"
    chunk = (
        struct.pack(">I", len(text))
        + b"tEXt"
        + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF)
    )
    spliced = payload[:ihdr_end] + chunk + payload[ihdr_end:]
    fmt, out = decode_image_bytes(spliced)
    assert fmt == "png"
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:30] + bytes([p[30] ^ 0xFF]) + p[31:],  # IHDR corrupted -> CRC
        lambda p: p[:-16],  # IEND (and IDAT tail) missing
        lambda p: p[:8],  # signature only
    ],
)
def test_png_corrupt_payloads_raise(mutate):
    px = _gradient(4, 4)
    with pytest.raises(ValueError):
        decode_image_bytes(mutate(encode_png(px)))


def test_png_interlace_rejected():
    """Adam7 interlacing is out of scope and must be rejected loudly, not
    mis-decoded: flip the IHDR interlace byte and re-seal the CRC."""
    import zlib

    px = _gradient(3, 3)
    payload = bytearray(encode_png(px))
    payload[8 + 8 + 12] = 1  # IHDR data byte 12 = interlace method
    ctype_and_data = bytes(payload[8 + 4 : 8 + 8 + 13])
    struct.pack_into(">I", payload, 8 + 8 + 13, zlib.crc32(ctype_and_data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="interlaced"):
        decode_image_bytes(bytes(payload))


def _hand_png(color_type, channels, px_bytes, w, h, ftype=0):
    """Hand-assemble a PNG the encoder never emits (decoder-only color
    types), with real CRCs and a valid filtered raster."""
    import zlib

    from bdt_spark.functions.imagecodec import _png_chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * channels
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    raster = np.frombuffer(px_bytes, dtype=np.uint8).reshape(h, stride)
    from bdt_spark.functions.imagecodec import _filter_scanline

    for y in range(h):
        lines.append(ftype)
        lines += _filter_scanline(ftype, raster[y], prior, bpp=channels)
        prior = raster[y]
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_grayscale_decodes_replicated(ftype):
    """Color type 0 (decoder-only): gray value replicated into RGB; the
    left-neighbor distance for filters is 1 byte, not 3 — a decoder that
    hardcodes bpp=3 corrupts every Sub/Average/Paeth grayscale row."""
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 7
    payload = _hand_png(0, 1, g.tobytes(), 4, 3, ftype=ftype)
    fmt, out = decode_image_bytes(payload)
    assert fmt == "png"
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_rgba_decodes_alpha_dropped(ftype):
    """Color type 6 (decoder-only): 4-byte pixels, filters at bpp=4,
    alpha dropped per the (h, w, 3) decode contract."""
    rgba = _gradient(3, 4)
    alpha = np.full((3, 4, 1), 200, dtype=np.uint8)
    px = np.concatenate([rgba, alpha], axis=2)
    payload = _hand_png(6, 4, px.tobytes(), 4, 3, ftype=ftype)
    fmt, out = decode_image_bytes(payload)
    assert fmt == "png"
    np.testing.assert_array_equal(out, rgba)


def test_png_palette_color_type_rejected():
    """Color type 3 (palette) needs a PLTE chunk the decoder does not
    implement — must reject loudly."""
    g = np.zeros(4, dtype=np.uint8)
    payload = _hand_png(3, 1, g.tobytes(), 4, 1)
    with pytest.raises(ValueError, match="color type"):
        decode_image_bytes(payload)


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, T.81/JFIF)
# ---------------------------------------------------------------------------

from bdt_spark.functions.imagecodec import encode_jpeg  # noqa: E402


def _flat_tiles(tiles: np.ndarray) -> np.ndarray:
    return np.kron(tiles, np.ones((8, 8), dtype=np.uint8))


@pytest.mark.parametrize("tw,th", [(1, 1), (4, 3), (6, 5)])
def test_jpeg_flat_tiles_bit_exact(tw, th):
    """Flat 8x8 tiles have zero AC energy and the DC quant step is 8, so
    the full lossy pipeline (FDCT -> quant -> Huffman -> IDCT) must be
    BIT-exact — the property the SQL oracle relies on."""
    rng = np.random.RandomState(tw * 10 + th)
    img = _flat_tiles(rng.randint(0, 256, (th, tw)).astype(np.uint8))
    fmt, out = decode_image_bytes(encode_jpeg(img))
    assert fmt == "jpeg"
    assert out.shape == (th * 8, tw * 8, 3)
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_jpeg_flat_tiles_exact_with_restart_markers():
    rng = np.random.RandomState(3)
    img = _flat_tiles(rng.randint(0, 256, (5, 6)).astype(np.uint8))
    for interval in (1, 3, 4, 7):
        payload = encode_jpeg(img, restart_interval=interval)
        assert b"\xff\xdd" in payload  # DRI present
        fmt, out = decode_image_bytes(payload)
        assert np.array_equal(out[:, :, 0], img), f"interval={interval}"


def test_jpeg_smooth_content_close_roundtrip():
    """Non-flat content is lossy by design; smooth gradients must stay
    within a few levels (gross IDCT/quant/zigzag bugs produce errors of
    dozens of levels, so a tight-but-nonzero bound is discriminating)."""
    xx, yy = np.meshgrid(np.arange(40), np.arange(25))
    img = ((np.sin(xx / 6) + np.cos(yy / 5)) * 60 + 128).clip(0, 255)
    img = img.astype(np.uint8)
    _, out = decode_image_bytes(encode_jpeg(img))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 8, err.max()


def test_jpeg_odd_dims_not_multiple_of_8():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (13, 11)).astype(np.uint8)
    _, out = decode_image_bytes(encode_jpeg(img))
    assert out.shape == (13, 11, 3)


def test_jpeg_color_444_flat_within_rounding():
    """Flat color: YCbCr forward/inverse rounding costs at most ~1 level
    per channel; the DCT pipeline itself is exact on flat blocks."""
    rgb = np.zeros((16, 24, 3), np.uint8)
    rgb[:, :] = [200, 30, 90]
    _, out = decode_image_bytes(encode_jpeg(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_jpeg_color_420_subsampled_roundtrip():
    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    g = ((np.sin(xx / 6) + np.cos(yy / 5)) * 60 + 128).clip(0, 255)
    g = g.astype(np.uint8)
    rgb = np.stack([g, 255 - g, g // 2], axis=2)
    payload = encode_jpeg(rgb, subsampling=(2, 2), restart_interval=2)
    _, out = decode_image_bytes(payload)
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    # chroma is 2x2-downsampled: edges in Cb/Cr smear by design; the
    # bound still catches upsampling-alignment and plane-swap bugs
    assert err.mean() <= 8, err.mean()
    assert err.max() <= 40, err.max()


def test_jpeg_huffman_tables_survive_dht_roundtrip():
    """The decoder must use the DHT from the STREAM, not shared module
    state: decode a payload whose DHT bytes were re-parsed from the
    serialized form (guards against canonical-code generation drift
    between _huff_codes and _HuffDecoder)."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    payload = encode_jpeg(img)
    # entropy data is long enough to require multi-length codes
    _, out = decode_image_bytes(payload)
    assert out.shape == (16, 16, 3)


def test_jpeg_progressive_rejected():
    img = np.zeros((8, 8), np.uint8)
    payload = bytearray(encode_jpeg(img))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_image_bytes(bytes(payload))


def test_jpeg_truncated_raises():
    img = _flat_tiles(np.full((2, 2), 99, dtype=np.uint8))
    payload = encode_jpeg(img)
    for cut in (4, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_image_bytes(payload[:cut])


def test_jpeg_every_truncation_point_raises_valueerror():
    """The decode contract is ValueError for corrupt payloads — a
    quarantine-on-ValueError ingest path must never see IndexError or
    struct.error. Exhaustive over every cut point: cuts inside DQT/DHT/
    SOF segment bodies used to surface as IndexError/struct.error from
    short slices. The one tolerated truncation is dropping ONLY the
    trailing EOI marker (all entropy data present) — standard lenient
    decoder behavior, so the range stops at len-2."""
    img = _flat_tiles(np.array([[10, 200], [99, 40]], dtype=np.uint8))
    payload = encode_jpeg(img)
    for cut in range(2, len(payload) - 2):
        with pytest.raises(ValueError):
            decode_image_bytes(payload[:cut])


def test_jpeg_bitreader_accumulator_stays_bounded():
    """_BitReader must REPLACE its accumulator on refill, not append —
    an appending accumulator retains every consumed byte and makes
    entropy decode O(n^2) bigint copying over the segment length."""
    from bdt_spark.functions.imagecodec import _BitReader

    br = _BitReader(bytes([0xAB] * 2000), 0)
    for _ in range(2000 * 8):
        br.read_bit()
    assert br.acc.bit_length() <= 8


def test_jpeg_stuffed_ff_bytes_handled():
    """Entropy bytes equal to 0xFF must be stuffed with 0x00 by the
    writer and unstuffed by the reader — tested at the bit level
    (deterministic), then end-to-end on an image whose stream contains
    a stuffed byte."""
    from bdt_spark.functions.imagecodec import _BitReader, _BitWriter

    bw = _BitWriter()
    bw.write(0xFF, 8)      # a full 0xFF byte -> must be stuffed
    bw.write(0b1010, 4)
    data = bw.flush()
    assert data[0] == 0xFF and data[1] == 0x00, data.hex()
    br = _BitReader(data, 0)
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(4) == 0b1010

    # end-to-end: search until an image's entropy segment contains a
    # stuffed byte, then require exact round-trip
    for seed in range(500):
        rng = np.random.RandomState(seed)
        tiles = rng.randint(0, 256, (6, 6)).astype(np.uint8)
        img = _flat_tiles(tiles)
        payload = encode_jpeg(img)
        scan_start = payload.find(b"\xff\xda")
        if b"\xff\x00" in payload[scan_start:]:
            _, out = decode_image_bytes(payload)
            assert np.array_equal(out[:, :, 0], img)
            return
    raise AssertionError("no image produced a stuffed byte in 500 seeds")


def test_jpeg_dims_recorded_in_sof_not_guessed():
    img = np.full((9, 22), 127, dtype=np.uint8)
    _, out = decode_image_bytes(encode_jpeg(img))
    assert out.shape == (9, 22, 3)


def test_jpeg_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; the parser must skip them, not misread a length."""
    img = np.full((8, 8), 55, dtype=np.uint8)
    payload = encode_jpeg(img)
    # inject fill bytes before the SOF marker
    idx = payload.find(b"\xff\xc0")
    padded = payload[:idx] + b"\xff\xff\xff" + payload[idx:]
    _, out = decode_image_bytes(padded)
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_undefined_tables_raise_valueerror():
    """Undefined quant/Huffman table ids must surface as the contract's
    ValueError (quarantine-able), never a bare KeyError."""
    img = np.full((8, 8), 55, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    # SOF0 component's Tq nibble -> undefined table 5
    sof = payload.find(b"\xff\xc0")
    payload[sof + 2 + 2 + 6 + 2] = 5  # comp 1's Tq byte inside SOF
    with pytest.raises(ValueError, match="quant table"):
        decode_image_bytes(bytes(payload))
    payload = bytearray(encode_jpeg(img))
    sos = payload.find(b"\xff\xda")
    payload[sos + 2 + 2 + 1 + 1] = 0x77  # comp 1's Td/Ta -> 7/7
    with pytest.raises(ValueError, match="Huffman table"):
        decode_image_bytes(bytes(payload))


def test_jpeg_multi_scan_rejected_not_color_stripped():
    """A color SOF with a single-component SOS (non-interleaved
    multi-scan stream) must be rejected loudly, not silently decoded as
    grayscale with wrong channel features."""
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, :] = [200, 30, 90]
    payload = bytearray(encode_jpeg(rgb))
    sos = payload.find(b"\xff\xda")
    seglen = (payload[sos + 2] << 8) | payload[sos + 3]
    # rewrite the SOS to claim ONE component (Y) — shorter segment
    new_sos = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 63, 0])
    payload = payload[:sos] + new_sos + payload[sos + 2 + seglen:]
    with pytest.raises(ValueError, match="multi-scan"):
        decode_image_bytes(bytes(payload))


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM-16)
# ---------------------------------------------------------------------------

from bdt_spark.functions.imagecodec import decode_wav, encode_wav  # noqa: E402


def test_wav_mono_roundtrip():
    s = ((np.arange(1000) * 37 % 65536) - 32768).astype(np.int16)
    rate, out = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert out.shape == (1000, 1)
    assert np.array_equal(out[:, 0], s)


def test_wav_stereo_roundtrip_and_odd_length_padding():
    s = np.stack(
        [np.arange(-100, 101, dtype=np.int16),
         np.arange(100, -101, -1, dtype=np.int16)],
        axis=1,
    )
    rate, out = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and np.array_equal(out, s)
    # odd byte count (odd mono samples) pads the RIFF chunk to word size
    m = np.array([1, -2, 3], dtype=np.int16)
    payload = encode_wav(m, 8000)
    assert len(payload) % 2 == 0
    _, out2 = decode_wav(payload)
    assert np.array_equal(out2[:, 0], m)


def test_wav_unknown_chunks_skipped():
    import struct as _s

    s = np.array([100, -200, 300], dtype=np.int16)
    info = b"INFObdtwav"
    extra = b"LIST" + _s.pack("<I", len(info)) + info
    rate, out = decode_wav(encode_wav(s, 12000, extra_chunk=extra))
    assert rate == 12000 and np.array_equal(out[:, 0], s)


def test_wav_rejections():
    s = np.array([1, 2], dtype=np.int16)
    good = bytearray(encode_wav(s, 8000))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOPE" + bytes(good[4:]))
    # format tag 2 (ADPCM) rejected
    bad = bytearray(good)
    fmt_at = bytes(bad).find(b"fmt ") + 8
    bad[fmt_at] = 2
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(bad))
    # 8-bit rejected
    bad = bytearray(good)
    bad[fmt_at + 14] = 8
    with pytest.raises(ValueError, match="16-bit"):
        decode_wav(bytes(bad))
    # truncated data chunk
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_wav(bytes(good[:-3]))
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.array([1.0, 2.0]))
