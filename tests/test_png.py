"""PNG codec tests: the r8 real-decode upgrade (stdlib zlib + the five
scanline filters; no codec library).  Encoder and decoder share only the
format spec — filtering is vectorized forward math, unfiltering is the
sequential inverse — so these tests break if either side drifts."""

import hashlib

import numpy as np
import pytest

from arrow_udf_spark.operators.multimodal import (
    decode_png,
    encode_png,
    parse_image_header,
    synth_png,
)


def _analytic(text):
    dig = hashlib.md5(text.encode()).digest()
    s, w, h = dig[3], dig[4] % 16 + 8, dig[5] % 16 + 8
    exp = (
        7 * np.arange(w)[None, :, None]
        + 13 * np.arange(h)[:, None, None]
        + 31 * np.arange(4)[None, None, :]
        + s
    ) % 256
    return w, h, exp


def test_synth_roundtrip_pixels_exact():
    for text in ["", "a", "hello world", "x" * 500]:
        w, h, exp = _analytic(text)
        W, H, ch, raw = decode_png(synth_png(text))
        assert (W, H, ch) == (w, h, 4)
        assert (raw.reshape(h, w, 4) == exp).all()


def test_every_filter_type_appears():
    # h >= 8 always, so filters 0..4 all occur via the y % 5 cycle;
    # decode already proved reconstruction — here assert the encoder
    # really emitted all five (guards against a silent all-None encoder)
    import zlib

    p = synth_png("filters")
    w, h, _, _ = decode_png(p)
    # IDAT payload: find the chunk and inflate
    pos, idat = 8, b""
    while pos + 8 <= len(p):
        (clen,) = int.from_bytes(p[pos : pos + 4], "big"),
        clen = clen[0] if isinstance(clen, tuple) else clen
        tag = p[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += p[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
    flat = zlib.decompress(idat)
    stride = w * 4 + 1
    ftypes = {flat[y * stride] for y in range(h)}
    assert ftypes == {0, 1, 2, 3, 4}


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_all_color_types_roundtrip(channels):
    # grey(0) / grey+alpha(4) / RGB(2) / RGBA(6): the filter math is
    # bytes-per-pixel generic, so every supported color type round-trips
    arr = (np.arange(11 * 9 * channels) * 37 % 256).astype(np.uint8)
    w, h, ch, raw = decode_png(
        encode_png(11, 9, arr.tobytes(), channels=channels)
    )
    assert (w, h, ch) == (11, 9, channels)
    assert (raw.flatten() == arr).all()


def test_header_parse_matches_decode():
    p = synth_png("hdr")
    m = parse_image_header(p)
    w, h, ch, _ = decode_png(p)
    assert (m["width"], m["height"], m["channels"]) == (w, h, ch)
    assert m["n_bytes"] == len(p)


def test_crc_corruption_detected():
    p = bytearray(synth_png("crc"))
    p[40] ^= 0xFF  # inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))


def test_not_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n2 2\n255\n" + b"\x00" * 12)


def test_unsupported_shapes_refused():
    # 16-bit depth must refuse, not mis-decode
    p = bytearray(synth_png("deep"))
    # IHDR data starts at offset 16; bit depth at 16+8=24
    import struct, zlib

    ihdr = bytearray(p[16:29])
    ihdr[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    p[16:29] = ihdr
    p[29:33] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(bytes(p))


def test_palette_without_plte_rejected():
    # flipping color type to 3 without shipping a PLTE is malformed,
    # not merely unsupported — r8.5 decodes palette for real
    p = bytearray(synth_png("pal"))
    import struct, zlib

    ihdr = bytearray(p[16:29])
    ihdr[9] = 3
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    p[16:29] = ihdr
    p[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(p))


def _analytic_pal(text):
    dig = hashlib.md5(text.encode()).digest()
    s, w, h = dig[6], dig[7] % 16 + 8, dig[8] % 16 + 8
    idx = (3 * np.arange(w)[None, :] + 5 * np.arange(h)[:, None] + s) % 256
    exp = (11 * idx[:, :, None] + 17 * np.arange(3)[None, None, :] + s) % 256
    return w, h, exp


def test_palette_roundtrip_pixels_exact():
    from arrow_udf_spark.operators.multimodal import synth_png_pal

    for text in ["", "a", "palette world", "y" * 300]:
        w, h, exp = _analytic_pal(text)
        W, H, ch, raw = decode_png(synth_png_pal(text))
        assert (W, H, ch) == (w, h, 3)
        assert (raw.reshape(h, w, 3) == exp).all()


def test_palette_encode_decode_arbitrary():
    # indices that hit every PLTE slot, unfiltered through all 5 filters
    pal = bytes((np.arange(256 * 3) * 29 % 256).astype(np.uint8))
    idx = (np.arange(13 * 9) * 251 % 256).astype(np.uint8)
    w, h, ch, raw = decode_png(
        encode_png(13, 9, idx.tobytes(), channels=1, palette=pal)
    )
    exp = np.frombuffer(pal, dtype=np.uint8).reshape(256, 3)[
        idx.reshape(9, 13)
    ]
    assert (w, h, ch) == (13, 9, 3)
    assert (raw.reshape(9, 13, 3) == exp).all()


def test_palette_trns_refused():
    # translucent palette stays a documented descope: splice a tRNS
    # chunk before IDAT and expect the loud refusal
    import struct, zlib

    from arrow_udf_spark.operators.multimodal import synth_png_pal

    p = bytearray(synth_png_pal("trns"))
    data = bytes([128])
    chunk = (
        struct.pack(">I", len(data))
        + b"tRNS"
        + data
        + struct.pack(">I", zlib.crc32(b"tRNS" + data) & 0xFFFFFFFF)
    )
    at = p.find(b"IDAT") - 4
    p[at:at] = chunk
    with pytest.raises(NotImplementedError, match="tRNS"):
        decode_png(bytes(p))


def test_palette_index_out_of_range_rejected():
    # 2-entry PLTE but an index of 5: spec violation, must not wrap
    pal = bytes(range(6))
    idx = bytes([0, 1, 5, 1] * 8 * 2)  # 8x8
    with pytest.raises(ValueError, match="index out of PLTE"):
        decode_png(encode_png(8, 8, idx, channels=1, palette=pal))


def test_png_pipeline_spark(spark):
    from arrow_udf_spark.operators.multimodal import png_pipeline

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in png_pipeline(df).collect()}
    for did, text in [(1, "alpha"), (2, "beta"), (3, "")]:
        w, h, exp = _analytic(text)
        r = rows[did]
        assert (r.w, r.h, r.channels) == (w, h, 4)
        assert r.checksum == int(exp.sum())
