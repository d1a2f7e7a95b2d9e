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
    # the one illegal-per-spec combo left: a 16-bit PALETTE must refuse
    # loudly (every legal depth/color/interlace combination decodes
    # since late r9)
    import struct, zlib

    from arrow_udf_spark.operators.multimodal import synth_png_pal

    p = bytearray(synth_png_pal("deep"))
    ihdr = bytearray(p[16:29])
    ihdr[8] = 16  # bit depth byte of the IHDR
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    p[16:29] = ihdr
    p[29:33] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError, match="16-bit palettes"):
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


def test_palette_trns_spliced_decodes_rgba():
    # translucent palette decodes for real since r9: splice a one-entry
    # tRNS chunk (alpha 128 for index 0) before IDAT — the decode must
    # come back RGBA with alpha 128 exactly where the index is 0 and the
    # opaque-255 padding everywhere else
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
    w, h, ch, raw = decode_png(bytes(p))
    assert ch == 4
    dig = hashlib.md5(b"trns").digest()
    s = dig[6]
    idx = (
        3 * np.arange(w)[None, :] + 5 * np.arange(h)[:, None] + s
    ) % 256
    alpha = raw.reshape(h, w, 4)[:, :, 3]
    assert (alpha == np.where(idx == 0, 128, 255)).all()


def test_trns_longer_than_palette_rejected():
    with pytest.raises(ValueError, match="tRNS"):
        encode_png(
            2,
            2,
            bytes(4),
            channels=1,
            palette=bytes(6),  # 2 entries
            trns=bytes(3),  # 3 alphas > 2 entries
        )


def test_deep_synths_roundtrip_closed_form():
    from arrow_udf_spark.operators.multimodal import (
        synth_png16,
        synth_png_adam7,
        synth_png_trns,
    )

    for text in ["", "hello world", "spark"]:
        hx = hashlib.md5(text.encode()).hexdigest()
        dig = hashlib.md5(text.encode()).digest()

        w, h, ch, raw = decode_png(synth_png16(text))
        s, ew, eh = dig[12], dig[13] % 12 + 6, dig[14] % 12 + 6
        exp = (
            7 * np.arange(ew)[None, :, None]
            + 13 * np.arange(eh)[:, None, None]
            + 31 * np.arange(3)[None, None, :]
            + 257 * int(s)
        ) % 65536
        assert (w, h, ch) == (ew, eh, 3) and raw.dtype == np.uint16
        assert (raw.reshape(h, w, 3) == exp).all()

        w, h, ch, raw = decode_png(synth_png_adam7(text))
        s = int(hx[1:3], 16)
        ew, eh = int(hx[3:5], 16) % 16 + 8, int(hx[5:7], 16) % 16 + 8
        exp = (
            7 * np.arange(ew)[None, :, None]
            + 13 * np.arange(eh)[:, None, None]
            + 31 * np.arange(4)[None, None, :]
            + s
        ) % 256
        assert (w, h, ch) == (ew, eh, 4)
        assert (raw.reshape(h, w, 4) == exp).all()

        payload = synth_png_trns(text)
        w, h, ch, raw = decode_png(payload)
        s = int(hx[7:9], 16)
        ew, eh = int(hx[9:11], 16) % 16 + 8, int(hx[11:13], 16) % 16 + 8
        idx = (3 * np.arange(ew)[None, :] + 5 * np.arange(eh)[:, None] + s) % 256
        rgb = (11 * idx[:, :, None] + 17 * np.arange(3)[None, None, :] + s) % 256
        alpha = np.where(idx < 128, (29 * idx + s) % 256, 255)
        exp = np.concatenate([rgb, alpha[:, :, None]], axis=2)
        assert (w, h, ch) == (ew, eh, 4)
        assert (raw.reshape(h, w, 4) == exp).all()
        assert parse_image_header(payload)["channels"] == 4


@pytest.mark.parametrize("dims", [(1, 1), (2, 3), (7, 5), (8, 1), (1, 9)])
def test_adam7_and_16bit_arbitrary_roundtrip(dims):
    # odd dims exercise EMPTY and partial Adam7 passes; every channel
    # count and both depths, both layouts
    w, h = dims
    for chn in (1, 2, 3, 4):
        rng = np.random.default_rng(w * 100 + h * 10 + chn)
        px = rng.integers(0, 256, size=(h, w * chn), dtype=np.uint8)
        pw, ph, ech, raw = decode_png(
            encode_png(w, h, px.tobytes(), channels=chn, interlace=True)
        )
        assert (pw, ph, ech) == (w, h, chn) and (raw == px).all()
        px16 = rng.integers(0, 65536, size=(h, w * chn), dtype=np.uint16)
        for il in (False, True):
            pw, ph, ech, raw = decode_png(
                encode_png(
                    w,
                    h,
                    px16.astype(">u2").tobytes(),
                    channels=chn,
                    depth=16,
                    interlace=il,
                )
            )
            assert (pw, ph, ech) == (w, h, chn) and (raw == px16).all()


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


def test_png_deep_pipeline_spark(spark):
    from arrow_udf_spark.operators.multimodal import (
        decode_png,
        png_deep_pipeline,
        synth_png16,
        synth_png_adam7,
        synth_png_trns,
    )

    texts = [(1, "alpha"), (2, "")]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    rows = {
        (r.doc_id, r.variant): r for r in png_deep_pipeline(df).collect()
    }
    synths = {"16bit": synth_png16, "adam7": synth_png_adam7, "trns": synth_png_trns}
    for did, text in texts:
        for variant, synth in synths.items():
            w, h, ch, raw = decode_png(synth(text))
            r = rows[(did, variant)]
            assert (r.w, r.h, r.channels) == (w, h, ch)
            assert r.checksum == int(raw.astype("int64").sum())


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_bit_packed_roundtrip(depth):
    from arrow_udf_spark.operators.multimodal import encode_png as enc

    rng = np.random.default_rng(depth)
    for (w, h) in [(1, 1), (3, 2), (13, 5), (17, 11)]:
        px = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
        for il in (False, True):
            pw, ph, ch, raw = decode_png(
                enc(w, h, px.tobytes(), channels=1, depth=depth, interlace=il)
            )
            assert (pw, ph, ch) == (w, h, 1) and (raw == px).all()


def test_bit_packed_palette_trns_roundtrip():
    from arrow_udf_spark.operators.multimodal import encode_png as enc

    rng = np.random.default_rng(5)
    plte = rng.integers(0, 256, 768, dtype=np.uint8).tobytes()
    trns = rng.integers(0, 256, 5, dtype=np.uint8).tobytes()
    idx = rng.integers(0, 16, size=(7, 9), dtype=np.uint8)
    for il in (False, True):
        w, h, ch, raw = decode_png(
            enc(9, 7, idx.tobytes(), channels=1, depth=4, palette=plte,
                trns=trns, interlace=il)
        )
        assert ch == 4
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        alpha = np.full(256, 255, dtype=np.uint8)
        alpha[:5] = np.frombuffer(trns, dtype=np.uint8)
        exp = np.concatenate([pal[idx], alpha[idx][:, :, None]], axis=2)
        assert (raw.reshape(7, 9, 4) == exp).all()


def test_bit_packed_sample_range_enforced():
    with pytest.raises(ValueError, match="out of range"):
        encode_png(2, 1, bytes([3, 1]), channels=1, depth=1)


def test_deep_synths_bitpacked_closed_form():
    from arrow_udf_spark.operators.multimodal import (
        synth_png_bit2,
        synth_png_pal4,
    )

    for text in ["", "hello"]:
        hx = hashlib.md5(text.encode()).hexdigest()
        w, h, ch, raw = decode_png(synth_png_bit2(text))
        s = int(hx[2:4], 16)
        ew, eh = int(hx[4:6], 16) % 16 + 8, int(hx[8:10], 16) % 16 + 8
        exp = (
            np.arange(ew)[None, :] + 2 * np.arange(eh)[:, None] + s
        ) % 4
        assert (w, h, ch) == (ew, eh, 1) and (raw == exp).all()

        w, h, ch, raw = decode_png(synth_png_pal4(text))
        s = int(hx[10:12], 16)
        ew, eh = int(hx[12:14], 16) % 16 + 8, int(hx[14:16], 16) % 16 + 8
        idx = (3 * np.arange(ew)[None, :] + 5 * np.arange(eh)[:, None] + s) % 16
        exp = (11 * idx[:, :, None] + 17 * np.arange(3)[None, None, :] + s) % 256
        assert (w, h, ch) == (ew, eh, 3)
        assert (raw.reshape(h, w, 3) == exp).all()


def test_colorkey_trns_grey_and_rgb():
    # tRNS on color types 0/2 is COLORKEY transparency (spec 11.3.2):
    # the decode must grow an alpha channel, 0 exactly on key-matching
    # pixels (r9 code-review catch: previously silently dropped)
    import struct, zlib

    def splice(p, data):
        chunk = (
            struct.pack(">I", len(data))
            + b"tRNS"
            + data
            + struct.pack(">I", zlib.crc32(b"tRNS" + data) & 0xFFFFFFFF)
        )
        p = bytearray(p)
        at = p.find(b"IDAT") - 4
        p[at:at] = chunk
        return bytes(p)

    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(4, 15), dtype=np.uint8)
    px[1, 3:6] = [10, 20, 30]
    p = splice(encode_png(5, 4, px.tobytes(), channels=3),
               struct.pack(">3H", 10, 20, 30))
    w, h, ch, raw = decode_png(p)
    assert ch == 4
    a = raw.reshape(4, 5, 4)[:, :, 3]
    exp = np.full((4, 5), 255)
    exp[1, 1] = 0
    assert (a == exp).all()
    assert (raw.reshape(4, 5, 4)[:, :, :3].reshape(4, 15) == px).all()
    # 16-bit grey key
    px16 = rng.integers(0, 65536, size=(3, 4), dtype=np.uint16)
    px16[2, 0] = 513
    p = splice(
        encode_png(4, 3, px16.astype(">u2").tobytes(), channels=1, depth=16),
        struct.pack(">H", 513),
    )
    w, h, ch, raw = decode_png(p)
    assert ch == 2 and raw.dtype == np.uint16
    assert raw.reshape(3, 4, 2)[2, 0, 1] == 0
    # tRNS on an alpha color type is prohibited per spec
    p = splice(encode_png(2, 2, bytes(16), channels=4),
               struct.pack(">3H", 0, 0, 0))
    with pytest.raises(ValueError, match="prohibited"):
        decode_png(p)
