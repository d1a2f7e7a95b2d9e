"""Baseline JPEG codec (operators/jpeg.py) — implemented from ITU-T
T.81 with numpy only.  Encoder and decoder share the spec constants
(Annex K tables, zigzag) but no algorithmic code: filtering DCT vs
IDCT, canonical code BUILD vs bit-serial DECODE, stuffing vs
unstuffing — a bug on either side breaks the round trips below."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from arrow_udf_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    synth_jpeg_flat,
)


def test_flat_block_fixture_is_exact():
    # even flat blocks -> DC multiple of quant step 16 -> lossless
    for text in ["", "hello world", "x" * 300]:
        hx = hashlib.md5(text.encode()).hexdigest()
        s = int(hx[19:21], 16)
        bw = int(hx[21:23], 16) % 3 + 1
        bh = int(hx[23:25], 16) % 3 + 1
        w, h, ch, raw = decode_jpeg(synth_jpeg_flat(text))
        assert (w, h, ch) == (bw * 8, bh * 8, 1)
        v = 2 * (
            (7 * np.arange(bw)[None, :] + 13 * np.arange(bh)[:, None] + s)
            % 128
        )
        assert (raw == np.kron(v, np.ones((8, 8), dtype=np.int64))).all()


def test_gray_roundtrip_tolerance():
    # random noise is JPEG's worst case; the bound proves the transform
    # chain is sane, not that JPEG is lossless
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    w, h, ch, raw = decode_jpeg(
        encode_jpeg(40, 24, img.tobytes(), channels=1, quality=90)
    )
    assert (w, h, ch) == (40, 24, 1)
    err = np.abs(raw.astype(int) - img.astype(int))
    assert err.max() <= 32 and np.sqrt((err**2).mean()) < 8


def test_smooth_image_near_exact_at_q90():
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    smooth = ((xx * 3 + yy * 2) // 4 % 200 + 20).astype(np.uint8)
    _, _, _, raw = decode_jpeg(
        encode_jpeg(40, 24, smooth.tobytes(), channels=1, quality=90)
    )
    assert np.abs(raw.astype(int) - smooth.astype(int)).max() <= 2


def test_color_roundtrip_tolerance():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    w, h, ch, raw = decode_jpeg(
        encode_jpeg(16, 16, img.tobytes(), channels=3, quality=90)
    )
    assert ch == 3
    err = np.abs(raw.reshape(16, 16, 3).astype(int) - img.astype(int))
    assert np.sqrt((err**2).mean()) < 15


def test_non_block_aligned_dims():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    w, h, ch, raw = decode_jpeg(
        encode_jpeg(21, 13, img.tobytes(), channels=1, quality=85)
    )
    assert (w, h) == (21, 13) and raw.shape == (13, 21)


def test_byte_stuffing_is_load_bearing():
    # find a noisy image whose entropy stream contains a stuffed
    # 0xFF 0x00, then round-trip it — proving decode's unstuffing path
    # runs and stays aligned
    rng = np.random.default_rng(7)
    for _ in range(50):
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        p = encode_jpeg(16, 16, img.tobytes(), channels=1, quality=50)
        data = p[p.find(b"\xff\xda") :]
        if b"\xff\x00" in data:
            w, h, ch, raw = decode_jpeg(p)
            assert (w, h, ch) == (16, 16, 1)
            err = np.abs(raw.astype(int) - img.astype(int))
            assert err.max() <= 128  # decode stayed bit-aligned
            return
    raise AssertionError("no stuffed byte found in 50 noisy encodes")


def test_refusals():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + bytes(16))
    p = bytearray(encode_jpeg(8, 8, bytes(64), channels=1))
    i = p.find(b"\xff\xc0")
    p[i + 1] = 0xC2  # SOF2 now DECODES — but a baseline-shaped scan
    # (Ss=0, Se=63) is a malformed progressive DC scan and must refuse
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(p))
    p[i + 1] = 0xC9  # arithmetic coding stays out of scope
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(p))
    # truncated entropy stream
    full = encode_jpeg(16, 16, bytes(256), channels=1)
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) // 2])


def test_jpeg_pixels_query_spark(spark):
    from arrow_udf_spark.operators.multimodal import png_pipeline
    from arrow_udf_spark.operators.jpeg import decode_jpeg as dj

    df = spark.createDataFrame([(1, "alpha"), (2, "")], ["doc_id", "text"])
    rows = {
        r.doc_id: r
        for r in png_pipeline(df, synth=synth_jpeg_flat, decode=dj).collect()
    }
    for did, text in [(1, "alpha"), (2, "")]:
        w, h, ch, raw = dj(synth_jpeg_flat(text))
        r = rows[did]
        assert (r.w, r.h, r.channels) == (w, h, ch)
        assert r.checksum == int(raw.astype("int64").sum())
