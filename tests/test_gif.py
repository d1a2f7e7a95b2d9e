"""GIF codec tests (r8): real variable-width LZW both directions —
compressor builds a dictionary with CLEAR resets, decompressor handles
width growth and the cScSc case; they share only the spec."""

import hashlib
import struct

import numpy as np
import pytest

from arrow_udf_spark.operators.multimodal import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    synth_gif,
)


def _analytic(text):
    dig = hashlib.md5(text.encode()).digest()
    s, w, h = dig[9], dig[10] % 16 + 8, dig[11] % 16 + 8
    idx = (3 * np.arange(w)[None, :] + 5 * np.arange(h)[:, None] + s) % 256
    exp = (11 * idx[:, :, None] + 17 * np.arange(3)[None, None, :] + s) % 256
    return w, h, exp


def test_synth_roundtrip_pixels_exact():
    for text in ["", "a", "gif world", "z" * 400]:
        w, h, exp = _analytic(text)
        W, H, ch, raw = decode_gif(synth_gif(text))
        assert (W, H, ch) == (w, h, 3)
        assert (raw.reshape(h, w, 3) == exp).all()


def test_lzw_roundtrip_adversarial():
    import random

    random.seed(11)
    cases = [
        b"",
        bytes(255) * 64,              # long runs -> deep dictionary chains
        bytes(range(256)) * 30,       # cycling literals -> width growth
        bytes([1, 1]) * 3000,         # cScSc-heavy
        bytes(random.randrange(256) for _ in range(20000)),  # forces CLEARs
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data


def test_lzw_actually_compresses_runs():
    data = bytes(7) * 4096
    assert len(_lzw_encode(data, 8)) < len(data) // 4  # real compression


def test_gif89a_extension_blocks_skipped():
    p = bytearray(synth_gif("ext"))
    p[4] = ord("9")  # GIF87a -> GIF89a
    # splice a graphic-control extension before the image descriptor
    at = p.index(0x2C, 13 + 768)
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    p[at:at] = ext
    w, h, exp = _analytic("ext")
    W, H, ch, raw = decode_gif(bytes(p))
    assert (W, H, ch) == (w, h, 3) and (raw.reshape(h, w, 3) == exp).all()


def test_refusals():
    p = bytearray(synth_gif("bad"))
    at = p.index(0x2C, 13 + 768)
    # interlace flag in the image descriptor's packed byte
    q = bytearray(p)
    q[at + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(q))
    # local color table flag
    q = bytearray(p)
    q[at + 9] |= 0x80
    with pytest.raises(NotImplementedError, match="local color"):
        decode_gif(bytes(q))
    # not a GIF
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"P6\n2 2\n255\n" + b"\x00" * 12)
    # truncated LZW payload -> length mismatch
    q = bytearray(p)
    # zero out the last data sub-block length chain: chop pixels
    q2 = bytes(q[: len(q) // 2]) + b"\x00\x3b"
    with pytest.raises((ValueError, IndexError, struct.error)):
        decode_gif(q2)


def test_gif_pipeline_spark(spark):
    from arrow_udf_spark.operators.multimodal import (
        decode_gif as dg,
        png_pipeline,
        synth_gif as sg,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in png_pipeline(df, synth=sg, decode=dg).collect()
    }
    for did, text in [(1, "alpha"), (2, "beta"), (3, "")]:
        w, h, exp = _analytic(text)
        r = rows[did]
        assert (r.w, r.h, r.channels) == (w, h, 3)
        assert r.checksum == int(exp.sum())
