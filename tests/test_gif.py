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


def test_interlace_flag_decodes_with_row_reorder():
    # r9: flipping the interlace flag no longer refuses — the decoder
    # treats wire rows as the four-pass order, so the natural image comes
    # back ROW-PERMUTED by the inverse ordering (rows written naturally
    # but read as interlaced scatter back by the pass order)
    import numpy as np

    from arrow_udf_spark.operators.multimodal import _gif_row_order

    p = bytearray(synth_gif("bad"))
    at = p.index(0x2C, 13 + 768)
    q = bytearray(p)
    q[at + 9] |= 0x40
    w, h, exp = _analytic("bad")
    W, H, ch, raw = decode_gif(bytes(q))
    assert (W, H, ch) == (w, h, 3)
    scattered = np.zeros_like(exp)
    scattered[_gif_row_order(h)] = exp
    assert (raw.reshape(h, w, 3) == scattered).all()


def test_refusals():
    p = bytearray(synth_gif("bad"))
    # not a GIF
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"P6\n2 2\n255\n" + b"\x00" * 12)
    # truncated LZW payload -> length mismatch
    q = bytearray(p)
    # zero out the last data sub-block length chain: chop pixels
    q2 = bytes(q[: len(q) // 2]) + b"\x00\x3b"
    with pytest.raises((ValueError, IndexError, struct.error)):
        decode_gif(q2)


def test_anim_roundtrip_closed_form():
    import hashlib

    import numpy as np

    from arrow_udf_spark.operators.multimodal import (
        decode_gif_frames,
        synth_gif_anim,
    )

    for text in ["", "hello world", "frames"]:
        hx = hashlib.md5(text.encode()).hexdigest()
        s = int(hx[13:15], 16)
        w = int(hx[15:17], 16) % 12 + 6
        h = int(hx[17:19], 16) % 12 + 6
        W, H, frames = decode_gif_frames(synth_gif_anim(text))
        assert (W, H) == (w, h)
        assert len(frames) == s % 3 + 2
        for f, (x0, y0, fw, fh, rgb) in enumerate(frames):
            assert (x0, y0, fw, fh) == (f, f, w - f, h - f)
            xs = np.arange(f, w, dtype=np.int64)[None, :, None]
            ys = np.arange(f, h, dtype=np.int64)[:, None, None]
            cs = np.arange(3, dtype=np.int64)[None, None, :]
            idx = (3 * xs + 5 * ys + 7 * f + s) % 256
            if f % 2 == 0:
                exp = (11 * idx + 17 * cs + s) % 256
            else:
                exp = (7 * idx + 23 * cs + s + f) % 256
            assert (rgb.reshape(fh, fw, 3) == exp).all(), (text, f)


def test_anim_single_frame_api_refuses_multi():
    from arrow_udf_spark.operators.multimodal import synth_gif_anim

    with pytest.raises(ValueError, match="multi-frame"):
        decode_gif(synth_gif_anim("two frames at least"))


def test_local_table_scoped_to_its_frame():
    # frame 1 carries an LCT; frame 0 and 2 must still expand through the
    # GLOBAL table (palette scoping, not last-seen-table)
    import numpy as np

    from arrow_udf_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.default_rng(3)
    gct = rng.integers(0, 256, 768, dtype=np.uint8).tobytes()
    lct = rng.integers(0, 256, 768, dtype=np.uint8).tobytes()
    idx = rng.integers(0, 256, 20, dtype=np.uint8).tobytes()
    mk = lambda **kw: dict(x0=0, y0=0, w=5, h=4, indices=idx, **kw)
    _, _, frames = decode_gif_frames(
        encode_gif_frames(5, 4, [mk(), mk(lct=lct), mk()], gct)
    )
    pg = np.frombuffer(gct, dtype=np.uint8).reshape(-1, 3)
    pl = np.frombuffer(lct, dtype=np.uint8).reshape(-1, 3)
    ia = np.frombuffer(idx, dtype=np.uint8).reshape(4, 5)
    assert (frames[0][4] == pg[ia].reshape(4, 15)).all()
    assert (frames[1][4] == pl[ia].reshape(4, 15)).all()
    assert (frames[2][4] == pg[ia].reshape(4, 15)).all()


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
