"""24-bit BMP codec (operators/multimodal.py): the bottom-up / BGR /
row-padding traps, top-down DIBs, and refusals."""

import hashlib
import struct

import numpy as np
import pytest

from arrow_udf_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
    parse_image_header,
    synth_bmp,
)


@pytest.mark.parametrize("dims", [(1, 1), (2, 3), (5, 4), (6, 7), (7, 2)])
def test_roundtrip_with_padding(dims):
    # widths where w*3 % 4 != 0 exercise the per-row padding strip
    w, h = dims
    rng = np.random.default_rng(w * 10 + h)
    px = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    pw, ph, ch, raw = decode_bmp(encode_bmp(w, h, px.tobytes()))
    assert (pw, ph, ch) == (w, h, 3) and (raw == px).all()


def test_synth_closed_form_and_header():
    for text in ["", "hello", "bmp world"]:
        hx = hashlib.md5(text.encode()).hexdigest()
        s = int(hx[29:31], 16)
        w = int(hx[31], 16) % 12 + 6
        h = int(hx[0], 16) % 12 + 6
        W, H, ch, raw = decode_bmp(synth_bmp(text))
        exp = (
            7 * np.arange(w)[None, :, None]
            + 13 * np.arange(h)[:, None, None]
            + 31 * np.arange(3)[None, None, :]
            + s
        ) % 256
        assert (W, H, ch) == (w, h, 3)
        assert (raw.reshape(h, w, 3) == exp).all()
        m = parse_image_header(synth_bmp(text))
        assert (m["width"], m["height"], m["channels"]) == (w, h, 3)


def test_top_down_negative_height():
    p = bytearray(encode_bmp(4, 3, bytes(range(36))))
    struct.pack_into("<i", p, 22, -3)  # negative height = top-down DIB
    _, _, _, raw = decode_bmp(bytes(p))
    orig = np.frombuffer(bytes(range(36)), dtype=np.uint8).reshape(3, 12)
    # encoder stored rows bottom-up; a top-down reader must NOT re-flip
    assert (raw == orig[::-1]).all()


def test_refusals():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG" + bytes(60))
    p = bytearray(encode_bmp(2, 2, bytes(12)))
    struct.pack_into("<H", p, 28, 8)  # 8-bit palette BMP
    with pytest.raises(NotImplementedError, match="bpp=8"):
        decode_bmp(bytes(p))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(encode_bmp(4, 4, bytes(48))[:-8]))


def test_bitmapcoreheader_roundtrip():
    # OS/2 BITMAPCOREHEADER (12-byte, u16 dims) — the r9 residual: same
    # pixel rows, different header geometry
    import numpy as np

    from arrow_udf_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        parse_image_header,
    )

    rgb = np.random.default_rng(3).integers(0, 256, (7, 9, 3), dtype=np.uint8)
    p = encode_bmp(9, 7, rgb.tobytes(), core=True)
    import struct

    assert struct.unpack_from("<I", p, 14)[0] == 12
    w, h, ch, raw = decode_bmp(p)
    assert (w, h, ch) == (9, 7, 3)
    assert (raw.reshape(7, 9, 3) == rgb).all()
    hdr = parse_image_header(p)
    assert (hdr["width"], hdr["height"], hdr["channels"]) == (9, 7, 3)
