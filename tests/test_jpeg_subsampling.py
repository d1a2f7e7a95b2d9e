"""Chroma subsampling (4:2:0 / 4:2:2) and restart intervals for the
from-spec baseline JPEG codec (operators/jpeg.py) — the r9 VERDICT's #1
gap: real web JPEGs are overwhelmingly subsampled and/or restart-marked.
"""

from __future__ import annotations

import numpy as np
import pytest

from arrow_udf_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    synth_jpeg_flat,
    synth_jpeg_subsampled,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def test_subsampled_fixture_exact_all_modes():
    import hashlib

    for text in ["a", "bb", "ccc", "", "documents row"]:
        hx = hashlib.md5(text.encode()).hexdigest()
        s = int(hx[9:11], 16)
        mw = int(hx[11:13], 16) % 2 + 1
        mh = int(hx[13:15], 16) % 2 + 1
        bxs = np.arange(2 * mw)[None, :]
        bys = np.arange(2 * mh)[:, None]
        want = int(3 * 64 * (2 * ((7 * bxs + 13 * bys + s) % 128)).sum())
        for mode in ("4:2:0", "4:2:2", "4:4:4"):
            w, h, ch, raw = decode_jpeg(synth_jpeg_subsampled(text, mode))
            assert (w, h, ch) == (16 * mw, 16 * mh, 3)
            assert int(raw.astype("int64").sum()) == want


def test_restart_markers_present_and_dc_reset():
    # a 4-MCU 4:2:0 stream with ri=1 must carry RST0..RST2 in sequence
    rgb = np.repeat(
        _rng(7).integers(0, 256, (32, 32, 1), dtype=np.uint8), 3, axis=2
    )
    p = encode_jpeg(32, 32, rgb.tobytes(), 3, 50, "4:2:0", restart_interval=1)
    body = p[p.index(b"\xff\xda") :]
    assert body.count(b"\xff\xd0") >= 1 and body.count(b"\xff\xd2") >= 1
    # and a DRI segment is framed before the scan
    assert b"\xff\xdd\x00\x04\x00\x01" in p
    # decode equals the same image coded WITHOUT restarts (DC reset and
    # byte-aligned resync must be transparent)
    w0, h0, c0, ref = decode_jpeg(encode_jpeg(32, 32, rgb.tobytes(), 3, 50, "4:2:0"))
    w1, h1, c1, got = decode_jpeg(p)
    assert (got == ref).all()


def test_grayscale_restart_interval_roundtrip_exact():
    # the flat-block exact fixture, re-coded with restarts: each MCU is
    # one block, so ri=2 resets the DC chain mid-image — decode must
    # still be exact
    p0 = synth_jpeg_flat("restart gray")
    w, h, _, ref = decode_jpeg(p0)
    p1 = encode_jpeg(w, h, bytes(ref.reshape(-1)), 1, 50, restart_interval=2)
    assert b"\xff\xdd" in p1 and p1 != p0
    assert (decode_jpeg(p1)[3] == ref).all()


@pytest.mark.parametrize("mode", ["4:2:0", "4:2:2"])
def test_general_color_roundtrip_tolerance(mode):
    # arbitrary color content: subsampling is lossy — bound the error
    # like any real codec (luma within quant error; chroma smoothed)
    rgb = _rng(11).integers(0, 256, (24, 40, 3), dtype=np.uint8)
    p = encode_jpeg(40, 24, rgb.tobytes(), 3, 90, mode, restart_interval=2)
    w, h, ch, raw = decode_jpeg(p)
    assert (w, h, ch) == (40, 24, 3)
    got = raw.reshape(h, w, 3).astype(np.int64)
    err = np.abs(got - rgb.astype(np.int64))
    # random per-pixel CHROMA noise is exactly what subsampling throws
    # away — the mean error is large by design (measured ~44/36 for
    # 4:2:0/4:2:2 vs ~6 for 4:4:4); this is a sanity bound, the real
    # accuracy gates are the grayscale-content and gradient tests below
    assert float(err.mean()) < 60.0
    # grayscale CONTENT through the chroma-subsampled path stays tight:
    # chroma is constant so only luma quantization error remains
    grey = np.repeat(
        _rng(12).integers(0, 256, (24, 40, 1), dtype=np.uint8), 3, axis=2
    )
    p = encode_jpeg(40, 24, grey.tobytes(), 3, 90, mode)
    got = decode_jpeg(p)[3].reshape(24, 40, 3).astype(np.int64)
    assert float(np.abs(got - grey.astype(np.int64)).mean()) < 12.0


def test_odd_dimensions_pad_and_crop():
    # dims not multiples of the MCU: encoder edge-replicates, decoder
    # crops back — shapes must be exact, content within tolerance
    for mode, (ww, hh) in [("4:2:0", (19, 13)), ("4:2:2", (17, 9))]:
        rgb = np.repeat(
            _rng(3).integers(0, 256, (hh, ww, 1), dtype=np.uint8), 3, axis=2
        )
        w, h, ch, raw = decode_jpeg(
            encode_jpeg(ww, hh, rgb.tobytes(), 3, 90, mode)
        )
        assert (w, h, ch) == (ww, hh, 3)
        got = raw.reshape(h, w, 3).astype(np.int64)
        assert float(np.abs(got - rgb.astype(np.int64)).mean()) < 12.0


def test_smooth_gradient_roundtrip_tight():
    # smooth content is JPEG's design center: subsampled decode should
    # track a gradient closely at high quality
    x = np.linspace(0, 255, 32)[None, :]
    y = np.linspace(0, 255, 32)[:, None]
    img = np.clip((x + y) / 2, 0, 255).astype(np.uint8)
    rgb = np.stack([img, img, img], axis=2)
    p = encode_jpeg(32, 32, rgb.tobytes(), 3, 90, "4:2:0")
    got = decode_jpeg(p)[3].reshape(32, 32, 3).astype(np.int64)
    assert float(np.abs(got - rgb.astype(np.int64)).mean()) < 6.0


def test_unknown_subsampling_refuses():
    with pytest.raises(NotImplementedError):
        encode_jpeg(8, 8, bytes(192), 3, 50, "3:1:1")


@pytest.mark.parametrize("mode", ["4:1:1", "4:4:0"])
def test_exotic_subsampling_roundtrip(mode):
    # the decoder's MCU loop is sampling-generic; these two layouts
    # (DV-camera 4:1:1, vertical-only 4:4:0) prove the non-square and
    # >2 sampling-factor paths end-to-end
    grey = np.repeat(
        _rng(21).integers(0, 256, (24, 40, 1), dtype=np.uint8), 3, axis=2
    )
    w, h, ch, raw = decode_jpeg(
        encode_jpeg(40, 24, grey.tobytes(), 3, 90, mode, restart_interval=2)
    )
    assert (w, h, ch) == (40, 24, 3)
    got = raw.reshape(24, 40, 3).astype(np.int64)
    assert float(np.abs(got - grey.astype(np.int64)).mean()) < 12.0
