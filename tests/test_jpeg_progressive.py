"""Progressive (SOF2) JPEG — spectral selection, DC/AC successive
approximation, EOBRUN coding, restart intervals (operators/jpeg.py).

The load-bearing property: progressive entropy coding is a LOSSLESS
re-arrangement of the same quantized coefficients, so progressive decode
must be BIT-IDENTICAL to baseline decode of the same image at the same
quality/subsampling — proven here across gray/color, every subsampling,
odd dims, and restart intervals.
"""

from __future__ import annotations

import numpy as np
import pytest

from arrow_udf_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    synth_jpeg_progressive,
)


@pytest.mark.parametrize(
    "w,h,ch,sub,ri,seed",
    [
        (16, 16, 1, "4:4:4", 0, 1),
        (24, 16, 1, "4:4:4", 3, 2),
        (32, 32, 3, "4:4:4", 0, 3),
        (32, 32, 3, "4:2:0", 0, 4),
        (40, 24, 3, "4:2:0", 2, 5),
        (17, 13, 3, "4:2:2", 1, 6),
        (8, 8, 1, "4:4:4", 1, 7),
    ],
)
def test_progressive_bitidentical_to_baseline(w, h, ch, sub, ri, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, ch), dtype=np.uint8
    )
    base = decode_jpeg(encode_jpeg(w, h, img.tobytes(), ch, 75, sub))
    pb = encode_jpeg_progressive(
        w, h, img.tobytes(), ch, 75, sub, restart_interval=ri
    )
    assert b"\xff\xc2" in pb  # SOF2 frame
    prog = decode_jpeg(pb)
    assert base[:3] == prog[:3]
    assert (base[3] == prog[3]).all()
    sub_h = {"4:4:4": 1, "4:2:2": 2, "4:2:0": 2}[sub] if ch == 3 else 1
    sub_v = {"4:4:4": 1, "4:2:2": 1, "4:2:0": 2}[sub] if ch == 3 else 1
    mcus = -(-w // (8 * sub_h)) * -(-h // (8 * sub_v))
    if ri and mcus > ri:  # markers only appear BETWEEN intervals
        scan0 = pb.index(b"\xff\xda")
        assert any(
            bytes([0xFF, 0xD0 + n]) in pb[scan0:] for n in range(8)
        )


def test_progressive_fixture_exact():
    import hashlib

    for text in ["a", "bb", "", "progressive row"]:
        hx = hashlib.md5(text.encode()).hexdigest()
        s = int(hx[9:11], 16)
        mw = int(hx[11:13], 16) % 2 + 1
        mh = int(hx[13:15], 16) % 2 + 1
        bxs = np.arange(2 * mw)[None, :]
        bys = np.arange(2 * mh)[:, None]
        want = int(3 * 64 * (2 * ((7 * bxs + 13 * bys + s) % 128)).sum())
        w, h, ch, raw = decode_jpeg(synth_jpeg_progressive(text))
        assert (w, h, ch) == (16 * mw, 16 * mh, 3)
        assert int(raw.astype("int64").sum()) == want


def test_eobrun_multi_block_runs():
    # a mostly-flat image makes long EOB runs (> 1 block) in the AC
    # scans: the EOBn symbols (r > 0) must round-trip through the
    # progressive AC table
    img = np.full((64, 64, 1), 130, dtype=np.uint8)
    img[0, 0, 0] = 90  # one busy block; the other 63 share EOB runs
    p = encode_jpeg_progressive(64, 64, img.tobytes(), 1, 75)
    base = decode_jpeg(encode_jpeg(64, 64, img.tobytes(), 1, 75))
    prog = decode_jpeg(p)
    assert (base[3] == prog[3]).all()


def test_ac_refinement_correction_bits_matter():
    # high-frequency content at quality 90 produces multi-bit AC
    # magnitudes, so the Al=2 -> 1 -> 0 refinement passes carry real
    # correction bits; a decoder that mis-tracks them cannot match
    # baseline
    x = np.linspace(0, 8 * np.pi, 48)
    img = (127 + 120 * np.sin(x)[None, :] * np.cos(x)[:, None]).astype(
        np.uint8
    )
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    base = decode_jpeg(encode_jpeg(48, 48, rgb.tobytes(), 3, 90, "4:2:0"))
    prog = decode_jpeg(
        encode_jpeg_progressive(48, 48, rgb.tobytes(), 3, 90, "4:2:0")
    )
    assert (base[3] == prog[3]).all()


def test_malformed_progressive_refuses():
    p = bytearray(synth_jpeg_progressive("x"))
    # corrupt a scan header: DC scan with Se != 0
    i = p.index(b"\xff\xda")
    ns = p[i + 4]
    se_off = i + 5 + 2 * ns + 1
    assert p[se_off - 1] == 0  # Ss of the DC scan
    p[se_off] = 63
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))


def test_truncated_and_corrupt_payloads_refuse_cleanly():
    # the decode_gif-truncation ADVICE class, applied to the new r10
    # surfaces: every truncation/corruption must raise ValueError or
    # NotImplementedError — never IndexError/struct.error/KeyError
    import pytest

    from arrow_udf_spark.operators.multimodal import decode_image

    p = synth_jpeg_progressive("robustness")
    for cut in (3, 10, len(p) // 3, len(p) // 2, len(p) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(p[:cut])
    # flipped marker byte inside the header region
    bad = bytearray(p)
    bad[bad.index(b"\xff\xc4") + 1] = 0xC9  # DHT -> arithmetic SOF
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(bad))
    # the sniffer forwards the same discipline
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(p[: len(p) // 2])
