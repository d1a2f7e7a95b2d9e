"""ITU-T G.711 mu-law / A-law codecs (operators/multimodal.py):
exhaustive-domain properties and the Spark pipeline gate shape."""

from __future__ import annotations

import numpy as np

from arrow_udf_spark.operators.multimodal import (
    alaw_decode,
    alaw_encode,
    g711_pipeline,
    ulaw_decode,
    ulaw_encode,
)


def test_exhaustive_domain_properties():
    # every representable int16 sample, both laws
    x = np.arange(-32768, 32768, dtype=np.int16)
    xe = x.astype(np.int64)
    u = ulaw_decode(ulaw_encode(x)).astype(np.int64)
    a = alaw_decode(alaw_encode(x)).astype(np.int64)
    # spec error bounds: half the top-segment step, plus the clip region
    assert np.abs(u - xe).max() <= 644  # 643 = |32767 - decoded clip|
    assert np.abs(a - xe).max() <= 512
    # companding must be monotone (order-preserving quantization)
    assert np.all(np.diff(u) >= 0)
    assert np.all(np.diff(a) >= 0)
    # decode∘encode is a projection: re-coding a decoded value is stable
    assert (ulaw_decode(ulaw_encode(u.astype(np.int16))) == u).all()
    assert (alaw_decode(alaw_encode(a.astype(np.int16))) == a).all()


def test_known_code_points():
    # mu-law: PCM 0 encodes to 0xFF (all-ones complement), decodes to 0
    assert ulaw_encode(np.array([0], dtype=np.int16)) == b"\xff"
    assert ulaw_decode(b"\xff")[0] == 0
    # A-law: PCM 0 -> sign=1 seg=0 mant=0 -> 0x80 ^ 0x55 = 0xD5, the
    # famous A-law silence byte; decodes to +8 (chord midpoint)
    assert alaw_encode(np.array([0], dtype=np.int16)) == b"\xd5"
    assert alaw_decode(b"\xd5")[0] == 8


def test_pipeline_spark(spark):
    import hashlib

    df = spark.createDataFrame([(1, "alpha"), (2, "")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in g711_pipeline(df).collect()}
    for did, text in [(1, "alpha"), (2, "")]:
        hx = hashlib.md5(text.encode()).hexdigest()
        s = int(hx[25:27], 16)
        n = int(hx[27:29], 16) % 64 + 32
        i = np.arange(n, dtype=np.int64)
        pcm = ((s * 4093 + i * 3797) % 65536 - 32768).astype(np.int16)
        r = rows[did]
        assert r.n_samples == n
        assert r.ulaw_sum == int(
            ulaw_decode(ulaw_encode(pcm)).astype(np.int64).sum()
        )
        assert r.alaw_sum == int(
            alaw_decode(alaw_encode(pcm)).astype(np.int64).sum()
        )
