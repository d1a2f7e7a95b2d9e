"""Property tests for the round-7 operators, judged by PYTHON referees
(never by the engine under test): bloom pruning can never drop a true
match, KMV never misses below-k cardinalities, BPE pair counts and
per-frame PCM energy must equal a straightforward reference
implementation, and skew_profile's ppm must be exact integer math.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

keys_strategy = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=60
)


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@settings(max_examples=12, deadline=None)
@given(big=keys_strategy, small=keys_strategy)
def test_bloom_never_drops_a_match(spark, big, small):
    """For ANY key sets, every big-side row whose key exists on the small
    side survives bloom_prune (referee recomputes the bitmap + membership
    in pure Python)."""
    from arrow_udf_spark.operators.sketch import bloom_build, bloom_prune

    m, k = 64, 2  # tiny filter -> plenty of false positives exercised
    bdf = spark.createDataFrame([(x,) for x in big], "key: long")
    sdf = spark.createDataFrame([(x,) for x in small], "key: long")
    words = bloom_build(sdf, "key", m_bits=m, k_hashes=k)

    # referee bitmap
    bits = set()
    for x in set(small):
        for i in range(k):
            bits.add(_md5_32(f"{x}:{i}") % m)
    ref_words = [0] * (m // 64)
    for p in bits:
        ref_words[p // 64] |= 1 << (p % 64)
    ref_words = [w - (1 << 64) if w >= (1 << 63) else w for w in ref_words]
    assert words == ref_words

    survived = [
        r["key"]
        for r in bloom_prune(bdf, "key", words, m_bits=m, k_hashes=k).collect()
    ]
    small_set = set(small)
    # no false negatives
    for x in big:
        if x in small_set:
            assert x in survived
    # and the survivors are exactly the referee's predicted pass set
    ref_pass = [
        x
        for x in big
        if all(_md5_32(f"{x}:{i}") % m in bits for i in range(k))
    ]
    assert sorted(survived) == sorted(ref_pass)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=50
    )
)
def test_kmv_exact_below_k(spark, vals):
    """Cardinalities below every probed k must come back EXACT (the
    sketch holds all distinct hashes), for any input multiset."""
    from arrow_udf_spark.operators.sketch import kmv_error_gate

    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    rows = {
        r["k"]: (r["approx_distinct"], r["exact_distinct"])
        for r in kmv_error_gate(df, "v", ks=(64, 256)).collect()
    }
    true_distinct = len(set(vals))
    for k, (est, ex) in rows.items():
        assert ex == true_distinct
        assert est == true_distinct  # < k distinct -> exact by contract


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=25),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_pair_counts_vs_referee(spark, texts):
    from arrow_udf_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    got = [
        (r["rank"], r["pair"], r["cnt"])
        for r in bpe_pair_counts(df, top=5).collect()
    ]
    ref = Counter()
    for t in texts:
        for tok in t.strip().split():
            for i in range(len(tok) - 1):
                ref[tok[i : i + 2]] += 1
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [
        (i + 1, pair, cnt) for i, (pair, cnt) in enumerate(expected)
    ]


def test_wav_frame_energy_vs_referee(spark):
    """Frame energies must equal numpy recomputation from the synthesis
    formula for every doc id — the decode path adds nothing and loses
    nothing."""
    import numpy as np

    from arrow_udf_spark.operators.multimodal import wav_frame_energy

    ids = [0, 1, 7, 49, 796, 797]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    got = {
        (r["doc_id"], r["frame"]): (r["n_samples"], r["sumsq"])
        for r in wav_frame_energy(df, "doc_id", frame=256).collect()
    }
    for i in ids:
        n = 400 + i % 50 * 16
        tone = np.arange(n, dtype=np.int64) * (i % 797 + 1) % 2048 - 1024
        for f in range(0, n, 256):
            seg = tone[f : f + 256]
            assert got[(i, f // 256)] == (len(seg), int(np.sum(seg * seg)))


def test_skew_profile_ppm_integer_exact(spark):
    from arrow_udf_spark.operators.sketch import skew_profile

    df = spark.createDataFrame(
        [("x",)] * 7 + [("y",)] * 2, "k: string"
    )
    rows = {r["key"]: r["ppm"] for r in skew_profile(df, "k").collect()}
    assert rows == {"x": 7 * 1_000_000 // 9, "y": 2 * 1_000_000 // 9}
