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


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=25,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=1, max_size=25,
    ),
)
def test_asof_forward_vs_referee(spark, lefts, rights):
    """asof_join_forward must pick, per left row, the right row with the
    SMALLEST on >= left.on for the same key (inclusive), judged by a
    Python referee over hypothesis data.  Right side deduplicated per
    (key, on) keeping max v (the operator's uniqueness precondition)."""
    from arrow_udf_spark.operators.temporal import asof_join_forward

    rd = {}
    for k, on, v in rights:
        rd[(k, on)] = max(rd.get((k, on), -1), v)
    rrows = [(k, on, v) for (k, on), v in sorted(rd.items())]
    ldf = spark.createDataFrame(
        [(i, k, on) for i, (k, on) in enumerate(lefts)],
        "lid: long, k: long, t: long",
    )
    rdf = spark.createDataFrame(rrows, "k: long, t: long, v: long")
    got = {
        r["lid"]: r["v"]
        for r in asof_join_forward(
            ldf, rdf, on="t", by="k", right_cols=["v"]
        ).collect()
    }
    for i, (k, on) in enumerate(lefts):
        cand = [(ron, v) for (rk, ron), v in rd.items() if rk == k and ron >= on]
        exp = min(cand)[1] if cand else None
        assert got[i] == exp, (i, k, on, got[i], exp)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1, max_size=40,
    )
)
def test_rollup_cascade_equals_direct(spark, rows):
    """Every coarse level of time_bucket_rollup (computed from the finer
    level's partials) must equal a direct aggregation of the raw rows —
    the decomposability property, checked by a Python referee over
    hypothesis timestamps."""
    import datetime
    from collections import defaultdict

    from arrow_udf_spark.operators.temporal import time_bucket_rollup

    base = datetime.datetime(2024, 1, 1)
    data = [
        (base + datetime.timedelta(hours=h * 7, minutes=h), float(v) / 100)
        for h, v in rows
    ]
    df = spark.createDataFrame(data, "ts: timestamp, value: double")
    got = {
        (r["level"], r["bucket"]): (r["n_events"], r["total_cents"])
        for r in time_bucket_rollup(df).collect()
    }
    import math

    def trunc(ts, level):
        if level == "hour":
            return ts.replace(minute=0, second=0, microsecond=0)
        if level == "day":
            return ts.replace(hour=0, minute=0, second=0, microsecond=0)
        return ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)

    for level in ("hour", "day", "month"):
        ref = defaultdict(lambda: [0, 0])
        for ts, v in data:
            b = trunc(ts, level).strftime("%Y-%m-%d %H:%M:%S")
            ref[b][0] += 1
            ref[b][1] += math.floor(v * 100)
        assert {
            k: tuple(v) for k, v in ref.items()
        } == {b: got[(level, b)] for (lv, b) in got if lv == level}, level


def test_dedup_ensemble_subset_of_both(spark):
    """The ensemble is exactly the intersection: every flagged pair is in
    BOTH input pair streams, and every pair in both streams is flagged."""
    from arrow_udf_spark.operators.dedup import (
        lsh_candidate_pairs,
        simhash_hamming_pairs,
    )
    from arrow_udf_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .where("doc_id < 100")
    )
    lp = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(
            d, "doc_id", "text", k=4, band_size=2, max_bucket=100_000
        ).collect()
    }
    sp = {
        (r["a"], r["b"]): r["dist"]
        for r in simhash_hamming_pairs(d).collect()
    }
    ens = {
        (r["a"], r["b"]): r["dist"]
        for r in QUERIES["dedup_ensemble"](spark, sf).collect()
    }
    assert set(ens) == lp & set(sp)
    for pair, dist in ens.items():
        assert sp[pair] == dist
