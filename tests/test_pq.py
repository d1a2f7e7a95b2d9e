"""Product-quantization ADC gate (operators/similarity.py pq_recall).

The numpy replay test pins the full pipeline (subspace slicing, argmin
encoding with low-id tie-breaks, per-query LUT, fixed-order ADC sum,
top-k with id tie-breaks) against an independent implementation — it is
the regression net for the transform-lambda index trap (a two-arg
lambda makes Spark pass the array index as the second argument,
silently corrupting the bound subspace offset)."""

from __future__ import annotations

import numpy as np
import pytest

from arrow_udf_spark.operators.similarity import pq_recall


def _overlap_numpy(vecs, q_ids, m, ksub, k):
    """Independent PQ-ADC replay: codebook_j = subvectors of the first
    ksub ids (iters=0 seeds), codes by argmin L2 (ties to lower cid),
    ADC = fixed-j-order LUT sum, rankings with id tie-breaks."""
    n, dim = vecs.shape
    sub = dim // m
    out = {}
    books = [vecs[:ksub, j * sub : (j + 1) * sub] for j in range(m)]
    codes = np.zeros((n, m), dtype=int)
    for j in range(m):
        sv = vecs[:, j * sub : (j + 1) * sub]
        d = ((sv[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)  # argmin takes the FIRST minimum
    for q in q_ids:
        qv = vecs[q]
        adc = np.zeros(n)
        for j in range(m):
            lut = books[j] @ qv[j * sub : (j + 1) * sub]
            adc += lut[codes[:, j]]
        adc = np.round(adc, 6)
        exact = vecs @ qv
        top_a = sorted(range(n), key=lambda i: (-adc[i], i))[:k]
        top_e = sorted(range(n), key=lambda i: (-exact[i], i))[:k]
        out[q] = len(set(top_a) & set(top_e))
    return out


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_pq_exact_when_codebook_is_corpus(spark):
    # 8 items, ksub=8, iters=0: every codebook entry IS an item subvector,
    # so codes reconstruct vectors exactly and ADC == exact dot -> full
    # overlap for every query
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(8, 8))
    from pyspark.sql import functions as F

    df = _df(spark, vecs)
    out = pq_recall(
        df, df.where(F.col("vec_id") < 3), m=2, ksub=8, k=3, iters=0, dim=8
    ).collect()
    assert len(out) == 3
    assert all(r.n_overlap == 3 for r in out)


def test_pq_matches_numpy_replay(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 8))
    from pyspark.sql import functions as F

    df = _df(spark, vecs)
    got = {
        r.q_id: r.n_overlap
        for r in pq_recall(
            df, df.where(F.col("vec_id") < 4), m=2, ksub=4, k=3, iters=0, dim=8
        ).collect()
    }
    want = _overlap_numpy(vecs, [0, 1, 2, 3], m=2, ksub=4, k=3)
    assert got == want


def test_pq_dim_must_divide(spark):
    df = _df(spark, np.zeros((4, 8)))
    with pytest.raises(AssertionError, match="divide"):
        pq_recall(df, df, m=3, dim=8)
