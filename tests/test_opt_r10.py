"""Focused regression tests for the round-10 optimization-session
rewrites (OPTIMIZATION_r10.md) — each pins that a plan-shape change kept
the operator's OUTPUT identical to the pre-change form."""

import pytest


def test_embedding_near_dup_salt_invariant(spark):
    """The salted pair join (guide §2.5: spread each bucket's quadratic
    pair space over S partitions) must emit exactly the same pair SET —
    each pair exactly once — as the unsalted join, for several S
    including S > distinct buckets and S > |cell|."""
    import hashlib

    from arrow_udf_spark.operators.dedup import embedding_near_dup

    rows = []
    for i in range(90):
        h = hashlib.md5(f"s{i}".encode()).digest()
        vec = [((h[j] + i) % 256) / 255.0 + 0.01 for j in range(8)]
        rows.append((i, vec, i % 3))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "cell"])

    base = sorted(
        (r.a, r.b, r.sim)
        for r in embedding_near_dup(
            df, "vec_id", "embedding", "cell", threshold=0.9, salt=1
        ).collect()
    )
    assert base, "fixture must produce pairs for the test to bite"
    assert len(base) == len({(a, b) for a, b, _ in base})
    for s in (2, 5, 16, 128):
        got = sorted(
            (r.a, r.b, r.sim)
            for r in embedding_near_dup(
                df, "vec_id", "embedding", "cell", threshold=0.9, salt=s
            ).collect()
        )
        assert got == base, f"salt={s} changed the pair set"
