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


def test_simhash_pairs_first_chunk_path_unique_and_complete(spark, sf_dir):
    """The no-flagged-bucket fast path emits each pair at its FIRST
    agreeing chunk with no distinct() — so (a) every qualifying pair must
    appear EXACTLY once (a dist-0 pair agrees on all 4 chunks and would
    quadruple without the predicate), and (b) the set must equal the
    brute-force all-pairs answer.  Also pins that the fast path is the
    one taken: no Window/row_number appears in the plan when nothing is
    flagged."""
    from pyspark.sql import functions as F

    from arrow_udf_spark.operators.dedup import (
        simhash_hamming_pairs,
        with_simhash,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id < 200")
    pairs = simhash_hamming_pairs(d)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "row_number" not in plan, plan[:2000]

    got = [(r.a, r.b, r.dist) for r in pairs.collect()]
    assert len(got) == len(set(got)), "fast path emitted a pair twice"

    sh = {
        r["doc_id"]: r["sh"]
        for r in with_simhash(d, "text", out="sh").collect()
    }
    ids = sorted(sh)
    want = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    assert set(got) == want
    # dist-0 (identical simhash) pairs must exist or the uniqueness claim
    # never bites — sf fixtures carry exact duplicate documents
    assert any(dd == 0 for (_, _, dd) in got)
