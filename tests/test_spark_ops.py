"""End-to-end operator tests on a live local SparkSession."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from arrow_udf_spark.functions import corpus as C


def test_scalar_gcd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = (
        li.select(C.gcd_i64("l_partkey", "l_suppkey").alias("g"))
        .agg(F.sum("g"))
        .collect()[0]
    )
    assert row[0] > 0


def test_fallible_sql_and_column_api_agree(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(500)
    v, e = C.div.value_and_error(F.col("l_partkey"), F.col("l_suppkey") % 7)
    col_rows = li.select(v, e).collect()
    n_err = sum(1 for r in col_rows if r[1] is not None)
    assert n_err > 0
    assert all(r[1] == "division by zero" for r in col_rows if r[1] is not None)
    assert all(r[0] is None for r in col_rows if r[1] is not None)


def test_udtf_row_index_and_chunking(spark):
    df = spark.createDataFrame([(5,), (0,), (3,)], "n int").repartition(1)
    out = C.series.apply(df, cols=["n"]).collect()
    # row index is partition-local 0-based; n=0 yields nothing
    by_row = {}
    for r in out:
        by_row.setdefault(r["row"], []).append(r["series"])
    assert sorted(len(v) for v in by_row.values()) in ([3, 5], [3, 5])
    assert set(by_row) <= {0, 1, 2}


def test_udtf_chunk_boundary(spark):
    # one input row fanning out past the 1024-row chunk size
    df = spark.createDataFrame([(3000,)], "n int").repartition(1)
    out = C.series.apply(df, cols=["n"])
    assert out.count() == 3000


def test_udaf_merge_across_partitions(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("q", F.col("l_quantity").cast("long"))
        .repartition(7)  # force multiple partial states per key
    )
    ours = {
        r["l_returnflag"]: r["sum_udaf"]
        for r in C.SumAgg.agg(li, by=["l_returnflag"], args=["q"]).collect()
    }
    expect = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag").agg(F.sum("q").alias("s")).collect()
    }
    assert ours == expect


def test_udaf_retract(spark):
    pdf = pd.DataFrame({"k": ["a"] * 4, "x": [10, 20, 30, 40], "ops": [False, False, True, False]})
    df = spark.createDataFrame(pdf)
    out = C.SumAgg.accumulate_or_retract(df, by=["k"], args=["x"], ops_col="ops").collect()
    assert out[0]["sum_udaf"] == 10 + 20 - 30 + 40


def test_udaf_global(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "q", F.col("l_quantity").cast("long")
    )
    got = C.SumAgg.agg_all(li, args=["q"]).collect()
    expect = li.agg(F.sum("q")).collect()[0][0]
    assert got[0]["sum_udaf"] == expect


def test_sql_registration(spark, sf_dir):
    from arrow_udf_spark import GLOBAL

    GLOBAL.register_sql(spark)
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("t_part")
    rows = spark.sql(
        "SELECT length(p_name) AS l, to_string(CAST(p_partkey AS BIGINT)) AS s "
        "FROM t_part LIMIT 3"
    ).collect()
    assert all(isinstance(r["l"], int) and isinstance(r["s"], str) for r in rows)


def test_decimal_exactness(spark):
    df = spark.createDataFrame(
        [("0.1", "0.2"), ("99999999999999999999999999999999999999.5", "0.5")],
        "a string, b string",
    )
    out = [r[0] for r in df.select(C.decimal_add(F.col("a"), F.col("b"))).collect()]
    assert out[0] == "0.3"  # no float drift
    assert out[1] == "100000000000000000000000000000000000000.0"  # >38 digits


def test_async_generator_udtf(spark):
    """Async-generator table fns (reference javascript.rs:1483) drain on an
    event loop per row and behave exactly like sync generators."""
    import asyncio

    from arrow_udf_spark.operators.table import udtf
    from arrow_udf_spark.plans.registry import Registry

    @udtf(input_types=["int"], result_type="int", name="aseries", registry=Registry())
    async def aseries(n):
        for i in range(n or 0):
            await asyncio.sleep(0)
            yield i

    df = spark.createDataFrame([(3, "x"), (0, "y"), (2, "z")], "n int, tag string")
    out = aseries.apply(df, cols=["n"], passthrough=["tag"])
    got = sorted((r.tag, r.aseries) for r in out.collect())
    assert got == [("x", 0), ("x", 1), ("x", 2), ("z", 0), ("z", 1)]


def test_lsh_topk_self_hit_and_subset_of_bruteforce(spark, sf_dir):
    """LSH ANN invariants: (1) every query's top hit is itself at score
    1.0 (identical vectors share every band); (2) each result row's score
    also appears in the exact brute-force scoring for that query (LSH can
    drop candidates, never invent them); (3) per-query result count <= k."""
    from arrow_udf_spark.operators.similarity import brute_force_topk, lsh_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 3)
    got = lsh_topk(e, q, k=4).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, []).append(r)
    assert set(per_q) == {0, 1, 2}
    for qid, rows in per_q.items():
        assert len(rows) <= 4
        best = max(rows, key=lambda r: (r.score, -r.n_id))
        assert best.n_id == qid and best.score == 1.0
    exact = {
        (r.q_id, r.n_id): r.score
        for r in brute_force_topk(e, q, k=10**6).collect()
    }
    for r in got:
        assert exact[(r.q_id, r.n_id)] == r.score


def test_lsh_bands_deterministic_and_short(spark, sf_dir):
    """Band rows are (id, band, bkey) with bands*|vecs| rows, stable
    across runs (md5-derived planes, no RNG)."""
    from arrow_udf_spark.operators.similarity import lsh_bands

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    a = sorted(map(tuple, lsh_bands(e).collect()))
    b = sorted(map(tuple, lsh_bands(e).collect()))
    assert a == b
    assert len(a) == 50 * 4
    assert all(0 <= r[2] < 16 for r in a)


def test_simhash_pairs_max_bucket_truncation(spark, sf_dir):
    """The oversized-bucket guard (r10 opt round: bucket counts + a
    broadcast flag table instead of an unconditional row_number window)
    must reproduce the window truncation EXACTLY: per (chunk, cval)
    bucket keep only the first max_bucket members by (md5(id), id)
    order, then pair inside the kept set."""
    import hashlib

    from arrow_udf_spark.operators.dedup import (
        simhash_hamming_pairs,
        with_simhash,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id < 120")
    sh = {
        r["id"]: r["sh"]
        for r in with_simhash(d, "text", out="sh")
        .select(F.col("doc_id").alias("id"), "sh")
        .collect()
    }
    max_bucket, bits, n_chunks, max_dist = 3, 16, 4, 3
    cb = bits // n_chunks
    kept, truncated = {}, 0
    for c in range(n_chunks):
        buckets: dict = {}
        for i, s in sh.items():
            buckets.setdefault((c, (s >> (c * cb)) & ((1 << cb) - 1)), []).append(i)
        for key, ids in buckets.items():
            if len(ids) > max_bucket:
                truncated += 1
            ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            kept[key] = ids[:max_bucket]
    assert truncated > 0, "fixture never exercises the truncation path"
    want = set()
    for ids in kept.values():
        for a in ids:
            for b in ids:
                if a < b and bin(sh[a] ^ sh[b]).count("1") <= max_dist:
                    want.add((a, b, bin(sh[a] ^ sh[b]).count("1")))
    got = {
        (r.a, r.b, r.dist)
        for r in simhash_hamming_pairs(d, max_bucket=max_bucket).collect()
    }
    assert got == want


def test_lsh_topk_max_bucket_caps_candidates(spark, sf_dir):
    """max_bucket truncates hot buckets deterministically: results stay a
    subset of the uncapped run's candidate space, per-query counts can
    only shrink, and two capped runs agree exactly."""
    from arrow_udf_spark.operators.similarity import lsh_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 3)
    full = {(r.q_id, r.n_id) for r in lsh_topk(e, q, k=10**6).collect()}
    capped1 = sorted(map(tuple, lsh_topk(e, q, k=50, max_bucket=3).collect()))
    capped2 = sorted(map(tuple, lsh_topk(e, q, k=50, max_bucket=3).collect()))
    assert capped1 == capped2
    assert {(r[0], r[1]) for r in capped1} <= full
    per_q = {}
    for r in capped1:
        per_q[r[0]] = per_q.get(r[0], 0) + 1
    # 4 bands x <=3 items/bucket -> at most 12 candidates per query
    assert all(n <= 12 for n in per_q.values())
