"""k-means Lloyd trainer (operators/clustering.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _toy(spark):
    # two tight blobs around (0,0) and (10,10) → any sane k-means with
    # k=2 must split them exactly
    rows = [
        (0, [0.0, 0.1]),
        (1, [0.1, 0.0]),
        (2, [0.2, 0.2]),
        (3, [10.0, 10.1]),
        (4, [10.1, 9.9]),
        (5, [9.9, 10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    from arrow_udf_spark.operators.clustering import kmeans_assign

    out = {r["vec_id"]: r["cluster"] for r in kmeans_assign(_toy(spark), k=2, iters=2).collect()}
    assert len(set(out.values())) == 2
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]


def test_kmeans_deterministic_and_converged(spark):
    from arrow_udf_spark.operators.clustering import kmeans_assign

    df = _toy(spark)
    a = sorted(kmeans_assign(df, k=2, iters=1).collect())
    b = sorted(kmeans_assign(df, k=2, iters=3).collect())
    # blobs this tight converge after one recompute; more rounds are a no-op
    assert a == b
    assert a == sorted(kmeans_assign(df, k=2, iters=3).collect())


def test_kmeans_single_cluster_survives_empty_cells(spark):
    from arrow_udf_spark.operators.clustering import kmeans_assign

    # identical vectors: every point lands on centroid 0 after round 1, so
    # clusters 1..3 empty out — the trainer must drop them, not crash
    rows = [(i, [1.0, 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=4, iters=2).collect()
    assert {r["cluster"] for r in out} == {0}


def test_centroid_stats(spark):
    from arrow_udf_spark.operators.clustering import (
        kmeans_assign,
        kmeans_centroid_stats,
    )

    stats = {
        r["cluster"]: r["n_members"]
        for r in kmeans_centroid_stats(kmeans_assign(_toy(spark), k=2, iters=2)).collect()
    }
    assert sorted(stats.values()) == [3, 3]


def test_assignment_is_nearest_centroid(spark, sf_dir):
    """With iters=0 the returned assignment is against the seed centroids
    (the k lowest-id vectors) — verify nearest-seed independently."""
    from arrow_udf_spark.operators.clustering import kmeans_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned = kmeans_assign(emb, k=4, iters=0)
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    joined = assigned.join(v, "vec_id").collect()
    seeds = [
        list(r["e"])
        for r in v.orderBy("vec_id").limit(4).collect()
    ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for r in joined:
        own = d2(r["e"], seeds[r["cluster"]])
        best = min(d2(r["e"], s) for s in seeds)
        assert own <= best + 1e-9


def test_kmeans_cache_flag_same_result(spark):
    from arrow_udf_spark.operators.clustering import kmeans_assign

    df = _toy(spark)
    a = sorted(kmeans_assign(df, k=2, iters=2).collect())
    b = sorted(kmeans_assign(df, k=2, iters=2, cache=True).collect())
    assert a == b
