"""hash_sample / pack_sequences (operators/sampling.py)."""

from arrow_udf_spark.operators.sampling import hash_sample, pack_sequences


def test_hash_sample_deterministic_and_salted(spark):
    df = spark.range(2000)
    a = {r.id for r in hash_sample(df, "id", 1000).collect()}
    b = {r.id for r in hash_sample(df, "id", 1000).collect()}
    assert a == b  # stable across runs
    # ~10% +- generous tolerance
    assert 100 < len(a) < 320
    c = {r.id for r in hash_sample(df, "id", 1000, salt="v2").collect()}
    assert c != a  # salt rotates the sample
    # monotone: a higher rate strictly contains a lower one (same salt)
    d = {r.id for r in hash_sample(df, "id", 3000).collect()}
    assert a <= d


def test_pack_sequences_budget(spark):
    rows = [("s", i, 60) for i in range(10)] + [("s", 100, 500), ("t", 0, 10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, toks long")
    out = pack_sequences(df, shard="source", order="doc_id", tokens="toks", budget=100)
    got = {(r.source, r.doc_id): r.seq_id for r in out.collect()}
    # 60+60=120 > 100, so docs pair up by cumulative total: ids 0,1 -> 0/1...
    assert got[("s", 0)] == 0 and got[("s", 1)] == 1  # cum 60,120
    assert got[("s", 2)] == 1 and got[("s", 3)] == 2  # cum 180,240
    # oversized doc occupies later sequences alone, never split
    assert got[("s", 100)] > got[("s", 9)]
    # shards pack independently
    assert got[("t", 0)] == 0


def test_dup_clusters_components(spark):
    from arrow_udf_spark.operators.dedup import dup_clusters

    # chain 1-2-3-4 (one component), pair 10-11, isolated-by-absence 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
