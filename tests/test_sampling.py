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


def test_temperature_mix_invariants(spark):
    """r8: alpha=0.5 source rebalancing — the rarest source keeps
    everything, larger sources downsample toward sqrt-proportional
    volumes, and the survivor set is a deterministic function of ids."""
    from arrow_udf_spark.operators.sampling import temperature_mix

    rows = (
        [(i, "big") for i in range(400)]
        + [(i + 1000, "mid") for i in range(100)]
        + [(i + 2000, "tiny") for i in range(25)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    sel = temperature_mix(df).groupBy("source").count().collect()
    got = {r.source: r["count"] for r in sel}
    # tiny: q = 1 -> all 25 survive, exactly
    assert got["tiny"] == 25
    # big: q = sqrt(25/400) = 0.25 -> ~100 expected; binomial 3-sigma
    assert 60 <= got["big"] <= 145, got
    # mid: q = sqrt(25/100) = 0.5 -> ~50 expected
    assert 30 <= got["mid"] <= 72, got
    # determinism: a second run selects the identical set
    a = sorted(
        r.doc_id for r in temperature_mix(df).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id for r in temperature_mix(df).select("doc_id").collect()
    )
    assert a == b


def test_temperature_mix_alpha_one_noop(spark):
    from arrow_udf_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "source"]
    )
    # alpha=1 -> q=1 for every source -> identity
    assert temperature_mix(df, alpha=1.0).count() == 3


def test_semdedup_keep_rule(spark):
    """r8: SemDeDup one-pass keep rule — an item is dropped iff some
    smaller-id item in the SAME cell is within the cosine threshold."""
    from arrow_udf_spark.operators.dedup import semdedup_keep

    rows = [
        # cell 0: 1 and 2 identical (2 drops), 3 orthogonal (kept)
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 0),
        # cell 1: identical to id 1 but different cell -> kept (cell-confined)
        (4, [1.0, 0.0], 1),
        # chain at angles 0/25/50 deg: 5~6 and 6~7 are cos(25°)≈0.906
        # (>= 0.9), 5~7 is cos(50°)≈0.643 (< 0.9) -> the one-pass rule
        # drops BOTH 6 and 7 (7 via the already-dropped 6 — over-prune,
        # the documented variant semantics)
        (5, [1.0, 0.0], 2),
        (6, [0.906308, 0.422618], 2),
        (7, [0.642788, 0.766044], 2),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "cell"])
    got = {
        r.id: r.kept
        for r in semdedup_keep(
            df, "vec_id", "embedding", "cell", threshold=0.9
        ).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1, 4: 1, 5: 1, 6: 0, 7: 0}


def test_dsir_logweights_discriminates(spark):
    """r8: DSIR importance weights — docs whose bigrams match the target
    corpus score higher than off-target docs; short docs (<2 tokens)
    drop out; re-runs are bit-identical."""
    from arrow_udf_spark.operators.sampling import dsir_logweights

    rows = [
        (1, "the quick brown fox jumps high"),
        (2, "the quick brown fox runs fast"),
        (3, "uno dos tres cuatro cinco seis"),
        (4, "single"),  # no bigrams -> excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    target = spark.createDataFrame(
        [(10, "the quick brown fox sleeps")], ["doc_id", "text"]
    )
    got = {
        r.id: (r.n_bigrams, r.logw)
        for r in dsir_logweights(df, target, buckets=16).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 5 and got[3][0] == 5
    # on-target docs outscore the off-target one
    assert got[1][1] > got[3][1] and got[2][1] > got[3][1]
    # deterministic across runs
    again = {
        r.id: (r.n_bigrams, r.logw)
        for r in dsir_logweights(df, target, buckets=16).collect()
    }
    assert got == again


def test_semdedup_numpy_matches_catalyst(spark):
    """r8: the numpy per-cell matmul path and the Catalyst fold path
    produce IDENTICAL verdicts (same 6-dp decision value) — including on
    near-threshold chains."""
    from arrow_udf_spark.operators.dedup import (
        semdedup_keep,
        semdedup_keep_numpy,
    )

    import hashlib

    rows = []
    for i in range(120):
        h = hashlib.md5(f"v{i}".encode()).digest()
        vec = [((h[j] + i * j) % 256) / 255.0 + 0.01 for j in range(8)]
        rows.append((i, vec, i % 4))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "cell"])
    for th in (0.9, 0.99, 0.999):
        a = {
            r.id: r.kept
            for r in semdedup_keep(
                df, "vec_id", "embedding", "cell", threshold=th
            ).collect()
        }
        b = {
            r.id: r.kept
            for r in semdedup_keep_numpy(
                df, "vec_id", "embedding", "cell", threshold=th
            ).collect()
        }
        assert a == b, th
        assert 0 < sum(a.values()) <= 120


def test_lang_id_confusion_floors(spark):
    """r8: the lang_id eval matrix — en recall >= 0.85 on the fixture,
    and non-en labels only ever map to {en, und} (the text column is one
    English-ish vocabulary regardless of label, so any other prediction
    would be a scorer bug)."""
    import __spark_entry__ as E

    rows = E.queries()["lang_id_confusion"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    m = {(r.lang_true, r.lang_pred): r.n for r in rows}
    en_total = sum(n for (t, _), n in m.items() if t == "en")
    en_hit = m.get(("en", "en"), 0)
    assert en_hit / en_total >= 0.85
    assert {p for (t, p) in m if t != "en"} <= {"en", "und"}
