"""ANN quality gate (VERDICT r5 ask #5): the LSH top-k must actually
retrieve most of the exact answer — deterministic given the md5-derived
planes, so a fixed floor is a stable regression gate, not a flaky one."""


def test_lsh_recall_at_5_meets_floor(spark, sf_dir):
    from arrow_udf_spark.queries import QUERIES

    rows = QUERIES["lsh_recall_at_k"](spark, sf_dir).collect()
    assert rows, "recall query returned no rows"
    hits = sum(r["hits"] for r in rows)
    k = sum(r["k"] for r in rows)
    assert k == 25  # 5 queries x top-5
    recall = hits / k
    # measured: 0.56 at sf0.001, 0.64 at sf0.01 — both deterministic
    assert recall >= 0.5, f"recall@5 = {recall:.2f} fell below the floor"


def test_multiprobe_ivf_beats_single_probe(spark, sf_dir):
    """The point of multi-probe: searching the 2 nearest cells must never
    lose to single-probe and must clear a higher floor (measured 0.92 ->
    0.96 at both test scales; everything is deterministic — md5-free
    exact k-means trajectory, fixed tie-breaks)."""
    from arrow_udf_spark.queries import QUERIES

    exact = {
        (r.q_id, r.n_id)
        for r in QUERIES["cosine_topk_bruteforce"](spark, sf_dir).collect()
    }
    single = {
        (r.q_id, r.n_id)
        for r in QUERIES["ivf_trained_topk"](spark, sf_dir).collect()
    }
    multi = {
        (r.q_id, r.n_id)
        for r in QUERIES["ivf_multiprobe_topk"](spark, sf_dir).collect()
    }
    r1 = len(exact & single) / len(exact)
    r2 = len(exact & multi) / len(exact)
    assert r2 >= r1, f"multi-probe recall {r2:.2f} < single-probe {r1:.2f}"
    assert r2 >= 0.9, f"multi-probe recall@5 = {r2:.2f} below floor"


def test_minhash_estimator_error_bounded(spark, sf_dir):
    """k=8 minhash estimates unigram Jaccard with sd ~ sqrt(J(1-J)/8)
    <= 0.18; the mean absolute error over adjacent-pair comparisons must
    stay well inside that (measured 0.13 / 0.12 at the two test scales,
    deterministic md5 permutation family)."""
    from arrow_udf_spark.queries import QUERIES

    rows = QUERIES["minhash_jaccard_est"](spark, sf_dir).collect()
    assert rows
    mae = sum(abs(r["est_jac"] - r["jac"]) for r in rows) / len(rows)
    assert mae <= 0.2, f"minhash k=8 MAE {mae:.3f} exceeds bound"


def test_quantized_dot_recall_floor(spark):
    """int8 quantization must keep top-5-by-dot recall high on the gate
    corpus (it measures pure rounding loss — observed 5/5 everywhere;
    floor at >= 4/5 to leave room for data drift, not for regressions)."""
    from arrow_udf_spark.queries import QUERIES

    rows = QUERIES["quantized_dot_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_overlap"] >= 4, rows


def test_rrf_fuse_semantics(spark):
    """r8: reciprocal-rank fusion — ids in both lists outrank
    single-list ids of comparable rank; absent-list terms contribute 0;
    ties break on id."""
    from arrow_udf_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["id", "rank"])
    b = spark.createDataFrame([(2, 1), (4, 2), (1, 3)], ["id", "rank"])
    rows = {r.id: (r.rank, r.rrf) for r in rrf_fuse([a, b], k=4).collect()}
    # id 2: 1/62 + 1/61;  id 1: 1/61 + 1/63;  id 3: 1/63;  id 4: 1/62
    assert rows[2][0] == 1 and rows[1][0] == 2
    assert rows[4][0] == 3 and rows[3][0] == 4  # 1/62 > 1/63
    assert abs(rows[2][1] - round(1 / 62 + 1 / 61, 6)) < 2e-6
    # tie case: same single rank in each list -> id ascending wins
    c = spark.createDataFrame([(7, 5)], ["id", "rank"])
    d = spark.createDataFrame([(5, 5)], ["id", "rank"])
    tied = [r.id for r in rrf_fuse([c, d], k=2).collect()]
    assert tied == [5, 7]


def test_matryoshka_recall_floor_and_diagnostic(spark):
    """Prefix-16-of-64 truncation on the SYNTHETIC embeddings keeps only
    1-2 of the top-5 — genuinely diagnostic: the fixture's vectors have
    no matryoshka training, so the prefix carries ~1/4 of the signal
    and the gate SHOWS that (unlike int8, whose rounding loses almost
    nothing).  Floor at >= 1 (some prefix signal must survive), ceiling
    asserted < 5 so the test fails if the fixture ever changes to make
    truncation free — either way the number means something."""
    from arrow_udf_spark.queries import QUERIES

    rows = QUERIES["matryoshka_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    assert all(r["n_overlap"] >= 1 for r in rows), rows
    assert any(r["n_overlap"] < 5 for r in rows), rows


def test_ivf_pq_topk_cell_restriction_and_shape(spark, sf_dir):
    # IVFPQ never crosses the coarse-cell boundary: every returned
    # neighbor shares the query's label, and each query gets exactly k
    # (cells are larger than k in the fixture)
    from arrow_udf_spark.operators.similarity import ivf_pq_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = ivf_pq_topk(e, e.where("vec_id < 5"), k=5).collect()
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    per_q = {}
    for r in res:
        assert labels[r.n_id] == labels[r.q_id]
        per_q.setdefault(r.q_id, []).append(r.n_id)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in per_q.values())
