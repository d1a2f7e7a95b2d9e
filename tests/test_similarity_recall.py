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
