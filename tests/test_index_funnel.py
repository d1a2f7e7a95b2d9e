"""inverted_index (operators/text.py) and funnel_stages (operators/temporal.py)."""

from __future__ import annotations


def test_inverted_index_tail_and_head(spark):
    from arrow_udf_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [
            (1, "apple  banana"),
            (2, "apple cherry"),
            (3, "apple banana banana"),  # dup token in one doc counts once
        ],
        "doc_id long, text string",
    )
    out = {r["token"]: (r["df"], r["postings"]) for r in inverted_index(docs, stop_df=2).collect()}
    assert out["apple"] == (3, None)  # head: df kept, postings suppressed
    assert out["banana"] == (2, "1|3")  # sorted ids, deduped per doc
    assert out["cherry"] == (1, "2")


def test_inverted_index_empty_tokens_dropped(spark):
    from arrow_udf_spark.operators.text import inverted_index

    docs = spark.createDataFrame([(1, "  a   b  ")], "doc_id long, text string")
    toks = {r["token"] for r in inverted_index(docs).collect()}
    assert toks == {"a", "b"}


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, us long")


def test_funnel_requires_order(spark):
    from arrow_udf_spark.operators.temporal import funnel_stages

    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "signup", 10), (1, "view", 20), (1, "purchase", 30),
            # user 2: purchase BEFORE view → stops at view (stage 2)
            (2, "signup", 10), (2, "purchase", 15), (2, "view", 20),
            # user 3: never signed up → stage 0 even with later stages
            (3, "view", 5), (3, "purchase", 6),
            # user 4: signup only
            (4, "signup", 1),
        ],
    )
    out = {r["user_id"]: r["stage"] for r in funnel_stages(ev, ["signup", "view", "purchase"], ts_col="us").collect()}
    assert out == {1: 3, 2: 2, 3: 0, 4: 1}


def test_funnel_strictly_after(spark):
    from arrow_udf_spark.operators.temporal import funnel_stages

    # view at the SAME instant as signup does not count (strict >)
    ev = _events(spark, [(1, "signup", 10), (1, "view", 10)])
    out = {r["user_id"]: r["stage"] for r in funnel_stages(ev, ["signup", "view"], ts_col="us").collect()}
    assert out == {1: 1}


def test_funnel_uses_earliest_prev_completion(spark):
    from arrow_udf_spark.operators.temporal import funnel_stages

    # signup twice; view sits between them → counts (after the EARLIEST)
    ev = _events(spark, [(1, "signup", 10), (1, "view", 15), (1, "signup", 20)])
    out = {r["user_id"]: r["stage"] for r in funnel_stages(ev, ["signup", "view"], ts_col="us").collect()}
    assert out == {1: 2}


def test_bm25_rare_term_outranks_common(spark):
    from arrow_udf_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rare common common"),
            (2, "common common common"),
            (3, "common filler filler"),
            (4, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, terms=["rare", "common"], k=4).collect()
    # doc 1 contains the rare term -> highest score; doc 4 has no term
    assert out[0]["doc_id"] == 1
    ids = [r["doc_id"] for r in out]
    assert 4 not in ids
    assert all(a["score"] >= b["score"] for a, b in zip(out, out[1:]))


def test_bm25_length_normalization(spark):
    from arrow_udf_spark.operators.text import bm25_topk

    # same tf, shorter doc scores higher under b=0.75
    docs = spark.createDataFrame(
        [(1, "term x"), (2, "term x x x x x x x x x x x x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, terms=["term"], k=2).collect()}
    assert out[1] > out[2]


def test_retention_counts(spark):
    from arrow_udf_spark.queries import QUERIES
    import pyspark.sql.functions as F  # noqa: F401

    ev = spark.createDataFrame(
        [
            (1, "click", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-03 10:00:00"),
            (2, "click", "2024-01-01 23:00:00"),
            (2, "click", "2024-01-02 01:00:00"),
            (3, "click", "2024-01-02 09:00:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr("user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts")
    # run the same shape the query uses, inline
    e = ev.selectExpr("user_id", "CAST(ts AS DATE) AS d").distinct()
    f = e.groupBy("user_id").agg({"d": "min"}).withColumnRenamed("min(d)", "cohort")
    got = {
        (str(r["cohort"]), r["off"]): r["n"]
        for r in e.join(f, "user_id")
        .selectExpr("cohort", "datediff(d, cohort) AS off", "user_id")
        .groupBy("cohort", "off")
        .agg({"user_id": "count"})
        .withColumnRenamed("count(user_id)", "n")
        .collect()
    }
    assert got[("2024-01-01", 0)] == 2  # users 1 and 2 start Jan 1
    assert got[("2024-01-01", 1)] == 1  # user 2 returns next day
    assert got[("2024-01-01", 2)] == 1  # user 1 returns on day 2
    assert got[("2024-01-02", 0)] == 1  # user 3's own cohort


def test_keep_best_policy(spark):
    from arrow_udf_spark.operators.dedup import keep_best

    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.2)],
        "doc_id long, q double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    out = {r["doc_id"]: (r["cluster_id"], r["keeper_id"], r["keep"]) for r in keep_best(scored, clusters, "q").collect()}
    # highest q wins, tie (2 vs 3 at 0.9) broken by smaller id
    assert out[1] == (1, 2, 0)
    assert out[2] == (1, 2, 1)
    assert out[3] == (1, 2, 0)
    # singleton: own cluster, keeps itself
    assert out[4] == (4, 4, 1)


def test_rolling_daily_sum_exact(spark):
    from arrow_udf_spark.operators.temporal import rolling_daily_sum

    ev = spark.createDataFrame(
        [("2024-01-01 05:00:00", 1.25), ("2024-01-01 06:00:00", 2.5),
         ("2024-01-02 05:00:00", 10.0), ("2024-01-09 05:00:00", 100.0)],
        "ts_s string, value double",
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "value")
    out = {r["d"]: (r["day_micros"], r["rolling_micros"]) for r in rolling_daily_sum(ev).collect()}
    assert out["2024-01-01"] == (3_750_000, 3_750_000)
    assert out["2024-01-02"] == (10_000_000, 13_750_000)
    # RANGE frame over calendar days: Jan 9's trailing 7 days are
    # Jan 3..9 -> Jan 1-2 are OUT even though they are the previous rows
    assert out["2024-01-09"] == (100_000_000, 100_000_000)


def test_zscore_outliers_picks_extremes(spark):
    from arrow_udf_spark.operators.stats import zscore_outliers

    rows = [(i, "a", 10.0) for i in range(20)] + [(100, "a", 1000.0), (101, "a", -500.0)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = zscore_outliers(ev, top_k=2).collect()
    got = {r["event_id"]: r["z"] for r in out}
    assert set(got) == {100, 101}
    assert got[100] > 0 and got[101] < 0


def test_zscore_ties_break_by_id(spark):
    from arrow_udf_spark.operators.stats import zscore_outliers

    rows = [(1, "a", 0.0), (2, "a", 10.0), (3, "a", 0.0), (4, "a", 10.0)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = [r["event_id"] for r in zscore_outliers(ev, top_k=2).collect()]
    assert out == [1, 2]  # |z| all equal -> two smallest ids win


def test_zscore_constant_group_is_zero_not_nan(spark):
    from arrow_udf_spark.operators.stats import zscore_outliers

    ev = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0)],
        "event_id long, event_type string, value double",
    )
    out = {r["event_id"]: r["z"] for r in zscore_outliers(ev, top_k=3).collect()}
    assert out == {1: 0.0, 2: 0.0, 3: 0.0}


def test_lsh_bands_raises_on_dim_mismatch(spark):
    import pytest
    from pyspark.sql.utils import PythonException
    from py4j.protocol import Py4JJavaError
    from arrow_udf_spark.operators.similarity import lsh_bands

    df = spark.createDataFrame(
        [(1, [0.1] * 32)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="lsh_bands: vector length"):
        lsh_bands(df, dim=64).collect()
