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
