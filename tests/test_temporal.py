"""Temporal operators: asof_join, sessionize, range_join (operators/temporal.py)."""

import pyspark.sql.functions as F
import pytest

from arrow_udf_spark.operators.temporal import asof_join, range_join, sessionize


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3), ("B", 100, 4), ("C", 7, 5)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0),
         ("B", 50, 200.0)],
        "sym string, t long, px double",
    )
    return trades, quotes


def test_asof_join_latest_at_or_before(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="t", by="sym", right_cols=["px"])
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {
        1: 101.0,  # equal timestamp is inclusive
        2: 102.0,  # latest of several earlier quotes
        3: None,   # no quote yet
        4: 200.0,
        5: None,   # key with no quotes at all
    }


def test_asof_join_single_shuffle(spark, trades_quotes):
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, on="t", by="sym")._jdf.queryExecution(
    ).executedPlan().toString()
    # one hash exchange for the window; no join operator at all
    assert "Join" not in plan


def test_sessionize_gap(spark):
    ev = spark.createDataFrame(
        [(1, 0), (1, 10), (1, 200), (1, 205), (2, 0)],
        "uid long, t long",
    )
    out = sessionize(ev, key="uid", ts="t", gap=50)
    got = {(r.uid, r.t): r.session_id for r in out.collect()}
    assert got == {(1, 0): 0, (1, 10): 0, (1, 200): 1, (1, 205): 1, (2, 0): 0}


def test_range_join_matches_theta(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(3), rng.randrange(1000), i) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, t long, rid long")
    lhs = df.select("k", F.col("t").alias("lt"), F.col("rid").alias("lid"))
    rhs = df.select("k", F.col("t").alias("rt"), F.col("rid").alias("rid"))

    got = range_join(
        lhs, rhs, key="k", left_ts="lt", right_ts="rt", lower=1, upper=75,
        bin_width=32,
    )
    pairs = {(r.lid, r.rid) for r in got.collect()}

    naive = {
        (a[2], b[2])
        for a in rows
        for b in rows
        if a[0] == b[0] and a[1] + 1 <= b[1] <= a[1] + 75
    }
    assert pairs == naive


def test_range_join_is_equi_join(spark):
    ev = spark.createDataFrame([(1, 10, 1)], "k long, t long, rid long")
    lhs = ev.select("k", F.col("t").alias("lt"))
    rhs = ev.select("k", F.col("t").alias("rt"))
    plan = range_join(
        lhs, rhs, key="k", left_ts="lt", right_ts="rt", lower=0, upper=100
    )._jdf.queryExecution().executedPlan().toString()
    # the bins turn the range predicate into an equi-join: Catalyst must NOT
    # fall back to a nested-loop/cartesian strategy
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_resample_ffill(spark):
    from arrow_udf_spark.operators.temporal import resample_ffill

    obs = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 25, 2.0), ("b", 12, 9.0)],
        "k string, t long, v double",
    )
    out = resample_ffill(obs, key="k", ts="t", value="v", step=10, start=0, end=40)
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got == {
        ("a", 0): None,   # before first observation
        ("a", 10): 1.0,
        ("a", 20): 1.0,
        ("a", 30): 2.0,
        ("b", 0): None,
        ("b", 10): None,
        ("b", 20): 9.0,
        ("b", 30): 9.0,
    }


def test_resample_ffill_tick_includes_exact_time(spark):
    from arrow_udf_spark.operators.temporal import resample_ffill

    obs = spark.createDataFrame([("a", 10, 7.0)], "k string, t long, v double")
    out = resample_ffill(obs, key="k", ts="t", value="v", step=10, start=0, end=20)
    got = {r.t: r.v for r in out.collect()}
    assert got == {0: None, 10: 7.0}  # observation AT the tick is included
