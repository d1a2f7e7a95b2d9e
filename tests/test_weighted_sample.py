"""A-ES weighted reservoir sampling (operators/sampling.py
weighted_sample): determinism, no-replacement, weight-proportional
inclusion, and the TakeOrdered (not full sort) physical plan."""

from __future__ import annotations

from arrow_udf_spark.operators.sampling import weighted_sample


def _base(spark, n=120):
    # weights: ids 0..19 heavy (w=20), rest light (w=1)
    rows = [(i, 20 if i < 20 else 1) for i in range(n)]
    return spark.createDataFrame(rows, ["id", "w"])


def test_deterministic_and_without_replacement(spark):
    df = _base(spark)
    a = weighted_sample(df, "id", "w", k=30, salt="s1").collect()
    b = weighted_sample(df, "id", "w", k=30, salt="s1").collect()
    assert [r.id for r in a] == [r.id for r in b]
    ids = [r.id for r in a]
    assert len(ids) == len(set(ids)) == 30
    # ranks are 1..k in priority order
    assert [r.rnk for r in a] == sorted(r.rnk for r in a) == list(range(1, 31))


def test_weight_proportional_inclusion(spark):
    df = _base(spark)
    heavy_hits = light_hits = 0
    for s in range(12):
        picked = {
            r.id for r in weighted_sample(df, "id", "w", 30, salt=f"t{s}").collect()
        }
        heavy_hits += sum(1 for i in picked if i < 20)
        light_hits += sum(1 for i in picked if i >= 20)
    # 20 heavy rows at w=20 vs 100 light at w=1: heavy inclusion rate must
    # dominate decisively (expected near-certain inclusion for heavy rows)
    heavy_rate = heavy_hits / (12 * 20)
    light_rate = light_hits / (12 * 100)
    assert heavy_rate > 0.8
    assert heavy_rate > 2 * light_rate


def test_nonpositive_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 5), (4, 5)], ["id", "w"]
    )
    ids = {r.id for r in weighted_sample(df, "id", "w", 10).collect()}
    assert ids == {3, 4}


def test_plan_is_takeordered_not_full_sort(spark):
    df = _base(spark).repartition(4)
    picked = weighted_sample(df, "id", "w", k=5)
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
