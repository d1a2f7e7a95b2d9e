"""Property tests for the round-5 operators: each compares the Spark
operator against an independent brute-force Python referee on
hypothesis-generated inputs (few examples, one small Spark job each —
`deadline=None` because Spark latency is not the referee's fault)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

STAGES = ["s0", "s1", "s2"]

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.sampled_from(STAGES + ["other"]),  # event type
        st.integers(min_value=0, max_value=20),  # ts (collisions likely)
    ),
    min_size=1,
    max_size=25,
)


def _ref_funnel(rows, stages):
    by_user = defaultdict(list)
    for u, ty, ts in rows:
        by_user[u].append((ty, ts))
    out = {}
    for u, evs in by_user.items():
        t_prev = None
        stage = 0
        for s in stages:
            cands = [
                ts
                for ty, ts in evs
                if ty == s and (t_prev is None or ts > t_prev)
            ]
            if not cands:
                break
            t_prev = min(cands)
            stage += 1
        out[u] = stage
    return out


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_funnel_matches_referee(rows):
    from arrow_udf_spark import get_spark
    from arrow_udf_spark.operators.temporal import funnel_stages

    spark = get_spark("tests", master="local[4]")
    ev = spark.createDataFrame(rows, "user_id long, event_type string, us long")
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(ev, STAGES, ts_col="us").collect()
    }
    assert got == _ref_funnel(rows, STAGES)


daily_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # day offset from epoch
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=20,
)


def _ref_rolling(rows, window_days=7):
    import math

    daily = defaultdict(int)
    for d, v in rows:
        daily[d] += math.floor(v * 1_000_000 + 0.5)
    out = {}
    for d, total in daily.items():
        out[d] = (
            total,
            sum(t for dd, t in daily.items() if d - (window_days - 1) <= dd <= d),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(daily_strategy)
def test_rolling_daily_sum_matches_referee(rows):
    from datetime import datetime, timedelta

    from arrow_udf_spark import get_spark
    from arrow_udf_spark.operators.temporal import rolling_daily_sum

    spark = get_spark("tests", master="local[4]")
    epoch = datetime(1970, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [(epoch + timedelta(days=d), float(v)) for d, v in rows],
        "ts timestamp, value double",
    )
    ref = _ref_rolling(rows)
    got = {}
    for r in rolling_daily_sum(ev).collect():
        day = (datetime.strptime(r["d"], "%Y-%m-%d") - epoch.replace(hour=0)).days
        got[day] = (r["day_micros"], r["rolling_micros"])
    assert got == ref


keys_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.one_of(
            st.none(),
            st.integers(min_value=2**53 - 2, max_value=2**53 + 2),
            st.integers(min_value=-5, max_value=5),
        ),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(keys_strategy)
def test_udaf_exact_keys_and_sums_match_referee(rows):
    """End-to-end two-phase UDAF vs plain-Python referee, with keys and
    values straddling 2^53 and NULLs in both positions."""
    from arrow_udf_spark import get_spark
    from arrow_udf_spark.functions.corpus import SumAgg

    spark = get_spark("tests", master="local[4]")
    df = spark.createDataFrame(rows, "g string, x long").repartition(3)
    got = {
        r["g"]: r["sum_udaf"]
        for r in SumAgg.agg(df, by=["g"], args=["x"]).collect()
    }
    ref = defaultdict(int)
    for g, x in rows:
        ref[g] += 0 if x is None else x
    assert got == dict(ref)
