"""Temporal relational operators Spark lacks as built-ins.

These are engine-host operators (SURVEY.md §2.C: the reference delegates all
relational processing to its host engine, reference README.md:94-100); a
training-data pipeline at 100 TB needs them as first-class, shuffle-efficient
DataFrame transforms:

- :func:`asof_join` — for each left row, the latest right row at-or-before
  its timestamp (per key).  One shuffle on the key via union + running
  ``last(ignorenulls)`` window — never a per-key cross product, never a
  driver collect.  At 1000 executors this is a single hash exchange of
  (key) + a sort within partitions, the same cost envelope as a regular
  shuffled join.
- :func:`sessionize` — gap-based session ids per key (the batch analogue of
  streaming session windows).  One window over (key, ts): lag + cumulative
  sum, all JVM-side.
- :func:`range_join` — pairs (l, r) with ``r.ts`` in ``[l.ts+lower,
  l.ts+upper]`` per key.  Implemented as a *binned* join: right rows land in
  ``floor(ts/width)`` buckets, left rows probe the covered buckets via a
  small static explode, then an exact filter.  Fan-out is bounded by
  ``(upper-lower)/width + 2`` buckets per row, so the plan is a plain
  equi-join Catalyst can shuffle-hash — not the O(n·m) blow-up of an
  inequality-only theta join.

All three take/return DataFrames and compose with the UDF framework.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "asof_join_forward", "sessionize", "range_join", "resample_ffill", "time_bucket_rollup"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: for each left row, attach the most recent right row
    with ``right[on] <= left[on]``, matching on key column(s) ``by``.

    ``right`` must be unique per (by, on) — pre-aggregate if not (ties would
    make "the" latest row ambiguous on any engine).

    Strategy (scale-first): tag both inputs, union, then one window
    ``partitionBy(by).orderBy(on, tag)`` where right rows sort before left
    rows at equal timestamps (inclusive semantics), and a running
    ``last(col, ignorenulls=True)`` carries the latest right values forward.
    Exactly one shuffle on ``by``; no range explosion.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    # tag=0 sorts right rows first at equal `on` values => `<=` semantics
    lt = left.withColumn("__tag", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(out_names[c], F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    left_cols = [c for c in left.columns]
    unioned = lt.select(
        *left_cols, "__tag", *[out_names[c] for c in right_cols]
    ).unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        unioned = unioned.withColumn(
            out_names[c], F.last(out_names[c], ignorenulls=True).over(w)
        )
    return unioned.where(F.col("__tag") == 1).drop("__tag")


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    gap: int,
    order_tiebreak: Optional[str] = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous row of the same key exceeds ``gap`` (same units
    as the ``ts`` column).  Session ids are 0-based per key.

    Batch analogue of Structured Streaming session windows
    (``F.session_window``); one JVM-side window, one shuffle on the key.
    """
    key = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(*key).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(ts) - prev) > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, (F.sum(new_session).over(run) - 1))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bin_width: Optional[int] = None,
) -> DataFrame:
    """Inner join of (l, r) pairs with ``l[key] == r[key]`` and
    ``r[right_ts]`` in ``[l[left_ts]+lower, l[left_ts]+upper]``.

    Binned equi-join: right rows are bucketed once at ``floor(ts/width)``;
    each left row probes the fixed set of buckets its window can overlap
    (static sequence explode, bounded fan-out), then the exact range filter
    runs post-join.  Catalyst sees a plain equi-join on (key, bucket) and
    picks shuffle-hash/sort-merge; AQE can still split skewed buckets.
    Column name collisions must be resolved by the caller beforehand.
    """
    key = [key] if isinstance(key, str) else list(key)
    width = bin_width or max(upper - lower, 1)
    n_bins = (upper - lower) // width + 2  # buckets a window can overlap

    # integral DIV, not floor(double /): nanosecond epochs (~1.7e18) exceed
    # double's 2^53 exact-integer range, so float division mis-bins rows.
    # DIV truncates toward zero == floor for the non-negative epoch domain.
    first_bin = F.expr(f"(CAST({left_ts} AS BIGINT) + {lower}) DIV {width}")
    probe = left.withColumn(
        "__bin",
        F.explode(
            F.array(*[first_bin + F.lit(i) for i in range(n_bins)])
        ),
    )
    build = right.withColumn(
        "__bin", F.expr(f"CAST({right_ts} AS BIGINT) DIV {width}")
    )
    joined = probe.join(build, on=key + ["__bin"], how="inner").where(
        (F.col(right_ts) >= F.col(left_ts) + F.lit(lower))
        & (F.col(right_ts) <= F.col(left_ts) + F.lit(upper))
    )
    return joined.drop("__bin")


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step: int,
    start: int,
    end: int,
) -> DataFrame:
    """Regularize an irregular time series: per key, one row per ``step``
    tick on ``[start, end)``, carrying the last observed ``value`` at or
    before the tick (forward fill).  The hypertable-rollup / gap-fill
    primitive of time-series stores.

    Spark plan: the tick grid is generated *distributed* (sequence+explode
    per key — no driver loop), unioned with the observations, and filled
    with one running ``last(ignorenulls)`` window per key: a single shuffle
    on the key, O(rows + ticks) work.  Ticks before a key's first
    observation stay NULL.
    """
    ticks = (end - start + step - 1) // step
    keys = df.select(key).distinct()
    grid = keys.select(
        key,
        F.explode(
            F.sequence(F.lit(0), F.lit(ticks - 1))
        ).alias("__i"),
    ).select(
        key, (F.lit(start) + F.col("__i") * step).cast("long").alias(ts)
    )
    obs = df.select(
        key, F.col(ts).cast("long").alias(ts), F.col(value).alias("__v")
    ).withColumn("__is_tick", F.lit(0))
    grid = grid.withColumn("__v", F.lit(None).cast(df.schema[value].dataType))
    grid = grid.withColumn("__is_tick", F.lit(1))
    unioned = obs.unionByName(grid)
    w = (
        Window.partitionBy(key)
        # observations sort before the tick at the same instant => a tick
        # at time t includes an observation at exactly t
        .orderBy(F.col(ts).asc(), F.col("__is_tick").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__f", F.last("__v", ignorenulls=True).over(w))
    return (
        filled.where(F.col("__is_tick") == 1)
        .select(key, ts, F.col("__f").alias(value))
    )


def funnel_stages(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "us",
) -> DataFrame:
    """Ordered-funnel analysis: how far through ``stages`` each user got,
    requiring each stage to occur STRICTLY AFTER the user's earliest
    completion of the previous stage.

    One shuffle total: every stage is a windowed conditional-min over the
    same ``user_col`` hash partitioning, so stages 2..n reuse stage 1's
    exchange (Spark only re-sorts, never re-partitions), and the final
    per-user reduction is already co-partitioned.  State per user is a
    fixed n_stages timestamp tuple — no event-list materialization, so a
    power user with millions of events costs the same as anyone else.

    Returns (user_col, stage) where stage = number of stages completed
    in order (0..len(stages)).
    """
    w = Window.partitionBy(user_col)
    out = df.select(user_col, type_col, ts_col)
    prev: Optional[str] = None
    for i, s in enumerate(stages):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col(ts_col) > F.col(prev))
        col = f"__t{i}"
        out = out.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    stage = F.lit(0)
    for i in range(len(stages)):
        stage = F.when(F.col(f"__t{i}").isNotNull(), i + 1).otherwise(stage)
    # per-user reduction: the window columns are constant per user
    return (
        out.groupBy(user_col)
        .agg(*[F.max(f"__t{i}").alias(f"__t{i}") for i in range(len(stages))])
        .select(user_col, stage.cast("int").alias("stage"))
    )


def rolling_daily_sum(
    df: DataFrame,
    ts_col: str = "ts",
    val_col: str = "value",
    window_days: int = 7,
) -> DataFrame:
    """Trailing ``window_days``-day rolling sum of a metric, exact.

    The metric is fixed-pointed to integer micro-units BEFORE aggregation
    (floor(x*1e6 + 0.5)), so every sum is int64 arithmetic — bit-exact in
    any engine and any accumulation order, where a double sum would drift
    per shuffle layout.  The daily pre-aggregation is keyed and map-side
    combined; the rolling window then runs over ONE ROW PER DAY (36.5k
    rows per century), so its single unpartitioned window is bounded no
    matter how large the raw table is.

    The frame is RANGE-based over the epoch-day number, not ROWS-based:
    with calendar gaps (a day with zero events) a ROWS frame would reach
    back 7 OBSERVED days — potentially months — instead of 7 calendar
    days."""
    daily = (
        df.select(
            F.col(ts_col).cast("date").alias("d"),
            F.floor(F.col(val_col) * 1_000_000 + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .groupBy("d")
        .agg(F.sum("v").alias("day_micros"))
        .withColumn("dn", F.datediff(F.col("d"), F.lit("1970-01-01")))
    )
    w = (
        Window.orderBy("dn").rangeBetween(-(window_days - 1), Window.currentRow)
    )
    return daily.select(
        F.col("d").cast("string").alias("d"),
        "day_micros",
        F.sum("day_micros").over(w).alias("rolling_micros"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Event-type transition counts (the Markov/path-analysis matrix):
    for each user's event stream ordered by (ts, id), count every
    consecutive ``(prev_type, next_type)`` pair across the corpus.

    Scale: ONE hash exchange on the user key feeds the lag window (event
    order is resolved inside each user partition), and the transition
    aggregate is map-side combinable over at most |types|² keys — the
    output is schema-sized, not data-sized.  The id tie-break makes the
    sequence deterministic under timestamp collisions."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    return (
        df.select(
            F.lag(F.col(type_col)).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def time_bucket_rollup(
    df,
    ts_col: str = "ts",
    val_col: str = "value",
):
    """Hypertable-style continuous-aggregate cascade: ONE aggregation
    over the raw rows at the finest grain (hour), then every coarser
    level (day, month) rolls up from the level below's PARTIALS — sums
    of sums, sums of counts — never re-touching the raw table.  That is
    the continuous-aggregate contract at 100 TB: the raw scan happens
    once per refresh window, coarse levels cost O(|buckets|) regardless
    of row count, and the cascade is exact because the measures are
    decomposable.

    Returns ``(level, bucket, n_events, total_cents)`` for level in
    hour/day/month.  The measure is integer cents (``floor(value*100)``
    summed as BIGINT) so every level is bit-exact in any engine and the
    oracle can verify each coarse level against a DIRECT aggregation of
    the raw rows — proving the partial-rollup path loses nothing.
    """
    cents = F.floor(F.col(val_col) * 100).cast("long")
    hour = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_cents").cast("long").alias("total_cents"),
        )
    )
    month = (
        day.groupBy(F.date_trunc("month", F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_cents").cast("long").alias("total_cents"),
        )
    )
    out = None
    for level, d in (("hour", hour), ("day", day), ("month", month)):
        part = d.select(
            F.lit(level).alias("level"),
            # pinned rendering: DuckDB's date_trunc('day'/'month') yields
            # DATE while Spark keeps TIMESTAMP — format explicitly so the
            # hash gate compares the same string either way
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n_events",
            "total_cents",
        )
        out = part if out is None else out.unionByName(part)
    return out


def asof_join_forward(
    left,
    right,
    on: str,
    by,
    right_cols=None,
    suffix: str = "_r",
):
    """Forward as-of join: for each left row, attach the EARLIEST right
    row with ``right[on] >= left[on]`` (inclusive), matching on ``by`` —
    the "next quote / next restock after the event" direction
    :func:`asof_join` cannot express.

    Same single-shuffle union strategy, mirrored: one window
    ``partitionBy(by).orderBy(on ASC, tag DESC)`` (left rows sort before
    right rows at equal timestamps, so an equal-timestamp right row is
    inside the forward frame = inclusive semantics) with ONE
    ``first(struct(right_cols), ignorenulls=True)`` over ``[current,
    unbounded following]`` pulling the nearest future right row back.
    Filling a single struct (not each column independently) guarantees
    all attached values come from the SAME right row, and a matched
    right row whose value is legitimately NULL is attached as NULL —
    not skipped in favor of a later row's value (ADVICE r7).  Exactly
    one shuffle on ``by``; no range explosion.

    Contract (matching :func:`asof_join`): ``right`` must be unique per
    ``(by, on)`` — with ties the first by union order wins,
    nondeterministically.  Left rows with no future right row get NULLs.
    """
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    struct_t = T.StructType(
        [
            T.StructField(out_names[c], right.schema[c].dataType)
            for c in right_cols
        ]
    )
    lt = left.withColumn("__tag", F.lit(1)).withColumn(
        "__rvals", F.lit(None).cast(struct_t)
    )
    rt = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__tag"),
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in right_cols]
        ).alias("__rvals"),
    )
    left_cols = [c for c in left.columns]
    unioned = lt.select(*left_cols, "__tag", "__rvals").unionByName(
        rt, allowMissingColumns=True
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # the struct is non-null for every right row even when its fields are
    # NULL, so ignorenulls skips only left rows — one fill, one right row
    unioned = unioned.withColumn(
        "__rvals", F.first("__rvals", ignorenulls=True).over(w)
    )
    return (
        unioned.where(F.col("__tag") == 1)
        .select(
            *left_cols,
            *[F.col(f"__rvals.{out_names[c]}") for c in right_cols],
        )
    )
