"""Skew mitigation: salted joins and two-stage aggregation.

At 100 TB a handful of hot keys (the empty document, the default user id,
the top domain) can pin a whole stage on one task.  Spark's AQE skew-join
splitting handles sort-merge joins; these operators cover the cases AQE
does not: hash aggregations with hot groups, and joins where one side must
be replicated.  Both are *exact* — salting only changes the partitioning,
never the result — so each is verified against the unsalted oracle.

- :func:`skew_agg` — two-stage aggregate: stage 1 groups by (key, salt)
  so a hot key spreads over ``buckets`` tasks; stage 2 merges the partial
  values per key.  Supported aggregates are the algebraic ones whose merge
  is trivial (sum/count/min/max); avg is expressed as sum+count.
- :func:`salted_join` — inner equi-join where the left side gets a salt in
  ``[0, buckets)`` and the right side is replicated once per salt value,
  so one hot join key fans across ``buckets`` tasks instead of one.
  Right-side replication costs ``buckets``× its size — use for a modest
  right side that is still too big (or too skew-correlated) to broadcast.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_agg", "salted_join"]

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def skew_agg(
    df: DataFrame,
    by: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    buckets: int = 16,
) -> DataFrame:
    """Exact two-stage aggregation resilient to hot grouping keys.

    ``aggs`` maps output name -> (fn, column) with fn in
    sum/count/min/max.  The salt is derived from a per-row id, so it needs
    no extra input and distributes uniformly regardless of data values.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"unsupported skew_agg fn {fn!r} for {name!r}")
    salt = (F.monotonically_increasing_id() % buckets).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*by, "__salt")
        .agg(*[_PARTIAL[fn](c).alias(name) for name, (fn, c) in aggs.items()])
    )
    return stage1.groupBy(*by).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
) -> DataFrame:
    """Exact inner equi-join with left-side salting + right-side
    replication.  Output columns = left columns + right non-key columns
    (caller resolves name collisions beforehand, as with a plain join)."""
    on = list(on)
    lt = left.withColumn("__salt", (F.monotonically_increasing_id() % buckets))
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return lt.join(rt, on=on + ["__salt"], how="inner").drop("__salt")
