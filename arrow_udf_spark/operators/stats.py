"""Distributional statistics over event streams — anomaly scoring.

Determinism rule (repo-wide): moments are accumulated in EXACT integer /
decimal arithmetic (milli-unit fixed point; sum-of-squares as
DECIMAL(38,0)), so they are identical under any shuffle layout or engine.
The float math (mean, variance, sqrt, division) happens once per GROUP on
those exact inputs with a pinned expression order — IEEE doubles are
deterministic when the inputs and op order are, which is what lets the
z-scores hash-match a SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    val_col: str = "value",
    type_col: str = "event_type",
    id_col: str = "event_id",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` most anomalous rows per group by |z-score|.

    Scale shape: per-group moments are ONE map-side-combined aggregation
    (3 numbers per group); they broadcast back onto the event scan, so the
    standardization pass is map-only; the final top-k is a per-group
    window limit (WindowGroupLimit prunes partitions to k rows before the
    exchange).  No driver collect, no full sort."""
    v = F.floor(F.col(val_col) * 1000 + F.lit(0.5)).cast("bigint")
    base = df.select(
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"),
        v.alias("v"),
    )
    vd = F.col("v").cast("decimal(19,0)")
    mom = base.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(vd * vd).alias("ss"),  # decimal(38,0): exact at any scale
    )
    j = base.join(F.broadcast(mom), "event_type")
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("ss").cast("double") / F.col("n") - mean * mean
    # constant group -> var == 0 -> z pinned to 0 (0/0 would be NaN,
    # which engines render differently); exact inputs make the == safe
    z = F.when(var > 0, (F.col("v") - mean) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(z).desc(), F.col("event_id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(
            "event_id",
            "event_type",
            (F.floor(z * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("z"),
        )
    )
