"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog (arrow_udf_spark.queries)
for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pricing summary where the
    grouping key and aggregate run through the UDF framework (gcd predicate,
    distributed weighted_avg UDAF)."""
    from pyspark.sql import functions as F

    from arrow_udf_spark.functions import corpus as C

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    filtered = li.where(C.gcd_i64("l_partkey", "l_suppkey").cast("long") == 1)
    out = C.WeightedAvg.agg(
        filtered, by=["l_returnflag"], args=["l_extendedprice", "l_quantity"]
    )
    return out.select("l_returnflag", F.round("weighted_avg", 6).alias("weighted_avg"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from arrow_udf_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from arrow_udf_spark.queries import ORACLE

    return dict(ORACLE)
