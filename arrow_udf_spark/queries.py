"""Driver-facing query catalog: every implemented operator as a
(spark_query, oracle_sql) pair over the /root/testdata tables.

Conventions (kept in sync with the driver's compare, TESTDATA.md):

- every computed column is aliased IDENTICALLY in the Spark query and the
  oracle SQL;
- integer outputs are produced as BIGINT on both sides, floats as DOUBLE
  rounded to 6 dp where accumulation order could differ;
- arrays are joined to strings, timestamps cast to strings — so the
  value-hash never depends on engine-specific nested-type formatting;
- each query carries enough key columns to make the (order-insensitive)
  hash discriminating.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import corpus as C

Query = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, Query] = {}
ORACLE: dict[str, str] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by
        # default; read it as nanos-since-epoch long (runtime-settable conf).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn: Query) -> Query:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.B scalar corpus
# ---------------------------------------------------------------------------


@query(
    "gcd",
    """
    SELECT l_orderkey, l_linenumber, gcd(l_partkey, l_suppkey) AS g
    FROM lineitem
    """,
)
def q_gcd(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", C.gcd_i64("l_partkey", "l_suppkey").alias("g")
    )


@query(
    "div_error",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_suppkey % 7 = 0 THEN NULL
                ELSE l_partkey // (l_suppkey % 7) END AS d,
           CASE WHEN l_suppkey % 7 = 0 THEN 'division by zero' END AS error
    FROM lineitem
    """,
)
def q_div_error(spark, sf):
    li = t(spark, sf, "lineitem")
    v, e = C.div.value_and_error(F.col("l_partkey"), F.col("l_suppkey") % 7)
    return li.select("l_orderkey", "l_linenumber", v.alias("d"), e)


@query(
    "neg",
    "SELECT l_orderkey, l_linenumber, -l_extendedprice AS n FROM lineitem",
)
def q_neg(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select("l_orderkey", "l_linenumber", C.neg("l_extendedprice").alias("n"))


@query(
    "option_add",
    """
    SELECT l_orderkey, l_linenumber,
           l_partkey + coalesce(nullif(l_suppkey % 3, 0), 0) AS s
    FROM lineitem
    """,
)
def q_option_add(spark, sf):
    li = t(spark, sf, "lineitem")
    b = F.nullif(F.col("l_suppkey") % 3, F.lit(0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        C.option_add(F.col("l_partkey"), b).cast("long").alias("s"),
    )


@query(
    "many_args",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_partkey + l_suppkey + l_linenumber + (l_orderkey % 97)
                + 1 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9 + 10 + 11 + 12 AS BIGINT) AS s16
    FROM lineitem
    """,
)
def q_many_args(spark, sf):
    li = t(spark, sf, "lineitem")
    args = [
        F.col("l_partkey"),
        F.col("l_suppkey"),
        F.col("l_linenumber"),
        F.col("l_orderkey") % 97,
    ] + [F.lit(i) for i in range(1, 13)]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        C.many_args(*args).cast("long").alias("s16"),
    )


@query(
    "length_fn",
    "SELECT p_partkey, CAST(strlen(p_name) AS BIGINT) AS len FROM part",
)
def q_length(spark, sf):
    p = t(spark, sf, "part")
    return p.select("p_partkey", C.length("p_name").cast("long").alias("len"))


@query(
    "substring_fn",
    """
    SELECT p_partkey, substr(p_name, (p_size % 10) + 1) AS suffix FROM part
    """,
)
def q_substring(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        C.substring(F.col("p_name"), F.col("p_size") % 10).alias("suffix"),
    )


@query(
    "split_fn",
    """
    SELECT p_partkey,
           array_to_string(string_split(replace(p_type, ' ', ','), ','), '|') AS parts
    FROM part
    """,
)
def q_split(spark, sf):
    p = t(spark, sf, "part")
    parts = C.split(F.regexp_replace("p_type", " ", ","))
    return p.select("p_partkey", F.array_join(parts, "|").alias("parts"))


@query(
    "to_string_fn",
    "SELECT l_orderkey, CAST(l_orderkey AS VARCHAR) AS s FROM lineitem",
)
def q_to_string(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select("l_orderkey", C.to_string("l_orderkey").alias("s"))


@query(
    "key_value_fn",
    """
    SELECT p_partkey, p_brand AS key, p_type AS value FROM part
    """,
)
def q_key_value(spark, sf):
    p = t(spark, sf, "part")
    kv = C.key_value(F.concat_ws("=", "p_brand", "p_type"))
    return p.select(
        "p_partkey",
        kv.getField("key").alias("key"),
        kv.getField("value").alias("value"),
    )


@query(
    "hex_to_dec_fn",
    "SELECT l_orderkey, CAST(l_orderkey AS VARCHAR) AS dec FROM lineitem",
)
def q_hex_to_dec(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select("l_orderkey", C.hex_to_dec(F.hex("l_orderkey")).alias("dec"))


@query(
    "decimal_add_fn",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(printf('%.2f', l_extendedprice) AS DECIMAL(38,2))
                + CAST(printf('%.2f', l_tax * 1000) AS DECIMAL(38,2)) AS VARCHAR) AS dsum
    FROM lineitem
    """,
)
def q_decimal_add(spark, sf):
    li = t(spark, sf, "lineitem")
    a = F.format_string("%.2f", "l_extendedprice")
    b = F.format_string("%.2f", F.col("l_tax") * 1000)
    return li.select(
        "l_orderkey", "l_linenumber", C.decimal_add(a, b).alias("dsum")
    )


@query(
    "to_json_fn",
    """
    SELECT l_orderkey, CAST(to_json(l_orderkey) AS VARCHAR) AS ji,
           CAST(to_json(l_returnflag) AS VARCHAR) AS js
    FROM lineitem
    """,
)
def q_to_json(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        C.to_json_int("l_orderkey").alias("ji"),
        C.to_json_str("l_returnflag").alias("js"),
    )


@query(
    "jsonb_access_fn",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS VARCHAR) AS k
    FROM events
    """,
)
def q_jsonb_access(spark, sf):
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id", C.jsonb_access(F.col("props"), F.lit("k")).alias("k")
    )


@query(
    "datetime_fn",
    """
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + to_hours(o_orderkey % 24) AS VARCHAR) AS ts
    FROM orders
    """,
)
def q_datetime(spark, sf):
    o = t(spark, sf, "orders")
    hours_us = (F.col("o_orderkey") % 24) * F.lit(3_600_000_000)
    ts = C.datetime_fn(F.col("o_orderdate").cast("date"), hours_us)
    return o.select(
        "o_orderkey", F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("ts")
    )


@query(
    "array_sum_fn",
    """
    SELECT vec_id, round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS asum
    FROM embeddings
    """,
)
def q_array_sum(spark, sf):
    e = t(spark, sf, "embeddings")
    arr = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id", F.round(C.array_sum_f64(arr), 6).alias("asum")
    )


@query(
    "array_access_fn",
    """
    SELECT p_partkey,
           CASE WHEN (p_partkey % 60) + 1 BETWEEN 1 AND p_size
                THEN (p_partkey % 60) + 1 END AS v
    FROM part
    """,
)
def q_array_access(spark, sf):
    p = t(spark, sf, "part")
    arr = F.sequence(F.lit(1).cast("long"), F.col("p_size").cast("long"))
    i = (F.col("p_partkey") % 60 + 1).cast("int")
    return p.select(
        "p_partkey", C.array_access_i64(arr, i).cast("long").alias("v")
    )


# ---------------------------------------------------------------------------
# §2.B table functions
# ---------------------------------------------------------------------------


@query(
    "series_udtf",
    """
    SELECT p_partkey, unnest(range(0, p_size)) AS series FROM part
    """,
)
def q_series(spark, sf):
    p = t(spark, sf, "part")
    out = C.series.apply(p, cols=["p_size"], passthrough=["p_partkey"])
    return out.select("p_partkey", F.col("series").cast("long").alias("series"))


@query(
    "key_values_udtf",
    """
    SELECT p_partkey, 'brand' AS key, p_brand AS value FROM part
    UNION ALL
    SELECT p_partkey, 'type' AS key, p_type AS value FROM part
    """,
)
def q_key_values(spark, sf):
    p = t(spark, sf, "part")
    src = p.withColumn(
        "s",
        F.concat(F.lit("brand="), "p_brand", F.lit(",type="), "p_type"),
    )
    out = C.key_values.apply(src, cols=["s"], passthrough=["p_partkey"])
    return out.select(
        "p_partkey",
        F.col("key_values").getField("key").alias("key"),
        F.col("key_values").getField("value").alias("value"),
    )


@query(
    "json_array_elements_udtf",
    """
    SELECT event_id, CAST(user_id AS VARCHAR) AS elem, NULL AS error
    FROM events WHERE event_type <> 'click'
    UNION ALL
    SELECT event_id, CAST(event_id AS VARCHAR) AS elem, NULL AS error
    FROM events WHERE event_type <> 'click'
    UNION ALL
    SELECT event_id, NULL AS elem, 'not an array' AS error
    FROM events WHERE event_type = 'click'
    """,
)
def q_json_array_elements(spark, sf):
    ev = t(spark, sf, "events")
    src = ev.withColumn(
        "j",
        F.when(
            F.col("event_type") != "click",
            F.to_json(F.array("user_id", "event_id")),
        ).otherwise(F.col("user_id").cast("string")),  # scalar JSON text
    )
    out = C.json_array_elements.apply(src, cols=["j"], passthrough=["event_id"])
    return out.select(
        "event_id", F.col("json_array_elements").alias("elem"), "error"
    )


# ---------------------------------------------------------------------------
# §2.B aggregates (distributed two-phase, proving merge)
# ---------------------------------------------------------------------------


@query(
    "sum_udaf",
    """
    SELECT l_returnflag, SUM(CAST(l_quantity AS BIGINT)) AS sum_udaf
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_sum_udaf(spark, sf):
    li = t(spark, sf, "lineitem").withColumn("q", F.col("l_quantity").cast("long"))
    return C.SumAgg.agg(li, by=["l_returnflag"], args=["q"])


@query(
    "weighted_avg_udaf",
    """
    SELECT l_returnflag,
           round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS weighted_avg
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_weighted_avg(spark, sf):
    li = t(spark, sf, "lineitem")
    out = C.WeightedAvg.agg(
        li, by=["l_returnflag"], args=["l_extendedprice", "l_quantity"]
    )
    return out.select(
        "l_returnflag", F.round("weighted_avg", 6).alias("weighted_avg")
    )


@query(
    "count_udaf",
    """
    SELECT event_type, COUNT(user_id) AS count_udaf FROM events GROUP BY event_type
    """,
)
def q_count_udaf(spark, sf):
    ev = t(spark, sf, "events")
    return C.CountAgg.agg(ev, by=["event_type"], args=["user_id"])
