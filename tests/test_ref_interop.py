"""Live interop with the reference's own UDF server implementation.

The subprocess launched by ``serve_reference`` executes the reference's
``arrow_udf`` package (arrow-udf-remote/python/arrow_udf/__init__.py)
imported from the read-only tree — these tests prove our Flight client and
Spark integration against the reference's actual wire behavior (protocol
version action, discovery schema-concat trick, do_exchange framing,
table-function (row, value) shape)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from arrow_udf_spark.sources.ref_interop import reference_available, serve_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def ref_uri():
    return serve_reference()


def client(uri):
    from arrow_udf_spark.sources.flight import FlightUdfClient

    return FlightUdfClient(uri)


def test_protocol_version_is_raw_byte_2(ref_uri):
    c = client(ref_uri)
    assert c.protocol_version() == b"\x02"
    c.close()


def test_discovery_schema_concat_and_arg_count(ref_uri):
    c = client(ref_uri)
    names = c.list_functions()
    assert {"gcd", "to_hex", "series"} <= set(names)
    schema, n_args = c.function_info("gcd")
    # concat(input fields, output fields); total_records = #args
    assert n_args == 2
    assert [f.name for f in schema] == ["x", "y", "gcd"]
    assert schema.field("gcd").type == pa.int64()
    c.close()


def test_scalar_exchange_against_reference_server(ref_uri):
    c = client(ref_uri)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([12, 30, 7, None], type=pa.int64()),
            pa.array([18, 12, 0, 5], type=pa.int64()),
        ],
        names=["x", "y"],
    )
    out = c.call("gcd", batch)
    assert out.column("gcd").to_pylist() == [6, 6, 7, None]
    c.close()


def test_table_function_row_index_shape(ref_uri):
    c = client(ref_uri)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([3, 0, 2], type=pa.int64())], names=["n"]
    )
    out = c.call_table_function("series", batch)
    # reference UDTF shape: (row = input row index, value); row 1 yields none
    assert out.column("row").to_pylist() == [0, 0, 0, 2, 2]
    assert out.column("series").to_pylist() == [0, 1, 2, 0, 1]
    c.close()


def test_spark_remote_scalar_via_reference_server(spark, sf_dir, ref_uri):
    from arrow_udf_spark.sources.flight import remote_scalar

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    out = remote_scalar(
        li.limit(64),
        ref_uri,
        "gcd",
        cols=["l_partkey", "l_suppkey"],
        passthrough=["l_orderkey"],
    )
    rows = out.collect()
    assert len(rows) == 64
    import math

    for r in rows:
        assert r["gcd"] >= 1


def test_spark_remote_table_via_reference_server(spark, sf_dir, ref_uri):
    from pyspark.sql import functions as F

    from arrow_udf_spark.sources.flight import remote_table

    p = (
        spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
        .select("p_partkey", (F.col("p_size") % 4).cast("long").alias("n"))
        .limit(32)
    )
    out = remote_table(p, ref_uri, "series", cols=["n"], passthrough=["p_partkey"])
    df = out.toPandas()
    src = p.toPandas()
    expected = int(src["n"].sum())
    assert len(df) == expected
    # every fan-out value is within its input's range
    merged = df.merge(src, on="p_partkey")
    assert (merged["series"] < merged["n"]).all()
