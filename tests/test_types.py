from pyspark.sql import types as T

from arrow_udf_spark import parse_type
from arrow_udf_spark.plans.types import EXT_DECIMAL, EXT_JSON, EXT_PICKLE


def test_simple_aliases():
    assert parse_type("int").dtype == T.IntegerType()
    assert parse_type("INT4").dtype == T.IntegerType()
    assert parse_type("bigint").dtype == T.LongType()
    assert parse_type("varchar").dtype == T.StringType()
    assert parse_type("float4").dtype == T.FloatType()
    assert parse_type("double precision").dtype == T.DoubleType()
    assert parse_type("bytea").dtype == T.BinaryType()
    assert parse_type("date").dtype == T.DateType()
    assert parse_type("timestamp").dtype == T.TimestampNTZType()


def test_unsigned_widening():
    assert parse_type("uint8").dtype == T.ShortType()
    assert parse_type("uint16").dtype == T.IntegerType()
    assert parse_type("uint32").dtype == T.LongType()
    assert parse_type("uint64").dtype == T.DecimalType(20, 0)


def test_ext_types():
    assert parse_type("json").ext == EXT_JSON
    assert parse_type("jsonb").ext == EXT_JSON
    assert parse_type("decimal").ext == EXT_DECIMAL
    assert parse_type("decimal").dtype == T.StringType()
    assert parse_type("pickle").ext == EXT_PICKLE
    # bounded decimal is native, no ext tag
    d = parse_type("decimal(12,3)")
    assert d.dtype == T.DecimalType(12, 3) and d.ext is None


def test_nested():
    assert parse_type("int[]").dtype == T.ArrayType(T.IntegerType())
    assert parse_type("string[][]").dtype == T.ArrayType(T.ArrayType(T.StringType()))
    st = parse_type("struct<a:int, b:string[]>").dtype
    assert st == T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.ArrayType(T.StringType())),
        ]
    )
    mt = parse_type("map<string, struct<x:int,y:int>>").dtype
    assert isinstance(mt, T.MapType)
    # interval struct encoding
    iv = parse_type("interval").dtype
    assert [f.name for f in iv.fields] == ["months", "days", "nanos"]


def test_bad_type():
    import pytest

    with pytest.raises(ValueError):
        parse_type("wibble")


def test_named_struct_type_registration():
    from arrow_udf_spark import parse_type, struct_type

    @struct_type
    class TcpInfo:
        src_port: "int32"
        dst_port: "int32"
        flags: "string"

    dt = parse_type("TcpInfo").dtype
    assert [f.name for f in dt.fields] == ["src_port", "dst_port", "flags"]
    assert TcpInfo.spark_type == dt
    # generated constructor: positional + keyword
    v = TcpInfo(80, 443, flags="SYN")
    assert v.src_port == 80 and v.dst_port == 443 and v.flags == "SYN"


def test_named_struct_nested_and_array():
    from arrow_udf_spark import parse_type, struct_type

    @struct_type
    class Inner:
        a: "int64"

    @struct_type
    class Outer:
        inner: "Inner"
        xs: "int32[]"

    dt = parse_type("Outer").dtype
    assert dt.fields[0].dataType == parse_type("Inner").dtype
    assert dt.fields[1].dataType.simpleString() == "array<int>"


def test_udf_returns_class_instance():
    import pandas as pd

    from arrow_udf_spark import Registry, struct_type, udf

    @struct_type
    class KV2:
        key: "string"
        value: "string"

    @udf(input_types=["string"], result_type="KV2", registry=Registry())
    def kv2(s):
        k, sep, v = s.partition("=")
        return KV2(k, v) if sep else None

    out = kv2._eval(pd.Series(["x=1", "bad"]))
    assert out.loc[0, "key"] == "x" and out.loc[0, "value"] == "1"
    assert pd.isna(out.loc[1, "key"])


def test_largelist_spellings_parse_to_array():
    """Arrow's list/largelist size distinction is internal (reference
    pyarrow.rs:208-216): every spelling lands on Spark ArrayType."""
    from pyspark.sql import types as T

    from arrow_udf_spark.plans.types import parse_type

    for spelling in ("int[]", "list<int>", "largelist<int>", "large_list<int>"):
        assert parse_type(spelling).dtype == T.ArrayType(T.IntegerType())
    nested = parse_type("largelist<struct<a:int,b:string>>")
    assert isinstance(nested.dtype, T.ArrayType)
    assert isinstance(nested.dtype.elementType, T.StructType)


def test_reference_server_type_spellings_all_parse():
    """Every type string the reference Python server accepts
    (_string_to_data_type, arrow-udf-remote/python/arrow_udf/
    __init__.py:501-583) must parse here — migration surface parity."""
    from arrow_udf_spark.plans.types import parse_type

    spellings = [
        "NULL", "BOOLEAN", "BOOL", "TINYINT", "INT8", "SMALLINT", "INT16",
        "INT", "INTEGER", "INT32", "BIGINT", "INT64", "UINT8", "UINT16",
        "UINT32", "UINT64", "FLOAT32", "REAL", "FLOAT64", "DOUBLE PRECISION",
        "DECIMAL", "NUMERIC", "DECIMAL(12,3)", "DECIMAL(12)", "NUMERIC(9,2)",
        "DATE32", "DATE", "TIME64", "TIME", "TIME WITHOUT TIME ZONE",
        "TIMESTAMP", "TIMESTAMP WITHOUT TIME ZONE", "INTERVAL", "STRING",
        "VARCHAR", "LARGE_STRING", "JSON", "JSONB", "BINARY", "BYTEA",
        "LARGE_BINARY", "INT[]", "STRUCT<a:INT, b:VARCHAR>",
    ]
    for t in spellings:
        parse_type(t)  # must not raise
    from pyspark.sql import types as T

    assert parse_type("DECIMAL(12)").dtype == T.DecimalType(12, 0)
    assert parse_type("TIMESTAMP WITHOUT TIME ZONE").dtype == T.TimestampNTZType()
