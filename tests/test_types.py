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
