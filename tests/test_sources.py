import shutil
import tempfile

import pyarrow as pa
import pyarrow.feather as feather

from arrow_udf_spark.sources.io import Catalog, read_arrow_ipc, write_parquet


def test_catalog_events_timestamp(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    ev = cat.table("events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() == 1000


def test_arrow_ipc_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="ipc_")
    try:
        t = pa.table({"a": list(range(100)), "s": [f"x{i}" for i in range(100)]})
        feather.write_feather(t, f"{d}/part0.arrow")
        feather.write_feather(t.slice(0, 10), f"{d}/part1.arrow")
        df = read_arrow_ipc(spark, d)
        assert df.count() == 110
        assert set(df.columns) == {"a", "s"}
        assert df.agg({"a": "sum"}).collect()[0][0] == sum(range(100)) + sum(range(10))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_parquet_partitioned(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sink_")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_parquet(
            li, f"{d}/out", partition_by=["l_returnflag"], sort_by=["l_orderkey"]
        )
        back = spark.read.parquet(f"{d}/out")
        assert back.count() == li.count()
        # partition pruning: reading one flag touches only its directory
        one = back.where(back.l_returnflag == "A")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or one.count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
