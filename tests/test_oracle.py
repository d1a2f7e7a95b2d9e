"""Run the full driver catalog against the DuckDB oracle at sf0.001.

This is the same comparison the driver performs at sf0.01
(tools/oracle_check.py is the standalone version).
"""

import duckdb
import pytest

from tools.oracle_check import TABLES, compare


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    return con


def _cases():
    from arrow_udf_spark.queries import ORACLE, QUERIES

    return [(name, QUERIES[name], ORACLE.get(name)) for name in QUERIES]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, oracle, name, fn, sql):
    df = fn(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    ok, msg = compare(name, df, oracle, sql)
    assert ok, msg
