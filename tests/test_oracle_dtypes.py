"""Guard against oracle result types the driver's hash can't match.

DuckDB widens several expressions past what Spark can produce — window /
plain SUM over integers returns HUGEINT (int128), `//` keeps the operand
width — and the driver's value-hash renders *typed* values, so an int128
column hash-mismatches Spark's int64 even when every digit agrees (the
round-2 `pack_sequences`/`pipeline_e2e` failure).  Every oracle must cast
such expressions down explicitly; this test DESCRIBEs all 100+ oracles in
milliseconds so the whole class can never regress silently.
"""

import duckdb
import pytest

from arrow_udf_spark.queries import ORACLE

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

BANNED = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_unrepresentable_oracle_dtypes(con):
    offenders = []
    for name, sql in ORACLE.items():
        desc = con.sql("DESCRIBE " + sql).fetchall()
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BANNED):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns with Spark-unrepresentable types (add explicit "
        f"CASTs): {offenders}"
    )
