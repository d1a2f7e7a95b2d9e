"""Local replica of the driver's correctness gate: run every entry of
``queries()`` on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables; compare row count, column names, and order-insensitive
values.

Value comparison is STRICT: floats via shortest-round-trip repr (no 6 dp
masking — the driver hashes exact renderings, so queries must do their own
portable rounding), decimals exactly.  A query that only passes under lossy
normalization would fail the driver's hash gate.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
        python tools/oracle_check.py --record LOCAL_VERIFY_r06.json [sf_dir]

``--record PATH`` writes a JSON artifact {query: {"pass": bool, "rows": N,
"mode": "oracle"|"rows-only", "err": ...}, "__meta__": {...}} — the
checked-in evidence the staleness invariant (tests/test_gate_window.py)
accepts for queries outside the driver's ~50-slot gate window.  The
driver gate stays the stronger signal; this replica freshens everything
the window can't fit each round.
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb

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


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "␀"
        if v == 0.0:
            return "0.0"  # fold -0.0 into 0.0
        return repr(v)
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            # exact plain rendering; trailing zeros kept so scale differences
            # between engines surface here instead of at the driver's hash
            return format(v, "f")
    except Exception:
        pass
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(name: str, spark_df, con, sql: str) -> tuple[bool, str]:
    sp = spark_df.collect()
    sp_cols = spark_df.columns
    o = con.sql(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    if sorted(c.lower() for c in sp_cols) != sorted(c.lower() for c in o_cols):
        return False, f"column mismatch: spark={sorted(sp_cols)} oracle={sorted(o_cols)}"
    if len(sp) != len(o_rows):
        return False, f"row count: spark={len(sp)} oracle={len(o_rows)}"
    a = norm_rows([c.lower() for c in sp_cols], [tuple(r) for r in sp])
    b = norm_rows([c.lower() for c in o_cols], o_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        return False, f"values differ; spark-only={diff_a} oracle-only={diff_b}"
    return True, f"ok ({len(sp)} rows)"


def main() -> int:
    args = sys.argv[1:]
    record_path = None
    if args and args[0] == "--record":
        record_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from arrow_udf_spark import get_spark

    import os

    # partition-variation knobs: results must be identical under ANY
    # core/shuffle-partition count (e.g. SPARK_GRAFT_ORACLE_MASTER=local[5]
    # SPARK_GRAFT_SHUFFLE=5 replays the round-4 independence matrix)
    master = os.environ.get("SPARK_GRAFT_ORACLE_MASTER", "local[8]")
    spark = get_spark("oracle-check", master=master)
    shuf = os.environ.get("SPARK_GRAFT_SHUFFLE")
    if shuf:
        spark.conf.set("spark.sql.shuffle.partitions", shuf)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    ran = 0
    record: dict = {}
    import json
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.perf_counter()
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                print(f"  {name:28s} ROWS-ONLY ({n} rows) [{dt:.2f}s]")
                record[name] = {
                    "pass": True, "rows": n, "mode": "rows-only",
                    "secs": round(dt, 2),
                }
            except Exception as e:
                print(f"  {name:28s} ERROR {e}")
                failed.append(name)
                record[name] = {
                    "pass": False, "mode": "rows-only",
                    "err": f"{type(e).__name__}: {str(e)[:200]}",
                }
            continue
        try:
            ok, msg = compare(name, fn(spark, sf_dir), con, oracles[name])
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        dt = time.perf_counter() - t0
        print(f"  {name:28s} {'PASS' if ok else 'FAIL'} {msg} [{dt:.2f}s]")
        record[name] = {"pass": ok, "mode": "oracle", "secs": round(dt, 2)}
        if not ok:
            record[name]["err"] = msg[:200]
            failed.append(name)
    print(f"\n{ran - len(failed)}/{ran} pass ({len(qs)} in catalog)")
    if record_path:
        record["__meta__"] = {
            "sf_dir": sf_dir,
            "master": master,
            "shuffle_partitions": shuf or spark.conf.get(
                "spark.sql.shuffle.partitions"
            ),
            "ran": ran,
            "failed": sorted(failed),
        }
        with open(record_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"recorded {ran} results -> {record_path}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
