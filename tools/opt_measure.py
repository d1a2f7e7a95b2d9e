"""Round-10 optimization measurement harness (guide section 1).

For each named query: capture ``.explain("formatted")`` to
``plans/r10/<name>_<tag>.txt`` and time N noop-write materializations in an
isolated labelled job.  This is the per-query microscope the bench's
cohort protocol deliberately is not — use it to A/B one query while
iterating, and ``bench.py`` for the round-over-round chain.

Usage::

    python tools/opt_measure.py --tag before --reps 3 q1 q2 ...
    python tools/opt_measure.py --tag after --reps 3 --no-plan q1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from arrow_udf_spark import get_spark
    from arrow_udf_spark.queries import QUERIES

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: touch every table + one python-worker spin-up (not billed)
    import glob as _glob

    for p in sorted(_glob.glob(f"{args.sf_dir}/*.parquet")):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    from arrow_udf_spark.functions.corpus import gcd_i64

    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").select(
        gcd_i64("l_partkey", "l_suppkey")
    ).count()

    out: dict[str, list[float]] = {}
    for name in args.names:
        df = QUERIES[name](spark, args.sf_dir)
        if not args.no_plan:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        secs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i} [{args.tag}]")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            secs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = secs
        sys.stderr.write(f"  {name} [{args.tag}]: {secs} best={min(secs)}\n")
    print(json.dumps({"tag": args.tag, "sf_dir": args.sf_dir, "secs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
