"""Per-job/per-stage profile of one declared query (guide §1.1/§7.1).

Runs ``QUERIES[name]`` once (construction + one noop-write
materialization) in a fresh session with the UI enabled, then pulls
``/api/v1/.../jobs`` + ``stages`` from the driver's own UI server and
prints every job the query submitted — duration, stage breakdown, input
/ shuffle volumes.  This is the microscope for multi-job queries
(driver-loop trainers, checkpoint staging, persisted-index builds) where
a single wall-clock number cannot say WHICH action dominates.

Usage::

    python tools/opt_profile.py simhash_hamming_pairs [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from arrow_udf_spark import get_spark
    from arrow_udf_spark.queries import QUERIES

    spark = get_spark("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        sys.exit("Spark UI disabled — cannot profile")
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warm-up (the bench protocol): touch every table + python workers
    import glob as _glob

    for p in sorted(_glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    from arrow_udf_spark.functions.corpus import gcd_i64

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        gcd_i64("l_partkey", "l_suppkey")
    ).count()

    for name in names:
        jobs_before = {j["jobId"] for j in _get(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in _get(base, "/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        stages = {s["stageId"]: s for s in _get(base, "/stages")}
        print(f"\n=== {name}: construct {t1-t0:.2f}s, materialize {t2-t1:.2f}s, "
              f"{len(jobs)} jobs ===")
        for j in jobs:
            sub = j.get("submissionTime", "")
            dur = ""
            if j.get("completionTime") and sub:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (datetime.strptime(j["completionTime"], fmt)
                     - datetime.strptime(sub, fmt)).total_seconds()
                dur = f"{d:6.2f}s"
            print(f"  job {j['jobId']:>3} {dur:>8} tasks={j['numCompletedTasks']:<4} "
                  f"{(j.get('description') or j['name'])[:90]}")
            for sid in sorted(j.get("stageIds", [])):
                s = stages.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                ms = s.get("executorRunTime", 0)
                print(
                    f"    stage {sid:>3} run={ms/1000:7.2f}s(cpu-sum) "
                    f"tasks={s.get('numCompleteTasks', 0):<4}"
                    f" in={s.get('inputBytes', 0)/1e6:8.1f}MB"
                    f" sh_r={s.get('shuffleReadBytes', 0)/1e6:8.1f}MB"
                    f" sh_w={s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB"
                    f"  {s['name'].splitlines()[0][:70]}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
