"""Alternating same-machine A/B for the r10 optimization round.

One invocation = ONE side in ONE fresh process/session (the ab_drift
protocol): warm every table with a noop write, then time one noop-write
materialization per query.  A driver loop alternates sides so neither
inherits a systematically warmer/slower machine window:

    for i in 1 2 3; do
      python tools/opt_ab.py run /tmp/r10base  /tmp/ab_before_$i.json q1 q2
      python tools/opt_ab.py run /root/repo    /tmp/ab_after_$i.json  q1 q2
    done
    python tools/opt_ab.py report /tmp/ab_before_*.json -- /tmp/ab_after_*.json
"""

from __future__ import annotations

import glob as _glob
import json
import os
import sys
import time


def run_side(repo: str, out_json: str, names: list) -> None:
    sys.path.insert(0, repo)
    from arrow_udf_spark import get_spark
    from arrow_udf_spark.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt_ab")
    spark.sparkContext.setLogLevel("ERROR")
    for p in sorted(_glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
        sys.stderr.write(f"  {name}: {out[name]}\n")
    with open(out_json, "w") as fh:
        json.dump({"repo": repo, "secs": out}, fh)
    spark.stop()


def report(args: list) -> None:
    split = args.index("--")
    before, after = args[:split], args[split + 1 :]

    def best(paths):
        agg: dict = {}
        for p in paths:
            for k, v in json.load(open(p))["secs"].items():
                agg.setdefault(k, []).append(v)
        return agg

    b, a = best(before), best(after)
    print(f"{'query':32s} {'before(best/all)':>28s} {'after(best/all)':>28s}  ratio")
    for k in b:
        bb, aa = min(b[k]), min(a.get(k, [float('nan')]))
        print(
            f"{k:32s} {bb:8.2f} {str(b[k]):>19s} {aa:8.2f} "
            f"{str(a.get(k)):>19s}  {aa / bb:5.2f}x"
        )


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_side(sys.argv[2], sys.argv[3], sys.argv[4:])
    else:
        report(sys.argv[2:])
