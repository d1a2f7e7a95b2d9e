"""Isolated A/B for the r8 bench-cohort drift (VERDICT r8 ask #1).

The r8 shared-cohort bench ran 1.24x slower than r7 with seven queries
past the pinned 1.3x noise bar.  The drift was spread across queries
whose code did not change (tpch_q5 1.39x), which smells like session
noise — the r6->r7 simhash precedent — but the protocol demands proof:
run each suspect query in an ISOLATED fashion against BOTH code trees
(the r7 tip in a git worktree vs the current tree), alternating sides so
neither inherits a systematically warmer machine, and md5-compare the
normalized physical plans.

Usage:
    python tools/ab_drift.py run  <repo_path> <out_json>   # one side, one pass
    (the driver loop in tools/ab_drift.sh alternates sides)

Each `run` starts a FRESH local[32] session in a fresh process, noop-
writes every sf0.1 table as warm-up (the bench.py protocol), then times
one noop-write materialization per query and captures the normalized
physical plan.  Best-of / distribution analysis happens offline in
PLANS.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

QUERIES = [
    "lsh_topk",
    "ivf_trained_topk",
    "ivf_persisted_topk",
    "kmeans_train_assign",
    "bm25_topk",
    "range_join_count",
    "inverted_index",
    "tpch_q5",  # control: pure-JVM, code unchanged r7->r9
]


def _norm_plan(plan: str) -> str:
    """Mask run-varying ids so plans from different sessions compare:
    expression ids (#123, #123L), plan ids, exchange/subquery ids, and
    temp-view/file-path noise."""
    p = re.sub(r"#\d+", "#N", plan)
    p = re.sub(r"plan_id=\d+", "plan_id=N", p)
    p = re.sub(r"\[id=#?N?\d*\]", "[id=N]", p)
    p = re.sub(r"Exchange.*?\[plan", "Exchange [plan", p)
    p = re.sub(r"file:[^\],\s]+", "file:PATH", p)
    p = re.sub(r"subquery#?\w*", "subquery", p)
    p = re.sub(r"cachedrdd-\d+", "cachedrdd-N", p)
    p = re.sub(r"0x[0-9a-f]+", "0xN", p)
    return p


def run_side(repo: str, out_json: str) -> None:
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from arrow_udf_spark import get_spark
    from arrow_udf_spark.queries import QUERIES as CATALOG

    spark = get_spark("ab_drift")
    spark.sparkContext.setLogLevel("ERROR")

    import glob

    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    out: dict = {"repo": repo, "secs": {}, "plan_md5": {}}
    for name in QUERIES:
        df = CATALOG[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out["plan_md5"][name] = hashlib.md5(
            _norm_plan(plan).encode()
        ).hexdigest()
        t0 = time.perf_counter()
        CATALOG[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out["secs"][name] = round(time.perf_counter() - t0, 3)
    with open(out_json, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_side(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit("usage: ab_drift.py run <repo> <out_json>")
