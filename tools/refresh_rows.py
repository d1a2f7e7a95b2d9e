"""Refresh the replica-sweep + plan-lint artifact rows for a FEW changed
queries (the verify-skill single-query path): run the strict oracle
compare at each of the three checked-in configs, assert PASS, merge the
rows into the LOCAL_VERIFY_r10*.json artifacts, and re-lint the plans
into PLANLINT_r10.json.

Usage::

    python tools/refresh_rows.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    ("LOCAL_VERIFY_r10.json", "/root/testdata/sf0.01", "local[8]", "32"),
    ("LOCAL_VERIFY_r10_sf01.json", "/root/testdata/sf0.1", "local[8]", "32"),
    ("LOCAL_VERIFY_r10_var5.json", "/root/testdata/sf0.001", "local[5]", "5"),
]


def main() -> int:
    names = sys.argv[1:]
    assert names
    rc = 0
    for artifact, sf_dir, master, shuf in CONFIGS:
        env = dict(
            os.environ,
            SPARK_GRAFT_ORACLE_MASTER=master,
            SPARK_GRAFT_CPUS=shuf,
        )
        out = f"/tmp/refresh_{os.path.basename(artifact)}"
        p = subprocess.run(
            [sys.executable, "tools/oracle_check.py", "--record", out, sf_dir]
            + names,
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
        )
        rows = json.load(open(out))
        full = json.load(open(os.path.join(REPO, artifact)))
        ok = True
        for n in names:
            row = rows.get(n)
            if not row or not row.get("pass"):
                ok = False
                rc = 1
                print(f"{artifact}: {n} FAILED: {row} :: {p.stdout[-500:]}")
            else:
                full[n] = row
        if ok:
            with open(os.path.join(REPO, artifact), "w") as fh:
                json.dump(full, fh, indent=1, sort_keys=True)
            print(f"{artifact}: merged {len(names)} PASS rows ({sf_dir} {master})")
    # plan lint rows
    out = "/tmp/refresh_planlint.json"
    p = subprocess.run(
        [sys.executable, "tools/plan_lint.py", "--record", out] + names,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    rows = json.load(open(out))
    full = json.load(open(os.path.join(REPO, "PLANLINT_r10.json")))
    for n in names:
        row = rows.get(n)
        if row is None:
            rc = 1
            print(f"PLANLINT: no row for {n}: {p.stdout[-300:]}")
            continue
        flags = row.get("flags") if isinstance(row, dict) else row
        if flags:
            rc = 1
            print(f"PLANLINT: {n} FLAGGED: {row}")
        full[n] = row
    if rc == 0:
        with open(os.path.join(REPO, "PLANLINT_r10.json"), "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
        print(f"PLANLINT_r10.json: merged {len(names)} clean rows")
    return rc


if __name__ == "__main__":
    sys.exit(main())
