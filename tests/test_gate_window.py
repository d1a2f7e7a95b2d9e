"""Guard the driver-gate window: the first 50 catalog entries must cover
every query that has never received a driver CORRECTNESS row (the driver
samples ~50 per round in dict order — a rotation mistake would leave an
operator permanently unverified), and every query whose proof has gone
stale must have fresh evidence from SOMEWHERE — the window or the
checked-in local-replica artifact."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_rounds() -> tuple[dict[str, int], int]:
    """(query -> latest round with a PASSING evidence row, max round seen).

    Evidence sources, both per-round checked-in artifacts:
    - ``CORRECTNESS_r{N}.json`` — the driver's own gate (rows+schema+hash);
    - ``LOCAL_VERIFY_r{N}.json`` — the strict local DuckDB replica sweep
      (tools/oracle_check.py --record), which covers the ~100 queries the
      50-slot driver window cannot fit each round.  Only ``pass: true``
      rows count; the artifact is evidence, not an allowlist (ADVICE r5:
      exemptions must be checked-in artifacts, never test comments).
    """
    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        max_round = max(max_round, rnd)
        with open(path) as f:
            recorded = json.load(f)
        for k, v in recorded.items():
            if isinstance(v, dict) and v.get("hash_match") and v.get("rows_match"):
                latest[k] = max(latest.get(k, 0), rnd)
    for path in sorted(glob.glob(os.path.join(REPO, "LOCAL_VERIFY_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        # a replica run does NOT advance max_round: staleness is measured
        # against the driver's cadence, the replica only refreshes proofs
        with open(path) as f:
            recorded = json.load(f)
        for k, v in recorded.items():
            if k != "__meta__" and isinstance(v, dict) and v.get("pass"):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest, max_round


def test_first_50_covers_all_never_gated_queries():
    from arrow_udf_spark.queries import ORACLE, QUERIES

    gated: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            recorded = json.load(f)
        # only rows that actually passed count as verified
        gated |= {
            k
            for k, v in recorded.items()
            if isinstance(v, dict) and v.get("hash_match") and v.get("rows_match")
        }
    names = list(QUERIES)
    window = set(names[:50])
    never = [n for n in names if n not in gated]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-driver-gated queries outside the first-50 window: {missing}"
    )
    # every catalog entry stays oracle-paired (a rows-only check is weaker)
    assert set(names) == set(ORACLE)


def test_stale_queries_sit_in_window_or_have_replica_proof():
    """Staleness invariant (VERDICT r4/r5): a query whose most recent
    passing evidence — driver row OR local-replica artifact row — is >= 2
    rounds old must sit inside the gate window so its proof refreshes.
    154+ queries cannot cycle through a 50-slot window every 2 rounds, so
    the replica sweep (LOCAL_VERIFY_r{N}.json) is the designed steady
    state for the overflow; this test fails when a round forgets BOTH."""
    from arrow_udf_spark.queries import QUERIES

    latest, max_round = _latest_rounds()
    names = list(QUERIES)
    window = set(names[:50])
    stale = [
        n
        for n in names
        if n in latest and latest[n] <= max_round - 2 and n not in window
    ]
    assert not stale, (
        f"queries whose latest evidence (driver or replica) is >=2 rounds "
        f"old sit outside the first-50 gate window: {stale}"
    )


def test_current_round_replica_artifact_is_green():
    """If this round's replica artifact exists it must be all-pass — a
    committed artifact with failures means a query regressed locally and
    was shipped anyway."""
    latest, max_round = _latest_rounds()
    path = os.path.join(REPO, f"LOCAL_VERIFY_r{max_round + 1:02d}.json")
    if not os.path.exists(path):
        return  # sweep not yet run this round; staleness test governs
    with open(path) as f:
        recorded = json.load(f)
    bad = sorted(
        k
        for k, v in recorded.items()
        if k != "__meta__" and isinstance(v, dict) and not v.get("pass")
    )
    assert not bad, f"replica artifact {path} records failures: {bad}"
