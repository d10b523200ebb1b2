"""Maintain QUERY_FINGERPRINTS.json — the ledger that ties each
driver-green CORRECTNESS row to the implementation it validated.

Run at ROUND START, before editing any query: at that moment the
working tree is exactly what the driver evaluated, so for every query
with a hash-green row in the NEWEST artifact we (re)record the current
fingerprint. Entries for queries green only in older artifacts are kept
untouched; queries later edited diverge from their recorded fingerprint
and rotate back into the evaluation window (see
queries.rotate_by_correctness).

To force re-validation of a query whose behavior changed through a
helper (fingerprints only see the registered function's own source),
delete its entry: a green row without a matching entry does not count.

Usage: PYTHONPATH=. python tools/record_fingerprints.py [--drop name ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from postgres_es_cdc_spark.queries import query_fingerprint  # noqa: E402
from postgres_es_cdc_spark import queries as Q  # noqa: E402


def main() -> None:
    drop = set()
    if "--drop" in sys.argv:
        drop = set(sys.argv[sys.argv.index("--drop") + 1:])
    # --rebase: re-value EVERY existing ledger entry under the current
    # fingerprint definition/tree. Needed exactly once when the
    # definition changes (r14: fingerprints now include the transitive
    # helper-module closure), asserting "the current tree is the
    # driver-validated baseline"; queries whose helpers were rewritten
    # without driver re-verification must be re-validated via --drop.
    rebase = "--rebase" in sys.argv

    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not arts:
        print("no CORRECTNESS artifacts; nothing to record")
        return
    with open(arts[-1]) as f:
        newest = json.load(f)
    newest_green = {n for n, row in newest.items()
                    if isinstance(row, dict) and row.get("hash_match") is True}

    path = os.path.join(REPO, "QUERY_FINGERPRINTS.json")
    try:
        with open(path) as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        ledger = {}

    # Unrotated specs: build from the raw registry modules via the
    # public REGISTRY (rotation reorders, never renames).
    if rebase:
        for name in list(ledger):
            spec = Q.REGISTRY.get(name)
            if spec is not None:
                ledger[name] = query_fingerprint(spec)
    for name in newest_green:
        spec = Q.REGISTRY.get(name)
        if spec is not None:
            ledger[name] = query_fingerprint(spec)
    for name in drop:
        ledger.pop(name, None)

    with open(path, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
    print(f"recorded {len(newest_green)} from {os.path.basename(arts[-1])}, "
          f"dropped {sorted(drop)}; ledger now {len(ledger)} entries")

    # Fail loudly if unverified queries overflow the driver's 50-row
    # evaluation window (round 4 silently overflowed by one; a prose
    # note is not a gate).
    unverified = [n for n in Q.REGISTRY
                  if n not in ledger
                  or query_fingerprint(Q.REGISTRY[n]) != ledger[n]]
    print(f"unverified (window candidates): {len(unverified)}")
    assert len(unverified) <= 50, (
        f"driver window OVERFLOW: {len(unverified)} > 50 unverified; "
        f"overflowing tail: {unverified[50:]}")


if __name__ == "__main__":
    main()
