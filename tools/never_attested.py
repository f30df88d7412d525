"""Never-driver-attested audit: recompute the set VERDICT r12 tracks —
every registered gate or suite member that has NO full-green driver row
in any CORRECTNESS_r*.json, with suite members inheriting their suite's
green rows (current SUITE_PLAN membership, the way the judge computes
it). Also projects the set AFTER a hypothetically green current
GATE_WINDOW, which is what the window design must drive to zero.

Usage:  python3 tools/never_attested.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pdf_brain_spark.queries import CONSOLIDATED, GATE_WINDOW, QUERIES
    from pdf_brain_spark.suites import SUITE_PLAN

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    attested: set[str] = set()
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            if isinstance(row, dict) and all(
                row.get(k) for k in ("rows_match", "schema_match", "hash_match")
            ):
                attested.add(name)
                if name in SUITE_PLAN:
                    attested.update(SUITE_PLAN[name])
    surfaces = set(QUERIES) | set(CONSOLIDATED)
    never = sorted(surfaces - attested)
    print(f"surfaces: {len(surfaces)}  attested: {len(surfaces) - len(never)}")
    print(f"never-driver-attested now: {len(never)}")
    for n in never:
        print(" ", n)
    after = set(attested)
    for name in GATE_WINDOW:
        after.add(name)
        if name in SUITE_PLAN:
            after.update(SUITE_PLAN[name])
    never_after = sorted(surfaces - after)
    print(f"never-attested after a green current window: {len(never_after)}")
    for n in never_after:
        print(" ", n)
    sys.exit(1 if never_after else 0)


if __name__ == "__main__":
    main()
