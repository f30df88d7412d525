"""Never-driver-attested audit: recompute the set VERDICT r12 tracks —
every registered gate or suite member that has NO full-green driver row
in any CORRECTNESS_r*.json, with suite members inheriting their suite's
green rows ONLY for rounds in which the suite actually contained them
(ADVICE r13: inheriting CURRENT membership to historical rows would let
a member folded in at round N ride a pre-fold green row it never ran
under). Per-round membership lives in suite_membership_history.json —
a {round: {suite: [members]}} snapshot extracted from git (r9-r13) and
appended each round via `--snapshot N` as part of the window-change
commit. A round with no snapshot falls back to the NEAREST EARLIER one
(membership only grows between snapshots, so the fallback under-inherits
— conservative for an audit). Also projects the set AFTER a
hypothetically green current GATE_WINDOW (current SUITE_PLAN — that is
the membership the next driver run will execute), which is what the
window design must drive to zero.

Usage:  python3 tools/never_attested.py
        python3 tools/never_attested.py --snapshot 14   # record current
            SUITE_PLAN as round 14's membership, then run the audit
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "suite_membership_history.json")


def _load_history() -> dict[int, dict[str, list[str]]]:
    with open(HISTORY) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def _plan_at_round(history: dict[int, dict[str, list[str]]], rnd: int):
    """The membership snapshot for round `rnd`, or the nearest earlier
    snapshot (conservative), or empty for pre-suite rounds (r1-r8)."""
    candidates = [r for r in history if r <= rnd]
    if not candidates:
        return {}
    return history[max(candidates)]


def main() -> None:
    from pdf_brain_spark.queries import CONSOLIDATED, GATE_WINDOW, QUERIES
    from pdf_brain_spark.suites import SUITE_PLAN

    if "--snapshot" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--snapshot") + 1])
        history = _load_history()
        current = {s: list(ms) for s, ms in SUITE_PLAN.items()}
        # ADVICE r14: a typo'd round number would silently rewrite an
        # archived round's membership and retroactively change which
        # members inherit its green suite rows — refuse a DIFFERING
        # overwrite unless --force is passed (identical re-snapshot is
        # a harmless no-op and stays allowed)
        if rnd in history and history[rnd] != current and "--force" not in sys.argv:
            print(f"refusing to overwrite round {rnd}'s existing membership "
                  f"snapshot with DIFFERENT content — that rewrites "
                  f"attestation history; pass --force only if round {rnd} "
                  f"is genuinely being re-recorded")
            sys.exit(2)
        history[rnd] = current
        with open(HISTORY, "w") as f:
            json.dump({str(k): v for k, v in sorted(history.items())},
                      f, indent=1, sort_keys=True)
        print(f"snapshotted current SUITE_PLAN as round {rnd}")

    history = _load_history()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    attested: set[str] = set()
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1))
        plan = _plan_at_round(history, rnd)
        for name, row in json.load(open(f)).items():
            if isinstance(row, dict) and all(
                row.get(k) for k in ("rows_match", "schema_match", "hash_match")
            ):
                attested.add(name)
                if name in plan:
                    attested.update(plan[name])
    surfaces = set(QUERIES) | set(CONSOLIDATED)
    never = sorted(surfaces - attested)
    print(f"surfaces: {len(surfaces)}  attested: {len(surfaces) - len(never)}")
    print(f"never-driver-attested now: {len(never)}")
    for n in never:
        print(" ", n)
    # projection: the NEXT driver run executes current SUITE_PLAN, so the
    # hypothetical-green pass inherits current membership by construction
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
