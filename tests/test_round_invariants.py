"""Round-boundary invariants, self-enforcing in CI (VERDICT r14 item 4).

tools/plan_audit.py and tools/never_attested.py used to run by
convention at the round boundary; these tests invoke each against its
committed baseline so a pin drift (a lost broadcast, a new global sort,
an accidental cross join) or an attestation hole fails pytest, not just
the round ritual. A DELIBERATE plan change therefore requires
`plan_audit.py --write-baseline` in the same commit to keep pytest
green — which is exactly the discipline the pinned-count registry test
enforces for registration counts.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(script: str, *args: str, timeout: int = 1200):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=ROOT,
    )


def test_never_attested_is_zero():
    """Every registered gate and every suite member holds (or inherits,
    round-aware) a full-green driver row, and a hypothetically green
    CURRENT window keeps it that way. Exit 1 = an attestation hole the
    window design must close before the round ships."""
    r = _run_tool("never_attested.py", timeout=300)
    assert r.returncode == 0, f"never_attested audit failed:\n{r.stdout}\n{r.stderr}"
    assert "never-driver-attested now: 0" in r.stdout


def test_plan_flags_match_pinned_baseline():
    """The per-gate plan-shape pins (cartesian / bnlj / single-partition
    exchange counts in tools/plan_flags.json) reproduce from the live
    registry at the baseline's own pin scale. Slow (~builds every gate's
    physical plan) but this IS the mechanical 100x-scale audit — a plan
    regression fails here instead of waiting for judge inspection."""
    with open(os.path.join(ROOT, "tools", "plan_flags.json")) as f:
        baseline = json.load(f)
    sf_dir = baseline.get("sf_dir", "/root/testdata/sf0.001")
    r = _run_tool("plan_audit.py", sf_dir)
    assert r.returncode == 0, f"plan audit failed:\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
    assert "PLAN AUDIT OK" in r.stdout
