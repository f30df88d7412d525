"""Freeze-to-freeze bench comparison with class-matched probe deflation
(VERDICT r13 item 2): for every shared key, the raw median ratio
new/old is divided by the SAME round-pair ratio of the key's own
workload-class calibration probe (bench.py::PROBE_CLASS) — so machine
drift, which r12->r13 showed to be asymmetric across workload classes
(I/O probes 1.2-1.6x while CPU probes ran 0.7-1.1x), cancels per class
instead of being smeared by a single all-probe median.

Usage:
    python3 tools/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json
    python3 tools/bench_compare.py <rev>:BENCH_DETAIL.json NEW.json
        (git-show specs accepted for either side, e.g. the r13 frozen
         sample lives at 43856ff:BENCH_DETAIL.json)
    ... --probe-rule=artifact|min2|median3
        Probe-value rule applied to BOTH sides when computing the
        per-class probe ratios (r16, VERDICT r15 item 3 — the probes
        moved from min-of-2 to 4-sample/median-of-last-3 at the r15/r16
        boundary, so a cross-boundary pair mixes rules unless one is
        forced). `artifact` (default) uses each side's calibration dict
        as recorded; `min2` recomputes min of the FIRST 2 samples from
        calibration_samples (the ≤r15 rule — exact on ≤r15 artifacts,
        rule-matched on r16+); `median3` recomputes median of the LAST
        3 samples (the r16+ rule; sides without ≥3 samples fall back to
        the recorded value, disclosed per probe).

Prints per-class probe ratios, the raw and class-matched median
ratios over shared keys, and the deflated mover table (keys above
MOVER_THRESHOLD after class-matched deflation) — the table CHANGES_rN
freezes verbatim. Exit code is 0 always (reporting tool, not a gate).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVER_THRESHOLD = 1.11  # same bar VERDICT r12/r13 applied


def _load(spec: str) -> dict:
    if ":" in spec and not os.path.exists(spec):
        rev, path = spec.split(":", 1)
        out = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             "show", f"{rev}:{path}"],
            capture_output=True, text=True, check=True,
        )
        return json.loads(out.stdout)
    with open(spec) as f:
        return json.load(f)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _probe_values(art: dict, rule: str) -> tuple[dict, list[str]]:
    """Per-probe values under `rule`, plus the probes that had to fall
    back to the artifact's recorded value (insufficient samples)."""
    cal = dict(art["calibration"])
    if rule == "artifact":
        return cal, []
    samples = art.get("calibration_samples") or {}
    out, fellback = {}, []
    for p, v in cal.items():
        ts = samples.get(p) or []
        if rule == "min2" and len(ts) >= 2:
            out[p] = min(ts[:2])
        elif rule == "median3" and len(ts) >= 3:
            out[p] = sorted(ts[-3:])[1]
        else:
            out[p] = v
            fellback.append(p)
    return out, fellback


def compare(old: dict, new: dict, probe_rule: str = "artifact") -> dict:
    from bench import PROBE_CLASS

    om, nm = old["queries_median"], new["queries_median"]
    oc, ofb = _probe_values(old, probe_rule)
    nc, nfb = _probe_values(new, probe_rule)
    shared = sorted(set(om) & set(nm))
    probe_ratio = {p: nc[p] / oc[p] for p in sorted(set(oc) & set(nc))}
    # probe class comes from the CURRENT instrument; fall back to the
    # old artifact's partial map, then to the all-probe median ratio.
    # A class probe that only exists on ONE side (e.g. parquet_scan_8m
    # introduced r14 — absent from r13 calibrations) also falls back to
    # the all-probe median for that pair; from the next round on both
    # sides carry it.
    all_probe_med = _median(list(probe_ratio.values()))
    rows = []
    for k in shared:
        if om[k] <= 0 or nm[k] <= 0:
            continue
        raw = nm[k] / om[k]
        cls = PROBE_CLASS.get(k) or (old.get("probe_class") or {}).get(k)
        if cls in probe_ratio:
            pr, deflator = probe_ratio[cls], cls
        else:
            pr, deflator = all_probe_med, "(fallback: all-probe median)"
        rows.append({
            "key": k, "old_med": om[k], "new_med": nm[k],
            "raw_ratio": round(raw, 3),
            "probe_class": cls,
            "deflator": deflator,
            "probe_ratio": round(pr, 3),
            "deflated_ratio": round(raw / pr, 3),
        })
    movers = sorted(
        (r for r in rows if r["deflated_ratio"] > MOVER_THRESHOLD),
        key=lambda r: -r["deflated_ratio"],
    )
    raw_med = _median([r["raw_ratio"] for r in rows])
    matched_med = _median([r["deflated_ratio"] for r in rows])
    # Instrument-reliability cross-check (r14, from the same-code
    # experiments on the three r13/r14 machine-state pairs): the probes
    # themselves carry cross-run variance, and when the per-class probe
    # ratios DISAGREE with each other by a wide margin — or move
    # opposite to the raw key median on a pair where little code
    # changed — per-key deflation amplifies probe noise into phantom
    # movers rather than removing machine drift. Flag those pairs so
    # the mover table is read next to the raw medians instead of alone.
    spread = (max(probe_ratio.values()) / min(probe_ratio.values())
              if probe_ratio else 1.0)
    warnings = []
    if spread > 1.3:
        warnings.append(
            f"probe-class ratios disagree by {round(spread, 2)}x across "
            "classes — class deflation is low-confidence for this pair; "
            "read movers against raw ratios and samples_sec"
        )
    if probe_ratio and (raw_med - 1.0) * (all_probe_med - 1.0) < 0:
        warnings.append(
            "probe drift and raw key drift point in OPPOSITE directions "
            "— the probes did not track this machine pair; prefer the "
            "raw median over the matched median here"
        )
    return {
        "n_shared_keys": len(rows),
        "probe_rule": probe_rule,
        "probe_rule_fallbacks": {"old": ofb, "new": nfb},
        "probe_ratio_by_class": {p: round(v, 3) for p, v in probe_ratio.items()},
        "probe_ratio_all_median": round(all_probe_med, 3),
        "probe_ratio_spread": round(spread, 3),
        "raw_median_ratio": round(raw_med, 3),
        "matched_median_ratio": round(matched_med, 3),
        "reliability_warnings": warnings,
        "mover_threshold": MOVER_THRESHOLD,
        "deflated_movers": movers,
        "per_key": rows,
    }


def main() -> None:
    probe_rule = "artifact"
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--probe-rule="):
            probe_rule = a.split("=", 1)[1]
            if probe_rule not in ("artifact", "min2", "median3"):
                raise SystemExit(f"unknown --probe-rule: {probe_rule}")
        else:
            argv.append(a)
    old, new = _load(argv[0]), _load(argv[1])
    rep = compare(old, new, probe_rule)
    # write the artifact BEFORE printing: a downstream `| head` closing
    # the pipe must not lose the JSON
    path = os.environ.get("BENCH_COMPARE_OUT")
    if path:
        with open(path, "w") as f:
            f.write(json.dumps(rep, indent=1))
    print(f"shared keys: {rep['n_shared_keys']}")
    print(f"probe rule: {rep['probe_rule']}"
          + (f" (fallbacks: {rep['probe_rule_fallbacks']})"
             if rep["probe_rule_fallbacks"]["old"] or rep["probe_rule_fallbacks"]["new"]
             else ""))
    print("probe ratios (new/old):")
    for p, v in rep["probe_ratio_by_class"].items():
        print(f"  {p}: {v}")
    print(f"raw median ratio:      {rep['raw_median_ratio']}")
    print(f"class-matched median:  {rep['matched_median_ratio']}")
    for w in rep["reliability_warnings"]:
        print(f"WARNING: {w}")
    print(f"deflated movers (> {MOVER_THRESHOLD}):")
    if not rep["deflated_movers"]:
        print("  (none)")
    for r in rep["deflated_movers"]:
        print(f"  {r['key']}: raw {r['raw_ratio']} / {r['deflator']} "
              f"{r['probe_ratio']} -> {r['deflated_ratio']}")
    if path:
        print(f"wrote {path}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass
