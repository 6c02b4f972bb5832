"""Cross-round bench triage as a diff (VERDICT r10 #4 follow-through):
compare per-query `ratio_to_probe` between two bench records and flag
anything past the adjudication tolerance.

The ratio (min(query) / probe-bracket-mean) is the drift-cancelled
number the adjudicator decides on — diffing it across rounds replaces
the manual ratio-test runs for first-pass triage. Queries flagged here
(rel > TOL, the same 1.35x sub-second-noise bound
tools/adjudicate_r10.py uses) still get the interleaved ratio test
before being called regressions; everything under it is noise by the
measured band.

Accepts either record shape:
- the driver's BENCH_r{N}.json ({"parsed": {...}}),
- bench.py's own stdout line / BENCH_LOCAL_r{N}.txt (last JSON line),
- BENCH_extra.json sidecars (pass --extra old new).

Older records without ratio_to_probe fields fall back to
queries[k] / drift_probe (same quantity, single-probe precision).

Usage:
  python tools/bench_diff.py BENCH_r10.json BENCH_r11.json
  python tools/bench_diff.py --extra old_extra.json BENCH_extra.json
"""

from __future__ import annotations

import json
import sys

TOL = 1.35

# DECISIONS r15: queries whose ABSOLUTE cost is flat across rounds
# while their probe-ratio swings with the denominator — a ratio flag
# on one of these is adjudicated against its absolute same-code band
# (ADJUDICATE_r15.json wav leg), not the ratio alone. Ratio flags
# still print; this annotates them with the controlling evidence.
FIXED_COST_NOTE = {
    "multimodal_wav_features": (
        "abs-min band 0.445-0.584 s across r11-r15; real signal is "
        "abs min > ~0.8 s, not the ratio"
    ),
    "variant_props_extract": (
        "~0.38-0.43 s absolute since r7; small denominator amplifies "
        "probe swings"
    ),
}


def load_record(path: str, extra: bool) -> dict:
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        lines = [l for l in text.splitlines() if l.startswith("{")]
        d = json.loads(lines[-1 if not extra else -2])
    if "parsed" in d:
        d = d["parsed"]
    if extra:
        if "extra_ratio_to_probe" in d:
            return d["extra_ratio_to_probe"]
        probe = d.get("drift_probe_extra") or 1.0
        return {k: v / probe for k, v in d.get("extra", {}).items()}
    if "ratio_to_probe" in d:
        return d["ratio_to_probe"]
    probe = d.get("drift_probe") or 1.0
    return {k: v / probe for k, v in d.get("queries", {}).items()}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--extra"]
    extra = "--extra" in sys.argv
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = (load_record(p, extra) for p in args)
    rows = []
    for k, v in new.items():
        if k in old and old[k] > 0:
            rows.append((v / old[k], k, old[k], v))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > TOL]
    print(f"{'query':30s} {'old':>8s} {'new':>8s} {'rel':>6s}")
    for rel, k, o, v in rows:
        mark = "  <-- ADJUDICATE" if rel > TOL else ""
        if rel > TOL and k in FIXED_COST_NOTE:
            mark += f"  [fixed-cost query — {FIXED_COST_NOTE[k]}]"
        print(f"{k:30s} {o:8.3f} {v:8.3f} {rel:6.2f}{mark}")
    fresh = sorted(set(new) - set(old))
    if fresh:
        print(f"new queries (no prior ratio): {', '.join(fresh)}")
    print(
        f"\n{len(flagged)} / {len(rows)} past TOL={TOL}"
        + (" — run the interleaved ratio test on those" if flagged else "")
    )
    return 0


if __name__ == "__main__":
    main()
