"""r17 adjudication of the driver's r16 post-close bench flags
(VERDICT r16 #2): flagship_partitioned read 1.57x and
embed_cosine_topk 1.38x their frozen BASELINE_RATIO ratios in the
driver's r16 bench — untouched code, byte-identical plans, on a run
whose own control (pricing_summary) drifted 1.39x, so almost
certainly environmental; the standing rule says flags past 1.35x get
an interleaved code-identical control before being dismissed.
Neither query was touched by any r16/r17 commit, so the current tree
is the old-code control.

Method — the r15-amended design (ADJUDICATE_r15_close.json finding:
wide interleaves measure COLD-START, not steady-state):
1. narrow interleave, <=4 query legs: N_ROUNDS rounds of
   [probe, q1..q4] in one process at sf0.1, min basis;
2. warm-consecutive control: per query, N_WARM back-to-back reps
   AFTER the interleave (same process, caches cleared between reps),
   min basis against the SAME probe minimum.
Verdict: in-band if EITHER control's min(q)/min(probe) is within
TOL x frozen (the r15 precedent: dedup_ngram_jaccard / sessionize
read 1.8x interleaved but 1.09/1.06 warm).

ADVICE r15 #3: frozen ratios load from BASELINE_RATIO.json at
runtime — no hand-copied literals to go stale on a re-freeze; the
flagged names are asserted to exist there.

Usage: PYTHONPATH=/root/repo python tools/adjudicate_r17.py
Writes /tmp/adjudicate_r17.json; copy to ADJUDICATE_r17.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

PROBE = "pricing_summary"
TOL = 1.35
N_ROUNDS = int(os.environ.get("N_ROUNDS", "6"))
N_WARM = int(os.environ.get("N_WARM", "4"))

# which driver record flagged each query, for provenance only — the
# frozen ratios themselves come from BASELINE_RATIO.json at runtime
FLAGGED_ON = {
    "flagship_partitioned": "BENCH_r16 1.57x vs frozen",
    "embed_cosine_topk": "BENCH_r16 1.38x vs frozen",
}


def load_frozen() -> dict[str, float]:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_RATIO.json",
    )
    d = json.load(open(path))
    table = {**d["ratio_to_probe"], **d["extra_ratio_to_probe"]}
    missing = [n for n in FLAGGED_ON if n not in table]
    assert not missing, f"flagged names not in BASELINE_RATIO.json: {missing}"
    return {n: float(table[n]) for n in FLAGGED_ON}


def main() -> None:
    frozen = load_frozen()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-adjudicate-r17")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def t(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # JVM/Arrow warmup outside the measured window
    qs["wateryear_rollup"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from tools.drift import py_probe

    names = list(FLAGGED_ON)
    inter: dict[str, list[float]] = {PROBE: [], **{n: [] for n in names}}
    py_probes: list[float] = []
    for r in range(N_ROUNDS):
        py_probes.append(py_probe())
        inter[PROBE].append(t(PROBE))
        for n in names:
            inter[n].append(t(n))
        print(
            json.dumps(
                {"round": r, **{k: round(v[-1], 3) for k, v in inter.items()}}
            ),
            flush=True,
        )

    warm: dict[str, list[float]] = {}
    for n in names:
        warm[n] = [t(n) for _ in range(N_WARM)]
        print(json.dumps({"warm": n, "sec": [round(x, 3) for x in warm[n]]}),
              flush=True)
    # probe re-read after the warm block so late drift is visible
    warm_probe = [t(PROBE) for _ in range(3)]

    probe_min = min(min(inter[PROBE]), min(warm_probe))
    out: dict = {
        "_provenance": (
            "r17 adjudication of the driver's r16 post-close flags "
            "(flagship_partitioned 1.57x / embed_cosine_topk 1.38x vs "
            f"frozen; see module docstring). Narrow interleave x {N_ROUNDS} "
            f"(2 query legs) + {N_WARM} warm-consecutive reps per query at "
            "sf0.1, min basis; both legs code-identical to their frozen "
            "round, so this run is the old-code control."
        ),
        "probe_min": round(probe_min, 3),
        "probe_rounds": [round(x, 3) for x in inter[PROBE]],
        "probe_after_warm": [round(x, 3) for x in warm_probe],
        "py_probe_per_round": py_probes,
        "queries": {},
    }
    n_elevated = 0
    for n in names:
        ratio_i = min(inter[n]) / probe_min
        ratio_w = min(warm[n]) / probe_min
        rel_i = ratio_i / frozen[n]
        rel_w = ratio_w / frozen[n]
        ok = rel_i <= TOL or rel_w <= TOL
        if not ok:
            n_elevated += 1
        out["queries"][n] = {
            "interleaved_sec": [round(x, 3) for x in inter[n]],
            "warm_sec": [round(x, 3) for x in warm[n]],
            "ratio_interleaved": round(ratio_i, 3),
            "ratio_warm": round(ratio_w, 3),
            "frozen": frozen[n],
            "flagged_on": FLAGGED_ON[n],
            "rel_interleaved": round(rel_i, 2),
            "rel_warm": round(rel_w, 2),
            "verdict": "in-band (flag = host variance)"
            if ok
            else "ELEVATED on both controls — fix or re-freeze",
        }
        print(json.dumps({n: out["queries"][n]}), flush=True)
    out["n_elevated"] = n_elevated

    with open("/tmp/adjudicate_r17.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
