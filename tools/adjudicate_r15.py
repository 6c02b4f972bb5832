"""Adjudicate the r15 flag set: the 2 extras from the driver's
r14-close BENCH_extra.json (`variant_props_extract` 1.39x,
`multimodal_wav_features` 1.39x) plus the 2 headline flags from the
degraded-phase BENCH_LOCAL_r15a record (`flagship_partitioned` 1.39x,
`pricing_summary` 1.36x) — all past the 1.35x noise band, all under
the 2x acceptance ceiling.

pricing_summary needs a note: it IS the drift probe, so its "ratio"
in a bench record is phase-min / bracket-mean — it can only flag when
the box speed CHANGES during the run (r15a: pre-probe 1.656, post
1.3, a recovering box), never from a code change (zero commits since
r6). The interleaved design adjudicates it by construction: the probe
is measured in the same rounds as the queries, so we record its
absolute per-round mins plus the pure-CPython py_probe as an
independent box-speed witness instead of a vacuous pricing/pricing=1.

Method (DECISIONS r9s3 standing rule: cross-phase totals are weather;
only interleaved same-process measurements adjudicate): N_ROUNDS
interleaved rounds of [probe, q1, q2] at sf0.1 where the probe is
`pricing_summary` (code-frozen since r6). Verdict compares
min(query)/min(probe) to the frozen ratio; rel <= 1.35 == the driver
flag was box drift, rel > 1.35 == real, go fix.

Neither query was touched by any commit since its last in-band
record: variant_props dates from r7 and is unchanged since; wav.py's
last change was r13's G.711 branch (PCM hot path untouched — the
testdata fixtures are PCM) and BOTH ran in-band on every record from
the r13 close through BENCH_LOCAL_r14b (git log verified). So the
CURRENT tree is the old-code control: a reproduced in-band
ratio means the driver's elevation was host variance, exactly the
ADJUDICATE_r13/r14 pattern (Python-worker-pool-heavy queries degrade
more under box steal than the pure-JVM probe; wav_features is
mapInPandas-heavy, variant_props is a JSON-path projection whose
absolute time is ~0.4 s — small denominators amplify noise). Prior
evidence the same direction: the r14 calm-box local record
(BENCH_LOCAL_r14b.txt) measured variant 0.247 and wav 0.275 — BELOW
their frozen 0.271 / 0.306.

Usage: PYTHONPATH=/root/repo python tools/adjudicate_r15.py
Writes /tmp/adjudicate_r15.json; copy to ADJUDICATE_r15.json on accept.
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

# frozen ratio_to_probe from BASELINE_RATIO.json (the side bench_diff
# flagged against) and the driver's flagged values for context
FROZEN = {
    "variant_props_extract": 0.271,
    "multimodal_wav_features": 0.306,
    "flagship_partitioned": 0.412,
}
DRIVER_FLAGGED = {
    "variant_props_extract": 0.377,   # driver r14-close BENCH_extra
    "multimodal_wav_features": 0.425,  # driver r14-close BENCH_extra
    "flagship_partitioned": 0.574,     # BENCH_LOCAL_r15a (local)
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-adjudicate-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def t_df(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def t(name: str) -> float:
        spark.catalog.clearCache()
        return t_df(qs[name](spark, sf_dir))

    # warm exactly like bench.py: one JVM query + one Python-worker op
    qs["wateryear_rollup"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from tools.drift import py_probe

    names = list(FROZEN)
    times: dict[str, list[float]] = {PROBE: [], **{n: [] for n in names}}
    py_probes: list[float] = []
    for r in range(N_ROUNDS):
        py_probes.append(py_probe())
        times[PROBE].append(t(PROBE))
        for n in names:
            times[n].append(t(n))
        print(
            json.dumps({"round": r, **{k: round(v[-1], 3) for k, v in times.items()}}),
            flush=True,
        )

    probe_min = min(times[PROBE])
    out: dict = {
        "_provenance": (
            "r15 adjudication of the 2 extras bench_diff flagged on the "
            "driver's r14-close BENCH_extra.json (both 1.39x, under the 2x "
            f"ceiling). Interleaved [probe, q1, q2] x {N_ROUNDS} at sf0.1, "
            "min basis. Both legs are code-identical to their frozen "
            "rounds (no commit touches either plan), so this run is their "
            "old-code control."
        ),
        "probe_min": round(probe_min, 3),
        "probe_rounds": [round(x, 3) for x in times[PROBE]],
        "py_probe_per_round": py_probes,
        "pricing_summary_note": (
            "probe flag on r15a = phase-min/bracket-mean on a recovering "
            "box (pre 1.656, post 1.3); interleaved rounds adjudicate it "
            "by construction — see probe_rounds stability vs py_probe"
        ),
        "queries": {},
    }
    for n in names:
        ratio = min(times[n]) / probe_min
        out["queries"][n] = {
            "min_sec": round(min(times[n]), 3),
            "ratio_to_probe": round(ratio, 3),
            "frozen": FROZEN[n],
            "driver_flagged_ratio": DRIVER_FLAGGED[n],
            "rel": round(ratio / FROZEN[n], 2),
            "verdict": "in-band (driver flag = host variance)"
            if ratio / FROZEN[n] <= TOL
            else "ELEVATED — real, fix or re-freeze",
        }
        print(json.dumps({n: out["queries"][n]}), flush=True)

    with open("/tmp/adjudicate_r15.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
