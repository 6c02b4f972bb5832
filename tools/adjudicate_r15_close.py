"""Close-of-round adjudication for the r15 LOCAL flag union. The two
closing local records were taken under visibly swinging host
throughput (probe brackets 1.656->1.30, 1.593->1.456 within single
runs; 15-min load average 3.35 draining to 0.16 between them;
py_probe flat 0.62-0.67 throughout) and flag DISJOINT query sets:

- BENCH_LOCAL_r15.txt (degraded): embed_cosine_topk 2.31x (past the
  2x ceiling), dedup_minhash_lsh 2.00, sessionize 1.87, dedup_exact
  1.82, dedup_ngram_jaccard 1.82, dedup_simhash 1.82
- BENCH_LOCAL_r15b.txt: dedup_keep_richest 1.69, gapfill_spine 1.61,
  sessionize 1.60, top_revenue 1.49, lag_spike_qc 1.39; extras
  multimodal_gif_pixels 1.37

None of these queries was touched by any r15 commit (the round's code
changes — span-removal fusion, oov null-id filter, charlm cache
opt-in, BPE hybrid — all measure in-band or improved on every
record), so the current tree is the old-code control for every leg.
Method: the standing interleaved design — N_ROUNDS rounds of
[probe, q1..qk] in one process at sf0.1, min basis, verdict =
min(q)/min(probe) vs the frozen ratio at TOL 1.35.

Usage: PYTHONPATH=/root/repo python tools/adjudicate_r15_close.py
Writes /tmp/adjudicate_r15_close.json; copy to ADJUDICATE_r15_close.json.
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

# frozen ratio_to_probe from BASELINE_RATIO.json; flagged_on records
# which closing record produced each flag
FROZEN = {
    "embed_cosine_topk": (0.238, "r15-degraded 2.31x"),
    "dedup_minhash_lsh": (0.722, "r15-degraded 2.00x"),
    "sessionize": (0.252, "both 1.87x/1.60x"),
    "dedup_exact": (0.169, "r15-degraded 1.82x"),
    "dedup_ngram_jaccard": (1.003, "r15-degraded 1.82x"),
    "dedup_simhash": (0.664, "r15-degraded 1.82x"),
    "dedup_keep_richest": (0.285, "r15b 1.69x (r14: closed environmental)"),
    "gapfill_spine": (0.215, "r15b 1.61x"),
    "top_revenue": (0.873, "r15b 1.49x"),
    "lag_spike_qc": (0.241, "r15b 1.39x"),
    "multimodal_gif_pixels": (0.682, "r15b extras 1.37x"),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-adjudicate-r15-close")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def t_df(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def t(name: str) -> float:
        spark.catalog.clearCache()
        return t_df(qs[name](spark, sf_dir))

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
            "r15 close-of-round adjudication of the local flag union "
            f"(see module docstring). Interleaved x {N_ROUNDS} at sf0.1, "
            "min basis; every leg code-identical to its frozen round, so "
            "this run is the old-code control for all of them."
        ),
        "probe_min": round(probe_min, 3),
        "probe_rounds": [round(x, 3) for x in times[PROBE]],
        "py_probe_per_round": py_probes,
        "queries": {},
    }
    n_elevated = 0
    for n in names:
        frozen, flagged_on = FROZEN[n]
        ratio = min(times[n]) / probe_min
        rel = ratio / frozen
        if rel > TOL:
            n_elevated += 1
        out["queries"][n] = {
            "min_sec": round(min(times[n]), 3),
            "all_sec": [round(x, 3) for x in times[n]],
            "ratio_to_probe": round(ratio, 3),
            "frozen": frozen,
            "flagged_on": flagged_on,
            "rel": round(rel, 2),
            "verdict": "in-band (flag = host variance)"
            if rel <= TOL
            else "ELEVATED on interleaved control",
        }
        print(json.dumps({n: out["queries"][n]}), flush=True)
    out["n_elevated"] = n_elevated

    with open("/tmp/adjudicate_r15_close.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
