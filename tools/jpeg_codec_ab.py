"""r17 A/B: JPEG codec per-doc cost (VERDICT r16 #6) — einsum->matmul
DCT (bit-identical; the einsum ran its greedy path planner per image),
memoized canonical Huffman encode tables, tolist() block access in the
entropy coder.

The change is Python-module-level, so legs cannot share a process
(executors import the codec from disk); instead each leg is a child
process pinned to one code era via PYTHONPATH (old = a pristine
r16-close worktree, new = the repo), interleaved old/new per round.
Each child starts its own Spark session, warms up, times N_RUNS noop
executions of multimodal_jpeg_pixels at sf0.1 and prints the samples;
the parent interleaves rounds and reports per-era minima. Identity is
not re-proven here (the codec A/B asserts byte-equal encodes and equal
decodes across 120 random-content images in the r17 codec test, and
the oracle re-check covers the query) — this tool is timing only.

Usage: PYTHONPATH=/root/repo python tools/jpeg_codec_ab.py [old_tree]
Env: N_ROUNDS (default 3), N_RUNS per child (default 3),
     QUERY (default multimodal_jpeg_pixels).
Writes /tmp/jpeg_codec_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_ROUNDS = int(os.environ.get("N_ROUNDS", "3"))
N_RUNS = int(os.environ.get("N_RUNS", "3"))
QUERY = os.environ.get("QUERY", "multimodal_jpeg_pixels")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
spark = get_spark("caf-jpeg-ab-leg")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = entrymod.queries()
qs["wateryear_rollup"](spark, sf_dir).write.format("noop").mode("overwrite").save()
spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()
name = sys.argv[2]
samples = []
for _ in range(int(sys.argv[3])):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples.append(round(time.perf_counter() - t0, 3))
print("SAMPLES " + json.dumps(samples))
"""


def leg(tree: str) -> list[float]:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, QUERY, str(N_RUNS)],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": tree},
    )
    for line in p.stdout.splitlines():
        if line.startswith("SAMPLES "):
            return json.loads(line[len("SAMPLES "):])
    raise RuntimeError(f"leg failed for {tree}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    old_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r16close"
    new_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = {"old": [], "new": []}
    for r in range(N_ROUNDS):
        res["old"].extend(leg(old_tree))
        res["new"].extend(leg(new_tree))
        print(json.dumps({"round": r, **res}), flush=True)
    out = {
        "query": QUERY,
        "old_min": min(res["old"]),
        "new_min": min(res["new"]),
        "speedup": round(min(res["old"]) / min(res["new"]), 2),
        "n_rounds": N_ROUNDS,
        "n_runs_per_child": N_RUNS,
        "method": "interleaved child processes pinned to code era via PYTHONPATH",
        **res,
    }
    with open("/tmp/jpeg_codec_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
