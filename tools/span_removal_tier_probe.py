"""Tier-probe `remove_duplicate_spans` (the r14 ExactSubstr removal op,
r15 registry candidate): per-doc cost must stay flat across a 4x corpus
and the removed fraction must land where the synth's seeded duplication
says it should.

Corpus: tools/pipeline_tier_probe.synth_docs_en — ~5.9% mutant docs
(~96%-identical copies of their predecessor, so mutant/original pairs
carry long shared token runs) plus 8 boilerplate openings shared by
~1/8 of the corpus each. Both produce >= min_docs spans by
construction; the probe records the corpus-wide removed-token fraction
as the semantic sanity check alongside the timing.

Each cell is drift-bracketed (tools/drift.py; sec_per_probe is the
cross-tier number). The timed job aggregates (sum n_tokens, sum
n_removed, count docs) off the op's output — one extra reduce over the
full reconstruction, so the timing covers the whole dataflow including
the text rebuild.

Usage: PYTHONPATH=/root/repo python tools/span_removal_tier_probe.py [out]
Env: TIERS="125000,500000", N=13.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    remove_duplicate_spans,
    remove_duplicate_spans_modes,
)
from tools.drift import bracketed
from tools.pipeline_tier_probe import synth_docs_en

N = int(os.environ.get("N", "13"))
TIERS = [int(x) for x in os.environ.get("TIERS", "125000,500000").split(",")]
# MODES=1 probes the r15 fused dual-mode op instead (the registry
# query's plan since the span fusion); the removed fraction is read
# off the dedup_mode='all' rows so the semantic check stays comparable
MODES = os.environ.get("MODES", "0") == "1"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/span_removal_tier_probe.json"
    spark = get_spark("caf-span-removal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    record: dict = {"n": N, "modes_op": MODES, "tiers": []}
    for n_docs in TIERS:
        docs = synth_docs_en(spark, n_docs)

        stats = {}

        def run():
            op = (
                remove_duplicate_spans_modes(docs, n=N).filter(
                    F.col("dedup_mode") == "all"
                )
                if MODES
                else remove_duplicate_spans(docs, n=N)
            )
            row = (
                op
                .agg(
                    F.sum("n_tokens").alias("tok"),
                    F.sum("n_removed").alias("rem"),
                    F.count(F.lit(1)).alias("docs"),
                )
                .collect()[0]
            )
            stats.update(
                tok=int(row["tok"]), rem=int(row["rem"]), docs=int(row["docs"])
            )

        sec, bracket, _ = bracketed(spark, run)
        cell = {
            "docs": n_docs,
            "sec": round(sec, 2),
            "probe_bracket": [round(b, 3) for b in bracket],
            "sec_per_probe": round(sec / (sum(bracket) / len(bracket)), 3),
            "usec_per_doc_per_probe": round(
                1e6 * sec / (sum(bracket) / len(bracket)) / n_docs, 2
            ),
            "removed_frac": round(stats["rem"] / stats["tok"], 4),
            "n_tokens": stats["tok"],
            "n_removed": stats["rem"],
        }
        record["tiers"].append(cell)
        print(json.dumps(cell), flush=True)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
