"""Duplicate-scan audit: for every queries() entry, count how many
times the OPTIMIZED plan references each source parquet. More than one
scan of the same table is the signature of the r14 q_oov_rate bug (a
broadcast build recomputing a whole corpus aggregation), so this is
the first-pass triage for that class — but a flag is NOT a verdict:

- cached frames (q_minhash_lsh's shingle/signature shares) still print
  their original scans in the optimized plan even though execution
  reads the InMemoryRelation once;
- iterative operators (kmeans_centroids) legitimately carry one scan
  per Lloyd round in the LINEAGE while executing each round once;
- AQE stage reuse / ReuseExchange dedupes physically-identical
  subtrees only at execution (the fused oov query still shows 2 scans
  statically).

Read a flag as "go look at the executed plan", nothing stronger.

Usage: PYTHONPATH=/root/repo python tools/scan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("caf-scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # ADVICE r14 #3: q_bpe_train_merges runs TRAINING eagerly at
    # DataFrame-construction time (10 sequential Spark jobs + driver
    # collects; the returned frame is a local relation with no parquet
    # scans), so a plan-only audit would silently pay the full training
    # cost for a vacuous zero-scan row. Skip it explicitly.
    EAGER = {"bpe_train_merges"}
    out: dict = {}
    for name, fn in entrymod.queries().items():
        if name in EAGER:
            out[name] = "SKIPPED eager-execution query (local-relation result)"
            continue
        try:
            plan = fn(spark, sf)._jdf.queryExecution().optimizedPlan().toString()
            tables = re.findall(r"/(\w+)\.parquet", plan)
            counts: dict[str, int] = {}
            for t in tables:
                counts[t] = counts.get(t, 0) + 1
            multi = {t: c for t, c in counts.items() if c > 1}
            if multi:
                out[name] = multi
        except Exception as ex:  # noqa: BLE001 — audit must not die mid-list
            out[name] = f"ERR {type(ex).__name__}"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
