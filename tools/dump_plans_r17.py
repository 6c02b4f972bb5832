"""Dump `.explain("formatted")` for every bench query to
plans/r17/<query>_<tag>.txt — the optimization round's before/after
evidence files. Usage:

    PYTHONPATH=/root/repo python tools/dump_plans_r17.py <tag> [names...]

With no names, dumps the full bench set (HEADLINE + EXTRA_QUERIES).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import EXTRA_QUERIES, HEADLINE
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r17",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("caf-plans-r17")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    targets = names or (HEADLINE + EXTRA_QUERIES)
    for name in targets:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
