"""Dump .explain('formatted') for catalog queries to files.

Usage: python tools/explain_dump.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query — the r15
optimization round's plan-evidence artifacts (plans/r15/*_before.txt /
*_after.txt).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = build_spark(app_name="vgs-explain")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{n}: {len(plan.splitlines())} plan lines, {n_exch} Exchange refs")
    spark.stop()


if __name__ == "__main__":
    main()
