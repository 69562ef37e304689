"""Quiet-box re-measure for the r13 watch items (r13 VERDICT asks #2/#7).

Three queries left r13 with unresolved timing questions:

- ``dedup_incremental_batch`` — 1.97-2.15 s in both final-code r13 runs
  vs 1.23-1.25 s in r12 AND in an r13 mid-round same-code run; variance
  was claimed but not demonstrated for this one. If the slow number
  reproduces here, bisect the late-r13 commits (band-probe collapse at
  1f56093 touched its code path).
- ``text_fingerprint`` — driver row 1.94x of its re-baselined 0.31 s bar.
- ``text_langid`` — 1.99x of its r1 row.

Protocol: best-of-N (default 5) trials per query on an otherwise idle
session, same noop-v2-sink evaluation as bench.py, JVM warmed by one
untimed run of q1. Prints one JSON line with all trials so the scatter
itself is recorded, not just the min.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

WATCH = [
    "dedup_incremental_batch",
    "text_fingerprint",
    "text_langid",
]

# the comparison bars the watch items are judged against (r13 VERDICT)
BARS = {
    "dedup_incremental_batch": {"r12_best": 1.23, "flag_over": 1.3 * 1.23},
    "text_fingerprint": {"rebaselined": 0.31, "flag_over": 2.0 * 0.31},
    "text_langid": {"r1_row": 0.36, "flag_over": 2.0 * 0.36},
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = build_spark(app_name="vgs-quietbox-r14")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()  # warmup

    out: dict[str, dict] = {}
    for name in WATCH:
        trials = []
        for _ in range(runs):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trials.append(round(time.time() - t0, 3))
            spark.sparkContext._jvm.System.gc()
        best = min(trials)
        bar = BARS[name]
        out[name] = {
            "trials": trials,
            "best": best,
            **bar,
            "over_bar": best > bar["flag_over"],
        }
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "watch": out}))


if __name__ == "__main__":
    main()
