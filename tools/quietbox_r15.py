"""Quiet-box re-measure for the r14 watch items (r14 VERDICT ask #3).

The r14 driver box slowed ~40% uniformly late-session (same-code A/B in
``BENCH_r14_quietbox.json``), leaving eight queries formally over their
bars while same-session ratios were clean.  Per the verdict, these must be
re-measured at r15 open — BEFORE any new code — on a quiet box: whatever
still exceeds its bar here is a real violation to fix or re-baseline.

Watch set + bars (r14 VERDICT "What's wrong" #2 and per-query table):

- ``dedup_incremental_batch`` — r12 best 1.23 s; the r14 A/B showed the
  band-collapse overhead is a real 8-18%, so flag over 1.3x.
- ``text_fingerprint`` / ``text_langid`` — 2x of their re-baselined /
  r1 rows (0.31 / 0.36 s).
- ``events_funnel`` / ``events_value_cap`` / ``audit_coverage_customer``
  — the r14 driver-run regressions (1.71x/1.41x/1.56x vs r13) that read
  0.98-1.11x on the local final-code run; flag over 1.3x of r13.
- ``embed_ivf_lloyd_topk`` / ``embed_ivf_auto_topk`` — bounded O(N^1.5)
  paths whose drift tracked the box; flag over 1.3x of r13.
- ``pipeline_daily_ingest`` — included as the pre-fix baseline for r15
  ask #4 (lazy-checkpoint shave); bar is r13's 10.5 s.

Protocol: best-of-N (default 5) trials per query, same noop-v2-sink
evaluation as bench.py, JVM warmed by one untimed q1 run.  Prints one
JSON line with all trials so the scatter itself is recorded.
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

# bar = (reference row, flag multiplier) — flag_over is the absolute bar
BARS = {
    "dedup_incremental_batch": {"ref": 1.23, "ref_src": "r12_best", "mult": 1.3},
    "text_fingerprint": {"ref": 0.31, "ref_src": "rebaselined_r13", "mult": 2.0},
    "text_langid": {"ref": 0.36, "ref_src": "r1_row", "mult": 2.0},
    "events_funnel": {"ref": 0.648, "ref_src": "r13_driver", "mult": 1.3},
    "events_value_cap": {"ref": 0.271, "ref_src": "r13_driver", "mult": 1.3},
    "audit_coverage_customer": {"ref": 0.268, "ref_src": "r13_driver", "mult": 1.3},
    "embed_ivf_lloyd_topk": {"ref": 3.391, "ref_src": "r13_driver", "mult": 1.3},
    "embed_ivf_auto_topk": {"ref": 3.059, "ref_src": "r13_driver", "mult": 1.3},
    "pipeline_daily_ingest": {"ref": 10.499, "ref_src": "r13_driver", "mult": 1.15},
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = build_spark(app_name="vgs-quietbox-r15")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()  # warmup

    out: dict[str, dict] = {}
    for name, bar in BARS.items():
        trials = []
        for _ in range(runs):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trials.append(round(time.time() - t0, 3))
            spark.sparkContext._jvm.System.gc()
        best = min(trials)
        flag_over = round(bar["ref"] * bar["mult"], 3)
        out[name] = {
            "trials": trials,
            "best": best,
            **bar,
            "flag_over": flag_over,
            "over_bar": best > flag_over,
        }
        print(
            f"# {name}: best={best} bar={flag_over} "
            f"{'OVER' if best > flag_over else 'ok'}",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "watch": out}))


if __name__ == "__main__":
    main()
