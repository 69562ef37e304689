"""Decade rows for the r15 population-scaled graded linkage family
(r14 VERDICT ask #2) + the PQ text capstone (ask #7) + the staged
fixed-block graded forms at sf0.1/x10 (ask #1 A/B lives in
tools/graded_ab_r15.py).

The scaled scheme blocks on (name-minus-last-char, nation): block
count grows with the population, so its pair mass — and the x100 row
— should be near-linear where the fixed (nation, segment, bucket)
scheme is quadratic by contract. The audit row records the proof
(side-count-product pair totals, never expanded).

Usage: python tools/scaled_decade_r15.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _stage_totals  # noqa: E402
from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

NAMES = [
    "match_fs_graded_scaled",
    "match_fs_scaled_blocking_audit",
    "match_fs_graded_top1",
    "docs_ann_ivfpq_topk",
    "docs_ann_ivf_topk",
]
# the PQ/IVF capstones read documents.parquet, absent from the
# customer-only linkage replicas — they run on the stress replicas
DOCS_QUERIES = {"docs_ann_ivfpq_topk", "docs_ann_ivf_topk"}
# fixed-block graded top-1: quadratic-by-contract join mass — x10 only
SKIP_AT_X100 = {"match_fs_graded_top1"}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r15_scaled.json"
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = build_spark(
        app_name="vgs-scaled-decade",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tools.linkage_decade import build_customer_replica
    from tools.stress_scale import replicate  # documents-bearing dirs

    for mult, d in [(10, "/tmp/fs_x10"), (100, "/tmp/fs_x100")]:
        if not os.path.exists(f"{d}/customer.parquet"):
            print(f"building {d}", flush=True)
            build_customer_replica(spark, mult, d)
    for mult, d in [(10, "/tmp/stress_x10"), (100, "/tmp/stress_x100")]:
        if not os.path.exists(f"{d}/documents.parquet"):
            print(f"building {d}", flush=True)
            replicate(spark, mult, d)

    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").count()
    results: dict[str, dict] = {}
    for name in NAMES:
        results[name] = {}
        if name in DOCS_QUERIES:
            dirs = [
                ("/root/testdata/sf0.1", "sf0.1"),
                ("/tmp/stress_x10", "x10"),
                ("/tmp/stress_x100", "x100"),
            ]
        else:
            dirs = [
                ("/root/testdata/sf0.1", "sf0.1"),
                ("/tmp/fs_x10", "x10"),
                ("/tmp/fs_x100", "x100"),
            ]
        for d, label in dirs:
            if label == "x100" and name in SKIP_AT_X100:
                results[name][label] = "skipped: fixed-block quadratic-by-contract"
                continue
            best, best_sh = float("inf"), None
            for _ in range(runs):
                before = _stage_totals(spark)
                t0 = time.time()
                QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                after = _stage_totals(spark)
                if dt < best:
                    best = dt
                    if before is not None and after is not None:
                        best_sh = after[1] - before[1]
            results[name][label] = {
                "s": round(best, 2),
                "shuffle_mb": round((best_sh or 0) / 1e6, 2),
            }
            print(name, label, results[name][label], flush=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
