"""Measure the reliable-checkpoint switch's overhead on the iterative
heavy paths (SCALING.md "local-vs-cluster deltas").

Runs the checkpoint-iterating queries (pointer-jumping connected
components, fuzzy claiming, fuzzy top-1 with its checkpointed trigram
frames) at a replica dir and prints one JSON line. Invoke twice:

    python tools/ckpt_overhead.py /tmp/stress_x10
    SPARK_GRAFT_CHECKPOINT_DIR=/tmp/vgs_ckpt \
        python tools/ckpt_overhead.py /tmp/stress_x10

The first exercises the default block-manager ``localCheckpoint`` path,
the second the storage-backed ``df.checkpoint()`` path a preemptible
cluster needs; the delta is the price of surviving executor loss.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

QUERY_SET = [
    "dedup_cluster_components",
    "fuzzy_claiming_documents",
    "fuzzy_top1_documents",
    # r10: the daily-ingest composite's ~6-barrier chain (genesis map,
    # then per day: admission, cluster map, corpus union) — the
    # steady-state path whose per-day materialization premium the
    # SCALING.md checkpoint table quotes
    "pipeline_daily_ingest",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x10"
    mode = "reliable" if os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") else "local"
    spark = build_spark(app_name=f"vgs-ckpt-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()  # JVM warmup
    timings: dict[str, float] = {}
    for name in QUERY_SET:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "mode": mode,
                "sf": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
