"""Exact vs sketch audit A/B: shuffle-byte collapse measurement.

The 100 TB question for the audit family (A3/A4,
audit_distinct_users_by_type) is not wall-clock on NVMe — it is
SHUFFLE VOLUME: exact countDistinct plans as the two-phase partial
distinct, shuffling every distinct (group, user) pair; the HLL++ form
shuffles one fixed-size register block per (partition, group). Same
story for exact percentile (full value multiset per group) vs the
Greenwald-Khanna percentile_approx (O(accuracy) entries per partial).

Runs each mode over an events dir (use a /tmp/stress events replica
for decade rows) and prints one JSON line with per-mode wall seconds,
shuffle MB, and the HLL relative errors so SCALING.md's table can
quote the byte collapse with its accuracy cost side-by-side.

Usage: python tools/sketch_audit_ab.py [events_dir_or_sf_dir] [runs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import _stage_totals  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.1"
    # floor at 1: runs=0 would leave `rows` unbound and wall at inf
    # (json.dumps would then emit the non-RFC Infinity token)
    runs = max(1, int(argv[1])) if len(argv) > 1 else 2
    path = src if src.endswith(".parquet") else f"{src}/events.parquet"
    spark = build_spark(app_name="vgs-sketch-audit-ab")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(path)

    modes = {
        "exact": lambda: ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_users"),
            F.percentile(F.col("value"), F.lit([0.5, 0.9])).alias("q"),
        ),
        "sketch": lambda: ev.groupBy("event_type").agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("n_users"),
            F.percentile_approx("value", F.lit([0.5, 0.9]), F.lit(1000)).alias("q"),
        ),
    }
    wall: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    results: dict[str, dict] = {}
    for mode, build in modes.items():
        best, best_delta = float("inf"), None
        for _ in range(runs):
            before = _stage_totals(spark)
            t0 = time.time()
            rows = build().collect()
            dt = time.time() - t0
            after = _stage_totals(spark)
            if dt < best:
                best = dt
                if before and after:
                    best_delta = after[1] - before[1]
        wall[mode] = round(best, 2)
        if best_delta is not None:
            shuffle_mb[mode] = round(best_delta / 1e6, 3)
        results[mode] = {r.event_type: r.n_users for r in rows}

    rel_err = {
        t: round(abs(results["sketch"][t] - n) / n, 4)
        for t, n in results["exact"].items()
    }
    print(
        json.dumps(
            {
                "metric": "sketch_audit_ab",
                "events_path": path,
                "n_rows": ev.count(),
                "wall_s": wall,
                "shuffle_mb": shuffle_mb,
                "hll_rel_err": rel_err,
                "hll_max_rel_err": max(rel_err.values()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
