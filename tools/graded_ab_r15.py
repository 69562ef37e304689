"""Same-session A/B + decade rows for the r15 staged graded gamma
(r14 VERDICT ask #1).

A/B: the UNSTAGED graded score (per-pair trigram-set builds, the r14
shape — reconstructed inline from _fs_graded_lvl over the unwidened
sides) vs the STAGED catalog form (_fs_graded_sides: trigram arrays
computed once per record, per-pair cost = one array_intersect), both
in one JVM so the box envelope cancels.

Decade rows: staged match_fs_graded / match_fs_em_graded /
match_fs_graded_top1 at sf0.1, x10 and (env-gated) x100 on the
customer-scaled replicas tools/linkage_decade.py builds.

Usage: python tools/graded_ab_r15.py [out.json] [--x100]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import _stage_totals  # noqa: E402
from voter_gateway_spark.plans import linkage  # noqa: E402
from voter_gateway_spark import queries as Q  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def unstaged_graded(spark, sf_dir):
    """The r14 shape: _fs_graded_lvl builds both trigram sets per
    joined candidate row."""
    pairs = linkage.blocked_pairs(
        Q._fs_graded_roll(spark, sf_dir),
        Q._fs_target(spark, sf_dir),
        rules=Q._FS_RULES,
        source_id="src_id",
        target_pk="c_custkey",
        project=[
            F.col("src_id"),
            F.col("c_custkey"),
            Q._fs_graded_lvl().alias("g_name_lvl"),
            linkage.gamma("src_segment", "c_mktsegment").alias("g_seg"),
            linkage.gamma("src_bucket", "t_bucket").alias("g_bucket"),
        ],
    )
    scored = linkage.fs_score(
        pairs,
        {
            "g_name_lvl": Q._FS_NAME_GRADED,
            "g_seg": Q._FS_WEIGHTS["g_seg"],
            "g_bucket": Q._FS_WEIGHTS["g_bucket"],
        },
    )
    return scored.select(
        "src_id",
        F.col("c_custkey").alias("target_custkey"),
        "g_name_lvl",
        "g_seg",
        "g_bucket",
        F.round("match_weight", 6).alias("match_weight"),
        (F.col("match_weight") >= Q._FS_THRESHOLD).alias("is_match"),
    )


def timed(spark, fn, d, runs=2):
    best, best_sh = float("inf"), None
    for _ in range(runs):
        before = _stage_totals(spark)
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        after = _stage_totals(spark)
        if dt < best:
            best = dt
            if before is not None and after is not None:
                best_sh = after[1] - before[1]
    return {"s": round(best, 2), "shuffle_mb": round((best_sh or 0) / 1e6, 2)}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else "BENCH_r15_graded.json"
    do_x100 = "--x100" in sys.argv
    spark = build_spark(
        app_name="vgs-graded-ab",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tools.linkage_decade import build_customer_replica

    for mult, d in [(10, "/tmp/fs_x10"), (100, "/tmp/fs_x100")]:
        if not os.path.exists(f"{d}/customer.parquet"):
            print(f"building {d} (customer x{mult})", flush=True)
            build_customer_replica(spark, mult, d)

    results: dict[str, dict] = {"ab": {}, "decade": {}}
    # warmup
    Q.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").count()

    for d, label in [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/fs_x10", "x10")]:
        results["ab"][label] = {
            "unstaged": timed(spark, unstaged_graded, d),
            "staged": timed(spark, Q.QUERIES["match_fs_graded"], d),
        }
        print(label, results["ab"][label], flush=True)

    dirs = [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/fs_x10", "x10")]
    if do_x100:
        dirs.append(("/tmp/fs_x100", "x100"))
    for name in ["match_fs_graded", "match_fs_graded_top1", "match_fs_em_graded"]:
        results["decade"][name] = {}
        for d, label in dirs:
            results["decade"][name][label] = timed(spark, Q.QUERIES[name], d)
            print(name, label, results["decade"][name][label], flush=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
