"""Decade measurements for the r14 Fellegi–Sunter linkage newborns —
wall + shuffle at sf0.1 and customer-scaled x10 / x100 replicas,
written as BENCH_r14_linkage.json.

The standard stress replicas (tools/stress_scale.py) COPY customer
unscaled to keep order FKs valid, so they can't exercise linkage
growth. This tool builds customer-only replica dirs where each copy
offsets c_custkey AND rewrites c_name to the canonical
'Customer#%09d' of the new key — new entities get new names, so the
high-cardinality blocking rule (name, nation) stays ~unique per name
and its pair count scales linearly. The recall rule (nation, segment,
bucket) keeps its FIXED ~1375 blocks, so its pair count grows
quadratically per decade BY CONTRACT — the same disclosed-quadratic
class as dedup_minhash_lsh_expanded. Expect ~10x/decade from the
recall rule's pairs dominating; a deployment that needs the third
decade blocks on a population-scaled key (zip/surname) instead.

Usage: python tools/linkage_decade.py [out.json] [dir ...]
       (replicas are (re)built at /tmp/fs_x10, /tmp/fs_x100 when the
       default dirs are used and the dir lacks customer.parquet)
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
from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

NEWBORNS = [
    "match_fs_score",
    "match_fs_top1",
    "match_fs_em",
    "match_fs_em_score",
    "match_fs_patterns",
    "match_fs_blocking_audit",
    "match_fs_tf_score",
    "match_fs_graded",
    "match_fs_em_graded",
    "pipeline_fs_admission",
    "dedup_fs_entities",
]
# graded variants pay per-(joined-row) trigram-set evaluation on the
# recall rule's quadratic mass BY CONTRACT — the minhash-expanded class
SKIP_AT_X100 = {"match_fs_graded", "match_fs_em_graded"}


def build_customer_replica(spark, n: int, dst: str) -> None:
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    key_max = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    parts = []
    for i in range(n):
        parts.append(
            cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * key_max))
            .withColumn(
                "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/customer.parquet")


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args else "BENCH_r14_linkage.json"
    dirs = args[1:] or [SRC, "/tmp/fs_x10", "/tmp/fs_x100"]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = build_spark(
        app_name="vgs-linkage-decade",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for mult, d in [(10, "/tmp/fs_x10"), (100, "/tmp/fs_x100")]:
        if d in dirs and not os.path.exists(f"{d}/customer.parquet"):
            print(f"building {d} (customer x{mult})", flush=True)
            build_customer_replica(spark, mult, d)
    only = os.environ.get("SPARK_GRAFT_NEWBORN_ONLY")
    newborns = NEWBORNS
    results: dict[str, dict] = {}
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in NEWBORNS]
        if unknown:
            sys.exit(f"unknown newborn names {unknown}; valid: {NEWBORNS}")
        newborns = names
        # subset runs MERGE into the existing artifact
        if os.path.exists(out_path):
            with open(out_path) as fh:
                results = json.load(fh).get("results", {})
    for i, d in enumerate(dirs):
        results.setdefault(d, {})
        for name in newborns:
            if name in SKIP_AT_X100 and i >= 2:
                results[d][name] = "skipped: per-pair trigram on quadratic-by-contract pair mass"
                continue
            fn = QUERIES[name]
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
                spark.sparkContext._jvm.System.gc()
            row = {"s": round(best, 2)}
            if best_sh is not None:
                row["shuffle_mb"] = round(best_sh / 1e6, 2)
            results[d][name] = row
            print(f"{d} {name}: {row}", flush=True)
    out = {
        "metric": "r14_linkage_decade",
        "runs_per_query": runs,
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
