"""Streaming FS-admission throughput: what does probabilistic linkage
cost per arriving record INSIDE the stream?

Bootstraps a registry from the sf0.1 customer table, writes N arrival
JSONL files of perturbed roll rows (each batch draws a distinct
custkey stripe; ~60% of rows FS-match existing registry rows and
overwrite-update, the rest insert), then drives ONE availableNow
stream with maxFilesPerTrigger=1 through
streaming/linkage_admission.stream_fs_admission — so the measured
number includes the full per-batch cost: FS blocking joins against
the CURRENT registry, MergePlan update/insert, and the upsert sink's
write-new-then-swap + marker protocol.

Reported: wall seconds, input rows/s, registry growth (inserted
count), and how many batches folded. Registry rewrite is O(registry)
per batch by design (the swap sink's documented scale posture — on a
lake this lowers to MERGE INTO), so rows/s here is the LOCAL
small-registry bound, comparable to the other streaming families'
rows in BENCH_r13_nbgate.json.

Usage: python tools/fs_admission_throughput.py [sf_dir] [n_batches] [batch_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from voter_gateway_spark.plans.linkage import FieldWeights  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402
from voter_gateway_spark.sources.fixtures import load_table  # noqa: E402
from voter_gateway_spark.streaming.linkage_admission import (  # noqa: E402
    stream_fs_admission,
)
from voter_gateway_spark.streaming.upsert_sink import bootstrap_target  # noqa: E402

WORK = Path("/tmp/fs_admission_tp")

RULES = [
    [("s_name", "t_name"), ("s_nation", "t_nation")],
    [("s_nation", "t_nation"), ("s_seg", "t_seg"), ("s_bucket", "t_bucket")],
]
GAMMAS = {
    "g_name": ("s_name", "t_name"),
    "g_seg": ("s_seg", "t_seg"),
    "g_bucket": ("s_bucket", "t_bucket"),
}
WEIGHTS = {
    "g_name": FieldWeights(m=0.95, u=0.001),
    "g_seg": FieldWeights(m=0.85, u=0.2),
    "g_bucket": FieldWeights(m=0.8, u=0.09),
}


def _prep_src(df):
    return df.select(
        F.col("c_custkey").alias("_fs_src_id"),
        F.col("c_name").alias("s_name"),
        F.col("c_nationkey").alias("s_nation"),
        F.col("c_mktsegment").alias("s_seg"),
        F.floor(F.col("c_acctbal") / 1000).alias("s_bucket"),
    )


def _prep_tgt(df):
    return df.select(
        "c_custkey",
        F.col("c_name").alias("t_name"),
        F.col("c_nationkey").alias("t_nation"),
        F.col("c_mktsegment").alias("t_seg"),
        F.floor(F.col("c_acctbal") / 1000).alias("t_bucket"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    shutil.rmtree(WORK, ignore_errors=True)
    arrivals = WORK / "arrivals"
    arrivals.mkdir(parents=True)
    spark = build_spark(app_name="vgs-fs-admission-tp")
    spark.sparkContext.setLogLevel("ERROR")

    cust = load_table(spark, sf_dir, "customer")
    registry_dir = str(WORK / "registry")
    bootstrap_target(spark, registry_dir, cust)
    n_registry0 = cust.count()

    # arrival batches: stripe b draws custkeys ≡ b (mod n_batches);
    # within a stripe, 40% get displaced ids + fresh names (inserts),
    # the rest keep their name (updates) with a perturbed segment
    total_rows = 0
    for b in range(n_batches):
        rows = (
            cust.where(F.col("c_custkey") % n_batches == b)
            .limit(batch_rows)
            .select(
                F.when(
                    F.col("c_custkey") % 5 < 2,
                    F.col("c_custkey") + 10_000_000 + b,
                ).otherwise(F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.when(
                    F.col("c_custkey") % 5 < 2,
                    F.concat(F.lit("NEW#"), F.col("c_custkey").cast("string"), F.lit(f"#b{b}")),
                ).otherwise(F.col("c_name")).alias("c_name"),
                "c_nationkey",
                F.lit("AUTOMOBILE").alias("c_mktsegment"),
                (F.col("c_acctbal") + b).alias("c_acctbal"),
            )
            .collect()
        )
        p = arrivals / f"b{b}.jsonl"
        p.write_text("\n".join(json.dumps(r.asDict()) for r in rows) + "\n")
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
        total_rows += len(rows)

    stream = (
        spark.readStream.schema(
            "c_custkey long, c_name string, c_nationkey int,"
            " c_mktsegment string, c_acctbal double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(arrivals))
    )
    writer = stream_fs_admission(
        stream, registry_dir, pk="c_custkey",
        prepare_source=_prep_src, prepare_target=_prep_tgt,
        rules=RULES, gammas=GAMMAS, weights=WEIGHTS, threshold=4.0,
    )
    t0 = time.time()
    q = writer.trigger(availableNow=True).option(
        "checkpointLocation", str(WORK / "ckpt")
    ).start()
    q.awaitTermination(1200)
    q.stop()
    wall = time.time() - t0

    final = spark.read.parquet(registry_dir).count()
    out = {
        "metric": "fs_admission_throughput",
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "input_rows": total_rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(total_rows / wall, 1),
        "registry_rows": final,
        "inserted": final - n_registry0,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
