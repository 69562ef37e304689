"""Admission-loop throughput: the measured price of the exactly-once
protocol (VERDICT r6 ask #6).

Drives `index_dedup.admit_batch` over the ×10 documents replica
(`stress_scale.py 10 --build-only` first): bootstrap a corpus + band
index from ~1/5 of the documents, then admit the rest in fixed-size
batches, once per mode:

- mode "plain"        — batch_id=None: append-only, no staging, no
                        manifest/marker (the ad-hoc batch path);
- mode "exactly_once" — batch_id=i, stable query_id: staged writes,
                        move manifest, per-lineage marker, tagged
                        renames (the streaming foreachBatch path).

Reports rows/second per mode, the per-batch wall series (flat =
admission latency independent of accumulated corpus/index file count,
the ADVICE r6 #5 contract), and the exactly-once overhead percent.

Usage: python tools/admit_throughput.py [sf_dir] [n_batches] [batch_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from voter_gateway_spark.session import build_spark  # noqa: E402
from voter_gateway_spark.streaming.index_dedup import (  # noqa: E402
    admit_batch,
    bootstrap_index,
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 2500
    spark = build_spark(app_name="vgs-admit-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{src}/documents.parquet")
        .select("doc_id", "text")
    )
    seed = docs.where(F.col("doc_id") % 5 == 1)
    arrivals = (
        docs.where(F.col("doc_id") % 5 != 1)
        .orderBy("doc_id")
        .limit(n_batches * batch_rows)
        .withColumn(
            "_b",
            F.floor(
                (F.row_number().over(Window.orderBy("doc_id")) - 1)
                / batch_rows
            ).cast("int"),
        )
        .cache()
    )
    arrivals.count()
    # ACTUAL rows per batch, computed outside the timed loops: a
    # replica smaller than n_batches*batch_rows leaves trailing batches
    # short, and assuming full batches would inflate rows/sec (r7
    # review)
    bcounts = {
        r["_b"]: r["n"]
        for r in arrivals.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    out: dict[str, dict] = {}
    for mode in ("plain", "exactly_once"):
        work = tempfile.mkdtemp(prefix=f"vgs_admit_{mode}_")
        idx, cp = f"{work}/idx", f"{work}/corpus"
        bootstrap_index(seed, idx, cp, "doc_id", "text")
        per_batch, rows = [], 0
        t0 = time.time()
        for i in range(n_batches):
            batch = arrivals.where(F.col("_b") == i).drop("_b")
            b0 = time.time()
            admitted = admit_batch(
                spark, batch, idx, cp, "doc_id", "text",
                batch_id=(i if mode == "exactly_once" else None),
                query_id=("bench" if mode == "exactly_once" else None),
            )
            per_batch.append(round(time.time() - b0, 2))
            rows += bcounts.get(i, 0)
            del admitted
        wall = time.time() - t0
        out[mode] = {
            "rows_per_sec": round(rows / wall),
            "wall_sec": round(wall, 1),
            "per_batch_sec": per_batch,
        }
        shutil.rmtree(work, ignore_errors=True)

    plain, eo = out["plain"]["rows_per_sec"], out["exactly_once"]["rows_per_sec"]
    print(
        json.dumps(
            {
                "metric": "admission_rows_per_sec",
                "unit": "rows/s",
                "n_batches": n_batches,
                "batch_rows": batch_rows,
                "modes": out,
                "exactly_once_overhead_pct": round(100 * (plain - eo) / plain, 1),
                "src": src,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
