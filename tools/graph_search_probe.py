"""Probe-only timing for the kNN-graph point-query: the catalog row
(embed_graph_search_topk) REBUILDS the graph in-query by contract, so
its decade numbers are build-dominated (x100: 361 s total where the
build alone is ~287 s). A deployment searches a PERSISTED graph; this
tool builds the graph once per dir (untimed, written to parquet) and
times ONLY `knn_graph_search` reading those edges — the steady-state
retrieval cost.

Usage: python tools/graph_search_probe.py [out.json] [dir ...]
Prints one JSON line and writes the artifact.
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
from voter_gateway_spark.operators import similarity  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args else "BENCH_r14_graph_probe.json"
    dirs = args[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/stress_x10",
        "/tmp/stress_x100",
    ]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = build_spark(app_name="vgs-graph-search-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        gdir = f"/tmp/vgs_gsp_{abs(hash(d)) % 10**8}"
        t0 = time.time()
        similarity.knn_graph(
            emb, k=4, n_centroids=None, rounds=2, iters=0
        ).write.mode("overwrite").parquet(gdir)
        build_s = round(time.time() - t0, 2)
        graph = spark.read.parquet(gdir)
        qs = emb.where(F.col("vec_id") % 10 == 0)
        best, best_sh = float("inf"), None
        for _ in range(runs):
            before = _stage_totals(spark)
            t0 = time.time()
            similarity.knn_graph_search(
                qs, emb, graph, k=5, beam=8, hops=2
            ).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            after = _stage_totals(spark)
            if dt < best:
                best = dt
                if before is not None and after is not None:
                    best_sh = after[1] - before[1]
            spark.sparkContext._jvm.System.gc()
        row = {"graph_build_s": build_s, "search_s": round(best, 2)}
        if best_sh is not None:
            row["search_shuffle_mb"] = round(best_sh / 1e6, 2)
        results[d] = row
        print(f"{d}: {row}", flush=True)
    out = {
        "metric": "r14_graph_search_probe_only",
        "runs_per_query": runs,
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
