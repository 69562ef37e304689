"""Decade measurements for the r14-newborn / reshaped operators —
wall + shuffle at sf0.1 and the x10 / x100 key-offset replicas
(tools/stress_scale.py), written as BENCH_r14_newborns.json:

  docs_ann_ivf_topk        the r13 verdict's #1 ask: the text→vector
                           ANN capstone on the SCALE path — hashed
                           featurizer → auto-√N-cell IVF (O(N^1.5));
                           the ask is an x100 row ≲4×/decade where
                           docs_ann_topk (the brute yardstick) is
                           skipped at x100 by contract
  dedup_incremental_batch  the r13 regression fix re-measured: the
                           both-sides collapse now rides the signature
                           checkpoint (window rep-tag + in-row member
                           expansion) instead of 4 extra jobs

Extend NEWBORNS as r14 lands more operators; SPARK_GRAFT_NEWBORN_ONLY
(comma-separated, validated) re-runs a subset into a fresh file.

Timing protocol mirrors bench.py: noop-sink full evaluation,
best-of-N trials (SPARK_GRAFT_BENCH_RUNS, default 2), per-query
shuffle-write deltas from the AppStatusStore.

Usage: python tools/newborn_decade_r14.py [out.json] [dir ...]
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


NEWBORNS = {
    "docs_ann_ivf_topk": QUERIES["docs_ann_ivf_topk"],
    "dedup_incremental_batch": QUERIES["dedup_incremental_batch"],
    # r13 verdict ask #3: size-gated driver union-find — sf0.1 was a
    # 68 s fixed-overhead outlier (20 pointer-jump rounds on a
    # 500-node graph); x10/x100 should be unchanged (distributed path)
    "embed_knn_clusters": QUERIES["embed_knn_clusters"],
    # ask #4: audits probing the persisted cell assignment; rows here
    # include the one-time index build on first touch of each dir —
    # the steady-state probe cost is the second row of an interleaved
    # pair, so both audits at one dir share one build
    "sample_cluster_mixture_indexed": QUERIES["sample_cluster_mixture_indexed"],
    "embed_cluster_report_indexed": QUERIES["embed_cluster_report_indexed"],
    # ask #8: graph point-query (beam search over the kNN graph); the
    # row includes rebuilding the graph in-query by catalog contract
    "embed_graph_search_topk": QUERIES["embed_graph_search_topk"],
    "multimodal_jpeg420_decode": QUERIES["multimodal_jpeg420_decode"],
    # late r14 newborns: the retrieval-corpus capstone (chunk corpus is
    # ~2-4x the doc count; rows include the once-per-dir index build on
    # the first trial, best-of-N takes the probe-only run) and the
    # embedding outlier audit (the cluster-report cost class)
    "pipeline_chunk_index": QUERIES["pipeline_chunk_index"],
    "embed_outlier_report": QUERIES["embed_outlier_report"],
    "text_blocklist_filter": QUERIES["text_blocklist_filter"],
}
# measured at the baseline dir only: reads no sf table (fixture-driven)
BASELINE_ONLY: set[str] = {"multimodal_jpeg420_decode"}
# quadratic-by-contract paths skipped at the third decade
SKIP_AT_X100: set[str] = set()


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args else "BENCH_r14_newborns.json"
    dirs = args[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/stress_x10",
        "/tmp/stress_x100",
    ]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    only = os.environ.get("SPARK_GRAFT_NEWBORN_ONLY")
    newborns = NEWBORNS
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in NEWBORNS]
        if unknown:
            sys.exit(
                f"SPARK_GRAFT_NEWBORN_ONLY names not in this tool's newborn "
                f"set: {unknown}; valid names: {sorted(NEWBORNS)}"
            )
        newborns = {n: NEWBORNS[n] for n in names}
    spark = build_spark(
        app_name="vgs-newborn-decade-r14",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for i, d in enumerate(dirs):
        is_baseline = i == 0
        results[d] = {}
        for name, fn in newborns.items():
            if name in BASELINE_ONLY and not is_baseline:
                results[d][name] = "skipped: fixture-driven, reads no sf table"
                continue
            if name in SKIP_AT_X100 and i >= 2:
                results[d][name] = "skipped: quadratic by contract"
                continue
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
        "metric": "r14_newborn_decade",
        "runs_per_query": runs,
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
