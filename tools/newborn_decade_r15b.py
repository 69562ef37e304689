"""Decade measurements for the late-r15 newborns — wall + shuffle at
sf0.1 and the x10 / x100 replicas, written as BENCH_r15_newborns.json.

Two fixture families, because the newborns live on different tables:

  embeddings (tools/stress_scale.py replicas):
    embed_binary_topk   1-bit Hamming prefilter + rerank. The catalog
                        form's query set is vec_id % 10 — |Q| grows
                        with N, so Q x N stage-1 work is quadratic per
                        decade BY DESIGN (the same disclosed contract
                        as the brute/int8/lsh yardstick rows); skipped
                        at x100. The operator's point is the 32x byte
                        reduction per candidate, not asymptotics —
                        production pairs it with IVF cells or LSH
                        bands for candidate reduction.
    embed_pagerank      kNN-graph build (the dominant term — same
                        build as embed_knn_graph) + 3 integer power
                        iterations, each one groupBy(dst) over the
                        edge list: linear per decade past the build.

  customer (tools/linkage_decade.py replicas):
    match_phonetic_top1            bounded-alphabet phonetic blocks +
                                   the fixed recall rule — pair mass
                                   quadratic by contract (disclosed in
                                   the operator docstring); measured
                                   through x100 to quantify it.
    match_phonetic_blocking_audit  pair-free side-count products —
                                   linear, all decades.

Usage: python tools/newborn_decade_r15b.py [out.json]
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

GROUPS = [
    (
        ["/root/testdata/sf0.1", "/tmp/stress_x10", "/tmp/stress_x100"],
        [
            "embed_binary_topk",
            "embed_pagerank",
            "orc_roundtrip_documents",
            "docs_ann_binary_topk",
            "embed_rrf_fusion",
            "embed_ppr_seeds",
            "docs_ppr_expansion",
            "embed_graph_triangles",
        ],
        # |Q| grows with N in these catalog forms — quadratic-by-design
        # yardstick contract past x10 (see docstring)
        {"embed_binary_topk": 2, "docs_ann_binary_topk": 2, "embed_rrf_fusion": 2},
    ),
    (
        ["/root/testdata/sf0.1", "/tmp/fs_x10", "/tmp/fs_x100"],
        [
            "match_phonetic_top1",
            "match_phonetic_blocking_audit",
            "match_phonetic_em",
            "match_geo_radius",
            "match_geo_nearest",
        ],
        {},
    ),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r15_newborns.json"
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = build_spark(
        app_name="vgs-newborn-decade-r15b",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # merge into an existing artifact so late newborns can be measured
    # incrementally without re-running the earlier rows
    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh).get("results", {})
    for dirs, names, skip_from in GROUPS:
        for i, d in enumerate(dirs):
            if not os.path.exists(d):
                print(f"missing {d}, skipping", flush=True)
                continue
            results.setdefault(d, {})
            for name in names:
                if name in results[d]:
                    continue
                if i >= skip_from.get(name, 99):
                    results[d][name] = (
                        "skipped: |Q| grows with N — quadratic-by-design "
                        "yardstick form (see tool docstring)"
                    )
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
    out = {"metric": "r15_newborn_decade", "runs_per_query": runs, "results": results}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
