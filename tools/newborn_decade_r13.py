"""Decade measurements for the r13-newborn / contract-changed
operators — wall + shuffle at sf0.1 and the x10 / x100 key-offset
replicas (built by tools/stress_scale.py), written as
BENCH_r13_newborns.json:

  dedup_minhash_lsh          COLLAPSED default contract — the r12
                             scale-killer (15.2x/decade expanded
                             output at x100) re-measured under the
                             rep+member-edge emission; the ask is
                             <= ~4x/decade
  dedup_minhash_lsh_expanded the pre-r13 listing contract, kept for
                             direct contrast (d^2 in duplication BY
                             CONTRACT — the disclosed opt-in)
  dedup_ngram_jaccard        collapsed default, threshold 0.12
  dedup_ngram_prefix_filtered collapsed default, threshold 0.8
  dedup_simhash              collapsed default
  corpus_source_overlap      near-pair COUNTS from the collapsed
                             graph (r13: group-count algebra, no
                             pair expansion)
  embed_semantic_dedup       now iters=1 (snapped Lloyd round)
  sample_cluster_mixture     now iters=1
  embed_cluster_report       now iters=1
  bpe_train_1000             bpe_train_local at n_merges=1000,
                             max_words=30000: ONE corpus-sized word
                             aggregation + driver-side merge training
                             — the decade row for train time the r12
                             verdict asked for (the distributed-
                             rounds form would be 1000 Spark jobs)
  multimodal_jpeg_decode     fixture-driven (64 synthetic images,
                             constant size) — measured at the
                             baseline dir only; it reads no sf table,
                             so decade rows would all time the same
                             work
  embed_knn_graph            NN-descent kNN graph (r13 late newborn):
                             2-cell init O(N^1.5) at sqrt-N cells +
                             two bounded-degree rounds linear in N —
                             the expected decade shape is the
                             ivf_auto class (~sqrt(10)x init term)

Timing protocol mirrors bench.py: noop-sink full evaluation,
best-of-N trials (SPARK_GRAFT_BENCH_RUNS, default 2), per-query
shuffle-write deltas from the AppStatusStore.

Usage: python tools/newborn_decade_r13.py [out.json] [dir ...]
       (dirs[0] is the baseline scale; baseline-only queries are
       keyed on position, not a path substring)
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


def bpe_train_1000(spark, sf_dir):
    from voter_gateway_spark.operators import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe.bpe_train_local(
        spark, docs, n_merges=1000, max_words=30000
    )


NEWBORNS = {
    "dedup_minhash_lsh": QUERIES["dedup_minhash_lsh"],
    "dedup_minhash_lsh_expanded": QUERIES["dedup_minhash_lsh_expanded"],
    "dedup_ngram_jaccard": QUERIES["dedup_ngram_jaccard"],
    "dedup_ngram_prefix_filtered": QUERIES["dedup_ngram_prefix_filtered"],
    "dedup_simhash": QUERIES["dedup_simhash"],
    "corpus_source_overlap": QUERIES["corpus_source_overlap"],
    "embed_semantic_dedup": QUERIES["embed_semantic_dedup"],
    "sample_cluster_mixture": QUERIES["sample_cluster_mixture"],
    "embed_cluster_report": QUERIES["embed_cluster_report"],
    "bpe_train_1000": bpe_train_1000,
    "multimodal_jpeg_decode": QUERIES["multimodal_jpeg_decode"],
    "embed_knn_graph": QUERIES["embed_knn_graph"],
    "embed_knn_clusters": QUERIES["embed_knn_clusters"],
    "embed_knn_graph_increment": QUERIES["embed_knn_graph_increment"],
    "embed_graph_dedup": QUERIES["embed_graph_dedup"],
    "text_hash_embedding": QUERIES["text_hash_embedding"],
    "docs_ann_topk": QUERIES["docs_ann_topk"],
}
# measured at the baseline dir only: reads no sf table (fixture-driven)
BASELINE_ONLY = {"multimodal_jpeg_decode"}
# the brute-force baseline path is quadratic BY CONTRACT (the scale
# answer is knn_graph/ivf over the same featurizer output): measured
# at sf0.1 (9.3 s) and x10 (84 s), skipped at x100 — 25G cosine folds
SKIP_AT_X100 = {"docs_ann_topk"}


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args else "BENCH_r13_newborns.json"
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
        app_name="vgs-newborn-decade-r13",
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
                results[d][name] = (
                    "skipped: brute-force baseline path, quadratic by contract"
                )
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
        "metric": "r13_newborn_decade",
        "runs_per_query": runs,
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
