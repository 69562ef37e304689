"""Decade measurements for the r11-newborn operators — wall + shuffle
at sf0.1 and the x10 / x100 key-offset replicas (built by
tools/stress_scale.py), written as BENCH_r12_newborns.json:

  corpus_domain_report    per-domain quality/dup rollup
  sample_domain_filtered  block/allowlist admission + selection
  pipeline_corpus_build   the full gate -> split -> mixture -> packing
                          composite (the attrition-ledger report form)
  embed_ivfpq_topk        the ORACLE form (fixed 16 coarse cells) —
                          measured at sf0.1 only: with cells fixed,
                          candidates grow as |Q| x N/16, quadratic by
                          disclosed design exactly like
                          embed_ivf_lloyd_topk (the catalog's
                          determinism form, not the scale path)
  embed_ivfpq_auto        the SCALE form: auto-sqrt(N) coarse cells,
                          same PQ codebooks/ADC scoring — the IVF-PQ
                          counterpart of embed_ivf_auto_topk, measured
                          across all three decades

Timing protocol mirrors bench.py: noop-sink full evaluation,
best-of-N trials (SPARK_GRAFT_BENCH_RUNS, default 2 here — decade
runs are long), per-query shuffle-write deltas from the
AppStatusStore.

Usage: python tools/newborn_decade.py [out.json] [dir ...]
       (default dirs: /root/testdata/sf0.1 /tmp/stress_x10 /tmp/stress_x100)
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
from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def embed_ivfpq_auto(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") % 10 == 0)
    return similarity.ivfpq_topk(
        qs, emb, k=5, m=8, ks=16, pq_iters=1,
        n_centroids=None, n_probe=4, coarse_iters=0, centroid_round=9,
    )


def embed_ivfpq_residual_auto(spark, sf_dir):
    # the residual scale form: auto-sqrt(N) cells with ONE coarse
    # Lloyd round (residuals need cell MEANS, not seed vectors — see
    # embed_ivfpq_residual_topk's docstring)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") % 10 == 0)
    return similarity.ivfpq_topk(
        qs, emb, k=5, m=8, ks=16, pq_iters=1,
        n_centroids=None, n_probe=4, coarse_iters=1, centroid_round=9,
        residual=True,
    )


NEWBORNS = {
    "corpus_domain_report": QUERIES["corpus_domain_report"],
    "sample_domain_filtered": QUERIES["sample_domain_filtered"],
    "pipeline_corpus_build": QUERIES["pipeline_corpus_build"],
    "embed_ivfpq_topk": QUERIES["embed_ivfpq_topk"],
    "embed_ivfpq_auto": embed_ivfpq_auto,
    "embed_ivfpq_residual_topk": QUERIES["embed_ivfpq_residual_topk"],
    "embed_ivfpq_residual_auto": embed_ivfpq_residual_auto,
    "sample_domain_mixture": QUERIES["sample_domain_mixture"],
    "text_nb_quality_score": QUERIES["text_nb_quality_score"],
    "text_nb_calibration": QUERIES["text_nb_calibration"],
    "sample_cluster_mixture": QUERIES["sample_cluster_mixture"],
    "embed_cluster_report": QUERIES["embed_cluster_report"],
}
# the fixed-cell oracle forms are quadratic by design past sf0.1
SKIP_PAST_SF01 = {"embed_ivfpq_topk", "embed_ivfpq_residual_topk"}


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args else "BENCH_r12_newborns.json"
    dirs = args[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/stress_x10",
        "/tmp/stress_x100",
    ]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = build_spark(
        app_name="vgs-newborn-decade",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for i, d in enumerate(dirs):
        # dirs[0] is the baseline scale; the quadratic-by-design forms
        # run only there (keyed on position, not a path substring —
        # a baseline outside /root/testdata must still run them and a
        # stress replica under a 'testdata'-containing path must not).
        is_baseline = i == 0
        results[d] = {}
        for name, fn in NEWBORNS.items():
            if name in SKIP_PAST_SF01 and not is_baseline:
                results[d][name] = "skipped: fixed-cell oracle form is quadratic by design"
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
    out = {"metric": "r12_newborn_decade", "runs_per_query": runs, "results": results}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
