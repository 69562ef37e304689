"""Measure IVF recall@k against brute-force ground truth at stress
scale — the honesty check on the auto-√N cell count: more cells at a
fixed n_probe means each query scans a smaller corpus fraction, so the
quadratic fix MUST be paired with a measured recall number, not just a
faster wall clock.

Usage: python tools/ivf_recall.py [corpus_dir] [n_queries]

Samples `n_queries` query vectors deterministically (smallest md5(id),
the engine's usual reproducible-sample idiom), computes exact
brute-force top-k over the full corpus for just that sample (cheap:
|sample| × N pairs), and reports recall@k for:
  - fixed-16 cells / n_probe=4 (the oracle-pinned catalog form)
  - auto-√N cells / n_probe=4  (the scale form)
  - auto-√N cells / n_probe scaled to match the fixed form's corpus
    fraction budget on a per-query basis (n_probe = cells/4)
  - IVF-PQ at both cell counts (r12): the same coarse pruning with
    ADC scoring over m=8/ks=16 product-quantization codes — recall
    here pays BOTH the cell-pruning and the code-quantization
    approximations, the number embed_recall_report's `pq` row tracks
    at catalog scale and this tool tracks at stress scale
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from voter_gateway_spark.operators import similarity  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x100"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    k = 5
    spark = build_spark(app_name="vgs-ivf-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    n = emb.count()
    qids = [
        r.vec_id
        for r in emb.select(
            "vec_id", F.md5(F.col("vec_id").cast("string").cast("binary")).alias("_h")
        )
        .orderBy("_h")
        .limit(n_queries)
        .collect()
    ]
    queries = emb.where(F.col("vec_id").isin(qids)).localCheckpoint(eager=True)

    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(queries, emb, k=k).collect()
    }
    print(f"corpus={n} queries={len(qids)} truth_pairs={len(truth)}", flush=True)

    def recall(name, df, t0):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        dt = time.time() - t0
        r = len(got & truth) / len(truth)
        print(f"{name}: recall@{k}={r:.3f}  ({dt:.1f}s)", flush=True)

    import math

    cells = max(16, math.ceil(math.sqrt(n)))
    for name, kw in [
        ("fixed16_probe4", dict(n_centroids=16, n_probe=4)),
        ("auto_probe4", dict(n_centroids=None, n_probe=4)),
        (f"auto_probe{cells // 4}", dict(n_centroids=None, n_probe=cells // 4)),
    ]:
        t0 = time.time()
        recall(
            name,
            similarity.ivf_topk(queries, emb, k=k, iters=2, centroid_round=9, **kw),
            t0,
        )
    for name, kw in [
        ("ivfpq_fixed16_probe4", dict(n_centroids=16, coarse_iters=0)),
        ("ivfpq_auto_probe4", dict(n_centroids=None, coarse_iters=2)),
    ]:
        t0 = time.time()
        recall(
            name,
            similarity.ivfpq_topk(
                queries, emb, k=k, m=8, ks=16, pq_iters=1,
                n_probe=4, centroid_round=9, **kw,
            ),
            t0,
        )
    spark.stop()


if __name__ == "__main__":
    main()
