"""Measure the persisted band index's steady-state claim: once the
corpus band index is written, a batch probe costs partition-pruned
file reads proportional to the BATCH, while the in-memory bipartite
probe (`incremental_minhash_pairs`) must re-shingle and re-sign the
ENTIRE corpus on every batch.

Usage: python tools/probe_vs_recompute.py [corpus_dir]

corpus_dir defaults to /tmp/stress_x100 (built by
`tools/stress_scale.py 100 --build-only`): 100x-replicated documents
(~500k rows). The batch is the sf0.1 originals (5k docs). Prints
build-once time, per-batch probe time, per-batch recompute time, and
asserts both produce the same pair set (the roundtrip invariant
tests/test_index_dedup.py pins at small scale, re-checked here at
stress scale).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from voter_gateway_spark.operators import dedup_ops  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x100"
    idx = "/tmp/vgs_probe_vs_recompute_idx"
    spark = build_spark(app_name="vgs-probe-vs-recompute")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    originals = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_corpus = corpus.count()

    t0 = time.time()
    dedup_ops.build_band_index(corpus, idx, "doc_id", "text")
    print(f"corpus={n_corpus} build_index_once: {time.time() - t0:.1f}s", flush=True)

    # batch sweep: the steady-state claim is that probe cost tracks the
    # BATCH (partition-pruned reads of matching (band, key-prefix)
    # buckets) while the in-memory bipartite probe re-signs the entire
    # corpus regardless of batch size. Verify pair-set equality at each
    # size (the roundtrip invariant, re-checked at stress scale).
    for n_batch in (50, 500, 5000):
        batch = originals.where(F.col("doc_id") < n_batch)
        t0 = time.time()
        probed = dedup_ops.probe_band_index(
            spark, idx, batch, "doc_id", "text", threshold=0.5
        ).collect()
        t_probe = time.time() - t0
        t0 = time.time()
        recomputed = dedup_ops.incremental_minhash_pairs(
            batch, corpus, "doc_id", "text", threshold=0.5
        ).collect()
        t_recompute = time.time() - t0
        a = {(r.new_id, r.corpus_id, r.jaccard) for r in probed}
        b = {(r.new_id, r.corpus_id, r.jaccard) for r in recomputed}
        assert a == b, f"diverged at batch={n_batch}: {len(a ^ b)} pairs"
        print(
            f"batch={n_batch:5d} pairs={len(a):7d} "
            f"probe={t_probe:6.1f}s recompute={t_recompute:6.1f}s "
            f"speedup={t_recompute / max(t_probe, 1e-9):4.1f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
