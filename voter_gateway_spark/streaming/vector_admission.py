"""Streaming SEMANTIC admission against a persisted IVF vector index —
the vector-family analogue of `streaming/index_dedup.py`: embedding
rows arrive as a stream, each micro-batch probes the PERSISTED
cell-partitioned index for its nearest existing vector
(partition-pruned reads, cost ∝ batch), near-duplicates of the
existing corpus (cosine ≥ threshold) are rejected, novel vectors are
admitted and appended INTO the index's cell layout so later batches
dedup against them too.

Composes existing pieces (no new vector math):

- `similarity.build_ivf_index` — the persisted layout (vectors
  partitioned by coarse cell + the centroid table alongside);
- `similarity.query_ivf_index` — top-1 cosine probe with `_cell IN
  (...)` partition pruning at the parquet scan;
- the optional intra-batch pass (the probe only checks
  batch-vs-corpus; two near-identical vectors in the SAME micro-batch
  would otherwise both pass): size-gated — micro-batches at/under
  2048 admitted rows run an EXACT driver-side cosine matrix (the
  union-find/bpe driver-gate precedent; measured +14 s of job latency
  for the distributed pass on a 500-row batch), larger batches fall
  back to `similarity.semantic_dedup` cell blocking;
- foreachBatch — the read-your-own-writes streaming idiom.

The quantizer is PINNED (graph_maintain's rule): admitted batches
assign into the EXISTING centroids and append to their cells —
retraining would move every cell boundary and silently change which
corpus vectors later probes see. As admissions skew the distribution,
probe recall vs the stale quantizer degrades gracefully (cells only
get fuller, never lost); rebuild the index offline when a recall
audit (embed_recall_report on the corpus) says so.

Replay semantics (the graph_maintain tier, simpler than index_dedup's
move manifests): the fold re-checks arrivals against the index's id
set with an anti-join, so a replayed batch whose append committed is
a no-op. A crash MID-append leaves some of the batch's rows in the
index; the replay admits the remainder against that state — every
replay outcome is a valid admission sequence over exactly the arrived
vectors (admission decisions are deterministic given the index state
they probe), though not byte-identical to the no-crash run. Streams
needing exactly-once file-level replay should adopt index_dedup's
manifest commit protocol.

Reference parity: beyond-reference extension (the reference has no
vector or streaming surface); completes the streaming story for the
similarity family — band-index admission (text), graph maintenance
(kNN graph), and now semantic admission (embedding space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_gateway_spark.operators import similarity
from voter_gateway_spark.session import ckpt


def bootstrap_vector_index(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int | None = None,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the initial persisted index from the existing
    corpus. Run once; admissions take over from here."""
    similarity.build_ivf_index(
        corpus, index_dir, n_centroids=n_centroids, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )


def admit_vector_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    threshold: float = 0.9,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    intra_batch: bool = True,
) -> int:
    """Admit one batch of vectors against the persisted index; returns
    the number of vectors admitted (0 = replay/no-op or all near-dup).

    Steps: (1) anti-join the batch against the index's id set (replay
    guard + never re-admit), (2) top-1 cosine probe of the persisted
    index — queries whose best match scores ≥ threshold reject;
    queries with NO candidate in their probed cells admit, (3) the
    optional intra-batch semantic_dedup pass keeps the min-id
    representative of each within-batch near-dup group, (4) admitted
    vectors assign into the PINNED centroids and append to their cell
    partitions."""
    vecs_path = f"{index_dir}/vectors"
    existing = spark.read.parquet(vecs_path)
    new = (
        batch.select(id_col, vec_col)
        .dropDuplicates([id_col])
        .join(existing.select(id_col), id_col, "left_anti")
    )
    new = ckpt(new)
    if not new.take(1):
        return 0
    top = similarity.query_ivf_index(
        spark, index_dir, new, k=1, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, exclude_self=False,
    )
    rejected = top.where(F.col("cos_sim") >= threshold).select(
        F.col("query_id").alias(id_col)
    )
    admitted = ckpt(new.join(rejected, id_col, "left_anti"))
    n_admitted = admitted.count()
    if intra_batch and n_admitted > 1:
        if n_admitted <= 2048:
            # size-gated DRIVER pass (the union-find/bpe precedent):
            # a micro-batch-sized b² cosine matrix in numpy costs
            # microseconds where the distributed semantic_dedup pass
            # costs ~10 of jobs (measured +14 s on a 500-row batch) —
            # and it is EXACT (no cell blocking, so no escaped pairs).
            # Same drop rule as semantic_dedup: drop any vector with
            # ANY smaller-id batch neighbor at round-6 cosine ≥
            # threshold (regardless of that neighbor's own fate).
            import numpy as np

            rows = admitted.select(id_col, vec_col).collect()
            rows.sort(key=lambda r: r[0])
            ids = [r[0] for r in rows]
            V = np.array([[float(x) for x in r[1]] for r in rows])
            nrm = np.linalg.norm(V, axis=1)
            safe = np.where(nrm == 0, 1.0, nrm)
            sims = np.round((V @ V.T) / np.outer(safe, safe), 6)
            sims[:, nrm == 0] = -2.0  # zero-norm never matches
            sims[nrm == 0, :] = -2.0
            drop = {
                ids[i]
                for i in range(1, len(ids))
                if (sims[i, :i] >= threshold).any()
            }
            if drop:
                keep_ids = [i for i in ids if i not in drop]
                admitted = ckpt(
                    admitted.where(F.col(id_col).isin(keep_ids))
                )
                n_admitted = admitted.count()
        else:
            # cell count sized to the BATCH, floorless: the auto
            # quantizer's max(16, √N) floor would seed more cells than
            # a micro-batch has vectors, putting every vector alone in
            # its cell and blinding the same-cell pairing entirely. √b
            # cells keep the pass at the semantic_dedup economics;
            # like all cell blocking, cross-cell near-dup pairs can
            # escape and then BOTH land in the index — the caveat
            # semantic_dedup itself carries; a periodic offline
            # semantic_dedup over the corpus is the cleanup path.
            import math

            dups = similarity.semantic_dedup(
                admitted, id_col=id_col, vec_col=vec_col,
                threshold=threshold,
                n_centroids=max(1, math.isqrt(n_admitted)),
            ).select(F.col("dup_id").alias(id_col))
            admitted = ckpt(admitted.join(dups, id_col, "left_anti"))
            n_admitted = admitted.count()
    if n_admitted == 0:
        return 0
    cents = spark.read.parquet(f"{index_dir}/centroids")
    a = admitted.select(
        F.col(id_col).alias("_cid"),
        similarity.as_double_array(vec_col).alias("_cv"),
    )
    assigned = similarity._nearest_cells(a, "_cv", cents, 1)
    # coalesce before the partitioned append: a micro-batch scattered
    # over the session's shuffle partitions writes up to
    # partitions×cells tiny files PER BATCH, and every later probe and
    # anti-join pays the listing; one input partition writes exactly
    # one file per touched cell. Micro-batches are small by
    # definition — a bulk backfill should go through
    # bootstrap_vector_index instead.
    (
        assigned.select(
            F.col("_cid").alias(id_col), F.col("_cv").alias(vec_col), "_cell"
        )
        .coalesce(1)
        .write.mode("append")
        .partitionBy("_cell")
        .parquet(vecs_path)
    )
    return n_admitted


def stream_vector_admission(
    vec_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    intra_batch: bool = True,
):
    """writeStream writer admitting each micro-batch against the
    persisted index. Caller picks the trigger and calls .start()."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        admit_vector_batch(
            batch.sparkSession,
            batch,
            index_dir,
            threshold=threshold,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            intra_batch=intra_batch,
        )

    return (
        vec_stream.writeStream.foreachBatch(_body)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
