"""Streaming upsert sink: run the engine's match/merge plans per
micro-batch via foreachBatch — the standard Structured Streaming
pattern for sinks whose semantics the built-in file sinks can't
express (MERGE/upsert).

This closes the loop between the reference's batch upsert (M1/M2,
import_job.rb) and a streaming ingest: each micro-batch becomes the
SOURCE side of a MatchPlan cascade + MergePlan against the persisted
target, and the merged result replaces the target transactionally
(write-new-then-swap, the sinks.overwrite_partitions posture — a
reader never sees a half-written table).

Scale posture: per-batch cost is one pk-keyed join of (batch ×
target). On a real lake the target should be Delta/Iceberg and the
body of `_apply_batch` becomes a storage-layer MERGE INTO
(sources/merge_sink.py lowers MergePlan exactly that way) — the
parquet-rewrite form here is the dependency-free fallback, correct at
any scale but with O(target) write amplification per batch. Exactly-
once: foreachBatch may retry a batch after a failure; the swap is
idempotent for a replayed batch because matching is keyed (a re-merged
row merges to the same values).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from voter_gateway_spark.plans import MatchPlan, MergePlan


def stream_upsert_parquet(
    stream: DataFrame,
    target_dir: str,
    pk: str,
    match_columns: list[list[str]],
    merge_plan: MergePlan | None = None,
    source_id: str | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "vgs_stream_upsert",
):
    """Attach a foreachBatch upsert sink to a streaming DataFrame.

    Per micro-batch: cascade-match the batch against the current
    target (one rule per `match_columns` group, reference J2
    semantics), apply `merge_plan` (default: plain last-write-wins
    upsert), and atomically swap the rewritten target. Returns the
    started StreamingQuery."""
    plan = merge_plan or MergePlan(target_pk=pk)

    def _apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        target = spark.read.parquet(target_dir)
        mp = MatchPlan(batch, target, target_pk=pk, source_id=source_id)
        for cols in match_columns:
            mp.find_exact_matches(cols)
        merged = plan.execute(mp.matches(), target).target
        # write-new-then-swap: the new version lands beside the live
        # one, then replaces it with two renames. Readers of the old
        # path either see the complete old or complete new version.
        tmp = f"{target_dir}__v{batch_id}_{uuid.uuid4().hex[:6]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{target_dir}__old_{uuid.uuid4().hex[:6]}"
        os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(_apply_batch)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def bootstrap_target(
    spark: SparkSession, target_dir: str, initial: DataFrame
) -> None:
    """Materialize the initial target table for a streaming upsert."""
    initial.write.mode("overwrite").parquet(target_dir)
