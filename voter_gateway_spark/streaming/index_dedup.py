"""Streaming near-dup admission against a persisted MinHash band index
— the production shape of continuous corpus ingestion: documents
arrive as a stream, each micro-batch probes the PERSISTED corpus index
(partition-pruned scans, cost ∝ batch), near-dups of the existing
corpus are rejected, novel documents are admitted to the corpus
directory AND appended to the index so later batches dedup against
them too.

Composes three existing pieces (no new dedup math):

- `dedup_ops.probe_band_index` — batch-vs-corpus candidate pairs with
  exact Jaccard verification (recall governed by the banding, precision
  exact);
- `dedup_ops.minhash_hashed_sigs` / `_minhash_band_rows` — the same
  signature pipeline appends admitted docs' band rows to the index
  (append-mode parquet into the same (band, key-prefix) partition
  layout, so the next probe prunes over old + new alike);
- foreachBatch — the Structured Streaming idiom for sinks with
  read-your-own-writes semantics (the built-in sinks can't express
  "filter against what I've already written").

Intra-batch duplicates: the probe only checks batch-vs-corpus, so two
near-identical docs arriving in the SAME micro-batch would both pass.
The batch-internal pass collapses exact duplicates (min-id wins) and,
with `intra_batch=True` (default), runs the in-memory LSH pair search
within the batch and keeps the min-id representative of each pair.

Replay caveat (stated, not hidden): foreachBatch can re-run a batch
after a crash. Admission is idempotent at the DOCUMENT level only if
doc_ids are stable across replays — the corpus append uses doc_id-
keyed parquet files but does NOT deduplicate appends; pair a replayed
source with the `_vgs_batch_id` marker pattern from upsert_sink when
exactly-once admission matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_gateway_spark.operators.dedup_ops import (
    _minhash_band_rows,
    build_band_index,
    minhash_hashed_sigs,
    minhash_lsh_pairs,
    probe_band_index,
)
from voter_gateway_spark.session import ckpt


def admit_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    corpus_path: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    intra_batch: bool = True,
) -> DataFrame:
    """One admission round (the foreachBatch body, callable in batch
    tests directly): probe the persisted index, reject near-dups of the
    corpus, optionally dedup within the batch, append survivors to the
    corpus and their band rows + hash sets to the index. Returns the
    ADMITTED frame (materialized before the writes)."""
    meta = spark.read.parquet(f"{index_path}/meta").collect()[0]
    dup_ids = (
        probe_band_index(
            spark, index_path, batch, id_col, text_col, threshold=threshold
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    admitted = batch.join(dup_ids, id_col, "left_anti")
    if intra_batch:
        pairs = minhash_lsh_pairs(
            admitted, id_col, text_col,
            k=meta.k, n_hashes=meta.n_hashes, bands=meta.bands,
            threshold=threshold,
        )
        # keep the min-id side of every near-dup pair (id_a < id_b by
        # construction), drop the other
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        admitted = admitted.join(losers, id_col, "left_anti")
    admitted = admitted.transform(ckpt)
    if not admitted.take(1):
        return admitted
    admitted.write.mode("append").parquet(corpus_path)
    base = minhash_hashed_sigs(admitted, id_col, text_col, meta.k, meta.n_hashes)
    rows = _minhash_band_rows(base, meta.bands, meta.n_hashes // meta.bands)
    # appends must mirror the layout meta records: with the auto-sized
    # prefix_len=0 build there are NO _kp/_ip partition directories —
    # appending them would leave conflicting partition columns in one
    # dataset and every later read fails
    b_out = rows.select(F.col("_id").alias("corpus_id"), "_b", "_k")
    b_parts = ["_b"]
    if meta.prefix_len > 0:
        b_out = b_out.withColumn(
            "_kp",
            F.substring(F.md5(F.col("_k").cast("binary")), 1, meta.prefix_len),
        )
        b_parts.append("_kp")
    b_out.write.mode("append").partitionBy(*b_parts).parquet(f"{index_path}/bands")
    h_out = base.select(F.col("_id").alias("corpus_id"), F.col("_hh").alias("_shb"))
    if meta.prefix_len > 0:
        h_out = h_out.withColumn(
            "_ip",
            F.substring(
                F.md5(F.col("corpus_id").cast("string").cast("binary")),
                1, meta.prefix_len,
            ),
        )
        h_out.write.mode("append").partitionBy("_ip").parquet(f"{index_path}/hashes")
    else:
        h_out.write.mode("append").parquet(f"{index_path}/hashes")
    return admitted


def stream_dedup_against_index(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    intra_batch: bool = True,
    checkpoint_dir: str | None = None,
    query_name: str = "vgs_index_dedup",
):
    """Attach the index-probing admission sink to a document stream.
    Bootstrap the index once with `bootstrap_index`; then every
    micro-batch admits only documents that are near-dups of neither
    the corpus nor (with intra_batch) each other. Returns the writer;
    call .start()."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        admit_batch(
            batch.sparkSession, batch, index_path, corpus_path,
            id_col, text_col, threshold=threshold, intra_batch=intra_batch,
        )

    writer = (
        stream.writeStream.foreachBatch(_body)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def bootstrap_index(
    corpus: DataFrame,
    index_path: str,
    corpus_path: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Materialize the initial corpus + its band index (build once;
    admission rounds append)."""
    corpus.write.mode("overwrite").parquet(corpus_path)
    build_band_index(
        corpus, index_path, id_col, text_col,
        k=k, n_hashes=n_hashes, bands=bands,
    )
