"""Streaming quality admission — the ONLINE form of the
pipeline_quality_gate front half: arriving documents pass the
stateless gates (Gopher rules + encoding-anomaly rejection) inside
the stream, and the survivors flow into the exactly-once index-probing
dedup admission (index_dedup.stream_dedup_against_index).

Both gates are scan-stage projections (zero UDFs, zero state, zero
watermark), so the SAME code path runs on a static frame and on a
stream micro-batch — the parity test's contract
(tests/test_streaming_quality.py): filtering then streaming admits
exactly the set that batch-filtering admits.

The trigram-LM perplexity gate is deliberately NOT in the streaming
path yet: its count tables are corpus-derived state that belongs in a
stream-static broadcast join against a pinned reference snapshot —
the offline composite (queries.pipeline_quality_gate) covers it, and
wiring the pinned-snapshot join is the natural next increment.

Reference shape: csv_driver.rb's ingest-time filtering (malformed-row
rejection at the boundary), upgraded to corpus-quality semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from voter_gateway_spark.operators import text
from voter_gateway_spark.streaming.index_dedup import (
    stream_dedup_against_index,
)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_stop_words: int = 1,
) -> DataFrame:
    """Rows passing the Gopher composite AND free of encoding damage,
    with the input payload preserved. Stateless — valid on static
    frames and streams alike. Thresholds default to the relaxed
    pipeline_quality_gate values; pass the paper defaults (50 / 2)
    for English-crawl corpora."""
    payload = [c for c in df.columns if c != id_col]
    gated = text.gopher_rules(
        df,
        text_col=text_col,
        id_col=id_col,
        min_words=min_words,
        max_words=max_words,
        min_stop_words=min_stop_words,
        extra_cols=payload,
    ).where("pass_gopher")
    clean = text.encoding_anomaly(
        gated,
        text_col=text_col,
        id_col=id_col,
        extra_cols=payload,
    ).where(~F.col("is_suspect"))
    return clean.select(id_col, *payload)


def stream_quality_admission(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    min_words: int = 20,
    max_words: int = 100_000,
    min_stop_words: int = 1,
    intra_batch: bool = True,
    checkpoint_dir: str | None = None,
    query_name: str = "vgs_quality_admission",
):
    """Quality-gated exactly-once streaming admission: the stateless
    quality_filter runs inside the stream plan (scan stage of each
    micro-batch), then the index-probing dedup admission appends the
    survivors to the corpus + band index with the crash-safe staged
    protocol. Returns the writer; call .start().

    Per-batch cost: the gates add ZERO shuffles or state to
    stream_dedup_against_index's profile — the plan's admission
    shape (partition-pruned index probe + batch-sized verify) is
    unchanged, the batch entering it is just smaller."""
    filtered = quality_filter(
        stream,
        text_col=text_col,
        id_col=id_col,
        min_words=min_words,
        max_words=max_words,
        min_stop_words=min_stop_words,
    )
    return stream_dedup_against_index(
        filtered,
        index_path,
        corpus_path,
        id_col,
        text_col,
        threshold=threshold,
        intra_batch=intra_batch,
        checkpoint_dir=checkpoint_dir,
        query_name=query_name,
    )
