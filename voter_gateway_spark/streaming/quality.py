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

The trained gates join the path via PINNED reference snapshots built
over a static corpus and scored as plain batch ops inside the
foreachBatch body — no streaming-aggregation state; the tables enter
each micro-batch as checkpointed static joins. Pass `lm_ref` +
`logprob_floor` (trigram-LM perplexity gate,
operators/lm.py:build_reference) and/or `nb_ref` + `nb_floor`
(naive-Bayes classifier gate, operators/nbq.py:build_reference —
a CONSTANT 2^16-row broadcast regardless of corpus vocabulary) to
stream_quality_admission to enable them; both given, the LM gate
runs first.

Reference shape: csv_driver.rb's ingest-time filtering (malformed-row
rejection at the boundary), upgraded to corpus-quality semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from voter_gateway_spark.operators import lm, nbq, text
from voter_gateway_spark.streaming.index_dedup import (
    admit_batch,
    stream_dedup_against_index,
)
from voter_gateway_spark.streaming.upsert_sink import _current_query_id

# Output columns the two gate projections add alongside the payload.
# A payload column with one of these names would come out duplicated
# (ambiguous downstream where()/select), so quality_filter rejects it
# up front with a clear error instead.
_GATE_OUTPUT_COLS = frozenset(
    {
        # text.gopher_rules outputs + staging temporaries
        "n_words",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_symbol_ratio",
        "ok_bullet_lines",
        "ok_ellipsis_lines",
        "ok_alpha_words",
        "ok_stop_words",
        "pass_gopher",
        "_t",
        "_w",
        "_l",
        # text.encoding_anomaly outputs
        "n_replacement",
        "n_control",
        "n_mojibake",
        "is_suspect",
    }
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
    clash = sorted(set(payload) & _GATE_OUTPUT_COLS)
    if clash:
        raise ValueError(
            "quality_filter: payload column(s) %s collide with the "
            "quality-gate output columns; rename them before filtering "
            "(reserved: %s)" % (clash, sorted(_GATE_OUTPUT_COLS))
        )
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
    lm_ref: "lm.LMReference | None" = None,
    logprob_floor: float | None = None,
    nb_ref: "nbq.NBReference | None" = None,
    nb_floor: float | None = None,
):
    """Quality-gated exactly-once streaming admission: the stateless
    quality_filter runs inside the stream plan (scan stage of each
    micro-batch); optionally the trigram-LM gate scores each batch
    against the pinned `lm_ref` tables (batch op inside foreachBatch,
    keeping only docs with mean_logprob >= `logprob_floor`) and/or
    the naive-Bayes classifier gate scores it against the pinned
    `nb_ref` weights (keeping docs with nb_score >= `nb_floor`; 0.0
    is the balanced log-odds threshold); then the index-probing dedup
    admission appends the survivors to the corpus + band index with
    the crash-safe staged protocol. Returns the writer; call .start().

    Per-batch cost: the stateless gates add ZERO shuffles or state to
    stream_dedup_against_index's profile; the LM gate adds the
    batch-sized trigram explode + count-table joins (tables
    checkpointed once at build, so no per-batch recompute); the NB
    gate adds one batch-sized token explode + a CONSTANT 2^16-row
    broadcast join — the cheapest trained gate in the ladder."""
    filtered = quality_filter(
        stream,
        text_col=text_col,
        id_col=id_col,
        min_words=min_words,
        max_words=max_words,
        min_stop_words=min_stop_words,
    )
    if lm_ref is None and nb_ref is None:
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
    if lm_ref is not None and logprob_floor is None:
        raise ValueError("logprob_floor is required when lm_ref is given")
    if nb_ref is not None and nb_floor is None:
        raise ValueError("nb_floor is required when nb_ref is given")
    # own foreachBatch body: the trained gates must run on the
    # materialized micro-batch (batch-op joins against the pinned
    # tables), which stream_dedup_against_index's body has no hook
    # for. Lineage resolution mirrors it: the query id comes from the
    # session that OWNS the query, not foreachBatch's cloned session.
    owner_spark = stream.sparkSession

    def _body(batch: DataFrame, batch_id: int) -> None:
        passed = batch
        if lm_ref is not None:
            passed = lm_gate(passed, lm_ref, logprob_floor,
                             text_col=text_col, id_col=id_col)
        if nb_ref is not None:
            passed = nb_gate(passed, nb_ref, nb_floor,
                             text_col=text_col, id_col=id_col)
        admit_batch(
            batch.sparkSession, passed, index_path, corpus_path,
            id_col, text_col, threshold=threshold, intra_batch=intra_batch,
            batch_id=batch_id,
            query_id=_current_query_id(owner_spark, query_name),
        )

    writer = (
        filtered.writeStream.foreachBatch(_body)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def lm_gate(
    df: DataFrame,
    lm_ref: "lm.LMReference",
    logprob_floor: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows whose trigram mean_logprob against the pinned reference is
    >= the floor, payload preserved. Batch op — used both by the
    streaming body above and by parity tests' batch reference. NB:
    docs with < 3 tokens have no trigram score and are dropped, the
    same convention as pipeline_quality_gate (its word-count gate
    upstream makes the case vacuous there)."""
    passed = (
        lm.score(df, lm_ref, text_col=text_col, id_col=id_col)
        .where(F.col("mean_logprob") >= logprob_floor)
        .select(id_col)
    )
    return df.join(passed, id_col)


def nb_gate(
    df: DataFrame,
    nb_ref: "nbq.NBReference",
    nb_floor: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows whose naive-Bayes log-odds score against the pinned
    classifier is >= the floor, payload preserved. Batch op — used by
    the streaming body above and by parity tests' batch reference.
    NB: zero-token docs have no score and are dropped (the mean
    doesn't exist — the lm_gate convention; quality_filter's
    word-count gate upstream makes the case vacuous in the admission
    path)."""
    passed = (
        nbq.score(df, nb_ref, text_col=text_col, id_col=id_col)
        .where(F.col("nb_score") >= nb_floor)
        .select(id_col)
    )
    return df.join(passed, id_col)
