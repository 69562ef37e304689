"""Hashed-unigram naive-Bayes quality classifier — the trained rung
between rule gates (text.gopher_rules) and the trigram LM
(operators/lm.py): per-token weights are the smoothed log-odds of the
token's HASH BUCKET between positive- and negative-labeled training
docs, and a document's score is its mean token weight. The
SQL-expressible member of the linear bag-of-words family the
CCNet/DCLM fastText quality gate belongs to — trainable in one
aggregation pass, no SGD.

Factored out of queries.text_nb_quality_score (which delegates here,
the operators/lm.py precedent) so the streaming admission path can
pin a trained reference and gate micro-batches against it
(streaming/quality.py nb_gate).

Scale contract: feature hashing (md5_hash60 % buckets) bounds the
weight table at `buckets` rows regardless of corpus vocabulary —
Heaps' law grows the LM count tables sublinearly but grows them; this
broadcast is CONSTANT. Training is one bucket-keyed count aggregation;
scoring is one token explode + one broadcast join + a per-doc avg.

Determinism (the oracle contract shared with queries._nb_quality_sql):
weights snapped to 9 decimals (the Lloyd grid), per-doc means rounded
to 6 (the LM contract), Laplace alpha=0.5 keeps every log argument
positive even for a one-class corpus.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from voter_gateway_spark.operators import text
from voter_gateway_spark.operators.dedup_ops import md5_hash60
from voter_gateway_spark.session import ckpt_lazy

DEFAULT_BUCKETS = 65536


class NBReference(NamedTuple):
    """Pinned classifier snapshot: the (bucket, weight) table, the
    1-row unseen-bucket weight frame, and the bucket count that hashed
    them (scoring must reuse it — a mismatch silently scores against
    the wrong buckets, so score_from_buckets asserts it)."""

    weights: DataFrame  # (_b, _wt)
    unseen: DataFrame  # 1 row: (_u)
    buckets: int


def token_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """One row per (doc, token) with the token's hash bucket — the
    shared projection between training and scoring (the
    lm.tables_from_arrays hook pattern: a self-scoring caller
    checkpoints this ONCE and feeds both sides). Zero-token docs
    simply contribute no rows."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(text.tokens(text_col, lower=True)).alias("_w"),
        ).select("doc_id", (md5_hash60(F.col("_w")) % buckets).alias("_b"))
    )


def train_from_buckets(
    labeled: DataFrame, buckets: int = DEFAULT_BUCKETS, materialize: bool = False
) -> NBReference:
    """Log-odds weights from a (doc_id, _b, <label>) frame where the
    label column is a boolean named `pass_gopher` (the bootstrap
    convention) — one bucket-keyed count aggregation + two 1-row
    normalizations. `materialize` checkpoints the tables (the pinned
    build-once/score-many streaming shape)."""
    cnts = labeled.groupBy("_b").agg(
        F.sum(F.when(F.col("pass_gopher"), 1).otherwise(0))
        .cast("double")
        .alias("_pc"),
        F.sum(F.when(~F.col("pass_gopher"), 1).otherwise(0))
        .cast("double")
        .alias("_nc"),
    )
    tot = cnts.agg(F.sum("_pc").alias("_pt"), F.sum("_nc").alias("_nt"))
    smooth = 0.5 * buckets
    w = cnts.crossJoin(F.broadcast(tot)).select(
        "_b",
        F.round(
            F.log((F.col("_pc") + 0.5) / (F.col("_pt") + smooth))
            - F.log((F.col("_nc") + 0.5) / (F.col("_nt") + smooth)),
            9,
        ).alias("_wt"),
    )
    unseen = tot.select(
        F.round(
            F.log(F.lit(0.5) / (F.col("_pt") + smooth))
            - F.log(F.lit(0.5) / (F.col("_nt") + smooth)),
            9,
        ).alias("_u")
    )
    if materialize:
        w = w.transform(ckpt_lazy)
        unseen = unseen.transform(ckpt_lazy)
    return NBReference(w, unseen, buckets)


def build_reference(
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
    min_words: int = 20,
    max_words: int = 100_000,
    min_stop_words: int = 1,
) -> NBReference:
    """Pinned classifier from a static training corpus with the CCNet
    bootstrap labeling: positives are the docs passing the Gopher
    composite at the given thresholds (quality_filter's defaults).
    Tables are checkpointed — build once, score many micro-batches."""
    lab = text.gopher_rules(
        train_df,
        text_col=text_col,
        id_col=id_col,
        min_words=min_words,
        max_words=max_words,
        min_stop_words=min_stop_words,
    ).select(F.col(id_col).alias("doc_id"), "pass_gopher")
    bucketed = token_buckets(train_df, text_col, id_col, buckets).join(
        lab, "doc_id"
    )
    return train_from_buckets(bucketed, buckets, materialize=True)


def score_from_buckets(
    bucketed: DataFrame, ref: NBReference, buckets: int | None = None
) -> DataFrame:
    """(doc_id, nb_score) from an already-projected token_buckets
    frame — the shared-materialization hook. Docs absent from the
    frame (zero tokens) produce no score row.

    Pass the `buckets` the frame was hashed with when it was built by
    a direct token_buckets call — a frame hashed with a different
    count than ref.buckets silently scores against the wrong buckets,
    so a mismatch is an assertion error, not a wrong answer.

    Determinism: weights lie on the 1e-9 grid, so the per-doc mean is
    computed as an exact bigint sum of round(_wt*1e9) divided once by
    count*1e9 — a float avg of round-9 values can land exactly on a
    .5e-6 rounding boundary where shuffle/fold order decides the side
    (the documented rounded-mean boundary-flake class)."""
    if buckets is not None:
        assert buckets == ref.buckets, (
            f"token_buckets frame hashed with {buckets} buckets but "
            f"reference was trained with {ref.buckets}"
        )
    return (
        bucketed.join(F.broadcast(ref.weights), "_b", "left")
        .crossJoin(F.broadcast(ref.unseen))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.coalesce("_wt", F.col("_u")) * 1000000000.0, 0
                    ).cast("bigint")
                )
                / (F.count(F.lit(1)) * 1000000000.0),
                6,
            ).alias("nb_score")
        )
    )


def score(
    df: DataFrame,
    ref: NBReference,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, nb_score) for every tokenizable row of `df` against the
    pinned reference."""
    assert ref.buckets > 0
    out = score_from_buckets(
        token_buckets(df, text_col, id_col, ref.buckets),
        ref,
        buckets=ref.buckets,
    )
    return out.withColumnRenamed("doc_id", id_col) if id_col != "doc_id" else out
