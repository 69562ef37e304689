"""Trigram Stupid-Backoff language model as reusable pieces (Brants
et al. 2007, public): count-table building and document scoring,
factored out of queries.text_trigram_logprob so the OFFLINE composite
(pipeline_quality_gate), the catalog query, and the STREAMING
admission path (streaming/quality.py) share one implementation —
same formulas, same plan shapes, no drift.

    S(c|p1,p2) = count(p1,p2,c)/count(p1,p2)   trigram seen
               = 0.4  * count(p2,c)/count(p2)  else, bigram seen
               = 0.4^2 * count(c)/N            else (0.16 unigram)
               = 0.4^2 * 1/N                   unseen unigram

Plan shapes (unchanged from the r9 query): ONE scan builds each doc's
token/bigram/trigram struct arrays via sliced zip_with (scan-stage;
slices clamp with greatest(n-k, 0)); the count tables are
vocabulary-bounded (Heaps'-law sublinear) and lazily checkpointed so
steady-state callers pay the build once; the bigram table is probed
TWICE from one materialization (context + backoff); unigram joins are
broadcast-hinted.

For streaming, `build_reference` pins the tables from a static
reference corpus and `score` runs as a plain batch op inside
foreachBatch — no streaming aggregation state; the tables enter each
micro-batch as broadcast/static joins.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from voter_gateway_spark.session import ckpt_lazy


class LMReference(NamedTuple):
    """Pinned count tables: unigram (w, cw), bigram (p, c, cb),
    trigram (p1, p2, c, c3), and the 1-row total (_n)."""

    uni: DataFrame
    big: DataFrame
    tric: DataFrame
    total: DataFrame


def _token_arrays(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _t, _bg, _tg): token array + bigram/trigram struct arrays,
    one scan-stage projection."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.filter(F.split(F.lower(norm), " "), lambda t: t != "")
    n1 = F.greatest(F.size("_t") - 1, F.lit(0))
    n2 = F.greatest(F.size("_t") - 2, F.lit(0))
    tri = F.zip_with(
        F.zip_with(
            F.slice("_t", 1, n2),
            F.slice("_t", 2, n2),
            lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
        ),
        F.slice("_t", 3, n2),
        lambda ab, c: F.struct(
            ab["p1"].alias("p1"), ab["p2"].alias("p2"), c.alias("c")
        ),
    )
    return df.select(F.col(id_col), toks.alias("_t")).select(
        id_col,
        "_t",
        F.zip_with(
            F.slice("_t", 1, n1),
            F.slice("_t", 2, n1),
            lambda a, b: F.struct(a.alias("p"), b.alias("c")),
        ).alias("_bg"),
        tri.alias("_tg"),
    )


def build_reference(
    train_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> LMReference:
    """Count tables from a training corpus, each lazily checkpointed —
    build once, score many (the steady-state/streaming shape)."""
    base = _token_arrays(train_df, text_col, id_col).transform(ckpt_lazy)
    return tables_from_arrays(base)


def tables_from_arrays(base: DataFrame) -> LMReference:
    """Count tables from an already-projected (and ideally already
    checkpointed) `_token_arrays` frame — the hook that lets a
    self-scoring caller (text_trigram_logprob) share ONE corpus
    materialization between the training slice and the scoring side
    instead of building the arrays twice."""
    uni = (
        base.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .transform(ckpt_lazy)
    )
    total = uni.agg(F.sum("cw").cast("double").alias("_n"))
    big = (
        base.select(F.explode("_bg").alias("b"))
        .groupBy(F.col("b.p").alias("p"), F.col("b.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cb"))
        .transform(ckpt_lazy)
    )
    tric = base.select(F.explode("_tg").alias("t")).groupBy(
        F.col("t.p1").alias("p1"),
        F.col("t.p2").alias("p2"),
        F.col("t.c").alias("c"),
    ).agg(F.count(F.lit(1)).alias("c3"))
    return LMReference(uni, big, tric, total)


def score(
    df: DataFrame,
    ref: LMReference,
    text_col: str = "text",
    id_col: str = "doc_id",
    arrays: DataFrame | None = None,
) -> DataFrame:
    """Per-doc (n_trigrams, mean_logprob, backoff_rate,
    unigram_backoff_rate) against a pinned reference. Docs with < 3
    tokens produce no row (nothing to score). `arrays` optionally
    supplies a pre-built (pre-checkpointed) `_token_arrays` frame for
    `df` so self-scoring callers pay the array projection once."""
    base = arrays if arrays is not None else _token_arrays(df, text_col, id_col)
    scored = (
        base.select(id_col, F.explode("_tg").alias("t"))
        .select(
            id_col,
            F.col("t.p1").alias("p1"),
            F.col("t.p2").alias("p2"),
            F.col("t.c").alias("c"),
        )
        .join(ref.tric, ["p1", "p2", "c"], "left")
        .join(
            ref.big.select(
                F.col("p").alias("p1"), F.col("c").alias("p2"),
                F.col("cb").alias("ctx"),
            ),
            ["p1", "p2"],
            "left",
        )
        .join(
            ref.big.select(
                F.col("p").alias("p2"), F.col("c").alias("c"),
                F.col("cb").alias("bo"),
            ),
            ["p2", "c"],
            "left",
        )
        .join(
            F.broadcast(
                ref.uni.select(F.col("w").alias("p2"), F.col("cw").alias("cp2"))
            ),
            "p2",
            "left",
        )
        .join(
            F.broadcast(
                ref.uni.select(F.col("w").alias("c"), F.col("cw").alias("cc"))
            ),
            "c",
            "left",
        )
        .crossJoin(F.broadcast(ref.total))
    )
    # seen trigram implies seen (p1,p2) context; seen backoff bigram
    # implies seen p2 — each branch's denominator is non-NULL on it
    s = (
        F.when(F.col("c3").isNotNull(), F.log(F.col("c3") / F.col("ctx")))
        .when(
            F.col("bo").isNotNull(),
            F.log(F.lit(0.4) * F.col("bo") / F.col("cp2")),
        )
        .otherwise(
            F.log(F.lit(0.16) * F.coalesce(F.col("cc"), F.lit(1)) / F.col("_n"))
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.round(F.avg(s), 6).alias("mean_logprob"),
        F.round(F.avg(F.col("c3").isNull().cast("int")), 6).alias(
            "backoff_rate"
        ),
        F.round(
            F.avg((F.col("c3").isNull() & F.col("bo").isNull()).cast("int")), 6
        ).alias("unigram_backoff_rate"),
    )
