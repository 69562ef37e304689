"""Paragraph-granularity exact deduplication — the Dolma-style pass
production pipelines run BETWEEN whole-document exact dedup and
substring-span scrubbing (Lee et al. 2022): drop every repeated
paragraph except one canonical survivor occurrence, corpus-wide,
preserving each document's remaining order.

Contrast with the two neighbouring granularities already in the repo:

- ``dedup_ops.exact_dedup`` keys whole documents — a doc that shares
  90% of its paragraphs with another survives untouched;
- ``text.remove_boilerplate`` drops ALL occurrences of segments that
  appear in >= min_docs documents — a frequency-floor filter for
  crawl boilerplate, not a dedup (no survivor is kept);
- THIS pass keeps exactly one occurrence of every distinct paragraph
  (the first in (doc, position) order — Dolma's "mark subsequent
  duplicates" rule) and removes the rest, whatever their frequency.

Paragraphs are fixed ``seg_words``-word segments of the normalized
lowercase token stream — the same segmentation as remove_boilerplate,
chosen because corpora without line structure (and this repo's
fixtures) carry no newline delimiters; a caller with real paragraph
breaks can pre-split and feed one row per paragraph instead.

Reference shape: the reference dedups voter records whole-row
(dedup self-merge, fuzzy_merger.rb:21-36); this is the sub-document
granularity an LLM-corpus pipeline adds on top.

Scale shape (100 TB): segment rows shuffle ONCE keyed by the segment
string; the survivor choice is a map-side-combining min aggregate on
that key; the keep/drop flag comes back via a join ON THE SAME KEY —
Catalyst reuses the exchange, so no second corpus-wide shuffle —
and reassembly is one doc-keyed aggregation (ordinal riding a
struct(array_sort(collect_list)), no window). Every stage is linear
in corpus size; nothing is quadratic in the duplication factor d —
a d-way-duplicated corpus produces d segment rows per distinct
segment and drops d-1 of them in the same linear plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from voter_gateway_spark.operators.text import normalized


def _segment_rows(
    df: DataFrame, text_col: str, id_col: str, seg_words: int
) -> DataFrame:
    """(id, _nseg, _idx, _seg) — one row per seg_words-word segment of
    the normalized lowercase token stream, 0-based ordinal. Documents
    with zero tokens (empty or NULL text) produce no rows here; the
    caller restores them from the `_nseg == 0 | NULL` base rows."""
    words = F.filter(
        F.split(F.lower(normalized(text_col)), " "), lambda w: w != ""
    )
    base = df.select(F.col(id_col), words.alias("_words")).select(
        id_col,
        "_words",
        F.ceil(F.size("_words") / F.lit(seg_words)).cast("int").alias("_nseg"),
    )
    return base, base.select(
        id_col,
        "_nseg",
        F.explode(
            F.when(
                F.col("_nseg") > 0, F.sequence(F.lit(0), F.col("_nseg") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_idx"),
        "_words",
    ).select(
        id_col,
        "_nseg",
        "_idx",
        F.concat_ws(
            " ", F.slice(F.col("_words"), F.col("_idx") * seg_words + 1, seg_words)
        ).alias("_seg"),
    )


def paragraph_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 3,
) -> DataFrame:
    """Corpus-wide paragraph-exact dedup with order-preserving
    reassembly.

    Output: (id, clean_text, n_segments, n_removed) — ONE row per
    input document (empty/NULL-text documents report clean_text '',
    0 segments). The survivor of each distinct segment is its
    first occurrence in (id, position) order; every other occurrence
    is removed and the survivors rejoin in original order.
    """
    base, segs = _segment_rows(df, text_col, id_col, seg_words)
    # survivor per distinct segment: lexicographic min of (id, idx) —
    # a map-side-combining min aggregate, never a window over the
    # corpus
    surv = segs.groupBy("_seg").agg(
        F.min(F.struct(F.col(id_col).alias("_d"), F.col("_idx").alias("_i"))).alias(
            "_keep"
        )
    )
    # same join key as the aggregate above: the exchange is reused
    flagged = segs.join(surv, "_seg").withColumn(
        "_is_surv",
        (F.col("_keep._d") == F.col(id_col)) & (F.col("_keep._i") == F.col("_idx")),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_is_surv"), F.struct("_idx", "_seg"))
                    )
                ),
                lambda s: s["_seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum((~F.col("_is_surv")).cast("int")).cast("bigint").alias("n_removed"),
    )
    empty = base.where(
        (F.col("_nseg") == 0) | F.col("_nseg").isNull()
    ).select(
        id_col,
        F.lit("").alias("clean_text"),
        F.lit(0).cast("bigint").alias("n_segments"),
        F.lit(0).cast("bigint").alias("n_removed"),
    )
    return rebuilt.unionByName(empty)


def paragraph_dup_mass(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | Column = "source",
    seg_words: int = 3,
) -> DataFrame:
    """Per-`group_col` paragraph-duplication mass — the dataset-card
    row a curation review reads next to the whole-doc dup counts:
    (group, n_docs, n_segments, n_dup_segments, dup_ratio), where
    n_dup_segments counts segment OCCURRENCES that paragraph_scrub
    would remove (non-survivors) and dup_ratio = dup/total segments.

    Same linear plan as paragraph_scrub up to the flag; the rollup is
    one group-keyed aggregation instead of the reassembly.
    """
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    keyed = df.select(F.col(id_col), gc.alias("_grp"), F.col(text_col))
    base, segs = _segment_rows(keyed, text_col, id_col, seg_words)
    surv = segs.groupBy("_seg").agg(
        F.min(F.struct(F.col(id_col).alias("_d"), F.col("_idx").alias("_i"))).alias(
            "_keep"
        )
    )
    flagged = (
        segs.join(surv, "_seg")
        .withColumn(
            "_dup",
            ~(
                (F.col("_keep._d") == F.col(id_col))
                & (F.col("_keep._i") == F.col("_idx"))
            ),
        )
        .join(keyed.select(id_col, "_grp"), id_col)
    )
    per_doc_docs = keyed.groupBy("_grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    out = flagged.groupBy("_grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.col("_dup").cast("int")).cast("bigint").alias("n_dup_segments"),
    )
    return (
        per_doc_docs.join(out, "_grp", "left")
        .select(
            F.col("_grp").alias("group"),
            "n_docs",
            F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
            F.coalesce("n_dup_segments", F.lit(0))
            .cast("bigint")
            .alias("n_dup_segments"),
            F.round(
                F.when(
                    F.coalesce("n_segments", F.lit(0)) > 0,
                    F.coalesce("n_dup_segments", F.lit(0))
                    / F.col("n_segments"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_ratio"),
        )
    )
