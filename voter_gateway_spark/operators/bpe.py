"""Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
public) — the real form of the engine's "BPE-ish" token counting:
learn the top-N merge rules from corpus word frequencies.

Why this is feasible at 100 TB: BPE training never iterates over the
corpus. It iterates over the DISTINCT-WORD FREQUENCY table — one
corpus-sized aggregation up front, then every merge round runs on a
vocabulary-sized table (capped at `max_words` rows here; real corpora
plateau at 10^5..10^7 distinct words regardless of corpus bytes). Each
round is: adjacent-pair counts (explode + sum, weighted by word
frequency, overlapping pairs counted like the reference
implementation's get_stats), ONE single-row collect of the argmax pair
(the same bounded driver-side step as the Lloyd centroid loop), and a
greedy-leftmost merge application expressed as a Catalyst `aggregate`
fold — no Python UDFs anywhere.

Greedy-leftmost fold correctness: scanning symbols left to right, we
merge when the accumulator's last element equals `lhs` and the incoming
symbol equals `rhs`. After a merge the last element becomes lhs||rhs,
which can never equal `lhs` again (rhs is non-empty), so a freshly
merged token is never re-used as the left half within the same round —
exactly the semantics of the reference implementation's
leftmost-non-overlapping replacement. 'aaa' + (a,a) -> [aa, a];
'abab' + (a,b) -> [ab, ab].

Determinism: pair-count ties break on (count DESC, lhs ASC, rhs ASC)
in both engines; word-cap ties break on (freq DESC, word ASC); all
counts are exact integers, so for BMP text the merge table is
bit-identical cross-engine (the DuckDB oracle unrolls the same rounds
as chained CTEs with the greedy application done via
gaps-and-islands windows). SCOPE: the cross-engine claim holds for
BMP (and a fortiori ASCII) corpora only — Spark's substring/length
in `_to_symbols` operate on UTF-16 code units, so an astral
(non-BMP) character splits into two surrogate symbols, while
DuckDB's substring/length are codepoint-based, and string ordering
for tie-breaks also diverges beyond the BMP. For non-BMP corpora
the Spark result is still internally deterministic, just not
oracle-comparable symbol-for-symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_gateway_spark.operators import text as text_ops
from voter_gateway_spark.session import ckpt_lazy

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_words: int = 3000
) -> DataFrame:
    """Distinct lowercase-token frequencies, capped at the `max_words`
    most frequent (ties: word ASC) — the ONLY corpus-sized stage of
    BPE training. Returns (word, freq)."""
    toks = docs.select(
        F.explode(text_ops.tokens(text_col, lower=True)).alias("word")
    )
    wf = toks.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    # global top-V lowers to TakeOrdered (no full sort)
    return wf.orderBy(F.desc("freq"), "word").limit(max_words)


def _to_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, syms): characters + </w> terminal."""
    return words.select(
        F.col("word").alias("w"),
        "freq",
        F.expr(
            "array_append(transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1)), '</w>')"
        ).alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts (overlapping occurrences
    included, like the reference implementation's get_stats)."""
    pairs = syms.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(0, size(syms) - 2), "
                "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("cnt")
    )


def _apply_merge(syms: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Greedy-leftmost application of one merge rule via a Catalyst
    aggregate fold (see module docstring for the correctness
    argument). Pure JVM exprs on a <= max_words-row table."""
    merged = lhs + rhs
    fold = F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return syms.select("w", "freq", fold.alias("syms"))


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_words: int = 3000,
) -> DataFrame:
    """Learn `n_merges` BPE merge rules. Returns the merge table
    (merge_rank, lhs, rhs, merged, pair_count) — n_merges rows.

    The per-round argmax is a ONE-row collect (bounded, like the Lloyd
    centroid loop); each round's symbol table is lazily checkpointed so
    the fold lineage stays flat across rounds."""
    cur = ckpt_lazy(_to_symbols(word_frequencies(docs, text_col, max_words)))
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        cur = ckpt_lazy(_apply_merge(cur, a, b))
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string, pair_count bigint",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to every token of every document —
    the corpus-sized ENCODE step (distributed, scan-stage: one explode
    + a chain of folds, no shuffle until the caller aggregates).
    Returns (id_col, token, n_bpe_tokens as the symbol count)."""
    out = docs.select(
        id_col, F.explode(text_ops.tokens(text_col, lower=True)).alias("word")
    ).select(
        id_col,
        "word",
        F.expr(
            "array_append(transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1)), '</w>')"
        ).alias("syms"),
    )
    def _fold(lhs: str, rhs: str):
        merged = lhs + rhs
        return F.aggregate(
            F.col("syms"),
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(lhs))
                & (x == F.lit(rhs)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    for lhs, rhs in merges:
        out = out.withColumn("syms", _fold(lhs, rhs))
    return out.select(
        id_col, "word", F.size("syms").cast("bigint").alias("n_bpe_tokens")
    )
