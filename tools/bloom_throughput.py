"""Steady-state admission: Bloom pre-filter vs plain anti-join.

Measures what dedup_ops.bloom_admission buys per batch once the word
table is built: corpus = rows whose TEXT-hash bucket < 80 (replicas
duplicate texts, so the split must be by distinct text, not doc_id);
arriving batches are drawn from buckets >= 75 — ~20 % true duplicates
(buckets 75-79 overlap the corpus) + ~80 % genuinely new, the realistic
steady-state mix. Per batch, both modes produce the IDENTICAL admitted
set (asserted):

- mode "anti_join" — batch LEFT ANTI JOIN corpus text (the naive
  steady state: the corpus text set is re-joined every batch);
- mode "bloom"     — prebuilt word table (one-time cost, reported
  separately), per batch one broadcast probe + a verify join whose
  left side is only the maybes; with zero/few maybes AQE collapses
  the verify join to (near-)empty.

Replicated corpora keep the DISTINCT-key count at the base-SF level
(a few thousand — broadcast-trivial, where the plain anti-join is
already optimal and the bloom is pure overhead). Pass --salt to make
every row's text unique (text || ' #' || doc_id): that is the
realistic web-corpus shape — the distinct-key set grows with the
corpus, the anti-join's build side outgrows the broadcast threshold
and becomes a per-batch corpus shuffle, while the bloom path still
pays only a broadcast probe + a semi-pruned corpus scan.

Usage: python tools/bloom_throughput.py [sf_dir] [n_batches] [--salt]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import _stage_totals  # noqa: E402
from voter_gateway_spark.operators.dedup_ops import (  # noqa: E402
    BloomIndex,
    _next_pow2,
    bloom_admission,
    build_bloom_words,
    md5_hash60,
)
from voter_gateway_spark.session import build_spark  # noqa: E402


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--salt"]
    salt = "--salt" in sys.argv
    sf_dir = argv[0] if argv else "/tmp/stress_x10"
    n_batches = int(argv[1]) if len(argv) > 1 else 6
    spark = build_spark(app_name="vgs-bloom-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if salt:
        docs = docs.withColumn(
            "text", F.concat_ws(" #", F.col("text"), F.col("doc_id"))
        )
    bucket = md5_hash60("text") % 100
    corpus = docs.where(bucket < 80).cache()
    n_corpus = corpus.count()
    arrivals = (
        docs.where(bucket >= 75)
        .withColumn("_b", (md5_hash60("doc_id") % n_batches).cast("int"))
        .cache()
    )
    n_arrivals = arrivals.count()

    # one-time bloom build over DISTINCT corpus fingerprints
    t0 = time.time()
    fp = F.xxhash64(F.col("text"))
    n_keys = corpus.select(fp.alias("_fp")).distinct().count()
    n_bits = _next_pow2(int(n_keys * 9.6))
    words = build_bloom_words(
        corpus.select(fp.alias("_fp")), "_fp", n_bits, 7
    ).cache()
    n_words = words.count()  # materialize
    index = BloomIndex(words, n_bits, 7)  # sizing bound to the build
    build_s = round(time.time() - t0, 2)

    # NOT cached/pre-partitioned: the naive anti-join steady state
    # re-distincts and re-shuffles the corpus text set every batch.
    # (Pre-bucketing the corpus by key is the OTHER admission family —
    # the persisted band/fp index; the bloom composes with it.)
    corpus_text = corpus.select("text").distinct()

    per_batch: dict[str, list[float]] = {"anti_join": [], "bloom": []}
    shuffle_mb: dict[str, list[float]] = {"anti_join": [], "bloom": []}
    admitted: dict[str, list[int]] = {"anti_join": [], "bloom": []}

    def timed(mode: str, df) -> None:
        before = _stage_totals(spark)
        t0 = time.time()
        admitted[mode].append(df.count())
        per_batch[mode].append(round(time.time() - t0, 2))
        after = _stage_totals(spark)
        if before and after:
            shuffle_mb[mode].append(
                round((after[1] - before[1]) / 1e6, 2)
            )

    for i in range(n_batches):
        batch = arrivals.where(F.col("_b") == i).drop("_b")
        timed("anti_join", batch.join(corpus_text, "text", "left_anti"))
        timed(
            "bloom",
            bloom_admission(corpus, batch, "doc_id", "text", words=index),
        )
        assert admitted["bloom"][-1] == admitted["anti_join"][-1], (
            i,
            admitted["bloom"][-1],
            admitted["anti_join"][-1],
        )

    out = {
        "metric": "bloom_admission_steady_state",
        "sf_dir": sf_dir,
        "salted_distinct_keys": salt,
        "n_corpus_rows": n_corpus,
        "n_distinct_keys": n_keys,
        "n_bits": n_bits,
        "n_word_rows": n_words,
        "word_table_mb": round(n_word_rows_mb(n_words), 2),
        "bloom_build_s": build_s,
        "n_batches": n_batches,
        "n_arrival_rows": n_arrivals,
        "admitted_per_batch": admitted["anti_join"],
        "per_batch_s": per_batch,
        "per_batch_shuffle_mb": shuffle_mb,
        "total_s": {
            m: round(sum(v), 2) for m, v in per_batch.items()
        },
        "total_shuffle_mb": {
            m: round(sum(v), 2) for m, v in shuffle_mb.items()
        },
    }
    print(json.dumps(out))


def n_word_rows_mb(n_words: int) -> float:
    return n_words * 16 / 1e6  # (long, long) per row


if __name__ == "__main__":
    main()
