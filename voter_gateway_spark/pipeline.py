"""Composable corpus-curation pipeline with a dry-run count audit.

The LLM-data analogue of the reference's Job template + perform_audit
lifecycle (import_job.rb:16-34): declare the stage chain once, `run`
it to get the curated frame, or build `counts_plan` for the per-stage
survivor counts a curation review reads before committing — how many
documents each filter/dedup/decontamination stage dropped — without
writing anything.

`counts_plan` is ONE DataFrame (no driver-side loop of count()
actions): every stage output is EAGERLY checkpointed — each frame has
two consumers (its own count branch and the next stage), and a lazy
checkpoint would let them race and recompute the stage lineage per
branch (the multi-consumer trap ngram_jaccard_pairs documents) — and
the per-stage one-row aggregates union into a single (stage_idx,
stage, n_rows) result. That keeps the audit oracle-checkable — the
catalog's `pipeline_curation_audit` pins a 4-stage chain (quality/lang
filter → exact dedup → near-dup prune → eval-decontamination)
row-for-row against a DuckDB CTE mirror.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from voter_gateway_spark.session import ckpt

Stage = tuple[str, Callable[[DataFrame], DataFrame]]


@dataclass(frozen=True)
class StageCount:
    stage: str
    rows: int


class CurationPipeline:
    """An ordered chain of named DataFrame → DataFrame stages."""

    def __init__(self, stages: Sequence[Stage]):
        if not stages:
            raise ValueError("CurationPipeline needs at least one stage")
        names = [n for n, _ in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        self.stages = list(stages)

    def run(self, docs: DataFrame) -> DataFrame:
        """The committing path: fold every stage, return the curated
        frame (the caller writes it)."""
        out = docs
        for _, fn in self.stages:
            out = fn(out)
        return out

    def counts_plan(self, docs: DataFrame) -> DataFrame:
        """Dry-run audit as ONE plan: ('input', |docs|) plus a row per
        stage with its surviving count. Stage outputs are eagerly
        checkpointed — each stage's work runs once, not once per
        consumer branch."""
        frames: list[tuple[str, DataFrame]] = [("input", docs.transform(ckpt))]
        cur = frames[0][1]
        for name, fn in self.stages:
            cur = fn(cur).transform(ckpt)
            frames.append((name, cur))
        counts = [
            f.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).select(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                "n_rows",
            )
            for i, (name, f) in enumerate(frames)
        ]
        return reduce(DataFrame.unionByName, counts)

    def audit(self, docs: DataFrame) -> list[StageCount]:
        """Driver-side convenience over `counts_plan` (one collect of
        len(stages)+1 rows)."""
        return [
            StageCount(r["stage"], int(r["n_rows"]))
            for r in sorted(
                self.counts_plan(docs).collect(), key=lambda r: r["stage_idx"]
            )
        ]


def build_corpus(
    spark,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    file_format: str = "parquet",
) -> dict:
    """The materializing half of pipeline_corpus_build — the nightly
    one-command corpus build: run the certified composite (quality
    gate → cluster-atomic split → temperature mixture → packing),
    write the selected training documents as deterministic shards
    (layout.write_training_shards: md5 (shard, pos) addresses, one
    exchange, per-shard manifest), and emit `dataset_card.json` (v2)
    alongside — the artifact a downstream consumer reads instead of
    re-auditing the corpus:

      version / seq_len / mixture_target   build parameters
      stages                               the full 9-stage attrition
                                           ledger, the exact rows the
                                           driver's oracle gate hashes
      splits                               doc/token mass per split
      shards                               the shard manifest

    Everything is a pure function of the input corpus (hash splits,
    hash admission, md5 shard addresses), so build-twice produces an
    identical card and identical shard bytes
    (tests/test_corpus_build.py)."""
    import json

    from voter_gateway_spark.operators.layout import write_training_shards
    from voter_gateway_spark.queries import (
        CORPUS_BUILD_SEQ_LEN,
        TEMPERATURE_MIXTURE_TARGET,
        _corpus_build_parts,
        _corpus_build_report,
    )

    # ONE parts computation feeds both the shards and the ledger —
    # the gate funnel (pair generation, component iterations,
    # checkpoints) is the expensive half of the build, and its
    # checkpoints are per-invocation, so re-deriving the report from
    # a second pipeline_corpus_build(spark, sf_dir) call would run
    # the whole funnel twice for byte-identical output.
    parts = _corpus_build_parts(spark, sf_dir)
    _, sp, selected, _ = parts
    manifest = write_training_shards(
        selected.select("doc_id", "source", "text"),
        "doc_id",
        f"{out_dir}/shards",
        n_shards=n_shards,
        file_format=file_format,
    )
    stage_rows = [
        {
            "stage_idx": int(r["stage_idx"]),
            "stage": r["stage"],
            "split": r["split"],
            "source": r["source"],
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
            "n_seq_spans": int(r["n_seq_spans"]),
        }
        for r in sorted(
            _corpus_build_report(*parts).collect(),
            key=lambda r: (r["stage_idx"], r["split"], r["source"]),
        )
    ]
    splits = {
        r["split"]: {"n_docs": int(r["n"]), "n_tokens": int(r["t"])}
        for r in sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("t"),
        )
        .collect()
    }
    card = {
        "version": 2,
        "seq_len": CORPUS_BUILD_SEQ_LEN,
        "mixture_target": TEMPERATURE_MIXTURE_TARGET,
        "n_shards": n_shards,
        "stages": stage_rows,
        "splits": splits,
        "shards": manifest,
    }
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/dataset_card.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    out.write(bytearray(json.dumps(card, indent=2, sort_keys=True).encode()))
    out.close()
    return card
