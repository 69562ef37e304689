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
