"""Streaming probabilistic admission: Fellegi–Sunter linkage per
micro-batch against a persisted registry — the reference's actual
production loop (csv_driver.rb ingests periodic voter-roll files,
record_matcher.rb links them to the registry, record_merger.rb
updates/inserts), with the probabilistic matcher in the cascade's
place.

This module is deliberately thin: all crash/replay/swap semantics come
from streaming/upsert_sink.stream_upsert_parquet (write-new-then-swap,
(batch_id, query_id) replay marker), and all matching/scoring from
plans/linkage.fs_matches. Per-batch cost is the FS blocking joins
(batch × registry, broadcast-able batch side) plus the sink's
O(registry) rewrite — on a real lake the sink lowers to MERGE INTO
(see upsert_sink's scale posture note).

Admission semantics per batch:
- FS-matched arrivals (best weight ≥ threshold) UPDATE their linked
  registry row (shared columns overwrite, M1 semantics — idempotent,
  so a replayed update is harmless even beyond the marker guard).
- Unmatched arrivals INSERT carrying their own pk (the roll's id
  space; callers whose arrival ids can collide with registry pks must
  synthesize keys via merge_plan.insert_column_as).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from voter_gateway_spark.plans import MergePlan, linkage
from voter_gateway_spark.streaming.upsert_sink import stream_upsert_parquet


def fs_registry_matcher(
    *,
    source_pk: str,
    target_pk: str,
    prepare_source,
    prepare_target,
    rules: list[list[tuple[str, str]]],
    gammas: dict[str, tuple[str, str]],
    weights: dict[str, linkage.FieldWeights],
    threshold: float,
):
    """Bind the FS configuration into a (batch, target) -> matches
    callable for stream_upsert_parquet's `matcher` hook."""

    def _match(batch: DataFrame, target: DataFrame) -> DataFrame:
        return linkage.fs_matches(
            batch,
            target,
            source_pk=source_pk,
            target_pk=target_pk,
            prepare_source=prepare_source,
            prepare_target=prepare_target,
            rules=rules,
            gammas=gammas,
            weights=weights,
            threshold=threshold,
        )

    return _match


def stream_fs_admission(
    stream: DataFrame,
    target_dir: str,
    *,
    pk: str,
    prepare_source,
    prepare_target,
    rules: list[list[tuple[str, str]]],
    gammas: dict[str, tuple[str, str]],
    weights: dict[str, linkage.FieldWeights],
    threshold: float,
    merge_plan: MergePlan | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "vgs_fs_admission",
    sink_format: str = "parquet",
):
    """writeStream writer running FS admission per micro-batch; caller
    picks the trigger and calls .start(). The stream and the registry
    share the pk name; prepare_source/prepare_target project the
    disjointly-named comparison views (see linkage.fs_matches).

    sink_format="delta" routes the per-batch apply through the Delta
    MERGE fast path (stream_upsert_delta — rewrites only matched
    files, transactional replay skip) instead of the parquet
    write-new-then-swap; requires the optional delta-spark package."""
    matcher = fs_registry_matcher(
        source_pk=pk,
        target_pk=pk,
        prepare_source=prepare_source,
        prepare_target=prepare_target,
        rules=rules,
        gammas=gammas,
        weights=weights,
        threshold=threshold,
    )
    if sink_format == "delta":
        from voter_gateway_spark.streaming.upsert_sink import stream_upsert_delta

        return stream_upsert_delta(
            stream,
            target_dir,
            pk=pk,
            match_columns=[],
            merge_plan=merge_plan,
            checkpoint_dir=checkpoint_dir,
            query_name=query_name,
            matcher=matcher,
        )
    if sink_format != "parquet":
        raise ValueError(f"unknown sink_format {sink_format!r}")
    return stream_upsert_parquet(
        stream,
        target_dir,
        pk=pk,
        match_columns=[],
        merge_plan=merge_plan,
        checkpoint_dir=checkpoint_dir,
        query_name=query_name,
        matcher=matcher,
    )
