"""Write-side: parquet sinks with the layout controls that matter at
100 TB — partition columns for pruning, bucketing for co-located joins,
target file sizing, and atomic overwrite.

Reference analogs: S9 table materialization and S12 transactional load
(the reference leans on Postgres transactions; Spark's file committer
gives write-then-rename atomicity per job, and dynamic partition
overwrite limits the blast radius to touched partitions).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canon_map_json(col: Column) -> Column:
    """Order-canonical JSON rendering of a map column: key-sort the
    entries before to_json. Entry ORDER inside a map is not part of its
    value — map_from_entries(collect_list(...)) can legally emit the
    same entries in a different order on a stage retry, so any salt or
    hash derived from a map must go through this (entry-order-dependent
    salt = the same SPARK-23207 retry instability, one level down; r7
    code review). Values that are THEMSELVES maps would still render
    order-dependently — acceptable residual: map-of-map payload columns
    are not produced anywhere in the engine.

    Module-level so tests assert THIS expression, not a re-derivation
    that could drift from production (r8 advice)."""
    ents = F.map_entries(col)
    return F.to_json(
        F.array_sort(
            ents,
            lambda l, r: F.when(l["key"] < r["key"], -1)
            .when(l["key"] > r["key"], 1)
            .otherwise(0),
        )
    )


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_rows_per_file: int | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Parquet sink.

    - partition_by: hive-style partition dirs → partition pruning on read
    - target_rows_per_file: repartition so files land near a target size
      (avoids the tiny-file problem when upstream parallelism is high)
    - sort_within_partitions: clustered layout → better min/max skipping
    """
    out = df
    if target_rows_per_file:
        # an extra full evaluation of the upstream plan (count + write
        # = 2×); cache df first, or size via layout.compact_parquet
        # post-hoc, when the plan is expensive
        if partition_by:
            # key the repartition by the hive partition columns, or
            # every task writes a sliver into EVERY partition dir —
            # up to n_parts × |dirs| tiny files. But partition columns
            # ALONE send a whole partition value to one task, so a
            # skewed/low-cardinality partition_by silently defeats the
            # file-size cap (one arbitrarily large file per dir — the
            # opposite failure). Add a bounded deterministic salt:
            # hash(row) % ceil(partition_rows / target), so a large
            # partition splits into ~splits files while small ones stay
            # single-file. Per-value row counts come from one cheap
            # aggregate (same evaluation cost as the plain count()).
            counts = df.groupBy(*[F.col(c) for c in partition_by]).agg(
                F.count(F.lit(1)).alias("_prows")
            )
            sp = counts.select(
                *[
                    F.col(c).alias(f"_pb_{i}")
                    for i, c in enumerate(partition_by)
                ],
                F.greatest(
                    F.lit(1),
                    F.ceil(F.col("_prows") / F.lit(target_rows_per_file)),
                )
                .cast("int")
                .alias("_splits"),
                "_prows",
            )
            rows = sp.agg(
                F.sum("_prows").alias("n"), F.sum("_splits").alias("keys")
            ).collect()[0]
            n_parts = max(1, math.ceil((rows["n"] or 0) / target_rows_per_file))
            cond = None
            for i, c in enumerate(partition_by):
                eq = df[c].eqNullSafe(F.col(f"_pb_{i}"))
                cond = eq if cond is None else (cond & eq)
            out = df.join(F.broadcast(sp.drop("_prows")), cond).drop(
                *[f"_pb_{i}" for i in range(len(partition_by))]
            )
            # salt from hashable NON-partition columns only: F.hash
            # raises on MapType (anywhere in the type) since Spark 3.0,
            # and hashing the partition columns alone is constant per
            # partition value — the skew split would silently do
            # nothing. When every non-partition column is a map, hash
            # its canonical JSON rendering instead: a stage retry after
            # a fetch failure recomputes rows with the SAME salt (a
            # monotonically_increasing_id salt is position-dependent —
            # the SPARK-23207 round-robin class, rows duplicated or
            # lost on retry; ADVICE r6 #2).
            hashable = [
                f.name
                for f in df.schema.fields
                if f.name not in partition_by
                and "map<" not in f.dataType.simpleString()
            ]
            if hashable:
                salt_src = F.hash(*[out[c] for c in hashable])
            else:
                map_cols = [
                    f.name for f in df.schema.fields
                    if f.name not in partition_by
                ]

                salt_src = F.hash(
                    *[canon_map_json(out[c]) for c in map_cols]
                ) if map_cols else F.lit(0)
            salt = F.pmod(salt_src, F.col("_splits"))
            out = out.repartition(
                n_parts, *[F.col(c) for c in partition_by], salt
            ).drop("_splits")
        else:
            n = df.count()
            n_parts = max(1, math.ceil(n / target_rows_per_file))
            out = out.repartition(n_parts)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    mode: str = "overwrite",
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: equi-joins and aggregations on
    `bucket_cols` across tables with matching bucketing need NO shuffle
    (the 100 TB co-location strategy for repeated merge targets).
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Dynamic partition overwrite: replace only the partitions present
    in `df` (the idempotent re-import pattern — re-running a day's load
    rewrites that day only)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
