"""Physical data-layout operators: Z-order clustering keys and
small-file compaction.

Beyond-reference additions (the reference leaves layout to Postgres):
at 100 TB the dominant scan cost is decided by FILE LAYOUT — min/max
zone-map pruning only works when files are clustered on the filter
columns, and a crawl ingest's millions of small files destroy both
scan throughput and driver planning time. These operators are the
library-side answers; on Delta/Iceberg tables the storage layer's
OPTIMIZE/ZORDER subsumes them (same decision-record posture as
sources/merge_sink.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def morton_code(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleaved-bit (Morton / Z-order) clustering key over 2+
    already-bucketed non-negative int columns (caller buckets
    continuous values first — e.g. `F.floor(x / width)` or an ntile).

    Sorting/range-partitioning by this key before writing clusters
    rows so that parquet row-group min/max stats prune MULTI-column
    range predicates — a linear sort on (a, b) prunes only on `a`,
    the Z-curve prunes on both. Pure bit arithmetic (shiftleft/and/or),
    fully inside codegen; `bits` per column bounds the key to
    bits*len(cols) total bits (≤ 62 enforced).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("morton_code needs >= 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds 62 (bigint)")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    mask = (1 << bits) - 1
    code = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cs):
            # bit b of column i lands at position b*n + i
            bit = F.shiftright(c.bitwiseAND(F.lit(mask)), b).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, b * n + i))
    return code


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Return `df` range-partitioned and sorted by the Morton key of
    `cols` (already-bucketed ints), ready for a clustered write:
    `zorder_layout(df, [...]).write.parquet(...)` yields files whose
    per-column min/max ranges are tight on EVERY clustering column.

    repartitionByRange samples the key (no global sort shuffle to one
    partition); within-partition sort keeps row groups tight."""
    keyed = df.withColumn("_z", morton_code(cols, bits))
    parts = [n_files] if n_files else []
    return (
        keyed.repartitionByRange(*parts, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_training_shards(
    df: DataFrame,
    id_col: str,
    out_dir: str,
    n_shards: int = 8,
    file_format: str = "parquet",
) -> dict:
    """Materialize deterministic training shards: rows get (shard, pos)
    addresses from the md5 shuffle (analytics.training_shuffle), land
    partitioned by shard and sorted by pos within each file, and a
    manifest records per-shard row counts for the data loader.

    `file_format` is 'parquet' (default) or 'json' — JSONL shards are
    the interchange form LLM data loaders consume directly (one
    document object per line, `shard=K/*.json`); same layout, same
    manifest, same determinism contract either way.

    Read side: a loader streams `shard=K/` sequentially and rows
    arrive in the deterministic shuffled order — no shuffle at
    training time, reproducible across rebuilds because (shard, pos)
    is a pure function of the ids (the manifest records every shard's
    row count, INCLUDING empty shards, so `range(n_shards)` iteration
    never hits a missing key — an empty md5 bucket writes no
    directory). One exchange (by shard) on the write; the manifest
    aggregation reuses the written data, not a second pass over the
    input."""
    from voter_gateway_spark.operators.analytics import training_shuffle

    if file_format not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {file_format!r}")
    # Spark's default JSON timestampFormat truncates to milliseconds,
    # which would silently break the parquet/JSONL parity contract for
    # micros-precision columns (r7 code review) — pin a micros format
    # on BOTH sides of the boundary
    _json_opts = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
    shuffled = training_shuffle(df, id_col, n_shards=n_shards)
    writer = (
        shuffled.repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(file_format)
    )
    if file_format == "json":
        writer = writer.options(**_json_opts)
    writer.save(out_dir)
    spark = df.sparkSession
    reader = spark.read.format(file_format)
    if file_format == "json":
        # JSON re-read must not re-infer: pin the written schema minus
        # the partition column (restored from the directory layout)
        data_schema = T.StructType(
            [f for f in shuffled.schema.fields if f.name != "shard"]
        )
        reader = reader.schema(data_schema).options(**_json_opts)
    counts = {
        int(r["shard"]): int(r["n"])
        for r in reader.load(out_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "n_shards": n_shards,
        "total_rows": sum(counts.values()),
        "shard_rows": {str(k): counts.get(k, 0) for k in range(n_shards)},
        "id_col": id_col,
        "format": file_format,
    }
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/_manifest.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    out.write(bytearray(json.dumps(manifest, indent=2).encode()))
    out.close()
    return manifest


def file_skipping_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Zone-map audit: per data file, row count and min/max of each
    column — what parquet footer pruning will see. Run it before and
    after a zorder_layout/compact rewrite to QUANTIFY how much a range
    predicate can skip (tight per-file ranges = skippable files).

    One scan grouped by input_file_name; at 100 TB run it on a
    partition sample, or read footers directly via the parquet
    metadata — this operator is the plan-level check, not a metadata
    crawler."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def dataset_bytes(spark, path: str) -> int:
    """Total bytes under a path via the Hadoop FileSystem API (works on
    any supported scheme — local, HDFS, object stores)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(bytes / target) files. Returns the file count written.

    The file count comes from the REAL dataset size (Hadoop
    ContentSummary), not a row-count guess; `sort_within_by`
    RANGE-partitions on the sort keys before the in-file sort, so each
    output file covers a tight, disjoint key range — a round-robin
    repartition would hand every file a sample of the whole keyspace
    and the rewritten zone maps (min/max per file, what
    file_skipping_stats audits) would prune nothing. Writes to a NEW
    location (never in-place — readers of `src` are unaffected until
    the swap, the transactional-load posture of
    sinks.overwrite_partitions)."""
    total = dataset_bytes(spark, src)
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if sort_within_by:
        out = df.repartitionByRange(
            n, *[F.col(c) for c in sort_within_by]
        ).sortWithinPartitions(*sort_within_by)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n
