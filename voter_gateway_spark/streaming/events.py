"""Event-stream operators: windowed and sessionized aggregations.

The reference is purely batch (SURVEY §1.1: no streams); the `events`
fixture extends the engine per the driver's north star. Each operator
has a batch form (DataFrame, oracle-checkable) and a Structured
Streaming form (readStream + watermark) sharing the same expressions —
the Spark-idiomatic way to keep batch/stream semantics aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + value sum.

    Output uses unix micros for the window start so hashes compare
    cleanly across engines (timestamp formatting differs)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based), batch form.

    Spark's session_window merges events closer than `gap`; the session
    end is last-event + gap. Output: per-user sessions with event count
    and value sum, keyed by session start micros.
    """
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "value_sum",
        )
    )


def stream_hourly_counts(
    spark: SparkSession,
    parquet_dir: str,
    watermark: str = "2 hours",
):
    """Structured Streaming form of hourly_counts with late-data
    watermarking. Returns the streaming DataFrame; callers attach
    writeStream (tests use trigger(availableNow=True) + memory sink).
    """
    # the fixture stores TIMESTAMP(NANOS): read as bigint nanos (matches
    # the nanosAsLong session config) and convert to µs exactly
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, "
            "event_type string, value double, props string"
        )
        .parquet(parquet_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
