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

from voter_gateway_spark.sources.fixtures import events_stream_reader


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
    **reader_options,
):
    """Structured Streaming form of hourly_counts with late-data
    watermarking. Returns the streaming DataFrame; callers attach
    writeStream (tests use trigger(availableNow=True) + memory sink).
    `reader_options` pass through to the file source (e.g.
    maxFilesPerTrigger to bound micro-batch size)."""
    stream = events_stream_reader(spark, parquet_dir, watermark, **reader_options)
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


# Canonical (post-normalization) event schema; the physical parquet
# encoding is sniffed per-directory by events_stream_reader.
EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _event_stream(spark: SparkSession, parquet_dir: str, watermark: str):
    """Streaming read of the events fixture layout with ts normalized
    to µs via the shared dtype-defensive loader (sources/fixtures)."""
    return events_stream_reader(spark, parquet_dir, watermark)


def stream_session_collect(
    spark: SparkSession,
    parquet_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming half of session-path mining: session_window gap
    sessionization — IDENTICAL boundaries to analytics.session_paths'
    batch lag/sum form (session_window's interval is [start, last+gap),
    so an event exactly `gap` after its predecessor starts a new
    session, matching the batch `>= gap` test) — collecting each
    session's ordered (time, id, type) struct array plus the true
    event count.

    Run with trigger(availableNow=True) and complete/update mode, then
    finish with analytics.render_session_paths on the materialized
    sessions: the final per-path rollup is a SECOND aggregation, which
    Structured Streaming does not chain — the split is the documented
    micro-batch form, and sharing one renderer with the batch operator
    is what makes stream-vs-batch parity testable as a property of the
    sessionization alone.

    State note: this form keeps whole sessions in state until the
    watermark closes them; the batch form bounds per-session window
    state at max_len+1 structs. A production stream with adversarial
    (bot) sessions would gate the collect through
    applyInPandasWithState the way stream_value_cap_admissions does."""
    ev = _event_stream(spark, parquet_dir, watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("_us"),
                        F.col("event_id").alias("_e"),
                        F.col("event_type").alias("_t"),
                    )
                )
            ).alias("_evs"),
            F.count(F.lit(1)).alias("_ne"),
        )
    )


def enrich_events(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment: join each event to a (small) dimension
    table. Works identically on a batch or streaming `events` frame —
    Spark re-plans the static side per micro-batch, and the explicit
    broadcast keeps it a map-side hash join (no shuffle of the stream).

    The batch form is the oracle; the streaming form is the deployment
    path (parity pinned by test_stream_enrich_matches_batch).
    """
    return events.join(F.broadcast(dim), on, "left")


def attribute_conversions(
    purchases: DataFrame,
    views: DataFrame,
    window: str = "1 hour",
    banded: bool = True,
) -> DataFrame:
    """View→purchase attribution pairs: each purchase joined to the
    same user's views in the preceding `window` (inclusive on both
    ends). Works identically on static frames (the oracle form) and on
    two watermarked streams — as a stream-stream join the time-range
    condition is exactly what lets Spark expire join state (a view
    older than the window can never match a future purchase once the
    watermark passes it), so state stays bounded by watermark + window
    instead of growing with the stream.

    `banded` (default ON, batch path): a user-only equi-join with the
    time range as a post-join filter fans out |views_u| × |purchases_u|
    rows per user BEFORE the filter — quadratic per user as history
    grows, even though the surviving output is linear. The 1000×
    events decade caught exactly this: every other event query
    finished in seconds while attribution did not finish in 15 minutes
    (~10⁶× intermediate growth for 10³× data). Banding applies the
    same cure as relational.interval_join: both sides key on
    (user, ⌊ts/window⌋), views explode to their own and the NEXT
    bucket (a purchase's window reaches back at most one bucket), the
    exact range condition then filters — fanout is per-(user, bucket),
    never per-user-history, and each qualifying pair joins in exactly
    one bucket so no dedup is needed. The streaming form passes
    banded=False: Spark's watermark already bounds its state to
    window + slack, and the derived bucket equality would only add
    state columns (parity pinned by test_stream_attribution_matches_batch).

    Output: one row per (purchase, attributed view) pair.
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    in_range = (
        (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    if banded and (purchases.isStreaming or views.isStreaming):
        # stream-stream state eviction needs the event-time range IN
        # the join criteria; banding would leave it as a post-join
        # filter and risk unbounded state — streaming callers always
        # get the watermark-bounded range join
        banded = False
    if banded:
        import pandas as pd

        try:
            tsec = pd.Timedelta(window).total_seconds()
        except ValueError:
            tsec = 0.0
        # calendar intervals pandas can't parse ("1 month") and any
        # window that isn't a whole number of seconds (a truncated
        # bucket would silently drop boundary pairs) fall back to the
        # exact range join — correct, just unbanded
        if tsec < 1 or tsec != int(tsec):
            banded = False
        else:
            wsec = int(tsec)
    if banded:
        pb = p.withColumn(
            "_b", F.floor(F.unix_timestamp("p_ts").cast("bigint") / wsec)
        )
        vbase = F.floor(F.unix_timestamp("v_ts").cast("bigint") / wsec)
        vb = v.withColumn("_b", F.explode(F.array(vbase, vbase + 1)))
        return (
            pb.join(vb, (pb["user_id"] == vb["v_user_id"]) & (pb["_b"] == vb["_b"]))
            .where(in_range)
            .select(
                "purchase_id", "user_id", "p_ts", "purchase_value", "view_id", "v_ts"
            )
        )
    return p.join(
        v,
        (p["user_id"] == v["v_user_id"])
        & (v["v_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {window}"))
        & (v["v_ts"] <= p["p_ts"]),
        "inner",
    ).select("purchase_id", "user_id", "p_ts", "purchase_value", "view_id", "v_ts")


def stream_attributed_purchases(
    spark: SparkSession,
    parquet_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Stream-stream form: two filtered readers over the same event
    stream (views vs purchases), both watermarked, joined with the
    time-range condition. Returns the streaming pair DataFrame."""
    views = _event_stream(spark, parquet_dir, watermark).where(
        F.col("event_type") == "view"
    )
    purchases = _event_stream(spark, parquet_dir, watermark).where(
        F.col("event_type") == "purchase"
    )
    return attribute_conversions(purchases, views, window, banded=False)


def value_cap_admissions(events: DataFrame, cap: float) -> DataFrame:
    """Batch form of per-user value-budget admission: events are
    admitted in (ts, event_id) order while the user's running total
    BEFORE the event is under `cap`. Output: admitted events with the
    post-event running total.

    The running total accumulates EVERY event's value (admitted or
    not) — that is what a window cumsum computes, and the streaming
    form below accumulates identically, so batch/stream parity holds
    for any sign of `value` (a refund can re-open a user's budget in
    both forms). For the usual non-negative metering case the two
    readings coincide anyway, since nothing accumulates after the cap
    is reached except further admissible-never events.

    This is the quota-sampling primitive of a streaming corpus ingest
    (cap each source/user/domain's contribution); the batch form is
    the oracle for the streaming form below."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = F.sum("value").over(w)
    return (
        events.withColumn("running_total", cum)
        .where(F.col("running_total") - F.col("value") < F.lit(cap))
        .select("user_id", "event_id", "ts", "value", "running_total")
    )


def stream_value_cap_admissions(
    spark: SparkSession,
    parquet_dir: str,
    cap: float,
    checkpoint_dir: str | None = None,
):
    """Streaming per-user value-budget admission: keyed state = ONE
    double (the running admitted total) per user — the smallest
    possible footprint for an admission controller at 100 TB/day.

    Implemented with ``applyInPandasWithState``; a micro-batch's rows
    are processed in (ts, event_id) order, so a single-batch run
    reproduces the batch oracle exactly and state carries across
    batches (parity pinned by test_stream_value_cap_matches_batch).

    Note: Spark 4's ``transformWithStateInPandas`` (typed ValueState +
    state-server timers) is the same shape — `handle.getValueState(
    "total", "total double")` replacing the state tuple — but its
    Python worker requires protobuf, unavailable in this environment;
    the applyInPandasWithState form is functionally equivalent here
    (no timers needed: the budget never expires)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def admit(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0.0
        out = []
        # one group can arrive as SEVERAL Arrow chunks (batches larger
        # than arrow.maxRecordsPerBatch); sorting per-chunk would
        # process chunks in arbitrary order — concat first, then one
        # global (ts, event_id) sort for the group
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks).sort_values(["ts", "event_id"])
            for row in whole.itertuples(index=False):
                admit_this = total < cap
                # the total tracks EVERY event (batch-oracle parity:
                # the window cumsum accumulates rejected rows too)
                total += float(row.value)
                if admit_this:
                    out.append(
                        (row.user_id, row.event_id, row.ts, row.value, total)
                    )
        state.update((total,))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "event_id", "ts", "value", "running_total"],
            )

    stream = events_stream_reader(spark, parquet_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        admit,
        outputStructType=(
            "user_id bigint, event_id bigint, ts timestamp, "
            "value double, running_total double"
        ),
        stateStructType="total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_events(
    spark: SparkSession,
    parquet_dir: str,
    watermark: str = "2 hours",
    state_ttl_ms: int = 24 * 3600 * 1000,
):
    """Streaming exact-dedup on event_id via applyInPandasWithState —
    the custom-stateful-operator escape hatch (the reference has no
    streaming at all; Spark's built-in dropDuplicates covers the simple
    case, this shows the general keyed-state machinery a bespoke op
    would use).

    Keyed state = one boolean per seen event_id, expired by EVENT-TIME
    timeout `state_ttl_ms` past the watermark: at 100 TB/day the state
    store stays bounded by the dedup horizon instead of growing with
    the full key history. Emits the first occurrence of each key;
    duplicates inside one micro-batch and across batches both drop.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_type = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    state_type = "seen boolean"

    def first_only(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        emitted = state.exists
        for pdf in pdfs:
            if not emitted and len(pdf):
                yield pdf.iloc[[0]]
                emitted = True
        if not state.exists:
            state.update((True,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_ttl_ms)

    return (
        _event_stream(spark, parquet_dir, watermark)
        .groupBy("event_id")
        .applyInPandasWithState(
            first_only,
            outputStructType=out_type,
            stateStructType=state_type,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
