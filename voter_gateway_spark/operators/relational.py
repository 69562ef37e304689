"""Relational operators Spark lacks as built-ins, re-expressed as
shuffle-efficient DataFrame plans: as-of joins and point-in-interval
(range) joins — the time-alignment primitives of event/feature
pipelines.

Both avoid the naive O(n·m) theta join:

- `as_of_join` is the union-marker/window formulation: one shuffle on
  the key, a running `last(ignorenulls)` carries the most recent right
  row forward — no range condition ever reaches the join, so there is
  no BroadcastNestedLoop/cartesian fallback regardless of size.
- `interval_join` banded-buckets time: intervals explode to the coarse
  buckets they cover, points join on (key, bucket) equi-keys, and the
  exact containment predicate filters after. Bucket width trades
  duplication (interval_span/width rows per interval) against bucket
  occupancy — the classic banded range-join strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from voter_gateway_spark.session import ckpt_lazy


def _asof_num(col: Column, dtype: str) -> Column:
    """Numeric rendering of an as-of time for delta arithmetic: epoch
    seconds (fractional) for timestamps/dates, the value itself for
    numerics."""
    if dtype.startswith("timestamp") or dtype == "date":
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with the full pandas-merge_asof surface:

    - direction='backward' (default): LARGEST right_time <= left_time
      per key (inclusive, the ASOF JOIN convention);
    - direction='forward': SMALLEST right_time >= left_time;
    - direction='nearest': whichever of the two is closer in time,
      ties broken backward (the pandas convention);
    - tolerance: maximum |Δt| (inclusive; seconds for time-typed
      columns, same units as the column for numerics) — a match beyond
      it returns NULLs, exactly like no match at all.

    Right columns are NULL when no qualifying right row exists.
    `right` must be unique per (on, right_time) — pre-aggregate
    otherwise (ambiguous picks are the caller's modeling bug, not a
    tie-break to hide).

    Plan: union both sides with a marker, one window per key ordered by
    (time, marker — right rows first so equal timestamps match), then
    `last(payload, ignorenulls=True)` over the running frame. ONE
    shuffle on the key; 'nearest' adds the mirrored window over the
    SAME partitioning (a second sort, not a second shuffle). Scales as
    a sort within partitions.

    The payload is carried as ONE struct, not per-column: per-column
    last(ignorenulls) would reach back to an OLDER right row for any
    column that is legitimately NULL in the most recent one, emitting
    a combination of values that never coexisted in any right row.
    The struct is non-null exactly on right rows, so ignorenulls skips
    left rows only and the whole matched row travels together —
    NULL-payload columns stay NULL, as a real ASOF join returns them.
    The matched right TIME rides inside the struct (reserved field
    `_asof_rt`), so tolerance and nearest-choice see the exact row that
    matched.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"as_of_join right columns {sorted(clash)} collide with left "
            "columns; alias the right payload first"
        )
    if "_asof_rt" in right_cols:
        raise ValueError("right column name _asof_rt is reserved")
    l = left.withColumn("_asof_t", F.col(left_time)).withColumn(
        "_is_left", F.lit(1)
    )
    r = right.select(
        F.col(on),
        F.col(right_time).alias("_asof_t"),
        F.lit(0).alias("_is_left"),
        F.struct(
            F.col(right_time).alias("_asof_rt"),
            *[F.col(c) for c in right_cols],
        ).alias("_asof_payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    rt_dtype = dict(right.dtypes)[right_time]
    lt_num = _asof_num(F.col("_asof_t"), rt_dtype)

    def carry(descending: bool) -> Column:
        # backward: ascending scan, last right row at or before me.
        # forward: descending scan, last right row at or after me.
        # Marker asc keeps right rows first at equal timestamps in both
        # directions, so equal-ts matches stay inclusive.
        order = F.col("_asof_t").desc() if descending else F.col("_asof_t").asc()
        w = (
            Window.partitionBy(on)
            .orderBy(order, F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_asof_payload", ignorenulls=True).over(w)

    def gated(payload: Column) -> tuple[Column, Column]:
        """(payload-or-null-under-tolerance, |Δt|). A NULL left time
        matches nothing in ANY direction: the ascending backward scan
        puts NULLs first (no right row precedes them — naturally
        unmatched), but the descending forward scan puts them last,
        where they would spuriously 'see' the earliest right row (r7
        code review) — so the guard is explicit, not an ordering
        accident."""
        payload = F.when(F.col("_asof_t").isNotNull(), payload)
        delta = F.abs(lt_num - _asof_num(payload["_asof_rt"], rt_dtype))
        if tolerance is not None:
            payload = F.when(delta <= F.lit(float(tolerance)), payload)
        return payload, delta

    cols = [c for c in unioned.columns if c != "_asof_payload"]
    if direction == "nearest":
        pb, db = gated(carry(False))
        pf, df_ = gated(carry(True))
        picked = (
            F.when(pb.isNull(), pf)
            .when(pf.isNull(), pb)
            .when(db <= df_, pb)  # tie -> backward
            .otherwise(pf)
        )
        carried = unioned.select(*cols, picked.alias("_asof_payload"))
    else:
        p, _ = gated(carry(direction == "forward"))
        carried = unioned.select(*cols, p.alias("_asof_payload"))
    return (
        carried.where(F.col("_is_left") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_asof_payload.{c}").alias(c) for c in right_cols],
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start: str,
    end: str,
    bucket_width: int,
    time_unit_expr=None,
) -> DataFrame:
    """Point-in-interval equi-bucketed join: rows of `points` matched to
    every row of `intervals` with the same key and
    start <= point_time <= end (inclusive both ends).

    `bucket_width` is in the units of the time columns after
    `time_unit_expr` (default: unix seconds via unix_timestamp for
    timestamp columns, identity for numerics). Intervals explode to
    ceil(span/width)+1 bucket rows; points hash to one bucket; the join
    is a plain (key, bucket) equi-join followed by the exact range
    filter — Catalyst never sees a range join, so no nested-loop
    fallback at any scale.
    """
    clash = (set(points.columns) & set(intervals.columns)) - {on}
    if clash:
        raise ValueError(
            f"interval_join shared non-key columns {sorted(clash)} would make "
            "the range predicate ambiguous; alias one side first"
        )
    to_units = time_unit_expr or (
        lambda c: F.unix_timestamp(c).cast("bigint")
    )

    p_units = to_units(F.col(point_time))
    s_units = to_units(F.col(start))
    e_units = to_units(F.col(end))

    p = points.withColumn("_bucket", F.floor(p_units / bucket_width))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(s_units / bucket_width), F.floor(e_units / bucket_width)
            )
        ),
    )
    joined = p.join(i, [on, "_bucket"]).where(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.drop("_bucket")


def hash_mod_sample(
    df: DataFrame, key: str | Column, percent: int, buckets: int = 100
) -> DataFrame:
    """Deterministic, engine-portable sampling: keep rows whose
    md5-derived bucket of `key` falls below `percent` (of `buckets`).

    Unlike df.sample(), the kept set is a pure function of the key —
    stable across runs, engines (the DuckDB oracle reproduces it), and
    cluster layouts, and consistent across tables sharing the key
    (sample customers and their orders with the same predicate). This
    is the reproducible-split primitive for train/eval carves.
    """
    from voter_gateway_spark.operators.dedup_ops import md5_hash60

    c = F.col(key) if isinstance(key, str) else key
    bucket = F.pmod(md5_hash60(c), F.lit(buckets))
    return df.where(bucket < percent)


def mixture_sample(
    df: DataFrame,
    key: str | Column,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 10000,
) -> DataFrame:
    """Per-group sampling rates — the training-mix weighting step
    (e.g. wiki at 90%, common-crawl at 15%, everything else dropped).

    Same md5-bucket determinism as hash_mod_sample (reproducible across
    runs/engines/layouts, consistent across tables sharing the key, and
    nested: a group's 10% carve ⊆ its 20% carve), with the rate chosen
    by `group_col` through a broadcast of the rate table — the
    predicate stays a scan-stage filter, no shuffle. Rates are
    fractions in [0, 1], resolved to an integer bucket threshold so the
    cut is exact on both engines.
    """
    from voter_gateway_spark.operators.dedup_ops import md5_hash60

    c = F.col(key) if isinstance(key, str) else key
    bucket = F.pmod(md5_hash60(c), F.lit(buckets))
    spark = df.sparkSession
    rate_rows = [(g, int(round(r * buckets))) for g, r in rates.items()]
    rdf = spark.createDataFrame(rate_rows, f"{group_col} string, _thresh int")
    return (
        df.join(F.broadcast(rdf), group_col, "left")
        .where(bucket < F.coalesce("_thresh", F.lit(int(round(default_rate * buckets)))))
        .drop("_thresh")
    )


def quota_cap(
    df: DataFrame,
    group_cols: list[str],
    order_col: str | Column | list[str | Column],
    cap: int,
) -> DataFrame:
    """Keep at most `cap` rows per group, chosen deterministically by
    `order_col` — the per-domain/per-source quota step that keeps one
    hot crawl domain from dominating a training mix.

    Determinism requires `order_col` to be a TOTAL order within each
    group (ties get partition-order-dependent row_numbers). Pass a list
    ending in a unique key (e.g. ["crawl_date", "doc_id"]) when the
    primary sort key has ties.

    One shuffle (hash by group); Spark 4's WindowGroupLimit pushes a
    partial top-`cap` below the exchange, so each map task forwards at
    most `cap` rows per local group — the shuffle carries
    O(groups × cap), not O(rows), which is what makes a quota over a
    skewed domain distribution (the norm for web crawls) safe at
    100 TB."""
    ocs = order_col if isinstance(order_col, list) else [order_col]
    ordering = [
        (F.col(o) if isinstance(o, str) else o).asc() for o in ocs
    ]
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of `value_col` in `order_col` order — the
    distributed-scan primitive — WITHOUT the single-partition global
    window that `sum().over(orderBy(...))` plans (one task holding the
    entire dataset: the canonical 100 TB killer).

    Classic two-phase scan instead: range-partition by the order column
    (partition order = range order), cumsum WITHIN each partition, then
    add each partition's base offset (the cumsum of per-partition
    totals — `partitions` rows, computed on the driver and joined back
    broadcast). Wall-clock is two narrow shuffles + an O(partitions)
    driver step; every window group is one range partition, so size
    `partitions` to bound rows per task at the target scale.

    `order_col` must be unique (ties could split across range
    boundaries and receive order-dependent offsets).
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # lazy checkpoint: the totals collect materializes the ranged frame,
    # the final plan then reuses it — one range shuffle, not two
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .transform(ckpt_lazy)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = ranged.withColumn(
        "_local", F.sum(F.col(value_col)).over(w) - F.col(value_col)
    )
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(F.col(value_col)).alias("_t"))
        .orderBy("_pid")
        .collect()
    )
    # integral value columns keep exact bigint offsets; fractional ones
    # ride as doubles (a hard-coded bigint schema would reject the
    # collected Python floats outright, and the final cast would then
    # silently truncate)
    integral = isinstance(
        df.schema[value_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    base_t = "bigint" if integral else "double"
    base, acc = [], 0
    for r in totals:
        base.append((r["_pid"], acc if integral else float(acc)))
        acc += r["_t"] or 0
    bases = df.sparkSession.createDataFrame(
        base or [(0, 0 if integral else 0.0)], f"_pid int, _base {base_t}"
    )
    out_val = F.coalesce("_base", F.lit(0)) + F.col("_local")
    return (
        within.join(F.broadcast(bases), "_pid", "left")
        .withColumn(out_col, out_val.cast(base_t))
        .drop("_pid", "_local", "_base")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    seq_len: int = 512,
    partitions: int | None = None,
) -> DataFrame:
    """Sequence-packing offsets: concatenate documents in `id_col`
    order into one token stream and map each document to its packed
    position — the GPT-style training-batch packing layout. Output
    adds: `token_offset` (exclusive prefix sum), `seq_start`/`seq_end`
    (the first/last seq_len-sized training sequence the document's
    tokens land in). Built on prefix_sum, so no single-partition
    window."""
    out = prefix_sum(df, id_col, count_col, "token_offset", partitions)
    return (
        out.withColumn(
            "seq_start", F.floor(F.col("token_offset") / seq_len).cast("bigint")
        )
        .withColumn(
            "seq_end",
            F.floor(
                (F.col("token_offset") + F.greatest(F.col(count_col) - 1, F.lit(0)))
                / seq_len
            ).cast("bigint"),
        )
    )


EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat_a: Column, lng_a: Column, lat_b: Column, lng_b: Column) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for the short distances blocking produces, where the spherical-law
    cosine loses precision). Pure Column trig: sin/cos/asin run
    JVM-side in codegen. Engines' libm implementations may differ in
    the last ulp for transcendentals, so a cross-engine consumer must
    round the output AND keep decision thresholds away from achievable
    distances (geo_radius_join's catalog fixture asserts its margin by
    test — the determinism discipline for any float predicate)."""
    dlat = F.radians(lat_b - lat_a)
    dlng = F.radians(lng_b - lng_a)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b)) * F.pow(F.sin(dlng / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    left_lat: str = "lat",
    left_lng: str = "lng",
    right_lat: str = "lat",
    right_lng: str = "lng",
    dist_col: str = "dist_km",
) -> DataFrame:
    """Spatial radius join (find all right rows within radius_km of
    each left row) as a grid-cell equi-join — the range-join class
    Spark has no built-in for, done without a BroadcastNestedLoop:

    1. snap both sides to (floor(lat/cell), floor(lng/cell)) grid
       cells;
    2. explode each LEFT row to its 3x3 cell neighborhood (9 compact
       int-pair keys — the bounded fan-out side) and equi-join the
       right side on the cell key: a plain shuffled hash join whose
       work scales with cell occupancy, never |L|x|R|;
    3. verify the exact haversine predicate on the survivors.

    Correctness requires the neighborhood to cover the radius:
    cell_deg >= radius_km / (111.0 * cos(max |lat|)) — longitude
    degrees shrink by cos(lat), so the caller passes a cell size
    derived from their latitude band (the fixture uses |lat| <= 60 →
    cell 2x the equatorial radius-degrees). Completeness vs the naive
    cross join is pinned by test on a fixture spanning the band.

    At 100 TB this is the standard geospatial-blocking shape: cells
    are partition keys (skew from dense cities is ordinary key skew —
    AQE skew-split applies), and the exact predicate touches only
    co-located candidates. Output: left row + right row + dist_col.
    Left and right column names must be disjoint (rename upstream —
    the blocked_pairs convention).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"geo_radius_join needs disjoint column names; shared: {sorted(overlap)}"
        )
    lcell_lat = F.floor(F.col(left_lat) / cell_deg).cast("long")
    lcell_lng = F.floor(F.col(left_lng) / cell_deg).cast("long")
    offs = [F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
            for i in (-1, 0, 1) for j in (-1, 0, 1)]
    lx = (
        left.withColumn("_o", F.explode(F.array(*offs)))
        .withColumn("_ci", lcell_lat + F.col("_o.di"))
        .withColumn("_cj", lcell_lng + F.col("_o.dj"))
        .drop("_o")
    )
    rx = right.withColumn(
        "_ci", F.floor(F.col(right_lat) / cell_deg).cast("long")
    ).withColumn("_cj", F.floor(F.col(right_lng) / cell_deg).cast("long"))
    d = haversine_km(
        F.col(left_lat), F.col(left_lng), F.col(right_lat), F.col(right_lng)
    )
    return (
        lx.join(rx, ["_ci", "_cj"])
        .withColumn(dist_col, d)
        .where(F.col(dist_col) <= radius_km)
        .drop("_ci", "_cj")
    )
