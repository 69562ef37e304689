"""Scale-stress harness: replicate the sf0.1 fixtures N× with
key-offsetting (so FK joins stay valid and every document gains N-1
exact duplicates — the crawl-duplication worst case every blocking
scheme must survive), then time the heavy operators.

This is the experiment behind SCALING.md's measured numbers (the d²
candidate blowup and its collapse fix). Usage:

    python tools/stress_scale.py [N] [dest_dir]

Writes to /tmp (never the read-only fixtures) and prints one line per
query. A timing that grows faster than ~N× versus `bench.py` at sf0.1
is a scale regression.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from voter_gateway_spark.queries import QUERIES  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

STRESS_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "match_cascade_orders_customers",
    "merge_upsert_customers",
    "dedup_ngram_jaccard",
    "dedup_ngram_prefix_filtered",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fuzzy_top1_documents",
    "fuzzy_claiming_documents",
    "text_langid",
    "events_hourly",
    "events_sessionized",
    "dedup_corpus_pruned",
    # round-2 additions: incremental probe, contamination index,
    # distributed prefix sum, stream-stream batch form, corpus prep
    "dedup_incremental_batch",
    "corpus_contamination",
    "pack_sequences_documents",
    "events_view_purchase_attribution",
    "pipeline_corpus_prep",
    # round-3 additions: span contamination (positional join),
    # tf-idf (shared tf materialization), funnel, CDC fold, quota
    "contamination_span_pairs",
    "text_tfidf_top_terms",
    "events_funnel",
    "cdc_apply_orders",
    "events_value_cap",
]


def replicate(spark, n: int, dst: str) -> None:
    def offset_union(name: str, key_cols: list[str]):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        maxes = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in key_cols}
        parts = []
        for i in range(n):
            p = df
            for k, m in maxes.items():
                p = p.withColumn(k, F.col(k) + F.lit(i * m))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    # orders/lineitem share the orderkey offset; custkeys stay in the
    # original customer range so the FK holds
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    ok_max = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    for name, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [df.withColumn(key, F.col(key) + F.lit(i * ok_max)) for i in range(n)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    offset_union("documents", ["doc_id"])
    offset_union("embeddings", ["vec_id"])
    # events: offset ids AND shift each replica by a day so windowed/
    # sessionized state grows with data (not just row counts). Load
    # through the dtype-defensive boundary (ts is a canonical
    # timestamp whatever the fixture encoding), so the shift is an
    # INTERVAL, not raw nanos arithmetic.
    from voter_gateway_spark.sources.fixtures import load_events

    ev = load_events(spark, SRC)
    eid_max = ev.agg(F.max("event_id")).collect()[0][0] + 1
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * eid_max))
        .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} DAYS"))
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/events.parquet")
    for t in ["customer", "supplier", "part", "nation", "region"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")


def skew_stress(n: int, dst: str) -> None:
    """Hot-key stress (voter-file shape: an empty/default join value
    carrying a constant fraction of rows): ONE customer key receives
    ~10% of ALL orders, then the match_cascade -> merge_upsert pipeline
    runs with broadcast joins DISABLED so the match join shuffles both
    sides — the 100 TB posture, where the dim no longer fits a
    broadcast and a hot key lands 10% of the table on one reducer.

    Runs the pipeline twice (AQE skew-split ON vs OFF, runtime confs),
    reports wall time and whether the final adaptive plan actually
    split the hot partition (`skew=true` in the sort-merge join). AQE
    thresholds are lowered to engage at local data sizes; at cluster
    sizes the defaults (256 MB) engage on their own."""
    from voter_gateway_spark.plans import MatchPlan, MergePlan

    spark = build_spark(
        app_name="vgs-skew",
        extra_conf={
            # make the local partitions look "big" to the skew detector:
            # the hot shuffle partition here is ~3 MB (projected join
            # columns), far below the 256 MB cluster default
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    ok_max = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * ok_max))
        for i in range(n)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    hot = big.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(1)).otherwise(F.col("o_custkey")),
    )
    hot.write.mode("overwrite").parquet(f"{dst}/orders_skewed.parquet")
    cust = spark.read.parquet(f"{SRC}/customer.parquet")

    def pipeline():
        o = spark.read.parquet(f"{dst}/orders_skewed.parquet")
        mp = MatchPlan(o, cust, target_pk="c_custkey", source_id="o_orderkey")
        mp.foreign_key_match(
            [("o_custkey", "c_custkey")], raw_condition="t.c_acctbal > 5000"
        )
        mp.foreign_key_match(
            [("o_custkey", "c_custkey")], raw_condition="t.c_mktsegment = 'BUILDING'"
        )
        matches = mp.matches()
        src = matches.groupBy(
            F.col("_target_id").alias("c_custkey")
        ).agg(F.lit(1.0).alias("c_acctbal"))
        plan = MergePlan(target_pk="c_custkey").merge_column_as(
            "c_acctbal", "round($T + $S, 2)"
        )
        mp2 = MatchPlan(src, cust, target_pk="c_custkey", source_id="c_custkey")
        mp2.find_exact_matches(["c_custkey"])
        merged = plan.execute(mp2.matches(), cust).target
        return matches, merged

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # warmup (JIT + file listing) so the on/off timings compare fairly
    pipeline()[0].count()
    for mode in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", mode)
        t0 = time.time()
        matches, merged = pipeline()
        # collect() executes the DataFrame's OWN QueryExecution — count()
        # spawns a derived plan, and the final adaptive plan (the one
        # that shows skew=true splits) would never be visible on it
        rows = len(matches.collect())
        merged_rows = merged.count()
        dt = time.time() - t0
        plan_str = matches._jdf.queryExecution().executedPlan().toString()
        engaged = "skew=true" in plan_str
        print(
            f"skew_stress x{n} skewJoin={mode}: match={rows} merged={merged_rows} "
            f"{dt:.1f}s  aqe_skew_split_engaged={engaged}",
            flush=True,
        )
    spark.stop()


EVENT_DECADE_QUERIES = [
    "events_hourly",
    "events_sessionized",
    "events_funnel",
    "events_retention",
    "events_value_cap",
    "events_view_purchase_attribution",
    "events_hourly_anomalies",
    "interval_join_events_windows",
    "asof_order_revenue_events",
    "audit_distinct_users_by_type",
    "audit_flag_distribution_events",
    "events_daily_pivot",
    "events_funnel_latency",
    # r7 newcomer with a bounded-state claim (max_len+1 structs per
    # session before the collect_list) — measured here so the claim
    # has a decade row, not just a plan test
    "events_session_paths",
]


def events_decade(n: int, dst: str, build_only: bool = False) -> None:
    """Third measured decade, EVENTS-ONLY: the documents/embeddings
    families can't replicate past ~100× without their outputs
    themselves going d² (pair emission over d-way-duplicated corpora
    is quadratic in d BY CONTRACT), but the keyed-shuffle event
    families have no such ceiling — so this pushes them one more
    decade (1000× ≈ 100M rows, ts spread over `n` days so window
    state grows with data, not just row count).

    The replica is built as ONE plan (events × range(n) cross join
    with offset arithmetic), not an n-leaf union — at n=1000 a union
    plan would be 1000 scan leaves. Other tables stay at sf0.1 (asof
    joins its original orders side; the growth is all on the probe
    side, which is the 100 TB shape anyway: fact grows, dims don't).
    """
    from voter_gateway_spark.sources.fixtures import load_events

    spark = build_spark(app_name="vgs-events-decade")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    ev = load_events(spark, SRC)
    eid_max = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = spark.range(n).select(F.col("id").cast("int").alias("_rep"))
    big = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("_rep").cast("bigint") * F.lit(eid_max))
        .withColumn("ts", F.expr("timestampadd(DAY, _rep, ts)"))
        .drop("_rep")
    )
    Path(dst).mkdir(parents=True, exist_ok=True)
    big.repartition(64).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    for t in ["orders", "lineitem", "customer", "supplier", "part", "nation", "region"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    n_rows = spark.read.parquet(f"{dst}/events.parquet").count()
    print(f"built {dst} events x{n} = {n_rows} rows in {time.time() - t0:.0f}s", flush=True)
    spark.stop()
    if build_only:
        return
    # measure in a CLEAN session: the r7 methodology note showed the
    # build session's page-cache + GC pressure inflates single-shot
    # timings ~1.5x (202 s vs 139 s) — decade artifacts come from a
    # fresh JVM since
    events_measure(dst, EVENT_DECADE_QUERIES, runs=2, label=f"events x{n}")


def events_measure(
    dst: str, names: list[str], runs: int = 2, label: str | None = None
) -> None:
    """Best-of-`runs` wall-clock per query over an events replica, in
    a session that did NOT build the replica (see events_decade)."""
    spark = build_spark(app_name="vgs-events-measure")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["events_hourly"](spark, dst).count()  # JVM/codegen warmup
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            QUERIES[name](spark, dst).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", flush=True)
    import json

    print(json.dumps({
        "metric": "events_decade_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": f"{dst} ({label or 'events replica'})",
        "runs": runs,
    }), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--events":
        rest = [a for a in sys.argv[2:] if a != "--build-only"]
        n = int(rest[0]) if rest else 1000
        events_decade(n, f"/tmp/stress_ev_x{n}", "--build-only" in sys.argv)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--events-measure":
        # measure-only over an already-built replica dir; optional
        # comma-separated query subset (e.g. the r7 watch pair in
        # isolation) and run count
        dst = sys.argv[2]
        names = EVENT_DECADE_QUERIES
        runs = 2
        rest = sys.argv[3:]
        i = 0
        while i < len(rest):
            if rest[i] == "--queries":
                names = [q for q in rest[i + 1].split(",") if q]
                i += 2
            elif rest[i] == "--runs":
                runs = int(rest[i + 1])
                i += 2
            else:
                raise SystemExit(f"unknown arg {rest[i]!r}")
        events_measure(dst, names, runs=runs, label=Path(dst).name)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        skew_stress(n, f"/tmp/skew_x{n}")
        return
    build_only = "--build-only" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--build-only"]
    n = int(args[0]) if args else 10
    dst = args[1] if len(args) > 1 else f"/tmp/stress_x{n}"
    spark = build_spark(app_name="vgs-stress")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    replicate(spark, n, dst)
    print(f"built {dst} (x{n}) in {time.time() - t0:.0f}s", flush=True)
    if build_only:
        spark.stop()
        return
    for name in STRESS_QUERIES:
        t0 = time.time()
        df = QUERIES[name](spark, dst)
        # noop sink: full-plan evaluation with no count()-elimination
        # (see bench.py) — rows counted separately for the report
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{name}: {df.count()} rows  {dt:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
