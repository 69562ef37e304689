"""Streaming FS admission (streaming/linkage_admission.py): the
probabilistic matcher plugged into the upsert sink must fold arrival
files exactly like sequential batch fs_matches + MergePlan runs, see
its own earlier inserts (read-your-own-writes across batches), and
emit MatchPlan.matches()-shaped rows the merge layer accepts."""

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.plans import MergePlan, linkage
from voter_gateway_spark.plans.linkage import FieldWeights
from voter_gateway_spark.streaming.linkage_admission import (
    fs_registry_matcher,
    stream_fs_admission,
)
from voter_gateway_spark.streaming.upsert_sink import bootstrap_target

SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_mktsegment string, c_acctbal double"
)

RULES = [
    [("s_name", "t_name"), ("s_nation", "t_nation")],
    [("s_nation", "t_nation"), ("s_seg", "t_seg"), ("s_bucket", "t_bucket")],
]
GAMMAS = {
    "g_name": ("s_name", "t_name"),
    "g_seg": ("s_seg", "t_seg"),
    "g_bucket": ("s_bucket", "t_bucket"),
}
WEIGHTS = {
    "g_name": FieldWeights(m=0.95, u=0.001),
    "g_seg": FieldWeights(m=0.85, u=0.2),
    "g_bucket": FieldWeights(m=0.8, u=0.09),
}
THRESHOLD = 2.0


def _prep_src(df):
    return df.select(
        F.col("c_custkey").alias("_fs_src_id"),
        F.col("c_name").alias("s_name"),
        F.col("c_nationkey").alias("s_nation"),
        F.col("c_mktsegment").alias("s_seg"),
        F.floor(F.col("c_acctbal") / 1000).alias("s_bucket"),
    )


def _prep_tgt(df):
    return df.select(
        "c_custkey",
        F.col("c_name").alias("t_name"),
        F.col("c_nationkey").alias("t_nation"),
        F.col("c_mktsegment").alias("t_seg"),
        F.floor(F.col("c_acctbal") / 1000).alias("t_bucket"),
    )


def _registry(spark):
    return spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="Customer#A", c_nationkey=1,
                c_mktsegment="BUILDING", c_acctbal=1500.0),
            Row(c_custkey=2, c_name="Customer#B", c_nationkey=1,
                c_mktsegment="MACHINERY", c_acctbal=2500.0),
            Row(c_custkey=3, c_name="Customer#C", c_nationkey=2,
                c_mktsegment="BUILDING", c_acctbal=3500.0),
        ],
        SCHEMA,
    )


BATCH1 = [
    # name+nation block -> registry 1; weight wa_n + wd_s + wa_b >> 2
    {"c_custkey": 901, "c_name": "Customer#A", "c_nationkey": 1,
     "c_mktsegment": "AUTOMOBILE", "c_acctbal": 1400.0},
    # only the (nation, seg, bucket) recall block -> registry 2;
    # weight wd_n + wa_s + wa_b ~= 0.92 < 2 -> insert
    {"c_custkey": 902, "c_name": "Customer#ZZ", "c_nationkey": 1,
     "c_mktsegment": "MACHINERY", "c_acctbal": 2700.0},
    # no block at all -> insert
    {"c_custkey": 903, "c_name": "Customer#NEW", "c_nationkey": 5,
     "c_mktsegment": "BUILDING", "c_acctbal": 100.0},
]
BATCH2 = [
    # re-links registry 1 (name survived batch 1's overwrite)
    {"c_custkey": 904, "c_name": "Customer#A", "c_nationkey": 1,
     "c_mktsegment": "FURNITURE", "c_acctbal": 1450.0},
    # links the row batch 1 INSERTED (read-your-own-writes)
    {"c_custkey": 905, "c_name": "Customer#ZZ", "c_nationkey": 1,
     "c_mktsegment": "MACHINERY", "c_acctbal": 2750.0},
]


def _matcher():
    return fs_registry_matcher(
        source_pk="c_custkey", target_pk="c_custkey",
        prepare_source=_prep_src, prepare_target=_prep_tgt,
        rules=RULES, gammas=GAMMAS, weights=WEIGHTS, threshold=THRESHOLD,
    )


def test_fs_matches_shape_and_decisions(spark):
    batch = spark.createDataFrame([Row(**r) for r in BATCH1], SCHEMA)
    matches = _matcher()(batch, _registry(spark))
    assert {"_source_id", "_target_id", "_match_rule"} <= set(matches.columns)
    got = {r.c_custkey: (r._target_id, r._match_rule) for r in matches.collect()}
    assert got[901] == (1, 1)
    assert got[902] == (None, None)   # below threshold -> unmatched
    assert got[903] == (None, None)   # blocked out entirely


def _apply_batch(spark, registry, rows):
    batch = spark.createDataFrame([Row(**r) for r in rows], SCHEMA)
    matches = _matcher()(batch, registry)
    return MergePlan(target_pk="c_custkey").execute(matches, registry).target


def test_stream_folds_equal_sequential_batches(spark, tmp_path):
    target_dir = str(tmp_path / "registry")
    bootstrap_target(spark, target_dir, _registry(spark))

    src_dir = tmp_path / "arrivals"
    src_dir.mkdir()
    for i, rows in enumerate([BATCH1, BATCH2], start=1):
        p = src_dir / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        # FileStreamSource orders by mtime — pin distinct stamps
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    writer = stream_fs_admission(
        stream, target_dir, pk="c_custkey",
        prepare_source=_prep_src, prepare_target=_prep_tgt,
        rules=RULES, gammas=GAMMAS, weights=WEIGHTS, threshold=THRESHOLD,
    )
    q = writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(180)
    q.stop()

    streamed = sorted(
        tuple(r) for r in spark.read.parquet(target_dir)
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )

    seq = _registry(spark)
    for rows in [BATCH1, BATCH2]:
        seq = _apply_batch(spark, seq, rows)
    expected = sorted(tuple(r) for r in seq.collect())
    assert streamed == expected

    by_id = {t[0]: t for t in streamed}
    # registry 1 updated twice, last by 904
    assert by_id[1][3] == "FURNITURE" and by_id[1][4] == 1450.0
    # 902 inserted by batch 1, then UPDATED by 905 (read-your-own-writes)
    assert by_id[902][4] == 2750.0
    # 903 inserted; 2 and 3 untouched; matched arrivals not inserted
    assert by_id[903][1] == "Customer#NEW"
    assert by_id[2][4] == 2500.0 and by_id[3][4] == 3500.0
    assert set(by_id) == {1, 2, 3, 902, 903}
