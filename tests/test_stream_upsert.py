"""Streaming upsert sink: foreachBatch match/merge against a parquet
target, batch-oracle parity, merge-expression routing, swap atomicity
(no leftover temp versions)."""

import glob
import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.plans import MergePlan
from voter_gateway_spark.streaming.upsert_sink import (
    bootstrap_target,
    stream_upsert_parquet,
)


def _write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(stream_writer, tmp_path, name):
    q = stream_writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / f"ckpt_{name}")
    ).start()
    q.awaitTermination(180)
    q.stop()


def test_stream_upsert_matches_and_inserts(spark, tmp_path):
    target_dir = str(tmp_path / "tgt")
    bootstrap_target(
        spark,
        target_dir,
        spark.createDataFrame(
            [Row(id=1, k="K1", v=10), Row(id=2, k="K2", v=20)],
            "id int, k string, v int",
        ),
    )
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _write_jsonl(
        src_dir / "b1.jsonl",
        [
            {"id": 100, "k": "K1", "v": 5},   # matches id=1 on k
            {"id": 101, "k": "KX", "v": 7},   # no match → insert
        ],
    )
    stream = spark.readStream.schema("id int, k string, v int").json(str(src_dir))
    plan = MergePlan(target_pk="id").merge_column_as("v", "$T + $S")
    writer = stream_upsert_parquet(
        stream.drop("id"), target_dir, pk="id",
        match_columns=[["k"]], merge_plan=plan,
    )
    _run(writer, tmp_path, "u1")

    got = spark.read.parquet(target_dir)
    rows = {r.id: r for r in got.where("id IS NOT NULL").collect()}
    assert rows[1].v == 15          # merged via $T + $S
    assert rows[2].v == 20          # untouched
    inserted = got.where("id IS NULL").collect()
    assert len(inserted) == 1 and inserted[0].k == "KX"
    # swap left no temp/old versions behind
    leftovers = glob.glob(f"{target_dir}__*")
    assert leftovers == []


def test_stream_upsert_two_batches_accumulate(spark, tmp_path):
    target_dir = str(tmp_path / "tgt2")
    bootstrap_target(
        spark,
        target_dir,
        spark.createDataFrame([Row(id=1, k="K1", v=1)], "id int, k string, v int"),
    )
    src_dir = tmp_path / "src2"
    src_dir.mkdir()
    stream = spark.readStream.schema("k string, v int").option(
        "maxFilesPerTrigger", 1
    ).json(str(src_dir))
    plan = MergePlan(target_pk="id").merge_column_as("v", "$T + $S")
    writer = stream_upsert_parquet(
        stream, target_dir, pk="id", match_columns=[["k"]], merge_plan=plan
    )

    _write_jsonl(src_dir / "b1.jsonl", [{"k": "K1", "v": 10}])
    _run(writer, tmp_path, "u2")
    _write_jsonl(src_dir / "b2.jsonl", [{"k": "K1", "v": 100}])
    writer2 = stream_upsert_parquet(
        spark.readStream.schema("k string, v int").option("maxFilesPerTrigger", 1).json(str(src_dir)),
        target_dir, pk="id", match_columns=[["k"]], merge_plan=plan,
    )
    _run(writer2, tmp_path, "u2")   # same checkpoint resumes at b2

    got = {r.id: r.v for r in spark.read.parquet(target_dir).where("id IS NOT NULL").collect()}
    assert got[1] == 111            # 1 + 10 + 100 across two batches
