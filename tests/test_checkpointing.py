"""Reliable-checkpoint switch (SCALING.md "known local-vs-cluster deltas").

With SPARK_GRAFT_CHECKPOINT_DIR set, every lineage-truncation site
routes through storage-backed df.checkpoint() instead of
localCheckpoint, so iterative jobs (connected components, fuzzy
claiming, collapse) survive executor loss on a preemptible cluster.
These tests run the two flagship iterative paths under both modes and
assert identical results, plus that the reliable path actually writes
checkpoint data into the configured directory.
"""

import os
from pathlib import Path

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.operators import dedup_ops, fuzzy
from voter_gateway_spark.session import ckpt, reliable_checkpoint_dir


def _components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a int, id_b int",
    )
    return {
        (r.id, r.component)
        for r in dedup_ops.connected_components(pairs).collect()
    }


def _claims(spark):
    pool = spark.createDataFrame(
        [Row(id=1, name="jonathan smith"), Row(id=2, name="maria garcia")],
        "id int, name string",
    )
    srcs = spark.createDataFrame(
        [
            Row(id=10, name="jonathan smith"),
            Row(id=11, name="jonathan smyth"),
            Row(id=12, name="maria garcia"),
        ],
        "id int, name string",
    )
    return {
        (r.id, r.matched_id)
        for r in fuzzy.fuzzy_claiming_rounds(srcs, pool, ["name"], "id", "id").collect()
    }


def test_flag_off_by_default(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    assert reliable_checkpoint_dir() is None


def test_reliable_checkpoint_identical_results_and_files(spark, tmp_path, monkeypatch):
    local_components = _components(spark)
    local_claims = _claims(spark)

    ckpt_dir = tmp_path / "reliable_ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckpt_dir))

    reliable_components = _components(spark)
    reliable_claims = _claims(spark)

    assert reliable_components == local_components
    assert reliable_claims == local_claims
    # sanity: 3 components (min-label); at-most-once claiming means
    # source 11 loses target 1 to source 10, leaving 2 claims
    assert {c for _, c in reliable_components} == {1, 10, 20}
    assert reliable_claims == {(10, 1), (12, 2)}

    # the reliable path must actually have written checkpoint data.
    # ckpt() installs the dir on first use; the shared SparkContext may
    # already point at a dir from an earlier test in this session, so
    # assert against the context's actual target.
    actual = spark.sparkContext.getCheckpointDir()
    assert actual is not None
    files = [p for p in Path(actual.removeprefix("file:")).rglob("*") if p.is_file()]
    assert files, "reliable checkpoint wrote no files"


def test_ckpt_transform_shape_preserved(spark, tmp_path, monkeypatch):
    """df.transform(ckpt) must be schema/row-transparent in both modes."""
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    base = df.transform(ckpt)
    assert base.schema == df.schema and base.count() == 100
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "c2"))
    rel = df.transform(ckpt)
    assert rel.schema == df.schema and rel.count() == 100


def test_ckpt_cut_transparent_and_severed(spark):
    """ckpt_cut must be row/schema-transparent, reusable in joins, and
    actually sever the origin plan (the optimized plan bottoms out in
    an RDD scan leaf, not the original parquet/range lineage)."""
    from voter_gateway_spark.session import ckpt_cut

    df = spark.range(200).withColumn("v", (F.col("id") * 7) % 13)
    cut = ckpt_cut(df)
    assert cut.schema == df.schema
    assert cut.count() == 200
    assert {r.v for r in cut.select("v").distinct().collect()} == set(range(13))
    # joinable both as left and right without surprises
    j = cut.alias("a").join(cut.alias("b"), F.expr("a.id = b.id")).count()
    assert j == 200
    plan = cut._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan, plan
