"""Physical-layout operators: Morton (Z-order) keys, clustered write
layout, small-file compaction; plus the contamination train-side
exact-collapse lever."""

import glob

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.operators.analytics import contamination_spans
from voter_gateway_spark.operators.layout import (
    compact_parquet,
    dataset_bytes,
    morton_code,
    zorder_layout,
)


def _py_morton(vals, bits=16):
    code = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            code |= (((v & 0xFFFF) >> b) & 1) << (b * n + i)
    return code


def test_morton_matches_reference_bits(spark):
    rows = [(a, b) for a in [0, 1, 2, 3, 255, 65535] for b in [0, 1, 7, 1024]]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", morton_code(["a", "b"]).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_morton([a, b]), (a, b)


def test_morton_three_columns(spark):
    df = spark.createDataFrame([(3, 5, 6)], "a bigint, b bigint, c bigint")
    got = df.select(morton_code(["a", "b", "c"], bits=8).alias("z")).collect()[0].z
    code = 0
    for bit in range(8):
        for i, v in enumerate([3, 5, 6]):
            code |= (((v & 0xFFFF) >> bit) & 1) << (bit * 3 + i)
    assert got == code


def test_morton_validates_args(spark):
    import pytest

    with pytest.raises(ValueError):
        morton_code(["a"])
    with pytest.raises(ValueError):
        morton_code(["a", "b", "c", "d"], bits=16)  # 64 > 62


def test_zorder_layout_preserves_rows_and_clusters(spark, tmp_path):
    rows = [(i % 16, (i * 7) % 16, i) for i in range(4096)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, id bigint")
    out_dir = str(tmp_path / "z")
    zorder_layout(df, ["a", "b"], n_files=4).write.parquet(out_dir)
    back = spark.read.parquet(out_dir)
    assert back.count() == 4096
    assert {tuple(r) for r in back.collect()} == set(rows)
    # clustering effect: per-file value ranges must be tighter than the
    # global range on BOTH columns for at least one file
    widths = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("a") - F.min("a")).alias("wa"),
            (F.max("b") - F.min("b")).alias("wb"),
        )
        .collect()
    )
    assert len(widths) == 4
    assert any(r.wa < 15 and r.wb < 15 for r in widths)


def test_compact_parquet(spark, tmp_path):
    src = str(tmp_path / "frag")
    # fragment: 32 small files
    spark.range(0, 100_000).repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 32
    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_file_mb=512)
    assert n == 1  # well under 512 MB
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 1
    assert spark.read.parquet(dst).count() == 100_000
    assert dataset_bytes(spark, dst) > 0


def test_contamination_collapse_train_reports_reps(spark):
    # three identical train docs: collapse reports the min-id rep only,
    # with identical span evidence
    train = spark.createDataFrame(
        [Row(doc_id=i, text="a b c d e f") for i in (5, 9, 2)],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [Row(doc_id=100, text="a b c d e f tail here")],
        "doc_id bigint, text string",
    )
    full = contamination_spans(
        ev, train, "doc_id", "text", min_matched=2, collapse_train=False
    )
    # collapse is the DEFAULT: crawl-duplicated train corpora would blow
    # the pair count up ~d² with the all-pairs (opt-in) form
    collapsed = contamination_spans(ev, train, "doc_id", "text", min_matched=2)
    assert {r.train_id for r in full.collect()} == {2, 5, 9}
    crows = collapsed.collect()
    assert {r.train_id for r in crows} == {2}
    f2 = {(r.n_matched, r.max_run) for r in full.collect() if r.train_id == 2}
    assert {(r.n_matched, r.max_run) for r in crows} == f2


def test_write_training_shards_manifest_and_order(spark, tmp_path):
    from voter_gateway_spark.operators.layout import write_training_shards

    df = spark.createDataFrame([(i,) for i in range(1, 501)], "doc_id bigint")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(df, "doc_id", out, n_shards=4)
    assert manifest["total_rows"] == 500
    assert sum(manifest["shard_rows"].values()) == 500
    assert len(manifest["shard_rows"]) <= 4
    back = spark.read.parquet(out)
    assert back.count() == 500
    # per-shard pos is dense 1..n and identical across rebuilds
    for shard, n in manifest["shard_rows"].items():
        poss = sorted(
            r.pos for r in back.where(F.col("shard") == int(shard)).collect()
        )
        assert poss == list(range(1, n + 1))
    m2 = write_training_shards(df, "doc_id", str(tmp_path / "shards2"), n_shards=4)
    assert m2["shard_rows"] == manifest["shard_rows"]
    import json, glob
    mf = json.load(open(f"{out}/_manifest.json"))
    assert mf["total_rows"] == 500


def test_file_skipping_stats_quantify_zorder(spark, tmp_path):
    from voter_gateway_spark.operators.layout import (
        file_skipping_stats,
        zorder_layout,
    )

    rows = [(i % 16, (i * 7) % 16, i) for i in range(4096)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, id bigint")
    flat = str(tmp_path / "flat")
    df.repartition(4).write.parquet(flat)          # random layout
    zed = str(tmp_path / "zed")
    zorder_layout(df, ["a", "b"], n_files=4).write.parquet(zed)

    def avg_width(path):
        stats = file_skipping_stats(spark, path, ["a", "b"]).collect()
        return sum((r.max_a - r.min_a) + (r.max_b - r.min_b) for r in stats) / len(stats)

    # clustered files cover strictly narrower value ranges on average
    assert avg_width(zed) < avg_width(flat)


def test_write_training_shards_jsonl_parity(spark, tmp_path):
    """JSONL shards carry the identical layout/manifest/determinism
    contract as parquet shards, and the text survives byte-exact."""
    from voter_gateway_spark.operators.layout import write_training_shards

    from datetime import datetime

    df = spark.createDataFrame(
        [
            (i, f"doc {i} — ünïcode\tand 中文", datetime(2024, 1, 1, 12, 0, 0, 123456 + i))
            for i in range(1, 201)
        ],
        "doc_id bigint, text string, ts timestamp",
    )
    pq = write_training_shards(df, "doc_id", str(tmp_path / "pq"), n_shards=4)
    js = write_training_shards(
        df, "doc_id", str(tmp_path / "js"), n_shards=4, file_format="json"
    )
    assert js["shard_rows"] == pq["shard_rows"]
    assert js["format"] == "json"
    back = (
        spark.read.format("json")
        .schema("doc_id bigint, text string, ts timestamp, pos bigint")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .load(str(tmp_path / "js"))
    )
    assert back.count() == 200
    got = {r.doc_id: (r.text, r.ts, r.shard, r.pos) for r in back.collect()}
    pq_rows = {
        r.doc_id: (r.text, r.ts, r.shard, r.pos)
        for r in spark.read.parquet(str(tmp_path / "pq")).collect()
    }
    assert got == pq_rows


def test_write_training_shards_rejects_unknown_format(spark, tmp_path):
    import pytest as _pytest

    from voter_gateway_spark.operators.layout import write_training_shards

    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with _pytest.raises(ValueError, match="format"):
        write_training_shards(df, "doc_id", str(tmp_path / "x"), file_format="csv")
