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


class _SwapFaultFS:
    """Proxy over the Hadoop FileSystem that faults the FIRST rename
    whose destination is the live target path (i.e. the promote in the
    first batch attempt — the park rename targets `__old` and passes).
    mode='raise' simulates a kill between the two swap renames;
    mode='false' simulates Hadoop's report-failure-by-returning-false."""

    def __init__(self, fs, live_path, mode, state):
        self._fs, self._live, self._mode, self._state = fs, live_path, mode, state

    def rename(self, src, dst):
        if str(dst) == self._live and self._state["hits"] == 0:
            self._state["hits"] += 1
            if self._mode == "raise":
                raise RuntimeError("injected crash between swap renames")
            return False
        return self._fs.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._fs, name)


def _fault_injected_fs(target_dir, mode, state):
    from voter_gateway_spark.streaming import upsert_sink

    real = upsert_sink._fs.__wrapped__ if hasattr(upsert_sink._fs, "__wrapped__") else upsert_sink._fs

    def wrapped(spark, path):
        fs, hpath, jvm = real(spark, path)
        return _SwapFaultFS(fs, target_dir, mode, state), hpath, jvm

    return wrapped


def _crash_recovery_scenario(spark, tmp_path, monkeypatch, mode, name):
    """Kill/fail the promote rename mid-swap, then restart from the
    same checkpoint: _recover must heal the parked version, the marker
    check must let the replay re-merge exactly once (no double-apply of
    the accumulating $T + $S expression), and no temp dirs survive."""
    from voter_gateway_spark.streaming import upsert_sink

    target_dir = str(tmp_path / f"tgt_{name}")
    bootstrap_target(
        spark,
        target_dir,
        spark.createDataFrame([Row(id=1, k="K1", v=1)], "id int, k string, v int"),
    )
    src_dir = tmp_path / f"src_{name}"
    src_dir.mkdir()
    _write_jsonl(src_dir / "b1.jsonl", [{"k": "K1", "v": 10}])
    plan = MergePlan(target_pk="id").merge_column_as("v", "$T + $S")
    state = {"hits": 0}
    monkeypatch.setattr(
        upsert_sink, "_fs", _fault_injected_fs(target_dir, mode, state)
    )

    def attempt():
        stream = spark.readStream.schema("k string, v int").json(str(src_dir))
        writer = stream_upsert_parquet(
            stream, target_dir, pk="id", match_columns=[["k"]], merge_plan=plan
        )
        q = writer.trigger(availableNow=True).option(
            "checkpointLocation", str(tmp_path / f"ckpt_{name}")
        ).start()
        try:
            q.awaitTermination(180)
        except Exception:
            pass  # failed query: surface it via q.exception() below
        finally:
            q.stop()
        return q.exception()

    exc = attempt()
    assert exc is not None, "first attempt must fail (injected swap fault)"
    if mode == "false":
        assert "SwapFailedError" in str(exc) or "returned false" in str(exc)
    assert state["hits"] == 1
    # crash window: live path gone, previous version parked at __old
    import os
    assert not os.path.exists(target_dir)
    assert os.path.exists(f"{target_dir}__old")

    # restart from the SAME checkpoint → batch 0 replays: _recover heals,
    # marker (absent/stale) admits the merge, swap completes
    exc2 = attempt()
    assert exc2 is None, f"replay must succeed, got {exc2}"
    got = {
        r.id: r.v
        for r in spark.read.parquet(target_dir).where("id IS NOT NULL").collect()
    }
    assert got[1] == 11, f"merge must apply exactly once, got {got[1]}"
    leftovers = glob.glob(f"{target_dir}__*")
    assert leftovers == [], leftovers


def test_crash_between_swap_renames_heals_on_replay(spark, tmp_path, monkeypatch):
    _crash_recovery_scenario(spark, tmp_path, monkeypatch, "raise", "crash")


def test_false_returning_promote_fails_batch_then_heals(spark, tmp_path, monkeypatch):
    # Hadoop rename reports failure by returning false: the sink must
    # raise (not commit the checkpoint with the merge lost) and recover
    _crash_recovery_scenario(spark, tmp_path, monkeypatch, "false", "false")


def test_legacy_marker_skips_only_when_honored(spark, tmp_path):
    """A marker written before the query_id format (batch_id only)
    suppresses a replayed batch ONLY under honor_legacy_marker=True —
    the opt-in for operators resuming the same checkpoint lineage."""
    import pathlib

    target_dir = str(tmp_path / "tgt_legacy")
    bootstrap_target(
        spark,
        target_dir,
        spark.createDataFrame([Row(id=1, k="K1", v=10)], "id int, k string, v int"),
    )
    # legacy marker: batch high-water mark 5, no query_id
    pathlib.Path(target_dir, "_vgs_batch_id").write_text(json.dumps({"batch_id": 5}))
    src_dir = tmp_path / "src_legacy"
    src_dir.mkdir()
    _write_jsonl(src_dir / "b1.jsonl", [{"id": 100, "k": "K1", "v": 5}])
    stream = spark.readStream.schema("id int, k string, v int").json(str(src_dir))
    plan = MergePlan(target_pk="id").merge_column_as("v", "$T + $S")
    writer = stream_upsert_parquet(
        stream, target_dir, pk="id", match_columns=[["k"]], merge_plan=plan,
        honor_legacy_marker=True,
    )
    _run(writer, tmp_path, "legacy")
    rows = {r.id: r.v for r in spark.read.parquet(target_dir).collect()}
    assert rows == {1: 10}  # batch 0 <= marker 5 → replay-skipped


def test_legacy_marker_ignored_by_default_and_upgraded(spark, tmp_path):
    """Default: a legacy marker must NOT suppress a NEW query's batches
    (fresh checkpoints restart batch ids at 0 — honoring the old
    high-water mark would drop them all), and the first processed
    batch upgrades the marker to the query_id format."""
    import pathlib

    from voter_gateway_spark.streaming.upsert_sink import _read_marker

    target_dir = str(tmp_path / "tgt_legacy_dflt")
    bootstrap_target(
        spark,
        target_dir,
        spark.createDataFrame([Row(id=1, k="K1", v=10)], "id int, k string, v int"),
    )
    pathlib.Path(target_dir, "_vgs_batch_id").write_text(json.dumps({"batch_id": 5}))
    src_dir = tmp_path / "src_legacy_dflt"
    src_dir.mkdir()
    _write_jsonl(src_dir / "b1.jsonl", [{"id": 100, "k": "K1", "v": 5}])
    stream = spark.readStream.schema("id int, k string, v int").json(str(src_dir))
    plan = MergePlan(target_pk="id").merge_column_as("v", "$T + $S")
    writer = stream_upsert_parquet(
        stream, target_dir, pk="id", match_columns=[["k"]], merge_plan=plan,
    )
    _run(writer, tmp_path, "legacy_dflt")
    rows = {r.id: r.v for r in spark.read.parquet(target_dir).collect()}
    assert rows == {1: 15}  # batch processed: 10 + 5 merged
    m_batch, m_qid = _read_marker(spark, target_dir)
    assert m_batch == 0 and m_qid is not None  # marker upgraded


def test_unresolvable_query_id_fails_batch_loudly(spark, tmp_path, monkeypatch):
    """When the marker names a query lineage but the running query can't
    be resolved from spark.streams.active, the sink must fail the batch
    (replay-safe) instead of silently losing exactly-once."""
    import pathlib

    import pytest as _pytest

    import voter_gateway_spark.streaming.upsert_sink as us

    target_dir = str(tmp_path / "tgt_noqid")
    bootstrap_target(
        spark,
        target_dir,
        spark.createDataFrame([Row(id=1, k="K1", v=10)], "id int, k string, v int"),
    )
    pathlib.Path(target_dir, "_vgs_batch_id").write_text(
        json.dumps({"batch_id": 0, "query_id": "some-old-lineage"})
    )
    monkeypatch.setattr(us, "_current_query_id", lambda s, n: None)
    src_dir = tmp_path / "src_noqid"
    src_dir.mkdir()
    _write_jsonl(src_dir / "b1.jsonl", [{"id": 100, "k": "K1", "v": 5}])
    stream = spark.readStream.schema("id int, k string, v int").json(str(src_dir))
    writer = stream_upsert_parquet(
        stream, target_dir, pk="id", match_columns=[["k"]],
    )
    from pyspark.errors import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="cannot decide idempotent skip"):
        _run(writer, tmp_path, "noqid")
    # target untouched — the failed batch committed nothing
    rows = {r.id: r.v for r in spark.read.parquet(target_dir).collect()}
    assert rows == {1: 10}


def test_stream_upsert_delta_gate_raises_without_delta(spark, tmp_path):
    """The MERGE fast path must fail at CONSTRUCTION (not first batch)
    when delta-spark is absent, naming the swap-sink fallback."""
    import pytest as _pytest

    from voter_gateway_spark.sources.merge_sink import delta_available
    from voter_gateway_spark.streaming.upsert_sink import stream_upsert_delta

    if delta_available():
        _pytest.skip("delta installed — gate is open; parity test covers it")
    src_dir = tmp_path / "src_dg"
    src_dir.mkdir()
    _write_jsonl(src_dir / "b1.jsonl", [{"id": 1, "k": "K1", "v": 1}])
    stream = spark.readStream.schema("id int, k string, v int").json(str(src_dir))
    with _pytest.raises(RuntimeError, match="stream_upsert_parquet"):
        stream_upsert_delta(stream, str(tmp_path / "tgt_dg"), pk="id", match_columns=[["k"]])


def test_stream_upsert_delta_parity_with_swap_sink(spark, tmp_path):
    """GATED parity (r14 VERDICT ask #5): the Delta MERGE sink and the
    parquet swap sink must land the identical registry from the same
    batch sequence — same matches, same MergePlan routing, different
    storage mechanics only. Runs only where delta-spark is installed."""
    import pytest as _pytest

    from voter_gateway_spark.sources.merge_sink import delta_available

    if not delta_available():
        _pytest.skip("delta-spark not installed (gated fast path)")
    from voter_gateway_spark.streaming.upsert_sink import stream_upsert_delta

    initial = spark.createDataFrame(
        [Row(id=1, k="K1", v=10), Row(id=2, k="K2", v=20)],
        "id int, k string, v int",
    )
    plan = MergePlan(target_pk="id").merge_column_as("v", "$T + $S")
    batches = [
        [{"id": 100, "k": "K1", "v": 5}, {"id": 101, "k": "KX", "v": 7}],
        [{"id": 102, "k": "K2", "v": 3}, {"id": 103, "k": "K1", "v": 2}],
    ]
    # swap sink
    swap_dir = str(tmp_path / "tgt_swap")
    bootstrap_target(spark, swap_dir, initial)
    src_a = tmp_path / "src_swap"
    src_a.mkdir()
    for i, rows in enumerate(batches):
        _write_jsonl(src_a / f"b{i}.jsonl", rows)
    writer = stream_upsert_parquet(
        spark.readStream.schema("id int, k string, v int")
        .option("maxFilesPerTrigger", 1).json(str(src_a)),
        swap_dir, pk="id", match_columns=[["k"]], merge_plan=plan,
    )
    _run(writer, tmp_path, "par_swap")
    # delta MERGE sink
    delta_dir = str(tmp_path / "tgt_delta")
    initial.write.format("delta").save(delta_dir)
    src_b = tmp_path / "src_delta"
    src_b.mkdir()
    for i, rows in enumerate(batches):
        _write_jsonl(src_b / f"b{i}.jsonl", rows)
    writer_d = stream_upsert_delta(
        spark.readStream.schema("id int, k string, v int")
        .option("maxFilesPerTrigger", 1).json(str(src_b)),
        delta_dir, pk="id", match_columns=[["k"]], merge_plan=plan,
    )
    _run(writer_d, tmp_path, "par_delta")

    def norm(df):
        return sorted(
            (r.id, r.k, r.v) for r in df.select("id", "k", "v").collect()
        )

    assert norm(spark.read.parquet(swap_dir)) == norm(
        spark.read.format("delta").load(delta_dir)
    )
