"""apply_changes (CDC fold) and the value-cap admission controller
(batch + streaming parity, cross-batch state retention)."""

import datetime
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.plans.merging import apply_changes
from voter_gateway_spark.sources.fixtures import load_events
from voter_gateway_spark.streaming.events import (
    stream_value_cap_admissions,
    value_cap_admissions,
)


def _target(spark):
    return spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")],
        "id int, v string",
    )


def test_apply_changes_upsert_delete_lastwins(spark):
    changes = spark.createDataFrame(
        [
            Row(id=1, v="a2", op="U", seq=1),   # update
            Row(id=2, v=None, op="D", seq=1),   # delete
            Row(id=3, v="x", op="U", seq=1),    # superseded...
            Row(id=3, v=None, op="D", seq=2),   # ...by delete (last wins)
            Row(id=4, v="d", op="U", seq=1),    # insert
            Row(id=5, v="e1", op="U", seq=1),   # insert, superseded
            Row(id=5, v="e2", op="U", seq=2),   # last wins
        ],
        "id int, v string, op string, seq int",
    )
    out = {r.id: r.v for r in apply_changes(_target(spark), changes, "id", "seq").collect()}
    assert out == {1: "a2", 4: "d", 5: "e2"}


def test_apply_changes_no_changes_passthrough(spark):
    changes = spark.createDataFrame([], "id int, v string, op string, seq int")
    out = {r.id: r.v for r in apply_changes(_target(spark), changes, "id", "seq").collect()}
    assert out == {1: "a", 2: "b", 3: "c"}


def test_apply_changes_delete_unknown_key_noop(spark):
    changes = spark.createDataFrame(
        [Row(id=99, v=None, op="D", seq=1)], "id int, v string, op string, seq int"
    )
    assert apply_changes(_target(spark), changes, "id", "seq").count() == 3


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=e,
                ts=datetime.datetime.fromisoformat(ts),
                user_id=u,
                event_type="view",
                value=float(v),
                props="{}",
            )
            for e, u, ts, v in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )


def test_value_cap_admits_in_ts_order_until_cap(spark):
    ev = _ev(spark, [
        (1, 1, "2024-01-01T10:00", 40),
        (2, 1, "2024-01-01T11:00", 40),   # total before = 40 < 100 → admit
        (3, 1, "2024-01-01T12:00", 40),   # total before = 80 < 100 → admit
        (4, 1, "2024-01-01T13:00", 1),    # total before = 120 → reject
        (5, 2, "2024-01-01T10:00", 500),  # first event always admits
    ])
    got = {r.event_id: r.running_total for r in value_cap_admissions(ev, 100.0).collect()}
    assert got == {1: 40.0, 2: 80.0, 3: 120.0, 5: 500.0}


def test_stream_value_cap_matches_batch(spark, sf_dir, tmp_path):
    exp = {
        (r.user_id, r.event_id): round(r.running_total, 6)
        for r in value_cap_admissions(load_events(spark, sf_dir), 50.0).collect()
    }
    stream_dir = tmp_path / "vcap_ev"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "events.parquet")
    q = (
        stream_value_cap_admissions(spark, str(stream_dir), 50.0)
        .writeStream.format("memory")
        .queryName("t_vcap")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {
        (r.user_id, r.event_id): round(r.running_total, 6)
        for r in spark.sql("SELECT * FROM t_vcap").collect()
    }
    assert got == exp and len(got) > 0


def test_stream_value_cap_state_survives_batches(spark, tmp_path):
    """Two availableNow runs over a growing directory: the second run
    resumes from the checkpointed per-user totals, so an over-budget
    user admits nothing in batch 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    stream_dir = tmp_path / "ev2"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "ckpt2")

    def write(name, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [datetime.datetime.fromisoformat(r[2]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                    "event_type": pa.array(["view"] * len(rows)),
                    "value": pa.array([float(r[3]) for r in rows]),
                    "props": pa.array(["{}"] * len(rows)),
                }
            ),
            str(stream_dir / name),
        )

    out_dir = str(tmp_path / "vcap_out")

    def run():
        # file sink: the memory sink can't recover from a checkpoint,
        # and checkpoint recovery is the whole point of this test
        q = (
            stream_value_cap_admissions(spark, str(stream_dir), 100.0)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    write("b1.parquet", [(1, 1, "2024-01-01T10:00", 90)])
    run()
    # user 1 is at 90 < 100; a 50-value event admits (total → 140),
    # then nothing more
    write("b2.parquet", [(2, 1, "2024-01-02T10:00", 50), (3, 1, "2024-01-02T11:00", 1)])
    run()
    got = {
        r.event_id: r.running_total
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: 90.0, 2: 140.0}
