"""The dtype-defensive fixture boundary (VERDICT r2 items 1-3).

The r2 regression: the driver re-encoded events.ts from
TIMESTAMP(NANOS) to timestamp[us] and a hard-coded `ts div 1000`
broke 7 queries, 13 tests, and the bench. These tests pin the fix:
the SAME loader must accept every physical encoding of the fixture
and produce identical canonical values.
"""

import warnings

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from voter_gateway_spark.sources.fixtures import (
    DECLARED,
    events_stream_reader,
    load_events,
    load_table,
    normalize,
    tune_session,
)

US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_003_600_000_000]


def _write_events(path, ts_array):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([10, 10, 11], pa.int64()),
                "event_type": pa.array(["view", "click", "view"]),
                "value": pa.array([1.0, 2.0, 3.0]),
                "props": pa.array(["{}", "{}", "{}"]),
            }
        ),
        str(path),
    )


@pytest.fixture()
def encodings(tmp_path):
    """The same 3 events under 3 physical encodings of ts."""
    us_dir = tmp_path / "us"
    ns_dir = tmp_path / "ns"
    big_dir = tmp_path / "big"
    for d in (us_dir, ns_dir, big_dir):
        d.mkdir()
    _write_events(us_dir / "events.parquet", pa.array(US, pa.timestamp("us")))
    # TIMESTAMP(NANOS) parquet — the old fixture encoding; Spark reads
    # it as bigint nanos under nanosAsLong
    _write_events(
        ns_dir / "events.parquet",
        pa.array([u * 1000 for u in US], pa.timestamp("ns")),
    )
    # raw int64 epoch-nanos column
    _write_events(big_dir / "events.parquet", pa.array([u * 1000 for u in US], pa.int64()))
    return us_dir, ns_dir, big_dir


def _micros(spark, d):
    df = load_events(spark, str(d))
    assert dict(df.dtypes)["ts"] == "timestamp"
    return sorted(
        r.us for r in df.select(F.unix_micros("ts").alias("us")).collect()
    )


def test_load_events_all_encodings_agree(spark, encodings):
    us_dir, ns_dir, big_dir = encodings
    want = sorted(US)
    assert _micros(spark, us_dir) == want
    assert _micros(spark, ns_dir) == want
    assert _micros(spark, big_dir) == want


def test_stream_reader_all_encodings_agree(spark, encodings):
    for d in encodings:
        stream = events_stream_reader(spark, str(d), watermark="1 hour")
        assert stream.isStreaming
        assert dict(stream.dtypes)["ts"] == "timestamp"
        name = f"t_fix_{d.name}"
        q = (
            stream.select(F.unix_micros("ts").alias("us"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = sorted(r.us for r in spark.sql(f"SELECT us FROM {name}").collect())
        assert got == sorted(US), d.name


def test_real_fixture_loads_canonical(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    assert dict(ev.dtypes) == DECLARED["events"]
    assert ev.count() > 0


def test_all_tables_normalize_to_declared(spark, sf_dir):
    for name, decl in DECLARED.items():
        df = load_table(spark, sf_dir, name)
        got = dict(df.dtypes)
        for col, dtype in decl.items():
            assert got[col] == dtype, (name, col, got[col], dtype)


def test_missing_declared_column_raises(spark):
    df = spark.createDataFrame([(1,)], "event_id bigint")
    with pytest.raises(ValueError, match="missing declared columns"):
        normalize(df, "events")


def test_tune_session_warns_when_conf_rejected(spark, monkeypatch):
    """A locked conf must produce a visible warning, not silence
    (r2's silent except-pass hid the fixture change)."""
    from voter_gateway_spark.sources import fixtures as fx

    monkeypatch.setattr(fx, "_TUNED", set())  # defeat the per-session memo
    real_set = spark.conf.set

    def locked(k, v):
        if k == "spark.sql.session.timeZone":
            raise Exception("Cannot modify the value of a static config")
        return real_set(k, v)

    monkeypatch.setattr(spark.conf, "set", locked)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tune_session(spark)
    assert any(
        "spark.sql.session.timeZone" in str(w.message) for w in caught
    )


def test_tune_session_warns_when_value_did_not_take(spark, monkeypatch):
    from voter_gateway_spark.sources import fixtures as fx

    monkeypatch.setattr(fx, "_TUNED", set())
    monkeypatch.setattr(spark.conf, "set", lambda k, v: None)
    monkeypatch.setattr(spark.conf, "get", lambda k: "America/New_York")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tune_session(spark)
    assert any("wanted" in str(w.message) for w in caught)


def test_events_queries_correct_under_locked_conf(spark, sf_dir, monkeypatch):
    """Even when tune_session can't touch the session, the dtype branch
    alone must keep events queries running (UTC already set by
    build_spark in conftest; the point is no exception + same rows)."""
    from voter_gateway_spark import queries as Q

    baseline = Q.events_hourly(spark, sf_dir).count()

    def locked(k, v):
        raise Exception("locked")

    monkeypatch.setattr(spark.conf, "set", locked)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert Q.events_hourly(spark, sf_dir).count() == baseline


def test_stream_reader_on_empty_directory_uses_declared_schema(spark, tmp_path):
    """Start-stream-then-files-arrive: an empty landing dir must fall
    back to the canonical declared schema instead of throwing."""
    empty = tmp_path / "landing"
    empty.mkdir()
    stream = events_stream_reader(spark, str(empty), watermark="1 hour")
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
