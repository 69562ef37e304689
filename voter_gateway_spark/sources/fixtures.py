"""Dtype-defensive fixture loaders: one normalization site for every table.

Round-2 lesson: the driver regenerated ``events.parquet`` from
TIMESTAMP(NANOS) to plain ``timestamp[us]`` and a hard-coded
``ts div 1000`` conversion poisoned every events-shaped query. The
reference's equivalent boundary is declared-schema-driven and tolerant
per column (converters cast each staging column to its declared type —
reference: lib/voter_file/csv_driver/working_table.rb:142 ``$S::TYPE``
casts), so a physical-encoding change in the source can never zero out
an operator family. This module is that boundary for Spark: every
fixture table has a DECLARED schema, and ``load_table`` casts each
column to its declared type *only when the physical dtype differs*.

Supported physical encodings per declared-timestamp column:
  * ``timestamp`` / ``timestamp_ntz`` (parquet timestamp[us], either
    isAdjustedToUTC flavor) — cast to session-tz timestamp; under the
    UTC session timezone this is an exact micros-preserving relabel.
  * ``bigint`` — epoch *nanoseconds* (the old TIMESTAMP(NANOS) fixture
    read under ``spark.sql.legacy.parquet.nanosAsLong``); converted
    with exact integer ``div 1000`` (ns epochs exceed double's 53-bit
    mantissa, so never float-divide) to match DuckDB's epoch_us.
  * ``date`` / ``string`` — plain cast.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Declared logical schemas (column -> canonical Spark dtype). Queries are
# written against these; the physical parquet encoding may drift.
DECLARED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


def _normalize_col(name: str, actual: str, declared: str):
    """Column expression casting `actual` dtype to `declared`, or None
    if already canonical. Bigint->timestamp means epoch-nanos (exact
    integer floor-div to µs, DuckDB epoch_us semantics)."""
    if actual == declared:
        return None
    if declared == "timestamp":
        if actual == "bigint":
            return F.timestamp_micros(F.expr(f"`{name}` div 1000"))
        # timestamp_ntz / date / string: micros-preserving under UTC tz
        return F.col(name).cast("timestamp")
    return F.col(name).cast(declared)


def normalize(df: DataFrame, table: str) -> DataFrame:
    """Cast-if-needed every declared column to its canonical dtype.
    Undeclared extra columns pass through untouched; a *missing*
    declared column raises immediately (a silent None column would
    just move the breakage downstream)."""
    declared = DECLARED.get(table)
    if not declared:
        return df
    actual = dict(df.dtypes)
    missing = [c for c in declared if c not in actual]
    if missing:
        raise ValueError(
            f"fixture table {table!r} is missing declared columns {missing}; "
            f"physical columns: {sorted(actual)}"
        )
    exprs = []
    changed = False
    for c in df.columns:
        e = _normalize_col(c, actual[c], declared[c]) if c in declared else None
        if e is None:
            exprs.append(F.col(c))
        else:
            exprs.append(e.alias(c))
            changed = True
    return df.select(*exprs) if changed else df


# WeakSet, not id()s: a stopped session's recycled address must not
# make a NEW session skip tuning (the silent-divergence mode this
# module exists to prevent)
import weakref  # noqa: E402

_TUNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def tune_session(spark: SparkSession) -> None:
    """Make a caller-provided SparkSession safe for the query catalog.

    UTC keeps window/epoch math aligned with the DuckDB oracle;
    nanosAsLong lets a TIMESTAMP(NANOS)-encoded fixture load at all
    (harmless for µs fixtures). Fails LOUD: if the session rejects a
    conf (locked conf in some deployments) or the value didn't take,
    emit one warning instead of silently proceeding — silent-swallow is
    exactly what let the r2 fixture change go unnoticed.

    Memoized per live session object (WeakSet): every load_table call
    routes here, and four py4j conf round-trips per table read add up
    across a 90-query catalog run."""
    try:
        if spark in _TUNED:
            return
    except TypeError:
        pass  # un-weakref-able session stub (tests) — tune every time
    wanted = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    for k, v in wanted.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # locked conf
            warnings.warn(
                f"could not set {k}={v} ({exc}); query results may "
                "diverge from the DuckDB oracle", RuntimeWarning,
            )
            continue
        got = None
        try:
            got = spark.conf.get(k)
        except Exception:
            pass
        if got != v:
            warnings.warn(
                f"session conf {k} is {got!r}, wanted {v!r}; query "
                "results may diverge from the DuckDB oracle", RuntimeWarning,
            )
    try:
        _TUNED.add(spark)
    except TypeError:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table and normalize it to its declared schema."""
    tune_session(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize(raw, name)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to a microsecond timestamp — THE single
    events-normalization site shared by queries, streaming readers, and
    tests (VERDICT r2 item 2)."""
    return load_table(spark, sf_dir, "events")


def events_stream_reader(
    spark: SparkSession,
    parquet_dir: str,
    watermark: str | None = None,
    **reader_options,
) -> DataFrame:
    """Streaming read of an events directory with the same dtype
    normalization as the batch loader. The file source requires an
    explicit schema, so sniff the *physical* schema with a batch read
    (metadata-only) and normalize after. An EMPTY landing directory
    (the normal start-stream-then-files-arrive deployment) has nothing
    to sniff — fall back to the canonical declared schema, which is
    what files written by this engine (and the µs fixtures) carry."""
    tune_session(spark)
    try:
        physical = spark.read.parquet(parquet_dir).schema
    except Exception:
        decl = DECLARED["events"]
        physical = ", ".join(f"`{c}` {t}" for c, t in decl.items())
    reader = spark.readStream.schema(physical)
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    stream = reader.parquet(parquet_dir)
    stream = normalize(stream, "events")
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    return stream


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables, normalized."""
    return {n: load_table(spark, sf_dir, n) for n in TABLES}
