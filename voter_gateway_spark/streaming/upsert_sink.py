"""Streaming upsert sink: run the engine's match/merge plans per
micro-batch via foreachBatch — the standard Structured Streaming
pattern for sinks whose semantics the built-in file sinks can't
express (MERGE/upsert).

This closes the loop between the reference's batch upsert (M1/M2,
import_job.rb) and a streaming ingest: each micro-batch becomes the
SOURCE side of a MatchPlan cascade + MergePlan against the persisted
target, and the merged result replaces the target via a
write-new-then-swap protocol with crash recovery and a batch-id
marker for replay idempotence.

Guarantees (stated precisely — no blanket "atomic"/"exactly-once"):

- The swap is two renames through the Hadoop FileSystem API (works on
  any supported scheme; on HDFS each rename is atomic, on object
  stores rename is a copy — use a real table format there, below). A
  crash BETWEEN the renames leaves the live path missing and the old
  version parked at `<target>__old`; `_recover` restores it at the
  next batch, so the window is self-healing, but a reader in that
  window can observe a missing path.
- Replays: foreachBatch re-runs a batch after failures. The written
  version embeds a `_vgs_batch_id` marker; a replayed batch whose id
  is <= the marker is SKIPPED, so accumulating merge expressions
  (`$T + $S`) are not double-applied even when the failure happened
  after the swap but before the checkpoint commit.

Scale posture: per-batch cost is one pk-keyed join of (batch ×
target) plus an O(target) rewrite. On a real lake the target should
be Delta/Iceberg and the batch body becomes a storage-layer MERGE
INTO (sources/merge_sink.py lowers MergePlan exactly that way) —
that removes both the rewrite amplification and the swap protocol.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from voter_gateway_spark.plans import MatchPlan, MergePlan

_MARKER = "_vgs_batch_id"


class SwapFailedError(IOError):
    """A filesystem rename/delete in the swap protocol returned false.

    Hadoop's FileSystem API reports most failures by RETURNING FALSE,
    not raising — an unchecked false on the promote rename would let
    _apply_batch return normally, the streaming checkpoint commit the
    batch, and the micro-batch's merge be silently lost (the live
    marker never advances, so _recover would restore OLD data). Raising
    instead fails the batch, Structured Streaming replays it from the
    checkpoint, and the marker check keeps the replay idempotent."""


def _must(ok: bool, action: str) -> None:
    if not ok:
        raise SwapFailedError(
            f"swap protocol: {action} returned false (Hadoop FileSystem "
            "reports failure via return value); failing the batch so "
            "Structured Streaming replays it"
        )


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _read_marker(
    spark: SparkSession, target_dir: str, name: str = _MARKER
) -> tuple[int, str | None]:
    """Returns (batch_id, query_id) from the live marker, (-1, None)
    when absent. Pre-query-id markers read as query_id None."""
    fs, _, jvm = _fs(spark, target_dir)
    mpath = jvm.org.apache.hadoop.fs.Path(f"{target_dir}/{name}")
    if not fs.exists(mpath):
        return -1, None
    stream = fs.open(mpath)
    try:
        data = bytearray()
        b = stream.read()
        while b != -1 and len(data) < 128:
            data.append(b)
            b = stream.read()
        doc = json.loads(bytes(data))
        return int(doc["batch_id"]), doc.get("query_id")
    finally:
        stream.close()


def _write_marker(
    spark: SparkSession,
    version_dir: str,
    batch_id: int,
    query_id: str | None,
    name: str = _MARKER,
) -> None:
    fs, _, jvm = _fs(spark, version_dir)
    mpath = jvm.org.apache.hadoop.fs.Path(f"{version_dir}/{name}")
    out = fs.create(mpath, True)
    out.write(
        bytearray(json.dumps({"batch_id": batch_id, "query_id": query_id}).encode())
    )
    out.close()


def _current_query_id(spark: SparkSession, query_name: str) -> str | None:
    """The PERSISTENT id (q.id) of the named active query: stable across
    restarts from the same checkpoint, fresh when the checkpoint is new
    or absent — exactly the scope in which foreachBatch epoch ids are
    monotonic. Inside foreachBatch the query handle isn't passed in, so
    resolve it from the active list by name."""
    for q in spark.streams.active:
        if q.name == query_name:
            return str(q.id)
    return None


def _recover(spark: SparkSession, target_dir: str) -> None:
    """Heal a crash between the two swap renames: live path missing,
    previous version parked at `<target>__old`."""
    fs, live, jvm = _fs(spark, target_dir)
    old = jvm.org.apache.hadoop.fs.Path(f"{target_dir}__old")
    if not fs.exists(live) and fs.exists(old):
        _must(fs.rename(old, live), f"recover rename {old} -> {live}")


def stream_upsert_parquet(
    stream: DataFrame,
    target_dir: str,
    pk: str,
    match_columns: list[list[str]],
    merge_plan: MergePlan | None = None,
    source_id: str | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "vgs_stream_upsert",
    honor_legacy_marker: bool = False,
    matcher=None,
):
    """Attach a foreachBatch upsert sink to a streaming DataFrame.

    Per micro-batch: cascade-match the batch against the current
    target (one rule per `match_columns` group, reference J2
    semantics), apply `merge_plan` (default: a plain upsert whose
    within-batch pick is FIRST-write-wins — MergePlan keeps the lowest
    `_source_id` per target, ascending arrival order under the default
    monotonic ids; route real CDC change streams through
    merging.apply_changes first when last-write must win), and swap
    the rewritten target (see module docstring for the exact
    crash/replay guarantees). Returns the writer; call .start().

    Replay-skip scope: the marker stores (batch_id, query_id) where
    query_id is the streaming query's PERSISTENT id — foreachBatch
    epoch ids are only monotonic within one checkpoint lineage, so a
    marker from a different query lineage (no checkpoint_dir, a
    deleted checkpoint, a new query on an existing target) must NOT
    suppress the new lineage's batches: comparing raw ids there would
    silently drop every batch up to the old high-water mark. Markers
    written by the pre-query-id format carry no lineage at all and are
    therefore IGNORED by default (the first processed batch upgrades
    them); set `honor_legacy_marker=True` only when resuming the same
    checkpoint lineage that wrote the legacy marker, trading the
    new-query drop hazard for replay idempotence across the upgrade.

    pk-less batches (the match_columns-only shape): unmatched rows
    insert with a NULL pk, and a NULL target pk can never be
    match-updated later — a recurring key re-inserts per batch. Supply
    insert_column_as(pk, ...) to synthesize keys when the stream
    lacks them and keys recur."""
    plan = merge_plan or MergePlan(target_pk=pk)
    # foreachBatch hands the callback a CLONED SparkSession whose
    # StreamingQueryManager lists no active queries, so resolving the
    # query id from batch.sparkSession always returns None (verified on
    # Spark 4.1: clone .streams.active == [], original session resolves)
    # — which would silently collapse the lineage-aware replay skip into
    # the legacy batch-id-only path forever. Capture the session that
    # owns the query at writer-construction time instead.
    owner_spark = stream.sparkSession

    def _apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        _recover(spark, target_dir)
        qid = _current_query_id(owner_spark, query_name)
        m_batch, m_qid = _read_marker(spark, target_dir)
        if m_qid is None:
            # legacy marker predating the query_id format (or no marker,
            # m_batch == -1). A legacy marker CANNOT prove lineage: a
            # NEW query over an old-format target restarts batch ids at
            # 0, so honoring it would silently drop every batch up to
            # the old high-water mark — and the skip path never rewrites
            # the marker, so the drops would persist. Default: do NOT
            # honor it (process the batch; the marker upgrades to the
            # query_id format on this batch's swap, closing the legacy
            # window for good). `honor_legacy_marker=True` restores
            # batch-id-only skipping for operators resuming the SAME
            # checkpoint lineage that wrote the old marker, where a
            # crash-replayed batch would otherwise re-merge and
            # duplicate rows in the pk-less/NULL-pk shape.
            if m_batch >= batch_id:
                if honor_legacy_marker:
                    return
                if m_batch >= 0:
                    print(
                        f"vgs stream_upsert: ignoring legacy marker "
                        f"(batch_id={m_batch}, no query_id) in {target_dir}; "
                        "processing batch and upgrading the marker. Pass "
                        "honor_legacy_marker=True if resuming the same "
                        "checkpoint lineage that wrote it."
                    )
        elif qid is None:
            # the marker names a query lineage but ours cannot be
            # resolved from spark.streams.active: comparing blind either
            # drops live batches (skip) or re-merges a replay (no skip).
            # Fail the batch loudly; Structured Streaming will retry and
            # the active-query list is populated on replay.
            raise SwapFailedError(
                f"replay-skip: marker in {target_dir} carries query_id "
                f"{m_qid!r} but query {query_name!r} is not in "
                "spark.streams.active — cannot decide idempotent skip; "
                "failing the batch instead of silently losing "
                "exactly-once"
            )
        elif m_qid == qid and m_batch >= batch_id:
            return  # replayed batch already applied — skip, don't re-merge
        if not batch.take(1):
            return
        target = spark.read.parquet(target_dir)
        if matcher is not None:
            # pluggable matching step: `matcher(batch, target)` returns
            # MatchPlan.matches()-shaped rows (source cols + _source_id/
            # _target_id/_match_rule) — e.g. plans.linkage.fs_matches
            # for probabilistic admission. match_columns is ignored.
            matches = matcher(batch, target)
        else:
            mp = MatchPlan(batch, target, target_pk=pk, source_id=source_id)
            for cols in match_columns:
                mp.find_exact_matches(cols)
            matches = mp.matches()
        merged = plan.execute(matches, target).target
        tmp = f"{target_dir}__v{batch_id}_{uuid.uuid4().hex[:6]}"
        merged.write.mode("overwrite").parquet(tmp)
        _write_marker(spark, tmp, batch_id, qid)
        fs, live, jvm = _fs(spark, target_dir)
        old = jvm.org.apache.hadoop.fs.Path(f"{target_dir}__old")
        # every rename/delete checked: an unchecked false on the promote
        # would commit the checkpoint with the merge lost (see SwapFailedError)
        if fs.exists(old):
            _must(fs.delete(old, True), f"pre-swap delete {old}")
        _must(fs.rename(live, old), f"park rename {live} -> {old}")
        _must(
            fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), live),
            f"promote rename {tmp} -> {live}",
        )
        if fs.exists(old):
            _must(fs.delete(old, True), f"post-swap delete {old}")
        # a crashed earlier attempt leaves its unpromoted version dir
        # behind; sweep stale __v* siblings after each successful swap
        stale = fs.globStatus(jvm.org.apache.hadoop.fs.Path(f"{target_dir}__v*"))
        for st in list(stale) if stale is not None else []:
            _must(fs.delete(st.getPath(), True), f"stale version delete {st.getPath()}")

    writer = (
        stream.writeStream.foreachBatch(_apply_batch)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def bootstrap_target(
    spark: SparkSession, target_dir: str, initial: DataFrame
) -> None:
    """Materialize the initial target table for a streaming upsert."""
    initial.write.mode("overwrite").parquet(target_dir)


def stream_upsert_delta(
    stream: DataFrame,
    target_path: str,
    pk: str,
    match_columns: list[list[str]],
    merge_plan: MergePlan | None = None,
    source_id: str | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "vgs_stream_upsert_delta",
    matcher=None,
):
    """Delta MERGE fast path for the streaming upsert (r14 VERDICT ask
    #5): the SAME per-batch body as stream_upsert_parquet — match the
    micro-batch against the live target, apply the MergePlan — but the
    apply step is a storage-layer MERGE INTO via
    sources/merge_sink.merge_into_delta, so each batch rewrites only
    the files containing matched rows instead of the whole registry
    (the swap sink's documented O(registry)-per-batch bound, the local
    throughput ceiling behind the 276 rows/s FS admission row).

    Exactly-once: Delta MERGE is transactional, and the batch sets the
    Delta idempotent-writer identity (txnAppId = query_name,
    txnVersion = batch_id) for its duration, so a foreachBatch replay
    of an already-committed batch is a no-op at the storage layer — no
    swap protocol, no marker file, no __old parking.

    Gated on the optional delta-spark package (merge_sink.delta_available);
    raises at CONSTRUCTION time, not first-batch time, when absent.
    Parity with the swap sink is pinned by the (gated)
    test_stream_upsert_delta_parity_with_swap_sink."""
    from voter_gateway_spark.sources.merge_sink import (
        delta_available,
        merge_into_delta,
    )

    if not delta_available():
        raise RuntimeError(
            "stream_upsert_delta needs the delta-spark package; use "
            "stream_upsert_parquet (write-new-then-swap) without it"
        )
    plan = merge_plan or MergePlan(target_pk=pk)

    def _apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if not batch.take(1):
            return
        from delta.tables import DeltaTable

        target = DeltaTable.forPath(spark, target_path).toDF()
        if matcher is not None:
            matches = matcher(batch, target)
        else:
            mp = MatchPlan(batch, target, target_pk=pk, source_id=source_id)
            for cols in match_columns:
                mp.find_exact_matches(cols)
            matches = mp.matches()
        # Delta idempotent-writer identity: a replayed (query, batch)
        # pair commits nothing the second time
        spark.conf.set("spark.databricks.delta.write.txnAppId", query_name)
        spark.conf.set("spark.databricks.delta.write.txnVersion", str(batch_id))
        try:
            merge_into_delta(spark, target_path, matches, plan)
        finally:
            spark.conf.unset("spark.databricks.delta.write.txnAppId")
            spark.conf.unset("spark.databricks.delta.write.txnVersion")

    writer = (
        stream.writeStream.foreachBatch(_apply_batch)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
