"""Streaming kNN-graph maintenance — continuous embedding ingestion
keeping a persisted k-nearest-neighbor graph current.

The batch operator is `similarity.knn_graph_increment`; this module is
its Structured Streaming harness, the vector-side sibling of
`streaming/index_dedup.py`: vectors arrive as a stream, each
micro-batch folds into the PERSISTED graph via foreachBatch (the
built-in sinks can't express "update state I also read"), and the
corpus table of vectors grows alongside so later batches fold against
old + new alike.

State layout (two parquet directories, caller-owned):

- ``corpus_dir`` — (id, vector) rows of every folded vector; the
  pinned coarse quantizer retrains deterministically from this table
  on each fold (same md5-smallest seeds → identical centroids, so no
  centroid state file is needed).
- ``graph_dir`` — the current (id, neighbor_id, rank, cos_sim) edge
  table; wholly rewritten per fold (only touched nodes change, but
  edge rows are ~32 bytes — the rewrite is corpus-linear and cheap
  next to the fold's scoring; partition the dir by a bucket of id and
  rewrite only touched buckets when the graph itself becomes the
  dominant I/O).

Replay semantics (deliberately simpler than index_dedup's move
manifests): the fold re-checks arrivals against the corpus table with
an anti-join, so a REPLAYED batch whose corpus append committed is a
no-op, and a replay after "graph written, corpus append lost" re-folds
the batch against the already-updated graph — `knn_graph_increment` is
closed over that (the batch's edges union in, distinct-dedup exactly,
and the extra touched-set round can only refine ranks); every replay
outcome is a valid kNN graph over exactly the arrived vectors. Streams
needing byte-identical replay graphs should adopt index_dedup's
manifest commit protocol; the graph's contract (approximate,
invariant-tested) doesn't require it.

Reference parity: beyond-reference extension (the reference has no
vector or streaming surface); completes the streaming story for the
ANN family.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from voter_gateway_spark.operators import similarity
from voter_gateway_spark.session import ckpt_cut
from voter_gateway_spark.streaming.upsert_sink import _fs, _must, _recover


_DEFAULTS = dict(k=4, n_centroids=None, probe_cells=2, iters=0)


def bootstrap_graph(
    corpus: DataFrame,
    graph_dir: str,
    corpus_dir: str,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **knn_params,
) -> None:
    """Materialize the initial state: the corpus vector table and its
    full NN-descent graph. Run once; folds take over from here."""
    params = {**_DEFAULTS, **knn_params}
    corpus.select(id_col, vec_col).write.mode("overwrite").parquet(corpus_dir)
    persisted = corpus.sparkSession.read.parquet(corpus_dir)
    graph = similarity.knn_graph(
        persisted, rounds=rounds, id_col=id_col, vec_col=vec_col, **params
    )
    graph.write.mode("overwrite").parquet(graph_dir)


def fold_batch(
    spark: SparkSession,
    batch: DataFrame,
    graph_dir: str,
    corpus_dir: str,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **knn_params,
) -> int:
    """Fold one batch of vectors into the persisted graph; returns the
    number of genuinely-new vectors folded (0 = replay/no-op).

    Order of effects: graph swap, then corpus append — chosen so a
    crash between them loses no arrival (the replay re-folds; see
    module docstring for why that is closed).

    The graph write itself is the upsert_sink swap protocol, not an
    in-place overwrite (r13 ADVICE): `mode("overwrite")` deletes the
    old files before the new commit, so a crash mid-write would leave
    empty/partial state for the next fold to read. Instead the updated
    graph lands in a `__v*` staging dir, then two checked renames swap
    it live (park live -> __old, promote staging -> live); `_recover`
    at fold start heals the one between-renames window by restoring
    the parked previous generation."""
    params = {**_DEFAULTS, **knn_params}
    _recover(spark, graph_dir)
    corpus = spark.read.parquet(corpus_dir)
    new_rows = (
        batch.select(id_col, vec_col)
        .dropDuplicates([id_col])
        .join(corpus.select(id_col), id_col, "left_anti")
    )
    # one pass decides emptiness AND frees the arrivals from the
    # streaming source plan (foreachBatch frames can't be revisited
    # after the epoch ends)
    new_rows = ckpt_cut(new_rows)
    n_new = new_rows.count()
    if n_new == 0:
        return 0
    existing = spark.read.parquet(graph_dir)
    updated = similarity.knn_graph_increment(
        corpus,
        new_rows,
        existing,
        rounds=rounds,
        id_col=id_col,
        vec_col=vec_col,
        **params,
    )
    # materialize BEFORE swapping graph_dir — the update plan reads
    # the very files the park rename moves away
    updated = ckpt_cut(updated)
    tmp = f"{graph_dir}__v{uuid.uuid4().hex[:8]}"
    updated.write.mode("overwrite").parquet(tmp)
    fs, live, jvm = _fs(spark, graph_dir)
    old = jvm.org.apache.hadoop.fs.Path(f"{graph_dir}__old")
    if fs.exists(old):
        _must(fs.delete(old, True), f"pre-swap delete {old}")
    _must(fs.rename(live, old), f"park rename {live} -> {old}")
    _must(
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), live),
        f"promote rename {tmp} -> {live}",
    )
    if fs.exists(old):
        _must(fs.delete(old, True), f"post-swap delete {old}")
    # a crashed earlier attempt leaves its unpromoted staging dir
    # behind; sweep stale __v* siblings after each successful swap
    stale = fs.globStatus(jvm.org.apache.hadoop.fs.Path(f"{graph_dir}__v*"))
    for st in list(stale) if stale is not None else []:
        _must(fs.delete(st.getPath(), True), f"stale staging delete {st.getPath()}")
    new_rows.write.mode("append").parquet(corpus_dir)
    return n_new


def stream_graph_maintain(
    vec_stream: DataFrame,
    graph_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **knn_params,
):
    """writeStream writer folding each micro-batch into the persisted
    graph. Caller picks the trigger and calls .start()."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        fold_batch(
            batch.sparkSession,
            batch,
            graph_dir,
            corpus_dir,
            rounds=rounds,
            id_col=id_col,
            vec_col=vec_col,
            **knn_params,
        )

    return (
        vec_stream.writeStream.foreachBatch(_body)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
