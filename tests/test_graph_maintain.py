"""Streaming kNN-graph maintenance: persisted-state folds must equal
the sequential batch increments, and replays must be no-ops."""

import json
import os

from pyspark.sql import functions as F

from voter_gateway_spark.operators import similarity
from voter_gateway_spark.session import ckpt
from voter_gateway_spark.streaming.graph_maintain import (
    bootstrap_graph,
    fold_batch,
    stream_graph_maintain,
)


def _rows(df):
    return {(r.vec_id, r.neighbor_id, r.rank, r.cos_sim) for r in df.collect()}


def test_stream_folds_match_sequential_batch_increments(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 3)
    b1 = emb.where((F.col("vec_id") % 10 == 3) & (F.col("vec_id") % 20 == 3))
    b2 = emb.where((F.col("vec_id") % 10 == 3) & (F.col("vec_id") % 20 != 3))
    gdir, cdir = str(tmp_path / "graph"), str(tmp_path / "corpus")

    bootstrap_graph(corpus, gdir, cdir, rounds=2)
    boot = spark.read.parquet(gdir)
    assert _rows(boot) == _rows(similarity.knn_graph(corpus, rounds=2))

    # stream the two batches as two files, one per micro-batch
    src = tmp_path / "arrivals"
    src.mkdir()
    for i, (name, b) in enumerate((("b1.jsonl", b1), ("b2.jsonl", b2))):
        path = src / name
        path.write_text(
            "\n".join(
                json.dumps({"vec_id": r.vec_id, "embedding": list(r.embedding)})
                for r in b.collect()
            )
            + "\n"
        )
        # FileStreamSource orders by MODIFICATION TIME, not name; two
        # files written within the same mtime granularity could process
        # in either order, flipping the fold order vs the sequential
        # expectation below (r13 ADVICE). Pin distinct, increasing mtimes.
        os.utime(path, (1_000_000_000 + i, 1_000_000_000 + i))
    stream = spark.readStream.schema(
        "vec_id bigint, embedding array<float>"
    ).option("maxFilesPerTrigger", 1).json(str(src))
    q = (
        stream_graph_maintain(
            stream, gdir, cdir, str(tmp_path / "ckpt"), rounds=1
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    # sequential-batch expectation: fold b1 then b2 with the operator
    # (source orders files by mtime — pinned above to b1 -> b2)
    g1 = ckpt(similarity.knn_graph_increment(
        corpus, b1, similarity.knn_graph(corpus, rounds=2), rounds=1
    ))
    state1 = corpus.unionByName(b1)
    g2 = similarity.knn_graph_increment(state1, b2, g1, rounds=1)
    assert _rows(spark.read.parquet(gdir)) == _rows(g2)
    # corpus table carries every arrival exactly once
    got_ids = sorted(r.vec_id for r in spark.read.parquet(cdir).collect())
    want_ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    assert got_ids == want_ids


def test_fold_replay_is_noop(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 3)
    batch = emb.where(F.col("vec_id") % 10 == 3)
    gdir, cdir = str(tmp_path / "graph"), str(tmp_path / "corpus")
    bootstrap_graph(corpus, gdir, cdir, rounds=2)
    n = fold_batch(spark, batch, gdir, cdir, rounds=1)
    assert n == batch.count()
    after_first = _rows(spark.read.parquet(gdir))
    n2 = fold_batch(spark, batch, gdir, cdir, rounds=1)
    assert n2 == 0
    assert _rows(spark.read.parquet(gdir)) == after_first
