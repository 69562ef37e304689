"""Streaming semantic admission: stream folds must equal sequential
batch admissions, replays must be no-ops, and the admit/reject
decision must match a brute-force cosine check."""

import json
import os

from pyspark.sql import functions as F

from voter_gateway_spark.operators import similarity
from voter_gateway_spark.streaming.vector_admission import (
    admit_vector_batch,
    bootstrap_vector_index,
    stream_vector_admission,
)


def _ids(spark, idx_dir):
    return sorted(
        r.vec_id
        for r in spark.read.parquet(f"{idx_dir}/vectors").select("vec_id").collect()
    )


def test_admission_matches_brute_force_decision(spark, tmp_path):
    # corpus: 3 well-separated one-hot clusters; batch: one near-dup of
    # corpus vector 0, one novel direction, one exact dup id (replay
    # guard), one near-dup PAIR within the batch
    corpus_rows = []
    for i in range(30):
        v = [0.0] * 6
        v[i % 3] = 1.0
        v[3 + (i % 3)] = (((i * 7) % 11) - 5) / 100.0
        corpus_rows.append((i, v))
    corpus = spark.createDataFrame(corpus_rows, "vec_id bigint, embedding array<double>")
    idx = str(tmp_path / "vidx")
    bootstrap_vector_index(corpus, idx)

    near_dup_of_0 = [1.0, 0.0, 0.0, -0.05, 0.0, 0.0]
    novel = [0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
    batch_pair_a = [0.0, 0.0, 0.0, 0.0, 1.0, 0.01]
    batch_pair_b = [0.0, 0.0, 0.0, 0.0, 1.0, -0.01]
    batch = spark.createDataFrame(
        [(100, near_dup_of_0), (101, novel), (102, batch_pair_a),
         (103, batch_pair_b), (5, novel)],
        "vec_id bigint, embedding array<double>",
    )
    n = admit_vector_batch(spark, batch, idx, threshold=0.9)
    got = set(_ids(spark, idx)) - set(range(30))
    # 100 rejected (cos vs corpus vector 0 ~0.999 >= 0.9); 5 already in
    # the index (replay guard); 102/103 are a within-batch near-dup
    # pair -> min id 102 survives; 101 novel admits
    assert got == {101, 102}, got
    assert n == 2
    # replaying the same batch is a no-op
    assert admit_vector_batch(spark, batch, idx, threshold=0.9) == 0
    assert set(_ids(spark, idx)) - set(range(30)) == {101, 102}


def test_stream_equals_sequential_batches(spark, tmp_path):
    emb = spark.read.parquet(
        f"{os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.001')}/embeddings.parquet"
    )
    corpus = emb.where(F.col("vec_id") % 10 != 3)
    b1 = emb.where((F.col("vec_id") % 10 == 3) & (F.col("vec_id") % 20 == 3))
    b2 = emb.where((F.col("vec_id") % 10 == 3) & (F.col("vec_id") % 20 != 3))

    idx_stream = str(tmp_path / "vidx_stream")
    idx_seq = str(tmp_path / "vidx_seq")
    bootstrap_vector_index(corpus, idx_stream)
    bootstrap_vector_index(corpus, idx_seq)

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
        # FileStreamSource orders by mtime — pin b1 before b2
        os.utime(path, (1_000_000_000 + i, 1_000_000_000 + i))
    stream = spark.readStream.schema(
        "vec_id bigint, embedding array<float>"
    ).option("maxFilesPerTrigger", 1).json(str(src))
    q = (
        stream_vector_admission(
            stream, idx_stream, str(tmp_path / "ckpt"), threshold=0.95
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    admit_vector_batch(spark, b1, idx_seq, threshold=0.95)
    admit_vector_batch(spark, b2, idx_seq, threshold=0.95)
    assert _ids(spark, idx_stream) == _ids(spark, idx_seq)

    # admitted vectors are probe-able: a later batch holding an exact
    # copy of an admitted vector under a new id must be REJECTED
    admitted_new = set(_ids(spark, idx_stream)) - {
        r.vec_id for r in corpus.select("vec_id").collect()
    }
    if admitted_new:
        some = min(admitted_new)
        vec = [
            float(x)
            for x in spark.read.parquet(f"{idx_stream}/vectors")
            .where(F.col("vec_id") == some)
            .collect()[0]["embedding"]
        ]
        copy = spark.createDataFrame(
            [(999_999, vec)], "vec_id bigint, embedding array<double>"
        )
        assert admit_vector_batch(spark, copy, idx_stream, threshold=0.95) == 0
