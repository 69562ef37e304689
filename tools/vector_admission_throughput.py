"""Streaming semantic-admission throughput: what does the vector gate
cost inside the stream?

Bootstraps a persisted IVF index from a replica's embeddings corpus,
then drives JSONL micro-batches of arriving vectors (drawn from the
same replica under fresh ids; half are verbatim copies of corpus
vectors — the rejects — and half are sign-flipped — novel, admitted)
through `stream_vector_admission`. Reported: wall seconds, input
rows/s, admitted count, and the final index size. The admit/reject
mix being ~50/50 exercises both the probe-reject path and the
assign-and-append path in every batch.

Usage:
    python tools/vector_admission_throughput.py [replica_dir] [n_batches] [batch_rows]

Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from voter_gateway_spark.session import build_spark  # noqa: E402
from voter_gateway_spark.streaming.vector_admission import (  # noqa: E402
    bootstrap_vector_index,
    stream_vector_admission,
)

WORK = Path("/tmp/vector_admission_tp")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    spark = build_spark(app_name="vgs-vector-admission-tp")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    idx = str(WORK / "vidx")
    bootstrap_vector_index(emb, idx)
    corpus_n = emb.count()

    # arrivals: fresh ids; even rows verbatim corpus copies (reject),
    # odd rows sign-flipped (novel at cosine -1 from their source)
    need = n_batches * batch_rows
    base = emb.orderBy("vec_id").limit(need).collect()
    arrivals_dir = WORK / "arrivals"
    arrivals_dir.mkdir()
    for b in range(n_batches):
        rows = []
        for j in range(batch_rows):
            r = base[b * batch_rows + j]
            vec = list(r.embedding)
            if j % 2:
                vec = [-x for x in vec]
            rows.append(
                json.dumps(
                    {"vec_id": 10_000_000 + b * batch_rows + j,
                     "embedding": [float(x) for x in vec]}
                )
            )
        p = arrivals_dir / f"b{b:03d}.jsonl"
        p.write_text("\n".join(rows) + "\n")
        import os

        os.utime(p, (1_000_000_000 + b, 1_000_000_000 + b))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(arrivals_dir))
    )
    t0 = time.time()
    q = (
        stream_vector_admission(
            stream, idx, str(WORK / "ckpt"), threshold=0.95
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    final_n = spark.read.parquet(f"{idx}/vectors").count()
    out = {
        "metric": "vector_admission_throughput",
        "replica": src,
        "corpus_rows": corpus_n,
        "batches": n_batches,
        "batch_rows": batch_rows,
        "wall_s": round(wall, 2),
        "input_rows_per_s": round(need / wall, 1),
        "admitted": final_n - corpus_n,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
