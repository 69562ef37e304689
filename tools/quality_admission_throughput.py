"""Streaming document-admission throughput A/B: what do the quality
gates cost INSIDE the stream?

Drives the same arriving-document stream (JSONL micro-batches drawn
from a stress replica's documents, salted so content is distinct)
through three admission pipelines:

  dedup_only   stream_dedup_against_index — the r7 baseline
  quality      + stateless Gopher/encoding gates in the stream plan
  quality_lm   + trigram-LM logprob floor against a pinned reference
               (scored per micro-batch in the foreachBatch body)
  quality_nb   + naive-Bayes classifier floor against a pinned
               NBReference (r12's trained gate; the 2^16-bounded
               broadcast weight table scored per micro-batch)

Each mode gets a pristine bootstrapped corpus + band index; reported
per mode: wall seconds, input rows/s, and the admitted count (the
gated modes admit fewer rows — the quality funnel working — so
compare rows/s on INPUT rows, which is identical across modes).

Usage:
    python tools/quality_admission_throughput.py [replica_dir] [n_batches] [batch_rows]

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

from voter_gateway_spark.operators import lm, nbq  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402
from voter_gateway_spark.streaming.index_dedup import (  # noqa: E402
    bootstrap_index,
    stream_dedup_against_index,
)
from voter_gateway_spark.streaming.quality import (  # noqa: E402
    stream_quality_admission,
)

WORK = Path("/tmp/quality_admission_tp")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_x10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = build_spark(app_name="vgs-quality-tp")
    spark.sparkContext.setLogLevel("ERROR")
    if WORK.exists():
        shutil.rmtree(WORK)
    WORK.mkdir(parents=True)

    docs = (
        spark.read.parquet(f"{src}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("text", F.concat("text", F.lit(" #"), F.col("doc_id")))
    )
    total_arrivals = n_batches * batch_rows
    arriving = docs.orderBy("doc_id").limit(total_arrivals).collect()
    corpus = docs.join(
        spark.createDataFrame(
            [(r["doc_id"],) for r in arriving], "doc_id bigint"
        ),
        "doc_id",
        "left_anti",
    )
    n_corpus = corpus.count()

    arr_dir = WORK / "arrivals"
    arr_dir.mkdir()
    for b in range(n_batches):
        rows = arriving[b * batch_rows : (b + 1) * batch_rows]
        (arr_dir / f"b{b:03d}.jsonl").write_text(
            "\n".join(
                json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                for r in rows
            )
            + "\n"
        )

    lm_ref = lm.build_reference(corpus)
    nb_ref = nbq.build_reference(corpus)
    results = {}
    for mode in ["dedup_only", "quality", "quality_lm", "quality_nb"]:
        idx = str(WORK / f"idx_{mode}")
        cp = str(WORK / f"corpus_{mode}")
        bootstrap_index(corpus, idx, cp, "doc_id", "text")
        stream = spark.readStream.schema("doc_id bigint, text string").option(
            "maxFilesPerTrigger", 1
        ).json(str(arr_dir))
        kwargs = dict(checkpoint_dir=str(WORK / f"ckpt_{mode}"),
                      query_name=f"tp_{mode}")
        if mode == "dedup_only":
            writer = stream_dedup_against_index(
                stream, idx, cp, "doc_id", "text",
                checkpoint_dir=kwargs["checkpoint_dir"],
                query_name=kwargs["query_name"],
            )
        elif mode == "quality":
            writer = stream_quality_admission(
                stream, idx, cp, "doc_id", "text", **kwargs
            )
        elif mode == "quality_lm":
            writer = stream_quality_admission(
                stream, idx, cp, "doc_id", "text",
                lm_ref=lm_ref, logprob_floor=-6.0, **kwargs
            )
        else:
            writer = stream_quality_admission(
                stream, idx, cp, "doc_id", "text",
                nb_ref=nb_ref, nb_floor=0.0, **kwargs
            )
        t0 = time.time()
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(600)
        q.stop()
        wall = time.time() - t0
        admitted = (
            spark.read.parquet(cp).count() - n_corpus
        )
        results[mode] = {
            "wall_s": round(wall, 2),
            "input_rows_per_s": round(total_arrivals / wall, 1),
            "admitted": admitted,
        }
        print(mode, results[mode], flush=True)

    print(
        json.dumps(
            {
                "metric": "quality_admission_throughput",
                "sf_dir": src,
                "n_corpus": n_corpus,
                "n_batches": n_batches,
                "batch_rows": batch_rows,
                "modes": results,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
