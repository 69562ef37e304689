"""Streaming quality admission (streaming/quality.py): the stateless
gates must behave identically on static frames and stream
micro-batches, and compose with the exactly-once dedup admission."""

import json

import pytest
from pyspark.sql import functions as F

from voter_gateway_spark.operators import text
from voter_gateway_spark.streaming.index_dedup import bootstrap_index
from voter_gateway_spark.streaming.quality import (
    quality_filter,
    stream_quality_admission,
)

CLEAN = (
    "the table and row scan of a fast merge that have with value " * 5
).strip()
# a second gate-passing text sharing NO shingles with CLEAN, so the
# intra-batch near-dup pass keeps both
CLEAN2 = (
    "every quick browser window holds one piece of the sorted line "
    "because filters group small batches into keyed parts when columns "
    "join streams under narrow plans while queries keep order"
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture()
def arrival_rows():
    # ids far above the fixture corpus range so the admitted set is
    # readable back from the corpus dir unambiguously
    return [
        # passes both gates
        {"doc_id": 9000001, "text": CLEAN + " alpha"},
        # mojibake -> encoding gate drops it
        {"doc_id": 9000002, "text": CLEAN + " badâ€ part"},
        # too short -> gopher drops it
        {"doc_id": 9000003, "text": "tiny"},
        # passes, and shares no shingles with 9000001
        {"doc_id": 9000004, "text": CLEAN2},
    ]


class TestQualityFilter:
    def test_static_filtering_and_payload_passthrough(self, spark, arrival_rows):
        df = _mkdocs(spark, [(r["doc_id"], r["text"]) for r in arrival_rows])
        got = quality_filter(df)
        assert set(got.columns) == {"doc_id", "text"}
        kept = {r["doc_id"] for r in got.collect()}
        assert kept == {9000001, 9000004}

    def test_paper_thresholds_passthrough(self, spark):
        # at the Gopher paper defaults the 65-word synthetic doc passes
        # word count but the stop-word floor (>= 2 distinct) also holds
        df = _mkdocs(spark, [(1, CLEAN * 2)])
        got = quality_filter(df, min_words=50, min_stop_words=2)
        assert got.count() == 1


class TestStreamParity:
    def test_stream_admits_exactly_the_batch_filtered_set(
        self, spark, sf_dir, tmp_path, arrival_rows
    ):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") % 5 != 0)
        idx, cp = str(tmp_path / "idx"), str(tmp_path / "corpus")
        bootstrap_index(corpus, idx, cp, "doc_id", "text")
        n0 = spark.read.parquet(cp).count()

        src = tmp_path / "arrivals"
        src.mkdir()
        (src / "b1.jsonl").write_text(
            "\n".join(json.dumps(d) for d in arrival_rows) + "\n"
        )
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        writer = stream_quality_admission(
            stream, idx, cp, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(180)
        q.stop()

        admitted = {
            r["doc_id"]
            for r in spark.read.parquet(cp)
            .where(F.col("doc_id") >= 9000000)
            .collect()
        }
        # batch reference: same filter, then the same admission batch
        # body (doc 1 and 4 both pass the gates; both are novel vs the
        # fixture corpus, and not near-dups of each other at the
        # default threshold unless the banded probe says so — compute
        # the reference instead of hardcoding)
        from voter_gateway_spark.streaming.index_dedup import admit_batch

        # rebuild a pristine corpus/index for the batch reference
        idx2, cp2 = str(tmp_path / "idx2"), str(tmp_path / "corpus2")
        bootstrap_index(corpus, idx2, cp2, "doc_id", "text")
        batch = quality_filter(
            _mkdocs(spark, [(r["doc_id"], r["text"]) for r in arrival_rows])
        )
        ref = admit_batch(spark, batch, idx2, cp2, "doc_id", "text")
        ref_ids = {r["doc_id"] for r in ref.collect()}
        assert admitted == ref_ids
        assert 9000002 not in admitted and 9000003 not in admitted
        assert 9000001 in admitted
        # corpus grew by exactly the admitted set
        assert spark.read.parquet(cp).count() == n0 + len(admitted)


class TestLMGatedStream:
    def test_lm_gated_stream_matches_batch_reference(
        self, spark, sf_dir, tmp_path, arrival_rows
    ):
        from voter_gateway_spark.operators import lm
        from voter_gateway_spark.streaming.index_dedup import admit_batch
        from voter_gateway_spark.streaming.quality import lm_gate

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") % 5 != 0)
        # reference LM pinned on the corpus snapshot PLUS the clean
        # template, so the CLEAN-derived arrivals score as in-domain
        # and CLEAN2 (novel trigrams) falls through to backoff
        train = corpus.unionByName(
            _mkdocs(spark, [(8000001, CLEAN)])
        )
        ref = lm.build_reference(train)

        idx, cp = str(tmp_path / "idx"), str(tmp_path / "corpus")
        bootstrap_index(corpus, idx, cp, "doc_id", "text")

        src = tmp_path / "arrivals"
        src.mkdir()
        (src / "b1.jsonl").write_text(
            "\n".join(json.dumps(d) for d in arrival_rows) + "\n"
        )
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        floor = -6.0
        writer = stream_quality_admission(
            stream, idx, cp, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ckpt"),
            lm_ref=ref, logprob_floor=floor,
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(180)
        q.stop()
        admitted = {
            r["doc_id"]
            for r in spark.read.parquet(cp)
            .where(F.col("doc_id") >= 9000000)
            .collect()
        }

        # batch reference: identical gate chain on a pristine state
        idx2, cp2 = str(tmp_path / "idx2"), str(tmp_path / "corpus2")
        bootstrap_index(corpus, idx2, cp2, "doc_id", "text")
        batch = quality_filter(
            _mkdocs(spark, [(r["doc_id"], r["text"]) for r in arrival_rows])
        )
        gated = lm_gate(batch, ref, floor)
        ref_out = admit_batch(spark, gated, idx2, cp2, "doc_id", "text")
        ref_ids = {r["doc_id"] for r in ref_out.collect()}
        assert admitted == ref_ids
        # the in-domain clean arrival survives the LM gate
        assert 9000001 in admitted

    def test_nb_gated_stream_matches_batch_reference(
        self, spark, sf_dir, tmp_path, arrival_rows
    ):
        from voter_gateway_spark.operators import nbq
        from voter_gateway_spark.streaming.index_dedup import admit_batch
        from voter_gateway_spark.streaming.quality import nb_gate

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") % 5 != 0)
        ref = nbq.build_reference(corpus)

        idx, cp = str(tmp_path / "idx"), str(tmp_path / "corpus")
        bootstrap_index(corpus, idx, cp, "doc_id", "text")

        src = tmp_path / "arrivals"
        src.mkdir()
        (src / "b1.jsonl").write_text(
            "\n".join(json.dumps(d) for d in arrival_rows) + "\n"
        )
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        # floor well below 0: the parity claim (stream == batch chain)
        # is the contract under test, not the classifier's judgment of
        # the synthetic arrivals
        floor = -1.0
        writer = stream_quality_admission(
            stream, idx, cp, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ckpt"),
            nb_ref=ref, nb_floor=floor,
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(180)
        q.stop()
        admitted = {
            r["doc_id"]
            for r in spark.read.parquet(cp)
            .where(F.col("doc_id") >= 9000000)
            .collect()
        }

        # batch reference: identical gate chain on a pristine state
        idx2, cp2 = str(tmp_path / "idx2"), str(tmp_path / "corpus2")
        bootstrap_index(corpus, idx2, cp2, "doc_id", "text")
        batch = quality_filter(
            _mkdocs(spark, [(r["doc_id"], r["text"]) for r in arrival_rows])
        )
        gated = nb_gate(batch, ref, floor)
        ref_out = admit_batch(spark, gated, idx2, cp2, "doc_id", "text")
        ref_ids = {r["doc_id"] for r in ref_out.collect()}
        assert admitted == ref_ids
        assert admitted  # the gate admits something at this floor

    def test_nb_gate_requires_floor(self, spark, sf_dir, tmp_path):
        from voter_gateway_spark.operators import nbq
        from voter_gateway_spark.streaming.quality import (
            stream_quality_admission,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        ref = nbq.build_reference(docs)
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(tmp_path)
        )
        with pytest.raises(ValueError, match="nb_floor"):
            stream_quality_admission(
                stream, "i", "c", "doc_id", "text", nb_ref=ref
            )

    def test_lm_gate_requires_floor(self, spark, sf_dir, tmp_path):
        from voter_gateway_spark.operators import lm
        from voter_gateway_spark.streaming.quality import (
            stream_quality_admission,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        ref = lm.build_reference(docs)
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(tmp_path)
        )
        with pytest.raises(ValueError, match="logprob_floor"):
            stream_quality_admission(
                stream, "i", "c", "doc_id", "text", lm_ref=ref
            )


class TestPayloadNameGuard:
    """quality_filter rejects payload columns that collide with the
    gate output names (ADVICE r10: a stream whose schema already has
    n_words / pass_gopher / is_suspect / ok_* would otherwise produce
    duplicate, ambiguous columns downstream)."""

    def test_colliding_payload_raises(self, spark):
        df = spark.createDataFrame(
            [(1, "text here", 5)], "doc_id bigint, text string, n_words int"
        )
        with pytest.raises(ValueError, match="n_words"):
            quality_filter(df)

    def test_gate_output_named_payload_raises(self, spark):
        df = spark.createDataFrame(
            [(1, "text here", True)],
            "doc_id bigint, text string, pass_gopher boolean",
        )
        with pytest.raises(ValueError, match="pass_gopher"):
            quality_filter(df)

    def test_benign_payload_passes(self, spark):
        df = spark.createDataFrame(
            [(1, "the words be to of and that have with " * 5, "web")],
            "doc_id bigint, text string, source string",
        )
        out = quality_filter(df, min_words=5)
        assert out.columns == ["doc_id", "text", "source"]
        assert out.count() == 1
