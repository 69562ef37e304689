"""Streaming near-dup admission against the persisted band index:
batch-vs-corpus rejection, index growth across batches, intra-batch
dedup, and the streaming (availableNow) end-to-end."""

from pyspark.sql import functions as F

from voter_gateway_spark.streaming.index_dedup import (
    admit_batch,
    bootstrap_index,
    stream_dedup_against_index,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_admit_batch_rejects_corpus_dups_and_grows_index(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "idx")
    cp = str(tmp_path / "corpus")
    bootstrap_index(corpus, idx, cp, "doc_id", "text")

    # batch 1: exact copies of corpus docs under new ids (must be
    # rejected) + genuinely new docs (doc_id % 5 == 0; admitted)
    copies = corpus.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    novel = docs.where(F.col("doc_id") % 5 == 0)
    batch1 = novel.unionByName(copies)
    admitted1 = admit_batch(spark, batch1, idx, cp, "doc_id", "text")
    ids1 = {r.doc_id for r in admitted1.select("doc_id").collect()}
    assert not any(i >= 1_000_000 for i in ids1), "corpus copies must be rejected"
    assert ids1, "novel docs must be admitted"

    # batch 2: copies of batch-1 ADMITTED docs — the index grew, so
    # they are rejected now (read-your-own-writes across batches)
    batch2 = admitted1.select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    admitted2 = admit_batch(spark, batch2, idx, cp, "doc_id", "text")
    assert admitted2.count() == 0

    # corpus dir holds exactly: bootstrap + batch-1 admissions
    total = spark.read.parquet(cp).count()
    assert total == corpus.count() + len(ids1)


def test_admit_batch_intra_batch_dedup(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 5 == 1)
    idx = str(tmp_path / "idx2")
    cp = str(tmp_path / "corpus2")
    bootstrap_index(corpus, idx, cp, "doc_id", "text")
    # one novel doc arrives twice in the SAME batch under two ids:
    # only the min id survives
    seed = docs.where(F.col("doc_id") % 5 == 2).limit(1)
    twice = seed.select(F.lit(10).alias("doc_id"), "text").unionByName(
        seed.select(F.lit(20).alias("doc_id"), "text")
    )
    admitted = admit_batch(spark, twice, idx, cp, "doc_id", "text")
    assert [r.doc_id for r in admitted.select("doc_id").collect()] == [10]
    # with intra_batch off both pass (batch-vs-corpus only)
    idx3 = str(tmp_path / "idx3")
    cp3 = str(tmp_path / "corpus3")
    bootstrap_index(corpus, idx3, cp3, "doc_id", "text")
    both = admit_batch(
        spark, twice, idx3, cp3, "doc_id", "text", intra_batch=False
    )
    assert both.count() == 2


def test_stream_dedup_against_index_e2e(spark, sf_dir, tmp_path):
    import json

    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "idx_s")
    cp = str(tmp_path / "corpus_s")
    bootstrap_index(corpus, idx, cp, "doc_id", "text")

    src = tmp_path / "arrivals"
    src.mkdir()
    novel = [
        {"doc_id": r.doc_id, "text": r.text}
        for r in docs.where(F.col("doc_id") % 5 == 0).limit(5).collect()
    ]
    dup_of_corpus = [
        {"doc_id": r.doc_id + 9_000_000, "text": r.text}
        for r in corpus.limit(3).collect()
    ]
    (src / "b1.jsonl").write_text(
        "\n".join(json.dumps(d) for d in novel + dup_of_corpus) + "\n"
    )
    stream = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    writer = stream_dedup_against_index(
        stream, idx, cp, "doc_id", "text",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(180)
    q.stop()

    # expected admissions = novel docs minus those the in-memory
    # bipartite probe flags as near-dups of the corpus (the fixture
    # corpus contains organic near-dups, so not all 5 survive)
    from voter_gateway_spark.operators.dedup_ops import incremental_minhash_pairs

    novel_df = docs.where(F.col("doc_id") % 5 == 0).limit(5)
    flagged = {
        r.new_id
        for r in incremental_minhash_pairs(
            novel_df, corpus, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    expected_new = {d["doc_id"] for d in novel} - flagged
    got = spark.read.parquet(cp)
    new_ids = {
        r.doc_id
        for r in got.join(corpus.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id")
        .collect()
    }
    assert new_ids == expected_new
    assert got.where(F.col("doc_id") >= 9_000_000).count() == 0


# -- crash-injection: exactly-once admission under replay ---------------------


def _bootstrap_small(spark, sf_dir, tmp_path, name):
    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 5 == 1)
    idx = str(tmp_path / f"idx_{name}")
    cp = str(tmp_path / f"corpus_{name}")
    bootstrap_index(corpus, idx, cp, "doc_id", "text")
    batch = docs.where(F.col("doc_id") % 5 == 3).limit(4)
    return corpus, idx, cp, batch


def _assert_exactly_once(spark, cp, corpus, admitted_ids):
    got = spark.read.parquet(cp)
    assert got.count() == got.select("doc_id").distinct().count(), "duplicate corpus rows"
    new_ids = {
        r.doc_id
        for r in got.join(corpus.select("doc_id"), "doc_id", "left_anti").collect()
    }
    assert new_ids == admitted_ids, "lost or extra admissions"


def test_admission_crash_between_corpus_and_index_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the batch after the corpus commit but before the index
    commits; the replay must neither duplicate the corpus rows nor
    lose the admission, and the index must end consistent (a later
    copy of the admitted docs is rejected)."""
    import pytest as _pytest

    import voter_gateway_spark.streaming.index_dedup as idx_mod

    corpus, idx, cp, batch = _bootstrap_small(spark, sf_dir, tmp_path, "crash1")

    real_commit = idx_mod._commit_staged

    def dying_commit(spark_, staged_dir, live_dir, tag, moves=None):
        real_commit(spark_, staged_dir, live_dir, tag, moves=moves)
        if "/bands" in live_dir:
            raise RuntimeError("injected crash after bands commit")

    monkeypatch.setattr(idx_mod, "_commit_staged", dying_commit)
    with _pytest.raises(RuntimeError, match="injected crash"):
        admit_batch(spark, batch, idx, cp, "doc_id", "text", batch_id=7, query_id="q1")
    monkeypatch.setattr(idx_mod, "_commit_staged", real_commit)

    # partial state on disk: corpus + bands committed, hashes staged only
    replayed = admit_batch(
        spark, batch, idx, cp, "doc_id", "text", batch_id=7, query_id="q1"
    )
    assert replayed is not None
    admitted_ids = {r.doc_id for r in replayed.select("doc_id").collect()}
    assert admitted_ids, "replay must re-admit, not lose the batch"
    _assert_exactly_once(spark, cp, corpus, admitted_ids)

    # index consistent: exact copies of the admitted docs are rejected
    copies = replayed.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    again = admit_batch(
        spark, copies, idx, cp, "doc_id", "text", batch_id=8, query_id="q1"
    )
    assert again.count() == 0


def test_admission_crash_before_marker_then_replay(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill after ALL commits but before the marker write — the worst
    window: everything is live but the batch will replay. The replay
    must first undo the tagged files and land the batch exactly once."""
    import pytest as _pytest

    import voter_gateway_spark.streaming.index_dedup as idx_mod

    corpus, idx, cp, batch = _bootstrap_small(spark, sf_dir, tmp_path, "crash2")

    def dying_marker(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(idx_mod, "_write_marker", dying_marker)
    with _pytest.raises(RuntimeError, match="injected crash"):
        admit_batch(spark, batch, idx, cp, "doc_id", "text", batch_id=3, query_id="qz")
    monkeypatch.undo()

    replayed = admit_batch(
        spark, batch, idx, cp, "doc_id", "text", batch_id=3, query_id="qz"
    )
    admitted_ids = {r.doc_id for r in replayed.select("doc_id").collect()}
    _assert_exactly_once(spark, cp, corpus, admitted_ids)


def test_admission_marker_skips_committed_replay(spark, sf_dir, tmp_path):
    """A replay of a FULLY committed batch (crash between marker write
    and checkpoint commit) is skipped outright: returns None, corpus
    byte-count unchanged."""
    corpus, idx, cp, batch = _bootstrap_small(spark, sf_dir, tmp_path, "skip")
    first = admit_batch(
        spark, batch, idx, cp, "doc_id", "text", batch_id=5, query_id="qq"
    )
    admitted_ids = {r.doc_id for r in first.select("doc_id").collect()}
    n_before = spark.read.parquet(cp).count()
    assert (
        admit_batch(spark, batch, idx, cp, "doc_id", "text", batch_id=5, query_id="qq")
        is None
    )
    assert spark.read.parquet(cp).count() == n_before
    _assert_exactly_once(spark, cp, corpus, admitted_ids)
    # a DIFFERENT lineage's batch 5 is NOT suppressed by qq's marker
    novel = _docs(spark, sf_dir).where(F.col("doc_id") % 5 == 4).limit(2)
    other = admit_batch(
        spark, novel, idx, cp, "doc_id", "text", batch_id=5, query_id="other"
    )
    assert other is not None
    # ...and qq's committed batch-5 rows SURVIVE other's batch-5 replay
    # undo: the file tag is lineage-scoped, so other's undo only targets
    # its own files (a batch-id-only tag deleted qq's here)
    corpus_ids = {r.doc_id for r in spark.read.parquet(cp).select("doc_id").collect()}
    assert admitted_ids <= corpus_ids


def test_admission_none_query_id_never_skips_but_lands_once(
    spark, sf_dir, tmp_path
):
    """query_id=None identifies no lineage: a marker written by a
    None-qid call must not suppress a later None-qid call at the same
    batch_id (None == None is not 'same lineage'). The replay instead
    re-lands idempotently through the tagged undo — same corpus rows,
    no duplicates."""
    corpus, idx, cp, batch = _bootstrap_small(spark, sf_dir, tmp_path, "noqid")
    first = admit_batch(
        spark, batch, idx, cp, "doc_id", "text", batch_id=4, query_id=None
    )
    admitted_ids = {r.doc_id for r in first.select("doc_id").collect()}
    assert admitted_ids
    replayed = admit_batch(
        spark, batch, idx, cp, "doc_id", "text", batch_id=4, query_id=None
    )
    assert replayed is not None  # never marker-skipped
    _assert_exactly_once(spark, cp, corpus, admitted_ids)


def test_admission_replay_undo_is_manifest_driven_not_a_scan(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r6 #5: once a lineage has committed a batch, no replay
    may pay a recursive live-dir listing — the move manifest (written
    before the first rename) bounds the undo to this batch's own
    files. Crash mid-commit after a prior committed batch, then assert
    the replay never calls _delete_tagged and still lands the batch
    exactly once."""
    import pytest as _pytest

    import voter_gateway_spark.streaming.index_dedup as idx_mod

    corpus, idx, cp, batch = _bootstrap_small(spark, sf_dir, tmp_path, "manif")
    docs = _docs(spark, sf_dir)

    # batch 1 commits cleanly -> lineage marker + manifest exist
    b1 = docs.where(F.col("doc_id") % 5 == 0).limit(3)
    first = admit_batch(spark, b1, idx, cp, "doc_id", "text", batch_id=1, query_id="qm")
    ids1 = {r.doc_id for r in first.select("doc_id").collect()}
    assert ids1

    # batch 2 crashes mid-commit (corpus committed, index partial)
    real_commit = idx_mod._commit_staged

    def dying_commit(spark_, staged_dir, live_dir, tag, moves=None):
        real_commit(spark_, staged_dir, live_dir, tag, moves=moves)
        if "/bands" in live_dir:
            raise RuntimeError("injected crash after bands commit")

    monkeypatch.setattr(idx_mod, "_commit_staged", dying_commit)
    with _pytest.raises(RuntimeError, match="injected crash"):
        admit_batch(spark, batch, idx, cp, "doc_id", "text", batch_id=2, query_id="qm")
    monkeypatch.setattr(idx_mod, "_commit_staged", real_commit)

    def no_scan(*a, **kw):
        raise AssertionError("replay paid a recursive live-dir scan")

    monkeypatch.setattr(idx_mod, "_delete_tagged", no_scan)
    replayed = admit_batch(
        spark, batch, idx, cp, "doc_id", "text", batch_id=2, query_id="qm"
    )
    ids2 = {r.doc_id for r in replayed.select("doc_id").collect()}
    assert ids2
    _assert_exactly_once(spark, cp, corpus, ids1 | ids2)
    # index consistent after manifest-undo replay: copies rejected
    copies = replayed.select((F.col("doc_id") + 3_000_000).alias("doc_id"), "text")
    again = admit_batch(
        spark, copies, idx, cp, "doc_id", "text", batch_id=3, query_id="qm"
    )
    assert again.count() == 0


def test_admission_interleaved_lineages_keep_independent_skip_state(
    spark, sf_dir, tmp_path
):
    """ADVICE r6 #5 (second half): markers are per-lineage files, so
    lineage B committing between lineage A's commit and A's replay
    must NOT degrade A's skip into delete-and-redo — A's replay still
    returns None (skipped) and B's rows survive."""
    corpus, idx, cp, batch = _bootstrap_small(spark, sf_dir, tmp_path, "ilv")
    docs = _docs(spark, sf_dir)

    a = admit_batch(spark, batch, idx, cp, "doc_id", "text", batch_id=5, query_id="la")
    a_ids = {r.doc_id for r in a.select("doc_id").collect()}
    assert a_ids

    b_batch = docs.where(F.col("doc_id") % 5 == 4).limit(3)
    b = admit_batch(
        spark, b_batch, idx, cp, "doc_id", "text", batch_id=2, query_id="lb"
    )
    b_ids = {r.doc_id for r in b.select("doc_id").collect()}

    # A's committed-batch replay after B's write: still marker-skipped
    assert (
        admit_batch(spark, batch, idx, cp, "doc_id", "text", batch_id=5, query_id="la")
        is None
    )
    _assert_exactly_once(spark, cp, corpus, a_ids | b_ids)
