"""BPE vocabulary induction: parity with a pure-Python Sennrich-style
reference, greedy-leftmost edge cases, and the distributed encode step."""

import pytest

from voter_gateway_spark.operators import bpe


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation in the style of Sennrich et al. 2016
    learn_bpe: count ALL adjacent pairs (overlaps included), merge the
    argmax greedily leftmost. Ties: count DESC, lhs ASC, rhs ASC."""
    vocab = {w: (list(w) + ["</w>"], f) for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                stats[pr] = stats.get(pr, 0) + f
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)
    return merges, vocab


def test_bpe_train_matches_python_reference_on_fixture(spark):
    from voter_gateway_spark.queries import QUERIES, _t

    sf = "/root/testdata/sf0.001"
    import re
    from collections import Counter

    wf = Counter()
    for r in _t(spark, sf, "documents").select("text").collect():
        norm = re.sub(r"\s+", " ", r.text).strip().lower()
        for w in norm.split(" "):
            if w:
                wf[w] += 1
    top = dict(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:3000])
    exp, _ = _python_bpe(top, 8)
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in QUERIES["text_bpe_vocab"](spark, sf)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == exp


@pytest.mark.parametrize(
    "words,merge,expected",
    [
        # overlapping run: greedy leftmost pairs up a-a then leaves the odd one
        ({"aaa": 1}, ("a", "a"), ["aa", "a", "</w>"]),
        ({"aaaa": 1}, ("a", "a"), ["aa", "aa", "</w>"]),
        # chained non-overlapping merges in one pass
        ({"abab": 1}, ("a", "b"), ["ab", "ab", "</w>"]),
        # a fresh merge result must not re-merge within the same round
        ({"aab": 1}, ("a", "a"), ["aa", "b", "</w>"]),
    ],
)
def test_bpe_greedy_leftmost_fold(spark, words, merge, expected):
    df = spark.createDataFrame(list(words.items()), "word string, freq long")
    syms = bpe._to_symbols(df)
    out = bpe._apply_merge(syms, *merge).collect()
    assert out[0]["syms"] == expected


def test_bpe_pair_counts_include_overlaps(spark):
    # 'aaa' has TWO (a,a) pairs — the reference get_stats semantics
    df = spark.createDataFrame([("aaa", 5)], "word string, freq long")
    counts = {
        (r.a, r.b): r.cnt for r in bpe._pair_counts(bpe._to_symbols(df)).collect()
    }
    assert counts[("a", "a")] == 10
    assert counts[("a", "</w>")] == 5


def test_bpe_encode_applies_learned_merges(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low")],
        "doc_id long, text string",
    )
    merges, vocab = _python_bpe({"low": 3, "lower": 1, "lowest": 1}, 4)
    enc = bpe.bpe_encode(docs, [(m[1], m[2]) for m in merges]).collect()
    exp_len = {w: len(syms) for w, (syms, _) in vocab.items()}
    for r in enc:
        assert r.n_bpe_tokens == exp_len[r.word], r


def test_bpe_train_local_matches_distributed_on_fixture(spark):
    """The driver-side trainer (heap + inverted index) must produce a
    bit-identical merge table to the distributed-rounds bpe_train on
    real fixture text, past the 8-merge oracle depth."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dist = [
        tuple(r)
        for r in bpe.bpe_train(spark, docs, n_merges=25, max_words=800)
        .orderBy("merge_rank")
        .collect()
    ]
    local = [
        tuple(r)
        for r in bpe.bpe_train_local(spark, docs, n_merges=25, max_words=800)
        .orderBy("merge_rank")
        .collect()
    ]
    assert local == dist
    assert len(local) == 25


def test_bpe_train_local_matches_python_reference_at_1000_merges():
    """Sennrich parity at real merge depth: the incremental
    heap-indexed trainer must equal the naive recount-everything
    reference for >= 1000 merges (the naive form is O(n_merges x
    vocab); the incremental form is what makes 32k-merge vocabs a
    driver-side non-event). Pure driver-side — no Spark session."""
    import random

    rng = random.Random(13)
    alphabet = "abcdefghij"
    wf = {}
    for _ in range(600):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 12))
        )
        wf[w] = wf.get(w, 0) + rng.randint(1, 50)
    exp, _ = _python_bpe(wf, 1000)
    got = bpe._train_merges_local(sorted(wf.items()), 1000)
    assert got == exp
    # a corpus this size genuinely sustains >= 1000 merges
    assert len(got) >= 1000 or len(exp) < 1000


def test_bpe_train_local_exhausts_gracefully():
    """When every pair is merged away before n_merges, the trainer
    stops (no zero-count merges emitted)."""
    got = bpe._train_merges_local([("ab", 3)], 50)
    # 'ab</w>' has pairs (a,b) and (b,</w>) -> at most 2 merges
    assert 0 < len(got) <= 2
    assert all(m[4] > 0 for m in got)


def test_bpe_word_cap_signal(spark):
    """The vocabulary cap must be OBSERVABLE (r13 verdict ask #6): a
    word table truncated by max_words warns from both trainers; an
    uncapped corpus trains silently."""
    import warnings

    docs = spark.createDataFrame(
        [("w%d x%d y%d" % (i, i * 7, i * 13),) for i in range(40)],
        "text string",
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        bpe.bpe_train_local(spark, docs, n_merges=2, max_words=5)
    assert any("max_words cap" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        bpe.bpe_train(spark, docs, n_merges=1, max_words=5)
    assert any("max_words cap" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        bpe.bpe_train_local(spark, docs, n_merges=2, max_words=100000)
    assert not any("max_words cap" in str(w.message) for w in rec)
