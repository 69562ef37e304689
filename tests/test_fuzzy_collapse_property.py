"""Property test: fuzzy rep-collapse equivalence (VERDICT r2 item 7).

top1_fuzzy_match's default path collapses rows with identical trigram
SETS to one representative per side before the inverted-index join,
then expands the winner to every group member. The claim: results are
IDENTICAL to the direct (collapse_exact=False) path — for voter-file-
shaped data (the same street/city repeated thousands of times) this is
the default production path, so the equivalence deserves randomized
adversarial coverage beyond the sf0.01 oracle check.

Adversarial shapes deliberately generated: duplicate values on both
sides (identical trigram sets), similarity ties resolved by lowest
target id, case/punctuation variants that normalize to the SAME
trigram set without equal raw strings, and rows with empty trigram
sets.
"""

import random

import pytest
from pyspark.sql import Row

from voter_gateway_spark.operators.fuzzy import top1_fuzzy_match

WORDS = ["main", "oak", "elm", "park", "lake", "hill", "north", "south"]
SUFFIX = ["st", "ave", "rd", "blvd"]
DECOR = ["{}", "{} ", " {}", "{}.", "{},", "{}"]  # same trigrams, unequal strings


def _value(rng: random.Random) -> str:
    base = f"{rng.randint(1, 30)} {rng.choice(WORDS)} {rng.choice(SUFFIX)}"
    if rng.random() < 0.3:
        base = base.upper() if rng.random() < 0.5 else base.title()
    if rng.random() < 0.2:
        base = rng.choice(DECOR).format(base)
    if rng.random() < 0.1:
        base = ""  # empty trigram set
    return base


def _frame(spark, rng: random.Random, n: int, id_col: str):
    # duplicates are the point: draw from a small value space
    rows = [Row(**{id_col: i, "addr": _value(rng)}) for i in range(1, n + 1)]
    return spark.createDataFrame(rows, f"{id_col} int, addr string")


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_collapse_matches_direct_path(spark, seed):
    rng = random.Random(seed)
    source = _frame(spark, rng, 60, "sid")
    target = _frame(spark, rng, 40, "tid")

    kw = dict(column="addr", source_id="sid", target_id="tid", threshold=0.5)
    collapsed = top1_fuzzy_match(source, target, collapse_exact=True, **kw)
    direct = top1_fuzzy_match(source, target, collapse_exact=False, **kw)

    c = {r.sid: (r.matched_tid, r.similarity) for r in collapsed.collect()}
    d = {r.sid: (r.matched_tid, r.similarity) for r in direct.collect()}
    assert c == d


def test_collapse_exact_ties_pick_lowest_tid(spark):
    """Multiple targets with IDENTICAL trigram sets: the winner must be
    the globally lowest tid, whichever row was chosen as rep."""
    source = spark.createDataFrame([Row(sid=1, addr="main st")], "sid int, addr string")
    target = spark.createDataFrame(
        [
            Row(tid=9, addr="MAIN ST"),     # same trigram set, higher id
            Row(tid=3, addr="main st."),    # same trigram set, lowest id
            Row(tid=5, addr="main st"),
        ],
        "tid int, addr string",
    )
    for collapse in (True, False):
        got = top1_fuzzy_match(
            source, target, "addr", "sid", "tid", collapse_exact=collapse
        ).collect()
        assert len(got) == 1 and got[0].matched_tid == 3, collapse


def test_collapse_expands_to_all_group_members(spark):
    """Every member of a duplicated source group gets the match, not
    just the representative."""
    source = spark.createDataFrame(
        [Row(sid=i, addr=a) for i, a in [(1, "oak ave"), (2, "OAK AVE"), (3, "oak ave,")]],
        "sid int, addr string",
    )
    target = spark.createDataFrame(
        [Row(tid=1, addr="oak ave")], "tid int, addr string"
    )
    got = top1_fuzzy_match(source, target, "addr", "sid", "tid")
    assert {r.sid for r in got.collect()} == {1, 2, 3}


def test_heavy_dup_forces_collapse_and_matches_direct(spark):
    """Each value repeated 5x on both sides → probed fanout ≈ 25 >
    COLLAPSE_FANOUT_THRESHOLD, so the collapse stages genuinely run;
    results must equal the direct path's."""
    vals = ["main st", "oak ave", "elm rd", "park blvd"]
    source = spark.createDataFrame(
        [Row(sid=i, addr=vals[i % 4]) for i in range(1, 21)],
        "sid int, addr string",
    )
    target = spark.createDataFrame(
        [Row(tid=i, addr=vals[(i + 1) % 4]) for i in range(1, 21)],
        "tid int, addr string",
    )
    kw = dict(column="addr", source_id="sid", target_id="tid", threshold=0.5)
    collapsed = top1_fuzzy_match(source, target, collapse_exact=True, **kw)
    direct = top1_fuzzy_match(
        source, target, collapse_exact=False, max_trigram_freq=0, **kw
    )
    c = {r.sid: (r.matched_tid, r.similarity) for r in collapsed.collect()}
    d = {r.sid: (r.matched_tid, r.similarity) for r in direct.collect()}
    assert c == d and len(c) == 20


def test_heavy_dup_exclude_self_matches_direct(spark):
    """Self-match over a 5x-duplicated corpus under exclude_self: the
    collapse path's within-group channel must reproduce the direct
    path's sim-1.0 matches exactly."""
    vals = ["main st", "oak ave", "elm rd"]
    docs = spark.createDataFrame(
        [Row(did=i, addr=vals[i % 3]) for i in range(1, 16)],
        "did int, addr string",
    )
    kw = dict(
        column="addr", source_id="did", target_id="did",
        threshold=0.5, exclude_self=True,
    )
    collapsed = top1_fuzzy_match(docs, docs, collapse_exact=True, **kw)
    direct = top1_fuzzy_match(
        docs, docs, collapse_exact=False, max_trigram_freq=0, **kw
    )
    c = {r.did: (r.matched_did, r.similarity) for r in collapsed.collect()}
    d = {r.did: (r.matched_did, r.similarity) for r in direct.collect()}
    assert c == d and len(c) == 15
    assert all(sim == 1.0 for _, sim in c.values())


def test_dup_free_fast_path_matches_direct(spark):
    """All-unique values → probed fanout 1.0, the plain fast path runs;
    results must equal the uncapped direct path's."""
    source = spark.createDataFrame(
        [Row(sid=i, addr=f"{i} main st") for i in range(1, 13)],
        "sid int, addr string",
    )
    target = spark.createDataFrame(
        [Row(tid=i, addr=f"{i} main ave") for i in range(1, 13)],
        "tid int, addr string",
    )
    kw = dict(column="addr", source_id="sid", target_id="tid", threshold=0.5)
    fast = top1_fuzzy_match(source, target, collapse_exact=True, **kw)
    direct = top1_fuzzy_match(
        source, target, collapse_exact=False, max_trigram_freq=0, **kw
    )
    f = {r.sid: (r.matched_tid, r.similarity) for r in fast.collect()}
    d = {r.sid: (r.matched_tid, r.similarity) for r in direct.collect()}
    assert f == d


def test_capped_exact_match_channel_survives_dominant_value(spark):
    """ADVICE r5: with a dominant target value whose every trigram
    exceeds the stop-trigram cap, identical texts must STILL match at
    similarity 1.0 via the fingerprint-equality channel — the cap may
    prune near-matches, never exact ones."""
    target = spark.createDataFrame(
        [Row(tid=i, addr="springfield county line") for i in range(1, 9)]
        + [Row(tid=9, addr="shelbyville"), Row(tid=10, addr="ogdenville")],
        "tid int, addr string",
    )
    source = spark.createDataFrame(
        [Row(sid=1, addr="springfield county line")], "sid int, addr string"
    )
    got = top1_fuzzy_match(
        source, target, "addr", "sid", "tid",
        collapse_exact=False, max_trigram_freq=2,
    ).collect()
    assert len(got) == 1
    assert got[0].matched_tid == 1 and got[0].similarity == 1.0


def test_blank_rows_never_pair_under_collapse(spark):
    """Rows with NO trigrams (blank/all-punctuation text) have pg_trgm
    similarity 0 with everything — including each other. The collapse
    path's within-group channel keys on trigram-set fingerprints, and
    empty/NULL sets all share md5(''); without the empty-fingerprint
    guard they paired each other at a fabricated similarity 1.0 that
    the plain path (correctly) never emits."""
    rows = [Row(id=i, name="jonathan smith") for i in range(1, 9)]
    rows += [Row(id=100 + i, name="...") for i in range(4)]
    rows += [Row(id=200, name="zzz qqq")]
    df = spark.createDataFrame(rows, "id int, name string")

    def canon(collapse):
        return sorted(
            tuple(r)
            for r in top1_fuzzy_match(
                df, df, "name", "id", "id",
                exclude_self=True, collapse_exact=collapse,
            ).collect()
        )

    a, b = canon(True), canon(False)
    assert a == b
    assert not [t for t in a if 100 <= t[0] < 200]  # blanks match nothing


def test_gate_declined_hazard_guard_engages_auto_cap(spark, monkeypatch):
    """ADVICE r6 #4: on a heavy-tailed DISTINCT-text corpus the
    gate-declined branch must not run the inverted-index join
    uncapped once the estimated candidate row count crosses
    HAZARD_EST_PAIRS. Pins the wiring by forcing the threshold to 0
    (guard always fires) and asserting the result equals an explicit
    max_trigram_freq="auto" call; and that with the real (huge)
    threshold the default path equals the uncapped one."""
    from voter_gateway_spark.operators import fuzzy as fz

    # distinct texts sharing a dominant phrase: fanout probe ~1.0
    # (gate declines), hot trigrams present
    rows = [Row(sid=i, addr=f"{i} main street apt {i % 7}") for i in range(1, 61)]
    source = spark.createDataFrame(rows, "sid int, addr string")
    target = spark.createDataFrame(
        [Row(tid=i, addr=f"{i} main street apt {i % 7}") for i in range(1, 41)],
        "tid int, addr string",
    )
    kw = dict(column="addr", source_id="sid", target_id="tid", threshold=0.5)

    explicit_auto = {
        (r.sid, r.matched_tid, r.similarity)
        for r in top1_fuzzy_match(
            source, target, collapse_exact=False, max_trigram_freq="auto", **kw
        ).collect()
    }
    uncapped = {
        (r.sid, r.matched_tid, r.similarity)
        for r in top1_fuzzy_match(
            source, target, collapse_exact=False, max_trigram_freq=0, **kw
        ).collect()
    }

    monkeypatch.setattr(fz, "HAZARD_EST_PAIRS", 0)
    guarded = {
        (r.sid, r.matched_tid, r.similarity)
        for r in top1_fuzzy_match(source, target, **kw).collect()
    }
    assert guarded == explicit_auto

    monkeypatch.setattr(fz, "HAZARD_EST_PAIRS", 10**15)
    unguarded = {
        (r.sid, r.matched_tid, r.similarity)
        for r in top1_fuzzy_match(source, target, **kw).collect()
    }
    assert unguarded == uncapped
    assert len(unguarded) > 0
