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
