"""Behavioral tests for the time-alignment relational operators:
as-of join (union-marker/window plan), banded interval join, and
deterministic hash-mod sampling."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.operators.relational import (
    as_of_join,
    hash_mod_sample,
    interval_join,
)


def test_as_of_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=5), Row(k=1, t=10), Row(k=1, t=2), Row(k=2, t=7)],
        "k int, t int",
    )
    right = spark.createDataFrame(
        [Row(k=1, rt=3, px=30), Row(k=1, rt=10, px=100), Row(k=2, rt=9, px=90)],
        "k int, rt int, px int",
    )
    out = {(r.k, r.t): r.px for r in as_of_join(left, right, "k", "t", "rt").collect()}
    assert out[(1, 5)] == 30     # latest rt <= 5 is 3
    assert out[(1, 10)] == 100   # equal timestamps match (inclusive)
    assert out[(1, 2)] is None   # no prior right row
    assert out[(2, 7)] is None   # right row is later


def test_as_of_join_rejects_column_clash(spark):
    df = spark.createDataFrame([Row(k=1, t=1, px=1)], "k int, t int, px int")
    with pytest.raises(ValueError, match="collide"):
        as_of_join(df, df.select("k", F.col("t").alias("rt"), "px"), "k", "t", "rt")


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=t) for t in (5, 10, 15, 25, 31, 50)], "k int, t int"
    )
    right = spark.createDataFrame(
        [Row(k=1, rt=10, v="a"), Row(k=1, rt=20, v="b"), Row(k=1, rt=40, v="c")],
        "k int, rt int, v string",
    )
    return left, right


def _asof_map(df):
    return {r.t: r.v for r in df.collect()}


def test_as_of_join_forward(spark):
    left, right = _asof_fixture(spark)
    got = _asof_map(as_of_join(left, right, "k", "t", "rt", direction="forward"))
    assert got == {5: "a", 10: "a", 15: "b", 25: "c", 31: "c", 50: None}


def test_as_of_join_nearest_ties_backward(spark):
    left, right = _asof_fixture(spark)
    got = _asof_map(as_of_join(left, right, "k", "t", "rt", direction="nearest"))
    # 15 is 5 from both 10 and 20 -> backward tie-break picks 'a';
    # 31 is 9 from 40 vs 11 from 20 -> 'c'
    assert got == {5: "a", 10: "a", 15: "a", 25: "b", 31: "c", 50: "c"}


def test_as_of_join_tolerance(spark):
    left, right = _asof_fixture(spark)
    back = _asof_map(
        as_of_join(left, right, "k", "t", "rt", tolerance=5)
    )
    assert back == {5: None, 10: "a", 15: "a", 25: "b", 31: None, 50: None}
    near = _asof_map(
        as_of_join(left, right, "k", "t", "rt", direction="nearest", tolerance=5)
    )
    assert near == {5: "a", 10: "a", 15: "a", 25: "b", 31: None, 50: None}


def test_as_of_join_rejects_unknown_direction(spark):
    left, right = _asof_fixture(spark)
    with pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, "k", "t", "rt", direction="sideways")


def test_as_of_join_null_left_time_never_matches(spark):
    """Regression (r7 code review): a NULL left timestamp must match
    nothing in EVERY direction — the descending forward scan orders
    NULLs last, where they would otherwise spuriously see the earliest
    right row."""
    left = spark.createDataFrame([Row(k=1, t=None)], "k int, t int")
    right = spark.createDataFrame(
        [Row(k=1, rt=10, v="a"), Row(k=1, rt=20, v="b")], "k int, rt int, v string"
    )
    for direction in ("backward", "forward", "nearest"):
        rows = as_of_join(left, right, "k", "t", "rt", direction=direction).collect()
        assert rows[0].v is None, direction


def test_as_of_join_null_payload_value_is_still_the_match(spark):
    """A matched right row whose payload VALUE is NULL is still the
    match (the whole row travels in the struct) — nearest must not fall
    through to a farther row with a non-null value."""
    left = spark.createDataFrame([Row(k=1, t=100)], "k int, t int")
    right = spark.createDataFrame(
        [Row(k=1, rt=95, v=None), Row(k=1, rt=120, v=7)], "k int, rt int, v int"
    )
    got = as_of_join(left, right, "k", "t", "rt", direction="nearest").collect()[0]
    assert got.v is None  # the 95 row (delta 5) wins over 120 (delta 20)


def test_interval_join_inclusive_and_bucket_spanning(spark):
    points = spark.createDataFrame(
        [Row(k=1, t=0), Row(k=1, t=10), Row(k=1, t=25), Row(k=2, t=10)],
        "k int, t int",
    )
    intervals = spark.createDataFrame(
        # [10, 25] spans three width-10 buckets; bounds inclusive
        [Row(k=1, s=10, e=25, iv="a")],
        "k int, s int, e int, iv string",
    )
    out = interval_join(
        points, intervals, on="k", point_time="t", start="s", end="e",
        bucket_width=10, time_unit_expr=lambda c: c,
    )
    got = sorted((r.t, r.iv) for r in out.collect())
    assert got == [(10, "a"), (25, "a")]  # t=0 out, k=2 never joins


def test_interval_join_plan_is_equi_join(spark):
    points = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("t")
    )
    intervals = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("s"),
        (F.col("id") * 5 + 20).alias("e"),
    )
    out = interval_join(
        points, intervals, "k", "t", "s", "e", bucket_width=10,
        time_unit_expr=lambda c: c,
    )
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hash_mod_sample_deterministic_and_consistent(spark):
    a = spark.range(1000).select(F.col("id").alias("k"))
    kept1 = {r.k for r in hash_mod_sample(a, "k", 20).collect()}
    kept2 = {r.k for r in hash_mod_sample(a, "k", 20).collect()}
    assert kept1 == kept2
    assert 100 < len(kept1) < 300  # ~20%
    # consistency across tables sharing the key
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    kept_b = {r.k for r in hash_mod_sample(b, "k", 20).collect()}
    assert kept_b == kept1
    # nested: a 10% carve is a subset of the 20% carve
    kept10 = {r.k for r in hash_mod_sample(a, "k", 10).collect()}
    assert kept10 <= kept1


def test_token_frequencies_doc_count(spark):
    from voter_gateway_spark.operators.text import token_frequencies

    df = spark.createDataFrame(
        [Row(id=1, text="apple apple pear"), Row(id=2, text="apple fig")],
        "id bigint, text string",
    )
    out = {r.token: (r["count"], r.doc_count)
           for r in token_frequencies(df, "text", id_col="id").collect()}
    # doc_count is distinct docs, NOT occurrences (regression: a row id
    # synthesized in the same projection as the explode gave every
    # token its own doc)
    assert out["apple"] == (3, 2)
    assert out["pear"] == (1, 1)
    assert out["fig"] == (1, 1)
    # synthesized-id path must agree
    out2 = {r.token: (r["count"], r.doc_count)
            for r in token_frequencies(df, "text").collect()}
    assert out2 == out
