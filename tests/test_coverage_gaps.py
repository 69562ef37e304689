"""Tests for API surface the coverage map claims but no other test
exercised directly: merge move/insert-expr routing and insert
constraints (M3/M5), the DedupJob lifecycle, the extension registry
error path (F4), audit primitives (A1/A5), and bucketed-sink
shuffle-freeness (the SCALING.md co-location claim).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark import audit
from voter_gateway_spark.functions.registry import load_extension
from voter_gateway_spark.jobs import DedupJob
from voter_gateway_spark.plans import DedupPlan, MatchPlan, MergePlan
from voter_gateway_spark.sources.sinks import write_bucketed


def test_merge_move_insert_expr_and_insert_constraint(spark):
    """M3 move_columns (target's own old value lands in the new column),
    M5 insert_column_as (insert-branch-only literal), and the
    source-only insert constraint (record_merger.rb:111-116)."""
    target = spark.createDataFrame(
        [Row(id=1, name="OLD", prev_name=None, tag="keep")],
        "id int, name string, prev_name string, tag string",
    )
    source = spark.createDataFrame(
        [
            Row(id=1, name="NEW", prev_name=None, tag=None),      # matches → update
            Row(id=9, name="INS", prev_name=None, tag=None),      # unmatched → insert
            Row(id=None, name="SKIP", prev_name=None, tag=None),  # fails insert constraint
        ],
        "id int, name string, prev_name string, tag string",
    )
    mp = MatchPlan(source, target, target_pk="id", source_id="name")
    mp.find_exact_matches(["id"])
    matches = mp.matches()
    plan = (
        MergePlan(target_pk="id")
        .move_columns({"name": "prev_name"})
        .insert_column_as("tag", "'awkward'")
        .constrain_insert("$S.id IS NOT NULL")
    )
    res = plan.execute(matches, target)
    rows = {r.name: r for r in res.target.collect()}
    # matched row: prev_name received the TARGET's old name value
    assert rows["NEW"].prev_name == "OLD"
    # insert branch: tag literal applied; constrained row dropped
    assert rows["INS"].tag == "awkward"
    assert "SKIP" not in rows
    assert len(rows) == 2


def test_dedup_job_lifecycle(spark):
    """DedupJob template: job() runs with a GatewaySession, cleanup is
    guaranteed, and the dedup plan folds duplicates."""

    class T(DedupJob):
        def job(self, gw):
            df = spark.createDataFrame(
                [(1, "a"), (2, "a"), (3, "b")], "id bigint, k string"
            )
            gw.register(df, "t_dedup_job_src")
            plan = DedupPlan(df, pk="id")
            plan.find_duplicates(["k"])
            return plan.execute()

    out = T(spark).perform()
    assert {r.id for r in out.collect()} == {1, 3}
    # cleanup dropped the working view
    assert not spark.catalog.tableExists("t_dedup_job_src")


def test_extension_registry_paths(spark):
    """F4: known extensions build Column exprs; unknown names raise
    NameError (csv_driver.rb:170-175)."""
    fn = load_extension("is_email_address_valid")
    df = spark.createDataFrame([("a@b.co",), ("nope",)], "email string")
    got = {r.email: r.ok for r in df.select("email", fn(F.col("email")).alias("ok")).collect()}
    assert got["a@b.co"] is True and got["nope"] is False
    try:
        load_extension("no_such_extension")
        raise AssertionError("expected NameError")
    except NameError:
        pass


def test_audit_primitives(spark):
    """A1 row_count and A5 grouped boolean distribution."""
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    assert audit.row_count(df) == 3
    dist = {
        r.flag: r["count"]
        for r in audit.grouped_flag_distribution(df, F.col("v").isNull()).collect()
    }
    assert dist == {True: 1, False: 2}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """SCALING.md claim: equi-joins across tables bucketed on the join
    key need no exchange on either side."""
    a = spark.range(1000).withColumnRenamed("id", "k").withColumn("x", F.col("k") * 2)
    b = spark.range(1000).withColumnRenamed("id", "k").withColumn("y", F.col("k") + 1)
    write_bucketed(a, "t_bucket_a", ["k"], 4)
    write_bucketed(b, "t_bucket_b", ["k"], 4)
    joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("simple")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_dedup_window_lowering_matches_join_cascade(spark):
    """The join-free window lowering must reproduce the self-join
    cascade exactly — including NULL group columns (never match under
    SQL '=') and multi-rule priority."""
    from voter_gateway_spark.plans.dedup import DedupPlan
    from pyspark.sql import Row

    rows = [
        Row(id=1, a="x", b="p", v=10),
        Row(id=2, a="x", b="q", v=20),   # rule1 dup of 1? (a only) — rule-dependent
        Row(id=3, a="x", b="p", v=30),   # rule2 dup of 1 on (a,b)
        Row(id=4, a=None, b="p", v=40),  # NULL a: no rule1/rule2 match
        Row(id=5, a=None, b="p", v=50),  # NULL a groups must NOT merge
        Row(id=6, a="y", b=None, v=60),  # NULL b: rule2 ineligible
        Row(id=7, a="y", b="r", v=70),   # rule1 dup of 6 on (a)
    ]
    df = spark.createDataFrame(rows, "id bigint, a string, b string, v bigint")

    def build():
        p = DedupPlan(df, pk="id")
        p.find_duplicates(["a", "b"])   # rule 1: (a, b)
        p.find_duplicates(["a"])        # rule 2: (a) — lower priority
        p.merge_column_as("v", "$T + $S")
        return p

    lowered = build()
    assert lowered._window_lowerable()
    via_window = lowered._window_matches()
    via_join = lowered.match.matches()
    key = lambda frame: sorted(
        (r.id, r._target_id, r._match_rule) for r in frame.collect()
    )
    assert key(via_window) == key(via_join)

    # a non-lowerable shape (extra raw_condition) falls back to the join
    p2 = DedupPlan(df, pk="id")
    p2.find_duplicates(["a"], raw_condition="s.v < t.v + 100")
    assert not p2._window_lowerable()

    # end-to-end result parity (fold + drop)
    out = build().execute()
    r = {x.id: x.v for x in out.collect()}
    # group (a=x): min 1 survives; ids 2 (rule2) and 3 (rule1) dropped;
    # lowest-pk duplicate (2) folds: v = 10 + 20
    # group (a=y): 6 survives, 7 dropped and folds: v = 60 + 70
    # NULL-a rows never merge
    assert r == {1: 30, 4: 40, 5: 50, 6: 130}
