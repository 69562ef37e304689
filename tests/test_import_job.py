"""End-to-end ImportJob walkthrough — the reference README scenario
(README.md:69-131): load a messy voter CSV, map/type columns, cascade-
match against the master table (state_file_id, then county_file_id +
name), upsert with column routing, report per-rule match counts.
"""

from pyspark.sql import Row

from voter_gateway_spark.audit import merge_audit
from voter_gateway_spark.jobs import ImportJob
from voter_gateway_spark.plans import MatchPlan, MergePlan, WorkingFrame
from voter_gateway_spark.sources import CSVSource


class VoterImportJob(ImportJob):
    def __init__(self, spark, csv_path, target):
        super().__init__(spark)
        self.csv_path = csv_path
        self.target = target

    def job(self, gw):
        raw = CSVSource(self.csv_path, quote="^").read(gw.spark)
        staged = (
            WorkingFrame(raw)
            .map_column("state_file_id", type="TEXT")
            .map_column("county_file_id", type="TEXT")
            .map_column("first_name", as_expr="upper($S)")
            .map_column("last_name", as_expr="upper($S)")
            .map_column("phone", type="TEXT")
            .map_column("registered_at", type="DATE", safe=True)
            .constrain_column("state_file_id", "$S IS NOT NULL OR TRUE")
        ).build()

        mp = MatchPlan(staged, self.target, target_pk="id", source_id=None)
        mp.find_exact_matches(["state_file_id"])
        mp.find_exact_matches(["county_file_id", "last_name"])
        matches = mp.matches().cache()
        audit = merge_audit(matches)

        plan = (
            MergePlan(target_pk="id")
            .exclude_column("phone")          # never overwritten
            .merge_column_as("first_name", "coalesce($S, $T)")
        )
        res = plan.execute(matches, self.target)
        return res.target, audit


def test_voter_import_walkthrough(spark, tmp_path):
    csv = tmp_path / "voters.csv"
    csv.write_text(
        "state_file_id,county_file_id,first_name,last_name,phone,registered_at\n"
        "S1,C9,June,Doe,555-0001,2014-03-01\n"        # matches rule 1
        ",C2,Jack,Smith,555-0002,2015-01-01\n"         # matches rule 2
        "S9,C9,New,Person,555-0003,bad-date\n"         # no match → insert
    )
    target = spark.createDataFrame(
        [
            Row(id=1, state_file_id="S1", county_file_id="CX", first_name=None,
                last_name="DOE", phone="old-1"),
            Row(id=2, state_file_id="SX", county_file_id="C2", first_name="JACKIE",
                last_name="SMITH", phone="old-2"),
        ],
        "id int, state_file_id string, county_file_id string, first_name string, "
        "last_name string, phone string",
    )
    merged, audit = VoterImportJob(spark, str(csv), target).perform()
    rows = {r.id: r for r in merged.where("id IS NOT NULL").collect()}

    assert audit.total == 3 and audit.matched == 2
    assert audit.per_rule == {1: 1, 2: 1}
    # rule 1 match: first_name filled via coalesce($S,$T), phone preserved
    assert rows[1].first_name == "JUNE" and rows[1].phone == "old-1"
    # rule 2 match: coalesce keeps incoming JACK
    assert rows[2].first_name == "JACK" and rows[2].phone == "old-2"
    # unmatched row inserted (id NULL — no id generation configured)
    inserted = merged.where("id IS NULL").collect()
    assert len(inserted) == 1 and inserted[0].last_name == "PERSON"
    assert inserted[0].phone is None  # excluded column never copied


def test_fuzzy_wired_into_match_cascade(spark):
    """FuzzyMerger contract: exact rules run first and their targets
    leave the fuzzy pool; fuzzy rounds fill TARGET_ID on the remaining
    sources (MATCH_RULE numbered after the exact rules); the combined
    match state feeds MergePlan.execute unchanged."""
    source = spark.createDataFrame(
        [
            Row(sid=1, key="K1", name="jonathan smith", bal=10),
            Row(sid=2, key=None, name="elizabeth jones", bal=20),
            Row(sid=3, key=None, name="zzzz qqqq vvvv", bal=30),
        ],
        "sid int, key string, name string, bal int",
    )
    target = spark.createDataFrame(
        [
            Row(id=100, key="K1", name="jonathan smith", bal=1),
            Row(id=200, key=None, name="elizabeth joness", bal=2),
        ],
        "id int, key string, name string, bal int",
    )
    mp = MatchPlan(source, target, target_pk="id", source_id="sid")
    mp.find_exact_matches(["key"])
    mp.fuzzy_match_column("name")
    matches = mp.matches()
    got = {r.sid: (r._target_id, r._match_rule) for r in matches.collect()}
    # sid=1 exact on key (rule 1); sid=2 fuzzy on name (rule 2 = after
    # the 1 exact rule); sid=3 no match anywhere.
    # target 100 left the fuzzy pool after the exact claim: sid=2 can
    # only fuzzy-match target 200.
    assert got[1] == (100, 1)
    assert got[2] == (200, 2)
    assert got[3] == (None, None)

    res = MergePlan(target_pk="id").merge_column_as("bal", "$T + $S").execute(
        matches, target
    )
    rows = {r.id: r for r in res.target.where("id IS NOT NULL").collect()}
    assert rows[100].bal == 11 and rows[200].bal == 22
    inserted = res.target.where("id IS NULL").collect()
    assert len(inserted) == 1 and inserted[0].name == "zzzz qqqq vvvv"


def test_fuzzy_only_match_plan_no_exact_rules(spark):
    """Fuzzy columns work with zero exact rules (the no-pair-frames
    branch must still route through the claiming rounds)."""
    source = spark.createDataFrame(
        [Row(sid=1, name="aaaa bbbb cccc")], "sid int, name string"
    )
    target = spark.createDataFrame(
        [Row(id=9, name="aaaa bbbb cccd")], "id int, name string"
    )
    mp = MatchPlan(source, target, target_pk="id", source_id="sid")
    mp.fuzzy_match_column("name")
    got = mp.matches().collect()[0]
    assert got._target_id == 9 and got._match_rule == 1
