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
