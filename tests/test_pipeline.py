"""CurationPipeline: run/audit lifecycle (the Job template's dry-run
pattern applied to corpus curation)."""

import pytest

from voter_gateway_spark.pipeline import CurationPipeline, StageCount


def test_counts_plan_matches_stagewise_runs(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    stages = [
        ("non_empty", lambda df: df.where(F.length("text") > 0)),
        ("lang_en", lambda df: df.where(F.col("lang") == "en")),
        ("dedup", lambda df: df.dropDuplicates(["text"])),
    ]
    pipe = CurationPipeline(stages)
    audit = pipe.audit(docs)
    assert [a.stage for a in audit] == ["input", "non_empty", "lang_en", "dedup"]
    # audit counts equal independently-computed stage-by-stage counts
    cur = docs
    expected = [StageCount("input", docs.count())]
    for name, fn in stages:
        cur = fn(cur)
        expected.append(StageCount(name, cur.count()))
    assert audit == expected
    # counts monotonically non-increasing (filters only)
    rows = [a.rows for a in audit]
    assert rows == sorted(rows, reverse=True)
    # run() output count == last audit row
    assert pipe.run(docs).count() == audit[-1].rows


def test_pipeline_rejects_bad_stage_lists(spark):
    with pytest.raises(ValueError):
        CurationPipeline([])
    with pytest.raises(ValueError):
        CurationPipeline([("a", lambda d: d), ("a", lambda d: d)])
