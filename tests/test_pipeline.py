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


def _bucket_split(component: int) -> str:
    import hashlib

    b = int(hashlib.md5(str(component).encode()).hexdigest()[:15], 16) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_daily_ingest_state_handoff_and_admission(spark, tmp_path):
    """Crafted two-batch fixture for pipeline_daily_ingest, built so
    every near-dup decision is DETERMINISTIC (texts are either
    identical — jaccard 1.0, always banded together — or share zero
    words — jaccard 0, verified away even on a band fluke). Pins the
    state handoff the composite exists to prove:
      - day-2 doc duplicating a DAY-1 ADMISSION is rejected (admission
        runs against the updated corpus, not the genesis corpus);
      - day-2 doc duplicating the genesis corpus is rejected;
      - batch-internal exact dups are BOTH admitted (admission is
        against the corpus only) and then clustered together;
      - cluster/split rollup equals the pure-python full recompute."""
    from voter_gateway_spark.queries import QUERIES

    def words(tag, n=8):
        return " ".join(f"{tag}w{i}" for i in range(n))

    T = {i: words(f"corpus{i}") for i in range(1, 6)}
    N1, N2, N3 = words("newday1a"), words("newday1b"), words("newday2a")
    rows = (
        [(i, T[i], "en" if i % 2 else "de", "s1") for i in range(1, 6)]
        + [
            (301, T[1], "en", "s2"),   # dup of corpus -> rejected
            (302, N1, "en", "s2"),     # admitted
            (303, N2, "de", "s2"),     # admitted (pair with 304)
            (304, N2, "de", "s2"),     # batch-internal dup -> admitted too
            (401, N1, "en", "s3"),     # dup of DAY-1 ADMISSION -> rejected
            (402, T[2], "de", "s3"),   # dup of genesis corpus -> rejected
            (403, N3, "en", "s3"),     # admitted (pair with 404)
            (404, N3, "en", "s3"),     # batch-internal dup -> admitted too
        ]
    )
    df = spark.createDataFrame(
        [(i, t, la, s, len(t)) for i, t, la, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = str(tmp_path / "daily")
    import os

    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {
        (r.split, r.lang): (r.n_docs, r.n_clusters)
        for r in QUERIES["pipeline_daily_ingest"](spark, sf).collect()
    }
    # full recompute in python: admitted final set + components
    final = {1: "en", 2: "de", 3: "en", 4: "de", 5: "en",
             302: "en", 303: "de", 304: "de", 403: "en", 404: "en"}
    comp = {i: i for i in final}
    comp[304] = 303
    comp[404] = 403
    exp: dict = {}
    for d, la in final.items():
        key = (_bucket_split(comp[d]), la)
        n, cl = exp.get(key, (0, set()))
        cl = cl | {comp[d]} if isinstance(cl, set) else cl
        exp[key] = (n + 1, cl)
    exp = {k: (n, len(cl)) for k, (n, cl) in exp.items()}
    assert got == exp
