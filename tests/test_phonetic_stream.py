"""Phonetic streaming admission: the Soundex-style key
(functions/registry.phonetic_key) plugged into the SAME pluggable
matcher hook as FS admission (streaming/linkage_admission.py) — no new
streaming code, pure configuration: the prepare projections STAGE the
phonetic key per record, the blocking rules join on it, and a binary
g_phon gamma carries the sounds-alike evidence. Pins that a misspelled
re-registration (vowel-rotated surname — invisible to the exact-name
rule) links to its registry row, including one inserted by an earlier
micro-batch (read-your-own-writes)."""

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.functions.registry import phonetic_key
from voter_gateway_spark.plans import MergePlan
from voter_gateway_spark.plans.linkage import FieldWeights
from voter_gateway_spark.streaming.linkage_admission import (
    fs_registry_matcher,
    stream_fs_admission,
)
from voter_gateway_spark.streaming.upsert_sink import bootstrap_target

SCHEMA = "voter_id long, surname string, nation int, seg string"

RULES = [
    [("s_phon", "t_phon"), ("s_nation", "t_nation")],
    [("s_nation", "t_nation"), ("s_seg", "t_seg")],
]
GAMMAS = {
    "g_exact": ("s_surname", "t_surname"),
    "g_phon": ("s_phon", "t_phon"),
    "g_seg": ("s_seg", "t_seg"),
}
WEIGHTS = {
    # phon agree +5.01 / disagree -5.01; exact agree +9.1 / disagree
    # -1.15; seg agree +2.09 / disagree -1.41. A vowel-rotated true
    # pair (phon+seg agree, exact disagree) scores 5.95 >= 4; a
    # different-sounding same-nation-same-seg pair scores -4.07.
    "g_exact": FieldWeights(m=0.55, u=0.001),
    "g_phon": FieldWeights(m=0.97, u=0.03),
    "g_seg": FieldWeights(m=0.85, u=0.2),
}
THRESHOLD = 4.0


def _prep_src(df):
    return df.select(
        F.col("voter_id").alias("_fs_src_id"),
        F.col("surname").alias("s_surname"),
        phonetic_key(F.col("surname")).alias("s_phon"),
        F.col("nation").alias("s_nation"),
        F.col("seg").alias("s_seg"),
    )


def _prep_tgt(df):
    return df.select(
        "voter_id",
        F.col("surname").alias("t_surname"),
        phonetic_key(F.col("surname")).alias("t_phon"),
        F.col("nation").alias("t_nation"),
        F.col("seg").alias("t_seg"),
    )


def _registry(spark):
    return spark.createDataFrame(
        [
            Row(voter_id=1, surname="dafegi", nation=1, seg="A"),
            Row(voter_id=2, surname="maneru", nation=1, seg="B"),
            Row(voter_id=3, surname="lokubo", nation=2, seg="A"),
        ],
        SCHEMA,
    )


def _matcher():
    return fs_registry_matcher(
        source_pk="voter_id", target_pk="voter_id",
        prepare_source=_prep_src, prepare_target=_prep_tgt,
        rules=RULES, gammas=GAMMAS, weights=WEIGHTS, threshold=THRESHOLD,
    )


BATCH1 = [
    # vowel-rotated 'dafegi' -> phonetic block to registry 1, links
    {"voter_id": 901, "surname": "defigo", "nation": 1, "seg": "A"},
    # different sound, same (nation, seg) as registry 2 -> recall
    # block only, scores below threshold -> insert
    {"voter_id": 902, "surname": "pirufe", "nation": 1, "seg": "B"},
    # no block anywhere -> insert
    {"voter_id": 903, "surname": "nekuda", "nation": 7, "seg": "Z"},
]
BATCH2 = [
    # misspelling (doubled consonant + vowel swap) of the surname
    # batch 1 INSERTED -> must link to 902's row (read-your-own-writes)
    {"voter_id": 904, "surname": "pirrufi", "nation": 1, "seg": "B"},
]


def test_phonetic_matches_shape_and_decisions(spark):
    batch = spark.createDataFrame([Row(**r) for r in BATCH1], SCHEMA)
    got = {
        r.voter_id: (r._target_id, r._match_rule)
        for r in _matcher()(batch, _registry(spark)).collect()
    }
    assert got[901] == (1, 1)         # sounds-alike links
    assert got[902] == (None, None)   # recall block, below threshold
    assert got[903] == (None, None)   # blocked out entirely


def test_phonetic_stream_folds_equal_sequential_batches(spark, tmp_path):
    target_dir = str(tmp_path / "registry")
    bootstrap_target(spark, target_dir, _registry(spark))

    src_dir = tmp_path / "arrivals"
    src_dir.mkdir()
    for i, rows in enumerate([BATCH1, BATCH2], start=1):
        p = src_dir / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    writer = stream_fs_admission(
        stream, target_dir, pk="voter_id",
        prepare_source=_prep_src, prepare_target=_prep_tgt,
        rules=RULES, gammas=GAMMAS, weights=WEIGHTS, threshold=THRESHOLD,
    )
    q = writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(180)
    q.stop()

    streamed = sorted(
        tuple(r) for r in spark.read.parquet(target_dir).collect()
    )
    seq = _registry(spark)
    for rows in [BATCH1, BATCH2]:
        batch = spark.createDataFrame([Row(**r) for r in rows], SCHEMA)
        matches = _matcher()(batch, seq)
        seq = MergePlan(target_pk="voter_id").execute(matches, seq).target
    assert streamed == sorted(tuple(r) for r in seq.collect())

    by_id = {t[0]: t for t in streamed}
    # 901 updated registry 1's row (seg already A, surname overwritten)
    assert by_id[1][1] == "defigo"
    # 902 inserted, then batch 2's phonetic misspelling UPDATED it
    assert by_id[902][1] == "pirrufi"
    assert set(by_id) == {1, 2, 3, 902, 903}
