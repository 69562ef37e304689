"""pipeline_corpus_build capstone: stagewise-count routing invariants
over the composite's own frames, and build-twice determinism of the
materialized shards + dataset card (everything downstream of the
certified report is a pure function of the input corpus)."""

import json

import pytest
from pyspark.sql import functions as F

from voter_gateway_spark.pipeline import build_corpus
from voter_gateway_spark.queries import (
    TEMPERATURE_MIXTURE_TARGET,
    _corpus_build_parts,
    _temperature_rates,
    pipeline_corpus_build,
)


@pytest.fixture(scope="module")
def parts(spark, sf_dir):
    return _corpus_build_parts(spark, sf_dir)


class TestStagewiseRouting:
    def test_gate_attrition_monotone(self, spark, sf_dir):
        rows = pipeline_corpus_build(spark, sf_dir).collect()
        by_stage = {}
        for r in rows:
            if r["split"] == "*":
                by_stage[r["stage_idx"]] = by_stage.get(r["stage_idx"], 0) + r["n_docs"]
        # gate stages 0..5 never grow
        for i in range(1, 6):
            assert by_stage[i] <= by_stage[i - 1], (i, by_stage)

    def test_split_partitions_survivors_exactly(self, parts):
        stages, sp, _, _ = parts
        surv = stages["near_dedup"].count()
        per_split = {r["split"]: r["n"] for r in sp.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert sum(per_split.values()) == surv
        assert set(per_split) <= {"train", "val", "test"}

    def test_split_is_cluster_atomic(self, parts):
        # every component maps to exactly one split
        _, sp, _, _ = parts
        multi = (
            sp.groupBy("component")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
        )
        assert multi.count() == 0

    def test_mixture_subset_of_train(self, parts):
        _, sp, selected, _ = parts
        train_ids = {r["doc_id"] for r in sp.where("split = 'train'").select("doc_id").collect()}
        sel_ids = {r["doc_id"] for r in selected.select("doc_id").collect()}
        assert sel_ids <= train_ids
        assert len(sel_ids) > 0

    def test_mixture_rates_match_shared_helper(self, spark, parts):
        _, sp, selected, _ = parts
        per = (
            sp.where("split = 'train'")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        )
        rates = {r["source"]: r["rate"] for r in _temperature_rates(per, TEMPERATURE_MIXTURE_TARGET).collect()}
        # rate 1.0 sources must be fully admitted
        full = [s for s, rt in rates.items() if rt >= 1.0]
        if full:
            n_train = {r["source"]: r["n"] for r in sp.where("split = 'train'").groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
            n_sel = {r["source"]: r["n"] for r in selected.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
            for s in full:
                assert n_sel.get(s, 0) == n_train[s], s

    def test_packing_covers_selection(self, parts):
        _, _, selected, packed = parts
        assert packed.count() == selected.count()
        # offsets strictly ordered by doc_id, spans consistent
        rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["token_offset"] == off
            assert r["seq_start"] == off // 512
            off += r["n_tokens"]


class TestBuildDeterminism:
    def test_build_twice_identical_card_and_shards(self, spark, sf_dir, tmp_path):
        a = build_corpus(spark, sf_dir, str(tmp_path / "a"), n_shards=4)
        b = build_corpus(spark, sf_dir, str(tmp_path / "b"), n_shards=4)
        assert a == b
        assert a["version"] == 2
        assert a["shards"]["total_rows"] == sum(
            int(v) for v in a["shards"]["shard_rows"].values()
        )
        # card on disk round-trips to the returned dict
        card = json.loads((tmp_path / "a" / "dataset_card.json").read_text())
        assert card == a
        # shard contents identical row-for-row (deterministic (shard,
        # pos) addresses), not just counts
        ra = spark.read.parquet(str(tmp_path / "a" / "shards")).collect()
        rb = spark.read.parquet(str(tmp_path / "b" / "shards")).collect()
        assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))

    def test_build_computes_parts_exactly_once(
        self, spark, sf_dir, tmp_path, monkeypatch
    ):
        # The gate funnel (pair generation, component iterations,
        # checkpoints) is the expensive half of the build; the r11
        # runner ran it twice — once for the shards, once inside
        # pipeline_corpus_build for the ledger. The ledger must now
        # come from the same parts the shards shipped from.
        import voter_gateway_spark.queries as q

        calls = []
        real = q._corpus_build_parts

        def counting(spark_, sf_dir_):
            calls.append(sf_dir_)
            return real(spark_, sf_dir_)

        monkeypatch.setattr(q, "_corpus_build_parts", counting)
        card = build_corpus(spark, sf_dir, str(tmp_path / "once"), n_shards=2)
        assert calls == [sf_dir]
        assert card["stages"]

    def test_card_stages_match_certified_report(self, spark, sf_dir, tmp_path):
        card = build_corpus(spark, sf_dir, str(tmp_path / "c"), n_shards=2)
        report = {
            (r["stage_idx"], r["split"], r["source"]): (r["n_docs"], r["n_tokens"])
            for r in pipeline_corpus_build(spark, sf_dir).collect()
        }
        for row in card["stages"]:
            key = (row["stage_idx"], row["split"], row["source"])
            assert report[key] == (row["n_docs"], row["n_tokens"]), key
        assert len(card["stages"]) == len(report)
        # shard total == mixture-selected doc count
        sel = sum(
            row["n_docs"] for row in card["stages"] if row["stage"] == "mixture"
        )
        assert card["shards"]["total_rows"] == sel
