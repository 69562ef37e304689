"""Paragraph-granularity exact dedup (operators/paragraphs.py) and the
perplexity-gated curation composite (queries.pipeline_quality_gate)."""

import pytest
from pyspark.sql import functions as F

from voter_gateway_spark.operators import paragraphs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestParagraphScrub:
    def test_survivor_and_order_preservation(self, spark):
        # doc 1 owns segments A B C; doc 2 repeats B between its own
        # segments — the repeat (and only the repeat) is removed, and
        # doc 2's survivors keep their original relative order
        rows = [
            (1, "a1 a2 a3 b1 b2 b3 c1 c2 c3"),
            (2, "x1 x2 x3 b1 b2 b3 y1 y2 y3"),
        ]
        out = {
            r["doc_id"]: r
            for r in paragraphs.paragraph_scrub(
                _docs(spark, rows), seg_words=3
            ).collect()
        }
        assert out[1]["clean_text"] == "a1 a2 a3 b1 b2 b3 c1 c2 c3"
        assert out[1]["n_removed"] == 0
        assert out[2]["clean_text"] == "x1 x2 x3 y1 y2 y3"
        assert out[2]["n_removed"] == 1
        assert out[2]["n_segments"] == 3

    def test_first_occurrence_survives_within_doc(self, spark):
        # the same segment twice in ONE doc: first position survives
        rows = [(7, "p q r z z z p q r")]
        row = paragraphs.paragraph_scrub(_docs(spark, rows), seg_words=3).collect()[0]
        assert row["clean_text"] == "p q r z z z"
        assert row["n_removed"] == 1

    def test_one_row_per_input_including_empty(self, spark):
        rows = [(1, "w1 w2 w3"), (2, ""), (3, None), (4, "   ")]
        out = paragraphs.paragraph_scrub(_docs(spark, rows), seg_words=3)
        got = {r["doc_id"]: r for r in out.collect()}
        assert set(got) == {1, 2, 3, 4}
        for d in (2, 3, 4):
            assert got[d]["clean_text"] == ""
            assert got[d]["n_segments"] == 0
            assert got[d]["n_removed"] == 0

    def test_survivor_is_global_min_doc_position(self, spark):
        # three copies across docs: only the (lowest doc, lowest idx)
        # occurrence survives
        rows = [(3, "dup dup dup"), (1, "dup dup dup"), (2, "dup dup dup")]
        out = paragraphs.paragraph_scrub(_docs(spark, rows), seg_words=3)
        kept = {r["doc_id"]: r["n_removed"] for r in out.collect()}
        assert kept == {1: 0, 2: 1, 3: 1}

    def test_ragged_tail_segment(self, spark):
        # 4 words at seg_words=3 -> segments 'a b c' and 'd'
        rows = [(1, "a b c d"), (2, "d")]
        out = {
            r["doc_id"]: r
            for r in paragraphs.paragraph_scrub(
                _docs(spark, rows), seg_words=3
            ).collect()
        }
        assert out[1]["n_segments"] == 2 and out[1]["n_removed"] == 0
        # doc 2's single-word text equals doc 1's tail segment -> dup
        assert out[2]["n_removed"] == 1 and out[2]["clean_text"] == ""


class TestParagraphDupMass:
    def test_mass_by_group(self, spark):
        df = spark.createDataFrame(
            [
                (1, "s", "a1 a2 a3 b1 b2 b3"),
                (2, "s", "a1 a2 a3 c1 c2 c3"),
                (3, "t", "b1 b2 b3"),
                (4, "t", ""),
            ],
            "doc_id int, source string, text string",
        )
        out = {
            r["group"]: r
            for r in paragraphs.paragraph_dup_mass(df, seg_words=3).collect()
        }
        assert out["s"]["n_docs"] == 2
        assert out["s"]["n_segments"] == 4
        assert out["s"]["n_dup_segments"] == 1  # doc 2's 'a1 a2 a3'
        assert out["t"]["n_docs"] == 2
        assert out["t"]["n_segments"] == 1
        assert out["t"]["n_dup_segments"] == 1  # doc 3 repeats doc 1's seg
        assert out["t"]["dup_ratio"] == 1.0

    def test_consistency_with_scrub(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scrub = paragraphs.paragraph_scrub(docs).agg(
            F.sum("n_segments").alias("s"), F.sum("n_removed").alias("r")
        ).collect()[0]
        mass = paragraphs.paragraph_dup_mass(docs).agg(
            F.sum("n_segments").alias("s"), F.sum("n_dup_segments").alias("r")
        ).collect()[0]
        assert (scrub["s"], scrub["r"]) == (mass["s"], mass["r"])


class TestQualityGate:
    @pytest.fixture(scope="class")
    def gate_dir(self, spark, tmp_path_factory):
        """Fixture corpus with one doc engineered to fail each stage."""
        base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        clean = (
            "the table and row scan of a fast merge that have with value "
            * 5
        ).strip()
        extra = [
            # passes everything (enough words, stopwords, clean)
            (90001, clean + " alpha one", "en", "srcA", 1),
            # exact duplicate of 90001's text -> dropped at exact_dedup
            (90002, clean + " alpha one", "en", "srcA", 1),
            # mojibake -> dropped at encoding stage
            (90003, clean + " beta â€ two", "en", "srcB", 1),
            # too short -> dropped at gopher
            (90004, "tiny text", "en", "srcB", 1),
        ]
        extra_df = spark.createDataFrame(
            extra, "doc_id int, text string, lang string, source string, n_chars int"
        )
        out = tmp_path_factory.mktemp("gate") / "docs"
        base.unionByName(extra_df).write.mode("overwrite").parquet(
            str(out / "documents.parquet")
        )
        return str(out)

    def test_stagewise_counts(self, spark, gate_dir):
        import voter_gateway_spark.queries as Q

        rows = Q.pipeline_quality_gate(spark, gate_dir).collect()
        per_stage = {}
        for r in rows:
            per_stage.setdefault((r["stage_idx"], r["stage"]), 0)
            per_stage[(r["stage_idx"], r["stage"])] += r["n_docs"]
        counts = {k[1]: v for k, v in per_stage.items()}
        # monotone funnel
        order = [
            "input",
            "gopher",
            "lm_logprob",
            "encoding",
            "exact_dedup",
            "near_dedup",
        ]
        vals = [counts[s] for s in order]
        assert vals == sorted(vals, reverse=True)
        assert {k[0] for k in per_stage} == set(range(6))
        # the engineered failures actually drop where intended
        by_doc = self._survivor_sets(spark, gate_dir)
        assert 90004 in by_doc["input"] and 90004 not in by_doc["gopher"]
        assert 90003 in by_doc["lm_logprob"] and 90003 not in by_doc["encoding"]
        s1, s2 = 90001 in by_doc["exact_dedup"], 90002 in by_doc["exact_dedup"]
        assert (
            90001 in by_doc["encoding"] and 90002 in by_doc["encoding"]
        ), "both copies reach exact dedup"
        assert s1 and not s2, "min-id copy survives exact dedup"

    def _survivor_sets(self, spark, gate_dir):
        import voter_gateway_spark.queries as Q

        stages = Q._quality_gate_stages(spark, gate_dir)
        return {name: {r["doc_id"] for r in df.select("doc_id").collect()}
                for name, df in stages.items()}

    def test_oracle_parity_on_fixture(self, spark):
        """Spark vs DuckDB on the real sf0.001 fixture — the same
        comparison the driver runs at sf0.01."""
        import duckdb

        import voter_gateway_spark.queries as Q

        sf = "/root/testdata/sf0.001"
        got = {
            (r["stage_idx"], r["source"]): (r["n_docs"], r["n_tokens"])
            for r in Q.pipeline_quality_gate(spark, sf).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = {
            (int(s), src): (int(nd), int(nt))
            for s, _, src, nd, nt in con.sql(
                Q.ORACLES["pipeline_quality_gate"]
            ).fetchall()
        }
        assert got == want


class TestPlanShape:
    def test_paragraph_scrub_no_allpairs_no_single_partition(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            paragraphs.paragraph_scrub(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # linear contract: segment-keyed aggregate + join-back + one
        # doc-keyed reassembly; an all-pairs regression shows up as
        # CartesianProduct, a global-sort one as SinglePartition
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SinglePartition" not in plan

    def test_quality_gate_no_allpairs(self, spark):
        import voter_gateway_spark.queries as Q

        plan = (
            Q.pipeline_quality_gate(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestLateR10Queries:
    def test_temperature_mixture_sqrt_weighting(self, spark, tmp_path):
        import voter_gateway_spark.queries as Q

        rows = [(i, "t", "en", "small" if i < 100 else "big", 1)
                for i in range(500)]
        df = spark.createDataFrame(
            rows, "doc_id int, text string, lang string, source string, n_chars int"
        )
        d = tmp_path / "mix"
        df.write.parquet(str(d / "documents.parquet"))
        out = {r["source"]: r for r in
               Q.sample_temperature_mixture(spark, str(d)).collect()}
        # sqrt scaling: shares 0.2/0.8 -> weight ratio 1:2, not 1:4
        ratio = out["big"]["weight"] / out["small"]["weight"]
        assert abs(ratio - 2.0) < 1e-4
        assert abs(out["small"]["weight"] + out["big"]["weight"] - 1.0) < 1e-5
        for r in out.values():
            assert 0 < r["rate"] <= 1.0
            assert 0 <= r["n_selected"] <= r["n_docs"]

    def test_temperature_mixture_rate_caps_at_one(self, spark, tmp_path):
        import voter_gateway_spark.queries as Q

        # one 2-doc source among big ones: its sqrt-quota exceeds its
        # size, so the rate caps at 1.0 and every doc is selected
        rows = [(i, "t", "en", "tiny" if i < 2 else "rest", 1)
                for i in range(1000)]
        df = spark.createDataFrame(
            rows, "doc_id int, text string, lang string, source string, n_chars int"
        )
        d = tmp_path / "cap"
        df.write.parquet(str(d / "documents.parquet"))
        out = {r["source"]: r for r in
               Q.sample_temperature_mixture(spark, str(d)).collect()}
        assert out["tiny"]["rate"] == 1.0
        assert out["tiny"]["n_selected"] == out["tiny"]["n_docs"] == 2

    def test_perplexity_buckets_partition_scored_docs(self, spark):
        import voter_gateway_spark.queries as Q

        sf = "/root/testdata/sf0.001"
        buckets = Q.text_perplexity_buckets(spark, sf).collect()
        n_scored = Q.text_trigram_logprob(spark, sf).count()
        assert sum(r["n_docs"] for r in buckets) == n_scored
        assert {r["ppl_bucket"] for r in buckets} <= {"head", "middle", "tail"}
        by_bucket = {}
        for r in buckets:
            t, n = by_bucket.get(r["ppl_bucket"], (0.0, 0))
            by_bucket[r["ppl_bucket"]] = (t + r["avg_logprob"] * r["n_docs"], n + r["n_docs"])
        means = {b: t / n for b, (t, n) in by_bucket.items()}
        assert means["head"] > means["middle"] > means["tail"]


class TestParagraphProperties:
    def test_all_unique_segments_reconstruct_normalized_text(self, spark):
        # globally unique words -> unique segments -> nothing removed
        # and reassembly reproduces the normalized lowercase stream
        rows = [
            (i, " ".join(f"w{i}_{j}" for j in range(n)))
            for i, n in [(1, 7), (2, 3), (3, 1), (4, 12)]
        ]
        out = {r["doc_id"]: r for r in
               paragraphs.paragraph_scrub(_docs(spark, rows), seg_words=3).collect()}
        for i, text in rows:
            assert out[i]["n_removed"] == 0
            assert out[i]["clean_text"] == text
