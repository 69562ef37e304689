"""URL/domain-layer curation (operators/domains.py): registrable-
domain extraction edge cases, rollup correctness on a hand-built
corpus, admission semantics for both the literal-isin and the
broadcast-join paths, and the plan shape (broadcast, no corpus
shuffle from admission)."""

import pytest
from pyspark.sql import functions as F

from voter_gateway_spark.operators import domains


def _urls(spark, rows):
    return spark.createDataFrame(rows, "id bigint, url string")


class TestRegistrableDomain:
    @pytest.mark.parametrize(
        "url,expected",
        [
            ("https://example.com/path", "example.com"),
            ("https://news.example.co.uk/a?b=1", "example.co.uk"),
            ("http://CDN.Sample.COM.AU:8080/x", "sample.com.au"),
            ("https://user@media.sample.co.jp/p/1", "sample.co.jp"),
            ("https://a.b.c.d.example.org", "example.org"),
            ("ftp://files.example.net/f", "example.net"),
            ("https://localhost/x", "localhost"),  # single label
            ("https://co.uk/", "co.uk"),  # bare suffix: 2 labels, kept
            ("not a url at all", None),
            ("", None),
            (None, None),
        ],
    )
    def test_extraction(self, spark, url, expected):
        df = _urls(spark, [(1, url)])
        got = df.select(
            domains.registrable_domain("url").alias("d")
        ).first()["d"]
        assert got == expected

    def test_host_strips_port_and_userinfo(self, spark):
        df = _urls(spark, [(1, "https://u:p@Host.Example.COM:9443/q#f")])
        assert (
            df.select(domains.host_of("url").alias("h")).first()["h"]
            == "host.example.com"
        )


class TestDomainRollup:
    def test_handbuilt_counts(self, spark):
        rows = [
            (1, "https://a.example.com/1", "the cat sat"),
            (2, "https://b.example.com/2", "the cat sat"),  # exact dup of 1
            (3, "https://x.other.org/3", "something else entirely here"),
            (4, "https://y.other.org/4", "unique text four"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
        out = {
            r["domain"]: r
            for r in domains.domain_rollup(df, "url", "text", "doc_id").collect()
        }
        assert out["example.com"]["n_docs"] == 2
        # both copies of the duplicated text count as dup rows
        assert out["example.com"]["n_exact_dup_rows"] == 2
        assert out["example.com"]["dup_ratio"] == 1.0
        assert out["other.org"]["n_docs"] == 2
        assert out["other.org"]["n_exact_dup_rows"] == 0
        assert out["other.org"]["n_tokens"] == 4 + 3

    def test_cross_domain_dup_counts_on_both(self, spark):
        rows = [
            (1, "https://a.one.com/", "mirrored body"),
            (2, "https://b.two.com/", "mirrored body"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
        out = {
            r["domain"]: r["n_exact_dup_rows"]
            for r in domains.domain_rollup(df).collect()
        }
        assert out == {"one.com": 1, "two.com": 1}


class TestDomainAdmission:
    ROWS = [
        (1, "https://keep.example.com/"),
        (2, "https://news.example.co.uk/"),  # blocked below
        (3, "garbage"),  # unparseable -> rejected
        (4, "https://docs.sample.io/"),
    ]

    def test_literal_blocklist_isin_path(self, spark):
        df = _urls(spark, self.ROWS)
        out = domains.domain_admission(
            df, "url", blocklist=["example.co.uk"]
        )
        assert {r["id"] for r in out.collect()} == {1, 4}
        assert "domain" in out.columns
        # literal path must be a pure filter: no join in the plan
        assert "Join" not in out._jdf.queryExecution().toString()

    def test_dataframe_blocklist_broadcast_anti(self, spark):
        df = _urls(spark, self.ROWS)
        block = spark.createDataFrame([("example.co.uk",)], "domain string")
        out = domains.domain_admission(df, "url", blocklist=block)
        assert {r["id"] for r in out.collect()} == {1, 4}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_allowlist_semi_join(self, spark):
        df = _urls(spark, self.ROWS)
        allow = spark.createDataFrame([("sample.io",)], "domain string")
        out = domains.domain_admission(df, "url", allowlist=allow)
        assert [r["id"] for r in out.collect()] == [4]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_allow_then_block_compose(self, spark):
        df = _urls(spark, self.ROWS)
        out = domains.domain_admission(
            df,
            "url",
            allowlist=["example.com", "example.co.uk"],
            blocklist=["example.co.uk"],
        )
        assert [r["id"] for r in out.collect()] == [1]

    def test_domain_out_none_drops_column(self, spark):
        df = _urls(spark, self.ROWS)
        out = domains.domain_admission(df, "url", domain_out=None)
        assert out.columns == ["id", "url"]

    def test_domain_mixture_invariants(self, spark, sf_dir):
        # domain-level temperature mixture: weights normalize, the
        # admission never exceeds the domain's mass, full-rate domains
        # admit everything, and the sqrt temperature up-weights small
        # domains (rate monotone non-increasing in domain size)
        from voter_gateway_spark.queries import sample_domain_mixture

        rows = sample_domain_mixture(spark, sf_dir).collect()
        assert len(rows) > 1
        assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert 0 < r["rate"] <= 1.0
            assert 0 <= r["n_selected"] <= r["n_docs"]
            if r["rate"] == 1.0:
                assert r["n_selected"] == r["n_docs"]
        by_size = sorted(rows, key=lambda r: r["n_docs"])
        rates = [r["rate"] for r in by_size]
        assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:]))

    def test_reserved_staging_column_rejected(self, spark):
        df = _urls(spark, self.ROWS).withColumn("_vgs_domain", F.lit("x"))
        with pytest.raises(ValueError, match="_vgs_domain"):
            domains.domain_admission(df, "url")

    def test_domain_out_collision_rejected(self, spark):
        # withColumnRenamed would otherwise leave TWO 'domain' columns
        df = _urls(spark, self.ROWS).withColumn("domain", F.lit("pre"))
        with pytest.raises(ValueError, match="domain_out='domain'"):
            domains.domain_admission(df, "url")
        # a non-colliding output name (or dropping it) is fine
        out = domains.domain_admission(df, "url", domain_out="reg_domain")
        assert out.columns.count("domain") == 1
        assert "reg_domain" in out.columns
