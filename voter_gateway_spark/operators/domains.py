"""URL/domain-layer curation — the CCNet/RefinedWeb-style front gate
that runs BEFORE text-level quality scoring in a crawl pipeline:
extract each document's registrable domain from its URL, roll the
corpus up per domain (volume, token mass, quality, exact-dup mass),
and admit/reject documents against domain block/allow lists.

Public basis: CCNet (Wenzek et al. 2020) buckets by URL/domain for
dedup + LM filtering; RefinedWeb (Penedo et al. 2023) applies URL
blocklists as its first filter stage. The reference's analogue is the
per-table coverage/value-distribution audit family (csv_audit.rb) and
the ingest-boundary row filtering (csv_driver.rb) — this module lifts
both to the domain key a web corpus is naturally organized by.

Registrable-domain extraction is deliberately NAIVE-TLD: the host is
taken by one scan-stage regexp, and the registrable domain is the last
two labels — or the last three when the last two are in a small
embedded multi-part public-suffix set (co.uk, com.au, ...). A real
deployment would swap in the full Public Suffix List; the shape of the
plan (pure scan-stage expressions, zero UDFs, zero joins) is the point
here, and the embedded set is documented, deterministic, and mirrored
verbatim in the DuckDB oracles.

Scale shape (100 TB): host + domain are scan-stage projections fused
into whole-stage codegen; the rollup is ONE domain-keyed aggregation
(map-side combining; domain cardinality is web-scale-bounded, tens of
millions, far below doc count) plus one fingerprint-keyed window for
the corpus-wide exact-dup flag; list admission is a scan-stage
isin for literal lists or a broadcast semi/anti join for table-backed
lists — the corpus is never shuffled by the admission step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from voter_gateway_spark.operators import text

# scheme://[userinfo@]host[:port]/... — capture group 1 = host.
# RE2-compatible (no backrefs/lookaround) so the DuckDB oracle runs
# the IDENTICAL pattern.
HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

# Embedded multi-part public-suffix subset (naive-TLD by design; see
# module docstring). Sorted, lowercase, two labels each.
MULTI_SUFFIXES = [
    "ac.uk",
    "co.in",
    "co.jp",
    "co.uk",
    "com.au",
    "com.br",
    "com.cn",
    "gov.uk",
    "net.au",
    "org.uk",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def host_of(url_col: Column | str) -> Column:
    """Lowercased host part of a URL (port/userinfo/path stripped) —
    one scan-stage regexp_extract; NULL for NULL or non-URL input."""
    h = F.regexp_extract(F.lower(_c(url_col)), HOST_RE, 1)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def registrable_domain(url_col: Column | str) -> Column:
    """Naive-TLD registrable domain of a URL: last two host labels,
    or last three when the last two form an embedded multi-part
    suffix (MULTI_SUFFIXES). Scan-stage only — split + try_element_at
    + a literal IN; no UDF, no join, ANSI-safe on short hosts."""
    host = host_of(url_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    l1 = F.try_element_at(labels, F.lit(-1))
    l2 = F.try_element_at(labels, F.lit(-2))
    l3 = F.try_element_at(labels, F.lit(-3))
    last2 = F.concat_ws(".", l2, l1)
    last3 = F.concat_ws(".", l3, l2, l1)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when((n >= 3) & last2.isin(MULTI_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain corpus report card: (domain, n_docs, n_tokens,
    mean_quality, n_exact_dup_rows, dup_ratio) — the domain analogue
    of text_quality_by_source + corpus_dedup_report's exact-dup half,
    i.e. the table a curation run reads before writing a blocklist.

    n_exact_dup_rows counts rows whose normalized fingerprint appears
    on MORE THAN ONE row corpus-wide (so a domain mirroring content
    hosted elsewhere shows the dup mass even if unique within itself).

    Plan: scan stage computes domain + quality + token count; one
    fingerprint-keyed count window (single shuffle on the fingerprint,
    the same shape corpus_dedup_report uses); one domain-keyed agg.
    """
    norm_fp = F.md5(
        F.lower(
            F.trim(F.regexp_replace(_c(text_col), r"\s+", " "))
        ).cast("binary")
    )
    base = df.select(
        _c(id_col),
        registrable_domain(url_col).alias("domain"),
        text.token_count(text_col).cast("bigint").alias("_toks"),
        text.quality_score(text_col).alias("_q"),
        norm_fp.alias("_f"),
    )
    sized = base.withColumn(
        "_c", F.count(F.lit(1)).over(Window.partitionBy("_f"))
    )
    return sized.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_toks").cast("bigint").alias("n_tokens"),
        F.round(F.avg("_q"), 6).alias("mean_quality"),
        F.sum((F.col("_c") > 1).cast("int"))
        .cast("bigint")
        .alias("n_exact_dup_rows"),
        F.round(
            F.sum((F.col("_c") > 1).cast("int")) / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


def domain_admission(
    df: DataFrame,
    url_col: str = "url",
    blocklist: DataFrame | list[str] | None = None,
    allowlist: DataFrame | list[str] | None = None,
    domain_out: str | None = "domain",
) -> DataFrame:
    """Admit rows whose registrable domain is outside `blocklist` and
    (when given) inside `allowlist`. Exactly one of the two list kinds
    may use each slot; passing both applies allow-then-block.

    Literal lists become scan-stage isin predicates (no join at all);
    DataFrame lists (one string column named `domain`) become a
    BROADCAST semi/anti join — the corpus side is never shuffled.
    Rows whose domain is NULL (unparseable URL) are REJECTED, the
    conservative crawl-pipeline convention, and identically under
    both the isin and the join path.

    `domain_out`: name for the extracted-domain column kept on the
    output (None drops it). Input columns named `_vgs_domain` (the
    staging temporary — withColumn would silently overwrite it) or
    matching `domain_out` (withColumnRenamed would leave TWO columns
    of that name, ambiguous downstream) are rejected up front, the
    same reserved-name contract as streaming.quality_filter's
    payload guard.
    """
    clash = sorted(
        c
        for c in df.columns
        if c == "_vgs_domain" or (domain_out is not None and c == domain_out)
    )
    if clash:
        raise ValueError(
            "domain_admission: input columns %s collide with the "
            "staging/output domain column (reserved: ['_vgs_domain', "
            "domain_out=%r]); rename them or pick another domain_out"
            % (clash, domain_out)
        )
    dom = registrable_domain(url_col)
    out = df.withColumn("_vgs_domain", dom).where(
        F.col("_vgs_domain").isNotNull()
    )
    if allowlist is not None:
        if isinstance(allowlist, DataFrame):
            out = out.join(
                F.broadcast(
                    allowlist.select(F.col("domain").alias("_vgs_domain"))
                ),
                "_vgs_domain",
                "semi",
            )
        else:
            out = out.where(F.col("_vgs_domain").isin(list(allowlist)))
    if blocklist is not None:
        if isinstance(blocklist, DataFrame):
            out = out.join(
                F.broadcast(
                    blocklist.select(F.col("domain").alias("_vgs_domain"))
                ),
                "_vgs_domain",
                "anti",
            )
        else:
            out = out.where(~F.col("_vgs_domain").isin(list(blocklist)))
    if domain_out is None:
        return out.drop("_vgs_domain")
    return out.withColumnRenamed("_vgs_domain", domain_out)
