"""Profiling / audit aggregations (A1–A8).

Reference: csv_audit.rb, database_audit.rb, merge_audit.rb,
dedup_audit.rb — row counts, per-column coverage %, key uniqueness,
top-k value distributions, per-rule match counts, formatted reports.

Spark-first: coverage for ALL columns is computed in ONE aggregation
pass (the reference issues one query per column,
database_audit.rb:19-26 — at 100 TB that is N full scans vs our 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_count(df: DataFrame) -> int:
    """A1."""
    return df.count()


def coverage_exprs(cols: list[str]) -> list:
    """A2 nonblank predicate per column: NOT NULL AND trim(cast) <> ''
    (csv_audit.rb:113-117)."""
    return [
        F.count(
            F.when(
                F.col(f"`{c}`").isNotNull()
                & (F.trim(F.col(f"`{c}`").cast("string")) != ""),
                1,
            )
        ).alias(c)
        for c in cols
    ]


def column_coverage(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A2: one row per column: covered count + percent. Single scan."""
    cols = cols or df.columns
    agg = df.agg(F.count(F.lit(1)).alias("_total"), *coverage_exprs(cols))
    # unpivot to (column, covered, total, percent)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return (
        agg.selectExpr("_total", f"stack({len(cols)}, {stack_expr}) as (column, covered)")
        .select(
            "column",
            "covered",
            F.col("_total").alias("total"),
            F.round(F.col("covered") * 100.0 / F.col("_total"), 2).alias("percent"),
        )
    )


def key_is_unique(df: DataFrame, key: str | list[str]) -> bool:
    """A3: SELECT key, COUNT(*) GROUP BY key HAVING COUNT(*)>1 LIMIT 1."""
    keys = [key] if isinstance(key, str) else key
    dupes = df.groupBy(*keys).count().where(F.col("count") > 1).limit(1)
    return len(dupes.take(1)) == 0


def value_distribution(df: DataFrame, column: str, limit: int | None = None) -> DataFrame:
    """A4: value → count, descending (top-k when limited,
    database_audit.rb:85-96)."""
    out = (
        df.groupBy(F.col(f"`{column}`").alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc_nulls_last("value"))
    )
    return out.limit(limit) if limit else out


def grouped_flag_distribution(df: DataFrame, expr, alias: str = "flag") -> DataFrame:
    """A5: GROUP BY a computed boolean (database_audit.rb:75-83)."""
    return df.groupBy(expr.alias(alias)).agg(F.count(F.lit(1)).alias("count"))


def match_rule_counts(matches: DataFrame) -> DataFrame:
    """A6: per-rule match counts from the tagged cascade output."""
    return (
        matches.groupBy("_match_rule")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.asc_nulls_last("_match_rule"))
    )


@dataclass
class MergeAuditResult:
    """A8 (merge_audit.rb:36-49): totals + per-rule counts and rates."""

    total: int
    matched: int
    per_rule: dict[int, int] = field(default_factory=dict)

    @property
    def match_rate(self) -> float:
        return (self.matched / self.total * 100.0) if self.total else 0.0

    def __str__(self) -> str:
        lines = [
            f"total records: {self.total}",
            f"matched:       {self.matched} ({self.match_rate:.2f}%)",
        ]
        for rule, n in sorted(self.per_rule.items()):
            rate = n / self.total * 100.0 if self.total else 0.0
            lines.append(f"  rule {rule}: {n} ({rate:.2f}%)")
        return "\n".join(lines)


def merge_audit(matches: DataFrame) -> MergeAuditResult:
    """Dry-run match audit: run the cascade, count, write nothing
    (merge_audit.rb:13-34)."""
    rows = (
        matches.groupBy("_match_rule").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total = sum(r["n"] for r in rows)
    per_rule = {r["_match_rule"]: r["n"] for r in rows if r["_match_rule"] is not None}
    return MergeAuditResult(total=total, matched=sum(per_rule.values()), per_rule=per_rule)
