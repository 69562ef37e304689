"""DedupPlan — self-merge deduplication with invariants (M9–M12).

Reference semantics (lib/voter_file/dedup_driver.rb): source == target;
the match cascade finds duplicate pairs; a merge-orientation constraint
picks the survivor (default `$T < $S` on the pk — lowest pk survives,
dedup_driver.rb:53-63); invariant gates abort before any destructive
write (dedup_driver.rb:23-28 → merge_audit_sql.rb:21-36):
  M11 reflexive: no row is its own duplicate;
  M12 symmetric: no row is both a duplicate and a merge target.
Then duplicates are deleted and their values folded into survivors
(merge_duplicates_sql, dedup_driver.rb:65-82).

Spark-first design: matching reuses MatchPlan's single-plan cascade
with the orientation constraint folded into every rule; the
delete+fold is recomputed functionally:
  survivors   = rows that are someone's _target_id → updated via merge exprs
  duplicates  = rows with _target_id set → dropped
  untouched   = everything else
result = untouched ∪ updated-survivors, one declarative plan.

Deviation (documented): with several duplicates folding into one
survivor the reference's single UPDATE picks an arbitrary dup row; we
deterministically fold the duplicate with the lowest pk (SURVEY §7
hard-part 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from voter_gateway_spark.plans.matching import MatchPlan, MatchRule, SOURCE_ID, TARGET_ID
from voter_gateway_spark.schema import render_expr


class MergeInvariantError(RuntimeError):
    pass


class DedupPlan:
    def __init__(self, table: DataFrame, pk: str, orientation: str = "$T < $S"):
        """`orientation` is a $S/$T template on the pk column choosing
        the survivor; the default keeps the lowest pk
        (dedup_driver.rb:57-63)."""
        self.table = table
        self.pk = pk
        self.orientation = orientation
        self.match = MatchPlan(source=table, target=table, target_pk=pk, source_id=pk)
        self.merge_exprs: dict[str, str] = {}  # col -> $T/$S fold template

    def find_duplicates(self, *column_groups: list[str], **kw) -> MatchRule:
        rule = self.match.find_exact_matches(*column_groups, **kw)
        # orientation constraint ANDed into every rule (apply_merge_orientation)
        rule.constraints.append((self.pk, self.orientation))
        return rule

    def merge_column_as(self, col: str, template: str) -> "DedupPlan":
        self.merge_exprs[col] = template
        return self

    # -- invariants (M11/M12) --------------------------------------------------

    def invariant_counts(self, matches: DataFrame) -> tuple[int, int]:
        """(reflexive, symmetric) violation counts — the audit form of
        the invariants (merge_audit_sql.rb:21-36 counts, no abort)."""
        reflexive = matches.where(F.col(TARGET_ID) == F.col(f"`{self.pk}`")).count()
        m = matches.where(F.col(TARGET_ID).isNotNull())
        a, b = m.alias("a"), m.alias("b")
        symmetric = (
            a.join(b, F.expr(f"a.{TARGET_ID} = b.`{self.pk}`"))
            .where(F.expr(f"b.{TARGET_ID} IS NOT NULL"))
            .count()
        )
        return reflexive, symmetric

    def check_invariants(self, matches: DataFrame) -> None:
        reflexive, symmetric = self.invariant_counts(matches)
        if reflexive:
            raise MergeInvariantError(f"{reflexive} reflexive merge(s): row would merge into itself")
        if symmetric:
            raise MergeInvariantError(f"{symmetric} symmetric merge(s): row is both duplicate and survivor")

    # -- execution -------------------------------------------------------------

    def execute(self, check: bool = True) -> DataFrame:
        """Run the dedup; returns the post-merge table state."""
        matches = self.match.matches()
        if check:
            # invariants run before the destructive fold (fail-fast gate);
            # cache because we take three actions over the match state
            matches = matches.cache()
            self.check_invariants(matches)

        dup = matches.where(F.col(TARGET_ID).isNotNull())
        tgt_cols = self.table.columns

        if self.merge_exprs:
            # deterministic fold: lowest-pk duplicate per survivor
            w = Window.partitionBy(TARGET_ID).orderBy(F.col(f"`{self.pk}`").asc())
            best_dup = (
                dup.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(
                    F.col(TARGET_ID).alias("_dup_of"),
                    *[F.col(f"`{c}`").alias(f"_s_{c}") for c in tgt_cols],
                )
            )
        else:
            best_dup = dup.select(F.col(TARGET_ID).alias("_dup_of")).dropDuplicates(["_dup_of"])

        dup_ids = dup.select(F.col(f"`{self.pk}`").alias("_dup_pk")).dropDuplicates(["_dup_pk"])

        # drop duplicate rows (anti join), then fold values into survivors
        kept = self.table.join(
            dup_ids, F.col(f"`{self.pk}`") == F.col("_dup_pk"), "left_anti"
        )
        folded = kept.join(
            best_dup, F.col(f"`{self.pk}`") == F.col("_dup_of"), "left"
        )
        out_exprs = []
        for c in tgt_cols:
            if c in self.merge_exprs:
                new_val = render_expr(self.merge_exprs[c], source=f"_s_{c}", target=c)
                out_exprs.append(
                    F.when(F.col("_dup_of").isNotNull(), new_val)
                    .otherwise(F.col(f"`{c}`"))
                    .alias(c)
                )
            else:
                out_exprs.append(F.col(f"`{c}`").alias(c))
        return folded.select(*out_exprs)

    def audit(self) -> DataFrame:
        """Dry-run: per-rule duplicate counts (dedup_audit.rb intent)."""
        matches = self.match.matches()
        return (
            matches.where(F.col(TARGET_ID).isNotNull())
            .groupBy("_match_rule")
            .agg(F.count("*").alias("duplicates"))
            .orderBy("_match_rule")
        )
