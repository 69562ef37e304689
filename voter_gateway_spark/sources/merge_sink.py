"""Storage-layer MERGE fast path (M8 at the sink).

The functional merge (plans/merging.py) recomputes the whole target as
one plan — correct everywhere, but at 100 TB it rewrites the untouched
99% of the table. Transactional table formats (Delta Lake / Iceberg)
expose MERGE INTO, which rewrites only the files containing matched
rows. This module lowers the SAME MergePlan DSL (column routing, $S/$T
merge expressions, insert expressions, update/insert-only modes) to a
Delta MERGE, so a pipeline can switch sinks without changing its plan.

The lowering (`lower_merge`) is pure string templating — testable
without Delta; `merge_into_delta` executes it and is gated on the
`delta` package (not bundled in every environment; see SCALING.md
"MERGE at the storage layer" for the decision record).

Reference analog: record_merger.rb:59-95 update/insert SQL — the same
split Delta's whenMatchedUpdate / whenNotMatchedInsert encodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from voter_gateway_spark.plans.matching import SOURCE_ID, TARGET_ID
from voter_gateway_spark.schema import lower_source_row_template, render_template


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def lower_merge(
    plan,
    source_cols: list[str],
    target_cols: list[str],
    source_alias: str = "s",
    target_alias: str = "t",
) -> tuple[str, dict[str, str] | None, dict[str, str] | None]:
    """Lower a MergePlan to MERGE INTO clauses.

    Returns (condition, update_map, insert_map) where the maps are
    {target_column: SQL expression string} — update_map is None under
    insert_only, insert_map None under update_only. Routing is identical
    to MergePlan.execute: excluded/preserved columns skip the update,
    moved-to columns take the target's own moved-from value, merge
    templates bind $S/$T, preserved columns still insert.
    """
    s, t = source_alias, target_alias
    pk = plan.target_pk
    condition = f"{t}.`{pk}` = {s}.`{TARGET_ID}`"

    update_map: dict[str, str] | None = None
    if not plan.insert_only:
        upd_cols = set(plan.update_columns(source_cols, target_cols))
        update_map = {}
        for c in target_cols:
            if c in plan.moved.values():
                src_of_move = [o for o, n in plan.moved.items() if n == c][0]
                update_map[c] = f"{t}.`{src_of_move}`"
            elif c in plan.merge_exprs:
                update_map[c] = render_template(
                    plan.merge_exprs[c], source=f"{s}.{c}", target=f"{t}.{c}"
                )
            elif c in upd_cols:
                update_map[c] = f"{s}.`{c}`"
            # else: column untouched by the update (MERGE leaves it)

    insert_map: dict[str, str] | None = None
    if not plan.update_only:
        ins_cols = set(plan.insert_columns(source_cols, target_cols))
        insert_map = {}
        for c in target_cols:
            if c in plan.insert_exprs:
                insert_map[c] = render_template(plan.insert_exprs[c], source=f"{s}.{c}")
            elif c in ins_cols:
                insert_map[c] = f"{s}.`{c}`"
            # else: omitted → NULL on insert

    return condition, update_map, insert_map


def merge_into_delta(
    spark: SparkSession,
    target_path: str,
    matches: DataFrame,
    plan,
) -> None:
    """Execute a MergePlan as Delta MERGE INTO against `target_path`.

    `matches` is MatchPlan.matches() output (source cols +
    _source_id/_target_id). Multiple sources per target are pre-deduped
    to the lowest _source_id (MERGE errors on ambiguous matches; this is
    also MergePlan.execute's deterministic pick).
    return_value_to_source has no MERGE analog — read the merged table
    and join back, as the functional path does.
    """
    if not delta_available():
        raise RuntimeError(
            "delta-spark is not installed; use MergePlan.execute (functional "
            "rewrite) or add the delta package to enable the MERGE sink"
        )
    from delta.tables import DeltaTable

    if plan.returned:
        raise ValueError("return_value_to_source is not expressible in MERGE INTO")

    # window ONLY the matched subset: partitioning by a nullable
    # _target_id would funnel every unmatched row (the bulk of a fresh
    # load) through the single NULL partition to compute a row_number
    # the filter then ignores — the same split MergePlan.execute uses
    matched = matches.where(F.col(TARGET_ID).isNotNull())
    unmatched = matches.where(F.col(TARGET_ID).isNull())
    w = Window.partitionBy(TARGET_ID).orderBy(F.col(SOURCE_ID).asc())
    deduped = (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .unionByName(unmatched)
    )
    for template in plan.insert_constraints:
        deduped = deduped.where(
            F.col(TARGET_ID).isNotNull()
            | F.expr(lower_source_row_template(template))
        )

    target = DeltaTable.forPath(spark, target_path)
    target_cols = target.toDF().columns
    meta = {SOURCE_ID, TARGET_ID, "_match_rule"}
    source_cols = [c for c in matches.columns if c not in meta]
    condition, update_map, insert_map = lower_merge(plan, source_cols, target_cols)

    builder = target.alias("t").merge(deduped.alias("s"), condition)
    if update_map is not None:
        builder = builder.whenMatchedUpdate(set=update_map)
    if insert_map is not None:
        builder = builder.whenNotMatchedInsert(values=insert_map)
    builder.execute()
