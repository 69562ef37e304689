"""WorkingFrame — declarative staging transforms (P1–P7, S8–S9).

Reference parity: `WorkingTable` accumulates mapped/added columns,
constraints and a group-by expression, then renders one
`INSERT INTO ... SELECT converters FROM src WHERE ... GROUP BY ...`
(lib/voter_file/csv_driver/working_table.rb:23-46, :129-176). Here the
same declarations lower to a single lazy DataFrame plan — Catalyst gets
the whole select/filter/window tree and can push filters into the scan.

Deviation (documented): the reference's `group_records_by` renders a raw
GROUP BY over non-aggregated converters, which Postgres only accepts in
degenerate cases; the well-defined intent is "collapse duplicate source
rows, keep one" (SURVEY §2.2 P6). We implement deterministic keep-one:
row_number() over the group key ordered by all projected columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from voter_gateway_spark.schema import ColumnSpec, Constraint, render_expr


class WorkingFrame:
    """Builder: declare output columns from a source DataFrame, then
    `build()` one declarative plan."""

    def __init__(self, source: DataFrame, name: str | None = None):
        self.source = source
        self.name = name
        self._columns: list[ColumnSpec] = []
        self._constraints: list[Constraint] = []
        self._group_by: str | None = None
        self._default_all = False

    # -- DSL (mirrors reference working_table.rb DSL) -------------------------

    def map_column(
        self,
        name: str,
        from_col: str | None = None,
        type: str = "TEXT",
        as_expr: str | None = None,
        safe: bool = False,
    ) -> "WorkingFrame":
        """P1/P2: declare an output column converted from a source column.
        `as_expr` is a SQL template over $S (e.g. ``"$S + 1"``,
        ``"lower($S)"``); default converter is CAST($S AS type),
        TRY_CAST when `safe` (NULL on malformed input)."""
        self._columns.append(
            ColumnSpec(name=name, type=type, source=from_col or name, as_expr=as_expr, safe=safe)
        )
        return self

    def map_literal(self, name: str, value, type: str = "TEXT") -> "WorkingFrame":
        """P3 literal mapping (reference csv_file.rb:113-125 literal case)."""
        if value is None:
            lit_sql = "NULL"
        elif isinstance(value, str):
            # backslashes FIRST: Spark SQL string literals process
            # backslash escapes by default ('C:\new' reads as C + LF +
            # 'ew', and a trailing backslash escapes the closing quote
            # — a ParseException at build() time)
            escaped = value.replace("\\", "\\\\").replace("'", "''")
            lit_sql = "'" + escaped + "'"
        else:
            lit_sql = repr(value)
        spec = ColumnSpec(name=name, type=type, source="__lit__")
        spec.as_expr = f"CAST({lit_sql} AS {spec.spark_type})"
        self._columns.append(spec)
        return self

    def map_column_py(
        self, name: str, fn, from_col: str | None = None, type: str = "TEXT"
    ) -> "WorkingFrame":
        """P3/F5 escape hatch: arbitrary Python converter, the analog of
        the reference's per-column `Proc(row)` (csv_file.rb:93-99).

        Runs as an Arrow-optimized Python UDF (batched Arrow transfer) —
        still the slow path vs native exprs; use only for true closures.
        """
        spec = ColumnSpec(name=name, type=type, source=from_col or name)
        conv = F.udf(fn, spec.spark_type, useArrow=True)
        self._py_columns = getattr(self, "_py_columns", [])
        self._py_columns.append((name, spec.source, conv))
        self._columns.append(spec)  # placeholder keeps declared order
        return self

    def add_column(self, name: str, type: str = "TEXT") -> "WorkingFrame":
        """P4: append a typed, data-less column."""
        self._columns.append(ColumnSpec(name=name, type=type, source=None))
        return self

    def constrain_column(self, column: str, template: str) -> "WorkingFrame":
        """P5: conjunctive predicate template over $S."""
        self._constraints.append(Constraint(column=column, template=template))
        return self

    def group_records_by(self, expr: str) -> "WorkingFrame":
        """P6: collapse duplicate source rows by a key expression."""
        self._group_by = expr
        return self

    # -- lowering -------------------------------------------------------------

    def build(self) -> DataFrame:
        """Lower declarations to one DataFrame plan (S9 insert-select)."""
        df = self.source
        if self._constraints:
            pred = reduce(
                Column.__and__, (c.predicate() for c in self._constraints)
            )
            df = df.where(pred)
        if self._columns:
            py_cols = {name: (src, udf) for name, src, udf in getattr(self, "_py_columns", [])}
            exprs = []
            for spec in self._columns:
                if spec.name in py_cols:
                    src, udf = py_cols[spec.name]
                    exprs.append(udf(F.col(f"`{src}`")).alias(spec.name))
                elif spec.source == "__lit__":
                    exprs.append(render_expr(spec.as_expr).alias(spec.name))
                else:
                    exprs.append(spec.converter())
            projected = df.select(*exprs)
        else:
            projected = df
        if self._group_by:
            key = render_expr(self._group_by)
            w = Window.partitionBy(key).orderBy(*[F.col(c) for c in projected.columns])
            projected = (
                projected.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        return projected


def copy_column(
    target: DataFrame,
    source: DataFrame,
    keys: list[str] | list[tuple[str, str]],
    column: str,
    value_template: str | None = None,
    source_value_col: str | None = None,
) -> DataFrame:
    """P7 cross-table copy_column: the reference's correlated
    `UPDATE t SET col = expr($S,$T) FROM s WHERE t.k = s.k`
    (working_table.rb:48-70, database_table.rb:16-28) as a join rewrite.

    keys: join key names, or (target_key, source_key) pairs.
    value_template: SQL over $S (source value) / $T (current target
    value); default "$S". Unmatched target rows keep their value.
    """
    src_col = source_value_col or column
    pairs = [(k, k) if isinstance(k, str) else k for k in keys]
    # duplicate source keys: Postgres UPDATE..FROM picks an arbitrary
    # row; dropDuplicates would too, but PER RUN — this engine's
    # determinism posture (cross-engine hash verification) demands a
    # pinned winner, so the SMALLEST source value wins, mirroring the
    # lowest-pk tie-break convention in merging/dedup
    kcols = [f"_k_{tk}" for tk, _ in pairs]
    w = Window.partitionBy(*kcols).orderBy(F.asc_nulls_last("_src_val"))
    s = (
        source.select(
            *[F.col(sk).alias(f"_k_{tk}") for tk, sk in pairs],
            F.col(src_col).alias("_src_val"),
            F.lit(True).alias("_matched"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # plain equality, not eqNullSafe: the reference's correlated
    # `UPDATE t ... WHERE t.k = s.k` never matches NULL keys, so a
    # NULL-keyed target row must keep its value rather than receive a
    # NULL-keyed source's
    cond = reduce(
        Column.__and__,
        [target[tk] == s[f"_k_{tk}"] for tk, _ in pairs],
    )
    joined = target.join(s, cond, "left")
    template = value_template or "$S"
    new_val = render_expr(template, source="_src_val", target=column).cast(
        # cast to the TARGET column's type (the merging.py update-branch
        # rule): a string-typed staged source must not widen the column
        # through CASE WHEN coercion
        dict(target.dtypes)[column]
    )
    out = joined.withColumn(
        f"__new_{column}",
        F.when(F.col("_matched").isNotNull(), new_val).otherwise(F.col(column)),
    )
    return (
        out.drop(column)
        .withColumnRenamed(f"__new_{column}", column)
        .select(*target.columns)
    )
