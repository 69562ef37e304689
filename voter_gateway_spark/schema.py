"""Column specs and $S/$T expression templating.

The reference's DSL threads `$S` (source value) and `$T` (target value)
placeholders through converters, constraints, merge expressions and
match constraints (reference: lib/voter_file/csv_driver/working_table.rb:142,
record_matcher.rb:83-86, record_merger.rb:126-132). Here templates are
Spark SQL expression strings; substitution produces a `pyspark.sql.Column`
via `F.expr`, so everything stays JVM-side inside Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference type names → Spark SQL type names. The reference passes SQL
# type names through verbatim (working_table.rb:15 default TEXT); we map
# the vocabulary seen in its code/specs (SURVEY §1.2).
TYPE_MAP = {
    "TEXT": "string",
    "VARCHAR": "string",
    "UUID": "string",
    "INT": "int",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "SERIAL": "bigint",  # identity handled by the caller (monotonically_increasing_id)
    "BOOLEAN": "boolean",
    "DECIMAL": "decimal(38,9)",
    "DOUBLE": "double",
    "FLOAT": "float",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def spark_type(type_name: str) -> str:
    """Normalize a declared type name to a Spark SQL type string."""
    if type_name is None:
        return "string"
    return TYPE_MAP.get(type_name.strip().upper(), type_name)


def _quote(col: str) -> str:
    return f"`{col}`"


def render_template(template: str, source: str | None = None, target: str | None = None) -> str:
    """Substitute $S / $T placeholders with (qualified) column references.

    `source` / `target` may be bare column names or alias-qualified refs
    like ``s.name``; they are backtick-quoted per path segment.
    """
    out = template
    if source is not None:
        out = out.replace("$S", _qualify(source))
    if target is not None:
        out = out.replace("$T", _qualify(target))
    return out


def _qualify(ref: str) -> str:
    return ".".join(_quote(p) for p in ref.split("."))


def render_expr(template: str, source: str | None = None, target: str | None = None) -> Column:
    """$S/$T template → Column (native Catalyst expression)."""
    return F.expr(render_template(template, source, target))


def lower_source_row_template(template: str) -> str:
    """Lower a ROW-level $S template ("$S.age > 18 AND $S.name <> ''")
    to bare backtick-quoted column refs — the insert-constraint shape,
    where $S stands for the whole source row rather than one column.
    A naive replace("$S.", "") leaves bare `$S` tokens in the SQL (a
    ParseException at execute time, far from the declaration) and
    unquoted multi-word names; this quotes and fails fast instead."""
    import re

    out = re.sub(r"\$S\.(\w+)", lambda m: _quote(m.group(1)), template)
    if "$S" in out:
        raise ValueError(
            "row-level $S templates must reference columns as $S.col "
            f"(got: {template!r})"
        )
    return out


@dataclass
class ColumnSpec:
    """A declared output column (reference working_table.rb:129-152).

    - mapped from `source` with an optional `as_expr` template
      ("$S" = the source column), default converter = CAST($S AS type)
    - or added empty (`source is None`) with a type.
    """

    name: str
    type: str = "TEXT"
    source: str | None = None
    as_expr: str | None = None  # SQL template over $S, or None for default cast
    safe: bool = False  # TRY_CAST (NULL on bad input) instead of ANSI CAST

    @property
    def spark_type(self) -> str:
        return spark_type(self.type)

    def converter(self) -> Column:
        """The expression producing this column from the source frame.

        Default converter mirrors the reference's strict `$S::TYPE`
        (working_table.rb:142); `safe=True` opts into TRY_CAST because
        Spark 4's ANSI mode fails the whole job on one malformed value.
        """
        if self.source is None:
            return F.lit(None).cast(self.spark_type).alias(self.name)
        if self.as_expr is None:
            cast_fn = "TRY_CAST" if self.safe else "CAST"
            template = f"{cast_fn}($S AS {self.spark_type})"
        else:
            template = self.as_expr
        return render_expr(template, source=self.source).alias(self.name)


@dataclass
class Constraint:
    """A templated predicate bound to a column ($S substituted)
    (reference working_table.rb:170-176)."""

    column: str
    template: str  # e.g. "$S IS NOT NULL", "$S <> ''"

    def predicate(self) -> Column:
        return render_expr(self.template, source=self.column)


@dataclass
class TableSpec:
    """Declared schema: ordered column specs + optional primary key."""

    columns: list[ColumnSpec] = field(default_factory=list)
    primary_key: str | None = None
    primary_key_type: str | None = None

    def names(self) -> list[str]:
        return [c.name for c in self.columns]
