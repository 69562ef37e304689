"""CSV ingestion with the reference's mess-handling semantics (S1–S6).

Reference behavior reproduced (lib/voter_file/csv_driver/csv_file.rb):
- custom delimiter (default ','), custom quote char (default '^'),
  header row, Latin-1 encoding option (csv_file.rb:13-15, :143-152)
- optional whole-file regex strip preprocessor (csv_file.rb:30-38,
  `sed -E 's/expr//g'`)
- malformed-row removal: rows whose field count differs from the header
  or that fail CSV parsing are dropped, with a count retained for
  auditing (csv_file.rb:40-63; count used by csv_audit.rb:123-133)
- all-TEXT staging schema derived from the header (csv_file.rb:154-171)

Spark-first design: the file is read ONCE as a distributed text/csv
scan; the regex strip happens as a column expression before `from_csv`
re-parse (no second pass over the file on disk), and malformed handling
uses PERMISSIVE mode + corrupt-record accounting so the dropped-row
count (A7) needs no extra scan of the original.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CSVSource:
    path: str
    delimiter: str = ","
    quote: str = "^"  # reference default quote char (csv_file.rb:14)
    header: bool = True
    encoding: str = "UTF-8"  # reference uses LATIN1 for voter files
    remove_expression: str | None = None  # S5 regex strip (whole line, global)
    remove_malformed: bool = False  # S6

    _corrupt_col: str = field(default="_corrupt_record", repr=False)
    _blank_skipped: int | None = field(default=None, repr=False)

    def _raw_lines(self, spark: SparkSession) -> DataFrame:
        """Raw physical lines decoded with `encoding`, one string column
        `value`. NOT spark.read.text: the text source is UTF-8-only and
        silently ignores the encoding option, so a Latin-1 voter file
        (the reference's stated case) would decode every non-ASCII byte
        as U+FFFD. The csv reader DOES honor encoding — read with a
        separator that cannot occur in text (SOH) and quoting disabled,
        and each line arrives intact as one field."""
        return (
            spark.read.option("sep", "\x01")
            .option("quote", "")
            .option("header", "false")
            .option("encoding", self.encoding)
            .schema("value STRING")
            .csv(self.path)
        )

    def headers(self, spark: SparkSession) -> list[str]:
        """S3 header sniffing — read only the first row."""
        first = self._raw_lines(spark).limit(1).collect()
        if not first:
            return []
        line = first[0][0]
        if self.remove_expression:
            import re

            line = re.sub(self.remove_expression, "", line)
        # parse the single header line with the csv dialect
        import csv as _csv
        import io

        reader = _csv.reader(
            io.StringIO(line), delimiter=self.delimiter, quotechar=self.quote
        )
        return [h.strip() for h in next(reader)]

    def read(self, spark: SparkSession) -> DataFrame:
        """Load to an all-string DataFrame (S1/S4), applying the regex
        strip (S5) and malformed-row policy (S6).

        Returns a DataFrame with the header-derived string columns plus,
        when `remove_malformed`, a cached frame whose dropped count is
        available via `malformed_count`.
        """
        if self.remove_expression is None and not self.remove_malformed:
            return (
                spark.read.option("sep", self.delimiter)
                .option("quote", self.quote)
                .option("header", str(self.header).lower())
                .option("encoding", self.encoding)
                .option("inferSchema", "false")
                .csv(self.path)
            )

        import re as _re

        if self.header:
            cols = self.headers(spark)
        else:
            # header=False: the first line is DATA — deriving column
            # names from it would turn field values into a (possibly
            # duplicate-named) schema; synthesize _c0.._cN exactly like
            # the fast csv path, sizing N from the first line's fields
            first = self._raw_lines(spark).limit(1).collect()
            if first:
                import csv as _csv
                import io as _io

                line = first[0][0]
                if self.remove_expression:
                    line = _re.sub(self.remove_expression, "", line)
                n_fields = len(
                    next(
                        _csv.reader(
                            _io.StringIO(line),
                            delimiter=self.delimiter,
                            quotechar=self.quote,
                        )
                    )
                )
            else:
                n_fields = 0
            cols = [f"_c{i}" for i in range(n_fields)]
        schema_ddl = ", ".join(f"`{c}` STRING" for c in cols)
        lines = self._raw_lines(spark)
        if self.header:
            # drop the header POSITIONALLY (first physical line per
            # file), never by value: a data row textually identical to
            # the header must survive. monotonically_increasing_id
            # follows file order (split offsets ascend with partition
            # index); the per-file min is found with a cheap partial
            # aggregate + broadcast anti-condition — no full-file
            # window sort, so this holds at scale.
            lines = lines.select(
                "value",
                F.input_file_name().alias("_f"),
                F.monotonically_increasing_id().alias("_lid"),
            )
            firsts = lines.groupBy("_f").agg(F.min("_lid").alias("_first"))
            lines = (
                lines.join(F.broadcast(firsts), "_f")
                .where(F.col("_lid") != F.col("_first"))
                .select("value")
            )
        value = F.col("value")
        if self.remove_expression:
            value = F.regexp_replace(value, self.remove_expression, "")

        opts = {
            "sep": self.delimiter,
            "quote": self.quote,
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": self._corrupt_col,
        }
        # The reference drops exactly the rows whose RAW field count
        # differs from the header's (csv_file.rb:40-63) — a trailing
        # empty field is a present field, so 'a,b,' with a 3-column
        # header is well-formed. Count delimiters outside quoted
        # segments on the raw line and compare to len(cols)-1; the
        # corrupt-record flag still catches quote/parse failures.
        qe = _re.escape(self.quote)
        unquoted = F.regexp_replace(value, f"{qe}[^{qe}]*{qe}", "")
        n_delims = F.length(unquoted) - F.length(
            F.replace(unquoted, F.lit(self.delimiter), F.lit(""))
        )
        staged = lines.select(
            value.alias("_raw"),
            (n_delims / len(self.delimiter)).cast("int").alias("_n_delims"),
        )
        parsed = staged.select(
            F.from_csv(
                F.col("_raw"), f"{schema_ddl}, `{self._corrupt_col}` STRING", opts
            ).alias("r"),
            "_n_delims",
        ).select("r.*", "_n_delims")
        malformed = F.col(self._corrupt_col).isNotNull() | (
            F.col("_n_delims") != F.lit(len(cols) - 1)
        )
        flagged = parsed.withColumn("_malformed", malformed).drop("_n_delims")
        if self.remove_malformed:
            flagged = flagged.cache()
            self._flagged = flagged
            self._spark = spark
            return flagged.where(~F.col("_malformed")).drop(self._corrupt_col, "_malformed")
        return flagged.drop("_malformed")

    # (the newline-byte-compatibility precondition for
    # _blank_line_count is checked directly: '\n' must encode to the
    # single byte 0x0A — see the check inside _blank_line_count)

    def _blank_line_count(self) -> int:
        """Blank physical lines the csv source silently skipped.

        Spark's csv reader (used by _raw_lines for its encoding support)
        unconditionally drops blank lines, so they never reach the
        field-count check — but the reference's wc-l-diff accounting
        (csv_audit.rb:123-133) counts a blank line as a malformed row
        (it fails the field-count test). Recover them by comparing a
        physical line count (spark.read.text keeps blank lines; its
        UTF-8-only decoding cannot change the COUNT for the allowlisted
        newline-byte-compatible encodings — validated below, raising
        for UTF-16/UTF-32-family encodings where the byte-count
        arithmetic would silently be wrong) against the csv-visible
        line count. Cost: two extra input scans, paid once and only
        when malformed_count() is called — the flagged-row count itself
        still comes scan-free from the cached frame.
        """
        if self._blank_skipped is None:
            # precise newline-byte check instead of an encoding-name
            # allowlist (which wrongly rejected 0x0A-safe single-byte
            # codecs like cp437/koi8-r and ASCII-compatible multi-byte
            # ones like shift_jis/gbk, whose continuation-byte ranges
            # exclude 0x0A by design): '\n' must encode to exactly the
            # byte 0x0A. UTF-16/UTF-32 (multi-byte '\n', 0x0A inside
            # code units) and EBCDIC ('\n' -> 0x15/0x25) fail it.
            if "\n".encode(self.encoding) != b"\n":
                raise ValueError(
                    f"malformed_count with encoding {self.encoding!r}: "
                    "blank-line recovery needs an encoding where '\\n' "
                    "is the single byte 0x0A; UTF-16/UTF-32/EBCDIC "
                    "line counts from the byte-oriented text source "
                    "would be wrong"
                )
            physical = self._spark.read.text(self.path).count()
            seen = self._raw_lines(self._spark).count()
            self._blank_skipped = physical - seen
        return self._blank_skipped

    def malformed_count(self) -> int:
        """A7 malformed-row count (reference: wc -l diff, csv_audit.rb:123-133).

        Includes blank physical lines (see _blank_line_count) so the
        tally matches the reference's line-count-minus-loaded-rows
        arithmetic exactly."""
        if not hasattr(self, "_flagged"):
            raise ValueError("read() with remove_malformed=True first")
        return self._flagged.where(F.col("_malformed")).count() + self._blank_line_count()
