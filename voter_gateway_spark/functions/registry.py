"""Scalar function surface (reference F1–F7, SURVEY §2.6).

The reference registers three PL/pgSQL UDFs lazily on first use and
keeps an extension registry raising NameError for unknown names
(lib/voter_file/csv_driver.rb:8-49, :69-74, :170-175). Here each is a
pure built-in Column composition — no Python UDFs, so everything stays
inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def election_name(date_col: Column | str, type_col: Column | str) -> Column:
    """`nb_parse_election_name(date, type)` → "2014_general".

    Reference: lib/voter_file/csv_driver.rb:8-27 — EXTRACT(YEAR) plus a
    code→word map (pr→primary, ge→general, pp→presidential_primary,
    sp→special, else pass through lowercased).
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    t = F.col(type_col) if isinstance(type_col, str) else type_col
    code = F.lower(t)
    word = (
        F.when(code == "pr", "primary")
        .when(code == "ge", "general")
        .when(code == "pp", "presidential_primary")
        .when(code == "sp", "special")
        .otherwise(code)
    )
    year = F.year(F.to_date(d)).cast("string")
    return F.concat_ws("_", year, word)


def coerce_to_date_or_null(col: Column | str) -> Column:
    """`nb_coerce_to_date_or_null(text)` — cast to DATE, NULL on failure.

    Reference: lib/voter_file/csv_driver.rb:28-38. Spark 4 runs ANSI
    mode by default, where `to_date`/CAST throw on malformed input —
    `try_cast` restores the reference's NULL-on-failure contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("date")


EMAIL_RE = r"^\S*\.[a-zA-Z][a-zA-Z\.]*[a-zA-Z]$"


def is_email_address_valid(col: Column | str) -> Column:
    """`nb_is_email_address_valid(text)`.

    Reference: lib/voter_file/csv_driver.rb:39-49 — NULL/empty is valid;
    otherwise length 3..100 AND contains '@' AND matches EMAIL_RE.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.isNull()
        | (F.trim(c) == "")
        | (
            F.length(c).between(3, 100)
            & c.contains("@")
            & c.rlike(EMAIL_RE)
        )
    )


def needs_geocoding(addr_col: Column | str, lat_col: Column | str) -> Column:
    """F7 geocoding flag: nonblank address AND (lat IS NULL OR lat = 0.0)
    (reference working_table.rb:72-85)."""
    a = F.col(addr_col) if isinstance(addr_col, str) else addr_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    return (
        a.isNotNull()
        & (F.trim(a.cast("string")) != "")
        # try_cast: a malformed numeric string on a CSV-staged frame
        # must FLAG the row (it has no usable coordinate), not throw
        # under ANSI mode — the module's coerce_to_date_or_null posture
        & (
            lat.isNull()
            | lat.try_cast("double").isNull()
            | (lat.try_cast("double") == 0.0)
        )
    )


def location_point(lng_col: Column | str, lat_col: Column | str) -> Column:
    """F7 geometry build: POINT(lng lat) where both non-null, else NULL
    (reference working_table.rb:86-94). Geometry → struct<lng,lat>
    (SURVEY §1.2: point construction + null checks are the only geo ops)."""
    lng = F.col(lng_col) if isinstance(lng_col, str) else lng_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lngd, latd = lng.cast("double"), lat.cast("double")
    return F.when(
        lngd.isNotNull() & latd.isNotNull(),
        F.struct(lngd.alias("lng"), latd.alias("lat")),
    )


PHONETIC_CONSONANTS = "BFPVCGJKQSXZDTLMNR"
PHONETIC_CODES = "111122222222334556"


def phonetic_key(col: Column | str) -> Column:
    """Soundex-style phonetic blocking key: first letter + the first
    three consonant-class digits of the rest, runs collapsed, padded
    with '0' — e.g. 'dafegi' → 'D120'.

    Spec (deliberately simplified vs classic Soundex, identical in
    both engines): (1) uppercase and keep LETTERS only (digits and
    punctuation never contribute — a numeric suffix must not fabricate
    phonetic codes); (2) map consonants B F P V→1, C G J K Q S X Z→2,
    D T→3, L→4, M N→5, R→6; (3) drop everything unmapped (vowels, H,
    W, Y); (4) collapse adjacent equal digits — note this collapses
    across dropped vowels too, where classic Soundex keeps
    vowel-separated repeats; (5) key = first letter + first 3 digits,
    '0'-padded. Empty input yields '000'.

    The classic voter-file blocking key: invariant under the
    misspellings people actually make (vowel swaps, doubled
    consonants, inserted H), so re-registrations with typos still
    land in their entity's block. Scale caveat, disclosed wherever
    this blocks: the key ALPHABET is bounded (≤26·1000 keys), so
    phonetic blocks grow linearly with population and pair mass is
    quadratic by contract — compose with a population-scaled key
    (match_fs_scaled_* pattern) or a nation/geo key for the third
    decade. Pure Column composition — stays in whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    letters = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    rest = F.substring(letters, 2, 2147483647)
    digits = F.regexp_replace(
        F.translate(rest, PHONETIC_CONSONANTS, PHONETIC_CODES), "[^1-6]", ""
    )
    for d in "123456":
        digits = F.regexp_replace(digits, d + "+", d)
    return F.concat(
        F.substring(letters, 1, 1), F.rpad(F.substring(digits, 1, 3), 3, "0")
    )


def phonetic_key_sql(expr: str) -> str:
    """DuckDB rendering of `phonetic_key` (oracle mirror — same spec,
    step for step; DuckDB regexp_replace needs the explicit 'g' flag
    where Spark's replaces all matches by default)."""
    letters = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    digits = (
        f"regexp_replace(translate(substr({letters}, 2),"
        f" '{PHONETIC_CONSONANTS}', '{PHONETIC_CODES}'), '[^1-6]', '', 'g')"
    )
    for d in "123456":
        digits = f"regexp_replace({digits}, '{d}+', '{d}', 'g')"
    return f"(substr({letters}, 1, 1) || rpad(substr({digits}, 1, 3), 3, '0'))"


def point_wkt(point_col: Column | str, precision: int = 6) -> Column:
    """WKT export of a `location_point` struct: 'POINT(lng lat)'.

    The reference materializes real PostGIS geometry
    (working_table.rb:86-94); this engine represents points as
    struct<lng,lat> (the reference only ever CONSTRUCTS points — no
    spatial predicates), so interop export is a format_string away.
    printf-style fixed precision keeps the text identical across
    engines (raw double formatting differs)."""
    p = F.col(point_col) if isinstance(point_col, str) else point_col
    return F.when(
        p.isNotNull(),
        F.format_string(f"POINT(%.{precision}f %.{precision}f)", p["lng"], p["lat"]),
    )


_WKB_UDF = None


def point_wkb(point_col: Column | str) -> Column:
    """WKB (little-endian, 2D point) export of a location_point struct:
    21 bytes = 0x01 | uint32(1) | float64(lng) | float64(lat).

    IEEE-754 bit extraction has no Catalyst builtin, so this is an
    Arrow-batched pandas UDF — geometry export is a sink-side
    formatting step, never a hot-path predicate, so the Python
    boundary is acceptable here (same posture as multimodal decode).

    The UDF is built ONCE (lazy module cache): rebuilding it per call
    would hand Catalyst a distinct UDF instance per invocation —
    unsharable across references and pure per-call overhead."""
    global _WKB_UDF
    if _WKB_UDF is None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _pack(pts):
            import struct as _s

            def pack(row):
                if pd.isna(row["lng"]) or pd.isna(row["lat"]):
                    return None
                return _s.pack("<BIdd", 1, 1, float(row["lng"]), float(row["lat"]))

            return pts.apply(pack, axis=1)

        # explicit annotations (not from-future strings): struct -> binary
        _pack.__annotations__ = {"pts": pd.DataFrame, "return": pd.Series}
        _WKB_UDF = pandas_udf(_pack, "binary")

    p = F.col(point_col) if isinstance(point_col, str) else point_col
    return _WKB_UDF(p)


# Extension registry (F4): name → builder. Unknown name raises NameError,
# matching the reference's lazy registry contract (csv_driver.rb:170-175).
EXTENSIONS: dict[str, Callable[..., Column]] = {
    "election_name": election_name,
    "coerce_to_date_or_null": coerce_to_date_or_null,
    "is_email_address_valid": is_email_address_valid,
    "needs_geocoding": needs_geocoding,
    "location_point": location_point,
    "point_wkt": point_wkt,
    "point_wkb": point_wkb,
}


def load_extension(name: str) -> Callable[..., Column]:
    if name not in EXTENSIONS:
        raise NameError(f"unknown extension: {name}")
    return EXTENSIONS[name]


def register_all(spark: SparkSession) -> None:
    """Expose the extensions to SQL-string users as temp views of SQL
    macros is not supported pre-Spark-4 SQL UDFs; instead register SQL
    user functions (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN`).
    DataFrame users should call the Python builders directly.
    """
    stmts = {
        "vg_election_name": (
            "CREATE OR REPLACE TEMPORARY FUNCTION vg_election_name(d STRING, t STRING) "
            "RETURNS STRING RETURN concat_ws('_', cast(year(to_date(d)) as string), "
            "CASE lower(t) WHEN 'pr' THEN 'primary' WHEN 'ge' THEN 'general' "
            "WHEN 'pp' THEN 'presidential_primary' WHEN 'sp' THEN 'special' "
            "ELSE lower(t) END)"
        ),
        "vg_coerce_to_date_or_null": (
            "CREATE OR REPLACE TEMPORARY FUNCTION vg_coerce_to_date_or_null(s STRING) "
            "RETURNS DATE RETURN try_cast(s AS DATE)"
        ),
        "vg_is_email_address_valid": (
            "CREATE OR REPLACE TEMPORARY FUNCTION vg_is_email_address_valid(s STRING) "
            "RETURNS BOOLEAN RETURN s IS NULL OR trim(s) = '' OR "
            "(length(s) BETWEEN 3 AND 100 AND contains(s, '@') AND s RLIKE "
            f"'{EMAIL_RE.replace(chr(92), chr(92) * 2)}')"
        ),
    }
    for sql in stmts.values():
        spark.sql(sql)
