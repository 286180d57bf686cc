"""Spanish date normalization (C10).

Reference semantics: src/DateNormalizer.groovy:12-72 (three regex
shapes over lowercased, whitespace-collapsed input) +
src/NormalizedDate.groovy:26-110 (field validation: day 1-31
zero-padded; month name -> 2-digit number; year: strip non-digits,
2-digit <=12 -> 20xx else 19xx, 4-digit clamped to 1900-2012 else
invalid). Output format ``YYYY/MM/DD`` (src/NormalizedDate.groovy:29-32).

Deviation: the reference's pattern 2 uses a backreference ``\\2`` to
force the same separator on both sides of the month
(src/DateNormalizer.groovy:49). RE2 (DuckDB) has no backreferences, so
we expand it into explicit ``/``-separated and ``-``-separated
alternatives — same accepted language.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTH_LONG = [
    "enero", "febrero", "marzo", "abril", "mayo", "junio",
    "julio", "agosto", "septiembre", "octubre", "noviembre", "diciembre",
]
MONTH_SHORT = [
    "ene", "feb", "mar", "abr", "may", "jun",
    "jul", "ago", "sep", "oct", "nov", "dic",
]

LONG_MONTH = "(?:" + "|".join(MONTH_LONG) + ")"
SHORT_MONTH = "(?:" + "|".join(MONTH_SHORT) + ")"
DAY = "(?:[1-9]|0[1-9]|[1-2][0-9]|30|31)"
YEAR4 = r"(?:1\.?9[0-9][0-9]|2\.?0[01][0-9])"
YEAR2 = "(?:[0-9][0-9])"

# Pattern 1: "14 de febrero de 1998" (src/DateNormalizer.groovy:30)
RE1 = f"({DAY}) (?:de )?({LONG_MONTH}) (?:de |del |del año )?({YEAR4})"
# Pattern 2 split by separator (backreference-free, see module doc)
RE2_SLASH = f"(?:el día )?({DAY})/({SHORT_MONTH}|{LONG_MONTH})/({YEAR4}|{YEAR2})"
RE2_DASH = f"(?:el día )?({DAY})-({SHORT_MONTH}|{LONG_MONTH})-({YEAR4}|{YEAR2})"
# Pattern 3: "marzo 14 del 2001" (src/DateNormalizer.groovy:59); month=1 day=2
RE3 = f"({LONG_MONTH}) ({DAY}) del? ({YEAR4})"


def _month_case(month_expr: Column) -> Column:
    """month name (long or 3-letter short) -> '01'..'12'."""
    out = F.lit(None).cast("string")
    expr = None
    for i, (longm, shortm) in enumerate(zip(MONTH_LONG, MONTH_SHORT)):
        num = F.lit(f"{i + 1:02d}")
        cond = (month_expr == longm) | (month_expr == shortm)
        expr = F.when(cond, num) if expr is None else expr.when(cond, num)
    return expr.otherwise(out)


def _resolve_year(y: Column) -> Column:
    """src/NormalizedDate.groovy:80-110 semantics. try_cast: ANSI mode
    would error on casting '' (unmatched regex) even in an untaken
    CASE branch — & conditions are evaluated vectorized."""
    digits = F.regexp_replace(y, "[^0-9]", "")
    n = F.length(digits)
    as_int = digits.try_cast("int")
    return (
        F.when((n == 2) & (as_int <= 12), (as_int + 2000).cast("string"))
        .when((n == 2) & (as_int > 12), (as_int + 1900).cast("string"))
        .when((n == 4) & (as_int >= 1900) & (as_int <= 2012), digits)
        .otherwise(F.lit(None).cast("string"))
    )


def _resolve_day(d: Column) -> Column:
    return F.lpad(d.try_cast("int").cast("string"), 2, "0")


def normalize_date(c: Column) -> Column:
    """C10 — Spanish date string -> 'YYYY/MM/DD' (null if unparseable)."""
    s = F.regexp_replace(F.lower(c), r"\s+", " ")

    def try_pattern(pat: str, d_idx: int, m_idx: int, y_idx: int) -> Column:
        day = F.regexp_extract(s, pat, d_idx)
        mon = F.regexp_extract(s, pat, m_idx)
        yr = F.regexp_extract(s, pat, y_idx)
        ok = day != ""
        year = _resolve_year(yr)
        return F.when(
            ok & year.isNotNull(),
            F.concat_ws("/", year, _month_case(mon), _resolve_day(day)),
        )

    return F.coalesce(
        try_pattern(RE1, 1, 2, 3),
        try_pattern(RE2_SLASH, 1, 2, 3),
        try_pattern(RE2_DASH, 1, 2, 3),
        try_pattern(RE3, 2, 1, 3),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle side
# ---------------------------------------------------------------------------

def _sql_month_case(expr: str) -> str:
    whens = " ".join(
        f"WHEN {expr} IN ('{lm}', '{sm}') THEN '{i + 1:02d}'"
        for i, (lm, sm) in enumerate(zip(MONTH_LONG, MONTH_SHORT))
    )
    return f"(CASE {whens} ELSE NULL END)"


def _sql_resolve_year(expr: str) -> str:
    d = f"regexp_replace({expr}, '[^0-9]', '', 'g')"
    return (
        f"(CASE WHEN len({d}) = 2 AND CAST({d} AS INT) <= 12"
        f"        THEN CAST(CAST({d} AS INT) + 2000 AS VARCHAR)"
        f"      WHEN len({d}) = 2 THEN CAST(CAST({d} AS INT) + 1900 AS VARCHAR)"
        f"      WHEN len({d}) = 4 AND CAST({d} AS INT) BETWEEN 1900 AND 2012"
        f"        THEN {d}"
        f"      ELSE NULL END)"
    )


def sql_normalize_date(expr: str) -> str:
    s = f"regexp_replace(lower({expr}), '\\s+', ' ', 'g')"

    def try_pattern(pat: str, d_idx: int, m_idx: int, y_idx: int) -> str:
        pat_sql = pat.replace("'", "''")
        day = f"regexp_extract({s}, '{pat_sql}', {d_idx})"
        mon = f"regexp_extract({s}, '{pat_sql}', {m_idx})"
        yr = f"regexp_extract({s}, '{pat_sql}', {y_idx})"
        year = _sql_resolve_year(yr)
        return (
            f"(CASE WHEN {day} <> '' AND {year} IS NOT NULL THEN"
            f" concat_ws('/', {year}, {_sql_month_case(mon)},"
            f" lpad(CAST(CAST({day} AS INT) AS VARCHAR), 2, '0')) END)"
        )

    return (
        "coalesce("
        + try_pattern(RE1, 1, 2, 3) + ", "
        + try_pattern(RE2_SLASH, 1, 2, 3) + ", "
        + try_pattern(RE2_DASH, 1, 2, 3) + ", "
        + try_pattern(RE3, 2, 1, 3)
        + ")"
    )
