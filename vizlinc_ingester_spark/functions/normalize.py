"""String normalization (reference: src/CorefBase.groovy:75-93).

C1 ``normalize_str``: trim -> upper -> de-accent -> collapse
whitespace -> strip leading/trailing non-[A-Za-z0-9-] runs -> junk
chars ``^ " < > _`` to space (locations keep ``"``,
src/CorefBase.groovy:44-46).

C2 ``twitter_normalize_str``: trim -> lower -> de-accent
(src/CorefBase.groovy:89-93).

De-accenting deviates from the reference's NFD + strip-combining-marks
(src/CorefBase.groovy:78-79) by using an explicit Latin accent
translate table — locale-independent, identical in Spark and DuckDB,
and covering every accented char the corpus language (Spanish) uses.
Documented deviation per SURVEY.md §7 risk register.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Uppercase first (normalize upper-cases before folding), but keep the
# lowercase table for twitter_normalize (which lower-cases first).
ACCENT_SRC = (
    "ÁÀÂÄÃÅÇÉÈÊË"
    "ÍÌÎÏÑÓÒÔÖÕÚ"
    "ÙÛÜÝ"
    "áàâäãåçéèêë"
    "íìîïñóòôöõú"
    "ùûüýÿ"
)
ACCENT_DST = "AAAAAACEEEEIIIINOOOOOUUUUY" "aaaaaaceeeeiiiinooooouuuuyy"

# Junk-char classes (src/CorefBase.groovy:44-46).
JUNK_RE = '[\\^"<>_]'
JUNK_RE_LOCS = "[\\^<>_]"  # '"' is a good char in a location
NON_WORD = "[^A-Za-z0-9-]"


def fold_accents(c: Column) -> Column:
    return F.translate(c, ACCENT_SRC, ACCENT_DST)


def normalize_str(c: Column, junk_re: str = JUNK_RE) -> Column:
    """C1 — full mention-text normalization."""
    out = F.upper(F.trim(c))
    out = fold_accents(out)
    out = F.regexp_replace(out, r"\s+", " ")
    out = F.regexp_replace(out, f"^{NON_WORD}+", "")
    out = F.regexp_replace(out, f"{NON_WORD}+$", "")
    out = F.regexp_replace(out, junk_re, " ")
    return out


def twitter_normalize_str(c: Column) -> Column:
    """C2 — trim -> lower -> de-accent."""
    return fold_accents(F.lower(F.trim(c)))


def digit_runs(c: Column) -> Column:
    """C4 — list of digit runs (src/CorefBase.groovy:214-218)."""
    return F.regexp_extract_all(c, F.lit(r"\d+"), 0)


def all_numbers_match(a: Column, b: Column) -> Column:
    """C4 — digit-run lists of both strings equal."""
    return digit_runs(a) == digit_runs(b)


def token_count(c: Column) -> Column:
    """C5 — whitespace token count (src/AcrossDocPerCoref.groovy:35)."""
    return F.size(F.split(F.trim(c), r"\s+"))


def cleanup_leading_dash(c: Column) -> Column:
    """C9 — strip one leading '-' or ' ' (src/Geocoder.groovy:146-152)."""
    return F.regexp_replace(c, "^[- ]", "")


def fix_nbsp(c: Column) -> Column:
    """C11 — NBSP -> space (src/EntityExtractor.groovy:24-25)."""
    return F.regexp_replace(c, " ", " ")


# ---------------------------------------------------------------------------
# DuckDB SQL snippet builders (oracle side — MUST mirror the above).
# ---------------------------------------------------------------------------

def sql_fold_accents(expr: str) -> str:
    return f"translate({expr}, '{ACCENT_SRC}', '{ACCENT_DST}')"


def sql_normalize_str(expr: str, junk_re: str = JUNK_RE) -> str:
    out = f"upper(trim({expr}))"
    out = sql_fold_accents(out)
    out = f"regexp_replace({out}, '\\s+', ' ', 'g')"
    out = f"regexp_replace({out}, '^{NON_WORD}+', '')"
    out = f"regexp_replace({out}, '{NON_WORD}+$', '')"
    junk_sql = junk_re.replace("'", "''")
    out = f"regexp_replace({out}, '{junk_sql}', ' ', 'g')"
    return out


def sql_twitter_normalize_str(expr: str) -> str:
    return sql_fold_accents(f"lower(trim({expr}))")


def sql_all_numbers_match(a: str, b: str) -> str:
    return (
        f"(regexp_extract_all({a}, '\\d+') = regexp_extract_all({b}, '\\d+'))"
    )


def sql_token_count(expr: str) -> str:
    return f"len(regexp_split_to_array(trim({expr}), '\\s+'))"
