"""Text-analysis functions for the training-data pipeline track:
language ID (stopword n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
(polynomial rolling hash). All pure Column logic — JVM-side, no UDFs —
with matching DuckDB SQL builders.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import P, sql_stable_hash64, stable_hash64

# Tiny per-language stopword profiles (public common-word lists).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "los", "y", "en", "que", "un", "una", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "zh": ["de", "le", "shi", "zai", "you", "wo", "ta", "men", "zhe", "na"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
FP_R = 1000003  # rolling-hash multiplier (fits (P-1)*R + P-1 < 2^63)


_NUMREF_MARK = "\x01"


def xml_unescape(c: "F.Column") -> "F.Column":
    """Decode the predefined XML entities plus numeric character
    references (``&#225;`` / ``&#xE1;``) — what XmlSlurper gives the
    reference for free. All Column logic: numeric refs are fenced with
    a sentinel, split out, and decoded per array slot via
    ``Character.toString(codePoint)``; invalid code points round-trip
    unchanged. ``&amp;`` decodes last so escaped escapes
    (``&amp;#225;`` -> ``&#225;``) resolve one level only, like a real
    parser."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))

    marked = F.regexp_replace(
        c, "&#(x[0-9a-fA-F]+|[0-9]+);", f"{_NUMREF_MARK}$1{_NUMREF_MARK}"
    )
    parts = F.split(marked, _NUMREF_MARK)

    def decode(x: "F.Column", i: "F.Column") -> "F.Column":
        code = F.when(
            x.startswith("x"),
            F.conv(x.substr(F.lit(2), F.length(x)), 16, 10).cast("int"),
        ).otherwise(x.cast("int"))
        valid = (
            code.isNotNull()
            & (code >= 1)
            & (code <= 0x10FFFF)
            & ~((code >= 0xD800) & (code <= 0xDFFF))
        )
        decoded = F.when(
            valid,
            F.call_function(
                "reflect", F.lit("java.lang.Character"), F.lit("toString"), code
            ),
        ).otherwise(F.concat(F.lit("&#"), x, F.lit(";")))
        return F.when(i % 2 == 1, decoded).otherwise(x)

    c = F.array_join(F.transform(parts, decode), "")
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def tokens(c: Column) -> Column:
    """Lowercased word tokens (C14 simple variant, SURVEY §2.8)."""
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")


def stopword_hits(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(words, x)))


def lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """Language pick from per-language hit-count columns (ties broken
    by language code ascending; 'und' if zero hits). Pass *projected
    attributes* in hot paths: the chain references each count twice,
    which would double-evaluate an inlined filter expression."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(hits):  # ascending => first max wins ties
        h = hits[lang]
        take = h > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, h).otherwise(best_hits)
    return best_lang


def lang_id(c: Column) -> Column:
    """Pick the language whose stopword profile hits most tokens
    (Column-in/Column-out convenience; the suite query projects token
    and hit columns first — see lang_id_from_hits)."""
    toks = tokens(c)
    return lang_id_from_hits(
        {lang: stopword_hits(toks, lang) for lang in STOPWORDS}
    )


def whitespace_token_count(c: Column) -> Column:
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != ""))


def bpe_ish_token_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def alpha_ratio(c: Column) -> Column:
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score_micro(c: Column) -> Column:
    """Heuristic document quality in [0, 1_000_000] micro-units: alpha
    ratio, mean token length in a sane band, and stopword presence.

    Returned as ``floor(score * 1e6)`` BIGINT rather than a rounded
    double: ``floor`` has no tie-breaking rule, so as long as both
    engines compute the identical IEEE-754 double (they do — identical
    expression shape), the integer output is bit-identical. ``round``
    half-up/half-even differences would flake the oracle hash."""
    toks = tokens(c)
    ntok = F.size(toks)
    mean_len = F.when(
        ntok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).cast("double")
        / ntok.cast("double"),
    ).otherwise(F.lit(0.0))
    len_ok = F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        ntok > 0, stopword_hits(toks, "en").cast("double") / ntok.cast("double")
    ).otherwise(F.lit(0.0))
    score = 0.5 * alpha_ratio(c) + 0.25 * len_ok + 0.25 * F.least(stop_ratio * 5.0, F.lit(1.0))
    return F.floor(score * 1000000.0).cast("long")


def fingerprint(c: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes:
    acc = (acc * R + h(token) mod P) mod P — a shift-resistant document
    signature (cheap exact-dup + near-shift detection)."""
    toks = tokens(c)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(FP_R) + stable_hash64(x) % F.lit(P)) % F.lit(P),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle side
# ---------------------------------------------------------------------------

def sql_tokens(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'), x -> x <> '')"


def sql_stopword_hits(toks: str, lang: str) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return f"len(list_filter({toks}, x -> list_contains({arr}, x)))"


def sql_lang_id(expr: str) -> str:
    toks = sql_tokens(expr)
    best_lang, best_hits = "'und'", "0"
    for lang in sorted(STOPWORDS):
        hits = sql_stopword_hits(toks, lang)
        best_lang = f"(CASE WHEN {hits} > {best_hits} THEN '{lang}' ELSE {best_lang} END)"
        best_hits = f"(CASE WHEN {hits} > {best_hits} THEN {hits} ELSE {best_hits} END)"
    return best_lang


def sql_whitespace_token_count(expr: str) -> str:
    return f"len(list_filter(regexp_split_to_array({expr}, '\\s+'), x -> x <> ''))"


def sql_bpe_ish_token_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_ISH_RE}'))"


def sql_alpha_ratio(expr: str) -> str:
    n = f"len({expr})"
    alpha = f"len(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    return f"(CASE WHEN {n} > 0 THEN CAST({alpha} AS DOUBLE) / CAST({n} AS DOUBLE) ELSE 0.0 END)"


def sql_quality_score_micro(expr: str) -> str:
    toks = sql_tokens(expr)
    ntok = f"len({toks})"
    mean_len = (
        f"(CASE WHEN {ntok} > 0 THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({toks}, x -> CAST(len(x) AS BIGINT))), (a, x) -> a + x) AS DOUBLE)"
        f" / CAST({ntok} AS DOUBLE) ELSE 0.0 END)"
    )
    len_ok = f"(CASE WHEN {mean_len} >= 3.0 AND {mean_len} <= 10.0 THEN 1.0 ELSE 0.0 END)"
    stop_ratio = (
        f"(CASE WHEN {ntok} > 0 THEN CAST({sql_stopword_hits(toks, 'en')} AS DOUBLE)"
        f" / CAST({ntok} AS DOUBLE) ELSE 0.0 END)"
    )
    score = (
        f"(0.5 * {sql_alpha_ratio(expr)} + 0.25 * {len_ok}"
        f" + 0.25 * least({stop_ratio} * 5.0, 1.0))"
    )
    return f"CAST(floor({score} * 1000000.0) AS BIGINT)"


def sql_fingerprint(expr: str) -> str:
    toks = sql_tokens(expr)
    hashes = f"list_transform({toks}, x -> {sql_stable_hash64('x')} % {P})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes}),"
        f" (acc, x) -> (acc * {FP_R} + x) % {P})"
    )


# --- PTB tokenization (C14, upgraded r6) -----------------------------------
# The reference tokenizes NER training text with Stanford's
# PTBTokenizer (src/XMLToTSVConverter.groovy:148-159). This is the
# classic sed-pipeline form of PTB tokenization (the public
# tokenizer.sed rules), expressed as an engine-neutral rule list that
# compiles to a Spark regexp_replace chain AND a DuckDB
# regexp_replace(..., 'g') chain — no lookarounds, so both Java regex
# and RE2 accept every pattern. Documented subset vs full PTB:
# sentence-final-period splitting applies at end-of-text only
# (abbreviation-aware per-sentence period logic needs a sentence
# splitter); directional single quotes are left attached.

PTB_RULES: list[tuple[str, str]] = [
    (r'^"', r'`` '),                                  # opening quote
    (r'([ (\[{<])"', r'\1 `` '),
    (r'\.\.\.', r' ... '),                            # ellipsis
    (r'([;@#$%&])', r' \1 '),
    (r'([^0-9]),', r'\1 , '),                         # comma (not 1,234)
    (r',([^0-9])', r' , \1'),
    (r'([^.])(\.)([\]\)}>"' + "'" + r']*)\s*$', r'\1 \2\3 '),
    (r'([?!])', r' \1 '),
    (r'([\]\[(){}<>])', r' \1 '),
    (r'\(', r'-LRB-'), (r'\)', r'-RRB-'),
    (r'\[', r'-LSB-'), (r'\]', r'-RSB-'),
    (r'\{', r'-LCB-'), (r'\}', r'-RCB-'),
    (r'"', r" '' "),                                  # closing quote
    (r"([a-zA-Z])('ll|'LL|'re|'RE|'ve|'VE|'s|'S|'m|'M|'d|'D)\b", r"\1 \2"),
    (r"([a-zA-Z])(n't|N'T)\b", r"\1 \2"),
]


def ptb_tokens(c: Column) -> Column:
    """PTB tokenization as a pure-Column regexp_replace chain (JVM,
    scan-stage, whole-stage codegen) returning array<string>."""
    import re as _re

    out = c
    for pat, rep in PTB_RULES:
        out = F.regexp_replace(out, pat, _re.sub(r"\\(\d)", r"$\1", rep))
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return F.filter(F.split(out, " "), lambda t: t != "")


def sql_ptb_tokens(expr: str) -> str:
    out = expr
    for pat, rep in PTB_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return (
        f"list_filter(string_split(trim(regexp_replace({out}, '\\s+', ' ', 'g')), ' '),"
        " t -> t <> '')"
    )
