"""Gopher-style intra-document repetition measures and the composite
quality rule built on them (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Table A1) — the
repetition-filter stage of a pretraining curation stack, next to the
frequency/containment filters in suite/textstats.py.

Two measures, both as exact token-position *union coverage* (the
paper's "fraction of characters contained in ..." computed over token
slots — the documented token-level variant; the corpus is
space-tokenized so token coverage and char coverage rank identically):

- ``top2_cov_micro``: coverage of the single most frequent 2-gram
  (tie-break: highest count, then lexicographically smallest gram).
- ``dup5_rate_micro``: coverage of ALL 5-grams occurring >= 2 times
  in the document.

Union coverage is computed without interval materialization: every
occurrence is a fixed-length-n interval starting at a token slot, so
after sorting the start positions, covered = sum over consecutive
starts of min(n, next - pos), with the last start contributing n —
one window pass keyed on doc_id (the same lag algebra as
dedup_exact_substr's interval merge, specialized to fixed length).

Fixture note (simjoin re-crawl precedent, suite/dedup.py): the natural
corpus is random word soup with zero duplicated 5-grams, which would
make ``dup5_rate_micro`` a degenerate all-zero gate. The gated corpus
therefore appends each doc's first REPEAT_SLICE tokens back onto every
(doc_id % REPEAT_MOD == 0) document — partial self-repetition, giving
100/500 docs a dup rate spread over [0.22, 1.0] at sf0.01 (56 distinct
values) and exercising the overlap-merge path. The derivation is
stated identically in the oracle, so the coverage algebra is
hash-proven, not argued.

Plan at 100 TB: gram construction is scan-stage (array slice HOFs,
no shuffle); per-(doc, gram) counts and the coverage windows shuffle
on doc_id — corpus-token-count rows, uniformly keyed, the same cost
class as dedup_exact_substr. No driver round-trips, no collects.

Reference parity: the reference has no repetition filters (its corpus
is per-document NER text); this family is part of the
training-data-pipeline track (SURVEY.md "beyond the reference").

Relation to ``repetition_scores`` (suite/curation.py): that query is
the cheap scan-stage signal — duplicated-3-gram COUNT fraction
(n_dup/n_grams) via array_distinct inside one per-doc expression, on
the natural corpus. This module is the paper-faithful COVERAGE form
(union of token slots under duplicated/most-frequent grams — the
quantity Gopher thresholds actually cut on), which needs per-gram
positions and therefore a doc_id-keyed shuffle; the gated corpus is
repetition-injected so the coverage algebra is exercised
non-degenerately. Both stay declared: count-fraction is the 100 TB
pre-filter, coverage is the auditable rule.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx

REPEAT_MOD = 5     # doc_id % 5 == 0 -> doc gets a repeated head
REPEAT_SLICE = 12  # tokens of the head that get re-appended

# composite-rule thresholds (gopher_quality_filter); calibrated
# non-degenerate on the gated corpus at sf0.01 — every emitted rule
# flag has both values and the final keep is a strict subset
MIN_WORDS = 20
MAX_WORDS = 10_000
MIN_MEAN_WLEN_MICRO = 2_000_000   # mean word length in [2, 12] chars
MAX_MEAN_WLEN_MICRO = 12_000_000
MIN_STOP_HITS = 2                 # >= 2 English stopword occurrences
MAX_TOP2_COV_MICRO = 150_000      # top-2-gram coverage <= 15%
MAX_DUP5_RATE_MICRO = 200_000     # duplicated-5-gram coverage <= 20%


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import read_spread

    return read_spread(
        spark, os.path.join(sf_dir, "documents.parquet"), "doc_id"
    )


def _inject_repetition(d: DataFrame) -> DataFrame:
    """documents with a partial self-repetition injected into every
    REPEAT_MOD-th doc (module docstring). Token source of truth is the
    single-space split with empties dropped — the corpus's own
    tokenization (bm25/simjoin precedent). Takes the docs RELATION
    (not a path) so the streaming per-batch maintenance reuses the
    identical gating."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    head = F.concat_ws(" ", F.slice(toks, 1, REPEAT_SLICE))
    return d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % REPEAT_MOD == 0,
            F.concat(F.col("text"), F.lit(" "), head),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _gated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _inject_repetition(_docs(spark, sf_dir))


def _repetition_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lineage for both queries: per-doc n_tokens, top-2-gram
    identity/count/coverage, duplicated-5-gram coverage.

    Plan shape, third iteration (r14 optimization round, guide
    §2.4/§4.2): v1 joined per-(doc,gram) counts back to re-derived
    gram streams (5 corpus scans); v2 (r9) expressed every per-gram
    quantity as doc_id-clustered windows over materialized gram
    streams (3 scans, 3 hash exchanges; repetition_stats 1.92 ->
    1.38 s). v3 observes that EVERY output is a pure function of one
    document's token array — no cross-doc state at all — so the
    whole core now runs as ONE Arrow-batched ``mapInPandas`` pass in
    the scan stage: per doc, gram counts via a hash map, the
    (count desc, gram asc) top-2-gram pick, and both union-coverage
    sweeps over sorted positions, all exact ints. ZERO shuffles
    (v2's three doc_id exchanges carried the full exploded gram
    stream — corpus-token-count rows — through the network; at
    100 TB that is the entire cost of the operator), one corpus
    scan, same oracle. Same-box A/B at sf0.1: repetition_stats
    1.28 -> see OPTIMIZATION_r14.md."""
    return _repetition_core_corpus(_gated_corpus(spark, sf_dir))


def _space_toks(text: str) -> list:
    return [x for x in text.split(" ") if x != ""]


def _union_cov(positions: list, n: int) -> int:
    """Union coverage of fixed-length-n intervals at sorted start
    ``positions``: sum over consecutive starts of min(n, next - pos),
    last start contributes n — the same lag algebra as the v2 window
    form, computed in-row."""
    if not positions:
        return 0
    cov = 0
    for i in range(len(positions) - 1):
        step = positions[i + 1] - positions[i]
        cov += n if step > n else step
    return cov + n


def _rep_measures(t: list) -> tuple:
    """(top2_gram, top2_cnt, cov2, cov5) for one token list — the
    exact algebra of the v2 window form: top 2-gram by (count desc,
    gram asc), union coverage of its occurrences; union coverage of
    all >=2-count 5-grams."""
    from collections import Counter

    top2_gram, top2_cnt, cov2 = "", 0, 0
    if len(t) >= 2:
        g2 = [t[i] + " " + t[i + 1] for i in range(len(t) - 1)]
        counts = Counter(g2)
        # max count, tie -> lexicographically smallest gram (ASCII
        # binary order == Spark UTF8 binary order == DuckDB binary)
        top2_gram, top2_cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        cov2 = _union_cov(
            [i for i, g in enumerate(g2) if g == top2_gram], 2
        )
    cov5 = 0
    if len(t) >= 5:
        g5 = [" ".join(t[i:i + 5]) for i in range(len(t) - 4)]
        c5 = Counter(g5)
        cov5 = _union_cov(
            [i for i, g in enumerate(g5) if c5[g] >= 2], 5
        )
    return top2_gram, top2_cnt, cov2, cov5


def _rep_core_map(batches):
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            t = _space_toks(text)
            n = len(t)
            gram, cnt, cov2, cov5 = _rep_measures(t)
            rows.append((
                int(doc_id), n, gram, cnt,
                cov2 * 1000000 // n if n else 0,
                cov5 * 1000000 // n if n else 0,
            ))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_tokens", "top2_gram", "top2_cnt",
                "top2_cov_micro", "dup5_rate_micro",
            ],
        )


_REP_CORE_SCHEMA = (
    "doc_id long, n_tokens long, top2_gram string, top2_cnt long, "
    "top2_cov_micro long, dup5_rate_micro long"
)


def _repetition_core_corpus(corpus: DataFrame) -> DataFrame:
    from ..session import ship_package, spread_if_narrow

    ship_package(corpus.sparkSession)
    return spread_if_narrow(
        corpus.select("doc_id", "text"), "doc_id"
    ).mapInPandas(_rep_core_map, _REP_CORE_SCHEMA)


def q_repetition_stats(spark, sf_dir):
    """Per-document repetition profile (module docstring)."""
    return _repetition_core(spark, sf_dir)


def q_gopher_quality_filter(spark, sf_dir):
    """Composite Gopher-rule document filter over the same gated
    corpus: word-count bounds, mean-word-length bounds, minimum
    English-stopword containment, and the two repetition ceilings.
    Emits each rule flag (so the gate pins per-rule semantics, not
    just the conjunction) plus the final keep. All rule inputs are
    exact integers; mean word length is micro-chars via integer
    divide (floor — both engines)."""
    return gopher_flags(_docs(spark, sf_dir))


def _gopher_flags_map(key_cols: tuple, key_types: tuple):
    """mapInPandas body computing EVERY gopher rule input + flag per
    document in one scan-stage pass (r14 optimization: the v2 form
    joined a Column-computed base relation against the windowed
    repetition core on doc_id — two more exchanges; every rule input
    is a pure function of one document's text, so nothing here needs
    a shuffle at all). ``key_cols`` pass through untouched so the
    per-(keys) counter rollup needs no join back to the corpus."""
    import re

    stop_en = frozenset(tx.STOPWORDS["en"])
    tok_re = re.compile(r"[^a-z0-9]+")

    def flags(batches):
        import pandas as pd

        cols = [
            "doc_id", *key_cols, "n_words", "mean_wlen_micro",
            "stop_hits", "top2_cov_micro", "dup5_rate_micro",
            "ok_words", "ok_wlen", "ok_stop", "ok_top2", "ok_dup5",
            "keep",
        ]
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for tup in zip(
                pdf["doc_id"], pdf["text"],
                *[pdf[k] for k in key_cols],
            ):
                doc_id, text, keys = tup[0], tup[1], tup[2:]
                t = _space_toks(text)
                n_words = len(t)
                wlen = (
                    sum(len(x) for x in t) * 1000000 // n_words
                    if n_words else 0
                )
                # tx.tokens semantics: split(lower(text), "[^a-z0-9]+"),
                # empties dropped; hits counted WITH multiplicity
                stop_hits = sum(
                    1 for w in tok_re.split(text.lower())
                    if w and w in stop_en
                )
                _g, _c, cov2, cov5 = _rep_measures(t)
                top2 = cov2 * 1000000 // n_words if n_words else 0
                dup5 = cov5 * 1000000 // n_words if n_words else 0
                ok_words = MIN_WORDS <= n_words <= MAX_WORDS
                ok_wlen = (
                    MIN_MEAN_WLEN_MICRO <= wlen <= MAX_MEAN_WLEN_MICRO
                )
                ok_stop = stop_hits >= MIN_STOP_HITS
                ok_top2 = top2 <= MAX_TOP2_COV_MICRO
                ok_dup5 = dup5 <= MAX_DUP5_RATE_MICRO
                rows.append((
                    int(doc_id), *keys, n_words, wlen, stop_hits,
                    top2, dup5, ok_words, ok_wlen, ok_stop, ok_top2,
                    ok_dup5,
                    ok_words and ok_wlen and ok_stop and ok_top2
                    and ok_dup5,
                ))
            yield pd.DataFrame(rows, columns=cols)

    schema = ", ".join(
        ["doc_id long"]
        + [f"{k} {ty}" for k, ty in zip(key_cols, key_types)]
        + [
            "n_words long", "mean_wlen_micro long", "stop_hits long",
            "top2_cov_micro long", "dup5_rate_micro long",
            "ok_words boolean", "ok_wlen boolean", "ok_stop boolean",
            "ok_top2 boolean", "ok_dup5 boolean", "keep boolean",
        ]
    )
    return flags, schema


def _gopher_flags_with(d: DataFrame, keys: tuple = ()) -> DataFrame:
    """gopher_flags with ``keys`` columns carried through the single
    Arrow pass (so per-key rollups skip the doc_id join-back). The
    repetition injection stays a Column expression below the pass —
    one corpus scan, zero exchanges."""
    from ..session import ship_package, spread_if_narrow

    ship_package(d.sparkSession)
    in_types = {f.name: f.dataType.simpleString() for f in d.schema.fields}
    fn, schema = _gopher_flags_map(
        tuple(keys), tuple(in_types[k] for k in keys)
    )
    corpus = _inject_repetition_keyed(d, keys)
    return spread_if_narrow(corpus, "doc_id").mapInPandas(fn, schema)


def _inject_repetition_keyed(d: DataFrame, keys: tuple) -> DataFrame:
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    head = F.concat_ws(" ", F.slice(toks, 1, REPEAT_SLICE))
    return d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % REPEAT_MOD == 0,
            F.concat(F.col("text"), F.lit(" "), head),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        *keys,
    )


def gopher_flags(d: DataFrame) -> DataFrame:
    """Per-doc rule flags for an arbitrary docs relation (doc_id,
    text, ...) — the relation-level form the streaming per-batch
    maintenance calls; q_gopher_quality_filter is this over the full
    corpus. Flags depend on the document ALONE (every rule is
    per-doc), which is exactly what makes the per-source counters
    mergeable across micro-batches — and (r14) what lets the whole
    rule evaluation run as ONE scan-stage Arrow pass with zero
    shuffles (see _gopher_flags_map)."""
    return _gopher_flags_with(d, ())


_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

_SQL_CORPUS = f"""corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % {REPEAT_MOD} = 0 THEN
           text || ' ' || array_to_string(({_SQL_TOKS})[1:{REPEAT_SLICE}], ' ')
         ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM corpus
),
base AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)"""


def _sql_gram(n: int) -> str:
    return " || ' ' || ".join(f"t[i+{k}]" if k else "t[i]" for k in range(n))


_SQL_REP_CORE = f"""{_SQL_CORPUS},
g2 AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, {_sql_gram(2)} AS gram
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM base WHERE len(t) >= 2)
),
cnt2 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
         FROM g2 GROUP BY 1, 2),
top2 AS (
  SELECT doc_id, gram, c FROM cnt2
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) = 1
),
cov2 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN nxt IS NULL THEN 2
                       ELSE least(2, nxt - pos) END) AS BIGINT) AS covered
  FROM (
    SELECT g.doc_id, g.pos,
           lead(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS nxt
    FROM g2 g JOIN top2 s ON g.doc_id = s.doc_id AND g.gram = s.gram
  ) GROUP BY doc_id
),
g5 AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, {_sql_gram(5)} AS gram
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        FROM base WHERE len(t) >= 5)
),
dup5 AS (SELECT doc_id, gram FROM g5 GROUP BY doc_id, gram
         HAVING count(*) >= 2),
cov5 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN nxt IS NULL THEN 5
                       ELSE least(5, nxt - pos) END) AS BIGINT) AS covered
  FROM (
    SELECT g.doc_id, g.pos,
           lead(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS nxt
    FROM g5 g JOIN dup5 s ON g.doc_id = s.doc_id AND g.gram = s.gram
  ) GROUP BY doc_id
),
rep AS (
  SELECT b.doc_id, b.n_tokens,
         coalesce(t2.gram, '') AS top2_gram,
         CAST(coalesce(t2.c, 0) AS BIGINT) AS top2_cnt,
         CAST(CASE WHEN b.n_tokens = 0 THEN 0
                   ELSE coalesce(c2.covered, 0) * 1000000 // b.n_tokens END
           AS BIGINT) AS top2_cov_micro,
         CAST(CASE WHEN b.n_tokens = 0 THEN 0
                   ELSE coalesce(c5.covered, 0) * 1000000 // b.n_tokens END
           AS BIGINT) AS dup5_rate_micro
  FROM base b
  LEFT JOIN top2 t2 ON b.doc_id = t2.doc_id
  LEFT JOIN cov2 c2 ON b.doc_id = c2.doc_id
  LEFT JOIN cov5 c5 ON b.doc_id = c5.doc_id
)"""

ORACLE_REPETITION_STATS = f"""WITH {_SQL_REP_CORE}
SELECT doc_id, n_tokens, top2_gram, top2_cnt, top2_cov_micro,
       dup5_rate_micro
FROM rep
"""

ORACLE_GOPHER_QUALITY = f"""WITH {_SQL_REP_CORE},
q AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(CASE WHEN len(t) = 0 THEN 0
                   ELSE coalesce(list_sum(list_transform(t, x -> len(x))), 0)
                        * 1000000 // len(t) END AS BIGINT)
           AS mean_wlen_micro,
         CAST({tx.sql_stopword_hits(tx.sql_tokens("text"), "en")} AS BIGINT)
           AS stop_hits
  FROM (SELECT doc_id, text, {_SQL_TOKS} AS t FROM corpus)
)
SELECT q.doc_id, q.n_words, q.mean_wlen_micro, q.stop_hits,
       rep.top2_cov_micro, rep.dup5_rate_micro,
       (q.n_words >= {MIN_WORDS} AND q.n_words <= {MAX_WORDS}) AS ok_words,
       (q.mean_wlen_micro >= {MIN_MEAN_WLEN_MICRO}
        AND q.mean_wlen_micro <= {MAX_MEAN_WLEN_MICRO}) AS ok_wlen,
       (q.stop_hits >= {MIN_STOP_HITS}) AS ok_stop,
       (rep.top2_cov_micro <= {MAX_TOP2_COV_MICRO}) AS ok_top2,
       (rep.dup5_rate_micro <= {MAX_DUP5_RATE_MICRO}) AS ok_dup5,
       (q.n_words >= {MIN_WORDS} AND q.n_words <= {MAX_WORDS}
        AND q.mean_wlen_micro >= {MIN_MEAN_WLEN_MICRO}
        AND q.mean_wlen_micro <= {MAX_MEAN_WLEN_MICRO}
        AND q.stop_hits >= {MIN_STOP_HITS}
        AND rep.top2_cov_micro <= {MAX_TOP2_COV_MICRO}
        AND rep.dup5_rate_micro <= {MAX_DUP5_RATE_MICRO}) AS keep
FROM q JOIN rep ON q.doc_id = rep.doc_id
"""

QUERIES = {
    "repetition_stats": q_repetition_stats,
    "gopher_quality_filter": q_gopher_quality_filter,
}

ORACLES = {
    "repetition_stats": ORACLE_REPETITION_STATS,
    "gopher_quality_filter": ORACLE_GOPHER_QUALITY,
}


def q_source_quality_report(spark, sf_dir):
    """Per-source curation dashboard: the rollup a 100 TB pipeline
    actually pages humans with — for every source, how many documents
    survive the composite rule and which rule kills the casualties
    (feed-health companion to ``source_drift_kl``). Built ON the gated
    per-doc flags (one lineage, no recomputation of the rules), joined
    back to the natural corpus for the source key; the rollup itself
    is a map-side-combinable aggregate on a source-bounded group
    space. mean_dup5_micro is an exact integer div, floor on both
    engines."""
    return quality_finalize(quality_counters(_docs(spark, sf_dir)))


QUALITY_COUNTER_COLS = [
    "n_docs", "n_kept", "n_fail_words", "n_fail_wlen", "n_fail_stop",
    "n_fail_top2", "n_fail_dup5", "sum_dup5",
]


def quality_counters(d: DataFrame, keys: tuple = ("source",)) -> DataFrame:
    """Per-``keys`` ADDITIVE counters over an arbitrary docs relation —
    each column is a plain sum over per-doc quantities, so counters
    from disjoint batches merge by per-key summation
    (``merge_quality_counters``): the property the streaming at-ingest
    maintenance relies on, and the map-side-combine property the
    batch rollup relies on — same algebra, two execution modes.
    ``keys`` defaults to the per-source dashboard; the per-language
    feed-health twin passes ("source", "lang") — the group space stays
    bounded by the (source x language) lattice, never the corpus.

    r14: the key columns ride through the single gopher Arrow pass
    (``_gopher_flags_with``), so the rollup goes scan -> flags ->
    groupBy with NO doc_id join-back (the v2 form shuffled the flags
    AND the corpus a second time just to re-attach the keys)."""
    flags = _gopher_flags_with(d, tuple(keys))
    cnt = lambda c: F.sum(F.when(F.col(c), 0).otherwise(1)).cast("long")
    return (
        flags
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            cnt("ok_words").alias("n_fail_words"),
            cnt("ok_wlen").alias("n_fail_wlen"),
            cnt("ok_stop").alias("n_fail_stop"),
            cnt("ok_top2").alias("n_fail_top2"),
            cnt("ok_dup5").alias("n_fail_dup5"),
            F.sum("dup5_rate_micro").cast("long").alias("sum_dup5"),
        )
    )


def merge_quality_counters(
    a: DataFrame, b: DataFrame, keys: tuple = ("source",)
) -> DataFrame:
    """Counter merge = per-key summation (disjoint-batch algebra)."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(*[F.sum(c).cast("long").alias(c) for c in QUALITY_COUNTER_COLS])
    )


def quality_finalize(
    counters: DataFrame, keys: tuple = ("source",)
) -> DataFrame:
    """Counters -> the report shape (mean is derived at FINALIZE from
    the additive sum/count pair, never maintained directly)."""
    return counters.select(
        *keys, "n_docs", "n_kept", "n_fail_words", "n_fail_wlen",
        "n_fail_stop", "n_fail_top2", "n_fail_dup5",
        F.expr("sum_dup5 div n_docs").cast("long").alias("mean_dup5_micro"),
    ).orderBy(*keys)


ORACLE_SOURCE_QUALITY = f"""
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN g.ok_words THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_words,
       CAST(sum(CASE WHEN g.ok_wlen THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_wlen,
       CAST(sum(CASE WHEN g.ok_stop THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_stop,
       CAST(sum(CASE WHEN g.ok_top2 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_top2,
       CAST(sum(CASE WHEN g.ok_dup5 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_dup5,
       CAST(sum(g.dup5_rate_micro) // count(*) AS BIGINT)
         AS mean_dup5_micro
FROM ({ORACLE_GOPHER_QUALITY}) g
JOIN documents d ON g.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""

QUERIES["source_quality_report"] = q_source_quality_report
ORACLES["source_quality_report"] = ORACLE_SOURCE_QUALITY


ORACLE_LANG_QUALITY = f"""
SELECT d.source, d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN g.ok_words THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_words,
       CAST(sum(CASE WHEN g.ok_wlen THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_wlen,
       CAST(sum(CASE WHEN g.ok_stop THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_stop,
       CAST(sum(CASE WHEN g.ok_top2 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_top2,
       CAST(sum(CASE WHEN g.ok_dup5 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fail_dup5,
       CAST(sum(g.dup5_rate_micro) // count(*) AS BIGINT)
         AS mean_dup5_micro
FROM ({ORACLE_GOPHER_QUALITY}) g
JOIN documents d ON g.doc_id = d.doc_id
GROUP BY d.source, d.lang
ORDER BY d.source, d.lang
"""
