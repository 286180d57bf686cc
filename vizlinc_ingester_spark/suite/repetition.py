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

from pyspark.sql import DataFrame, SparkSession, Window
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


def _grams(base: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, gram): all n-grams with their 0-based start slot.
    Scan-stage: sequence + slice HOFs over the token array, then one
    posexplode — no shuffle, no Python."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
    )
    return (
        base.filter(F.size("t") >= n)
        .select("doc_id", F.posexplode(grams).alias("pos", "gram"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "gram")
    )


def _repetition_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lineage for both queries: per-doc n_tokens, top-2-gram
    identity/count/coverage, duplicated-5-gram coverage.

    Plan shape (iterated — the first version groupBy'd per-(doc,gram)
    counts and joined them BACK to a re-derived gram stream, costing 5
    corpus scans): each gram stream is materialized ONCE and every
    per-gram quantity is a window over it — count(*) over (doc, gram),
    dense_rank over (doc) ordered by (count desc, gram asc) whose
    rank-1 rows are exactly the top gram's positions, lead(pos) for
    the union-coverage step. All three windows cluster on doc_id, so
    EnsureRequirements plans ONE hash exchange per stream
    (HashPartitioning(doc_id) satisfies the (doc_id, gram) clustering
    too) and the corpus is scanned 3x total (base + one per gram
    order) instead of 5x, with zero join-backs. A/B warm best-of-3 at
    sf0.1, same session config (PLANS.md r9): repetition_stats
    1.92 -> 1.38 s, gopher_quality_filter 2.10 -> 1.53 s."""
    return _repetition_core_corpus(_gated_corpus(spark, sf_dir))


def _repetition_core_corpus(corpus: DataFrame) -> DataFrame:
    base = corpus.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    ).select("doc_id", "t", F.size("t").cast("long").alias("n_tokens"))

    w_cnt = Window.partitionBy("doc_id", "gram")
    w_pos = Window.partitionBy("doc_id").orderBy("pos")

    def _step(n):
        return F.when(F.col("nxt").isNull(), F.lit(n)).otherwise(
            F.least(F.lit(n), F.col("nxt") - F.col("pos"))
        )

    g2 = _grams(base, 2).withColumn(
        "c", F.count(F.lit(1)).over(w_cnt).cast("long")
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
    top2 = (
        g2.withColumn("rk", F.dense_rank().over(w_rank))
        .filter(F.col("rk") == 1)
        .withColumn("nxt", F.lead("pos").over(w_pos))
        .groupBy("doc_id")
        .agg(
            F.min("gram").alias("top2_gram"),
            F.max("c").cast("long").alias("c"),
            F.sum(_step(2)).cast("long").alias("cov2"),
        )
    )

    cov5 = (
        _grams(base, 5)
        .withColumn("c", F.count(F.lit(1)).over(w_cnt))
        .filter(F.col("c") >= 2)
        .withColumn("nxt", F.lead("pos").over(w_pos))
        .groupBy("doc_id")
        .agg(F.sum(_step(5)).cast("long").alias("cov5"))
    )

    # integer div, not float /: Spark's long `div` truncation equals
    # DuckDB's integer `//` floor on these non-negative operands, with
    # no double-rounding hazard on exact quotients
    return (
        base.select("doc_id", "n_tokens")
        .join(top2, "doc_id", "left")
        .join(cov5, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("top2_gram", F.lit("")).alias("top2_gram"),
            F.coalesce("c", F.lit(0)).cast("long").alias("top2_cnt"),
            # n_tokens = 0 guard (empty/whitespace-only doc): Spark 4
            # ANSI mode THROWS on div-by-zero while DuckDB yields
            # NULL — an unguarded div would crash here and silently
            # diverge there on a future regenerated fixture
            F.expr(
                "CASE WHEN n_tokens = 0 THEN 0L "
                "ELSE coalesce(cov2, 0L) * 1000000 div n_tokens END"
            ).cast("long").alias("top2_cov_micro"),
            F.expr(
                "CASE WHEN n_tokens = 0 THEN 0L "
                "ELSE coalesce(cov5, 0L) * 1000000 div n_tokens END"
            ).cast("long").alias("dup5_rate_micro"),
        )
    )


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


def gopher_flags(d: DataFrame) -> DataFrame:
    """Per-doc rule flags for an arbitrary docs relation (doc_id,
    text, ...) — the relation-level form the streaming per-batch
    maintenance calls; q_gopher_quality_filter is this over the full
    corpus. Flags depend on the document ALONE (every rule is
    per-doc), which is exactly what makes the per-source counters
    mergeable across micro-batches."""
    corpus = _inject_repetition(d)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = corpus.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("n_word_chars"),
        tx.stopword_hits(tx.tokens(F.col("text")), "en")
        .cast("long")
        .alias("stop_hits"),
    ).select(
        "doc_id",
        "n_words",
        F.expr(
            "CASE WHEN n_words = 0 THEN 0L "
            "ELSE n_word_chars * 1000000 div n_words END"
        ).alias("mean_wlen_micro"),
        "stop_hits",
    )
    rep = _repetition_core_corpus(corpus).select(
        "doc_id", "top2_cov_micro", "dup5_rate_micro"
    )
    j = base.join(rep, "doc_id")
    rules = {
        "ok_words": (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS),
        "ok_wlen": (F.col("mean_wlen_micro") >= MIN_MEAN_WLEN_MICRO)
        & (F.col("mean_wlen_micro") <= MAX_MEAN_WLEN_MICRO),
        "ok_stop": F.col("stop_hits") >= MIN_STOP_HITS,
        "ok_top2": F.col("top2_cov_micro") <= MAX_TOP2_COV_MICRO,
        "ok_dup5": F.col("dup5_rate_micro") <= MAX_DUP5_RATE_MICRO,
    }
    out = j
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = rules["ok_words"]
    for name in list(rules)[1:]:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep).select(
        "doc_id", "n_words", "mean_wlen_micro", "stop_hits",
        "top2_cov_micro", "dup5_rate_micro",
        "ok_words", "ok_wlen", "ok_stop", "ok_top2", "ok_dup5", "keep",
    )


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
    bounded by the (source x language) lattice, never the corpus."""
    flags = gopher_flags(d)
    src = d.select("doc_id", *keys)
    cnt = lambda c: F.sum(F.when(F.col(c), 0).otherwise(1)).cast("long")
    return (
        flags.join(src, "doc_id")
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
