"""Training-data curation operators (LLM-pipeline track, beyond the
reference's surface): context-window chunking, benchmark
decontamination, PII redaction, and repetition scoring — the four
standard passes between "crawled corpus" and "training mix" that the
dedup/quality/language stages (suite/dedup.py, functions/text.py)
don't cover.

All pure Column logic (scan-stage, whole-stage codegen; the only
shuffles are the keyed aggregations), each under a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_TOKENS = 64  # context-window size (tokens)
CHUNK_STRIDE = 48  # overlap = CHUNK_TOKENS - CHUNK_STRIDE
DECON_N = 5  # n-gram order for decontamination
BENCH_MOD = 97  # doc_id % 97 == 0 -> the held-out "benchmark" set
REP_N = 3  # n-gram order for repetition scoring

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
_PHONE_RE = r"\+?[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def q_doc_chunking(spark, sf_dir):
    """Split every document into CHUNK_TOKENS-token windows with
    CHUNK_STRIDE stride (overlapping context windows — the tokenize &
    pack step of a pretraining pipeline). One scan, no shuffle at
    all: tokens, window starts (``sequence``) and slices are array
    expressions; ``posexplode`` multiplies rows in the scan stage. At
    100 TB this is the shape you want — chunking is embarrassingly
    parallel and never leaves the input partitioning."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    return (
        d.filter(F.length("text") > 0)
        .select("doc_id", toks.alias("toks"), F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(CHUNK_TOKENS), F.size("toks") - F.col("start")
            ).cast("long").alias("n_chunk_tokens"),
        )
    )


ORACLE_DOC_CHUNKING = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
  FROM documents WHERE len(text) > 0
),
idx AS (SELECT unnest(range(4096)) AS i)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(t[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')
         AS chunk_text,
       CAST(least({CHUNK_TOKENS}, n - i*{CHUNK_STRIDE}) AS BIGINT)
         AS n_chunk_tokens
FROM toks JOIN idx ON i * {CHUNK_STRIDE} < n
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    {DECON_N}-gram with the held-out set (doc_id % BENCH_MOD == 0 —
    self-deriving fixture). The held-out grams are DISTINCT'd and
    broadcast (a real eval suite is tiny next to the corpus), so the
    corpus side never shuffles for the join; the per-doc rollup is the
    one keyed aggregation. Output: per contaminated doc, how many of
    its grams are tainted — the score used to drop or quarantine."""
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("t"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - DECON_N),
        lambda i: F.array_join(F.slice(F.col("t"), i + 1, DECON_N), " "),
    )
    with_grams = d.filter(F.size("t") >= DECON_N).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )
    bench = (
        with_grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("gram")
        .distinct()
    )
    train = with_grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = train.join(F.broadcast(bench), "gram")
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tainted_grams"))
        .select("doc_id", "n_tainted_grams")
    )


ORACLE_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {DECON_N}
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i+1 : i+{DECON_N}], ' ') AS gram
  FROM toks JOIN (SELECT unnest(range(4096)) AS i) idx
    ON i <= len(t) - {DECON_N}
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {BENCH_MOD} = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_tainted_grams
FROM grams g JOIN bench b USING (gram)
WHERE g.doc_id % {BENCH_MOD} != 0
GROUP BY g.doc_id
"""


def q_pii_redact(spark, sf_dir):
    """PII scrubbing: find-and-mask emails and phone numbers, with
    per-doc counts. The synthetic corpus carries no PII, so the
    fixture injects deterministic contact lines into a doc_id-keyed
    subset first (same self-deriving trick as dedup_exact's re-crawl)
    — the oracle injects identically and must produce the identical
    redacted text. Pure regexp Column logic: at 100 TB redaction is a
    scan-stage rewrite, no shuffle."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    injected = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" call 555-01"),
                F.lpad((F.col("doc_id") % 10).cast("string"), 1, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
    )
    with_pii = d.select("doc_id", injected.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>",
    )
    return with_pii.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0))
        .cast("long").alias("n_phones"),
        redacted.alias("text_redacted"),
    )


ORACLE_PII_REDACT = f"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com now'
              WHEN doc_id % 7 = 0
              THEN text || ' call 555-01' || CAST(doc_id % 10 AS VARCHAR)
                   || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS text_redacted
FROM injected
"""


def q_repetition_scores(spark, sf_dir):
    """Gopher-style repetition signal: fraction of duplicated
    {REP_N}-grams per document (high ratio = boilerplate/spam, a
    standard drop rule). Grams are array expressions; the distinct
    count happens inside one per-doc aggregation — corpus never
    shuffles wider than (doc_id)."""
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("t"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - REP_N),
        lambda i: F.array_join(F.slice(F.col("t"), i + 1, REP_N), " "),
    )
    return (
        d.filter(F.size("t") >= REP_N)
        .select(
            "doc_id",
            F.size(grams).cast("long").alias("n_grams"),
            F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("n_grams") - F.col("n_distinct")).alias("n_dup_grams"),
            ((F.col("n_grams") - F.col("n_distinct")) * 1_000_000
             / F.col("n_grams")).cast("long").alias("dup_micro"),
        )
    )


ORACLE_REPETITION = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {REP_N}
),
grams AS (
  SELECT doc_id, array_to_string(t[i+1 : i+{REP_N}], ' ') AS gram
  FROM toks JOIN (SELECT unnest(range(4096)) AS i) idx
    ON i <= len(t) - {REP_N}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) - count(DISTINCT gram) AS BIGINT) AS n_dup_grams,
       CAST((count(*) - count(DISTINCT gram)) * 1000000 // count(*) AS BIGINT)
         AS dup_micro
FROM grams GROUP BY doc_id
"""


QUERIES = {
    "doc_chunking": q_doc_chunking,
    "decontaminate_ngrams": q_decontaminate,
    "pii_redact": q_pii_redact,
    "repetition_scores": q_repetition_scores,
}

ORACLES = {
    "doc_chunking": ORACLE_DOC_CHUNKING,
    "decontaminate_ngrams": ORACLE_DECONTAMINATE,
    "pii_redact": ORACLE_PII_REDACT,
    "repetition_scores": ORACLE_REPETITION,
}


PACK_BUDGET = 256  # tokens per training sequence


def q_sequence_packing(spark, sf_dir):
    """Pack chunked documents into fixed token budgets — the step
    between chunking and batching in a pretraining pipeline. Greedy
    in-order packing is inherently sequential, so the scalable rule
    used here is cumulative-sum binning per language stratum: chunks
    are ordered deterministically inside each lang, and a chunk whose
    running token total crosses a PACK_BUDGET boundary starts the next
    pack. One keyed window (partitioned by lang — bounded state per
    partition), no global sort; at 100 TB the stratum key would be
    (lang, shard) to bound partition width, same plan shape.

    Output: (lang, doc_id, chunk_idx, n_chunk_tokens, pack_id,
    pack_offset) where pack_offset is the chunk's starting token
    position inside its pack."""
    from pyspark.sql import Window

    chunks = q_doc_chunking(spark, sf_dir).select(
        "doc_id", "chunk_idx", "n_chunk_tokens"
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    c = chunks.join(d, "doc_id")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chunk_tokens").over(w)
    return c.select(
        "lang", "doc_id", "chunk_idx", "n_chunk_tokens",
        F.floor((cum - F.col("n_chunk_tokens")) / PACK_BUDGET)
        .cast("long").alias("pack_id"),
        ((cum - F.col("n_chunk_tokens")) % PACK_BUDGET)
        .cast("long").alias("pack_offset"),
    )


ORACLE_SEQUENCE_PACKING = f"""
WITH chunks AS ({ORACLE_DOC_CHUNKING.strip()}),
with_lang AS (
  SELECT d.lang, c.doc_id, c.chunk_idx, c.n_chunk_tokens,
         sum(c.n_chunk_tokens) OVER (
           PARTITION BY d.lang ORDER BY c.doc_id, c.chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM chunks c JOIN documents d USING (doc_id)
)
SELECT lang, doc_id, chunk_idx, n_chunk_tokens,
       CAST((cum - n_chunk_tokens) // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST((cum - n_chunk_tokens) % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM with_lang
"""

QUERIES["sequence_packing"] = q_sequence_packing
ORACLES["sequence_packing"] = ORACLE_SEQUENCE_PACKING


QUALITY_MIN_MICRO = 300_000  # keep docs with quality >= 0.30
REP_MAX_MICRO = 500_000  # drop docs with > 50% duplicated 3-grams


def q_curation_funnel(spark, sf_dir):
    """The end-to-end corpus->training-mix funnel, composed from the
    individually-gated stages: language ID + quality score +
    repetition score as scan-stage projections, exact-dup keeper
    selection as one md5 groupBy, then the filter conjunction. Output
    is the per-language survivor profile (docs kept, tokens kept) —
    what a mixing recipe consumes. One corpus scan + one tiny
    aggregation per stage; a hash match here proves the STAGES
    COMPOSE (same row set survives in both engines), which the
    per-stage gates alone don't show."""
    from ..functions import text as tx

    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - REP_N),
        lambda i: F.array_join(F.slice(toks, i + 1, REP_N), " "),
    )
    dup_micro = F.when(
        F.size(toks) < REP_N, F.lit(0)
    ).otherwise(
        ((F.size(grams) - F.size(F.array_distinct(grams))) * 1_000_000
         / F.size(grams)).cast("long")
    )
    scored = d.select(
        "doc_id",
        "text",
        tx.lang_id(F.col("text")).alias("pred_lang"),
        tx.quality_score_micro(F.col("text")).alias("quality_micro"),
        tx.whitespace_token_count(F.col("text")).cast("long").alias("n_tokens"),
        dup_micro.alias("dup_micro"),
        F.md5("text").alias("content_md5"),
    )
    keeper = scored.groupBy("content_md5").agg(
        F.min("doc_id").alias("keep_doc_id")
    )
    kept = (
        scored.join(F.broadcast(keeper), "content_md5")
        .filter(F.col("doc_id") == F.col("keep_doc_id"))
        .filter(F.col("quality_micro") >= QUALITY_MIN_MICRO)
        .filter(F.col("dup_micro") <= REP_MAX_MICRO)
    )
    return (
        kept.groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("first_doc_id"),
        )
        .orderBy("pred_lang")
    )


def _funnel_oracle() -> str:
    from ..functions import text as tx

    return f"""
WITH scored AS (
  SELECT doc_id, text,
         {tx.sql_lang_id('text')} AS pred_lang,
         {tx.sql_quality_score_micro('text')} AS quality_micro,
         {tx.sql_whitespace_token_count('text')} AS n_tokens,
         CASE WHEN len(string_split(text, ' ')) < {REP_N} THEN 0 ELSE (
           SELECT CAST((count(*) - count(DISTINCT g)) * 1000000 // count(*) AS BIGINT)
           FROM (
             SELECT array_to_string((string_split(text, ' '))[i+1 : i+{REP_N}], ' ') AS g
             FROM (SELECT unnest(range(4096)) AS i) ix
             WHERE i <= len(string_split(text, ' ')) - {REP_N}
           ) gg
         ) END AS dup_micro,
         md5(text) AS content_md5
  FROM documents
),
keeper AS (
  SELECT content_md5, min(doc_id) AS keep_doc_id FROM scored GROUP BY content_md5
)
SELECT pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id
FROM scored JOIN keeper USING (content_md5)
WHERE doc_id = keep_doc_id
  AND quality_micro >= {QUALITY_MIN_MICRO}
  AND dup_micro <= {REP_MAX_MICRO}
GROUP BY pred_lang
ORDER BY pred_lang
"""


QUERIES["curation_funnel"] = q_curation_funnel
ORACLES["curation_funnel"] = _funnel_oracle()
