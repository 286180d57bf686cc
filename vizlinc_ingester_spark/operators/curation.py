"""Training-data curation operators as composable DataFrame -> DataFrame
transforms (LLM-pipeline track; no counterpart in the reference — this
is the layer a 100 TB pretraining corpus needs between "crawled" and
"training mix"). The oracle-gated queries in ``suite/curation.py`` are
thin wrappers over these, so the driver's hash gate proves the same
code the ingest pipeline (``plans/ingest.py``) runs.

Scale notes per op:
- chunking: pure array expressions + posexplode — stays in the scan
  stage, never leaves the input partitioning.
- decontamination: the held-out gram set is DISTINCT'd then broadcast
  (an eval suite is tiny next to any corpus); the corpus side never
  shuffles for the join, only for the per-doc rollup.
- PII redaction: scan-stage regexp rewrites, zero shuffle.
- packing: one keyed window per stratum (lang; (lang, shard) at
  100 TB) — bounded state, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_TOKENS = 64  # context-window size (tokens)
CHUNK_STRIDE = 48  # overlap = CHUNK_TOKENS - CHUNK_STRIDE
DECON_N = 5  # n-gram order for decontamination
REP_N = 3  # n-gram order for repetition scoring
PACK_BUDGET = 256  # tokens per packed training sequence

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PHONE_RE = r"\+?[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens): overlapping
    CHUNK_TOKENS-token windows with STRIDE step. Embarrassingly
    parallel — array expressions only."""
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    return (
        docs.filter(F.length(text_col) > 0)
        .select(
            "doc_id", toks.alias("toks"),
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.size("toks") - F.col("start"))
            .cast("long").alias("n_chunk_tokens"),
        )
    )


def doc_ngrams(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(doc_id, gram): each document's DISTINCT whitespace n-grams —
    the shared primitive of decontamination and repetition scoring."""
    t = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.array_join(F.slice(t, i + 1, n), " "),
    )
    return docs.filter(F.size(t) >= n).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def decontaminate_scores(
    docs: DataFrame, bench_grams: DataFrame, n: int = DECON_N
) -> DataFrame:
    """(doc_id, n_tainted_grams) for every training doc sharing at
    least one n-gram with the held-out set. ``bench_grams`` is a
    1-column (gram) DataFrame — DISTINCT'd and broadcast here, so the
    corpus side's only shuffle is the per-doc rollup."""
    train = doc_ngrams(docs, n)
    hits = train.join(F.broadcast(bench_grams.select("gram").distinct()), "gram")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tainted_grams")
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_emails / n_phones counts and a ``text_redacted`` column
    with emails and phone numbers masked. Scan-stage regexp only."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>",
    )
    return docs.withColumns(
        {
            "n_emails": F.size(
                F.regexp_extract_all(text_col, F.lit(EMAIL_RE), 0)
            ).cast("long"),
            "n_phones": F.size(
                F.regexp_extract_all(text_col, F.lit(PHONE_RE), 0)
            ).cast("long"),
            "text_redacted": redacted,
        }
    )


def pack_chunks(
    chunks: DataFrame, doc_strata: DataFrame, budget: int = PACK_BUDGET
) -> DataFrame:
    """Cumulative-sum binning of chunks into fixed token budgets per
    stratum (greedy in-order packing made parallel): (lang, doc_id,
    chunk_idx, n_chunk_tokens, pack_id, pack_offset). ``doc_strata``
    maps doc_id -> lang (the stratum key; use (lang, shard) at scale
    to bound partition width)."""
    c = chunks.select("doc_id", "chunk_idx", "n_chunk_tokens").join(
        doc_strata.select("doc_id", "lang"), "doc_id"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chunk_tokens").over(w)
    return c.select(
        "lang", "doc_id", "chunk_idx", "n_chunk_tokens",
        F.floor((cum - F.col("n_chunk_tokens")) / budget)
        .cast("long").alias("pack_id"),
        ((cum - F.col("n_chunk_tokens")) % budget)
        .cast("long").alias("pack_offset"),
    )
