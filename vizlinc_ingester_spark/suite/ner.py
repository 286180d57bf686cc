"""Learned-tagger queries: the NER model seam exercised by a model
that is actually TRAINED from the S10 (token, tag) path, not a
dictionary (r5 verdict item 6; reference
src/EntityExtractor.groovy:12-14 + src/XMLToTSVConverter.groovy:28-42).

Pipeline under the gate:

1. TRAIN split (doc_id % 2 == 0): documents rendered as
   entity-annotated XML (gold tags = the deterministic md5 type
   buckets the synthetic mentions already use; DATE-bucket words left
   untagged -> class 'O'), parsed back through the REAL S10 converter
   (``xml_to_token_tags``) into (token, tag) rows, then
   ``train_tagger`` learns the unigram + suffix-backoff model.
2. APPLY split (doc_id % 2 == 1): raw text through the same S10
   tokenizer, tagged by broadcast-joining the learned model.

The DuckDB oracles derive the same (token, tag) algebra directly —
so a hash match proves the whole loop: the XML render/parse
round-trip preserves every token, training counts and argmax
tie-breaks agree, and application (exact match, suffix backoff,
default) picks identical tags cross-engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import xml_to_token_tags
from ..operators.mentions import _type_from_word
from ..operators.tagger import SUFFIX_LEN, TAG_CLASSES, apply_tagger, train_tagger
from ..oracle import _sql_type_case


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _tagged_xml(d: DataFrame) -> DataFrame:
    """Render each document as entity-annotated XML: words whose gold
    class is in TAG_CLASSES get a <CLASS>word</CLASS> span, the rest
    stay untagged ('O' after conversion). Pure Column logic — the
    corpus is clean alphanumerics (no XML metachars), which the gate
    itself re-proves every round (a '<' in a word would desync the
    token streams and hash-mismatch)."""

    def wrap(w):
        gold = _type_from_word(w)
        return F.when(
            gold.isin(*TAG_CLASSES) & (w != ""),
            F.concat(
                F.lit("<"), gold, F.lit(">"), w, F.lit("</"), gold, F.lit(">")
            ),
        ).otherwise(w)

    return d.select(
        "doc_id", F.concat_ws(" ", F.transform(F.split("text", " "), wrap)).alias("xml")
    )


def _models(spark: SparkSession, sf_dir: str):
    """Train once per (session, input plan) — a trained model is a
    build-once/apply-many artifact (same memo semantics as the PQ
    codebook and the IVF index); the model tables are persisted so
    the apply query's two broadcast sides don't re-run training."""
    from ..session import plan_key, plan_memo

    train_docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)

    def build():
        token_tags = xml_to_token_tags(_tagged_xml(train_docs))
        tm, sm = train_tagger(token_tags)
        tm, sm = tm.persist(), sm.persist()
        tm.count(), sm.count()
        return tm, sm

    return plan_memo(spark, plan_key(train_docs, "ner_models"), build)


def q_ner_learned_model(spark, sf_dir):
    """The learned token model itself (token -> most frequent tag,
    with its count): proves the S10 render/parse/count/argmax half."""
    token_model, _ = _models(spark, sf_dir)
    return token_model.select("token", "tag", "cnt")


def q_ner_learned(spark, sf_dir):
    """Held-out tagging: the apply half. Output one row per token of
    the odd-doc_id docs with the predicted tag and which model level
    fired ('token' exact, 'suffix' backoff, 'default' O)."""
    token_model, suffix_model = _models(spark, sf_dir)
    held = _docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 1)
    toks = xml_to_token_tags(
        held.select("doc_id", F.col("text").alias("xml"))
    ).select("doc_id", "token", F.col("token_seq").cast("long").alias("idx"))
    return apply_tagger(toks, token_model, suffix_model).select(
        "doc_id", "idx", "token", "pred_tag", "model_src"
    )


def _labeled_ctes() -> str:
    type_case = _sql_type_case()
    return f"""
words AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  ) u WHERE word <> ''
),
labeled AS (
  SELECT doc_id, word AS token,
         CASE WHEN {type_case} IN ('PERSON','ORGANIZATION','LOCATION')
              THEN {type_case} ELSE 'O' END AS tag
  FROM words
),
tok_counts AS (
  SELECT token, tag, CAST(count(*) AS BIGINT) AS cnt
  FROM labeled WHERE doc_id % 2 = 0 GROUP BY token, tag
),
token_model AS (
  SELECT token, tag, cnt FROM tok_counts
  QUALIFY row_number() OVER (PARTITION BY token ORDER BY cnt DESC, tag ASC) = 1
),
suf_counts AS (
  SELECT right(token, {SUFFIX_LEN}) AS suffix, tag,
         CAST(count(*) AS BIGINT) AS cnt
  FROM labeled WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
suffix_model AS (
  SELECT suffix, tag, cnt FROM suf_counts
  QUALIFY row_number() OVER (PARTITION BY suffix ORDER BY cnt DESC, tag ASC) = 1
)"""


ORACLE_NER_MODEL = f"""
WITH {_labeled_ctes()}
SELECT token, tag, cnt FROM token_model
"""

ORACLE_NER_LEARNED = f"""
WITH {_labeled_ctes()},
heldout AS (
  SELECT doc_id, word AS token,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
              AS BIGINT) AS idx
  FROM words WHERE doc_id % 2 = 1
)
SELECT h.doc_id, h.idx, h.token,
       coalesce(tm.tag, sm.tag, 'O') AS pred_tag,
       CASE WHEN tm.tag IS NOT NULL THEN 'token'
            WHEN sm.tag IS NOT NULL THEN 'suffix'
            ELSE 'default' END AS model_src
FROM heldout h
LEFT JOIN token_model tm ON h.token = tm.token
LEFT JOIN suffix_model sm ON right(h.token, {SUFFIX_LEN}) = sm.suffix
"""

QUERIES = {
    "ner_learned_model": q_ner_learned_model,
    "ner_learned": q_ner_learned,
}

ORACLES = {
    "ner_learned_model": ORACLE_NER_MODEL,
    "ner_learned": ORACLE_NER_LEARNED,
}


# --- context (bigram) tagger — round 7 -------------------------------------
#
# The reference model is a context-sensitive CRF
# (src/EntityExtractor.groovy:12-14): the same surface word can get
# different tags in different contexts. The unigram pair above cannot
# express that, so this variant (a) uses a CONTEXT-SENSITIVE gold
# annotation — the md5 type bucket of "prev word" instead of "word",
# the deterministic stand-in for context-dependent labels — and
# (b) learns a (prev_token, token) bigram model with the backoff
# chain bigram -> unigram -> suffix -> 'O'. gold_tag and a correct
# flag ride along in the gated output so tag accuracy is auditable
# from the hash-proven rows themselves. Measured held-out accuracy
# (PLANS.md "Round-8 plan work", both models trained on the same
# pass): bigram 0.9996 at sf0.01 / 1.0000 at sf0.1 vs unigram-only
# 0.3966 / 0.3995 on the identical gold.

from ..operators.tagger import CTX_BOS, apply_tagger_ctx, train_tagger_ctx


def _type_from_ctx(prev, word):
    return _type_from_word(F.concat(prev, F.lit(" "), word))


def _ctx_tokens(d: DataFrame) -> DataFrame:
    """docs -> (doc_id, idx, token, prev): the S10 tokenizer stream
    with the previous token (CTX_BOS at document start). One doc_id
    window shuffle — the same per-doc axis every coref operator keys
    on."""
    from pyspark.sql import Window

    toks = xml_to_token_tags(
        d.select("doc_id", F.col("text").alias("xml"))
    ).select("doc_id", "token", F.col("token_seq").cast("long").alias("idx"))
    w = Window.partitionBy("doc_id").orderBy("idx")
    return toks.withColumn(
        "prev", F.coalesce(F.lag("token").over(w), F.lit(CTX_BOS))
    )


def _gold_ctx_tag():
    t = _type_from_ctx(F.col("prev"), F.col("token"))
    return F.when(t.isin(*TAG_CLASSES), t).otherwise(F.lit("O"))


def _models_ctx(spark: SparkSession, sf_dir: str):
    from ..session import plan_key, plan_memo

    train_docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)

    def build():
        token_tags = _ctx_tokens(train_docs).withColumn(
            "tag", _gold_ctx_tag()
        )
        bm, tm, sm = train_tagger_ctx(token_tags)
        bm, tm, sm = bm.persist(), tm.persist(), sm.persist()
        bm.count(), tm.count(), sm.count()
        return bm, tm, sm

    return plan_memo(spark, plan_key(train_docs, "ner_models_ctx"), build)


def q_ner_learned_ctx(spark, sf_dir):
    """Held-out tagging with the context model: one row per token of
    the odd-doc_id docs with the bigram-backoff prediction, which
    model level fired, the context-sensitive gold tag, and a correct
    flag — accuracy is sum(correct)/count over the gated rows."""
    bigram_model, token_model, suffix_model = _models_ctx(spark, sf_dir)
    held = _docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 1)
    toks = _ctx_tokens(held)
    tagged = apply_tagger_ctx(toks, bigram_model, token_model, suffix_model)
    return tagged.select(
        "doc_id", "idx", "token", "pred_tag", "model_src",
        _gold_ctx_tag().alias("gold_tag"),
        (F.col("pred_tag") == _gold_ctx_tag()).cast("long").alias("correct"),
    )


def _sql_type_case_on(expr: str) -> str:
    from ..operators.mentions import TYPE_BUCKETS

    whens = " ".join(
        "WHEN substr(md5({}),1,1) IN ({}) THEN '{}'".format(
            expr, ", ".join(f"'{ch}'" for ch in chars), t
        )
        for chars, t in TYPE_BUCKETS
    )
    return f"CASE {whens} END"


def _ctx_ctes() -> str:
    gold_case = _sql_type_case_on("prev || ' ' || token")
    return f"""
words AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  ) u WHERE word <> ''
),
seq AS (
  SELECT doc_id, word AS token,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
              AS BIGINT) AS idx
  FROM words
),
ctx AS (
  SELECT doc_id, idx, token,
         lag(token, 1, '{CTX_BOS}') OVER (
             PARTITION BY doc_id ORDER BY idx) AS prev
  FROM seq
),
labeled AS (
  SELECT doc_id, idx, token, prev,
         CASE WHEN {gold_case} IN ('PERSON','ORGANIZATION','LOCATION')
              THEN {gold_case} ELSE 'O' END AS tag
  FROM ctx
),
big_counts AS (
  SELECT prev, token, tag, CAST(count(*) AS BIGINT) AS cnt
  FROM labeled WHERE doc_id % 2 = 0 GROUP BY prev, token, tag
),
bigram_model AS (
  SELECT prev, token, tag, cnt FROM big_counts
  QUALIFY row_number() OVER (
      PARTITION BY prev, token ORDER BY cnt DESC, tag ASC) = 1
),
tok_counts AS (
  SELECT token, tag, CAST(count(*) AS BIGINT) AS cnt
  FROM labeled WHERE doc_id % 2 = 0 GROUP BY token, tag
),
token_model AS (
  SELECT token, tag, cnt FROM tok_counts
  QUALIFY row_number() OVER (PARTITION BY token ORDER BY cnt DESC, tag ASC) = 1
),
suf_counts AS (
  SELECT right(token, {SUFFIX_LEN}) AS suffix, tag,
         CAST(count(*) AS BIGINT) AS cnt
  FROM labeled WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
suffix_model AS (
  SELECT suffix, tag, cnt FROM suf_counts
  QUALIFY row_number() OVER (PARTITION BY suffix ORDER BY cnt DESC, tag ASC) = 1
)"""


ORACLE_NER_LEARNED_CTX = f"""
WITH {_ctx_ctes()}
SELECT h.doc_id, h.idx, h.token,
       coalesce(bm.tag, tm.tag, sm.tag, 'O') AS pred_tag,
       CASE WHEN bm.tag IS NOT NULL THEN 'bigram'
            WHEN tm.tag IS NOT NULL THEN 'token'
            WHEN sm.tag IS NOT NULL THEN 'suffix'
            ELSE 'default' END AS model_src,
       h.tag AS gold_tag,
       CAST(coalesce(bm.tag, tm.tag, sm.tag, 'O') = h.tag AS BIGINT)
           AS correct
FROM labeled h
LEFT JOIN bigram_model bm ON h.prev = bm.prev AND h.token = bm.token
LEFT JOIN token_model tm ON h.token = tm.token
LEFT JOIN suffix_model sm ON right(h.token, {SUFFIX_LEN}) = sm.suffix
WHERE h.doc_id % 2 = 1
"""

QUERIES["ner_learned_ctx"] = q_ner_learned_ctx
ORACLES["ner_learned_ctx"] = ORACLE_NER_LEARNED_CTX
