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
