"""Learned NER tagger behind the model seam (SURVEY.md §2.11, round 6).

The reference ships a *trained* CRF classifier as its extraction
model (src/EntityExtractor.groovy:12-14) and a tool that produces
``(token, tag)`` training rows from entity-annotated XML
(src/XMLToTSVConverter.groovy:28-42). Until now the repo exercised
the model seam only with dictionary extractors; this module closes
the loop with an actually *learned* model:

    tagged XML --S10--> (token, tag) rows --train--> model tables
    raw text   --S10--> tokens          --apply--> typed mentions

The model is a most-frequent-tag unigram tagger with a 2-char-suffix
backoff — the classic supervised baseline (HMM/perceptron taggers
report against it). Spark-first design:

- training is two map-side-combinable ``groupBy`` counts plus a
  per-key argmax window; the model size is bounded by |vocab| and
  |suffix alphabet|, never the corpus — broadcastable at any scale;
- application is a broadcast hash join per token (the same
  "index the text, probe the model" shape as
  ``extract_mentions_tokenjoin``) with a suffix-join fallback;
- integer counts and a (count desc, tag asc) argmax keep every stage
  deterministic and SQL-expressible, so TRAIN and APPLY both sit
  under the cross-engine hash gate — unlike an order-dependent
  online learner (averaged perceptron), which could only be gated
  rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: entity classes the tagger learns; everything else is 'O'
#: (the reference CRF emits PERSON/ORGANIZATION/LOCATION + O,
#: src/EntityExtractor.groovy:19-34 writes only typed hits)
TAG_CLASSES = ("PERSON", "ORGANIZATION", "LOCATION")
SUFFIX_LEN = 2


def _argmax_tag(counts: DataFrame, key: str) -> DataFrame:
    """counts(key, tag, cnt) -> (key, tag, cnt): the most frequent
    tag per key, ties broken by tag ascending (deterministic)."""
    w = Window.partitionBy(key).orderBy(F.desc("cnt"), F.asc("tag"))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def train_tagger(
    token_tags: DataFrame,
    token_col: str = "token",
    tag_col: str = "tag",
) -> tuple[DataFrame, DataFrame]:
    """(token, tag) training rows -> (token_model, suffix_model).

    token_model(token, tag, cnt): most-frequent tag per exact token.
    suffix_model(suffix, tag, cnt): most-frequent tag per last-
    SUFFIX_LEN characters — the unknown-word backoff. Both are pure
    aggregations (one shuffle each, keyed on token/suffix) over rows
    the S10 converter emits; 'O' rows participate so the models can
    learn *against* tagging a token.
    """
    base = token_tags.select(
        F.col(token_col).alias("token"), F.col(tag_col).alias("tag")
    ).filter(F.col("token") != "")
    tok_counts = base.groupBy("token", "tag").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    suf_counts = (
        base.select(F.expr(f"right(token, {SUFFIX_LEN})").alias("suffix"), "tag")
        .groupBy("suffix", "tag")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return _argmax_tag(tok_counts, "token"), _argmax_tag(suf_counts, "suffix")


def apply_tagger(
    tokens: DataFrame,
    token_model: DataFrame,
    suffix_model: DataFrame,
    token_col: str = "token",
) -> DataFrame:
    """Tag a token stream with the learned model: exact-token match,
    then suffix backoff, then 'O'. Adds ``pred_tag`` and
    ``model_src`` ('token' | 'suffix' | 'default'); input columns
    pass through. Both model tables broadcast (vocab-bounded); the
    token stream itself never shuffles."""
    tm = F.broadcast(
        token_model.select("token", F.col("tag").alias("__tok_tag"))
    )
    sm = F.broadcast(
        suffix_model.select("suffix", F.col("tag").alias("__suf_tag"))
    )
    out = (
        tokens.withColumn("__tok", F.col(token_col))
        .join(tm, F.col("__tok") == tm["token"], "left")
        .drop(tm["token"])
        .withColumn("__suf", F.expr(f"right({token_col}, {SUFFIX_LEN})"))
        .join(sm, F.col("__suf") == sm["suffix"], "left")
        .drop("suffix")
    )
    return (
        out.withColumn(
            "pred_tag",
            F.coalesce(F.col("__tok_tag"), F.col("__suf_tag"), F.lit("O")),
        )
        .withColumn(
            "model_src",
            F.when(F.col("__tok_tag").isNotNull(), "token")
            .when(F.col("__suf_tag").isNotNull(), "suffix")
            .otherwise("default"),
        )
        .drop("__tok", "__tok_tag", "__suf", "__suf_tag")
    )
