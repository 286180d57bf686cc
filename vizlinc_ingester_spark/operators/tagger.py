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


def _argmax_tag(counts: DataFrame, *keys: str) -> DataFrame:
    """counts(*keys, tag, cnt) -> (*keys, tag, cnt): the most frequent
    tag per key, ties broken by tag ascending (deterministic)."""
    w = Window.partitionBy(*keys).orderBy(F.desc("cnt"), F.asc("tag"))
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


# --- context (bigram) tagger — round 7 -------------------------------------

#: sentence-boundary previous token for the first token of a document
CTX_BOS = "<S>"


def train_tagger_ctx(
    token_tags: DataFrame,
    token_col: str = "token",
    prev_col: str = "prev",
    tag_col: str = "tag",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(prev, token, tag) training rows -> (bigram_model, token_model,
    suffix_model).

    The reference extraction model is a context-sensitive CRF
    (src/EntityExtractor.groovy:12-14); this is the count-based
    context feature in the same deterministic algebra as
    ``train_tagger``: bigram_model(prev, token, tag, cnt) is the
    most-frequent tag per (previous token, token) pair, and the
    unigram + suffix models come from the identical rows so the
    backoff chain bigram -> unigram -> suffix -> 'O' is trained on
    one pass over the corpus.

    Scale: three map-side-combinable counts + per-key argmax windows.
    The bigram table is bounded by distinct (prev, token) PAIRS —
    Heaps-law sublinear in corpus size but larger than the vocab, so
    unlike the unigram/suffix tables it is NOT force-broadcast at
    apply time; the join keys on token so AQE picks broadcast vs
    shuffled-hash by actual size.
    """
    base = token_tags.select(
        F.col(prev_col).alias("prev"),
        F.col(token_col).alias("token"),
        F.col(tag_col).alias("tag"),
    ).filter(F.col("token") != "")
    big_counts = base.groupBy("prev", "token", "tag").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    bigram_model = _argmax_tag(big_counts, "prev", "token")
    token_model, suffix_model = train_tagger(base)
    return bigram_model, token_model, suffix_model


def apply_tagger_ctx(
    tokens: DataFrame,
    bigram_model: DataFrame,
    token_model: DataFrame,
    suffix_model: DataFrame,
    token_col: str = "token",
    prev_col: str = "prev",
) -> DataFrame:
    """Tag a token stream with the context model: exact (prev, token)
    bigram match, then exact-token, then suffix backoff, then 'O'.
    Adds ``pred_tag`` and ``model_src`` ('bigram' | 'token' |
    'suffix' | 'default'). The unigram/suffix tables broadcast
    (vocab-bounded); the bigram join is left to AQE (see
    ``train_tagger_ctx``). The token stream itself only shuffles if
    the bigram join does."""
    bm = bigram_model.select(
        F.col("prev").alias("__b_prev"),
        F.col("token").alias("__b_tok"),
        F.col("tag").alias("__big_tag"),
    )
    with_big = tokens.join(
        bm,
        (F.col(prev_col) == F.col("__b_prev"))
        & (F.col(token_col) == F.col("__b_tok")),
        "left",
    ).drop("__b_prev", "__b_tok")
    out = apply_tagger(with_big, token_model, suffix_model, token_col)
    return (
        out.withColumn(
            "pred_tag", F.coalesce(F.col("__big_tag"), F.col("pred_tag"))
        )
        .withColumn(
            "model_src",
            F.when(F.col("__big_tag").isNotNull(), "bigram").otherwise(
                F.col("model_src")
            ),
        )
        .drop("__big_tag")
    )
