"""Within-doc coref with firstname-prefix absorption
(combineFirstnameFullname, src/CorefBase.groovy:95-133)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators import coref

MENTION_SCHEMA = (
    "mention_id long, doc_id long, type string, text string, idx long,"
    " global_id string, text_start long, text_stop long"
)


def _mentions(spark, rows):
    full = [
        (i + 1, doc, "PERSON", text, i + 1, None, 0, len(text))
        for i, (doc, text) in enumerate(rows)
    ]
    return spark.createDataFrame(full, MENTION_SCHEMA)


def test_unique_prefix_absorbed(spark):
    m = _mentions(spark, [
        (1, "ANA"),                 # prefix of exactly one full name -> absorbed
        (1, "ANA MARIA GOMEZ"),
        (1, "CARLOS RUIZ"),
    ])
    base = coref.within_doc_entities(m, "PERSON", prefix_merge=False)
    assert base.count() == 3
    merged = coref.within_doc_entities(m, "PERSON", prefix_merge=True)
    ents = {r["text"]: r for r in merged.collect()}
    assert len(ents) == 2
    # canonical name: mode is a tie (1 mention each) -> name asc wins
    assert "ANA" in ents and ents["ANA"]["num_mentions"] == 2
    assert ents["CARLOS RUIZ"]["num_mentions"] == 1


def test_ambiguous_prefix_not_absorbed(spark):
    m = _mentions(spark, [
        (1, "JO"),
        (1, "JOSE PEREZ"),
        (1, "JORGE LUNA"),
    ])
    merged = coref.within_doc_entities(m, "PERSON", prefix_merge=True)
    # JO prefixes two names -> stays its own entity
    assert merged.count() == 3


def test_short_prefix_ignored(spark):
    m = _mentions(spark, [
        (1, "A"),                   # < 2 chars: never merged
        (1, "ANA MARIA"),
    ])
    merged = coref.within_doc_entities(m, "PERSON", prefix_merge=True)
    assert merged.count() == 2


def test_prefix_chains_with_adjacent(spark):
    # adjacent-close merges ANA MARIA ~ ANA MARIE (distance 1);
    # prefix then folds ANA into that island -> one entity
    m = _mentions(spark, [
        (1, "ANA MARIA"),
        (1, "ANA MARIE"),
        (1, "ANA"),
        (2, "ANA"),                 # other doc: scope isolation
    ])
    merged = coref.within_doc_entities(m, "PERSON", prefix_merge=True)
    by_doc = {
        (r["doc_id"]): r for r in merged.filter(F.col("doc_id") == 1).collect()
    }
    assert merged.filter(F.col("doc_id") == 1).count() == 1
    assert merged.filter(F.col("doc_id") == 2).count() == 1
    one = merged.filter(F.col("doc_id") == 1).first()
    assert one["num_mentions"] == 3
