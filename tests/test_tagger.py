"""Learned-tagger unit semantics: training argmax/tie-breaks, suffix
backoff on unknown words, default-O, and the S10 round-trip feeding
training (reference src/EntityExtractor.groovy:12-14,
src/XMLToTSVConverter.groovy:28-42)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators.tagger import apply_tagger, train_tagger


def _models(spark, rows):
    tt = spark.createDataFrame(rows, "token string, tag string")
    return train_tagger(tt)


def test_train_argmax_and_tiebreak(spark):
    rows = (
        [("paris", "LOCATION")] * 3
        + [("paris", "PERSON")] * 1
        + [("smith", "PERSON")] * 2
        + [("smith", "ORGANIZATION")] * 2  # tie -> ORGANIZATION < PERSON
        + [("the", "O")] * 5
    )
    tm, sm = _models(spark, rows)
    got = {r["token"]: (r["tag"], r["cnt"]) for r in tm.collect()}
    assert got["paris"] == ("LOCATION", 3)
    assert got["smith"] == ("ORGANIZATION", 2)  # count tie, tag asc
    assert got["the"] == ("O", 5)
    sufs = {r["suffix"]: r["tag"] for r in sm.collect()}
    assert sufs["is"] == "LOCATION"  # from 'paris' x3 vs nothing else
    assert sufs["he"] == "O"


def test_apply_exact_suffix_default(spark):
    rows = [("paris", "LOCATION")] * 3 + [("boris", "PERSON")] * 1
    tm, sm = _models(spark, rows)
    toks = spark.createDataFrame(
        [("paris",), ("doris",), ("zzz",)], "token string"
    )
    out = {r["token"]: (r["pred_tag"], r["model_src"])
           for r in apply_tagger(toks, tm, sm).collect()}
    assert out["paris"] == ("LOCATION", "token")      # seen token
    # unknown word, known suffix 'is' (3x LOCATION + 1x PERSON)
    assert out["doris"] == ("LOCATION", "suffix")
    assert out["zzz"] == ("O", "default")             # nothing matches


def test_s10_xml_feeds_training(spark):
    """Tagged XML -> xml_to_token_tags -> train: tags survive the
    render/parse round-trip, untagged runs land in 'O'."""
    from vizlinc_ingester_spark.io.sources import xml_to_token_tags

    docs = spark.createDataFrame(
        [(1, "<PERSON>Alice</PERSON> met <LOCATION>Paris</LOCATION> today"),
         (2, "<PERSON>Alice</PERSON> left")],
        "doc_id long, xml string",
    )
    tt = xml_to_token_tags(docs)
    tm, _sm = train_tagger(tt)
    got = {r["token"]: r["tag"] for r in tm.collect()}
    assert got["Alice"] == "PERSON" and got["Paris"] == "LOCATION"
    assert got["met"] == "O" and got["today"] == "O"
