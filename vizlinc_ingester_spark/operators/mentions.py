"""Mention extraction (S3, SURVEY.md §2.1).

The reference runs a pluggable Stanford CRF model per document and
writes one mention row per hit (src/EntityExtractor.groovy:19-34).
Our surface is the same shape — ``documents -> mentions`` — with the
model pluggable; two implementations:

- ``derive_mentions``: the deterministic test double used for oracle
  checking. Tokenizes ``documents.text``, types each token by an md5
  bucket, and injects seeded near-duplicate surface variants
  (trailing '.', distance-1 misspellings, firstname/fullname pairs) so
  the downstream coref operators have real work — mirroring FIXTURES.md
  §2's requirements. Every expression is mirrored in DuckDB SQL by
  ``oracle.py`` (same md5 buckets, same variant rule).
- ``extract_mentions_dict``: dictionary/regex extractor over arbitrary
  text for pipeline use (vocabulary broadcast, JVM regex — no UDF).

Mention ids are ``doc_id * ID_STRIDE + token_index`` — deterministic
and shuffle-free (a global ``row_number`` would serialize the whole
corpus through one partition at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ID_STRIDE = 1_000_000  # > max tokens per document

# md5-first-hex-char -> entity type (uniform buckets, same in oracle)
TYPE_BUCKETS = [
    ("012345", "PERSON"),
    ("6789", "ORGANIZATION"),
    ("abc", "LOCATION"),
    ("def", "DATE"),
]


def _type_from_word(word):
    """md5-bucket entity type. Accepts a Column or a column NAME —
    name inputs memoize the built when-chain per session
    (session.expr_memo; it is ~40 py4j round trips and every NER gold
    stream rebuilds it per query construction)."""
    if isinstance(word, str):
        from ..session import expr_memo

        name = word
        return expr_memo(
            ("type_from_word", name), lambda: _type_from_word(F.col(name))
        )
    h = F.substring(F.md5(word), 1, 1)
    expr = None
    for chars, t in TYPE_BUCKETS:
        cond = h.isin(*list(chars))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    return expr


def derive_mentions(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> mentions(mention_id, doc_id,
    type, text, idx, global_id, text_start, text_stop).

    Partition axis is the document (posexplode is per-row, no
    shuffle); the only shuffle is the per-doc window for lead/offsets,
    keyed on doc_id — uniform at any scale.
    """
    toks = (
        documents.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .filter(F.col("word") != "")
        .withColumn("idx", (F.col("pos") + 1).cast("long"))
        .drop("pos")
    )
    w = Window.partitionBy("doc_id").orderBy("idx")
    toks = (
        toks.withColumn("nxt", F.lead("word").over(w))
        .withColumn(
            "text_start",
            F.coalesce(
                F.sum(F.length("word") + 1).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    m = (F.col("doc_id") * 31 + F.col("idx")) % 101
    base = F.upper("word")
    surface = (
        F.when(m == 0, F.concat(base, F.lit(".")))
        .when(m == 1, F.concat(base, F.lit("X")))
        .when((m == 2) & (F.length("word") > 3), base.substr(F.lit(1), F.length("word") - 1))
        .when(m.between(3, 10) & F.col("nxt").isNotNull(), F.concat(base, F.lit(" "), F.upper("nxt")))
        .otherwise(base)
    )
    gid = F.when(
        F.substring(F.md5("word"), 2, 1).isin("0", "1"),
        F.concat(F.lit("g_"), F.col("word")),
    )
    return toks.select(
        (F.col("doc_id") * ID_STRIDE + F.col("idx")).cast("long").alias("mention_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _type_from_word(F.col("word")).alias("type"),
        surface.alias("text"),
        F.col("idx").alias("idx"),
        gid.alias("global_id"),
        F.col("text_start"),
        (F.col("text_start") + F.length("word")).cast("long").alias("text_stop"),
    )


def extract_mentions_dict(
    documents: DataFrame, vocabulary: DataFrame, type_col: str = "type"
) -> DataFrame:
    """Dictionary NER for pipeline use: one mention per vocabulary
    term found in each document (case-insensitive word-boundary
    match; ``idx`` is the term's alphabetical rank within the doc,
    not a character offset). vocabulary(term, type) is broadcast; the
    scan side never shuffles. Replaces the CRF at parity-test scale
    (src/EntityExtractor.groovy:12-14 treats the model as pluggable).

    Terms are regex-escaped before matching, so vocabulary entries
    containing metacharacters ('c++', 'a.b') match literally instead
    of throwing PatternSyntaxException / silently wildcarding.
    """
    hits = (
        documents.join(F.broadcast(vocabulary), F.expr(
            "text rlike concat('(?i)(?<!\\\\w)', "
            "regexp_replace(term, '([^a-zA-Z0-9 ])', '\\\\\\\\$1'), "
            "'(?!\\\\w)')"
        ))
        .select(
            "doc_id",
            F.col(type_col).alias("type"),
            F.upper("term").alias("text"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("text")
    return hits.withColumn("idx", F.row_number().over(w).cast("long")).withColumn(
        "mention_id", (F.col("doc_id") * ID_STRIDE + F.col("idx")).cast("long")
    )


def extract_mentions_tokenjoin(
    documents: DataFrame, vocabulary: DataFrame, type_col: str = "type"
) -> DataFrame:
    """Dictionary NER for LARGE vocabularies — same output as
    ``extract_mentions_dict``, different join shape. The rlike form
    evaluates O(docs x vocab) regexes; fine at a few hundred terms,
    hopeless at a 100k-term gazetteer. Here the docs are tokenized
    once (split on non-word runs, lowercased, per-doc distinct) and
    equi-joined against each term's first word-run — Aho-Corasick's
    "index the text, probe the dictionary" shape as a broadcast hash
    join. Only the O(candidate) pairs that survive blocking pay the
    word-boundary regex verify, so cost is O(tokens + hits), not
    O(docs x vocab).

    Recall argument: the verify regex ``(?<!\\w)term(?!\\w)`` can only
    match where the term's first alphanumeric run appears flanked by
    non-word chars — exactly the condition for that run to be a
    complete token of the split. Terms with no alphanumeric run at
    all cannot be blocked and fall back to the rlike path (they are
    vanishingly rare in real dictionaries).
    """
    verify = F.expr(
        "text rlike concat('(?i)(?<!\\\\w)', "
        "regexp_replace(term, '([^a-zA-Z0-9 ])', '\\\\\\\\$1'), "
        "'(?!\\\\w)')"
    )
    vocab = vocabulary.withColumn(
        "__key", F.lower(F.regexp_extract("term", "[A-Za-z0-9]+", 0))
    )
    blockable = vocab.filter(F.col("__key") != "")
    unblockable = vocab.filter(F.col("__key") == "").drop("__key")

    toks = documents.select(
        "doc_id",
        "text",
        F.explode(
            F.array_distinct(F.split(F.lower("text"), "[^a-z0-9_]+"))
        ).alias("__key"),
    ).filter(F.col("__key") != "")
    cand = toks.join(F.broadcast(blockable), "__key")
    hits = cand.filter(verify).select(
        "doc_id", F.col(type_col).alias("type"), F.upper("term").alias("text")
    )
    if not unblockable.isEmpty():
        extra = documents.join(F.broadcast(unblockable), verify).select(
            "doc_id", F.col(type_col).alias("type"), F.upper("term").alias("text")
        )
        hits = hits.unionByName(extra)
    w = Window.partitionBy("doc_id").orderBy("text")
    return hits.withColumn("idx", F.row_number().over(w).cast("long")).withColumn(
        "mention_id", (F.col("doc_id") * ID_STRIDE + F.col("idx")).cast("long")
    )
