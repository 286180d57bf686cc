"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end slice (SURVEY.md §7 step 1):
documents -> mention extraction -> within/across-doc person coref ->
social network -> top co-mentioned pairs, on sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (the **[Q]** inventory) plus the training-data
pipeline track (dedup / similarity / text analysis), assembled from
``vizlinc_ingester_spark.suite``. Oracle strings are generated from
the same constants the Spark operators use.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top co-mentioned person pairs (scan -> extract ->
    coref -> self-join -> agg -> sort in one lazy plan)."""
    from vizlinc_ingester_spark.operators import coref, mentions, social
    from vizlinc_ingester_spark.session import ship_package

    # executor workers must be able to import the package even when
    # the calling process's cwd is not the repo (same stance as the
    # suite-wide wrap in collect_suite)
    ship_package(spark)

    m = mentions.derive_mentions(
        spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
    )
    doc_ent = (
        coref.across_doc_membership(m, "PERSON")
        .select("doc_id", F.col("across_entity_id").alias("entity_id"))
        .dropDuplicates(["doc_id", "entity_id"])
    )
    edges = social.social_network(doc_ent)
    return edges.orderBy(
        F.desc("num_docs"), "src_entity_id", "dst_entity_id"
    ).limit(100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vizlinc_ingester_spark.suite import collect_suite

    q, _ = collect_suite()
    return q


def oracle_sql() -> dict[str, str]:
    from vizlinc_ingester_spark.suite import collect_suite

    _, o = collect_suite()
    return o
