"""Count precomputation (A6/A8/A9, SURVEY.md §2.4).

Reference: src/EdgeMentionsCounter.groovy:33-60 walks every document's
mention->entity edges and stores a per-(doc, entity) mention count on
the document->entity edge. In Spark that whole pass is a single
map-side-combinable aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def document_entity_counts(mention_entities: DataFrame) -> DataFrame:
    """A6 — mentions (already entity-assigned) -> document_entity
    (doc_id, entity_id, num_mentions)."""
    return (
        mention_entities.groupBy("doc_id", "entity_id")
        .agg(F.count(F.lit(1)).cast("long").alias("num_mentions"))
    )


def distinct_doc_entities(mention_entities: DataFrame) -> DataFrame:
    """A9 — distinct (doc, entity) pairs (src/SocialNetworkDCO.groovy:57
    ``.unique()``)."""
    return mention_entities.select("doc_id", "entity_id").dropDuplicates(
        ["doc_id", "entity_id"]
    )
