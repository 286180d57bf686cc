"""The full ingestion pipeline as one plan (SURVEY.md §3.1).

Reference: ``Ingester.ingest`` (src/Ingester.groovy:101-194) runs 10
sequential steps — extract text, NER, populate graph, people coref +
social network, org coref, loc coref, geocode, precompute counts,
index, export to H2 — each timed by ``runStep``
(src/Ingester.groovy:114-121) with file-tree intermediates in a work
dir (src/Ingester.groovy:69-70).

Spark design: each stage is a lazy DataFrame plan; stage boundaries
that the reference persisted to disk become Parquet checkpoints in
``work_dir`` — that keeps per-stage lineage short, makes every stage
restartable, and mirrors exactly what a 1000-executor run wants (each
checkpoint is a shuffle-free scan for the next stage, sized by
``spark.sql.files.maxPartitionBytes``). Stage timings are returned
like the reference's runStep report. Lucene indexing (S9) is reduced
to the searchable ``documents`` table itself (SURVEY.md §7 note);
full-text predicates run as ``rlike``/``contains`` scans.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..io import sinks, sources
from ..operators import coref, counts, curation, geocode, mentions, social

COREF_TYPES = ("PERSON", "ORGANIZATION", "LOCATION")


class IngestResult(dict):
    """Tables + per-stage wall-clock seconds (runStep parity)."""

    def __init__(self):
        super().__init__()
        self.timings: dict[str, float] = {}


def _checkpoint(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def ingest(
    spark: SparkSession,
    input_dir: str | None,
    work_dir: str,
    out_dir: str | None = None,
    documents: DataFrame | None = None,
    extractor: Callable[[DataFrame], DataFrame] | None = None,
    gazetteer: DataFrame | None = None,
    graphml_path: str | None = None,
    curate: bool = False,
    bench_grams: DataFrame | None = None,
    input_ext: str = "txt",
) -> IngestResult:
    """Run the 10-step pipeline.

    Inputs: either ``input_dir`` (a recursive tree of source files,
    S1+S2; ``input_ext`` selects one extension, or ``"auto"`` scans
    every file and routes each to its extractor by extension —
    txt/html/pdf/docx/odt/rtf/doc/xls/ppt/xlsx/pptx, the Tika-class
    front door)
    or a prebuilt ``documents`` DataFrame (doc_id, name, path, text).
    ``extractor``: documents -> mentions DataFrame; defaults to the
    deterministic test double (the CRF seam, src/EntityExtractor.groovy:
    12-14). Writes the star schema to ``out_dir`` (default
    ``work_dir/star``) and optionally a GraphML export.

    ``curate=True`` appends the LLM training-data funnel as a pipeline
    stage (operators/curation.py — the same oracle-gated transforms as
    suite/curation.py): decontaminate against ``bench_grams`` (a
    1-column (gram) DataFrame of held-out n-grams; stage skipped when
    None) -> PII-redact -> context-window chunk -> pack into token
    budgets per language stratum. Adds checkpointed ``curated_docs``,
    ``chunks``, ``packed_sequences`` tables.
    """
    res = IngestResult()

    def step(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        res.timings[name] = round(time.monotonic() - t0, 3)
        return out

    # 1-2: EXTRACT_TEXT + (3) persist documents — the graph-populate
    # stage (S5) is a no-op in the relational design: the parquet
    # tables ARE the graph.
    def load_docs():
        if documents is not None:
            d = documents
        elif input_ext == "auto":
            from ..session import ship_package

            ship_package(spark)  # pandas-UDF extractors run on workers
            d = sources.extract_text_auto(
                sources.scan_directory(spark, input_dir, "*")
            ).filter(F.col("text").isNotNull())
        else:
            d = sources.extract_text(
                sources.scan_directory(spark, input_dir, input_ext)
            )
        return _checkpoint(d, spark, os.path.join(work_dir, "documents"))

    docs = step("extract_text", load_docs)

    # 2: FIND_NAMED_ENTITIES
    ext = extractor or mentions.derive_mentions
    ment = step(
        "find_named_entities",
        lambda: _checkpoint(ext(docs), spark, os.path.join(work_dir, "mentions")),
    )

    # 4-5: PROCESS_{PEOPLE,ORGANIZATIONS,LOCATIONS} — within-doc coref,
    # mention->entity assignment, across-doc coref per type.
    assigned_parts, within_parts, across_parts, membership_parts = [], [], [], []
    for etype in COREF_TYPES:
        def run_type(etype=etype):
            # firstname-prefix absorption is the person-specific third
            # pass (combineFirstnameFullname runs in WithinDocPerCoref)
            pm = etype == "PERSON"
            wd = coref.within_doc_entities(ment, etype, prefix_merge=pm)
            assigned = coref.assign_mentions_to_entities(
                ment, etype, prefix_merge=pm, wd=wd
            )
            across = coref.across_doc_entities(ment, etype, wd=wd)
            member = coref.across_doc_membership(ment, etype, wd=wd)
            return wd, assigned, across, member

        wd, assigned, across, member = step(f"process_{etype.lower()}", run_type)
        within_parts.append(wd)
        assigned_parts.append(assigned)
        across_parts.append(across.drop("num_members"))
        membership_parts.append(member)

    def union_all(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    entities = step(
        "entities_checkpoint",
        lambda: _checkpoint(
            union_all(
                [w.select("entity_id", "type", "text", "created_by", "num_docs", "num_mentions") for w in within_parts]
                + [a.select("entity_id", "type", "text", "created_by", "num_docs", "num_mentions") for a in across_parts]
            ),
            spark,
            os.path.join(work_dir, "entities"),
        ),
    )
    assigned = step(
        "mentions_assigned",
        lambda: _checkpoint(
            union_all(assigned_parts), spark, os.path.join(work_dir, "mentions_assigned")
        ),
    )

    # 4b: social network from across-doc person membership
    def build_sn():
        person_membership = membership_parts[COREF_TYPES.index("PERSON")]
        doc_ent = (
            person_membership.select("doc_id", "across_entity_id")
            .withColumnRenamed("across_entity_id", "entity_id")
            .dropDuplicates(["doc_id", "entity_id"])
        )
        return _checkpoint(
            social.social_network(doc_ent), spark, os.path.join(work_dir, "sn_edges")
        )

    sn_edges = step("social_network", build_sn)

    # 6: GEOCODE location entities from the across-doc pass
    def run_geocode():
        gaz = gazetteer if gazetteer is not None else geo.gazetteer(spark)
        locs = entities.filter(
            entities["created_by"] == "across_doc_location_coref"
        ).select("entity_id", "text")
        return _checkpoint(
            geocode.resolve_locations(locs, gaz),
            spark,
            os.path.join(work_dir, "geolocations"),
        )

    geolocations = step("geocode", run_geocode)

    # 7: PRECOMPUTE_COUNTS
    document_entity = step(
        "precompute_counts",
        lambda: _checkpoint(
            counts.document_entity_counts(assigned),
            spark,
            os.path.join(work_dir, "document_entity"),
        ),
    )

    # 8: INDEX_DOCS — reduced to the persisted documents table (S9 note)

    # 9: CONVERT_TO_H2 -> star schema parquet (+ optional GraphML)
    tables = {
        "documents": docs,
        "entities": entities,
        "mentions": assigned,
        "document_entity": document_entity,
        "geolocations": geolocations,
    }
    step(
        "export_star",
        lambda: sinks.write_star_schema(tables, out_dir or os.path.join(work_dir, "star")),
    )
    if graphml_path:
        def export_graphml():
            nodes, kept = sinks.social_network_for_export(entities, sn_edges)
            return sinks.write_graphml(nodes, kept, graphml_path)

        res["graphml_counts"] = step("export_graphml", export_graphml)

    # 10 (optional): LLM training-data curation funnel over the
    # extracted corpus — runs after coref so entity tables come from
    # the UNREDACTED text (matching the reference's graph), while the
    # training-mix tables are decontaminated + redacted.
    if curate:
        from ..functions import text as tx

        def run_curate():
            clean = docs
            if bench_grams is not None:
                tainted = curation.decontaminate_scores(docs, bench_grams)
                clean = docs.join(tainted, "doc_id", "left_anti")
            from pyspark.sql import functions as F

            red = curation.redact_pii(clean)
            curated = _checkpoint(
                red.select(
                    "doc_id", "name", "path",
                    F.col("text_redacted").alias("text"),
                    "n_emails", "n_phones",
                ),
                spark,
                os.path.join(work_dir, "curated_docs"),
            )
            chunks = _checkpoint(
                curation.chunk_documents(curated),
                spark,
                os.path.join(work_dir, "chunks"),
            )
            strata = curated.select(
                "doc_id", tx.lang_id(F.col("text")).alias("lang")
            )
            packed = _checkpoint(
                curation.pack_chunks(chunks, strata),
                spark,
                os.path.join(work_dir, "packed_sequences"),
            )
            return curated, chunks, packed

        curated, chunks, packed = step("curate_corpus", run_curate)
        tables["curated_docs"] = curated
        tables["chunks"] = chunks
        tables["packed_sequences"] = packed

    res.update(tables)
    res["sn_edges"] = sn_edges
    return res
