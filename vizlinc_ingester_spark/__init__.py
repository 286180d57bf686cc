"""vizlinc_ingester_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of mitll/vizlinc_ingester.

The reference (/root/reference, Apache-2.0) is a single-JVM Groovy +
Gremlin document-ingestion pipeline; this package re-expresses every
operator it contains as Spark DataFrame / SQL plans (see SURVEY.md §2
for the operator-by-operator mapping), plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus pipeline needs.

Design rules (SURVEY.md §7):
- DataFrame/SQL only; every operator is a pure ``DataFrame -> DataFrame``
  function. No RDDs.
- Column-level built-ins wherever possible; UDFs only at the pluggable
  points the reference also treats as pluggable (NER model, text
  extractor, external geocoder) — and then Arrow-batched.
- Deterministic everywhere: explicit orderings and tie-breaks replace
  the reference's encounter-order semantics (documented deviations).
"""

__version__ = "0.1.0"
