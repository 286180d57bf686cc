"""Column-level function library (SURVEY.md §2.8).

Every function here exists in two synchronized forms:

- a PySpark ``Column -> Column`` builder (JVM-side, codegen-friendly —
  no Python UDFs in any hot path), and
- a DuckDB SQL-snippet builder (``sql_*``) used by the oracle strings
  in ``__spark_entry__.py`` so the two engines compute *identical*
  semantics.

Keeping both in one module is what makes the correctness gate
(driver's DuckDB side-by-side run) meaningful rather than accidental.
"""
