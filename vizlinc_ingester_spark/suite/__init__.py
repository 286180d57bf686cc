"""Declared query suite: every SURVEY.md §2 **[Q]** operator and the
training-data pipeline track, as (spark, sf_dir) -> DataFrame
callables with matching DuckDB oracle SQL.

Each submodule exports ``QUERIES: dict[str, callable]`` and
``ORACLES: dict[str, str]``; ``__spark_entry__`` merges them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_suite() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    from . import (
        dedup,
        graph_q,
        multimodal,
        relational,
        reshape,
        scalars,
        search_q,
        similarity,
        streaming_q,
        temporal,
        textstats,
        vizlinc,
    )

    queries: dict = {}
    oracles: dict = {}
    for mod in (
        vizlinc, scalars, relational, dedup, similarity, textstats,
        multimodal, streaming_q, temporal, reshape, graph_q, search_q,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
