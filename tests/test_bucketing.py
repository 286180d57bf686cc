"""Bucketed star schema: doc_id-keyed joins must be exchange-free
(io/sinks.write_star_bucketed)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from vizlinc_ingester_spark.io import sinks


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_exchange(spark, tmp_path):
    n = 2000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    de = spark.range(n * 3).select(
        (F.col("id") % n).alias("doc_id"),
        (F.col("id") % 97).alias("entity_id"),
        F.lit(1).cast("long").alias("num_mentions"),
    )
    sinks.write_star_bucketed(
        {"documents": docs, "document_entity": de}, str(tmp_path / "star"), n_buckets=8
    )
    try:
        a = spark.table("documents")
        b = spark.table("document_entity")
        # disable broadcast so the co-located plan (not a broadcast) is
        # what we verify — at production scale both sides are fact-sized
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "doc_id").groupBy("doc_id").agg(
            F.sum("num_mentions").alias("m")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the join itself reads bucketed scans: no shuffle exchange
        # feeds the join (the final groupBy on doc_id also reuses the
        # bucketing, so NO Exchange should appear at all)
        assert "Exchange hashpartitioning" not in plan, plan
        # results identical to the plain shuffle join
        plain = docs.join(de, "doc_id").groupBy("doc_id").agg(
            F.sum("num_mentions").alias("m")
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS documents")
        spark.sql("DROP TABLE IF EXISTS document_entity")
