"""Oracle-checked Structured Streaming query.

Most streaming correctness lives in tests (tests/test_streaming.py);
this module puts one real streaming execution under the driver's
DuckDB gate: the events table is staged as multiple files, consumed
as a file-source STREAM (2 micro-batches, availableNow), aggregated
with the watermarked tumbling-window plan, and the complete-mode
result is returned as a batch DataFrame — which must hash-match the
plain-SQL answer. Proves the incremental execution computes exactly
the batch semantics, not approximately.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_streaming_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    )
    stage = tempfile.mkdtemp(prefix="vl_stream_stage_")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    src.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    src.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        stage
    )

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
            F.min(cents).alias("min_value_cents"),
            F.max(cents).alias("max_value_cents"),
        )
    )
    name = f"stream_win_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(stage, "_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        (F.col("win.start").cast("long") / 3600).cast("long").alias("hour_bucket"),
        "event_type",
        "n_events",
        "sum_value_cents",
        "min_value_cents",
        "max_value_cents",
    )


ORACLE_STREAMING_WINDOWS = """
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_value_cents,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_value_cents
FROM events
GROUP BY 1, 2
"""

QUERIES = {"streaming_event_windows": q_streaming_event_windows}
ORACLES = {"streaming_event_windows": ORACLE_STREAMING_WINDOWS}
