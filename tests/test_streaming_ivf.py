"""Engine-side pins for the streaming IVF store compaction (the 16th
streaming execution, judge-r13 item 2) — the IVF siblings of
tests/test_streaming_dedup.py's LSH compaction trio: compacted ==
one-shot batch layout, store-only plan reads, and segment-count +
re-delivery agnosticism.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _one_shot_layout(spark, sf_dir):
    """The one-shot batch IVF layout: assign EVERY vector in one pass
    with the shared quantized-cosine kernel, then the clustered
    (pos, n_list) addresses — what any compacted store must equal."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        _ivf_assign_map,
        _ivf_centroid_broadcast,
    )

    raw = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bc = _ivf_centroid_broadcast(spark, raw)
    assigned = raw.select("vec_id", "embedding").mapInPandas(
        _ivf_assign_map(bc), "vec_id long, centroid_id long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("centroid_id")
    return assigned.select(
        "vec_id",
        "centroid_id",
        F.row_number().over(w.orderBy("vec_id")).cast("long").alias("pos"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_list"),
    )


def test_streaming_ivf_compact_equals_batch_layout(spark, sf_dir):
    """Compacting the per-segment append-only store must erase every
    trace of the segment boundaries: the compacted (vec_id,
    centroid_id, pos, n_list) layout equals the ONE-SHOT batch IVF
    build's clustered layout (the oracle pins the same equality
    cross-engine in DuckDB)."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_ivf_compact,
    )

    batch = sorted(map(tuple, _one_shot_layout(spark, sf_dir).collect()))
    compacted = sorted(
        map(tuple, q_streaming_ivf_compact(spark, sf_dir).collect())
    )
    assert batch and batch == compacted


def test_streaming_ivf_compact_reads_store_not_corpus(spark, sf_dir):
    """The property that makes periodic compaction affordable at
    100 TB: assignment cost is paid once at ingest, so once the
    streamed store exists the compaction plan must scan ONLY the
    store parquet — no embeddings scan, no re-scoring (no Arrow
    crossing at all: the whole compaction is JVM-side relational
    algebra)."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_ivf_compact,
    )

    # first call builds (and memoizes) the streamed store
    q_streaming_ivf_compact(spark, sf_dir).count()
    # second call must plan against the store alone
    plan = (
        q_streaming_ivf_compact(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "vl_stream_ivf_store_" in plan
    assert "embeddings.parquet" not in plan, plan[:4000]
    assert "MapInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_compact_ivf_store_segment_and_redelivery_agnostic(spark, sf_dir):
    """The compaction algebra must hold for ANY segment count AND for
    foreachBatch's at-least-once re-delivery: fold the corpus as FOUR
    per-batch segments (vec_id % 4 slices) with one segment appended
    TWICE (a recovered batch re-appending byte-identical rows),
    compact, and require equality with the one-shot layout — the
    duplicated segment must vanish without disturbing any address."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        _ivf_assign_map,
        _ivf_centroid_broadcast,
        compact_ivf_store,
    )

    raw = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bc = _ivf_centroid_broadcast(spark, raw)
    assign = _ivf_assign_map(bc)

    parts = []
    for b in range(4):
        seg = (
            raw.filter(F.col("vec_id") % 4 == b)
            .select("vec_id", "embedding")
            .mapInPandas(assign, "vec_id long, centroid_id long")
        )
        parts.append(seg)
    # segment 2 re-delivered: appended a second time
    parts.append(parts[2])
    store = parts[0]
    for p in parts[1:]:
        store = store.unionByName(p)

    compacted = sorted(map(tuple, compact_ivf_store(store).collect()))
    one_shot = sorted(map(tuple, _one_shot_layout(spark, sf_dir).collect()))
    assert one_shot and compacted == one_shot
