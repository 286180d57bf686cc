"""Engine-side pins for the streaming postings store (the 17th/18th
streaming executions) — the text-index siblings of
tests/test_streaming_ivf.py's trio: compacted == one-shot fold,
store-only plan reads, and segment-count + re-delivery agnosticism.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _one_shot_layout(spark, sf_dir):
    """The one-shot batch postings layout: fold EVERY document in one
    pass with the shared segment kernel, then the clustered (pos, df)
    addresses — what any compacted store must equal."""
    from pyspark.sql import Window

    from vizlinc_ingester_spark.suite.streaming_q import _postings_segment

    raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tf = _postings_segment(raw).select(
        "doc_id",
        "word",
        "tf",
        F.concat_ws(",", "positions").alias("positions_fp"),
    )
    w = Window.partitionBy("word")
    return tf.select(
        "word",
        "doc_id",
        "tf",
        "positions_fp",
        F.row_number().over(w.orderBy("doc_id")).cast("long").alias("pos"),
        F.count(F.lit(1)).over(w).cast("long").alias("df"),
    )


def test_streaming_postings_compact_equals_batch_layout(spark, sf_dir):
    """Merging the per-segment append-only store must erase every
    trace of the segment boundaries: the compacted (word, doc_id, tf,
    positions_fp, pos, df) layout equals the ONE-SHOT batch fold's
    clustered layout (the oracle pins the same equality cross-engine
    in DuckDB)."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_postings_compact,
    )

    batch = sorted(map(tuple, _one_shot_layout(spark, sf_dir).collect()))
    compacted = sorted(
        map(tuple, q_streaming_postings_compact(spark, sf_dir).collect())
    )
    assert batch and batch == compacted


def test_streaming_postings_compact_reads_store_not_corpus(spark, sf_dir):
    """The property that makes periodic segment merging affordable at
    100 TB: tokenize cost is paid once at ingest, so once the
    streamed store exists the compaction plan must scan ONLY the
    store parquet — no documents scan, no re-tokenize (no Generate
    node at all: the whole merge is scalar relational algebra)."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_postings_compact,
    )

    # first call builds (and memoizes) the streamed store
    q_streaming_postings_compact(spark, sf_dir).count()
    # second call must plan against the store alone
    plan = (
        q_streaming_postings_compact(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "vl_stream_post_store_" in plan
    assert "documents.parquet" not in plan, plan[:4000]
    assert "Generate" not in plan  # no posexplode: tokenize not re-run
    assert "MapInPandas" not in plan


def test_compact_postings_store_segment_and_redelivery_agnostic(
    spark, sf_dir
):
    """The merge algebra must hold for ANY segment count AND for
    foreachBatch's at-least-once re-delivery: fold the corpus as FOUR
    per-batch segments (doc_id % 4 slices) with one segment appended
    TWICE (a recovered batch re-appending byte-identical rows),
    compact, and require equality with the one-shot layout — the
    duplicated segment must vanish without disturbing any address."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        _postings_segment,
        compact_postings_store,
    )

    raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    parts = [
        _postings_segment(raw.filter(F.col("doc_id") % 4 == b))
        for b in range(4)
    ]
    # segment 2 re-delivered: appended a second time
    parts.append(parts[2])
    store = parts[0]
    for p in parts[1:]:
        store = store.unionByName(p)

    compacted = sorted(map(tuple, compact_postings_store(store).collect()))
    one_shot = sorted(map(tuple, _one_shot_layout(spark, sf_dir).collect()))
    assert one_shot and compacted == one_shot


def test_compact_postings_store_bucket_granularity_invariant(spark, sf_dir):
    """The bucket-stitch addressing must be a pure function of the
    store: n_buckets=1 (degenerate — equivalent to a single per-term
    window) and n_buckets=7 (uneven, hot terms split mid-list) must
    produce byte-equal layouts."""
    from vizlinc_ingester_spark.suite.streaming_q import (
        _postings_segment,
        compact_postings_store,
    )

    raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    store = _postings_segment(raw)
    one = sorted(
        map(tuple, compact_postings_store(store, n_buckets=1).collect())
    )
    seven = sorted(
        map(tuple, compact_postings_store(store, n_buckets=7).collect())
    )
    assert one and one == seven


def _streamed_store_positions(store, word):
    """Posting-list probe of the compacted streamed store: one term's
    doc_ids + positions, the fingerprint decoded back to the real
    array<long> (the store's gated rendering is the comma-joined
    canonical form)."""
    return store.filter(F.col("word") == word).select(
        "doc_id",
        F.transform(
            F.split("positions_fp", ","), lambda x: x.cast("long")
        ).alias("positions"),
    )


def test_streamed_store_serves_bm25(spark, sf_dir):
    """End of the loop: the streamed + compacted postings store must
    be a FUNCTIONAL index, not just a gated layout — BM25 top-k
    served from the store alone (tf probe + dl/stats rollups, the
    identical scoring tail) equals the corpus-scan q_bm25_search."""
    from vizlinc_ingester_spark.suite.search_q import (
        TERMS,
        _bm25_topk,
        q_bm25_search,
    )
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_postings_compact,
    )

    store = q_streaming_postings_compact(spark, sf_dir)
    tf = store.filter(F.col("word").isin(*TERMS)).select(
        "doc_id", "word", "tf"
    )
    dl = store.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    stats = dl.agg(
        F.sum("dl").cast("long").alias("sum_dl"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    served = sorted(map(tuple, _bm25_topk(tf, dl, stats).collect()))
    scanned = sorted(map(tuple, q_bm25_search(spark, sf_dir).collect()))
    assert served and served == scanned


def test_streamed_store_serves_phrase(spark, sf_dir):
    """The positional half: exact-phrase adjacency answered from the
    streamed store's position lists (decoded fingerprints, the same
    shifted-intersect chain as search_q.search_phrase_indexed) equals
    the batch positional index's q_phrase_search_indexed."""
    from vizlinc_ingester_spark.suite.search_q import (
        PHRASE,
        q_phrase_search_indexed,
    )
    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_postings_compact,
    )

    store = q_streaming_postings_compact(spark, sf_dir)
    out = _streamed_store_positions(store, PHRASE[0]).withColumnRenamed(
        "positions", "p0"
    )
    chain = F.col("p0")
    for k, w in enumerate(PHRASE[1:], start=1):
        out = out.join(
            _streamed_store_positions(store, w).withColumnRenamed(
                "positions", f"p{k}"
            ),
            "doc_id",
        )
        chain = F.array_intersect(
            chain, F.transform(F.col(f"p{k}"), lambda x: x - k)
        )
    served = sorted(
        map(
            tuple,
            out.select(
                "doc_id", F.size(chain).cast("long").alias("n_occurrences")
            )
            .filter(F.col("n_occurrences") > 0)
            .collect(),
        )
    )
    batch = sorted(
        map(tuple, q_phrase_search_indexed(spark, sf_dir).collect())
    )
    assert served and served == batch


def test_streaming_tempdirs_bounded_across_invocations(spark, sf_dir):
    """Self-review r14 (the ADVICE-r12 leak class, per-invocation
    side): repeated invocations of streaming queries must NOT grow
    /tmp — every per-invocation checkpoint, fold-state work dir and
    at-ingest store lives in a rotating session-owned slot that
    deletes its predecessor. Round 2 must create zero net dirs."""
    import glob

    from vizlinc_ingester_spark.suite.streaming_q import (
        q_streaming_kmv,
        q_streaming_postings_insert,
    )

    def n_dirs():
        return len(
            glob.glob("/tmp/vl_stream_*") + glob.glob("/tmp/vl_ck_*")
        )

    def round_trip():
        q_streaming_postings_insert(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        q_streaming_kmv(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    round_trip()  # populate every rotating slot
    before = n_dirs()
    round_trip()  # every slot must rotate in place
    assert n_dirs() == before
