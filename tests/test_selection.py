"""Distributed exact selection (operators/selection.py): k-th order
statistics without a single-partition sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators.selection import (
    exact_rank_keys,
    ntile_boundaries,
)


def test_ntile_boundaries():
    # 10 rows / 4 buckets: sizes 3,3,2,2 -> cumulative 3,6,8
    assert ntile_boundaries(10, 4) == [3, 6, 8]
    assert ntile_boundaries(8, 4) == [2, 4, 6]
    assert ntile_boundaries(3, 4) == [1, 2, 3]


def test_exact_rank_keys_matches_sort(spark):
    # deterministic pseudo-random keys with duplicates; tiebreak col
    df = spark.range(0, 2000).select(
        (F.col("id") * 37 % 101).alias("k"), F.col("id").alias("tb")
    )
    ranks = [1, 500, 1000, 1999, 2000]
    got = exact_rank_keys(
        df, [F.asc("k"), F.asc("tb")], ranks, num_partitions=7
    )
    want = (
        df.orderBy(F.asc("k"), F.asc("tb"))
        .limit(2000)
        .collect()
    )
    for r, row in zip(ranks, got):
        assert (row["k"], row["tb"]) == (want[r - 1]["k"], want[r - 1]["tb"]), r


def test_exact_rank_keys_desc_order(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("tb")
    )
    got = exact_rank_keys(df, [F.desc("k"), F.asc("tb")], [1, 250, 500],
                          num_partitions=5)
    want = df.orderBy(F.desc("k"), F.asc("tb")).collect()
    for r, row in zip([1, 250, 500], got):
        assert (row["k"], row["tb"]) == (want[r - 1]["k"], want[r - 1]["tb"])
