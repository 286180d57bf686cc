"""Distributed exact selection (k-th order statistics) — the scale
path for global ranking queries.

A global ``ntile``/``rank`` window in Spark evaluates in ONE partition
(`Exchange SinglePartition` — the documented scale-killer of
``customer_value_quartiles``). But bucket ASSIGNMENT doesn't need a
global sort: it needs the 3 boundary keys, and each row can then place
itself by comparing against broadcast literals in the scan stage.
This module computes exact boundary keys distributedly:

1. ``repartitionByRange`` on the sort key + ``sortWithinPartitions``
   (the one real shuffle — n rows of key columns only),
2. per-partition row counts via ``groupBy(spark_partition_id())``
   (P rows to the driver),
3. ``monotonically_increasing_id`` decodes to (partition, local
   offset) — with sorted partitions, global rank = partition prefix
   sum + local offset, computed as a literal-map lookup, no second
   shuffle,
4. filter ``rank IN (targets)`` -> collect len(targets) rows.

Cost at 100 TB: one range shuffle of the key projection + two
metadata-sized jobs. Nothing corpus-sized ever passes through a single
partition. (Same selection shape Terasort-style range partitioners
use for exact splits.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id layout: partition id in the upper bits,
# per-partition record index in the lower 33 bits
_MID_BITS = 33


def exact_rank_keys(
    df: DataFrame,
    order_cols: list[Column],
    ranks: list[int],
    num_partitions: int | None = None,
) -> list:
    """Return the rows of ``df`` at the given 1-based global ranks
    under ``order_cols``, without a single-partition sort.

    ``df`` should be projected to just the key columns by the caller
    (the shuffle moves only what you pass). Rows are returned in
    ``ranks`` order.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    arranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()  # two metadata jobs must see identical partitioning
    )
    try:
        sizes = {
            r["pid"]: r["cnt"]
            for r in arranged.groupBy(
                F.spark_partition_id().alias("pid")
            ).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        prefix: dict[int, int] = {}
        acc = 0
        for pid in sorted(sizes):
            prefix[pid] = acc
            acc += sizes[pid]

        mid = F.monotonically_increasing_id()
        pid = F.shiftrightunsigned(mid, _MID_BITS)
        off = mid.bitwiseAND(F.lit((1 << _MID_BITS) - 1))
        prefix_map = F.create_map(
            *[F.lit(x) for kv in prefix.items() for x in kv]
        )
        rank = F.element_at(prefix_map, pid.cast("int")) + off + 1
        hits = (
            arranged.withColumn("__rank", rank)
            .filter(F.col("__rank").isin([int(r) for r in ranks]))
            .collect()
        )
        by_rank = {r["__rank"]: r for r in hits}
        return [by_rank[r] for r in ranks]
    finally:
        arranged.unpersist()


def ntile_boundaries(n: int, k: int) -> list[int]:
    """Cumulative 1-based boundary ranks of ``ntile(k)`` over ``n``
    rows: bucket i covers ranks (B_{i-1}, B_i]. len = k - 1."""
    base, rem = divmod(n, k)
    return [i * base + min(i, rem) for i in range(1, k)]
