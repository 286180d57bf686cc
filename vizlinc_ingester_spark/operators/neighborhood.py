"""Scalable sorted-neighborhood clustering (SURVEY.md §4: "the key
custom algorithm").

The window form in ``coref._islands`` partitions by the blocking
scope; for *across-document* coref the scope is (type, strong) — a
handful of distinct values — so the corpus-wide sort funnels through
one window partition (Spark's "Moving all data to a single partition"
warning). Correct at test scale; a non-starter at 100 TB.

This module runs the same algorithm with a parallel sort:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on
   (scope, name, tiebreak) — Spark's distributed range sort; every
   physical partition holds a contiguous run of the global order.
2. One ``mapInPandas`` pass per partition computes island breaks
   sequentially (Arrow-batched, state carried across batches), giving
   each row a per-partition island seq, and tags each partition's
   first/last row.
3. Boundary stitching: only the (last row of partition p, first row of
   partition p+1) pairs can merge across the cut — ≤ numPartitions-1
   pairs, evaluated on the driver, then folded into a broadcast
   offset/merge mapping.

Semantics are byte-identical to the single-partition window form
(verified by tests/test_neighborhood.py on the real mention data);
the predicate (Levenshtein ≤ 1 AND equal digit runs,
src/CorefBase.groovy:176-218) is implemented in Python here and in
Column form in coref.py — the parity test pins them together.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.coref import LEVENSHTEIN_MAX


def levenshtein(a: str, b: str) -> int:
    """Plain DP Levenshtein (only ever called on adjacent sorted names
    whose lengths differ by <= a few chars; and driver-side on at most
    one pair per partition boundary)."""
    if a == b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(
                min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(a)]


_DIGITS = re.compile(r"\d+")


def merge_pred(prev_name: str, name: str) -> bool:
    """The reference's adjacent-merge predicate
    (src/CorefBase.groovy:176-218): distance <= 1 and identical digit
    runs."""
    return (
        levenshtein(prev_name, name) <= LEVENSHTEIN_MAX
        and _DIGITS.findall(prev_name) == _DIGITS.findall(name)
    )


def sorted_neighborhood_clusters(
    df: DataFrame,
    scope_cols: list[str],
    name_col: str,
    tiebreak_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``cluster_id`` (long, globally unique, stable = min possible
    id of the island) to ``df`` — maximal runs of consecutive
    merge-pred matches in the global (scope, name, tiebreak) order.

    Scales as: one range-shuffle (the sort), one Arrow scan, a
    driver-side reduction over numPartitions rows, one broadcast-map
    projection. No corpus-sized single-partition stage anywhere.
    """
    from ..session import ship_package

    spark = df.sparkSession
    # the Arrow passes below close over module-level helpers
    # (merge_pred, levenshtein) — cloudpickle serializes them by
    # reference, so the workers must be able to import this package
    # regardless of the driver's cwd
    ship_package(spark)
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    cols = list(df.columns)
    key_cols = [*scope_cols, name_col, tiebreak_col]
    arranged = df.repartitionByRange(num_partitions, *key_cols).sortWithinPartitions(
        *key_cols
    )

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", __pid int, __island long, __row_in_part long"
    )
    scope_idx = scope_cols
    name_c = name_col

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        island = 0
        row_no = 0
        prev_scope = None
        prev_name = None
        for pdf in batches:
            islands = []
            rows = []
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                scope = tuple(d[c] for c in scope_idx)
                nm = d[name_c]
                if prev_scope is None or scope != prev_scope or not merge_pred(prev_name, nm):
                    island += 1
                islands.append(island)
                rows.append(row_no)
                row_no += 1
                prev_scope, prev_name = scope, nm
            pdf = pdf.assign(__pid=pid, __island=islands, __row_in_part=rows)
            yield pdf

    assigned = arranged.mapInPandas(assign, out_schema)
    # Persist: consumed by the stats aggregation AND the final
    # projection; without it the range sort + Arrow scan runs twice.
    assigned = assigned.persist()

    # Per-partition summary: island count + boundary rows' (scope, name).
    # numPartitions rows — driver-safe at any corpus size (a 100k-partition
    # sort is a 100k-row collect).
    first_last = (
        assigned.groupBy("__pid")
        .agg(
            F.max("__island").alias("n_islands"),
            F.min_by(
                F.struct(*[F.col(c) for c in key_cols]), F.col("__row_in_part")
            ).alias("first_row"),
            F.max_by(
                F.struct(*[F.col(c) for c in key_cols]), F.col("__row_in_part")
            ).alias("last_row"),
        )
        .orderBy("__pid")
        .collect()
    )

    # Global id offsets + boundary merges (union by "merge into the
    # previous partition's last island").
    offsets: dict[int, int] = {}
    total = 0
    for r in first_last:
        offsets[r["__pid"]] = total
        total += r["n_islands"]
    # parent mapping for merged global ids
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while x in parent:
            x = parent[x]
        return x

    for prev, cur in zip(first_last, first_last[1:]):
        p_scope = tuple(prev["last_row"][c] for c in scope_cols)
        c_scope = tuple(cur["first_row"][c] for c in scope_cols)
        if p_scope != c_scope:
            continue
        if merge_pred(prev["last_row"][name_col], cur["first_row"][name_col]):
            last_global = offsets[prev["__pid"]] + prev["n_islands"]
            first_global = offsets[cur["__pid"]] + 1
            a, b = find(last_global), find(first_global)
            if a != b:
                parent[max(a, b)] = min(a, b)

    # broadcast the (sparse) resolution map; identity for unmerged ids
    resolve = {k: find(k) for k in parent}
    boffsets = spark.sparkContext.broadcast(offsets)
    bresolve = spark.sparkContext.broadcast(resolve)

    res_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cluster_id long"

    def finalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        off = boffsets.value
        res = bresolve.value
        for pdf in batches:
            gids = [
                res.get(g, g)
                for g in (
                    off[p] + i for p, i in zip(pdf["__pid"], pdf["__island"])
                )
            ]
            yield pdf.drop(columns=["__pid", "__island", "__row_in_part"]).assign(
                cluster_id=gids
            )

    out = assigned.mapInPandas(finalize, res_schema)
    return out.select(*cols, "cluster_id")
