"""Temporal joins the reference lacks and Spark has no built-in for:
as-of join and banded range join over event streams.

The reference (`/root/reference/src/Ingester.groovy:19-56`) is a batch
document pipeline with no temporal operators; these belong to the
training-data-pipeline extension track (align a fact stream to the
most recent dimension snapshot; window joins for nearby-event
features). Both are implemented as compositions of built-in DataFrame
ops so Catalyst/Tungsten keep the hot path JVM-side:

- ``asof_join`` uses the union + partitioned-window formulation: tag
  both inputs, union them, and carry the last right-side values
  forward with ``last(ignorenulls=True)`` over a key-partitioned
  ordered window. ONE shuffle on the key, no join node at all, and
  no row explosion — at 100 TB this beats the naive
  "theta-join then pick max right ts" plan (which is a near-cartesian
  per key) by orders of magnitude, and it never materializes
  candidate pairs.
- ``range_join_banded`` replicates the *smaller* side into adjacent
  time bins of width == the band and equi-joins on the bin id, so the
  match search space is 3 bins instead of the whole timeline. This
  turns an inequality join (nested-loop / BNLJ in Spark) into a
  shuffle-hash equi-join; AQE's skew-join handles hot bins.

Timestamps are integer microseconds throughout (callers convert; the
testdata parquet carries TIMESTAMP(NANOS) which Spark reads as int64
nanos — divide by 1000 so comparisons agree with DuckDB's
micro-truncated timestamps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (``backward``, inclusive) or the smallest
    ``right_ts >= left_ts`` (``forward``) within the same ``on`` key.

    ``right`` must be projected to ``on`` + ``right_ts`` + its value
    columns, with names disjoint from ``left``'s non-key columns.
    Unmatched left rows keep NULL right columns (left-outer
    semantics). ``tolerance`` (same unit as the ts columns) nulls out
    matches farther than the given distance.

    Determinism: if the right side has several rows at the same
    (key, ts), the carried row is the one latest in the window order —
    callers that need a total order should dedupe right first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    on = list(on)
    val_cols = [c for c in right.columns if c not in on and c != right_ts]

    l_tagged = left.withColumn(_TS, F.col(left_ts).cast("long")).withColumn(
        _SIDE, F.lit(1)
    )
    r_tagged = right.withColumn(_TS, F.col(right_ts).cast("long")).withColumn(
        _SIDE, F.lit(0)
    )
    if right_ts not in val_cols and right_ts not in on:
        r_tagged = r_tagged.drop(right_ts)
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts => inclusive match.
    order = (
        [F.col(_TS).asc(), F.col(_SIDE).asc()]
        if direction == "backward"
        else [F.col(_TS).desc(), F.col(_SIDE).asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the right row as ONE struct so every value column comes from
    # the same right row — per-column last(ignorenulls) would stitch
    # fields from different rows whenever a right value is NULL.
    carry_cols = [
        F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True)
        .over(w)
        .alias("__matched_ts")
    ]
    if val_cols:
        carry_cols.append(
            F.last(
                F.when(
                    F.col(_SIDE) == 0,
                    F.struct(*[F.col(c).alias(c) for c in val_cols]),
                ),
                ignorenulls=True,
            )
            .over(w)
            .alias("__carry")
        )
    carried = unioned.select("*", *carry_cols)

    out = carried.filter(F.col(_SIDE) == 1)
    dist = F.abs(F.col(_TS) - F.col("__matched_ts"))
    keep = (
        F.col("__matched_ts").isNotNull()
        if tolerance is None
        else F.col("__matched_ts").isNotNull() & (dist <= F.lit(int(tolerance)))
    )
    for c in val_cols:
        out = out.withColumn(c, F.when(keep, F.col(f"__carry.{c}")))
    out = out.withColumn(
        f"{right_ts}_matched", F.when(keep, F.col("__matched_ts"))
    )
    return out.drop(
        _TS, _SIDE, "__matched_ts", *(["__carry"] if val_cols else [])
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band: int,
    on: Sequence[str] | None = None,
) -> DataFrame:
    """Inner join of every (left, right) pair with
    ``abs(left_ts - right_ts) <= band`` (and equal ``on`` keys, if
    given), as a bin-bucketed equi-join.

    The right side is replicated into its own time bin plus both
    neighbors (3x duplication, dropped again by the exact predicate),
    which bounds each left row's probe set to rows within one band
    width instead of the whole table — the standard interval-join
    strategy (cf. Flink interval joins / DuckDB IEJoin). Without this,
    Spark plans an O(n*m) broadcast-nested-loop join.
    """
    on = list(on or [])
    bin_l = F.floor(F.col(left_ts) / F.lit(band)).cast("long")
    bin_r = F.floor(F.col(right_ts) / F.lit(band)).cast("long")

    lb = left.withColumn("__bin", bin_l)
    rb = right.withColumn(
        "__bin", F.explode(F.array(bin_r - 1, bin_r, bin_r + 1))
    )
    cond = F.abs(F.col(left_ts) - F.col(right_ts)) <= F.lit(band)
    return lb.join(rb, ["__bin", *on]).filter(cond).drop("__bin")
