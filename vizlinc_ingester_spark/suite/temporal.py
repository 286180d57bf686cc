"""Temporal-join and OLAP-window queries (extension track): as-of
join, banded range join, ROLLUP subtotals, and running/range-frame
windows — each hash-checked against a DuckDB oracle (ASOF JOIN /
inequality join / GROUP BY ROLLUP / RANGE frames).

Timestamps: Spark reads the events parquet's TIMESTAMP(NANOS) as
int64 nanos (`spark.sql.legacy.parquet.nanosAsLong`), DuckDB
truncates to micros — so every cross-engine comparison happens on
integer MICROseconds (`ts div 1000` == `epoch_us(ts)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_banded
from .relational import _cents, _events, _t

RANGE_BAND_US = 60_000_000  # ±60 s nearby-click band


def _errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.expr("ts div 1000").cast("long").alias("err_us"),
    )


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.expr("ts div 1000").cast("long").alias("click_us"),
        _cents(F.col("value")).alias("click_cents"),
    )


def q_events_asof_join(spark, sf_dir):
    """For every error event, the user's most recent click at-or-before
    it (backward inclusive as-of). Union + window formulation: one
    shuffle on user_id, no join node, no candidate-pair blowup."""
    joined = asof_join(
        _errors(spark, sf_dir),
        _clicks(spark, sf_dir),
        on=["user_id"],
        left_ts="err_us",
        right_ts="click_us",
    )
    return joined.select(
        "err_id",
        "user_id",
        F.expr("(err_us - click_us_matched) div 1000000")
        .cast("long")
        .alias("click_age_s"),
        "click_cents",
    )


ORACLE_EVENTS_ASOF = """
WITH e AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS err_us
           FROM events WHERE event_type = 'error'),
     c AS (SELECT user_id, epoch_us(ts) AS click_us,
                  CAST(round(value * 100) AS BIGINT) AS click_cents
           FROM events WHERE event_type = 'click')
SELECT err_id, e.user_id,
       CAST((err_us - click_us) // 1000000 AS BIGINT) AS click_age_s,
       click_cents
FROM e ASOF LEFT JOIN c
  ON e.user_id = c.user_id AND e.err_us >= c.click_us
"""


def q_events_range_join(spark, sf_dir):
    """Nearby-event features: per error, count/sum of ALL clicks within
    ±60 s (banded interval join -> equi-join on time bins; the naive
    plan is a broadcast-nested-loop O(n*m) theta join)."""
    errors = _errors(spark, sf_dir)
    pairs = range_join_banded(
        errors,
        _clicks(spark, sf_dir).drop("user_id"),
        left_ts="err_us",
        right_ts="click_us",
        band=RANGE_BAND_US,
    )
    per_err = pairs.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_nearby_clicks"),
        F.sum("click_cents").alias("sum_click_cents"),
    )
    return errors.select("err_id").join(per_err, "err_id", "left").select(
        "err_id",
        F.coalesce("n_nearby_clicks", F.lit(0)).cast("long").alias("n_nearby_clicks"),
        F.coalesce("sum_click_cents", F.lit(0)).cast("long").alias("sum_click_cents"),
    )


ORACLE_EVENTS_RANGE_JOIN = f"""
WITH e AS (SELECT event_id AS err_id, epoch_us(ts) AS err_us
           FROM events WHERE event_type = 'error'),
     c AS (SELECT epoch_us(ts) AS click_us,
                  CAST(round(value * 100) AS BIGINT) AS click_cents
           FROM events WHERE event_type = 'click')
SELECT err_id,
       CAST(count(click_us) AS BIGINT) AS n_nearby_clicks,
       CAST(coalesce(sum(click_cents), 0) AS BIGINT) AS sum_click_cents
FROM e LEFT JOIN c ON abs(err_us - click_us) <= {RANGE_BAND_US}
GROUP BY err_id
"""


def q_events_rollup(spark, sf_dir):
    """OLAP subtotal lattice: ROLLUP(event_type, value decile band) —
    detail rows + per-type subtotals + grand total in one pass
    (Spark expands grouping sets inside a single hash aggregate)."""
    e = _events(spark, sf_dir)
    band = F.floor(F.col("value") / 10).cast("long")
    return (
        e.withColumn("value_band", band)
        .rollup("event_type", "value_band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
    )


ORACLE_EVENTS_ROLLUP = """
SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS value_band,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY ROLLUP(event_type, CAST(floor(value / 10) AS BIGINT))
"""


def q_orders_running_revenue(spark, sf_dir):
    """Running + range-frame windows: monthly order revenue per
    priority class with a cumulative total (ROWS frame) and a
    3-month moving sum (RANGE frame over the integer month index)."""
    o = _t(spark, sf_dir, "orders")
    month_idx = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast(
        "long"
    )
    monthly = (
        o.groupBy(F.col("o_orderpriority"), month_idx.alias("month_idx"))
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("month_cents"))
    )
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ma3 = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month_idx")
        .rangeBetween(-2, Window.currentRow)
    )
    return monthly.select(
        "o_orderpriority",
        "month_idx",
        "month_cents",
        F.sum("month_cents").over(w_cum).alias("cum_cents"),
        F.sum("month_cents").over(w_ma3).alias("ma3_cents"),
    )


ORACLE_RUNNING_REVENUE = """
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_idx,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS month_cents
  FROM orders
  GROUP BY 1, 2
)
SELECT o_orderpriority, month_idx, month_cents,
       CAST(sum(month_cents) OVER (PARTITION BY o_orderpriority ORDER BY month_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
       CAST(sum(month_cents) OVER (PARTITION BY o_orderpriority ORDER BY month_idx
            RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma3_cents
FROM monthly
"""


def q_events_funnel(spark, sf_dir):
    """Ordered-sequence funnel (MATCH_RECOGNIZE-lite): per user, the
    earliest signup, the earliest click strictly after it, and the
    earliest purchase strictly after that; ``stage`` = how deep the
    user got (1..3). All comparisons in exact integer microseconds.

    Plan shape: three conditional-filter aggregations, each keyed on
    user_id — every join is a co-partitioned equi-join on the same
    key, so at scale this is ONE shuffle of the events table by
    user_id reused across stages (AQE coalesces the tiny right
    sides to broadcasts at low SF)."""
    e = _events(spark, sf_dir).select(
        "user_id", "event_type", F.expr("ts div 1000").cast("long").alias("us")
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("signup_us"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("us") > F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_us",
            "click_us",
            "purchase_us",
            (
                F.lit(1)
                + F.when(F.col("click_us").isNotNull(), 1).otherwise(0)
                + F.when(F.col("purchase_us").isNotNull(), 1).otherwise(0)
            ).cast("int").alias("stage"),
        )
    )


ORACLE_EVENTS_FUNNEL = """
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS click_us
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.signup_us
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
  GROUP BY e.user_id
)
SELECT s.user_id, s.signup_us, c.click_us, p.purchase_us,
       CAST(1 + (CASE WHEN c.click_us IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN p.purchase_us IS NOT NULL THEN 1 ELSE 0 END)
            AS INT) AS stage
FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


QUERIES = {
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
    "events_rollup": q_events_rollup,
    "orders_running_revenue": q_orders_running_revenue,
    "events_funnel": q_events_funnel,
}

ORACLES = {
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_range_join": ORACLE_EVENTS_RANGE_JOIN,
    "events_rollup": ORACLE_EVENTS_ROLLUP,
    "orders_running_revenue": ORACLE_RUNNING_REVENUE,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
}
