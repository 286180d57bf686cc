"""Reshape operators: PIVOT (long→wide) and UNPIVOT (wide→long).

The reference has no reshape ops (its GraphML/TSV exports are
row-formatters, `/root/reference/src/SNGephiGraphML.groovy:64-88`);
these are extension-track operators a training-data pipeline uses for
feature matrices and per-category profile tables.

Plan shape: ``groupBy().pivot(col, values)`` with explicit values is
ONE hash aggregate (no extra pass to discover the pivot domain, and
the aggregate is map-side combinable — at 100 TB never call
``pivot(col)`` without the value list, which triggers a blocking
distinct scan first). UNPIVOT is a zero-shuffle expression (Spark
rewrites it to ``stack``/``posexplode``-style projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _events

HOURS = list(range(24))


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # ts is int64 nanos (nanosAsLong): hour-of-day via integer math,
    # identical to DuckDB's hour(ts) for these positive epochs.
    hour = F.expr("(ts div 3600000000000) % 24").cast("int")
    return e.select("event_type", hour.alias("hod"))


def q_events_pivot_hourly(spark, sf_dir):
    """Per-type hourly activity profile: event_type × hour-of-day
    count matrix via pivot with an explicit value list."""
    out = (
        _hourly(spark, sf_dir)
        .groupBy("event_type")
        .pivot("hod", HOURS)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "event_type",
        *[F.coalesce(F.col(str(h)), F.lit(0)).cast("long").alias(f"h{h:02d}") for h in HOURS],
    )
    return renamed.orderBy("event_type")


ORACLE_PIVOT_HOURLY = "SELECT event_type, " + ", ".join(
    f"CAST(count(*) FILTER (WHERE (epoch_ns(ts) // 3600000000000) % 24 = {h}) AS BIGINT) AS h{h:02d}"
    for h in HOURS
) + " FROM events GROUP BY event_type ORDER BY event_type"


def q_events_unpivot_roundtrip(spark, sf_dir):
    """UNPIVOT the pivoted matrix back to long form; dropping the
    zero-fill cells must reproduce the plain groupBy — a round-trip
    proof that pivot/unpivot are exact inverses."""
    wide = q_events_pivot_hourly(spark, sf_dir)
    long = wide.unpivot(
        ids=["event_type"],
        values=[f"h{h:02d}" for h in HOURS],
        variableColumnName="hour_col",
        valueColumnName="n_events",
    )
    return (
        long.filter(F.col("n_events") > 0)
        .select(
            "event_type",
            F.substring("hour_col", 2, 2).cast("long").alias("hod"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        .orderBy("event_type", "hod")
    )


ORACLE_UNPIVOT_ROUNDTRIP = """
SELECT event_type,
       CAST((epoch_ns(ts) // 3600000000000) % 24 AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY event_type, hod
"""


def q_events_cube(spark, sf_dir):
    """Full CUBE lattice over (event_type, day-of-month): all four
    grouping-set combinations in one hash aggregate."""
    e = _events(spark, sf_dir)
    day = F.expr("(ts div 86400000000000)").cast("long")
    return (
        e.withColumn("day_idx", day)
        .cube("event_type", "day_idx")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ORACLE_EVENTS_CUBE = """
SELECT event_type,
       CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day_idx,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE(event_type, CAST(epoch_ns(ts) // 86400000000000 AS BIGINT))
"""


def q_users_intersect(spark, sf_dir):
    """INTERSECT set op: users who both purchased AND hit an error
    (the §2.7 complement-split family, completed with intersect)."""
    e = _events(spark, sf_dir)
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    erring = e.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erring).orderBy("user_id")


ORACLE_USERS_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def q_users_full_outer(spark, sf_dir):
    """FULL OUTER join (absent from the reference's join inventory,
    SURVEY §2.3 — completes the family): per-user purchase vs error
    totals, keeping users who only have one side."""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    buys = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(cents).alias("buy_cents"))
    )
    errs = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return (
        buys.join(errs, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("buy_cents", F.lit(0)).cast("long").alias("buy_cents"),
            F.coalesce("n_errors", F.lit(0)).cast("long").alias("n_errors"),
        )
        .orderBy("user_id")
    )


ORACLE_USERS_FULL_OUTER = """
WITH buys AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS buy_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
errs AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY user_id
)
SELECT coalesce(buys.user_id, errs.user_id) AS user_id,
       CAST(coalesce(buy_cents, 0) AS BIGINT) AS buy_cents,
       CAST(coalesce(n_errors, 0) AS BIGINT) AS n_errors
FROM buys FULL OUTER JOIN errs ON buys.user_id = errs.user_id
ORDER BY 1
"""


QUERIES = {
    "users_full_outer": q_users_full_outer,
    "events_pivot_hourly": q_events_pivot_hourly,
    "events_unpivot_roundtrip": q_events_unpivot_roundtrip,
    "events_cube": q_events_cube,
    "users_intersect": q_users_intersect,
}

ORACLES = {
    "users_full_outer": ORACLE_USERS_FULL_OUTER,
    "events_pivot_hourly": ORACLE_PIVOT_HOURLY,
    "events_unpivot_roundtrip": ORACLE_UNPIVOT_ROUNDTRIP,
    "events_cube": ORACLE_EVENTS_CUBE,
    "users_intersect": ORACLE_USERS_INTERSECT,
}
