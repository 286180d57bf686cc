"""As-of join and banded range join: semantics vs naive formulations,
direction/tolerance variants, and physical-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators.temporal import asof_join, range_join_banded

SF = "/root/testdata/sf0.001"


def _sides(spark):
    from vizlinc_ingester_spark.suite.relational import _events

    e = _events(spark, SF).withColumn("us", F.expr("ts div 1000").cast("long"))
    left = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("us").alias("err_us")
    )
    right = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("click_us"), F.col("value").alias("click_value")
    )
    return left, right


def _naive_asof(left, right, direction="backward"):
    """Reference semantics via theta-join + per-left-row rank."""
    from pyspark.sql import Window

    cmp = (
        F.col("click_us") <= F.col("err_us")
        if direction == "backward"
        else F.col("click_us") >= F.col("err_us")
    )
    order = (
        F.col("click_us").desc() if direction == "backward" else F.col("click_us").asc()
    )
    w = Window.partitionBy("err_id").orderBy(order)
    pairs = left.join(right, "user_id").filter(cmp)
    best = pairs.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return left.join(
        best.select("err_id", "click_us", "click_value"), "err_id", "left"
    )


def test_asof_backward_matches_naive(spark):
    left, right = _sides(spark)
    got = asof_join(
        left, right, on=["user_id"], left_ts="err_us", right_ts="click_us"
    ).select("err_id", F.col("click_us_matched").alias("click_us"), "click_value")
    want = _naive_asof(left, right).select("err_id", "click_us", "click_value")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert got.count() == left.count()  # left-outer: every error kept


def test_asof_forward_matches_naive(spark):
    left, right = _sides(spark)
    got = asof_join(
        left,
        right,
        on=["user_id"],
        left_ts="err_us",
        right_ts="click_us",
        direction="forward",
    ).select("err_id", F.col("click_us_matched").alias("click_us"), "click_value")
    want = _naive_asof(left, right, "forward").select(
        "err_id", "click_us", "click_value"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_asof_tolerance_nulls_far_matches(spark):
    left, right = _sides(spark)
    tol = 3_600_000_000  # 1 h in micros
    got = asof_join(
        left, right, on=["user_id"], left_ts="err_us", right_ts="click_us",
        tolerance=tol,
    )
    bad = got.filter(
        F.col("click_us_matched").isNotNull()
        & (F.col("err_us") - F.col("click_us_matched") > tol)
    )
    assert bad.count() == 0
    # value columns null exactly when the ts is null
    mismatch = got.filter(
        F.col("click_us_matched").isNull() != F.col("click_value").isNull()
    )
    assert mismatch.count() == 0
    # and some matches must survive within an hour on this data
    assert got.filter(F.col("click_us_matched").isNotNull()).count() > 0


def test_range_join_banded_matches_naive(spark):
    left, right = _sides(spark)
    right = right.drop("user_id")
    band = 300_000_000  # ±5 min
    got = range_join_banded(
        left, right, left_ts="err_us", right_ts="click_us", band=band
    ).select("err_id", "click_us")
    want = (
        left.crossJoin(right)
        .filter(F.abs(F.col("err_us") - F.col("click_us")) <= band)
        .select("err_id", "click_us")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_asof_plan_has_no_join(spark):
    """The union+window formulation must compile to ONE shuffle on the
    key and zero join nodes — that's the whole point at scale."""
    left, right = _sides(spark)
    plan = asof_join(
        left, right, on=["user_id"], left_ts="err_us", right_ts="click_us"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_range_join_banded_is_equijoin(spark):
    """The banded plan must be a hash/sort-merge equi-join on the bin,
    not a broadcast-nested-loop theta join."""
    left, right = _sides(spark)
    plan = (
        range_join_banded(
            left,
            right.drop("user_id"),
            left_ts="err_us",
            right_ts="click_us",
            band=60_000_000,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
