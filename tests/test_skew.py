"""Salted join: row-identical to the plain join, and the physical
shuffle key actually includes the salt."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators.skew import salted_join

SF = "/root/testdata/sf0.001"


def _tables(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    return li, o


def test_salted_inner_equals_plain(spark):
    li, o = _tables(spark)
    got = salted_join(li, o, on=["l_orderkey"], buckets=8)
    want = li.join(o, "l_orderkey")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_salted_left_keeps_unmatched(spark):
    li, o = _tables(spark)
    # drop half the orders so some lineitems go unmatched
    o_half = o.filter(F.col("l_orderkey") % 2 == 0)
    got = salted_join(li, o_half, on=["l_orderkey"], buckets=8, how="left")
    want = li.join(o_half, "l_orderkey", "left")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_salt_widens_join_key(spark):
    li, o = _tables(spark)
    # disable broadcast so the join actually shuffles on its keys
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(li, o, on=["l_orderkey"], buckets=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "__salt" in plan  # shuffle/join key includes the salt
