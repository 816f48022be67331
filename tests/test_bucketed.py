"""Bucketed-table co-located joins: the pre-shuffled storage layout
must actually elide exchanges — asserted on the physical plan, not
assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.bucketed import (
    bucketed_equijoin,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge so the exchange-elision claim is what's tested
    (broadcast would hide it)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "b_orders", 8, ["o_custkey"])
    write_bucketed(cust.withColumnRenamed("c_custkey", "o_custkey"),
                   "b_customer", 8, ["o_custkey"])

    joined = bucketed_equijoin(spark, "b_orders", "b_customer",
                               ["o_custkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides read in place

    # and the result is the plain join's result
    expect = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey").count()
    assert joined.count() == expect


def test_bucketed_one_side_still_avoids_its_exchange(spark, sf_dir,
                                                     no_broadcast):
    """Joining a bucketed table against an un-bucketed frame shuffles
    only the un-bucketed side."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "b_lineitem", 8, ["l_orderkey"])
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .withColumnRenamed("o_orderkey", "l_orderkey")
              .select("l_orderkey", "o_totalprice"))

    joined = spark.table("b_lineitem").join(orders, "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # probe side only
    assert joined.count() > 0


def test_bucketed_groupby_skips_shuffle(spark, sf_dir):
    """Aggregation on the bucket key rides the stored partitioning —
    no exchange before the final agg."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders, "b_orders_agg", 8, ["o_custkey"])
    agg = (spark.table("b_orders_agg")
           .groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() > 0
