"""Laws for the optimization-round-11 load-path changes
(sources/parquet_source.load_table memo + opt-in fan-out,
session.tune_for_oracle once-per-context guard).

What the memo is and is NOT: load_table memoizes the RESOLVED LAZY
DataFrame per (session, path, fan_out) — plan-level reuse, like a
catalog's table resolution.  No data is persisted: every action over
the memoized frame still scans the parquet files, which
test_memo_is_lazy_not_cached pins by checking the storage level.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.session import (session_memo_clear,
                                             tune_for_oracle)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

SF = "/root/testdata/sf0.001"


def test_load_table_memoized_per_session(spark):
    a = load_table(spark, SF, "orders")
    b = load_table(spark, SF, "orders")
    assert a is b, "same (session, path, fan_out) must reuse the frame"
    c = load_table(spark, SF, "orders", fan_out=True)
    assert c is not a, "fan_out variants are distinct memo entries"


def test_memo_is_lazy_not_cached(spark):
    df = load_table(spark, SF, "lineitem")
    lvl = df.storageLevel
    assert not (lvl.useMemory or lvl.useDisk), (
        "load_table must NOT persist data — plan reuse only; every "
        "action recomputes from parquet")


def test_bare_and_fanned_results_identical(spark):
    session_memo_clear(spark)
    bare = (load_table(spark, SF, "lineitem", fan_out=False)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(32,6)"))
                 .alias("s")))
    fanned = (load_table(spark, SF, "lineitem", fan_out=True)
              .groupBy("l_returnflag")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("l_quantity").cast("decimal(32,6)"))
                   .alias("s")))
    assert sorted(map(tuple, bare.collect())) \
        == sorted(map(tuple, fanned.collect()))


def test_memo_clear_yields_fresh_frame(spark):
    a = load_table(spark, SF, "orders")
    session_memo_clear(spark)
    b = load_table(spark, SF, "orders")
    assert a is not b
    assert b.count() > 0  # and the fresh frame is usable


def test_rewritten_path_resolves_fresh(spark, tmp_path):
    """The memo key carries the path's stat fingerprint: overwriting a
    staged table within one session must serve the NEW data, not a
    stale file listing (the exact failure this guards against is
    Spark's FILE_NOT_EXIST on the vanished old part files)."""
    sf = str(tmp_path)
    p = f"{sf}/orders.parquet"
    spark.range(3).selectExpr("id AS o_orderkey").write.parquet(p)
    assert load_table(spark, sf, "orders").count() == 3
    spark.range(7).selectExpr("id AS o_orderkey") \
        .write.mode("overwrite").parquet(p)
    assert load_table(spark, sf, "orders").count() == 7


def test_tune_for_oracle_applies_once_then_guards(spark):
    tune_for_oracle(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # The guard makes later calls no-ops: a conf a query path set (and
    # will restore itself) is not clobbered mid-flight by a nested
    # tune_for_oracle.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        tune_for_oracle(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_tune_for_oracle_covers_new_sessions(spark):
    """conf.set writes SESSION-scoped runtime conf, so the once-guard
    must be keyed per SparkSession, not per SparkContext (optimization
    r12 fix): a second session over the same context — exactly what a
    driver calling spark.newSession() hands us — must still get the
    oracle confs applied, or every timestamp cast silently shifts to
    the host timezone."""
    tune_for_oracle(spark)
    s2 = spark.newSession()
    try:
        s2.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
        s2.conf.set("spark.sql.ansi.enabled", "true")
        tune_for_oracle(s2)
        assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
        assert s2.conf.get("spark.sql.ansi.enabled") == "false"
        # and the original session was not detuned by tuning s2
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        session_memo_clear(s2)
