"""Laws for the single-pass observed parquet write
(sinks/observed.write_parquet_observed): metrics match a direct
recount, and the write itself is lossless."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.observed import write_parquet_observed
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def test_observed_write_metrics_match_recount(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders") \
        .withColumn("maybe_null",
                    F.when(F.col("o_orderkey") % 7 == 0, None)
                     .otherwise(F.col("o_totalprice")))
    out = str(tmp_path / "orders_out")
    m = write_parquet_observed(src, out,
                               null_cols=["maybe_null"],
                               bound_col="o_totalprice")
    back = spark.read.parquet(out)
    assert m["n_rows"] == back.count() == src.count()
    assert m["nulls_maybe_null"] == \
        back.filter(F.col("maybe_null").isNull()).count()
    lohi = back.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    assert m["min_o_totalprice"] == lohi[0]
    assert m["max_o_totalprice"] == lohi[1]


def test_observed_write_is_single_job(spark, sf_dir, tmp_path):
    """The metrics must NOT trigger a second computation of the frame:
    observe attaches to the write job.  Pin it by counting Spark jobs
    around the call — the write of a narrow frame is one job (plus
    zero for metrics)."""
    sc = spark.sparkContext
    src = load_table(spark, sf_dir, "nation", fan_out=False)
    # Count within a DEDICATED job group: the global retained-job list
    # is capped (spark.ui.retainedJobs), so counting all jobs can see
    # evictions mid-test in a long suite session; a fresh group only
    # ever contains this test's jobs, which are the newest and cannot
    # have been evicted yet.
    group = "observed-sink-law"
    sc.setJobGroup(group, "single-job law")
    try:
        write_parquet_observed(src, str(tmp_path / "n"),
                               null_cols=["n_name"])
        jobs = len(sc._jsc.sc().statusTracker()
                   .getJobIdsForGroup(group))
    finally:
        sc.setJobGroup(None, None)
    assert jobs == 1, f"expected exactly 1 job, saw {jobs}"
