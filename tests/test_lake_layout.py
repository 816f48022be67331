"""Lake-layout laws: partition pruning reaches the scan, and schema
evolution merges across file generations — the two properties a
100-TB parquet lake lives or dies by."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    (events.withColumn("event_date", F.to_date("ts"))
     .write.partitionBy("event_date").mode("overwrite").parquet(out))

    day = (events.select(F.to_date("ts").alias("d"))
           .groupBy("d").count().orderBy(F.desc("count")).first())
    back = spark.read.parquet(out).filter(F.col("event_date") == day.d)
    plan = _plan_text(back)
    assert "PartitionFilters" in plan
    # The partition predicate must appear in PartitionFilters (pruned
    # at file listing), not as a post-scan Filter over all partitions.
    pf_line = next(ln for ln in plan.splitlines()
                   if "PartitionFilters" in ln)
    assert "event_date" in pf_line
    assert back.count() == day["count"]


def test_schema_evolution_merges_generations(spark, tmp_path):
    # Generation 1 lacks the lang column; generation 2 adds it.  A
    # mergeSchema read unifies them with nulls for the old files —
    # additive schema evolution without a rewrite.
    out = tmp_path / "docs"
    spark.createDataFrame([(1, "alpha")], "doc_id bigint, text string") \
        .write.parquet(str(out / "gen=1"))
    spark.createDataFrame([(2, "beta", "en")],
                          "doc_id bigint, text string, lang string") \
        .write.parquet(str(out / "gen=2"))
    merged = spark.read.option("mergeSchema", "true") \
        .option("recursiveFileLookup", "true").parquet(str(out))
    assert set(merged.columns) >= {"doc_id", "text", "lang"}
    rows = {r.doc_id: r for r in merged.collect()}
    assert rows[1].lang is None and rows[2].lang == "en"
