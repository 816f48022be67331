"""Plan-shape laws for the versioned-table (lakehouse) operators —
the law-only twins of tests/test_plan_hygiene.py's registered-query
lint: no cartesian products, no row-at-a-time Python, and the
intended shuffle budget for merge and diff."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (read_version,
                                                     table_changes,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_hygiene(plan: str, what: str) -> None:
    assert "CartesianProduct" not in plan, f"{what}: cartesian\n{plan[:1200]}"
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan), \
        f"{what}: row-at-a-time Python\n{plan[:1200]}"


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")


def test_merge_plan_is_one_aggregate_shuffle(spark, sf_dir, tmp_path):
    """The merge's winner selection must be the tag-union + one
    hash-aggregate shape (map-side combinable), never a join of
    snapshot against delta."""
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base, t)
    target = read_version(spark, t)
    updates = base.limit(10).withColumn("o_orderstatus", F.lit("M"))
    others = [c for c in target.columns if c != "o_orderkey"]

    def tag(df, pri):
        return df.select("o_orderkey", F.struct(*others).alias("_row"),
                         F.lit(pri).alias("_pri"))

    merged = (tag(target, 0).unionByName(tag(updates, 1))
              .groupBy("o_orderkey")
              .agg(F.max_by("_row", "_pri").alias("_row"))
              .select("o_orderkey", "_row.*"))
    plan = _plan(merged)
    _assert_hygiene(plan, "merge_version")
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_table_changes_plan_hygiene(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base.limit(100), t)
    write_version(base.limit(120), t)
    plan = _plan(table_changes(spark, t, 1))
    _assert_hygiene(plan, "table_changes")


def test_read_version_prunes_columns(spark, sf_dir, tmp_path):
    """A projection over read_version must reach the parquet scan as
    a pruned ReadSchema — the manifest-schema read path must not
    defeat column pruning."""
    t = str(tmp_path / "tbl")
    write_version(_orders(spark, sf_dir), t)
    plan = _plan(read_version(spark, t).select("o_orderkey"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:800]
    assert m.group(1) == "o_orderkey:bigint", m.group(1)
