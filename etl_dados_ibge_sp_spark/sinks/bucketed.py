"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The single biggest shuffle in the reference's workload shape is the
fact-to-fact equi-join (warehouse increment vs existing warehouse,
pipeline.py:148-171 restated as J2/K3).  At 100 TB that join moves
both sides across the cluster every run.  Bucketing amortizes it to
zero: write each table hash-partitioned into N buckets on the join
key (and sorted within buckets), and Spark's scan reports the
bucketing as its output partitioning — a later equi-join on that key
needs NO Exchange on the bucketed side(s); with both sides bucketed
and sorted, the sort-merge join reads both inputs in place.

Rules of thumb encoded here:

* bucket counts must MATCH (or divide) across tables meant to join —
  expose one constant per subject area, not ad-hoc numbers;
* sort within buckets by the join key: SMJ then skips its sort too;
* bucketing only applies to tables (``saveAsTable``), not raw paths —
  the metastore carries the bucket spec.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int,
                   bucket_cols: Sequence[str],
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and in-bucket sorted) parquet table.

    Joins/aggregations on ``bucket_cols`` against another table with
    the same spec run shuffle-free.
    """
    sort_cols = list(sort_cols if sort_cols is not None else bucket_cols)
    writer = (
        df.write.format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .mode(mode)
    )
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Scan a (bucketed) table; the scan's outputPartitioning carries
    the bucket spec so Catalyst can elide exchanges downstream."""
    return spark.table(table)


def bucketed_equijoin(spark: SparkSession, left_table: str,
                      right_table: str, on: Sequence[str],
                      how: str = "inner") -> DataFrame:
    """Equi-join two same-spec bucketed tables on their bucket key —
    plans as a zero-exchange sort-merge join."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), list(on), how)
