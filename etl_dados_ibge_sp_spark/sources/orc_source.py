"""ORC source/sink: the second columnar format Spark ships natively.

The reference reads CSV/JSON and writes CSV/JDBC only; ORC rounds out
the lakehouse surface so a user can point the same queries at ORC
lakes.  Same scan properties as parquet — predicate pushdown, column
pruning, vectorized read — verified by test (PushedFilters reaches
the OrcScan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: Sequence[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
