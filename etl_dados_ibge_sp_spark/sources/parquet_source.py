"""Parquet star-schema loader for the test datasets (TESTDATA.md).

At 100 TB the fact tables (lineitem/orders/events/documents) would be
partitioned on disk (e.g. by month of the date column) and these readers
would pick up partition pruning for free; the loader keeps scans lazy so
Catalyst pushes filters and prunes columns into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimensions that should broadcast in joins (reference J1 joins a
# ~645-row lookup; nation/region/supplier play that role here).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

# Tables that feed per-row-heavy pipelines (hashing, shingling, window
# functions, big aggregations) and deserve full cluster parallelism.
FACT_TABLES = frozenset({"lineitem", "orders", "events", "documents",
                         "embeddings"})


def ensure_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Fan a narrow scan out to cluster parallelism.

    A parquet file is splittable only at row-group boundaries; a
    single-row-group file scans as ONE partition, serializing every
    downstream narrow transform (md5 shingling measured 32× under-
    parallelized at sf0.1).  When the scan has fewer partitions than
    the cluster has cores, a round-robin repartition — one tiny
    shuffle of the raw rows — buys full-width execution of everything
    after it.  At 100 TB the scan already has thousands of partitions
    and this is a no-op, so the helper is safe to apply universally to
    fact tables.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fan_out: bool = True) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk, read as nanos-long under
        # spark.sql.legacy.parquet.nanosAsLong; restore a proper
        # timestamp (integer div — nanos exceed double precision).
        from pyspark.sql import functions as F
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if fan_out and name in FACT_TABLES:
        df = ensure_parallelism(df, spark)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views so `spark.sql` queries can name the tables."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
