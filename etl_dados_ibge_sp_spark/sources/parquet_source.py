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


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Restore a proper session-zoned timestamp from the on-disk
    TIMESTAMP(NANOS) column, whichever way the reader surfaced it:

    * nanos-long (``spark.sql.legacy.parquet.nanosAsLong``, Spark
      <= 4.0): integer-divide to micros (nanos exceed double
      precision) and convert.
    * ``timestamp_ntz`` (Spark 4.1+ reads parquet nanos natively as
      NTZ): cast to TIMESTAMP — with the UTC session timezone this is
      the identical instant, and watermarks/windows require the
      zoned type.
    """
    from pyspark.sql import functions as F
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fan_out: bool = True) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_ts(df)
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
