"""Parquet sink with partitioned layout + idempotent month restatement.

This is the lakehouse restatement of the reference's delete&insert
idempotency (K3, pipeline.py:172-176): instead of DELETE+INSERT over
JDBC, write a table partitioned by the restatement key (``ano_ref``,
``mes_ref``) and overwrite only the partitions present in the incoming
batch (dynamic partition overwrite).  Re-running a month replaces that
month and touches nothing else — the same semantics, but scales to
100 TB because each partition is rewritten in parallel and other
months' files are never read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet_partitioned(df: DataFrame, path: str,
                              partition_by: Sequence[str],
                              mode: str = "append") -> None:
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def restate_partition(df: DataFrame, path: str,
                      partition_by: Sequence[str]) -> None:
    """K3 — idempotent restatement: overwrite exactly the partitions
    present in ``df`` (dynamic partition overwrite), leave the rest."""
    (
        df.write
        .partitionBy(*partition_by)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
