"""JDBC scan with query pushdown (SURVEY §2.1 S6).

The reference pushes ``SELECT DISTINCT municipio, ano_ref, mes_ref``
into Postgres by sending SQL text (dags/etl_municipios.py:121-122).
Spark's JDBC source does the same through the ``query`` option; for
large warehouse tables add partitioned reads (partitionColumn/
lowerBound/upperBound/numPartitions) so the extract parallelizes across
executors instead of funneling through one connection.

Integration-tested against embedded Derby (which ships in Spark's
jars) in tests/test_jdbc_integration.py — real pushdown reads and
write.jdbc round-trips, no fakes; the delete&insert sink helper
(sinks/jdbc_sink.py) is its write-side counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_query(spark: SparkSession, url: str, query: str,
                    properties: dict[str, str] | None = None,
                    partition_column: str | None = None,
                    lower_bound: int | None = None,
                    upper_bound: int | None = None,
                    num_partitions: int | None = None) -> DataFrame:
    """Build a JDBC read with the query pushed down to the database."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()
