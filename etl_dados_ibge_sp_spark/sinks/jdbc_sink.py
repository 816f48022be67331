"""JDBC sinks (SURVEY §2.9 K2-K4, K6) incl. the delete&insert helper.

The reference loads Postgres via Polars -> pandas -> row-wise
``to_sql`` INSERTs (pipeline.py:188-189) — the double materialization
is its throughput bottleneck.  Spark's ``write.jdbc`` batches inserts
from every executor in parallel and drops both materializations.

``delete_and_insert`` replicates the idempotent month restatement
(K3, pipeline.py:172-176): scoped DELETE in one transaction, then a
parallel append.  The DELETE runs once on the driver through a DB-API
connection factory (no JDBC driver jar needed when the caller supplies
e.g. ``psycopg2.connect``); the INSERT is distributed.  For lakehouse
targets prefer sinks/parquet_sink.restate_partition, which does the
same thing with dynamic partition overwrite.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame


def write_jdbc_append(df: DataFrame, url: str, table: str,
                      properties: Mapping[str, str] | None = None,
                      batchsize: int = 10_000,
                      num_partitions: int | None = None) -> None:
    """K2 — parallel batched append."""
    out = df.repartition(num_partitions) if num_partitions else df
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**dict(properties or {}))
        .mode("append")
        .save()
    )


def write_jdbc_overwrite(df: DataFrame, url: str, table: str,
                         properties: Mapping[str, str] | None = None,
                         truncate: bool = True) -> None:
    """K4 — full replace; truncate=True keeps the table's DDL (the
    reference's if_exists="replace" drops and recreates instead)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
        .options(**dict(properties or {}))
        .mode("overwrite")
        .save()
    )


def ensure_table_ddl(connect: Callable[[], object], ddl: str) -> None:
    """K6 — CREATE TABLE IF NOT EXISTS through a DB-API connection, in
    a transaction (reference pipeline.py:172-173)."""
    conn = connect()
    try:
        with conn:  # DB-API transaction scope
            cur = conn.cursor()
            cur.execute(ddl)
    finally:
        conn.close()


def delete_and_insert(df: DataFrame, connect: Callable[[], object],
                      url: str, table: str,
                      delete_where: str, params: Sequence[object] = (),
                      properties: Mapping[str, str] | None = None) -> None:
    """K3 — idempotent restatement on a JDBC target: scoped DELETE in a
    transaction, then distributed append.

    The reference holds the DELETE and DDL in one transaction but runs
    the INSERT autocommit (SURVEY §7 notes the race); we replicate the
    *semantics* — re-running a period never duplicates rows — with the
    same two-step structure.
    """
    conn = connect()
    try:
        with conn:
            cur = conn.cursor()
            cur.execute(f"DELETE FROM {table} WHERE {delete_where}",  # noqa: S608 — caller-owned identifiers
                        list(params))
    finally:
        conn.close()
    write_jdbc_append(df, url, table, properties)
