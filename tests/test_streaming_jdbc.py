"""Streaming → relational warehouse: the foreachBatch anti-join upsert
run against a REAL embedded Derby database — the full §2.11 streaming
restatement of J2+K3 with an actual JDBC round-trip per micro-batch
(the parquet-warehouse variant is covered in
test_nested_and_streaming; this pins the DB path end to end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.dbapi_jdbc import jdbc_dbapi_connect
from etl_dados_ibge_sp_spark.sinks.jdbc_sink import (ensure_table_ddl,
                                                     write_jdbc_append)

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_streaming_foreachbatch_upserts_into_derby(spark, sf_dir,
                                                   tmp_path):
    url = f"jdbc:derby:{tmp_path / 'db'};create=true"
    ensure_table_ddl(
        lambda: jdbc_dbapi_connect(spark, url),
        "CREATE TABLE EVUP (EVENT_ID BIGINT, VAL DOUBLE)")

    # Stage the same 50-event slice TWICE -> two micro-batches with
    # fully duplicate keys; the per-batch anti-join against the Derby
    # snapshot must keep the warehouse exactly-once.
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 50)
          .select(F.col("event_id").alias("EVENT_ID"),
                  F.col("value").alias("VAL")))
    src = tmp_path / "src"
    ev.coalesce(1).write.parquet(str(src / "a"))
    ev.coalesce(1).write.parquet(str(src / "b"))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))

    def upsert(batch_df, _batch_id):
        sess = batch_df.sparkSession
        existing = (sess.read.format("jdbc").option("url", url)
                    .option("dbtable", "EVUP").options(**DERBY_PROPS)
                    .load().select("EVENT_ID").distinct())
        delta = (batch_df.dropDuplicates(["EVENT_ID"])
                 .join(existing, "EVENT_ID", "left_anti"))
        write_jdbc_append(delta, url, "EVUP", DERBY_PROPS)

    q = (stream.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()

    n = (spark.read.format("jdbc").option("url", url)
         .option("dbtable", "EVUP").options(**DERBY_PROPS).load().count())
    expected = ev.count()
    assert n == expected, f"warehouse has {n} rows, want {expected}"
