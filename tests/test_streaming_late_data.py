"""Watermark late-data law: an event older than the watermark when its
micro-batch arrives is DROPPED from windowed aggregation — the bounded-
state guarantee every 100-TB streaming job relies on."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType, TimestampType)

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])


def _stage_file(spark, tmp_path, name, rows, mtime):
    out = tmp_path / f"build_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(str(out))
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    dst = tmp_path / "src" / f"{name}.parquet"
    shutil.copy(out / part, dst)
    os.utime(dst, (mtime, mtime))
    return dst


def test_late_event_dropped_by_watermark(spark, tmp_path):
    (tmp_path / "src").mkdir()
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    now = time.time()
    # Batch 1: an event at T+3h will advance the watermark to T+2h.
    _stage_file(spark, tmp_path, "a",
                [(1, base + dt.timedelta(hours=3), 1.0)], now - 90)
    # Batch 2: padding — the LATE-event filter lags the eviction
    # watermark by one micro-batch (it uses the previous batch's
    # watermark), so the T+2h watermark only gates inputs from the
    # batch after this one.
    _stage_file(spark, tmp_path, "m",
                [(4, base + dt.timedelta(hours=3, minutes=30), 1.0)],
                now - 60)
    # Batch 3: a late event at T — its window [T, T+1h) ends strictly
    # before the late-filter watermark (T+2h), so it must be dropped.
    # A fresh event at T+4h keeps the batch non-empty.
    _stage_file(spark, tmp_path, "b",
                [(2, base, 1.0),
                 (3, base + dt.timedelta(hours=4), 1.0)], now - 30)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "src")))
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    qname = f"late_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(300)
        dropped = sum(
            int(so.get("numRowsDroppedByWatermark", 0))
            for p in q.recentProgress
            for so in p.get("stateOperators", []))
    finally:
        if q.isActive:
            q.stop()

    assert dropped >= 1, "late event was not dropped by the watermark"
    windows = {r.w.start for r in spark.table(qname).collect()}
    assert base not in windows, \
        "the late event's window leaked into the append output"
