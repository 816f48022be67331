"""The lakehouse loop, end to end: exactly-once STREAM-IN from a
versioned raw table (`format("vtable")`, availableNow) → per-batch
MERGE into a keyed state table (`sinks/versioned.merge_version`,
copy-on-write) → CDC-OUT of each merge (`table_changes`) → an
INCREMENTALLY MAINTAINED aggregate built only from the change rows.
The law (tests/test_lakehouse_loop.py and the query's DuckDB oracle)
is that the incremental aggregate equals the batch restatement — the
delta-view-maintenance identity every lakehouse pipeline relies on.

Scale design: every stage is the O(delta) form — the stream reads
only unconsumed versions (executor-side, per-file partitions), MERGE
is the tag-union/max_by shape (one map-side-combinable aggregate, no
snapshot-vs-delta join), `table_changes` diffs exactly two committed
snapshots, and the maintained aggregate never rescans the table.  The
only driver-side state is one aggregate row per (event_type × merge):
bounded by the group-key cardinality, never by data volume.

Ordering contract: arrival batches must reach the raw table in
nondecreasing batch-index order.  MERGE's semantics are
last-writer-wins, so "the winner per key" is well-defined against a
SQL restatement only when replay order agrees with the priority
order (batch index, then event time, then id) — the same contract a
production CDC feed has with its log offsets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.versioned import (append_version, merge_version,
                               read_version, table_changes,
                               write_version, _read_manifest)
from ..sources.vtable_stream_source import register_vtable


def latest_per_key(df: DataFrame, key: str = "user_id") -> DataFrame:
    """One row per key: the (b, ts_us, event_id)-max row — MERGE's
    key-unique update set, as one map-side-combinable aggregate."""
    others = [c for c in df.columns if c != key]
    pri = F.struct("b", "ts_us", "event_id")
    return (df.groupBy(key)
            .agg(F.max_by(F.struct(*others), pri).alias("_r"))
            .select(key, "_r.*"))


def arrival_batches(events: DataFrame, n_batches: int) -> DataFrame:
    """The simulated CDC feed: events keyed for the loop, with the
    deterministic arrival-batch index ``b = event_id % n_batches``
    (what a log offset is in production — restatable in ANSI SQL,
    unlike wall-clock arrival)."""
    return events.select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        (F.col("event_id") % n_batches).cast("int").alias("b"))


def consume_once(spark: SparkSession, work_dir: str,
                 deltas: list[tuple[str, int, int]]) -> None:
    """One availableNow pass of the consumer leg: tail the raw table
    from its checkpoint, MERGE each micro-batch into the state table,
    and append that merge's CDC aggregate rows to ``deltas``.  A pass
    with no unconsumed raw versions merges nothing and appends
    nothing — the O(delta) guarantee the loop's laws pin."""
    register_vtable(spark)
    raw_dir = os.path.join(work_dir, "raw")
    state_dir = os.path.join(work_dir, "state")
    ckpt = os.path.join(work_dir, "ckpt")

    def merge_and_cdc(batch_df: DataFrame, _bid: int) -> None:
        if batch_df.isEmpty():
            return  # an empty replayed batch must not churn a version
        updates = latest_per_key(batch_df)
        prev = _read_manifest(state_dir)["current"] or 0
        if not prev:
            write_version(updates, state_dir)
            changes = (read_version(spark, state_dir)
                       .withColumn("_change_type", F.lit("insert")))
        else:
            merge_version(spark, state_dir, updates, keys=["user_id"])
            changes = table_changes(spark, state_dir, prev)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)) \
                .otherwise(F.lit(-1))
        rows = (changes.groupBy("event_type")
                .agg(F.sum(sign).alias("d_n"),
                     F.sum(sign * F.col("event_id")).alias("d_sum"))
                .collect())
        deltas.extend((r.event_type, r.d_n, r.d_sum) for r in rows)

    q = (spark.readStream.format("vtable")
         .option("path", raw_dir).load()
         .writeStream.foreachBatch(merge_and_cdc)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        assert q.awaitTermination(300), "lakehouse loop stream hung"
    finally:
        if q.isActive:
            q.stop()


def incremental_loop(spark: SparkSession, events: DataFrame,
                     work_dir: str,
                     arrival_plan: tuple[tuple[int, ...], ...]
                     = ((0,), (1, 2))) -> DataFrame:
    """Run the full loop and return the incrementally-maintained
    aggregate: per event_type of the CURRENT state, (n_users,
    sum_event_id) — built purely from per-merge CDC deltas, never by
    rescanning the state table.

    ``arrival_plan`` maps stream runs to the batch indices appended
    before each run: the default seeds b=0, runs the consumer, lands
    b=1 and b=2 while it is down, and runs it again — so one merge
    sees a single version and one sees a multi-version delta."""
    n_batches = 1 + max(b for run in arrival_plan for b in run)
    src = arrival_batches(events, n_batches)
    raw_dir = os.path.join(work_dir, "raw")

    # One small row per (event_type x merge) — the bounded driver-side
    # state called out in the module docstring.
    deltas: list[tuple[str, int, int]] = []

    first = True
    for run in arrival_plan:
        for b in run:
            bdf = src.filter(F.col("b") == b)
            if first:
                write_version(bdf, raw_dir)
                first = False
            else:
                append_version(bdf, raw_dir)
        consume_once(spark, work_dir, deltas)

    agg = spark.createDataFrame(
        deltas or [(None, 0, 0)],
        "event_type string, d_n bigint, d_sum bigint")
    return (agg.groupBy("event_type")
            .agg(F.sum("d_n").cast("bigint").alias("n_users"),
                 F.sum("d_sum").cast("bigint").alias("sum_event_id"))
            .filter(F.col("n_users") > 0))


def batch_restatement(events: DataFrame, n_batches: int = 3) -> DataFrame:
    """The non-incremental form of the same aggregate: winner per user
    by (arrival batch, event time, id), aggregated per event_type —
    what the loop's incremental result must equal."""
    w = latest_per_key(arrival_batches(events, n_batches))
    return (w.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("event_id").cast("bigint").alias("sum_event_id")))
