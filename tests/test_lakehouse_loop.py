"""Laws for the end-to-end lakehouse loop (plans/lakehouse_loop):
vtable stream-in → per-batch MERGE → table_changes CDC-out →
incrementally maintained aggregate == batch restatement, and the
state table itself equals the latest-per-key restatement."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.plans.lakehouse_loop import (
    arrival_batches, batch_restatement, incremental_loop,
    latest_per_key)
from etl_dados_ibge_sp_spark.sinks.versioned import (read_version,
                                                     table_history)


def _events(spark):
    """Synthetic feed with deliberate cross-batch key overlap:
    b = event_id % 3, users 1..4.  User 1 changes event_type across
    batches (exercises the CDC delete+insert path with d_n moving
    between groups); user 2 is updated within one group (d_n == 0,
    d_sum != 0); user 3 arrives only in the seed batch; user 4 only
    in the last."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, user_id, event_type, ts)    b = event_id % 3
        (3, 1, "view", t0),                       # b=0
        (6, 2, "click", t0 + dt.timedelta(1)),    # b=0
        (9, 3, "view", t0 + dt.timedelta(2)),     # b=0
        (12, 2, "click", t0),                     # b=0 older ts, loses
        (4, 1, "purchase", t0 + dt.timedelta(3)),  # b=1 user 1 changes
        (7, 2, "click", t0 + dt.timedelta(4)),    # b=1 same-group update
        (5, 4, "view", t0 + dt.timedelta(5)),     # b=2 new user
        (8, 1, "purchase", t0 + dt.timedelta(1)),  # b=2 wins on b
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp")


def test_incremental_equals_batch_restatement(spark, tmp_path):
    ev = _events(spark)
    got = incremental_loop(spark, ev, str(tmp_path)).collect()
    want = batch_restatement(ev).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # Concrete values, so the fixture's overlap design is really hit:
    # winners are u1->(8,purchase) u2->(7,click) u3->(9,view)
    # u4->(5,view).
    assert sorted(map(tuple, got)) == [
        ("click", 1, 7), ("purchase", 1, 8), ("view", 2, 14)]


def test_state_table_equals_latest_per_key(spark, tmp_path):
    ev = _events(spark)
    incremental_loop(spark, ev, str(tmp_path))
    state = read_version(spark, str(tmp_path / "state"))
    want = latest_per_key(arrival_batches(ev, 3))
    assert (sorted(map(tuple, state.select(*sorted(state.columns))
                       .collect()))
            == sorted(map(tuple, want.select(*sorted(want.columns))
                          .collect())))


def test_loop_commit_log_records_ops(spark, tmp_path):
    """The loop leaves an auditable trail: raw table = write+appends
    (exactly-once stream-in side), state table = write then merges."""
    incremental_loop(spark, _events(spark), str(tmp_path))
    raw_ops = [h["op"] for h in table_history(str(tmp_path / "raw"))]
    state_ops = [h["op"] for h in table_history(str(tmp_path / "state"))]
    assert raw_ops == ["write", "append", "append"]
    assert state_ops == ["write", "merge"]


def test_loop_is_incremental_not_rescan(spark, tmp_path):
    """A consumer pass with NO new raw versions must do nothing: no
    merge, no new state version, no CDC deltas — the checkpoint makes
    the loop O(delta), never a rescan."""
    from etl_dados_ibge_sp_spark.plans.lakehouse_loop import consume_once

    work = str(tmp_path)
    incremental_loop(spark, _events(spark), work)
    v_before = len(table_history(os.path.join(work, "state")))
    deltas: list[tuple] = []
    consume_once(spark, work, deltas)
    assert deltas == []
    assert len(table_history(os.path.join(work, "state"))) == v_before
