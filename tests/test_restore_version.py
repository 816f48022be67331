"""Laws for RESTORE (sinks/versioned.restore_version): metadata-only
undo — zero data bytes moved, the mistake stays time-travelable,
deletes restore with the snapshot, appends continue, and the vtable
consumer semantics split exactly by which chain a checkpoint is on."""

from __future__ import annotations

import os

import pytest

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     delete_where,
                                                     read_version,
                                                     restore_version,
                                                     table_history,
                                                     write_version)


def _rows(spark, t, version=None):
    return sorted(tuple(r) for r in
                  read_version(spark, t, version=version).collect())


def _files(t):
    return {os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _d, fs in os.walk(t) for f in fs
            if f.endswith(".parquet")}


def test_restore_is_metadata_only_undo(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a"), (2, "b")],
                                        "k int, v string"), t)   # v1
    write_version(spark.createDataFrame([(9, "oops")],
                                        "k int, v string"), t)   # v2 bad
    before = _files(t)
    v = restore_version(t, 1)
    assert v == 3
    assert _rows(spark, t) == [(1, "a"), (2, "b")]
    assert _files(t) == before                    # zero data movement
    assert _rows(spark, t, version=2) == [(9, "oops")]  # auditable
    assert [h["op"] for h in table_history(t)] == \
        ["write", "write", "restore"]
    # Appends continue on the restored chain.
    append_version(spark.createDataFrame([(3, "c")], "k int, v string"),
                   t)
    assert _rows(spark, t) == [(1, "a"), (2, "b"), (3, "c")]


def test_restore_keeps_live_deletes(spark, tmp_path):
    """Restoring a version whose state includes merge-on-read deletes
    must not resurrect the deleted rows."""
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, 10), (2, 20)], "k int, x int"), t)   # v1
    delete_where(spark, t, "k = 1")                # v2
    write_version(spark.createDataFrame([(9, 90)], "k int, x int"),
                  t)                               # v3 bad rewrite
    restore_version(t, 2)                          # back to post-delete
    assert _rows(spark, t) == [(2, 20)]            # k=1 stays deleted
    # Era semantics survive: a fresh append matching the old predicate
    # is NOT affected by it.
    append_version(spark.createDataFrame([(1, 99)], "k int, x int"), t)
    assert _rows(spark, t) == [(1, 99), (2, 20)]


def test_restore_validates_and_noops(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    assert restore_version(t, 1) == 1  # restoring current is a no-op
    with pytest.raises(ValueError, match="not available"):
        restore_version(t, 7)


def test_vtable_consumer_across_restore(spark, tmp_path):
    """A consumer checkpointed on the RESTORED chain continues
    correctly across the restore; one checkpointed on the abandoned
    chain fails with the rewrite error."""
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        register_vtable)

    register_vtable(spark)
    t = str(tmp_path / "tbl")

    def run(ckpt):
        rows = []
        q = (spark.readStream.format("vtable").option("path", t).load()
             .writeStream.foreachBatch(
                 lambda df, _b: rows.extend(map(tuple, df.collect())))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            assert q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()
        return sorted(rows)

    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)                                          # v1
    good = str(tmp_path / "good")
    assert run(good) == [(1, "a")]                            # ckpt@1
    write_version(spark.createDataFrame([(9, "oops")],
                                        "k int, v string"), t)  # v2
    bad = str(tmp_path / "bad")
    assert run(bad) == [(9, "oops")]                          # ckpt@2
    restore_version(t, 1)                                     # v3
    append_version(spark.createDataFrame([(2, "b")], "k int, v string"),
                   t)                                         # v4
    # Restored-chain consumer: sees only the post-restore append.
    assert run(good) == [(2, "b")]
    # Abandoned-chain consumer: must fail, not silently diverge.
    with pytest.raises(Exception, match="not append-only"):
        run(bad)
