"""Laws for merge-on-read DELETE (sinks/versioned.delete_where):
O(1) logical deletes — no data byte rewritten, era-correct predicate
application, SQL NULL semantics, time travel, CDC visibility,
compaction materialization, vacuum survival, and the vtable stream
refusing tables it cannot represent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     compact,
                                                     delete_where,
                                                     read_version,
                                                     table_changes,
                                                     table_history,
                                                     vacuum,
                                                     write_version)


def _rows(spark, t, version=None):
    return sorted(
        tuple(r) for r in read_version(spark, t, version=version)
        .collect())


def _data_files(t):
    out = {}
    for root, _dirs, files in os.walk(t):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_delete_is_logical_and_time_travelable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"), t)
    before = _data_files(t)
    v = delete_where(spark, t, "k = 2")
    assert _rows(spark, t) == [(1, "a"), (3, "c")]
    # Not one data byte moved: same files, same mtimes.
    assert _data_files(t) == before
    # The pre-delete version still shows the row.
    assert _rows(spark, t, version=v - 1) == [(1, "a"), (2, "b"),
                                              (3, "c")]
    assert [h["op"] for h in table_history(t)] == ["write", "delete"]


def test_delete_era_semantics_and_null_logic(spark, tmp_path):
    """A row appended AFTER the delete survives even when it matches
    the predicate, and a NULL predicate value does NOT match (SQL
    DELETE three-valued logic)."""
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k int, x int"), t)
    delete_where(spark, t, "x > 5")          # kills 1 and 3, NOT 2
    assert _rows(spark, t) == [(2, None)]
    append_version(spark.createDataFrame([(4, 40)], "k int, x int"), t)
    # 40 > 5, but it arrived after the delete: survives.
    assert _rows(spark, t) == [(2, None), (4, 40)]
    # A second delete applies to everything that exists now.
    delete_where(spark, t, "x > 35")
    assert _rows(spark, t) == [(2, None)]


def test_delete_predicate_validated_eagerly(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    with pytest.raises(Exception, match="nope|UNRESOLVED"):
        delete_where(spark, t, "nope = 1")
    # Failed validation committed nothing.
    assert [h["op"] for h in table_history(t)] == ["write"]


def test_table_changes_emits_deleted_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"), t)
    v = delete_where(spark, t, "k = 1")
    ch = sorted(tuple(r) for r in
                table_changes(spark, t, v - 1, v).collect())
    assert ch == [(1, "a", "delete")]


def test_compact_materializes_and_folds_predicates(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(i, i * 10) for i in range(1, 6)], "k int, x int"), t)
    delete_where(spark, t, "k IN (2, 4)")
    want = _rows(spark, t)
    compact(spark, t)
    assert _rows(spark, t) == want
    # The folded files physically exclude the rows: a raw scan of the
    # new chain (no predicate logic) must already be clean.
    from etl_dados_ibge_sp_spark.sinks.versioned import (_deletes_for,
                                                         _read_manifest)
    man = _read_manifest(t)
    assert _deletes_for(man, man["current"]) == []
    # And the stream can start fresh after the compaction.
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        _delta_dirs)
    assert _delta_dirs(t, 0, man["current"])


def test_vacuum_keeps_retired_chain_deletes_effective(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"), t)        # v1
    delete_where(spark, t, "k = 1")                          # v2
    append_version(spark.createDataFrame([(3, "c")],
                                         "k int, v string"), t)  # v3
    append_version(spark.createDataFrame([(4, "d")],
                                         "k int, v string"), t)  # v4
    want = _rows(spark, t)
    assert want == [(2, "b"), (3, "c"), (4, "d")]
    vacuum(t, keep=2)  # retires v1 and the delete version v2
    assert _rows(spark, t) == want  # k=1 must NOT resurrect
    # Era numbers survive materialization too: append after vacuum,
    # then check the old predicate still only hits the old era.
    append_version(spark.createDataFrame([(1, "again")],
                                         "k int, v string"), t)
    assert _rows(spark, t) == [(1, "again"), (2, "b"), (3, "c"),
                               (4, "d")]


def test_vtable_stream_refuses_deleted_tables(spark, tmp_path):
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        register_vtable)

    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (spark.readStream.format("vtable").option("path", t).load()
             .writeStream.foreachBatch(lambda df, _b: df.collect())
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            assert q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()

    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    run()  # fine: no deletes yet
    delete_where(spark, t, "k = 1")
    append_version(spark.createDataFrame([(2, "b")], "k int, v string"),
                   t)
    with pytest.raises(Exception, match="merge-on-read DELETE"):
        run()


def test_delete_on_partitioned_table_keeps_layout(spark, tmp_path):
    """The delete commit propagates partition_by, so a later append
    still lands hive-partitioned."""
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, v string, p int"),
        t, partition_by=["p"])
    delete_where(spark, t, "k = 1")
    append_version(spark.createDataFrame([(3, "c", 10)],
                                         "k int, v string, p int"), t)
    assert _rows(spark, t) == [(2, "b", 20), (3, "c", 10)]
    # The appended dir is hive-partitioned like the root.
    from etl_dados_ibge_sp_spark.sinks.versioned import _read_manifest
    vdirs = [d for d in os.listdir(t) if d.startswith("v=")]
    newest = max(vdirs, key=lambda d: int(d[2:]))
    assert any(e.startswith("p=")
               for e in os.listdir(os.path.join(t, newest)))


def test_table_changes_spans_multiple_deletes_and_appends(spark,
                                                          tmp_path):
    """CDC across a window containing two deletes and an append nets
    out correctly: removals emit as deletes, the era-surviving append
    emits as insert."""
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k int, x int"), t)   # v1
    delete_where(spark, t, "k = 1")                         # v2
    append_version(spark.createDataFrame([(4, 5)], "k int, x int"),
                   t)                                       # v3
    delete_where(spark, t, "x >= 30")                       # v4 kills 3
    ch = sorted(tuple(r) for r in
                table_changes(spark, t, 1, 4).collect())
    assert ch == [(1, 10, "delete"), (3, 30, "delete"), (4, 5,
                                                         "insert")]


def test_compact_single_file_rewrites_live_deletes(spark, tmp_path):
    """The fast path must never skip while merge-on-read predicates
    are live: a single-file under-target snapshot with a pending
    delete is exactly the 'compact and restart the consumer' recovery
    case, so compact must still materialize survivors and fold the
    predicates away (a no-op here would leave the vtable stream
    permanently blocked)."""
    from etl_dados_ibge_sp_spark.sinks.versioned import (_deletes_for,
                                                         _read_manifest)

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(i, i * 10) for i in range(1, 6)],
        "k int, x int").coalesce(1), t)                      # ONE file
    delete_where(spark, t, "k IN (2, 4)")
    before = _read_manifest(t)["current"]
    version, files_before, _files_after = compact(spark, t)
    assert files_before == 1                    # the fast-path shape
    assert version > before                     # …but it rewrote
    assert _rows(spark, t) == [(1, 10), (3, 30), (5, 50)]
    man = _read_manifest(t)
    assert _deletes_for(man, man["current"]) == []
    # Once clean, the fast path applies again (idempotent).
    assert compact(spark, t)[0] == version
