"""Laws for the versioned-table STREAMING source (sources/
vtable_stream_source): a consumer tails appended versions exactly
once across separate runs of one checkpoint, schema evolution
null-fills, and a rewrite fails the stream with a clear error instead
of silently re-emitting."""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
    register_vtable)


def _run_once(spark, table_dir, ckpt):
    # foreachBatch sink: unlike the memory sink it supports RESUMING
    # from a checkpoint, which is the whole point of these laws.
    rows: list[tuple] = []

    def sink(batch_df, _bid):
        rows.extend(tuple(r) for r in batch_df.collect())

    q = (spark.readStream.format("vtable").option("path", table_dir)
         .load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        assert q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    return sorted(rows)


def test_tail_appends_exactly_once(spark, tmp_path):
    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    write_version(spark.createDataFrame([(1, "a"), (2, "b")],
                                        "k int, v string"), t)
    assert _run_once(spark, t, ckpt) == [(1, "a"), (2, "b")]
    # No new versions: the next run of the same checkpoint emits 0.
    assert _run_once(spark, t, ckpt) == []
    # Two appends land while the consumer is down: ONE run emits both
    # deltas, nothing from version 1 again.
    append_version(spark.createDataFrame([(3, "c")],
                                         "k int, v string"), t)
    append_version(spark.createDataFrame([(4, "d")],
                                         "k int, v string"), t)
    assert _run_once(spark, t, ckpt) == [(3, "c"), (4, "d")]


def test_schema_evolution_nullfills_new_column(spark, tmp_path):
    register_vtable(spark)
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    append_version(spark.createDataFrame(
        [(2, "b", 7.5)], "k int, v string, score double"), t,
        merge_schema=True)
    got = _run_once(spark, t, str(tmp_path / "ckpt"))
    assert got == [(1, "a", None), (2, "b", 7.5)]


def test_vacuumed_checkpoint_version_still_tails(spark, tmp_path):
    """Vacuum may RETIRE the consumer's checkpointed version while its
    dirs live on (reference-counted by the current chain); the source
    must reconstruct the delta instead of crying 'rewrite'."""
    from etl_dados_ibge_sp_spark.sinks.versioned import vacuum

    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    append_version(spark.createDataFrame([(2, "b")],
                                         "k int, v string"), t)
    assert _run_once(spark, t, ckpt) == [(1, "a"), (2, "b")]  # ckpt@2
    append_version(spark.createDataFrame([(3, "c")],
                                         "k int, v string"), t)
    append_version(spark.createDataFrame([(4, "d")],
                                         "k int, v string"), t)
    vacuum(t, keep=2)  # retires versions 1 and 2; their dirs live on
    assert _run_once(spark, t, ckpt) == [(3, "c"), (4, "d")]


def test_rewrite_fails_stream_clearly(spark, tmp_path):
    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame([(1, "a")], "k int, v string")
    write_version(base, t)
    assert _run_once(spark, t, ckpt) == [(1, "a")]
    write_version(base, t)  # rewrite: delta from v1 is underivable
    with pytest.raises(Exception, match="not append-only"):
        _run_once(spark, t, ckpt)


def test_empty_table_fails_at_schema_time(spark, tmp_path):
    register_vtable(spark)
    with pytest.raises(Exception, match="no committed version"):
        (spark.readStream.format("vtable")
         .option("path", str(tmp_path / "nope")).load())


# ----------------------------------------------------------------------
# Partitioned (executor-side) reader laws — round 6.  The default
# reader must never materialize a delta on the driver: planning is
# per-FILE InputPartitions; executors read the bytes.
# ----------------------------------------------------------------------

def test_default_reader_is_partitioned(spark, tmp_path):
    """The format's default stream reader is the partition-planning
    DataSourceStreamReader (executor-side reads); the driver-side
    simple reader — the only code path holding row data in driver
    memory — is reachable ONLY via the explicit reader=simple opt-out.
    This is the structural 'no driver materialization' law: the
    default class has no to_pylist and plans per-file partitions."""
    from pyspark.sql.datasource_internal import (_SimpleStreamReaderWrapper,
                                                 _streamReader)

    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableDataSource, VTablePartitionedStreamReader)

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    schema = VTableDataSource({"path": t}).schema()
    got = _streamReader(VTableDataSource({"path": t}), schema)
    assert isinstance(got, VTablePartitionedStreamReader)
    got = _streamReader(VTableDataSource({"path": t,
                                          "reader": "simple"}), schema)
    assert isinstance(got, _SimpleStreamReaderWrapper)


def test_multi_file_version_plans_per_file_partitions(spark, tmp_path):
    """A version written as N files plans N InputPartitions (the
    scale-out unit), and the planned file set is exactly the delta's."""
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableDataSource, VTablePartitionedStreamReader)

    t = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    write_version(df.repartition(3), t)
    append_version(df.repartition(4), t)
    schema = VTableDataSource({"path": t}).schema()
    reader = VTablePartitionedStreamReader(t, schema)
    assert reader.latestOffset() == {"version": 2}
    all_parts = reader.partitions({"version": 0}, {"version": 2})
    assert len(all_parts) == 7
    delta = reader.partitions({"version": 1}, {"version": 2})
    assert len(delta) == 4
    assert all("v=2" in p.path for p in delta)
    assert reader.partitions({"version": 2}, {"version": 2}) == []


def test_executor_read_nullfills_and_types(spark, tmp_path):
    """Unit law for the executor-side read(): Arrow batches come back
    aligned to the CURRENT table schema — pre-evolution files
    null-fill the added column, and values/types survive exactly."""
    import pyarrow as pa

    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableDataSource, VTablePartitionedStreamReader)

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    append_version(spark.createDataFrame(
        [(2, "b", 7.5)], "k int, v string, score double"), t,
        merge_schema=True)
    schema = VTableDataSource({"path": t}).schema()
    reader = VTablePartitionedStreamReader(t, schema)
    old_parts = reader.partitions({"version": 0}, {"version": 1})
    batches = [b for p in old_parts for b in reader.read(p)]
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    tbl = pa.Table.from_batches(
        batches, schema=batches[0].schema if batches else None)
    assert tbl.column_names == ["k", "v", "score"]
    assert tbl.to_pylist() == [{"k": 1, "v": "a", "score": None}]


def test_stream_hive_partitioned_table(spark, tmp_path):
    """End-to-end through the executor-side reader on a
    hive-partitioned table: partition-column values come back typed
    from the directory names, across an append."""
    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    write_version(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "k int, v string, p int"),
        t, partition_by=["p"])
    assert _run_once(spark, t, ckpt) == [(1, "a", 10), (2, "b", 20)]
    append_version(spark.createDataFrame([(3, "c", 10)],
                                         "k int, v string, p int"), t)
    assert _run_once(spark, t, ckpt) == [(3, "c", 10)]


def test_large_file_splits_per_row_group(spark, tmp_path):
    """A delta file at/above split_bytes plans one partition per ROW
    GROUP (a skewed delta — one huge file — still scales out), and
    the split partitions read back exactly the whole file's rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableDataSource, VTablePartitionedStreamReader, _parquet_files)

    t = str(tmp_path / "tbl")
    write_version(
        spark.range(10).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        .coalesce(1), t)
    # Rewrite the single part file with 5 row groups (same rows —
    # snapshots are plain parquet, so this is byte-level test rigging,
    # not an API violation).
    [(path, _hive)] = _parquet_files(str(tmp_path / "tbl" / "v=1"))
    pq.write_table(pq.read_table(path), path, row_group_size=2)

    schema = VTableDataSource({"path": t}).schema()
    # Threshold above the file size: no split, one partition.
    whole = VTablePartitionedStreamReader(t, schema, split_bytes=1 << 30)
    assert len(whole.partitions({"version": 0}, {"version": 1})) == 1
    # Threshold of 1 byte: every file splits per row group.
    split = VTablePartitionedStreamReader(t, schema, split_bytes=1)
    parts = split.partitions({"version": 0}, {"version": 1})
    assert len(parts) == 5
    assert sorted({p.path for p in parts}) == [path]
    rows = sorted(
        (r for p in parts
         for b in split.read(p)
         for r in pa.Table.from_batches([b]).to_pylist()),
        key=lambda r: r["k"])
    assert rows == [{"k": i, "v": str(i)} for i in range(10)]


def test_split_bytes_option_end_to_end(spark, tmp_path):
    """The stream with .option('split_bytes', '1') (force per-row-group
    tasks) returns exactly the same rows as the unsplit default."""
    register_vtable(spark)
    t = str(tmp_path / "tbl")
    df = spark.range(50).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    write_version(df, t)
    rows: list[tuple] = []

    def sink(batch_df, _bid):
        rows.extend(tuple(r) for r in batch_df.collect())

    q = (spark.readStream.format("vtable").option("path", t)
         .option("split_bytes", "1").load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    try:
        assert q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    assert sorted(rows) == [(i, str(i)) for i in range(50)]


def test_starting_version_skips_history(spark, tmp_path):
    """.option('starting_version', N): a NEW checkpoint begins at
    version N inclusive (Delta's startingVersion idiom) — history
    before N is never emitted, later appends still tail."""
    register_vtable(spark)
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    append_version(spark.createDataFrame([(2, "b")], "k int, v string"),
                   t)
    append_version(spark.createDataFrame([(3, "c")], "k int, v string"),
                   t)
    rows: list[tuple] = []

    def run(ckpt):
        def sink(batch_df, _bid):
            rows.extend(tuple(r) for r in batch_df.collect())
        q = (spark.readStream.format("vtable").option("path", t)
             .option("starting_version", "2").load()
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            assert q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()

    ckpt = str(tmp_path / "ckpt")
    run(ckpt)
    assert sorted(rows) == [(2, "b"), (3, "c")]
    # The option only seeds NEW checkpoints; the existing one resumes
    # from its own offset.
    append_version(spark.createDataFrame([(4, "d")], "k int, v string"),
                   t)
    rows.clear()
    run(ckpt)
    assert rows == [(4, "d")]


def test_vacuum_sweeps_staging_orphans(spark, tmp_path):
    """Files staged by a crashed streaming-sink batch are reclaimed by
    vacuum (nothing references _staging; commit moves files out)."""
    import os

    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from etl_dados_ibge_sp_spark.sinks.versioned import vacuum
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableStreamWriter)

    t = str(tmp_path / "tbl")
    schema = spark.createDataFrame([(1, "a")], "k int, v string").schema
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    w = VTableStreamWriter(t, schema)
    msg = w.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 9, "v": "z"}], schema=to_arrow_schema(schema))]))
    assert os.path.exists(msg.files[0])  # crash: staged, never committed
    vacuum(t, keep=5)
    assert not os.path.exists(os.path.join(t, "_staging"))


def test_stream_survives_compaction_when_caught_up(spark, tmp_path):
    """Compaction preserves rows (dataChange=false in lakehouse
    terms): a consumer fully caught up through the folded version
    resumes across op='compact' and receives only post-compaction
    appends, exactly once."""
    from etl_dados_ibge_sp_spark.sinks.versioned import compact

    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    append_version(spark.createDataFrame([(2, "b")], "k int, v string"),
                   t)
    assert _run_once(spark, t, ckpt) == [(1, "a"), (2, "b")]  # ckpt@2
    compact(spark, t)                                         # v3
    append_version(spark.createDataFrame([(3, "c")], "k int, v string"),
                   t)                                         # v4
    assert _run_once(spark, t, ckpt) == [(3, "c")]
    # And the checkpoint keeps tailing normally afterwards.
    append_version(spark.createDataFrame([(4, "d")], "k int, v string"),
                   t)
    assert _run_once(spark, t, ckpt) == [(4, "d")]


def test_compaction_folding_unseen_versions_still_fails(spark, tmp_path):
    """If the compaction folded a version the consumer never read,
    those rows are mixed into the folded file — the stream must fail,
    not skip or re-emit."""
    from etl_dados_ibge_sp_spark.sinks.versioned import compact

    register_vtable(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    assert _run_once(spark, t, ckpt) == [(1, "a")]  # ckpt@1
    append_version(spark.createDataFrame([(2, "b")], "k int, v string"),
                   t)                               # v2: never consumed
    compact(spark, t)                               # v3 folds v2's rows
    with pytest.raises(Exception, match="not append-only"):
        _run_once(spark, t, ckpt)
