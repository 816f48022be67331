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
