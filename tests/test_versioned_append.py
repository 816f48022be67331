"""Laws for the versioned table's append path (sinks/versioned.
append_version / foreach_batch_appender / streaming_versioned_load):
append never rewrites existing files, reads union correctly, time
travel excludes later batches, vacuum reference-counts shared dirs,
compaction folds an append chain, and batch-id replay is exactly-once
— end-to-end through a real availableNow stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     compact,
                                                     foreach_batch_appender,
                                                     read_version,
                                                     table_changes,
                                                     vacuum,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
from etl_dados_ibge_sp_spark.streaming.windowed import (
    streaming_versioned_load)


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def _file_states(d):
    return sorted((n, os.path.getsize(os.path.join(d, n)),
                   os.path.getmtime(os.path.join(d, n)))
                  for n in os.listdir(d) if n.endswith(".parquet"))


def test_append_is_union_and_never_rewrites(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    a = base.filter("o_orderkey % 2 = 0")
    b = base.filter("o_orderkey % 2 = 1")
    assert write_version(a, t) == 1
    before = _file_states(f"{t}/v=1")
    assert append_version(b, t) == 2
    # Existing files are byte-identical: name, size, and mtime.
    assert _file_states(f"{t}/v=1") == before
    # The new dir holds ONLY the batch.
    assert _rowset(spark.read.parquet(f"{t}/v=2")) == _rowset(b)
    # Current = union; time travel excludes the appended batch.
    assert _rowset(read_version(spark, t)) == _rowset(a.unionAll(b))
    assert _rowset(read_version(spark, t, version=1)) == _rowset(a)
    # table_changes across the append is exactly the batch.
    ch = table_changes(spark, t, 1)
    assert ch.filter("_change_type = 'delete'").count() == 0
    assert _rowset(ch.drop("_change_type")) == _rowset(b)


def test_vacuum_reference_counts_shared_dirs(spark, sf_dir, tmp_path):
    """Retiring the pre-append version must NOT delete its dir while
    the live chain still lists it; after a compact supersedes the
    chain, vacuum reclaims every chain dir."""
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir).limit(50)
    write_version(base, t)
    append_version(base.limit(10), t)
    n_total = 60
    assert vacuum(t, keep=1) == [1]          # version 1 retired...
    assert os.path.isdir(f"{t}/v=1")         # ...but its dir survives
    assert read_version(spark, t).count() == n_total
    v, _, _ = compact(spark, t)              # fold chain into v=3
    assert v == 3
    removed = vacuum(t, keep=1)
    assert removed == [1, 2]                 # now both dirs reclaimed
    assert not os.path.isdir(f"{t}/v=1")
    assert not os.path.isdir(f"{t}/v=2")
    assert read_version(spark, t).count() == n_total


def test_compact_folds_append_chain(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base.filter("o_orderkey % 3 = 0"), t)
    append_version(base.filter("o_orderkey % 3 = 1"), t)
    append_version(base.filter("o_orderkey % 3 = 2"), t)
    before = _rowset(read_version(spark, t))
    v, n_before, n_after = compact(spark, t)
    assert v == 4
    assert n_after <= n_before
    assert _rowset(read_version(spark, t)) == before
    assert before == _rowset(base)


def test_batch_id_replay_is_skipped(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sink = foreach_batch_appender(t)
    one = spark.createDataFrame([(1, "a")], "k int, v string")
    two = spark.createDataFrame([(2, "b")], "k int, v string")
    sink(one, 0)
    sink(one, 0)  # crash-replay of the same micro-batch
    assert read_version(spark, t).count() == 1
    sink(two, 1)
    assert read_version(spark, t).count() == 2
    sink(two, 1)  # replay after a later commit: still skipped
    assert read_version(spark, t).count() == 2


def test_txn_guard_is_writer_scoped(spark, tmp_path):
    """Two independent writers share one table: writer B's batch 0
    must append even though writer A already committed batch 5 —
    a table-global watermark would wrongly skip it."""
    t = str(tmp_path / "tbl")
    a = foreach_batch_appender(t, writer_id="stream-a")
    b = foreach_batch_appender(t, writer_id="stream-b")
    row = spark.createDataFrame([(1, "x")], "k int, v string")
    for bid in range(6):
        a(row, bid)
    b(row, 0)
    assert read_version(spark, t).count() == 7
    b(row, 0)  # writer B's own replay is still skipped
    a(row, 5)  # and so is writer A's
    assert read_version(spark, t).count() == 7


def test_manifest_stays_linear_in_appends(spark, tmp_path):
    """An appended version's manifest entry is a constant-size parent
    pointer, not a re-listing of the whole ancestor chain — B appends
    cost O(B) manifest, not O(B²)."""
    import json

    t = str(tmp_path / "tbl")
    row = spark.createDataFrame([(1, "x")], "k int, v string")
    write_version(row, t)
    for _ in range(9):
        append_version(row, t)
    man = json.load(open(os.path.join(t, "_manifest.json")))
    for v, entry in man["dirs"].items():
        if isinstance(entry, list):
            assert len(entry) == 1  # only full writes are materialized
        else:
            assert set(entry) == {"base", "add"}
    assert read_version(spark, t).count() == 10
    assert read_version(spark, t, version=4).count() == 4


def test_append_schema_evolution(spark, tmp_path):
    """Appending a batch with a NEW column evolves the table schema
    (old fields first, new appended); files written before the column
    existed read it as null via the manifest-stored schema — no
    footer merging.  Time travel to the pre-evolution version shows
    the old schema."""
    import pytest

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    widened = spark.createDataFrame(
        [(2, "b", 9.5)], "k int, v string, score double")
    # Evolution is opt-in (the Delta mergeSchema contract): the
    # default rejects, catching typo'd column names, and commits
    # nothing.
    with pytest.raises(ValueError, match="merge_schema=True"):
        append_version(widened, t)
    assert read_version(spark, t).columns == ["k", "v"]
    append_version(widened, t, merge_schema=True)
    cur = read_version(spark, t)
    assert cur.columns == ["k", "v", "score"]
    got = {r.k: r.score for r in cur.collect()}
    assert got == {1: None, 2: 9.5}
    assert read_version(spark, t, version=1).columns == ["k", "v"]


def test_append_type_conflict_fails_before_writing(spark, tmp_path):
    import pytest

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    with pytest.raises(ValueError, match="schema conflict on 'v'"):
        append_version(spark.createDataFrame([(2, 3.0)],
                                             "k int, v double"), t)
    # Nothing committed, no orphan dir left behind.
    assert read_version(spark, t).count() == 1
    assert not os.path.isdir(f"{t}/v=2")


def test_table_history_survives_vacuum(spark, tmp_path):
    from etl_dados_ibge_sp_spark.sinks.versioned import table_history

    t = str(tmp_path / "tbl")
    row = spark.createDataFrame([(1, "a")], "k int, v string")
    write_version(row, t)
    append_version(row, t)
    write_version(row, t)
    vacuum(t, keep=1)
    hist = table_history(t)
    assert [h["op"] for h in hist] == ["write", "append", "write"]
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert all("ts" in h for h in hist)
    # Per-commit row counts ride the write job (Observation API —
    # zero extra scans), giving the commit log load observability.
    assert [h["rows_written"] for h in hist] == [1, 1, 1]


def test_streaming_exactly_once_end_to_end(spark, sf_dir, tmp_path):
    """A real availableNow stream appends one version per micro-batch;
    re-running the stream over the same source with the SAME
    checkpoint adds nothing, and with a FRESH checkpoint (the
    worst-case total replay) the manifest batch-id guard still holds
    the table at exactly one copy."""
    src = str(tmp_path / "src")
    t = str(tmp_path / "tbl")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    base = _orders(spark, sf_dir).limit(100)
    base.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches
    schema = spark.read.parquet(src).schema

    streaming_versioned_load(spark, src, schema, t, ck1)
    n = base.count()
    assert read_version(spark, t).count() == n
    assert _rowset(read_version(spark, t)) == _rowset(base)

    streaming_versioned_load(spark, src, schema, t, ck1)  # same ckpt
    assert read_version(spark, t).count() == n
    streaming_versioned_load(spark, src, schema, t, ck2)  # full replay
    assert read_version(spark, t).count() == n
